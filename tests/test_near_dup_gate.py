"""Engine-level near-duplicate gate (EngineConfig.near_dup_gate).

The continuous-ingest training-data dedup story end-to-end: the CDC
engine signs each batch's winning upserts over their TOKEN ARRAYS,
probes a CDC-maintained LSH posting-list index of everything ingested
so far, quarantines near-dups with provenance, and folds its own
merge back into the index — exactly-once, crash-convergent.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from dexspark.config import EngineConfig
from dexspark.lake import LakeTable
from dexspark.schema import sequences_schema
from dexspark.stream import CdcEngine

A = list(range(100, 140))            # base doc
A_NEAR = A[:20] + [9999] + A[21:]    # one token changed
B = list(range(1000, 1040))          # base doc, unrelated
C = list(range(2000, 2040))          # novel insert
C_NEAR = C[:5] + [8888] + C[6:]      # near-dup of C
D = list(range(3000, 3040))          # novel insert (later batch)


def _env(op, doc_id, tokens, lsn, epoch):
    payload = (
        {"tokens": tokens, "n_tok": len(tokens), "source": "web"}
        if op != "delete"
        else None
    )
    return json.dumps(
        {
            "op": op,
            "doc_id": doc_id,
            "payload": payload,
            "commit_ts": f"2024-01-01T00:{lsn // 60:02d}:{lsn % 60:02d}.000Z",
            "lsn": lsn,
            "batch_epoch": epoch,
        }
    )


def _binlog(tmp, name, lines):
    d = os.path.join(tmp, name)
    os.makedirs(d)
    with open(os.path.join(d, "epoch-0-0.ndjson"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return d


@pytest.fixture()
def engine(spark, tmp_warehouse):
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "sequences"), sequences_schema(),
        key="doc_id", num_buckets=4,
    )
    table.overwrite(
        spark.createDataFrame(
            [("docA", A, len(A), "web"), ("docB", B, len(B), "web")],
            schema=sequences_schema(),
        )
    )
    return CdcEngine(
        spark, table, tmp_warehouse,
        EngineConfig(num_buckets=4, near_dup_gate=True, merge_mode="mor"),
    )


def _doc_ids(table):
    return {r["doc_id"] for r in table.read().select("doc_id").collect()}


def test_gate_quarantines_near_dup_passes_novel(spark, tmp_warehouse, engine):
    binlog = _binlog(
        tmp_warehouse, "b1",
        [
            _env("insert", "docDUP", A_NEAR, 1, 0),  # near-dup of docA
            _env("insert", "docC", C, 2, 0),          # novel
        ],
    )
    m = engine.apply_binlog(binlog)
    assert m.rows_merged == 1
    ids = _doc_ids(engine.table)
    assert "docC" in ids and "docDUP" not in ids
    q = spark.read.parquet(engine.quarantine_path)
    rows = q.filter(F.col("doc_id") == "docDUP").collect()
    assert len(rows) == 1
    assert rows[0]["fail_reasons"] == ["near_dup:doc:docA"]
    # the quarantined raw is a replayable full-image envelope
    raw = json.loads(rows[0]["raw"])
    assert raw["doc_id"] == "docDUP" and raw["payload"]["tokens"] == A_NEAR


def test_index_learns_each_batch_through_changelog(spark, tmp_warehouse, engine):
    engine.apply_binlog(
        _binlog(tmp_warehouse, "b1", [_env("insert", "docC", C, 1, 0)])
    )
    # batch 2: near-dup of the doc batch 1 ingested -> gated
    m2 = engine.apply_binlog(
        _binlog(tmp_warehouse, "b2", [_env("insert", "docCN", C_NEAR, 2, 1)])
    )
    assert m2.rows_merged == 0
    q = spark.read.parquet(engine.quarantine_path)
    assert q.filter(F.col("doc_id") == "docCN").collect()[0][
        "fail_reasons"
    ] == ["near_dup:doc:docC"]
    assert "docCN" not in _doc_ids(engine.table)


def test_delete_frees_the_bands(spark, tmp_warehouse, engine):
    engine.apply_binlog(
        _binlog(tmp_warehouse, "b1", [_env("delete", "docA", None, 1, 0)])
    )
    # docA gone -> a near-dup of A is novel again
    m = engine.apply_binlog(
        _binlog(tmp_warehouse, "b2", [_env("insert", "docAN", A_NEAR, 2, 1)])
    )
    assert m.rows_merged == 1
    assert "docAN" in _doc_ids(engine.table)


def test_self_update_is_exempt(spark, tmp_warehouse, engine):
    # an update to docA whose content still resembles docA applies
    # (self-matches under the same doc_id never count)
    m = engine.apply_binlog(
        _binlog(tmp_warehouse, "b1", [_env("update", "docA", A_NEAR, 1, 0)])
    )
    assert m.rows_merged == 1
    got = engine.table.lookup("docA").collect()[0]
    assert list(got["tokens"]) == A_NEAR


def test_replay_is_idempotent_and_gate_survives_restart(spark, tmp_warehouse, engine):
    b1 = _binlog(
        tmp_warehouse, "b1",
        [_env("insert", "docDUP", A_NEAR, 1, 0), _env("insert", "docC", C, 2, 0)],
    )
    engine.apply_binlog(b1)
    v = engine.table.current_version()
    engine.apply_binlog(b1)  # redelivery: epoch already committed
    assert engine.table.current_version() == v
    # a NEW engine instance (restart) reopens the same index tables
    e2 = CdcEngine(
        spark, engine.table, tmp_warehouse,
        EngineConfig(num_buckets=4, near_dup_gate=True, merge_mode="mor"),
    )
    m = e2.apply_binlog(
        _binlog(tmp_warehouse, "b2", [_env("insert", "docCN", C_NEAR, 3, 1),
                                      _env("insert", "docD", D, 4, 1)])
    )
    assert m.rows_merged == 1
    ids = _doc_ids(e2.table)
    assert "docD" in ids and "docCN" not in ids


def test_final_state_matches_ungated_plus_gate_policy(spark, tmp_warehouse):
    """The gate only ever REMOVES near-dup upserts: on a binlog with
    no near-dups the gated engine's final state equals the ungated
    engine's, byte for byte."""
    from dexspark import gen, oracle

    lines = [
        _env("insert", "docC", C, 1, 0),
        _env("update", "docB", D, 2, 0),
        _env("delete", "docA", None, 3, 0),
    ]
    states = []
    for sub, gate in (("g", True), ("u", False)):
        wh = os.path.join(tmp_warehouse, sub)
        os.makedirs(wh)
        t = LakeTable.create(
            spark, os.path.join(wh, "sequences"), sequences_schema(),
            key="doc_id", num_buckets=4,
        )
        t.overwrite(
            spark.createDataFrame(
                [("docA", A, len(A), "web"), ("docB", B, len(B), "web")],
                schema=sequences_schema(),
            )
        )
        e = CdcEngine(
            spark, t, wh, EngineConfig(num_buckets=4, near_dup_gate=gate)
        )
        e.apply_binlog(_binlog(wh, "b1", lines))
        states.append(
            sorted(
                (r["doc_id"], list(r["tokens"]), r["n_tok"], r["source"])
                for r in t.read().collect()
            )
        )
    assert states[0] == states[1]


def test_intra_batch_dup_gated_earliest_wins(spark, tmp_warehouse, engine):
    """Two near-dup docs arriving in the SAME batch: the earlier
    (commit_ts, lsn) doc ingests, the later quarantines against it —
    the index has not even learned the batch yet."""
    # doc_id order is the REVERSE of lsn order: proves the gate keys
    # on (commit_ts, lsn), not on id sort order
    m = engine.apply_binlog(
        _binlog(
            tmp_warehouse, "b1",
            [_env("insert", "docZ_first", C, 1, 0),
             _env("insert", "docA_second", C_NEAR, 2, 0)],
        )
    )
    assert m.rows_merged == 1
    ids = _doc_ids(engine.table)
    assert "docZ_first" in ids and "docA_second" not in ids
    q = spark.read.parquet(engine.quarantine_path)
    row = q.filter(F.col("doc_id") == "docA_second").collect()[0]
    assert row["fail_reasons"] == ["near_dup:doc:docZ_first"]


def test_intra_batch_identical_cluster_keeps_one(spark, tmp_warehouse, engine):
    """A dup cluster of identical docs in one batch keeps exactly the
    earliest; every later member quarantines against an earlier one."""
    lines = [
        _env("insert", f"doc{i}", C, 10 + i, 0) for i in range(5)
    ]
    m = engine.apply_binlog(_binlog(tmp_warehouse, "b1", lines))
    assert m.rows_merged == 1
    ids = _doc_ids(engine.table)
    assert "doc0" in ids
    assert not any(f"doc{i}" in ids for i in range(1, 5))
    q = spark.read.parquet(engine.quarantine_path)
    for r in q.filter(F.col("doc_id") != "doc0").collect():
        assert r["fail_reasons"][0].startswith("near_dup:doc:doc")


def test_intra_batch_off_passes_both(spark, tmp_warehouse):
    """near_dup_intra_batch=False restores the index-only gate: two
    same-batch near-dups both ingest (the index learns them only
    after the merge)."""
    t = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "sequences"), sequences_schema(),
        key="doc_id", num_buckets=4,
    )
    e = CdcEngine(
        spark, t, tmp_warehouse,
        EngineConfig(
            num_buckets=4, near_dup_gate=True, near_dup_intra_batch=False
        ),
    )
    m = e.apply_binlog(
        _binlog(
            tmp_warehouse, "b1",
            [_env("insert", "docC", C, 1, 0),
             _env("insert", "docCN", C_NEAR, 2, 0)],
        )
    )
    assert m.rows_merged == 2
    assert _doc_ids(t) == {"docC", "docCN"}
    # ...but a LATER batch near-dup is still gated by the index
    m2 = e.apply_binlog(
        _binlog(tmp_warehouse, "b2", [_env("insert", "docC3", C, 3, 1)])
    )
    assert m2.rows_merged == 0


def test_patch_events_combination_rejected(spark, tmp_warehouse):
    t = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "sequences"), sequences_schema(),
        key="doc_id", num_buckets=4,
    )
    with pytest.raises(ValueError, match="near_dup_gate"):
        CdcEngine(
            spark, t, tmp_warehouse,
            EngineConfig(near_dup_gate=True, patch_events=True),
        )


def test_sidecar_index_maintenance_bounds_depth_and_history(
    spark, tmp_warehouse
):
    """Long-stream hygiene: the sidecar index tables take one MOR
    merge per batch, so the engine applies its compact_every /
    vacuum_keep_last policy to them too — delta depth and snapshot
    history stay bounded over an unbounded stream, and the compacted
    index still gates correctly against the earliest batches."""
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "sequences"), sequences_schema(),
        key="doc_id", num_buckets=4,
    )
    table.overwrite(
        spark.createDataFrame([("docA", A, len(A), "web")],
                              schema=sequences_schema())
    )
    eng = CdcEngine(
        spark, table, tmp_warehouse,
        EngineConfig(
            num_buckets=4, near_dup_gate=True, merge_mode="mor",
            compact_every=2, vacuum_keep_last=2,
            vacuum_min_age_seconds=0.0,
        ),
    )
    for i in range(6):
        toks = list(range(5000 + 100 * i, 5040 + 100 * i))
        eng.apply_binlog(
            _binlog(tmp_warehouse, f"nb{i}",
                    [_env("insert", f"nd{i}", toks, 10 + i, i)])
        )
    for t in (eng._nd_sig, eng._nd_band):
        m = t.manifest()
        # depth reached compact_every at most transiently; the
        # maintenance pass right after the sync folded it back down
        assert int(m.get("mor_depth", 0)) < 2, m.get("mor_depth")
        assert len(t.history()) <= 3, [h["version"] for h in t.history()]
    # the compacted+vacuumed index still knows batch-0's doc: a
    # near-dup of nd0 quarantines against it
    near0 = list(range(5000, 5040))
    near0[7] = 1
    m = eng.apply_binlog(
        _binlog(tmp_warehouse, "nb-dup",
                [_env("insert", "nd0close", near0, 99, 6)])
    )
    assert m.rows_merged == 0
    assert "nd0close" not in _doc_ids(eng.table)
