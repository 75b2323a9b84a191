"""End-to-end CDC: generated binlog -> engine apply -> oracle equality.

The correctness bar from BASELINE.json: 100% per-doc_id token-array
equality vs the single-threaded reference replay, including anomaly
routing (quarantine/skip) per the reference's negative matrix
(Unit_FnDecompressor.kt:153-459)."""

import os

import pytest
from pyspark.sql import functions as F

from dexspark import gen, oracle
from dexspark.config import EngineConfig
from dexspark.lake import LakeTable
from dexspark.schema import sequences_schema
from dexspark.stream import CdcEngine

N_DOCS = 300
N_EVENTS = 2_000


@pytest.fixture()
def setup(spark, tmp_warehouse):
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "sequences"), sequences_schema(),
        key="doc_id", num_buckets=8,
    )
    base = gen.base_sequences(spark, n_docs=N_DOCS, max_len=16).cache()
    table.overwrite(base)
    binlog = os.path.join(tmp_warehouse, "binlog")
    events = gen.change_events(
        spark, n_events=N_EVENTS, n_docs=N_DOCS, n_epochs=4, max_len=16, anomaly_pct=10
    )
    gen.write_binlog(events, binlog)
    engine = CdcEngine(spark, table, tmp_warehouse, EngineConfig(num_buckets=8))
    base_state = oracle.state_from_rows(base.collect())
    base.unpersist()
    return engine, table, binlog, base_state


def test_batch_apply_matches_oracle(spark, setup):
    engine, table, binlog, base_state = setup
    metrics = engine.apply_binlog(binlog)
    want = oracle.replay(binlog, base_state=base_state)
    oracle.assert_equal_state(want.state, table.read().collect(), "batch apply")
    assert metrics.events_seen == N_EVENTS
    assert metrics.rejects == want.quarantined
    assert metrics.skipped == want.skipped


def test_quarantine_and_lineage_written(spark, setup):
    engine, table, binlog, base_state = setup
    engine.apply_binlog(binlog)
    want = oracle.replay(binlog, base_state=base_state)
    q = spark.read.parquet(engine.quarantine_path)
    assert q.count() == want.quarantined
    # every quarantined row carries its raw line + at least one reason
    assert q.filter(F.size("fail_reasons") == 0).count() == 0
    assert q.filter(F.col("raw").isNull()).count() == 0
    lin = spark.read.parquet(engine.lineage_path)
    agg = lin.agg(
        F.sum("events_seen"), F.sum("rejects") , F.sum("skipped")
    ).collect()[0]
    assert agg[0] == N_EVENTS
    assert agg[2] == want.skipped


def test_negative_epoch_not_swallowed_by_watermark(spark, tmp_warehouse):
    """An event with a NEGATIVE batch_epoch was never committed (the
    marker space is non-negative), so the already-committed filter
    must not treat it as committed even once the watermark is >= 0 —
    but it is NOT applied either: a negative epoch can never be made
    idempotent (the filter would keep re-applying it on every
    redelivery, regressing newer state), so classify rejects it to the
    quarantine where it is visible instead of silently flip-flopping
    the table."""
    import json

    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq"), sequences_schema(),
        key="doc_id", num_buckets=4,
    )
    table.overwrite(
        spark.createDataFrame([("a", [1], 1, "web")], schema=sequences_schema()),
        epochs=[0, 1],  # watermark now 1
    )
    engine = CdcEngine(spark, table, tmp_warehouse, EngineConfig(num_buckets=4))
    binlog = os.path.join(tmp_warehouse, "neg-binlog")
    os.makedirs(binlog)
    ev = {
        "op": "insert",
        "doc_id": "neg",
        "payload": {"tokens": [5], "n_tok": 1, "source": "web"},
        "commit_ts": "2026-01-01T00:00:00",
        "lsn": 1,
        "batch_epoch": -3,
    }
    with open(os.path.join(binlog, "epoch-neg.ndjson"), "w") as f:
        f.write(json.dumps(ev) + "\n")
    metrics = engine.apply_binlog(binlog)
    assert metrics.events_applied == 0 and metrics.rejects == 1
    rows = {r["doc_id"] for r in table.read().collect()}
    assert "neg" not in rows  # quarantined, not applied, not swallowed
    q = spark.read.parquet(engine.quarantine_path)
    assert q.filter(q.doc_id == "neg").count() == 1
    # redelivery is a no-op for the table AND rewrites the same
    # quarantine partition (content-hash fallback): still exactly-once
    engine.apply_binlog(binlog)
    assert spark.read.parquet(engine.quarantine_path).filter(
        "doc_id = 'neg'"
    ).count() == 1


def test_epoch_redelivery_is_noop(spark, setup):
    engine, table, binlog, base_state = setup
    engine.apply_binlog(binlog)
    v1 = table.current_version()
    state1 = {r["doc_id"]: r.asDict(recursive=True) for r in table.read().collect()}
    # redeliver the full binlog: all epochs already committed
    m2 = engine.apply_binlog(binlog)
    assert m2.epochs == []
    state2 = {r["doc_id"]: r.asDict(recursive=True) for r in table.read().collect()}
    assert state1 == state2
    # no data rewrite happened (at most a no-op manifest bump)
    assert table.current_version() <= v1 + 1
    q1 = spark.read.parquet(engine.quarantine_path).count()
    want = oracle.replay(binlog, base_state=base_state)
    assert q1 == want.quarantined  # quarantine not duplicated either


def test_epochwise_apply_equals_single_shot(spark, setup, tmp_warehouse):
    """Apply epoch files one at a time -> same final state as one shot."""
    engine, table, binlog, base_state = setup
    files = sorted(os.listdir(binlog))
    for f in files:
        engine.apply_binlog(os.path.join(binlog, f))
    want = oracle.replay(binlog, base_state=base_state)
    oracle.assert_equal_state(want.state, table.read().collect(), "epochwise")
    # quarantine accumulates across batches (per-batch fallback
    # partitions must not overwrite earlier unattributable rows)
    q = spark.read.parquet(engine.quarantine_path)
    assert q.count() == want.quarantined


def test_applied_lineage_links_rows_to_events(spark, tmp_warehouse):
    """Per-event OK lineage (applied_lineage=True): every surviving
    binlog-written row joins back to exactly its winning change event
    (doc_id, lsn, epoch) — parent provenance for applied rows, like
    the reference's OK events (DecompressEventMessages.kt:5-20)."""
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq"), sequences_schema(), num_buckets=8
    )
    base = gen.base_sequences(spark, n_docs=N_DOCS, max_len=16).cache()
    table.overwrite(base)
    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=N_EVENTS, n_docs=N_DOCS, n_epochs=4, max_len=16,
            anomaly_pct=10,
        ),
        binlog,
    )
    engine = CdcEngine(
        spark, table, tmp_warehouse,
        EngineConfig(num_buckets=8, applied_lineage=True),
    )
    engine.apply_binlog(binlog)
    applied = spark.read.parquet(engine.applied_path)
    # exactly one winning event per touched key in a single-batch apply
    assert applied.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    # every applied upsert's provenance points at a real surviving row
    final = table.read()
    upserts = applied.filter(F.col("op") != "delete")
    missing = upserts.join(final, "doc_id", "left_anti")
    assert missing.count() == 0
    # every deleted key is absent from the final table
    dels = applied.filter(F.col("op") == "delete")
    assert dels.join(final, "doc_id", "inner").count() == 0
    # provenance agrees with the independent replay oracle's winners
    want = oracle.replay(binlog, base_state=oracle.state_from_rows(base.collect()))
    base.unpersist()
    touched = {r["doc_id"] for r in applied.select("doc_id").collect()}
    finals = {r["doc_id"] for r in final.select("doc_id").collect()}
    assert finals - touched == {
        d for d in want.state if d in finals
    } - touched  # untouched base rows are exactly the non-applied ones
    # redelivery rewrites the same partitions -> no duplicate provenance
    engine.apply_binlog(binlog)
    assert spark.read.parquet(engine.applied_path).count() == applied.count()


def test_vacuum_retention_policy(spark, tmp_warehouse):
    """Epochwise apply with vacuum_keep_last=1: snapshots expire as
    the stream advances, the live table state is untouched, and total
    snapshot count stays bounded."""
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq"), sequences_schema(), num_buckets=4
    )
    base = gen.base_sequences(spark, n_docs=100, max_len=8).cache()
    table.overwrite(base)
    binlog = os.path.join(tmp_warehouse, "binlog")
    files = gen.write_binlog(
        gen.change_events(
            spark, n_events=400, n_docs=100, n_epochs=4, max_len=8, anomaly_pct=10
        ),
        binlog,
    )
    engine = CdcEngine(
        spark, table, tmp_warehouse,
        EngineConfig(num_buckets=4, vacuum_keep_last=1),
    )
    for f in files:
        engine.apply_binlog(os.path.join(binlog, os.path.basename(f)))
        snaps = os.listdir(os.path.join(table.root, "_snapshots"))
        assert len(snaps) == 1  # retention bound holds after every batch
    want = oracle.replay(binlog, base_state=oracle.state_from_rows(base.collect()))
    base.unpersist()
    oracle.assert_equal_state(want.state, table.read().collect(), "vacuumed")


def test_binlog_encodings_equivalent(spark, tmp_warehouse):
    """Plain ndjson, gzip ndjson, and structured parquet binlogs of
    the SAME change stream (anomalies included) must converge to the
    same final table state with the same reject/skip counts — the
    compact encodings are pure wire-format choices."""
    events = gen.change_events(
        spark, n_events=N_EVENTS, n_docs=N_DOCS, n_epochs=3, max_len=16,
        anomaly_pct=10,
    ).cache()
    base = gen.base_sequences(spark, n_docs=N_DOCS, max_len=16)
    states, counts = {}, {}
    for fmt in ("ndjson", "gzip", "lz4", "parquet"):
        root = os.path.join(tmp_warehouse, fmt)
        table = LakeTable.create(
            spark, os.path.join(root, "seq"), sequences_schema(), num_buckets=8
        )
        table.overwrite(base)
        binlog = os.path.join(root, "binlog")
        if fmt == "parquet":
            gen.write_binlog_parquet(events, binlog)
        else:
            gen.write_binlog(
                events, binlog, codec=None if fmt == "ndjson" else "gzip"
            )
        engine = CdcEngine(spark, table, root, EngineConfig(num_buckets=8))
        m = engine.apply_binlog(binlog)
        counts[fmt] = (m.events_applied, m.rejects, m.skipped)
        states[fmt] = {
            r["doc_id"]: r.asDict(recursive=True) for r in table.read().collect()
        }
    events.unpersist()
    for fmt in ("gzip", "lz4", "parquet"):
        assert counts[fmt] == counts["ndjson"], fmt
        assert states[fmt] == states["ndjson"], fmt


def test_duplicate_malformed_lines_each_quarantined(spark, tmp_warehouse):
    """Byte-identical malformed lines collapse into one dedup group in
    the single-scan pipeline and are re-expanded at write time — the
    quarantine must still carry one row per rejected event."""
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq"), sequences_schema(), num_buckets=4
    )
    table.overwrite(gen.base_sequences(spark, n_docs=10, max_len=8))
    binlog = os.path.join(tmp_warehouse, "binlog")
    os.makedirs(binlog)
    good = (
        '{"op":"update","doc_id":"doc00000001","payload":{"tokens":[1,2],'
        '"n_tok":2,"source":"web"},"commit_ts":"2024-01-01 00:00:01",'
        '"lsn":7,"batch_epoch":0}'
    )
    with open(os.path.join(binlog, "epoch-000000-000.ndjson"), "w") as f:
        f.write(good + "\n")
        f.write("{not json at all\n")
        f.write("{not json at all\n")  # byte-identical duplicate
        f.write("{not json at all\n")
    engine = CdcEngine(spark, table, tmp_warehouse, EngineConfig(num_buckets=4))
    metrics = engine.apply_binlog(binlog)
    assert metrics.rejects == 3
    q = spark.read.parquet(engine.quarantine_path)
    assert q.count() == 3
    assert q.filter(F.col("raw") == "{not json at all").count() == 3


def test_replay_with_nonzero_epochs_is_exactly_once(spark, tmp_warehouse):
    """Regression: the unattributable-row fallback partition must be
    stable across redelivery even when the batch's epochs don't start
    at 0 (it is derived from content, not from min(new_epochs))."""
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq"), sequences_schema(), num_buckets=4
    )
    table.overwrite(gen.base_sequences(spark, n_docs=20, max_len=8))
    binlog = os.path.join(tmp_warehouse, "binlog")
    os.makedirs(binlog)
    with open(os.path.join(binlog, "epoch-000007-000.ndjson"), "w") as f:
        f.write(
            '{"op":"update","doc_id":"doc00000002","payload":{"tokens":[3,4],'
            '"n_tok":2,"source":"web"},"commit_ts":"2024-01-01 00:00:01",'
            '"lsn":1,"batch_epoch":7}\n'
        )
        f.write("{malformed line one\n")
        f.write("{malformed line two\n")
    engine = CdcEngine(spark, table, tmp_warehouse, EngineConfig(num_buckets=4))
    engine.apply_binlog(binlog)
    v1 = table.current_version()
    q1 = spark.read.parquet(engine.quarantine_path).count()
    m2 = engine.apply_binlog(binlog)  # full redelivery
    assert m2.epochs == []
    assert table.current_version() == v1  # no version churn on replay
    assert spark.read.parquet(engine.quarantine_path).count() == q1 == 2


def test_reprocess_quarantine_with_relaxed_rules(spark, tmp_warehouse):
    """Codeless-rules lifecycle: a too-strict source whitelist
    quarantines good events; after relaxing the rule-set,
    reprocess_quarantine recovers them into the table, rewrites the
    quarantine down to the genuinely-bad rows, and a second
    reprocess is a no-op (idempotence via quarantine state)."""
    import json

    from dexspark.config import RuleSet, sequences_ruleset

    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq"), sequences_schema(),
        key="doc_id", num_buckets=4,
    )
    table.overwrite(
        spark.createDataFrame([("a", [1], 1, "web")], schema=sequences_schema())
    )
    engine = CdcEngine(spark, table, tmp_warehouse, EngineConfig(num_buckets=4))
    binlog = os.path.join(tmp_warehouse, "binlog")
    os.makedirs(binlog)

    def ev(doc, src, lsn, op="insert"):
        return json.dumps({
            "op": op, "doc_id": doc,
            "payload": {"tokens": [lsn], "n_tok": 1, "source": src},
            "commit_ts": "2026-01-01T00:00:00", "lsn": lsn, "batch_epoch": 0,
        })
    lines = [
        ev("good1", "web", 1),
        ev("held1", "internal", 2),   # not in default whitelist
        ev("held2", "internal", 3),
        ev("held2", "internal", 4),   # later duplicate: LWW on recovery
        "{ this is not json",         # genuine reject, must stay
    ]
    with open(os.path.join(binlog, "epoch-0.ndjson"), "w") as f:
        f.write("\n".join(lines) + "\n")
    m = engine.apply_binlog(binlog)
    assert m.rejects == 4  # 3 whitelist failures + 1 malformed
    assert {r["doc_id"] for r in table.read().collect()} == {"a", "good1"}
    assert spark.read.parquet(engine.quarantine_path).count() == 4

    relaxed = RuleSet(
        **{
            **sequences_ruleset().__dict__,
            "allowed_values": (("source", ("web", "books", "code", "wiki", "internal")),),
        }
    )
    info = engine.reprocess_quarantine(rules=relaxed)
    assert info["recovered"] == 2  # held1 + held2 (LWW collapsed)
    assert info["still_failing"] == 1
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in table.read().collect()}
    assert set(rows) == {"a", "good1", "held1", "held2"}
    assert rows["held2"]["tokens"] == [4]  # the later duplicate won
    assert spark.read.parquet(engine.quarantine_path).count() == 1

    info2 = engine.reprocess_quarantine(rules=relaxed)  # idempotent rerun
    assert info2 == {
        "recovered": 0,
        "still_failing": 1,
        "deletes_applied": 0,
        "stale_skipped": 0,
    }
    assert table.read().count() == 4


def test_reprocess_skips_events_older_than_applied_state(spark, tmp_warehouse):
    """Stale guard: a quarantined event recovered AFTER the stream
    applied a newer event for the same key must be dropped (leaving
    quarantine, not merged) — otherwise the replay would regress the
    row. Requires the applied-lineage side table."""
    import json

    from dexspark.config import RuleSet, sequences_ruleset

    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq2"), sequences_schema(),
        key="doc_id", num_buckets=4,
    )
    engine = CdcEngine(
        spark, table, tmp_warehouse,
        EngineConfig(num_buckets=4, applied_lineage=True),
    )
    binlog = os.path.join(tmp_warehouse, "binlog2")
    os.makedirs(binlog)

    def ev(doc, src, ts, lsn, tokens, epoch):
        return json.dumps({
            "op": "insert", "doc_id": doc,
            "payload": {"tokens": tokens, "n_tok": len(tokens), "source": src},
            "commit_ts": f"2026-01-01T00:00:{ts:02d}", "lsn": lsn,
            "batch_epoch": epoch,
        })

    # epoch 0: X's ts=10 event is quarantined (bad source); Y's ts=10 too
    with open(os.path.join(binlog, "epoch-0.ndjson"), "w") as f:
        f.write(ev("X", "internal", 10, 1, [1], 0) + "\n")
        f.write(ev("Y", "internal", 10, 2, [2], 0) + "\n")
    engine.apply_binlog(binlog)
    # epoch 1: a NEWER valid event for X is applied (Y gets nothing)
    with open(os.path.join(binlog, "epoch-1.ndjson"), "w") as f:
        f.write(ev("X", "web", 20, 3, [9, 9], 1) + "\n")
    engine.apply_binlog(binlog)
    assert {r["doc_id"]: list(r["tokens"]) for r in table.read().collect()} == {
        "X": [9, 9]
    }

    relaxed = RuleSet(
        **{
            **sequences_ruleset().__dict__,
            "allowed_values": (("source", ("web", "books", "code", "internal")),),
        }
    )
    info = engine.reprocess_quarantine(rules=relaxed)
    # X's recovered ts=10 is older than the applied ts=20 -> skipped;
    # Y had nothing newer applied -> recovered
    assert info["stale_skipped"] == 1
    assert info["recovered"] == 1
    rows = {r["doc_id"]: list(r["tokens"]) for r in table.read().collect()}
    assert rows == {"X": [9, 9], "Y": [2]}  # X NOT regressed to [1]
    # both events left the quarantine either way
    try:
        remaining = spark.read.parquet(engine.quarantine_path).count()
    except Exception:
        remaining = 0
    assert remaining == 0


def test_lineage_write_spares_concurrent_tmp_files(tmp_path):
    """The epoch-dir cleanup must not delete a CONCURRENT writer's
    in-flight .tmp-* file (its os.replace would then fail) — only tmp
    orphans old enough that their writer must have crashed, plus
    non-dot stale extras from older layouts."""
    import os
    import time

    from dexspark.lineage import LINEAGE_SCHEMA, write_lineage_rows

    path = str(tmp_path / "lineage")
    row = (0,) + (0, "web") + tuple(0 for _ in LINEAGE_SCHEMA.fields[3:])
    write_lineage_rows([row], path)
    part = os.path.join(path, "batch_epoch=0")

    fresh = os.path.join(part, ".tmp-deadbeef.parquet")  # in-flight peer
    stale_tmp = os.path.join(part, ".tmp-cafebabe.parquet")  # crashed peer
    legacy = os.path.join(part, "part-00001.parquet")  # old multi-file layout
    for p in (fresh, stale_tmp, legacy):
        with open(p, "wb") as f:
            f.write(b"x")
    old = time.time() - 7200
    os.utime(stale_tmp, (old, old))

    write_lineage_rows([row], path)
    assert os.path.exists(fresh), "live peer tmp must survive"
    assert not os.path.exists(stale_tmp), "crashed-writer orphan reaped"
    assert not os.path.exists(legacy), "stale non-dot extras removed"
    assert os.path.exists(os.path.join(part, "part-00000.parquet"))


def test_write_binlog_epoch_order_beyond_ten(spark, tmp_warehouse):
    """write_binlog's returned path list must be in NUMERIC epoch order
    (lexicographic sorting would put epoch 10 before epoch 2), and
    change_events must mint exactly n_epochs epochs (ceil division —
    floor used to spill the tail into an unrequested extra epoch)."""
    import re

    events = gen.change_events(
        spark, n_events=130, n_docs=30, n_epochs=12, max_len=4
    )
    epochs = sorted(
        r["batch_epoch"] for r in events.select("batch_epoch").distinct().collect()
    )
    assert epochs == list(range(12))
    files = gen.write_binlog(
        events, os.path.join(tmp_warehouse, "binlog12"), files_per_epoch=1
    )
    file_epochs = [int(re.search(r"epoch-(\d+)-", os.path.basename(f)).group(1)) for f in files]
    assert file_epochs == sorted(file_epochs) == list(range(12))


def test_sink_retention_expires_old_epoch_partitions(spark, tmp_warehouse):
    """EngineConfig.sink_retention_epochs: quarantine / lineage /
    applied sinks keep only the last N epoch partitions under the
    committed watermark; negative fallback partitions (malformed
    rows with no expirable epoch) survive, and the sinks stay
    readable after the sweep."""
    import json

    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "sequences"), sequences_schema(),
        key="doc_id", num_buckets=4,
    )
    engine = CdcEngine(
        spark, table, tmp_warehouse,
        EngineConfig(
            num_buckets=4, applied_lineage=True, sink_retention_epochs=2
        ),
    )

    def env(op, doc_id, tokens, lsn, epoch, n_tok=None):
        return json.dumps(
            {
                "op": op,
                "doc_id": doc_id,
                "payload": {
                    "tokens": tokens,
                    "n_tok": len(tokens) if n_tok is None else n_tok,
                    "source": "web",
                },
                "commit_ts": f"2024-01-01T00:00:{lsn:02d}.000Z",
                "lsn": lsn,
                "batch_epoch": epoch,
            }
        )

    for epoch in range(5):
        d = os.path.join(tmp_warehouse, f"bl{epoch}")
        os.makedirs(d)
        lines = [
            env("insert", f"d{epoch}", [1, 2, 3], 2 * epoch, epoch),
            # n_tok mismatch -> validation quarantine under this epoch
            env("insert", f"bad{epoch}", [1, 2, 3], 2 * epoch + 1, epoch,
                n_tok=99),
        ]
        if epoch == 0:
            lines.append("{this is not json")  # fallback partition
        with open(os.path.join(d, "e.ndjson"), "w") as f:
            f.write("\n".join(lines) + "\n")
        engine.apply_binlog(d)

    def parts(path):
        return sorted(
            d for d in os.listdir(path) if d.startswith("batch_epoch=")
        )

    def split(path):
        ps = parts(path)
        return (
            [p for p in ps if not p.startswith("batch_epoch=-")],
            [p for p in ps if p.startswith("batch_epoch=-")],
        )

    # watermark = 4, retention = 2 -> epochs 3 and 4 survive; the
    # malformed line's negative fallback partition (present in both
    # quarantine AND its lineage rollup) is never expired
    kept_expect = ["batch_epoch=3", "batch_epoch=4"]
    lin_kept, lin_neg = split(engine.lineage_path)
    assert lin_kept == kept_expect and len(lin_neg) == 1
    assert parts(engine.applied_path) == kept_expect
    q_kept, q_neg = split(engine.quarantine_path)
    assert q_kept == kept_expect
    assert len(q_neg) == 1  # the malformed line's fallback partition
    # sinks stay readable; surviving rows are exactly the kept window
    q = spark.read.parquet(engine.quarantine_path)
    assert {r["doc_id"] for r in q.filter(
        F.col("doc_id").isNotNull()).collect()} == {"bad3", "bad4"}
    lin = spark.read.parquet(engine.lineage_path)
    assert {
        r["batch_epoch"]
        for r in lin.filter(F.col("batch_epoch") >= 0).collect()
    } == {3, 4}
    # the table itself is untouched by sink retention
    assert {r["doc_id"] for r in table.read().collect()} >= {
        f"d{e}" for e in range(5)
    }


def test_expire_epoch_partitions_unit(tmp_path):
    from dexspark.lineage import expire_epoch_partitions

    root = str(tmp_path / "sink")
    for d in ("batch_epoch=0", "batch_epoch=7", "batch_epoch=-12345",
              "batch_epoch=__HIVE_DEFAULT_PARTITION__", "not_a_partition"):
        os.makedirs(os.path.join(root, d))
    assert expire_epoch_partitions(root, 5) == 1  # only epoch 0
    assert sorted(os.listdir(root)) == [
        "batch_epoch=-12345",
        "batch_epoch=7",
        "batch_epoch=__HIVE_DEFAULT_PARTITION__",
        "not_a_partition",
    ]
    assert expire_epoch_partitions(str(tmp_path / "missing"), 5) == 0
