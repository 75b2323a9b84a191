"""Merge-on-read MERGE mode: append-only change commits + tombstone
deletes, last-writer-wins reconstruction at read, compaction back to
plain files. The write-amplification answer for small batches over
huge buckets (a 0.1% change batch appends itself instead of rewriting
every touched bucket)."""

import os

import pytest
from pyspark.sql import types as T

from dexspark import gen, oracle
from dexspark.config import EngineConfig
from dexspark.lake import LakeTable
from dexspark.schema import sequences_schema
from dexspark.stream import CdcEngine


def _state(table):
    return {r["doc_id"]: r.asDict(recursive=True) for r in table.read().collect()}


def _mk(spark, root, rows):
    t = LakeTable.create(spark, root, sequences_schema(), key="doc_id", num_buckets=4)
    t.overwrite(spark.createDataFrame(rows, schema=sequences_schema()))
    return t


BASE = [
    ("a", [1, 2], 2, "web"),
    ("b", [3], 1, "books"),
    ("c", [4, 5, 6], 3, "code"),
]


def test_mor_equals_cow(spark, tmp_warehouse):
    """The same upsert/delete sequence applied in mor and cow modes
    converges to the same table state."""
    steps = [
        ([("a", [9, 9], 2, "wiki"), ("d", [7], 1, "web")], ["b"]),
        ([("b", [8], 1, "code"), ("e", [5, 5], 2, "books")], ["c", "zz"]),
        ([("d", [1], 1, "wiki")], []),
    ]
    tables = {}
    for mode in ("cow", "mor"):
        t = _mk(spark, os.path.join(tmp_warehouse, mode), BASE)
        for i, (ups, dels) in enumerate(steps):
            t.merge(
                spark.createDataFrame(ups, schema=sequences_schema()),
                spark.createDataFrame([(d,) for d in dels], "doc_id string"),
                epochs=[i],
                mode=mode,
            )
        tables[mode] = t
    assert _state(tables["mor"]) == _state(tables["cow"])
    assert set(_state(tables["mor"])) == {"a", "d", "e", "b"}
    assert _state(tables["mor"])["b"]["tokens"] == [8]  # reinsert after delete


def test_mor_appends_without_rewriting(spark, tmp_warehouse):
    """A MOR merge must not touch any pre-existing file: old manifest
    entries survive verbatim, new files are appended."""
    t = _mk(spark, os.path.join(tmp_warehouse, "t"), BASE)
    before = t.manifest()["buckets"]
    old_files = {f for fs in before.values() for f in fs}
    t.merge(
        spark.createDataFrame([("a", [9], 1, "web")], schema=sequences_schema()),
        epochs=[0],
        mode="mor",
    )
    after = t.manifest()["buckets"]
    new_files = {f for fs in after.values() for f in fs}
    assert old_files <= new_files  # nothing rewritten or dropped
    assert new_files - old_files  # the change batch was appended
    assert t.manifest()["mor"] is True


def test_mor_compact(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "t"), BASE)
    t.merge(
        spark.createDataFrame([("a", [9], 1, "web")], schema=sequences_schema()),
        spark.createDataFrame([("c",)], "doc_id string"),
        epochs=[0],
        mode="mor",
    )
    want = _state(t)
    info = t.compact()
    assert info["compacted"]
    m = t.manifest()
    assert m["mor"] is False
    assert _state(t) == want
    # post-compaction files carry no tombstones (plain COW layout)
    df = spark.read.parquet(
        *[os.path.join(t.root, f) for fs in m["buckets"].values() for f in fs]
    )
    assert "_tombstone" not in df.columns
    # compacting a compacted table is a no-op
    assert t.compact() == {"version": m["version"], "compacted": False}


def test_mor_same_commit_upsert_beats_tombstone(spark, tmp_warehouse):
    """A key in BOTH upserts and delete_keys of one MOR batch must
    resolve like COW does (the upsert survives — COW deletes only drop
    rows absent from the upsert set), not nondeterministically."""
    t = _mk(spark, os.path.join(tmp_warehouse, "mor"), BASE)
    ups = spark.createDataFrame([("a", [42], 1, "wiki")], schema=sequences_schema())
    dels = spark.createDataFrame([("a",)], "doc_id string")
    t.merge(ups, dels, epochs=[0], mode="mor")
    c = _mk(spark, os.path.join(tmp_warehouse, "cow"), BASE)
    c.merge(ups, dels, epochs=[0], mode="cow")
    assert _state(t)["a"]["tokens"] == [42]
    assert _state(t) == _state(c)


def test_overwrite_clears_mor_history(spark, tmp_warehouse):
    """A full overwrite replaces every data file, so the mor flag must
    reset: reads go back to the shuffle-free plain union, and an
    overwritten frame with DUPLICATE keys reads back verbatim instead
    of being collapsed to one arbitrary row per key."""
    t = _mk(spark, os.path.join(tmp_warehouse, "t"), BASE)
    t.merge(
        spark.createDataFrame([("a", [9], 1, "web")], schema=sequences_schema()),
        epochs=[0],
        mode="mor",
    )
    assert t.manifest()["mor"] is True
    dup = spark.createDataFrame(
        [("k", [1], 1, "web"), ("k", [2], 1, "books")], schema=sequences_schema()
    )
    t.overwrite(dup, epochs=[1])
    m = t.manifest()
    assert m["mor"] is False and m["mor_depth"] == 0
    rows = t.read().collect()
    assert len(rows) == 2  # duplicates NOT collapsed by MOR reconstruction
    assert sorted(r["tokens"] for r in rows) == [[1], [2]]


def test_mor_schema_evolution(spark, tmp_warehouse):
    t = _mk(spark, os.path.join(tmp_warehouse, "t"), BASE)
    evolved = T.StructType(
        list(sequences_schema().fields) + [T.StructField("lang", T.StringType(), True)]
    )
    t.merge(
        spark.createDataFrame([("x", [1], 1, "web", "en")], schema=evolved),
        epochs=[0],
        mode="mor",
    )
    rows = _state(t)
    assert rows["x"]["lang"] == "en"
    assert rows["a"]["lang"] is None  # old commits null-filled at read


def test_auto_compaction_bounds_mor_depth(spark, tmp_warehouse):
    """Epochwise MOR apply with compact_every=2: the engine folds the
    history down on schedule and the final state still matches."""
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq"), sequences_schema(), num_buckets=4
    )
    base = gen.base_sequences(spark, n_docs=100, max_len=8).cache()
    table.overwrite(base)
    binlog = os.path.join(tmp_warehouse, "binlog")
    files = gen.write_binlog(
        gen.change_events(
            spark, n_events=600, n_docs=100, n_epochs=6, max_len=8, anomaly_pct=10
        ),
        binlog,
    )
    engine = CdcEngine(
        spark, table, tmp_warehouse,
        EngineConfig(num_buckets=4, merge_mode="mor", compact_every=2),
    )
    for f in files:
        engine.apply_binlog(os.path.join(binlog, os.path.basename(f)))
        assert table.manifest().get("mor_depth", 0) < 2  # bound holds
    want = oracle.replay(binlog, base_state=oracle.state_from_rows(base.collect()))
    base.unpersist()
    oracle.assert_equal_state(want.state, table.read().collect(), "auto-compact")


def test_cdc_engine_in_mor_mode_matches_oracle(spark, tmp_warehouse):
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq"), sequences_schema(), num_buckets=8
    )
    base = gen.base_sequences(spark, n_docs=200, max_len=16).cache()
    table.overwrite(base)
    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=1500, n_docs=200, n_epochs=3, max_len=16, anomaly_pct=10
        ),
        binlog,
    )
    engine = CdcEngine(
        spark, table, tmp_warehouse,
        EngineConfig(num_buckets=8, merge_mode="mor"),
    )
    engine.apply_binlog(binlog)
    want = oracle.replay(binlog, base_state=oracle.state_from_rows(base.collect()))
    base.unpersist()
    oracle.assert_equal_state(want.state, table.read().collect(), "mor apply")
    # replay is still a no-op
    v1 = table.current_version()
    m2 = engine.apply_binlog(binlog)
    assert m2.epochs == []
    assert table.current_version() == v1
    # compaction preserves the converged state
    table.compact()
    oracle.assert_equal_state(want.state, table.read().collect(), "mor compacted")
