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


# ------------------------------------------------- per-bucket MOR state


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _bucket_of(spark, doc_id, num_buckets):
    """The table's own bucketing expression, never a reimplementation."""
    from pyspark.sql import functions as F

    return (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(doc_id)), F.lit(num_buckets))
            .cast("int")
            .alias("b")
        )
        .collect()[0]["b"]
    )


def test_mor_tracked_per_bucket_and_clean_buckets_read_shuffle_free(
    spark, tmp_warehouse
):
    """A MOR merge marks ONLY the buckets it appended to; reading any
    other bucket must stay the plain shuffle-free union — at 10^10 rows
    a day of deltas on 1% of buckets must not drag the other 99%
    through the reconstruction aggregate."""
    t = _mk(spark, os.path.join(tmp_warehouse, "t"), BASE)
    nb = t.num_buckets
    t.merge(
        spark.createDataFrame([("a", [9], 1, "web")], schema=sequences_schema()),
        epochs=[0],
        mode="mor",
    )
    dirty = _bucket_of(spark, "a", nb)
    assert t.mor_buckets() == {str(dirty): 1}
    clean = [b for b in range(nb) if b != dirty]
    plan = _plan(t.read(buckets=clean))
    assert "Aggregate" not in plan  # no reconstruction for clean buckets
    # the full read reconstructs only the dirty bucket but is still exact
    assert _state(t)["a"]["tokens"] == [9]
    assert _state(t)["b"]["tokens"] == [3]
    # depth accumulates per bucket, not per commit table-wide
    t.merge(
        spark.createDataFrame([("a", [10], 1, "web")], schema=sequences_schema()),
        epochs=[1],
        mode="mor",
    )
    assert t.mor_buckets()[str(dirty)] == 2
    assert t.manifest()["mor_depth"] == 2


def test_cow_merge_cleans_its_buckets_mor_state(spark, tmp_warehouse):
    """A COW rewrite of a bucket materializes its reconstructed state,
    so that bucket must LEAVE the MOR set while others keep theirs."""
    t = _mk(spark, os.path.join(tmp_warehouse, "t"), BASE)
    nb = t.num_buckets
    ba, bb = _bucket_of(spark, "a", nb), _bucket_of(spark, "b", nb)
    assert ba != bb, "fixture keys must land in distinct buckets"
    for doc in ("a", "b"):
        t.merge(
            spark.createDataFrame([(doc, [9], 1, "web")], schema=sequences_schema()),
            epochs=[ord(doc)],
            mode="mor",
        )
    assert set(t.mor_buckets()) == {str(ba), str(bb)}
    t.merge(
        spark.createDataFrame([("a", [11], 1, "web")], schema=sequences_schema()),
        epochs=[99],
        mode="cow",
    )
    assert set(t.mor_buckets()) == {str(bb)}  # a's bucket is clean again
    assert _state(t)["a"]["tokens"] == [11]
    assert _state(t)["b"]["tokens"] == [9]


def test_partial_compact_deepest_first_and_min_depth(spark, tmp_warehouse):
    """compact(max_buckets=1) rewrites only the DEEPEST dirty bucket;
    min_depth skips shallow ones; files of untouched buckets are
    carried forward verbatim (the rewrite is O(compacted buckets))."""
    t = _mk(spark, os.path.join(tmp_warehouse, "t"), BASE)
    nb = t.num_buckets
    ba, bb = _bucket_of(spark, "a", nb), _bucket_of(spark, "b", nb)
    t.merge(
        spark.createDataFrame([("b", [8], 1, "web")], schema=sequences_schema()),
        epochs=[0],
        mode="mor",
    )
    for i in (1, 2):
        t.merge(
            spark.createDataFrame([("a", [i], 1, "web")], schema=sequences_schema()),
            epochs=[i],
            mode="mor",
        )
    assert t.mor_buckets() == {str(ba): 2, str(bb): 1}
    want = _state(t)
    before = dict(t.manifest()["buckets"])

    # min_depth=3: nothing deep enough — structured no-op
    assert t.compact(min_depth=3)["compacted"] is False

    info = t.compact(max_buckets=1)  # deepest first: bucket of 'a'
    assert info["buckets_compacted"] == 1
    assert info["mor_buckets_remaining"] == 1
    assert t.mor_buckets() == {str(bb): 1}
    after = t.manifest()["buckets"]
    assert after[str(bb)] == before[str(bb)]  # untouched bucket verbatim
    assert after[str(ba)] != before[str(ba)]  # deep bucket rewritten
    assert _state(t) == want

    # second pass folds the remainder; table is fully clean
    assert t.compact()["compacted"] is True
    assert t.mor_buckets() == {}
    assert t.manifest()["mor"] is False
    assert _state(t) == want


def test_compact_drops_fully_tombstoned_bucket(spark, tmp_warehouse):
    """A bucket whose every key was MOR-deleted must disappear from the
    manifest at compaction, not linger as an empty file set."""
    t = LakeTable.create(
        spark,
        os.path.join(tmp_warehouse, "t"),
        sequences_schema(),
        num_buckets=4,
    )
    t.overwrite(
        spark.createDataFrame([("only", [1], 1, "web")], schema=sequences_schema())
    )
    b = _bucket_of(spark, "only", 4)
    t.merge(
        spark.createDataFrame([], sequences_schema()),
        spark.createDataFrame([("only",)], "doc_id string"),
        epochs=[0],
        mode="mor",
    )
    assert t.compact()["compacted"] is True
    m = t.manifest()
    assert str(b) not in m["buckets"]
    assert t.read().count() == 0


def test_legacy_manifest_without_mor_buckets_still_reconstructs(
    spark, tmp_warehouse
):
    """Manifests written before per-bucket tracking carry only the
    table-wide mor flag; they must read (and compact) conservatively —
    every bucket through reconstruction — never as clean unions."""
    import json

    t = _mk(spark, os.path.join(tmp_warehouse, "t"), BASE)
    t.merge(
        spark.createDataFrame([("a", [9], 1, "web")], schema=sequences_schema()),
        spark.createDataFrame([("b",)], "doc_id string"),
        epochs=[0],
        mode="mor",
    )
    want = _state(t)
    v = t.current_version()
    snap = t._snap_path(v)
    m = json.loads(open(snap).read())
    assert m.pop("mor_buckets", None) is not None  # simulate legacy writer
    os.remove(snap)
    with open(snap, "w") as f:
        f.write(json.dumps(m))
    t2 = LakeTable(spark, t.root)
    assert set(t2.mor_buckets()) == set(m["buckets"])  # conservative: all
    assert _state(t2) == want
    assert t2.compact()["compacted"] is True
    assert t2.mor_buckets() == {}
    assert _state(t2) == want


def test_compact_rebases_over_merge_to_other_bucket(spark, tmp_warehouse):
    """Background compaction losing the optimistic race to a merge on a
    DIFFERENT bucket must rebase and keep BOTH effects; racing a merge
    on the bucket being compacted must raise (the merge's delta wins,
    compaction retries later)."""
    import pytest as _pytest

    from dexspark.lake import ConcurrentCommitError, LocalFileIO

    class RaceOnce(LocalFileIO):
        def __init__(self, race):
            self._race, self._armed = race, True

        def put_if_absent(self, path, data):
            if self._armed and os.sep + "snap-" in path:
                self._armed = False
                self._race()
            return super().put_if_absent(path, data)

    root = os.path.join(tmp_warehouse, "t")
    t = _mk(spark, root, BASE)
    nb = t.num_buckets
    t.merge(
        spark.createDataFrame([("a", [9], 1, "web")], schema=sequences_schema()),
        epochs=[0],
        mode="mor",
    )
    other = LakeTable(spark, root)  # the racing writer

    def race_disjoint():
        other.merge(
            spark.createDataFrame([("b", [77], 1, "web")], schema=sequences_schema()),
            epochs=[1],
            mode="mor",
        )

    racer = LakeTable(spark, root, io=RaceOnce(race_disjoint))
    info = racer.compact()
    assert info["compacted"] is True
    t2 = LakeTable(spark, root)
    st = _state(t2)
    assert st["a"]["tokens"] == [9] and st["b"]["tokens"] == [77]
    # a's bucket compacted; b's delta (landed mid-compaction) survives
    assert set(t2.mor_buckets()) == {str(_bucket_of(spark, "b", nb))}

    def race_same_bucket():
        other.merge(
            spark.createDataFrame([("b", [78], 1, "web")], schema=sequences_schema()),
            epochs=[2],
            mode="mor",
        )

    racer2 = LakeTable(spark, root, io=RaceOnce(race_same_bucket))
    with _pytest.raises(ConcurrentCommitError):
        racer2.compact()
    t3 = LakeTable(spark, root)
    assert _state(t3)["b"]["tokens"] == [78]  # the merge's delta won
    assert t3.compact()["compacted"] is True  # retry succeeds cleanly
    assert _state(t3)["b"]["tokens"] == [78]
