"""Incremental changelog read (LakeTable.changes) — the CDC-out
surface.

The load-bearing property: for ANY commit sequence,
``read(version=v0)`` + ``changes(v0, v1)`` replayed per key
(last-writer-wins by ``_commit_version``, upsert beats delete within
one commit — the same tie-break ``read`` uses) must reconstruct
``read(version=v1)`` exactly. Verified across COW merges, MOR merges,
deletes, overwrites and schema evolution; physical-only commits
(compact / rebucket) must emit nothing.
"""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from dexspark.lake import LakeTable
from dexspark.schema import sequences_schema


def _base(spark, n=20):
    return spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int"), F.lit(1)).alias("tokens"),
        F.lit(2).alias("n_tok"),
        F.lit("src-a").alias("source"),
    )


def _ups(spark, ids, source="src-b"):
    return spark.createDataFrame(
        [(f"doc-{i}", [9, 9, 9], 3, source) for i in ids],
        schema=sequences_schema(),
    )


def _dels(spark, ids):
    return spark.createDataFrame([(f"doc-{i}",) for i in ids], "doc_id string")


def _replay(spark, base_df, changes_df, key="doc_id"):
    """Reconstruct the final state from a snapshot + its changelog."""
    data_cols = [c for c in changes_df.columns if not c.startswith("_change") and c != "_commit_version"]
    b = base_df.select(
        "*",
        F.lit("upsert").alias("_change_type"),
        F.lit(0).alias("_commit_version"),
    )
    allr = b.unionByName(changes_df, allowMissingColumns=True).select(
        *data_cols, "_change_type", "_commit_version"
    )
    win = F.max_by(
        F.struct(*data_cols, F.col("_change_type")),
        F.struct(F.col("_commit_version"), F.col("_change_type") == "upsert"),
    ).alias("_w")
    return (
        allr.groupBy(key)
        .agg(win)
        .filter(F.col("_w._change_type") == "upsert")
        .select(*[F.col(f"_w.{c}").alias(c) for c in data_cols])
    )


def _rows(df):
    return sorted(
        (r["doc_id"], tuple(r["tokens"] or []), r["n_tok"], r["source"])
        for r in df.collect()
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_changes_replay_reconverges(spark, tmp_path, mode):
    t = LakeTable.create(spark, str(tmp_path / "t"), sequences_schema(), num_buckets=4)
    t.overwrite(_base(spark))
    v0 = t.current_version()
    t.merge(_ups(spark, [1, 2, 25]), delete_keys=_dels(spark, [3]), mode=mode)
    t.merge(_ups(spark, [2, 4], source="src-c"), delete_keys=_dels(spark, [25]), mode=mode)
    v1 = t.current_version()

    ch = t.changes(v0, v1)
    assert set(ch.select("_change_type").distinct().toPandas()["_change_type"]) <= {
        "upsert",
        "delete",
    }
    # per-commit versions stamped
    assert set(ch.select("_commit_version").distinct().toPandas()["_commit_version"]) == {
        v0 + 1,
        v0 + 2,
    }
    replayed = _replay(spark, t.read(version=v0), ch)
    assert _rows(replayed) == _rows(t.read(version=v1))
    # the deletes are visible in the feed
    deleted = {
        r["doc_id"] for r in ch.filter(F.col("_change_type") == "delete").collect()
    }
    assert {"doc-3", "doc-25"} <= deleted


def test_mor_changes_read_only_commit_files(spark, tmp_path):
    """MOR changelog is O(change): row count equals the change batch,
    even when the table is much larger."""
    t = LakeTable.create(spark, str(tmp_path / "t"), sequences_schema(), num_buckets=4)
    t.overwrite(_base(spark, n=200))
    v0 = t.current_version()
    t.merge(_ups(spark, [5, 6]), delete_keys=_dels(spark, [7]), mode="mor")
    ch = t.changes(v0)
    assert ch.count() == 3  # 2 upserts + 1 tombstone, not 200 rows
    tomb = ch.filter(F.col("_change_type") == "delete").collect()
    assert [r["doc_id"] for r in tomb] == ["doc-7"]
    assert tomb[0]["tokens"] is None  # key-only pre-image (documented)


def test_cow_delete_carries_preimage(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), sequences_schema(), num_buckets=4)
    t.overwrite(_base(spark))
    v0 = t.current_version()
    t.merge(_ups(spark, [0]), delete_keys=_dels(spark, [8]), mode="cow")
    ch = t.changes(v0)
    pre = ch.filter(F.col("_change_type") == "delete").collect()
    assert len(pre) == 1 and pre[0]["doc_id"] == "doc-8"
    assert pre[0]["tokens"] == [8, 1]  # full pre-image from the COW diff
    # unchanged keys in the rewritten buckets are NOT emitted
    assert ch.count() == 2


def test_physical_commits_emit_nothing(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), sequences_schema(), num_buckets=4)
    t.overwrite(_base(spark))
    t.merge(_ups(spark, [1]), mode="mor")
    v0 = t.current_version()
    t.compact()
    t.rebucket(8)
    t.merge(_ups(spark, []).limit(0), mode="cow")  # no-op merge
    assert t.changes(v0).count() == 0
    ops = [h["operation"] for h in t.history()]
    assert ops == [
        "create",
        "overwrite",
        "merge-mor",
        "compact",
        "rebucket",
        "merge-noop",
    ]


def test_changes_across_overwrite_and_evolution(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), sequences_schema(), num_buckets=4)
    t.overwrite(_base(spark, n=6))
    v0 = t.current_version()
    # additive evolution: new nullable column arrives mid-stream
    evolved = _ups(spark, [1]).withColumn("lang", F.lit("en"))
    t.merge(evolved, mode="cow")
    t.overwrite(_base(spark, n=3))  # shrinking overwrite: 3 survivors
    v1 = t.current_version()
    ch = t.changes(v0, v1)
    assert "lang" in ch.columns  # aligned to the to_version schema
    replayed = _replay(spark, t.read(version=v0), ch)
    got = sorted(r["doc_id"] for r in replayed.collect())
    assert got == sorted(r["doc_id"] for r in t.read(version=v1).collect())


def test_changes_bad_range(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), sequences_schema(), num_buckets=4)
    with pytest.raises(ValueError):
        t.changes(5, 1)


def test_mor_same_commit_upsert_and_delete_tiebreak(spark, tmp_warehouse):
    """A key in BOTH upserts and delete_keys of one merge-mor batch:
    read() resolves the tie to the upsert, so changes() must emit
    only the upsert row — emitting both would let a changelog
    consumer delete a key the snapshot keeps."""
    import os

    t = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "tie"), sequences_schema(),
        key="doc_id", num_buckets=2,
    )
    t.overwrite(_base(spark, 4))
    v0 = t.current_version()
    t.merge(_ups(spark, [1]), _dels(spark, [1, 2]), mode="mor")
    # snapshot keeps doc-1 (upsert wins the same-commit tie)
    snap = {r["doc_id"] for r in t.read().collect()}
    assert "doc-1" in snap and "doc-2" not in snap
    ch = t.changes(v0).collect()
    by_key = {}
    for r in ch:
        by_key.setdefault(r["doc_id"], []).append(r["_change_type"])
    assert by_key["doc-1"] == ["upsert"]  # no contradictory delete row
    assert by_key["doc-2"] == ["delete"]


def test_changes_across_publish_and_rollback_reconverge(spark, tmp_path):
    """A replica tailing changes() across a branch publish (and a
    later rollback) reconverges: both table-wide ops surface as
    ordinary parent-vs-child deltas."""
    t = LakeTable.create(spark, str(tmp_path / "t"), sequences_schema(), num_buckets=4)
    t.overwrite(_base(spark))
    v0 = t.current_version()

    t.create_branch("stage")
    bt = LakeTable(spark, t.root, branch="stage")
    bt.merge(_ups(spark, [1, 30]), delete_keys=_dels(spark, [2]))
    bt.merge(_ups(spark, [30], source="src-c"), mode="mor")
    t.publish_branch("stage")
    v_pub = t.current_version()
    assert t.manifest()["operation"] == "publish"

    ch = t.changes(v0, v_pub)
    replayed = _replay(spark, t.read(version=v0), ch)
    assert _rows(replayed) == _rows(t.read(version=v_pub))
    deleted = {
        r["doc_id"] for r in ch.filter(F.col("_change_type") == "delete").collect()
    }
    assert "doc-2" in deleted

    # rollback the publish; the changelog reconverges over that too
    t.rollback(v0)
    ch2 = t.changes(v0)
    replayed2 = _replay(spark, t.read(version=v0), ch2)
    assert _rows(replayed2) == _rows(t.read())
    assert _rows(t.read()) == _rows(t.read(version=v0))
