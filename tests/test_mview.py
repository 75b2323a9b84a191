"""Incremental materialized aggregate view (operators/mview.py).

Contract under test: after any sequence of source commits,
``refresh_agg_view`` leaves the view EXACTLY equal to the defining
query run wholesale over the current snapshot (``full_agg``), while
reading only the changelog + pre-images — and re-running a refresh
with no new commits is a no-op (exactly-once cursor = the view's own
epoch markers, same construction as the ingest engine's binlog
epochs). Mirrors the reference's downstream report rollups (SURVEY
A1/A4) at changelog cost.
"""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from dexspark.lake import LakeTable
from dexspark.operators.mview import (
    create_agg_view,
    full_agg,
    read_view,
    refresh_agg_view,
)
from dexspark.schema import sequences_schema

GROUP = ["source"]
SUMS = {"n_tok": "sum_n_tok"}


def _rows(spark, rows):
    return spark.createDataFrame(rows, schema=sequences_schema())


def _dels(spark, ids):
    return spark.createDataFrame([(f"d{i}",) for i in ids], "doc_id string")


def _assert_view_equals_full(source, view):
    got = read_view(view).orderBy("source").collect()
    want = (
        full_agg(source.read(), GROUP, SUMS).orderBy("source").collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


@pytest.fixture()
def source(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "src"), sequences_schema(), num_buckets=4
    )
    t.merge(
        _rows(
            spark,
            [(f"d{i}", [1, 2], 2, "a" if i % 2 else "b") for i in range(10)],
        )
    )
    return t


def test_initial_refresh_is_full_build(spark, tmp_path, source):
    view = create_agg_view(
        spark, str(tmp_path / "v"), source, GROUP, SUMS, num_buckets=2
    )
    info = refresh_agg_view(source, view, GROUP, SUMS)
    assert info["applied"] and info["synced_through"] == source.current_version()
    _assert_view_equals_full(source, view)
    # 5 docs per source, 2 tokens each
    m = {r["source"]: r for r in read_view(view).collect()}
    assert m["a"]["n_rows"] == 5 and m["a"]["sum_n_tok"] == 10


def test_refresh_idempotent_no_new_commits(spark, tmp_path, source):
    view = create_agg_view(spark, str(tmp_path / "v"), source, GROUP, SUMS)
    refresh_agg_view(source, view, GROUP, SUMS)
    v_before = view.current_version()
    info = refresh_agg_view(source, view, GROUP, SUMS)
    assert info == {
        "synced_through": source.current_version(),
        "applied": False,
    }
    assert view.current_version() == v_before
    _assert_view_equals_full(source, view)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_updates_deletes_group_moves(spark, tmp_path, source, mode):
    view = create_agg_view(spark, str(tmp_path / "v"), source, GROUP, SUMS)
    refresh_agg_view(source, view, GROUP, SUMS, mode=mode)
    # update in place (d1 stays in a, longer), move d3 a->b, move d4
    # b->c (new group), delete d2 & d6, insert d10 into c — as TWO
    # source commits (one MOR, one COW) folded by ONE refresh
    source.merge(
        _rows(spark, [("d1", [1] * 7, 7, "a"), ("d3", [1] * 3, 3, "b")]),
        delete_keys=_dels(spark, [2]),
        mode="mor",
    )
    source.merge(
        _rows(spark, [("d4", [1], 1, "c"), ("d10", [1, 1], 2, "c")]),
        delete_keys=_dels(spark, [6]),
    )
    info = refresh_agg_view(source, view, GROUP, SUMS, mode=mode)
    assert info["applied"]
    _assert_view_equals_full(source, view)
    # intermediate-state cancellation: update the same key twice in
    # the window; only endpoints may contribute
    source.merge(_rows(spark, [("d1", [2], 1, "a")]), mode="mor")
    source.merge(_rows(spark, [("d1", [2] * 4, 4, "a")]), mode="mor")
    refresh_agg_view(source, view, GROUP, SUMS, mode=mode)
    _assert_view_equals_full(source, view)


def test_group_vanishes_when_last_row_deleted(spark, tmp_path, source):
    view = create_agg_view(spark, str(tmp_path / "v"), source, GROUP, SUMS)
    refresh_agg_view(source, view, GROUP, SUMS)
    # delete every 'a' doc (odd ids)
    source.merge(
        _rows(spark, []), delete_keys=_dels(spark, [1, 3, 5, 7, 9])
    )
    refresh_agg_view(source, view, GROUP, SUMS)
    _assert_view_equals_full(source, view)
    assert read_view(view).filter(F.col("source") == "a").count() == 0
    # and it comes back on re-insert
    source.merge(_rows(spark, [("d100", [1], 1, "a")]))
    refresh_agg_view(source, view, GROUP, SUMS)
    _assert_view_equals_full(source, view)


def test_rebucket_inside_refresh_window(spark, tmp_path, source):
    """Pre-image probe must use the SYNCED manifest's bucket count,
    not the current one — a rebucket between refreshes would otherwise
    misprune the probe and corrupt retractions."""
    view = create_agg_view(spark, str(tmp_path / "v"), source, GROUP, SUMS)
    refresh_agg_view(source, view, GROUP, SUMS)
    source.merge(_rows(spark, [("d1", [1] * 9, 9, "a")]))
    source.rebucket(8)
    source.merge(
        _rows(spark, [("d2", [1] * 5, 5, "b")]), delete_keys=_dels(spark, [3])
    )
    refresh_agg_view(source, view, GROUP, SUMS)
    _assert_view_equals_full(source, view)


def test_multi_column_group(spark, tmp_path):
    schema = T.StructType(
        list(sequences_schema().fields)
        + [T.StructField("lang", T.StringType(), True)]
    )
    src = LakeTable.create(spark, str(tmp_path / "src"), schema, num_buckets=4)
    rows = [
        (f"d{i}", [1, 2, 3], 3, ["a", "b"][i % 2], ["en", "fr"][i % 3 == 0])
        for i in range(12)
    ]
    src.merge(spark.createDataFrame(rows, schema=schema))
    group, sums = ["source", "lang"], {"n_tok": "sum_n_tok"}
    view = create_agg_view(spark, str(tmp_path / "v"), src, group, sums)
    refresh_agg_view(src, view, group, sums)
    got = read_view(view).orderBy("source", "lang").collect()
    want = (
        full_agg(src.read(), group, sums)
        .drop("_gkey")
        .orderBy("source", "lang")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    # move a doc across BOTH group dimensions and re-check
    src.merge(
        spark.createDataFrame(
            [("d0", [9], 1, "b", "fr")], schema=schema
        ),
        delete_keys=_dels(spark, [1]),
        mode="mor",
    )
    refresh_agg_view(src, view, group, sums)
    got = read_view(view).orderBy("source", "lang").collect()
    want = (
        full_agg(src.read(), group, sums)
        .drop("_gkey")
        .orderBy("source", "lang")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_refresh_is_crash_atomic_with_cursor(spark, tmp_path, source):
    """The cursor advances in the SAME commit as the data: simulate a
    'crash before merge' by just not calling merge — the view is
    unchanged and a later refresh folds everything; simulate 'merge
    landed' by a completed refresh — re-running is a no-op. (The
    atomicity itself is LakeTable._commit's conditional put, already
    exercised by the engine's epoch tests.)"""
    view = create_agg_view(spark, str(tmp_path / "v"), source, GROUP, SUMS)
    refresh_agg_view(source, view, GROUP, SUMS)
    source.merge(_rows(spark, [("d50", [1] * 6, 6, "b")]))
    # crash window: nothing applied yet — view still equals OLD snapshot
    w, _ = view.epoch_state()
    assert w < source.current_version()
    refresh_agg_view(source, view, GROUP, SUMS)
    _assert_view_equals_full(source, view)
    w2, _ = view.epoch_state()
    assert w2 == source.current_version()


def test_refresh_across_source_rename(spark, tmp_path, source):
    """A rename of the key or a summed column between refreshes must
    not break the pre-image probe (it reads the synced snapshot under
    OLD names and joins changelog keys under NEW names)."""
    view = create_agg_view(spark, str(tmp_path / "v"), source, GROUP, SUMS)
    refresh_agg_view(source, view, GROUP, SUMS)
    source.rename_column("doc_id", "document_id")
    source.rename_column("n_tok", "tok_count")
    source.merge(
        spark.createDataFrame(
            [("d1", [1] * 9, 9, "a"), ("d50", [1] * 4, 4, "b")],
            "document_id string, tokens array<int>, tok_count int, source string",
        ),
        delete_keys=spark.createDataFrame([("d2",)], "document_id string"),
        mode="mor",
    )
    sums2 = {"tok_count": "sum_n_tok"}  # renamed source column, same view col
    refresh_agg_view(source, view, GROUP, sums2)
    got = read_view(view).orderBy("source").collect()
    want = (
        full_agg(source.read(), GROUP, sums2).orderBy("source").collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
