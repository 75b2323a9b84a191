"""IVF ANN: exactness at full probe, subset behavior at partial
probe, and the plan shape (broadcast joins, no Python)."""

import os

import pytest
from pyspark.sql import functions as F

from dexspark.operators.ann import build_index, search

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)

N_CELLS = 8


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def index(emb):
    return build_index(emb, n_cells=N_CELLS).localCheckpoint(eager=True)


def _brute(spark, emb, queries, k):
    a = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")).alias("a")
    b = emb.alias("b")
    from dexspark.operators.ann import _cosine
    from pyspark.sql import Window

    scored = (
        a.crossJoin(b)
        .filter(F.col("a.query_id") != F.col("b.vec_id"))
        .select(
            "query_id",
            F.col("b.vec_id").alias("neighbor_id"),
            _cosine(F.col("a.qe"), F.col("b.embedding")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 6).alias("cos_sim"), "rk")
    )


def test_index_assigns_every_vector_once(emb, index):
    assert index.count() == emb.count()
    assert index.groupBy("vec_id").count().filter(F.col("count") > 1).count() == 0
    cells = {r["cell"] for r in index.select("cell").distinct().collect()}
    assert cells <= set(range(N_CELLS))


def test_full_probe_equals_brute_force(spark, emb, index):
    queries = emb.filter(F.col("vec_id") < 5)
    got = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in search(index, queries, k=10, nprobe=N_CELLS, n_cells=N_CELLS).collect()
    }
    want = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in _brute(spark, emb, queries, 10).collect()
    }
    assert got == want


def test_partial_probe_returns_subset_of_candidates(spark, emb, index):
    queries = emb.filter(F.col("vec_id") < 5)
    res = search(index, queries, k=10, nprobe=2, n_cells=N_CELLS).collect()
    # every query answered, ranks contiguous from 1
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r["rk"])
    assert set(by_q) == {0, 1, 2, 3, 4}
    for rks in by_q.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))
    # neighbors come only from the probed cells
    cell_of = {r["vec_id"]: r["cell"] for r in index.collect()}
    for r in res:
        assert r["neighbor_id"] in cell_of


def test_kmeans_refinement_reduces_inertia(spark, emb):
    """Lloyd iterations must not worsen the clustering: mean cosine
    of each vector to its assigned centroid is non-decreasing, and
    full-probe search with refined centroids is still exact."""
    from dexspark.operators.ann import _cosine, centroids, refine_centroids

    def inertia(cts):
        assigned = build_index(emb, n_cells=N_CELLS, cts=cts)
        joined = assigned.join(
            F.broadcast(cts), "cell"
        ).select(_cosine(F.col("embedding"), F.col("centroid")).alias("sim"))
        return joined.agg(F.avg("sim")).collect()[0][0]

    seed = centroids(emb, N_CELLS).localCheckpoint(eager=True)
    refined = refine_centroids(emb, seed, iterations=2)
    assert refined.count() == N_CELLS
    assert inertia(refined) >= inertia(seed) - 1e-9
    # exactness at full probe holds with refined centroids too
    idx = build_index(emb, n_cells=N_CELLS, cts=refined).localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") < 3)
    got = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in search(
            idx, queries, k=5, nprobe=N_CELLS, n_cells=N_CELLS, cts=refined
        ).collect()
    }
    want = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in _brute(spark, emb, queries, 5).collect()
    }
    assert got == want


def test_plan_broadcasts_and_no_python(emb, index):
    queries = emb.filter(F.col("vec_id") < 3)
    plan = (
        search(index, queries, k=5, nprobe=2, n_cells=N_CELLS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan


# --------------------------------------- CDC-maintained index table


def test_sync_index_tracks_source_changes_exactly(spark, tmp_path, emb):
    """The persisted IVF index, maintained ONLY through the source
    table's changelog (changes() -> sync_index), must equal a fresh
    full rebuild of the current source state after every refresh —
    upserts re-assigned, updated vectors re-celled, deletes dropped."""
    from pyspark.sql import types as T

    from dexspark.lake import LakeTable
    from dexspark.operators.ann import (
        centroids,
        index_schema,
        read_index,
        search,
        sync_index_from_table,
    )

    src_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        ]
    )
    base = emb.limit(40).localCheckpoint(eager=True)
    cts = centroids(base, N_CELLS).localCheckpoint(eager=True)

    source = LakeTable.create(
        spark, os.path.join(str(tmp_path), "src"), src_schema,
        key="vec_id", num_buckets=4,
    )
    source.overwrite(base)
    # seed the index from the initial changelog (create -> v_overwrite)
    index = LakeTable.create(
        spark, os.path.join(str(tmp_path), "idx"), index_schema(),
        key="vec_id", num_buckets=4,
    )
    def refresh():
        return sync_index_from_table(source, index, cts)

    def assert_matches_rebuild():
        want = {
            (r["vec_id"], tuple(r["embedding"]), r["cell"])
            for r in build_index(source.read(), n_cells=N_CELLS, cts=cts).collect()
        }
        got = {
            (r["vec_id"], tuple(r["embedding"]), r["cell"])
            for r in index.read().collect()
        }
        assert got == want

    assert refresh()["applied"] is True
    assert_matches_rebuild()
    # the cursor rides the index table's own epoch markers: replay of
    # an already-synced window is a structured no-op (exactly-once)
    v_idx = index.current_version()
    assert refresh() == {
        "synced_through": source.current_version(), "applied": False,
    }
    assert index.current_version() == v_idx

    # update 3 vectors to NEW values (forcing re-cell), insert 2, delete 2
    upd = base.filter(F.col("vec_id").isin(10, 11, 12)).select(
        "vec_id",
        F.reverse("embedding").alias("embedding"),
    )
    ins = base.filter(F.col("vec_id").isin(0, 1)).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        "embedding",
    )
    source.merge(upd.unionByName(ins), epochs=[1])
    source.merge(
        spark.createDataFrame([], src_schema),
        delete_keys=spark.createDataFrame([(20,), (21,)], "vec_id long"),
        epochs=[2],
        mode="mor",
    )
    refresh()
    assert_matches_rebuild()

    # a key updated then deleted across the SAME changelog window must
    # land deleted (latest-commit-wins inside sync_index)
    source.merge(
        base.filter(F.col("vec_id") == 30).select(
            "vec_id", F.reverse("embedding").alias("embedding")
        ),
        epochs=[3],
    )
    source.merge(
        spark.createDataFrame([], src_schema),
        delete_keys=spark.createDataFrame([(30,)], "vec_id long"),
        epochs=[4],
    )
    refresh()
    assert_matches_rebuild()
    assert index.read().filter(F.col("vec_id") == 30).count() == 0

    # the maintained index searches identically to a fresh build
    queries = source.read().filter(F.col("vec_id") < 5)
    want = {
        (r["query_id"], r["rk"], r["neighbor_id"])
        for r in search(
            build_index(source.read(), n_cells=N_CELLS, cts=cts),
            queries, k=3, nprobe=N_CELLS, n_cells=N_CELLS, cts=cts,
        ).collect()
    }
    got = {
        (r["query_id"], r["rk"], r["neighbor_id"])
        for r in search(
            read_index(index), queries, k=3,
            nprobe=N_CELLS, n_cells=N_CELLS, cts=cts,
        ).collect()
    }
    assert got == want
