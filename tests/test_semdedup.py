"""SemDeDup (operators/semdedup) verification.

The Python oracle below replicates the hof path's Spark arithmetic
BIT-EXACTLY: ``ann._dot`` folds ``acc + u*v`` sequentially over the
arrays (``F.aggregate``), norms are staged and multiplied, and Python
floats are the same IEEE doubles, so ``_cos`` reproduces every
similarity to the last ulp — assignment argmax, rank order, and the
tau comparison are then exact, and the kept sets must match exactly
(no tolerance anywhere). The default arrow (numpy-matmul) assignment
is cross-checked against the hof path on the same data.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from dexspark.operators import semdedup as sd
from dexspark.operators.ann import centroids, refine_centroids

SF_DIR = os.environ.get("DEXSPARK_TEST_SF", "/root/testdata/sf0.001")


def _cos(x, y):
    """Bit-exact mirror of the operator's hof path: sequential folds
    for the dots, then dot / (norm_x * norm_y) in that association
    order (norms are staged once and multiplied)."""

    def dot(a, b):
        acc = 0.0
        for u, v in zip(a, b):
            acc = acc + u * v
        return acc

    return dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))


def _py_semdedup(rows, cents, tau, keep="min_id", cell_cap=4096):
    """rows: [(id, emb)], cents: [(cell, centroid)] -> kept id set.

    The paper's upper-triangle rule: in keep-priority order, drop x
    when any EARLIER y (dropped or not) in the same cell has
    cos(x, y) >= tau.
    """
    assign = {}
    for i, e in rows:
        # argmax sim, ties to the lowest cell id (window tie-break)
        best = min(cents, key=lambda c: (-_cos(e, c[1]), c[0]))
        assign[i] = best[0]
    emb = dict(rows)
    cmap = dict(cents)
    dropped = set()
    for cell in sorted({c for c in assign.values()}):
        members = [i for i in assign if assign[i] == cell]
        if len(members) > cell_cap:
            continue
        if keep == "far":
            members.sort(key=lambda i: (_cos(emb[i], cmap[cell]), i))
        else:
            members.sort()
        for xi, x in enumerate(members):
            for y in members[:xi]:
                if _cos(emb[x], emb[y]) >= tau:
                    dropped.add(x)
                    break
    return {i for i, _ in rows} - dropped


def _collect_rows(df, id_col="vec_id"):
    return [(r[id_col], list(r["embedding"])) for r in df.collect()]


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    df.persist().count()
    yield df
    df.unpersist()


def _kept(flags_df):
    return {r["vec_id"] for r in flags_df.collect() if r["keep"]}


def test_min_id_matches_python_oracle_on_testdata(spark, emb):
    # tau=0.25 sits inside the observed pairwise-cosine range, so
    # real drops happen (max pairwise cos on this table is ~0.48)
    flags = sd.semdedup(emb, n_cells=8, tau=0.25, method="hof")
    rows = _collect_rows(emb)
    cents = [(r["cell"], list(r["centroid"])) for r in centroids(emb, 8).collect()]
    expect = _py_semdedup(rows, cents, tau=0.25)
    got = _kept(flags)
    assert got == expect
    assert len(got) < len(rows)  # the threshold actually bites
    assert flags.count() == len(rows)  # every vector flagged


def test_far_rule_matches_python_oracle(spark, emb):
    flags = sd.semdedup(emb, n_cells=8, tau=0.25, keep="far", method="hof")
    rows = _collect_rows(emb)
    cents = [(r["cell"], list(r["centroid"])) for r in centroids(emb, 8).collect()]
    expect = _py_semdedup(rows, cents, tau=0.25, keep="far")
    assert _kept(flags) == expect
    # the two keep rules genuinely differ on this data
    assert expect != _py_semdedup(rows, cents, tau=0.25, keep="min_id")


def test_refined_centroids_path(spark, emb):
    # drive the Python oracle with the SPARK-refined centroids (their
    # float values collected), so Lloyd's FP noise cannot desync the
    # comparison — what's verified is assignment + dedup on top
    cts = refine_centroids(emb, centroids(emb, 8), iterations=2)
    cts.persist().count()
    flags = sd.semdedup(emb, tau=0.25, cts=cts, method="hof")
    cents = [(r["cell"], list(r["centroid"])) for r in cts.collect()]
    expect = _py_semdedup(_collect_rows(emb), cents, tau=0.25)
    assert _kept(flags) == expect
    cts.unpersist()


def test_planted_duplicates_are_dropped(spark, emb):
    # plant a near-copy of each of vectors 100..109 under new ids —
    # tiny uniform scaling keeps cosine == 1.0 exactly
    copies = (
        emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110))
        .select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform(
                "embedding", lambda v: (v * F.lit(1.001)).cast("float")
            ).alias("embedding"),
        )
    )
    flags = sd.semdedup(emb.unionByName(copies), n_cells=8, tau=0.9)
    kept = _kept(flags)
    for i in range(100, 110):
        assert i in kept  # the original (lower id) survives
        assert (i + 100000) not in kept  # the plant is dropped


def test_cell_cap_disables_oversized_cells(spark, emb):
    # cap below every cell size -> no pairs generated -> all kept
    flags = sd.semdedup(emb, n_cells=8, tau=0.0, cell_cap=1)
    assert _kept(flags) == {r[0] for r in _collect_rows(emb)}


def test_survivors_are_stable(spark, emb):
    """Idempotence invariant: by the upper-triangle rule any two kept
    vectors have cos < tau, so a second pass over the survivors (same
    centroids) drops nothing."""
    cts = centroids(emb, 8)
    kept1 = sd.semdedup_keep(emb, tau=0.25, cts=cts)
    kept1.persist()
    flags2 = sd.semdedup(kept1, tau=0.25, cts=cts)
    assert _kept(flags2) == {r["vec_id"] for r in kept1.select("vec_id").collect()}
    kept1.unpersist()


def test_semdedup_against_drops_reference_matches(spark, emb):
    """Cross-corpus decontamination: corpus vectors near an eval-set
    vector are dropped; cells come from the reference side."""
    ref = (
        emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 60))
        .select(
            F.col("vec_id").alias("vec_id"),
            F.transform(
                "embedding", lambda v: (v * F.lit(0.999)).cast("float")
            ).alias("embedding"),
        )
    )
    kept = sd.semdedup_against(emb, ref, n_cells=4, tau=0.9)
    ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    for i in range(50, 60):
        assert i not in ids  # contaminated rows gone
    # nothing else is near a scaled copy at tau=0.9 on this data
    assert len(ids) == emb.count() - 10
    assert kept.columns == emb.columns  # full rows survive


def test_semdedup_against_cell_cap_degrades_open(spark, emb):
    ref = emb.limit(20)
    kept = sd.semdedup_against(emb, ref, n_cells=4, tau=0.0, cell_cap=0)
    assert kept.count() == emb.count()  # capped-out cells: keep all


def test_arrow_assignment_matches_hof(spark, emb):
    """The default numpy-matmul assignment and the pure-JVM fold agree
    on every cell and every kept id on the real table (they can only
    diverge on float-rounding centroid ties, absent in random data) —
    for both keep rules."""
    for keep in ("min_id", "far"):
        a = sd.semdedup(emb, n_cells=8, tau=0.25, keep=keep, method="arrow")
        h = sd.semdedup(emb, n_cells=8, tau=0.25, keep=keep, method="hof")
        rows_a = {r["vec_id"]: (r["cell"], r["keep"]) for r in a.collect()}
        rows_h = {r["vec_id"]: (r["cell"], r["keep"]) for r in h.collect()}
        assert rows_a == rows_h, keep


def test_bad_keep_rejected(spark, emb):
    with pytest.raises(ValueError, match="keep"):
        sd.semdedup(emb, keep="random")
    with pytest.raises(ValueError, match="method"):
        sd.semdedup(emb, method="gpu")


def test_plan_no_python_no_cartesian(spark, emb):
    flags = sd.semdedup(emb, n_cells=8, tau=0.25)
    plan = flags._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # the only cartesian is the broadcast-centroid assignment; the
    # candidate join must be a cell-equality join
    assert "CartesianProduct" not in plan
