"""Self-check of the driver contract: a subset of __spark_entry__
queries vs their DuckDB oracles at sf0.001 (the full set is verified
by tools/check_oracle.py and by the driver at sf0.01)."""

import math
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
SUBSET = [
    "q1_pricing_summary",
    "a5_dedup_latest",
    "v17_fail_reasons",
    "dedup_minhash_lsh",
    "ann_lsh_bucketed",
    "text_langid",
    "multimodal_decode",
    "j5_asof_join",
    "stream_window_counts",
    "f6_metadata_required_keys",
    "text_quality_gates",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6g}"
    if isinstance(v, bool):
        return int(v)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as m

    return m


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, entrymod, duck, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(entrymod.oracle_sql()[name])
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert _rowset(s_cols, s_rows) == _rowset(d_cols, d_rows)


def test_lsh_bucket_cap_matches_production_and_bounds_pairs(spark):
    """The query-path LSH band buckets carry the SAME hot-bucket cap as
    the production near-dup index (POSTING_CAP), and a batch of
    near-identical docs yields at most C(cap, 2) candidate pairs per
    band instead of going quadratic."""
    import pyspark.sql.functions as F

    from dexspark import queries as Q
    from dexspark.operators.dedup_index import POSTING_CAP

    assert Q._LSH_BUCKET_CAP == POSTING_CAP
    n = POSTING_CAP + 40  # one bucket, over the cap
    docs = spark.createDataFrame(
        [(f"d{i:04d}", "the same exact text repeated for every document "
          "alpha beta gamma delta epsilon zeta eta theta") for i in range(n)],
        "doc_id string, text string",
    )
    orig_t = Q._t
    Q._t = lambda s, d, name: docs
    try:
        per_band = {
            r["band"]: r["n_candidate_pairs"]
            for r in Q.dedup_minhash_lsh(spark, "ignored").collect()
        }
        pair_rows = Q._minhash_candidate_pairs(spark, "ignored")
        got = pair_rows.groupBy("band").agg(
            F.count("*").alias("n")
        ).collect()
    finally:
        Q._t = orig_t
    cap_pairs = POSTING_CAP * (POSTING_CAP - 1) // 2
    assert per_band and all(v == cap_pairs for v in per_band.values())
    # the materialized pair path agrees with the arithmetic count
    assert {r["band"]: r["n"] for r in got} == per_band


def test_entry_smoke(spark, entrymod):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "sum_disc_price" in df.columns


def test_every_query_has_callable(entrymod):
    qs = entrymod.queries()
    # the correctness gate checks the FIRST 50 registered entries:
    # stay at exactly <= 50 (merge queries rather than exceeding the
    # window) and give every single one a DuckDB oracle
    assert 35 <= len(qs) <= 50
    assert set(qs) == set(entrymod.oracle_sql())
