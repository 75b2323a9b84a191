"""Last-writer-wins dedup: the three implementations agree and honor
the (commit_ts, lsn) total order incl. ties (SURVEY.md A5/§2.6)."""

from datetime import datetime

import pytest
from pyspark.sql import types as T

from dexspark.dedup import latest_per_key, latest_per_key_salted, latest_per_key_window

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("commit_ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def ts(s):
    return datetime.fromisoformat(s)


ROWS = [
    # k1: strictly increasing commit_ts
    ("k1", ts("2024-01-01 00:00:01"), 1, "old"),
    ("k1", ts("2024-01-01 00:00:03"), 2, "new"),
    ("k1", ts("2024-01-01 00:00:02"), 3, "mid"),
    # k2: commit_ts tie -> lsn breaks it
    ("k2", ts("2024-01-01 00:00:05"), 10, "lo"),
    ("k2", ts("2024-01-01 00:00:05"), 11, "hi"),
    # k3: single event
    ("k3", ts("2024-01-01 00:00:09"), 20, "only"),
]
WANT = {"k1": "new", "k2": "hi", "k3": "only"}


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


@pytest.mark.parametrize("impl", [latest_per_key_window, latest_per_key, latest_per_key_salted])
def test_latest_per_key(df, impl):
    got = {r["doc_id"]: r["v"] for r in impl(df).collect()}
    assert got == WANT


def test_hot_key_parity(spark):
    """1000 events on ONE key: aggregate and salted forms must equal the
    window form (skew path correctness)."""
    rows = [
        ("hot", ts("2024-01-01 00:00:00"), i, f"v{i}") for i in range(1000)
    ]
    df = spark.createDataFrame(rows, SCHEMA).repartition(8)
    w = {r["doc_id"]: r["v"] for r in latest_per_key_window(df).collect()}
    a = {r["doc_id"]: r["v"] for r in latest_per_key(df).collect()}
    s = {r["doc_id"]: r["v"] for r in latest_per_key_salted(df, salt_buckets=16).collect()}
    assert w == a == s == {"hot": "v999"}


def test_aggregate_form_has_partial_aggregation(df):
    """The scale rationale: max_by must show a partial HashAggregate
    before the exchange (map-side combine kills hot-key skew)."""
    plan = latest_per_key(df)._jdf.queryExecution().executedPlan().toString()
    # partial_max_by below the Exchange = map-side combine of each hot key
    assert "partial_max_by" in plan
    assert plan.index("Exchange") < plan.index("partial_max_by")
