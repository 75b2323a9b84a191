"""LakeTable.lookup_many — the batched, bucket-pruned point read.

The probe primitive for batch-vs-index workloads: one job answers a
whole micro-batch's key set, reading only the buckets those keys hash
to (plus zone-map file pruning), never the full table. SURVEY.md F2
at 10^10 rows, batched.
"""

import os

import pytest
from pyspark.sql import functions as F

from dexspark.lake import LakeTable
from dexspark.schema import sequences_schema


def _seqs(spark, ids, src="web"):
    return spark.createDataFrame(
        [(i, [len(i)], 1, src) for i in ids], schema=sequences_schema()
    )


@pytest.fixture()
def table(spark, tmp_warehouse):
    t = LakeTable.create(
        spark,
        os.path.join(tmp_warehouse, "lm"),
        sequences_schema(),
        key="doc_id",
        num_buckets=8,
        properties={"sort_on_write": True},
    )
    t.overwrite(_seqs(spark, [f"doc-{i:04d}" for i in range(200)]))
    return t


def test_exact_and_missing_keys(spark, table):
    got = table.lookup_many(["doc-0003", "doc-0150", "nope"]).collect()
    assert sorted(r["doc_id"] for r in got) == ["doc-0003", "doc-0150"]


def test_empty_probe_returns_empty_with_schema(spark, table):
    df = table.lookup_many([])
    assert df.count() == 0
    # nullability may differ between an empty literal frame and a
    # parquet scan; names+types are the contract
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in table.read().schema.fields
    ]


def test_duplicate_probe_keys_collapse(spark, table):
    got = table.lookup_many(["doc-0007"] * 5).collect()
    assert len(got) == 1 and got[0]["doc_id"] == "doc-0007"


def test_prunes_to_probe_buckets(spark, table):
    # The scan must read strictly fewer files than the full table:
    # 3 probe keys hash to <= 3 of 8 buckets.
    total_files = sum(len(fs) for fs in table.manifest()["buckets"].values())
    df = table.lookup_many(["doc-0000", "doc-0001", "doc-0002"])
    scanned = len(df.inputFiles())
    assert 0 < scanned < total_files  # <= 3 of 8 buckets' files
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan


def test_mor_tail_still_exact(spark, table):
    table.merge(_seqs(spark, ["doc-0005", "zz-new"], src="m"), mode="mor")
    got = {
        r["doc_id"]: r["source"]
        for r in table.lookup_many(["doc-0005", "zz-new", "doc-0006"]).collect()
    }
    assert got == {"doc-0005": "m", "zz-new": "m", "doc-0006": "web"}


def test_large_probe_set_switches_to_semi_join(spark, table):
    keys = [f"doc-{i:04d}" for i in range(200)] + [f"missing-{i}" for i in range(100)]
    df = table.lookup_many(keys)
    assert df.count() == 200
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_probe_dataframe_variant(spark, table):
    keys = spark.createDataFrame(
        [("doc-0003",), ("doc-0150",), ("nope",), (None,), ("doc-0003",)],
        "k: string",
    )
    df = table.probe(keys)
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == ["doc-0003", "doc-0150"]
    # bucket-pruned: strictly fewer files than the full snapshot
    total_files = sum(len(fs) for fs in table.manifest()["buckets"].values())
    assert 0 < len(df.inputFiles()) < total_files
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_probe_empty_and_all_null_keys(spark, table):
    empty = spark.createDataFrame([], "k: string")
    assert table.probe(empty).count() == 0
    nulls = spark.createDataFrame([(None,)], "k: string")
    assert table.probe(nulls).count() == 0


def test_probe_agrees_with_lookup_many_after_mor(spark, table):
    table.merge(_seqs(spark, ["doc-0005", "zz-new"], src="m"), mode="mor")
    probe = ["doc-0005", "zz-new", "doc-0006", "absent"]
    via_probe = {
        (r["doc_id"], r["source"])
        for r in table.probe(
            spark.createDataFrame([(k,) for k in probe], "k: string")
        ).collect()
    }
    via_list = {
        (r["doc_id"], r["source"]) for r in table.lookup_many(probe).collect()
    }
    assert via_probe == via_list and len(via_probe) == 3


def test_agrees_with_single_lookups(spark, table):
    probe = ["doc-0190", "doc-0042", "absent", "doc-0000"]
    many = {r["doc_id"] for r in table.lookup_many(probe).collect()}
    singles = {
        r["doc_id"] for v in probe for r in table.lookup(v).collect()
    }
    assert many == singles == {"doc-0190", "doc-0042", "doc-0000"}
