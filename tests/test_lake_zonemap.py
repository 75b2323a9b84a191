"""Manifest zone maps: per-file merge-key [min,max] bounds collected
from parquet footers at commit time and used for driver-side file
pruning in lookup()/scan_range() (the Iceberg per-file column-bounds
manifest stats). SURVEY.md F2 point read at 10^10-row scale: bucket
hash -> manifest bounds -> row-group stats/bloom, each layer dropping
files before the next ever opens them."""

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
        os.path.join(tmp_warehouse, "zm"),
        sequences_schema(),
        key="doc_id",
        num_buckets=4,
        properties={"sort_on_write": True},
    )
    t.overwrite(_seqs(spark, [f"doc-{i:04d}" for i in range(40)]))
    return t


def _live_files(m):
    return {rel for fs in m["buckets"].values() for rel in fs}


def test_bounds_collected_and_live(spark, table):
    m = table.manifest()
    fb = m["file_bounds"]
    assert set(fb) == _live_files(m)  # every live file has bounds
    for mn, mx in fb.values():
        assert isinstance(mn, str) and mn <= mx
        assert mn.startswith("doc-") and mx.startswith("doc-")


def test_bounds_survive_merge_compact_rebucket_vacuum(spark, table):
    # MOR appends, a COW merge, compact, rebucket: after each commit
    # the bounds map covers exactly the live files (no orphan entries,
    # no uncovered files) and lookups stay exact.
    for batch in (["doc-0001", "zz-new"], ["doc-0039", "aa-new"]):
        table.merge(_seqs(spark, batch, src="m"), mode="mor")
    table.merge(_seqs(spark, ["doc-0002"], src="cow"), mode="cow")
    assert set(table.manifest()["file_bounds"]) == _live_files(table.manifest())
    table.compact()
    assert set(table.manifest()["file_bounds"]) == _live_files(table.manifest())
    table.rebucket(8)
    m = table.manifest()
    assert set(m["file_bounds"]) == _live_files(m)
    table.vacuum(keep_last=1, min_age_seconds=0)
    got = {r["doc_id"]: r["source"] for r in table.read().collect()}
    assert got["doc-0001"] == "m" and got["doc-0002"] == "cow"
    assert got["zz-new"] == "m" and len(got) == 42


def test_lookup_prunes_files_and_stays_exact(spark, table):
    # Deep MOR history: each commit adds files per touched bucket.
    for i in range(6):
        table.merge(_seqs(spark, [f"doc-{i:04d}"], src=f"v{i}"), mode="mor")
    m = table.manifest()
    fb = m["file_bounds"]
    # The zone maps are selective: for a key in only the base + one MOR
    # commit, most MOR files' bounds exclude it.
    kept = [rel for rel, b in fb.items() if LakeTable._may_contain(b, "doc-0003", "doc-0003")]
    assert len(kept) < len(fb)
    rows = table.lookup("doc-0003").collect()
    assert len(rows) == 1 and rows[0]["source"] == "v3"
    # a key pruned to zero files returns empty, not an error
    assert table.lookup("nope-xyz").count() == 0


def test_scan_range_exact_vs_full_filter(spark, table):
    table.merge(_seqs(spark, ["doc-0010", "doc-0025"], src="m"), mode="mor")
    lo, hi = "doc-0008", "doc-0012"
    got = {
        r["doc_id"]: r["source"] for r in table.scan_range(lo, hi).collect()
    }
    want = {
        r["doc_id"]: r["source"]
        for r in table.read().filter(F.col("doc_id").between(lo, hi)).collect()
    }
    assert got == want and got["doc-0010"] == "m" and len(got) == 5


def test_missing_bounds_is_conservative(spark, table):
    # Manifests without file_bounds (older tables / zone_maps=false)
    # read and look up exactly as before — pruning just doesn't happen.
    import json

    m = table.manifest()
    m.pop("file_bounds")
    m["version"] += 1
    m["parent"] = m["version"] - 1
    table.io.put_if_absent(table._snap_path(m["version"]), json.dumps(m))
    assert table.lookup("doc-0007").count() == 1
    assert table.scan_range("doc-0000", "doc-0005").count() == 6


def test_zone_maps_property_disables_collection(spark, tmp_warehouse):
    t = LakeTable.create(
        spark,
        os.path.join(tmp_warehouse, "nozm"),
        sequences_schema(),
        num_buckets=2,
        properties={"zone_maps": False},
    )
    t.overwrite(_seqs(spark, ["a", "b"]))
    assert t.manifest()["file_bounds"] == {}
    assert t.lookup("a").count() == 1
