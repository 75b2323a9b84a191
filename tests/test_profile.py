"""Per-epoch profiling + drift (operators/profile.py) and the engine
profile sink (EngineConfig.profile)."""

import math

from pyspark.sql import functions as F

from dexspark.operators.profile import drift, profile_events


def _rows(df):
    return {
        (r["batch_epoch"], r["kind"], r["key"]): r["value"] for r in df.collect()
    }


def _mkdf(spark):
    # epoch 0: 4 rows (2 src a, 2 src b), one NULL tokens row;
    # epoch 1: 5 rows (4 src a, 1 src b), shifted n_tok
    rows = [
        ("d1", [1, 2], 2, "a", 0),
        ("d2", [1], 1, "a", 0),
        ("d3", None, 3, "b", 0),
        ("d4", [5, 6, 7], 3, "b", 0),
        ("d1", [1] * 10, 10, "a", 1),
        ("d5", [2] * 20, 20, "a", 1),
        ("d6", [3] * 30, 30, "a", 1),
        ("d7", [4] * 40, 40, "a", 1),
        ("d8", [5] * 50, 50, "b", 1),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, batch_epoch long",
    )


def test_profile_values_exact(spark):
    got = _rows(profile_events(_mkdf(spark)))
    assert got[(0, "n_rows", "_all")] == 4.0
    assert got[(0, "null_frac", "tokens")] == 0.25
    assert got[(0, "null_frac", "doc_id")] == 0.0
    assert got[(0, "source_frac", "a")] == 0.5
    assert got[(1, "source_frac", "a")] == 0.8
    assert got[(1, "min", "n_tok")] == 10.0
    assert got[(1, "max", "n_tok")] == 50.0
    assert got[(1, "mean", "n_tok")] == 30.0
    # small groups: the percentile sketch is exact
    assert got[(1, "p50", "n_tok")] == 30.0
    assert got[(0, "distinct_approx", "doc_id")] == 4.0
    # source fracs sum to 1 per epoch
    for e in (0, 1):
        s = sum(v for (ep, k, _), v in got.items() if ep == e and k == "source_frac")
        assert math.isclose(s, 1.0)


def test_profile_null_source_and_missing_columns(spark):
    df = spark.createDataFrame(
        [("d1", None, 0), ("d2", "a", 0)], "doc_id string, source string, batch_epoch long"
    )
    got = _rows(profile_events(df))
    assert got[(0, "source_frac", "_null")] == 0.5
    # no n_tok column -> no quantile kinds, still profiles the rest
    assert not any(k in ("mean", "p50") for (_, k, _) in got)
    df2 = df.drop("source")
    got2 = _rows(profile_events(df2))
    assert got2[(0, "n_rows", "_all")] == 2.0
    assert not any(k == "source_frac" for (_, k, _) in got2)


def test_drift(spark):
    prof = profile_events(_mkdf(spark))
    d = {(r["kind"], r["key"]): r for r in drift(prof, 0, 1).collect()}
    # source mix moved a: 0.5 -> 0.8, b: 0.5 -> 0.2 => L1 = 0.6
    assert math.isclose(d[("drift_l1", "source_frac")]["abs_diff"], 0.6)
    assert math.isclose(d[("source_frac", "a")]["abs_diff"], 0.3)
    assert d[("n_rows", "_all")]["value_a"] == 4.0
    assert d[("n_rows", "_all")]["value_b"] == 5.0


def test_drift_disjoint_sources_compare_against_zero(spark):
    df = spark.createDataFrame(
        [("d1", "x", 0), ("d2", "y", 1)], "doc_id string, source string, batch_epoch long"
    )
    d = {(r["kind"], r["key"]): r for r in drift(profile_events(df), 0, 1).collect()}
    assert d[("source_frac", "x")]["value_b"] == 0.0
    assert d[("source_frac", "y")]["value_a"] == 0.0
    assert math.isclose(d[("drift_l1", "source_frac")]["abs_diff"], 2.0)


def test_engine_profile_sink(spark, tmp_warehouse):
    """EngineConfig(profile=True): the sink lands per epoch, counts
    the applied upserts (not rejects/deletes), and redelivery leaves
    it byte-identical."""
    import os

    from dexspark import gen
    from dexspark.config import EngineConfig
    from dexspark.lake import LakeTable
    from dexspark.schema import sequences_schema
    from dexspark.stream import CdcEngine

    events = gen.change_events(
        spark, n_events=2000, n_docs=300, n_epochs=3, max_len=16, anomaly_pct=10
    )
    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(events, binlog)
    table_root = os.path.join(tmp_warehouse, "table")
    table = LakeTable.create(
        spark, table_root, sequences_schema(), key="doc_id", num_buckets=4
    )
    eng = CdcEngine(
        spark, table, tmp_warehouse, EngineConfig(num_buckets=4, profile=True)
    )
    eng.apply_binlog(binlog)

    prof = spark.read.parquet(eng.profile_path)
    got = _rows(prof)
    epochs = sorted({e for (e, _, _) in got})
    assert epochs == [0, 1, 2]
    for e in epochs:
        assert got[(e, "n_rows", "_all")] > 0
        # every epoch's source fracs sum to 1
        s = sum(v for (ep, k, _), v in got.items() if ep == e and k == "source_frac")
        assert math.isclose(s, 1.0, rel_tol=1e-9)
    # core payload columns profiled
    assert (0, "null_frac", "tokens") in got
    assert (0, "p50", "n_tok") in got

    # redelivery: identical profile content, no new table version
    v = table.current_version()
    eng2 = CdcEngine(
        spark, LakeTable(spark, table_root), tmp_warehouse,
        EngineConfig(num_buckets=4, profile=True),
    )
    eng2.apply_binlog(binlog)
    assert LakeTable(spark, table_root).current_version() == v
    assert _rows(spark.read.parquet(eng2.profile_path)) == got


def test_cli_drift_mode(spark, tmp_warehouse, capsys):
    """--drift E0,E1 reads the profile sink only (no --table) and
    reports the source-mix L1."""
    import json
    import os

    from dexspark import cli, gen
    from dexspark.config import EngineConfig
    from dexspark.lake import LakeTable
    from dexspark.schema import sequences_schema
    from dexspark.stream import CdcEngine

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(spark, n_events=800, n_docs=150, n_epochs=2, max_len=8),
        binlog,
    )
    t = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "t"), sequences_schema(),
        key="doc_id", num_buckets=2,
    )
    CdcEngine(
        spark, t, tmp_warehouse, EngineConfig(num_buckets=2, profile=True)
    ).apply_binlog(binlog)

    rc = cli.main(["--warehouse", tmp_warehouse, "--drift", "0,1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = {(r["kind"], r["key"]): r for r in out["drift"]}
    assert ("drift_l1", "source_frac") in got
    assert got[("n_rows", "_all")]["value_a"] > 0


def test_patch_mode_profile_sink(spark, tmp_warehouse):
    """EngineConfig(profile=True) also works in patch mode: the sink
    profiles the resolved post-images per epoch."""
    import os

    from dexspark import gen
    from dexspark.config import EngineConfig
    from dexspark.lake import LakeTable
    from dexspark.schema import sequences_schema
    from dexspark.stream import CdcEngine

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(spark, n_events=600, n_docs=120, n_epochs=2, max_len=8),
        binlog,
    )
    t = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "t"), sequences_schema(),
        key="doc_id", num_buckets=2,
    )
    eng = CdcEngine(
        spark, t, tmp_warehouse,
        EngineConfig(num_buckets=2, profile=True, patch_events=True),
    )
    eng.apply_binlog(binlog)
    got = _rows(spark.read.parquet(eng.profile_path))
    epochs = sorted({e for (e, _, _) in got})
    assert epochs == [0, 1]
    for e in epochs:
        assert got[(e, "n_rows", "_all")] > 0
    assert (0, "null_frac", "tokens") in got
