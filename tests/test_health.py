"""One-shot health rollup (health.warehouse_health, CLI --health)."""

import json
import os

from dexspark import gen
from dexspark.config import EngineConfig
from dexspark.health import warehouse_health
from dexspark.lake import LakeTable
from dexspark.schema import sequences_schema
from dexspark.stream import CdcEngine


def _run_engine(spark, tmp_warehouse, **cfg_kwargs):
    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=2000, n_docs=300, n_epochs=3, max_len=16,
            anomaly_pct=10,
        ),
        binlog,
    )
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "t"), sequences_schema(),
        key="doc_id", num_buckets=4,
    )
    eng = CdcEngine(
        spark, table, tmp_warehouse, EngineConfig(num_buckets=4, **cfg_kwargs)
    )
    eng.apply_binlog(binlog)
    return table, eng


def test_health_full_deployment(spark, tmp_warehouse):
    table, eng = _run_engine(
        spark, tmp_warehouse, profile=True, applied_lineage=True
    )
    h = warehouse_health(spark, table, tmp_warehouse)

    t = h["table"]
    assert t["epoch_watermark"] == 2 and t["epoch_tail"] == []
    assert t["version"] == table.current_version()

    s = h["sinks"]
    assert s["lineage"]["epochs"] == 3 and s["lineage"]["rows"] > 0
    assert s["applied"]["epochs"] == 3 and s["applied"]["rows"] > 0
    assert s["profile"]["epochs"] == 3
    assert s["profile_sketch"] == {"live_epochs": 3, "packed": False}

    q = s["quarantine"]
    assert q["rows"] > 0  # anomaly_pct=10 guarantees rejects
    assert q["top_reasons"] and all(
        r["n"] > 0 and isinstance(r["reason"], str) for r in q["top_reasons"]
    )
    # descending, ties broken by reason
    ns = [r["n"] for r in q["top_reasons"]]
    assert ns == sorted(ns, reverse=True)
    json.dumps(h)  # fully serializable


def test_health_minimal_deployment(spark, tmp_warehouse):
    """Sinks that are off report null, not errors."""
    table, _ = _run_engine(spark, tmp_warehouse)  # no profile/applied
    h = warehouse_health(spark, table, tmp_warehouse)
    s = h["sinks"]
    assert s["applied"] is None
    assert s["profile"] is None
    assert s["profile_sketch"] is None
    assert s["lineage"]["epochs"] == 3
    assert s["quarantine"]["rows"] > 0


def test_cli_health_mode(spark, tmp_warehouse, capsys):
    from dexspark import cli

    table, _ = _run_engine(spark, tmp_warehouse, profile=True)
    rc = cli.main(
        ["--table", table.root, "--warehouse", tmp_warehouse, "--health"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["table"]["epoch_watermark"] == 2
    assert out["sinks"]["profile"]["epochs"] == 3
    assert out["sinks"]["quarantine"]["top_reasons"]


def test_binlog_lag(spark, tmp_warehouse):
    """Lag counts exactly the events in uncommitted non-negative
    epochs; falls to zero after applying."""
    from dexspark.health import binlog_lag

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=1200, n_docs=200, n_epochs=4, max_len=8,
            anomaly_pct=10,
        ),
        binlog,
    )
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "t"), sequences_schema(),
        key="doc_id", num_buckets=4,
    )
    lag0 = binlog_lag(spark, table, binlog)
    # fresh table: everything attributable is pending
    assert lag0["epoch_watermark"] == -1
    assert lag0["pending_epochs"] == 4 and lag0["head_epoch"] == 3
    assert (
        lag0["pending_events"] + lag0["unattributable_events"]
        == lag0["total_events"]
        == 1200
    )

    eng = CdcEngine(spark, table, tmp_warehouse, EngineConfig(num_buckets=4))
    eng.apply_binlog(binlog)
    lag1 = binlog_lag(
        spark, LakeTable(spark, os.path.join(tmp_warehouse, "t")), binlog
    )
    assert lag1["epoch_watermark"] == 3
    assert lag1["pending_events"] == 0 and lag1["pending_epochs"] == 0
    assert lag1["head_epoch"] is None
    assert lag1["unattributable_events"] == lag0["unattributable_events"]


def test_cli_health_with_lag(spark, tmp_warehouse, capsys):
    from dexspark import cli

    table, _ = _run_engine(spark, tmp_warehouse)
    binlog = os.path.join(tmp_warehouse, "binlog")
    rc = cli.main(
        [
            "--table", table.root, "--warehouse", tmp_warehouse,
            "--binlog", binlog, "--health",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["lag"]["pending_events"] == 0
    assert out["lag"]["epoch_watermark"] == 2


def test_quarantine_drift_exact_and_cli(spark, tmp_warehouse, capsys):
    """Hand-built quarantine partitions -> exact fractions/deltas/L1;
    CLI mode agrees."""
    from dexspark import cli
    from dexspark.health import quarantine_drift

    rows = (
        # epoch 0: 3 rows -> reasons A(2), B(2)  (one row has both)
        [(0, ["A"]), (0, ["A", "B"]), (0, ["B"])]
        # epoch 1: 2 rows -> reasons B(1), C(1)
        + [(1, ["B"]), (1, ["C"])]
    )
    df = spark.createDataFrame(
        rows, "batch_epoch long, fail_reasons array<string>"
    )
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_epoch")
        .parquet(os.path.join(tmp_warehouse, "quarantine"))
    )
    d = quarantine_drift(spark, tmp_warehouse, 0, 1)
    # fractions are of REASON OCCURRENCES per epoch: e0 tot=4, e1 tot=2
    assert d["occurrences_a"] == 4 and d["occurrences_b"] == 2
    assert d["reasons"]["A"] == {"frac_a": 0.5, "frac_b": 0.0, "delta": -0.5}
    assert d["reasons"]["B"] == {"frac_a": 0.5, "frac_b": 0.5, "delta": 0.0}
    assert d["reasons"]["C"] == {"frac_a": 0.0, "frac_b": 0.5, "delta": 0.5}
    assert d["drift_l1"] == 1.0

    rc = cli.main(
        ["--warehouse", tmp_warehouse, "--quarantine-drift", "0,1"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == d


def test_binlog_lag_parquet_encoding(spark, tmp_warehouse):
    """A structured parquet binlog must sniff correctly: read as JSON
    it would count every event unattributable (regression)."""
    from dexspark.health import binlog_lag

    binlog = os.path.join(tmp_warehouse, "plog")
    gen.write_binlog_parquet(
        gen.change_events(
            spark, n_events=600, n_docs=100, n_epochs=3, max_len=8,
            anomaly_pct=0,
        ),
        binlog,
    )
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "t2"), sequences_schema(),
        key="doc_id", num_buckets=4,
    )
    lag = binlog_lag(spark, table, binlog)
    assert lag["total_events"] == 600
    assert lag["unattributable_events"] == 0
    assert lag["pending_epochs"] == 3


def test_health_empty_quarantine_dir(spark, tmp_warehouse):
    """A fully-healthy run can leave the quarantine dir EMPTY (created,
    zero rows): health must report rows=0, not crash on parquet schema
    inference (regression)."""
    from dexspark.health import warehouse_health

    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "t3"), sequences_schema(),
        key="doc_id", num_buckets=2,
    )
    os.makedirs(os.path.join(tmp_warehouse, "quarantine"))
    h = warehouse_health(spark, table, tmp_warehouse)
    assert h["sinks"]["quarantine"] == {
        "epochs": 0,
        "fallback_epochs": 0,
        "rows": 0,
        "top_reasons": [],
    }
