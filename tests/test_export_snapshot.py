"""Snapshot export: the producer half of the CDC bootstrap handoff.

``LakeTable.export_snapshot`` dumps a consistent snapshot (parquet +
``_position.json`` sidecar carrying the epoch watermark); a
downstream table bootstraps from the dump and tails the SAME binlog,
applying only newer epochs — completing the A-exports -> B-bootstraps
-> B-tails chain that previously required the operator to hand-build
the dump and know its position (reference has no incremental handoff;
it re-validates whole files — north_star: replay reconvergence from
any cut)."""

import json
import os
import re
import shutil

import pytest
from pyspark.sql import functions as F

from dexspark import gen, oracle
from dexspark.config import EngineConfig
from dexspark.lake import LakeTable
from dexspark.schema import sequences_schema
from dexspark.stream import CdcEngine

N_DOCS = 150
N_EVENTS = 1_200
N_EPOCHS = 6
CUT = 2  # producer A has applied epochs 0..CUT when it exports


def _epoch_of(path: str) -> int:
    return int(re.search(r"epoch-(\d+)-", os.path.basename(path)).group(1))


@pytest.fixture()
def setup(spark, tmp_warehouse):
    binlog = os.path.join(tmp_warehouse, "binlog")
    files = gen.write_binlog(
        gen.change_events(
            spark, n_events=N_EVENTS, n_docs=N_DOCS, n_epochs=N_EPOCHS,
            max_len=12, anomaly_pct=8,
        ),
        binlog,
    )
    # producer A's view at export time: only the early epochs
    early_dir = os.path.join(tmp_warehouse, "binlog_early")
    os.makedirs(early_dir)
    for f in files:
        if _epoch_of(f) <= CUT:
            shutil.copy(f, early_dir)
    a_root = os.path.join(tmp_warehouse, "A")
    os.makedirs(a_root)
    a_table = LakeTable.create(
        spark, os.path.join(a_root, "sequences"), sequences_schema(),
        key="doc_id", num_buckets=8,
    )
    CdcEngine(spark, a_table, a_root, EngineConfig(num_buckets=8)).apply_binlog(
        early_dir
    )
    return binlog, files, a_table


def test_export_then_bootstrap_then_tail(spark, tmp_warehouse, setup):
    binlog, files, a_table = setup
    dump = os.path.join(tmp_warehouse, "dump")

    sidecar = a_table.export_snapshot(dump)
    assert sidecar["position"] == CUT
    assert sidecar["key"] == "doc_id"
    assert sidecar["epoch_tail_above_position"] == []
    on_disk = json.load(open(os.path.join(dump, "_position.json")))
    assert on_disk == sidecar

    # the dump IS the exporter's state
    dumped = spark.read.parquet(os.path.join(dump, "data"))
    oracle.assert_equal_state(
        {r["doc_id"]: {"tokens": r["tokens"], "n_tok": r["n_tok"],
                       "source": r["source"]}
         for r in a_table.read().collect()},
        dumped.collect(),
        "export dump",
    )

    # consumer B: bootstrap from the dump, tail the FULL binlog
    b_root = os.path.join(tmp_warehouse, "B")
    os.makedirs(b_root)
    b_table = LakeTable.create(
        spark, os.path.join(b_root, "sequences"), sequences_schema(),
        key="doc_id", num_buckets=8,
    )
    b_table.bootstrap(dumped, position=sidecar["position"])
    eng = CdcEngine(spark, b_table, b_root, EngineConfig(num_buckets=8))
    eng.apply_binlog(binlog)

    want = oracle.replay(files)
    oracle.assert_equal_state(
        want.state, b_table.read().collect(), "export->bootstrap->tail"
    )
    # only post-cut epochs were applied on B
    lin = spark.read.parquet(eng.lineage_path)
    assert lin.filter(F.col("batch_epoch").between(0, CUT)).count() == 0
    assert lin.filter(F.col("batch_epoch") > CUT).count() > 0


def test_export_time_travel_version(spark, tmp_warehouse, setup):
    """Exporting an earlier version dumps that version's rows and
    that version's watermark."""
    _, _, a_table = setup
    v_now = a_table.current_version()
    # advance A past the export point
    extra = spark.createDataFrame(
        [("zzz-new", [1, 2, 3], 3, "s0")], schema=sequences_schema()
    )
    a_table.merge(extra, epochs=[CUT + 1])
    dump = os.path.join(tmp_warehouse, "dump_tt")
    sidecar = a_table.export_snapshot(dump, version=v_now)
    assert sidecar["position"] == CUT
    assert sidecar["source_version"] == v_now
    docs = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(dump, "data")).collect()
    }
    assert "zzz-new" not in docs


def test_cli_export_and_sidecar_bootstrap(spark, tmp_warehouse, setup, capsys):
    """--export-snapshot then --bootstrap-snapshot with NO explicit
    --snapshot-position: position comes from the sidecar."""
    from dexspark import cli

    binlog, files, a_table = setup
    dump = os.path.join(tmp_warehouse, "dump_cli")
    rc = cli.main(["--table", a_table.root, "--export-snapshot", dump])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["export"]["position"] == CUT

    b_path = os.path.join(tmp_warehouse, "B_cli", "sequences")
    os.makedirs(os.path.dirname(b_path))
    LakeTable.create(
        spark, b_path, sequences_schema(), key="doc_id", num_buckets=8
    )
    rc = cli.main(["--table", b_path, "--bootstrap-snapshot", dump])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["bootstrap"]["position"] == CUT
    b = LakeTable(spark, b_path)
    assert b.epoch_state() == (CUT, [])
    oracle.assert_equal_state(
        {r["doc_id"]: {"tokens": r["tokens"], "n_tok": r["n_tok"],
                       "source": r["source"]}
         for r in a_table.read().collect()},
        b.read().collect(),
        "cli sidecar bootstrap",
    )
