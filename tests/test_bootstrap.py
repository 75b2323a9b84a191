"""CDC bootstrap: initial-snapshot load + binlog-position handoff.

The Flink-CDC / Debezium "snapshot then incremental" pattern: a
consistent dump that reflects epochs <= P is loaded with
``LakeTable.bootstrap(df, P)`` (one atomic commit: data + epoch
watermark), after which tailing the FULL binlog applies only epochs
> P and the final state equals a from-zero replay. The reference has
no incremental handoff (it re-validates whole files); this is the
piece a log-tailing engine needs instead (north_star: replay
reconvergence from any cut)."""

import os
import re

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
CUT = 2  # snapshot position: dump reflects epochs 0..CUT


def _epoch_of(path: str) -> int:
    return int(re.search(r"epoch-(\d+)-", os.path.basename(path)).group(1))


@pytest.fixture()
def setup(spark, tmp_warehouse):
    binlog = os.path.join(tmp_warehouse, "binlog")
    events = gen.change_events(
        spark, n_events=N_EVENTS, n_docs=N_DOCS, n_epochs=N_EPOCHS,
        max_len=12, anomaly_pct=8,
    )
    files = gen.write_binlog(events, binlog)
    early = [f for f in files if _epoch_of(f) <= CUT]
    snap_state = oracle.replay(early).state
    snap_df = spark.createDataFrame(
        [{"doc_id": k, **v} for k, v in snap_state.items()],
        schema=sequences_schema(),
    )
    return binlog, files, snap_df, snap_state


def test_bootstrap_then_tail_matches_full_replay(spark, tmp_warehouse, setup):
    binlog, files, snap_df, snap_state = setup
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "sequences"), sequences_schema(),
        key="doc_id", num_buckets=8,
    )
    v = table.bootstrap(snap_df, position=CUT)
    assert table.manifest(v)["operation"] == "bootstrap"
    # the handoff commit alone marks every epoch <= CUT committed
    w, tail = table.epoch_state()
    assert (w, tail) == (CUT, [])
    assert table.is_epoch_committed(0) and table.is_epoch_committed(CUT)
    assert not table.is_epoch_committed(CUT + 1)

    engine = CdcEngine(spark, table, tmp_warehouse, EngineConfig(num_buckets=8))
    engine.apply_binlog(binlog)  # FULL binlog, epochs 0..N_EPOCHS-1

    want = oracle.replay(files)  # from-zero reference replay
    oracle.assert_equal_state(
        want.state, table.read().collect(), "bootstrap handoff"
    )
    # only post-cut epochs were applied / attributed
    lin = spark.read.parquet(engine.lineage_path)
    # negative epochs are the quarantine/lineage fallback space for
    # producer-bug anomalies (never committed, always attributed);
    # only the NON-NEGATIVE pre-cut epochs must be absent
    assert lin.filter(F.col("batch_epoch").between(0, CUT)).count() == 0
    assert lin.filter(F.col("batch_epoch") > CUT).count() > 0
    w, tail = table.epoch_state()
    assert (w, tail) == (N_EPOCHS - 1, [])


def test_bootstrap_skips_precut_work_not_just_results(spark, tmp_warehouse, setup):
    """Events at or below the cut are dropped by the O(1) watermark
    filter BEFORE validation — the bootstrap saves the replay work,
    not merely its effects: no pre-cut rows land in quarantine even
    though the binlog's early epochs contain anomalies."""
    binlog, files, snap_df, _ = setup
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq2"), sequences_schema(),
        key="doc_id", num_buckets=8,
    )
    table.bootstrap(snap_df, position=CUT)
    engine = CdcEngine(spark, table, tmp_warehouse, EngineConfig(num_buckets=8))
    engine.apply_binlog(binlog)
    qdirs = [
        d
        for d in os.listdir(engine.quarantine_path)
        if d.startswith("batch_epoch=")
    ]
    attributed = [int(d.split("=", 1)[1]) for d in qdirs]
    # NULL-epoch (malformed-line) fallback partitions may exist; every
    # epoch-attributed quarantine row must be post-cut
    assert all(e > CUT or e < 0 for e in attributed)


def test_bootstrap_position_validation(spark, tmp_warehouse, setup):
    _, _, snap_df, _ = setup
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq3"), sequences_schema(),
        key="doc_id", num_buckets=4,
    )
    with pytest.raises(ValueError, match="position"):
        table.bootstrap(snap_df, position=-1)


def test_bootstrap_reads_back_verbatim(spark, tmp_warehouse, setup):
    """The loaded dump is the table's contents, byte-for-byte (token
    arrays included), and time travel to the bootstrap version works
    like any other snapshot."""
    _, _, snap_df, snap_state = setup
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq4"), sequences_schema(),
        key="doc_id", num_buckets=4,
    )
    v = table.bootstrap(snap_df, position=CUT)
    oracle.assert_equal_state(snap_state, table.read().collect(), "dump")
    oracle.assert_equal_state(
        snap_state, table.read(version=v).collect(), "time travel"
    )
