"""Structured Streaming: tail -> exactly-once merge; kill/resume
reconvergence (north_rule; reference analogue: Durable-Functions
replay, DummyFSPAllAsOne.kt:225-235)."""

import os
import shutil

import pytest

from dexspark import gen, oracle
from dexspark.config import EngineConfig
from dexspark.lake import LakeTable
from dexspark.schema import sequences_schema
from dexspark.stream import CdcEngine

N_DOCS = 200
N_EVENTS = 1_200
N_EPOCHS = 6


def _mk_engine(spark, root, tag):
    table = LakeTable.create(
        spark, os.path.join(root, f"seq-{tag}"), sequences_schema(), num_buckets=8
    )
    base = gen.base_sequences(spark, n_docs=N_DOCS, max_len=16)
    table.overwrite(base)
    return CdcEngine(spark, table, os.path.join(root, tag), EngineConfig(num_buckets=8))


@pytest.fixture()
def binlog_files(spark, tmp_warehouse):
    src = os.path.join(tmp_warehouse, "binlog-src")
    events = gen.change_events(
        spark, n_events=N_EVENTS, n_docs=N_DOCS, n_epochs=N_EPOCHS, max_len=16, anomaly_pct=8
    )
    return gen.write_binlog(events, src)


def test_stream_matches_oracle(spark, tmp_warehouse, binlog_files):
    live = os.path.join(tmp_warehouse, "live")
    os.makedirs(live)
    for f in binlog_files:
        shutil.copy(f, live)
    engine = _mk_engine(spark, tmp_warehouse, "stream")
    base_state = oracle.state_from_rows(engine.table.read().collect())
    engine.run_until_caught_up(live, os.path.join(tmp_warehouse, "ckpt-stream"))
    want = oracle.replay(live, base_state=base_state)
    oracle.assert_equal_state(want.state, engine.table.read().collect(), "stream")


def test_parquet_stream_matches_ndjson_stream(spark, tmp_warehouse, binlog_files):
    """Tailing a STRUCTURED parquet change log (columnar decode, no
    JSON parse) through the same streaming pipeline converges to the
    same table state as the ndjson tail."""
    events = gen.change_events(
        spark, n_events=N_EVENTS, n_docs=N_DOCS, n_epochs=N_EPOCHS, max_len=16,
        anomaly_pct=8,
    )
    pq_log = os.path.join(tmp_warehouse, "binlog-pq")
    gen.write_binlog_parquet(events, pq_log)
    engine_pq = _mk_engine(spark, tmp_warehouse, "stream-pq")
    engine_pq.run_until_caught_up(pq_log, os.path.join(tmp_warehouse, "ckpt-pq"))

    live = os.path.join(tmp_warehouse, "live-nd")
    os.makedirs(live)
    for f in binlog_files:
        shutil.copy(f, live)
    engine_nd = _mk_engine(spark, tmp_warehouse, "stream-nd")
    engine_nd.run_until_caught_up(live, os.path.join(tmp_warehouse, "ckpt-nd"))

    a = {r["doc_id"]: r.asDict(recursive=True) for r in engine_pq.table.read().collect()}
    b = {r["doc_id"]: r.asDict(recursive=True) for r in engine_nd.table.read().collect()}
    assert a == b


def test_kill_and_resume_reconverges(spark, tmp_warehouse, binlog_files):
    """Process half the log, 'die', resume from checkpoint with the full
    log present; final state == single-shot oracle replay, and epochs
    seen twice are not double-applied."""
    live = os.path.join(tmp_warehouse, "live2")
    os.makedirs(live)
    half = len(binlog_files) // 2
    for f in binlog_files[:half]:
        shutil.copy(f, live)
    engine = _mk_engine(spark, tmp_warehouse, "resume")
    base_state = oracle.state_from_rows(engine.table.read().collect())
    ckpt = os.path.join(tmp_warehouse, "ckpt-resume")

    engine.run_until_caught_up(live, ckpt)  # run 1: first half, then stop
    epochs_after_half = set(engine.table.committed_epochs())
    assert epochs_after_half, "first run must have committed some epochs"

    for f in binlog_files[half:]:
        shutil.copy(f, live)
    engine.run_until_caught_up(live, ckpt)  # run 2: resume from checkpoint

    want = oracle.replay(live, base_state=base_state)
    oracle.assert_equal_state(want.state, engine.table.read().collect(), "resume")


def test_resume_equals_single_shot(spark, tmp_warehouse, binlog_files):
    """The resumed table equals a table produced by one uninterrupted
    run over the same input (replay determinism)."""
    live = os.path.join(tmp_warehouse, "live3")
    os.makedirs(live)
    for f in binlog_files:
        shutil.copy(f, live)
    single = _mk_engine(spark, tmp_warehouse, "single")
    single.run_until_caught_up(live, os.path.join(tmp_warehouse, "ckpt-single"))

    resumed = _mk_engine(spark, tmp_warehouse, "resumed")
    ckpt = os.path.join(tmp_warehouse, "ckpt-resumed")
    live2 = os.path.join(tmp_warehouse, "live4")
    os.makedirs(live2)
    for f in binlog_files[:2]:
        shutil.copy(f, live2)
    resumed.run_until_caught_up(live2, ckpt)
    for f in binlog_files[2:]:
        shutil.copy(f, live2)
    resumed.run_until_caught_up(live2, ckpt)

    a = {r["doc_id"]: r.asDict(recursive=True) for r in single.table.read().collect()}
    b = {r["doc_id"]: r.asDict(recursive=True) for r in resumed.table.read().collect()}
    assert a == b


def test_kafka_shaped_value_stream_matches_file_source(spark, tmp_warehouse, binlog_files):
    """The documented Kafka swap point (events.parse_kafka_values over
    a binary value-column stream, the shape format('kafka') delivers)
    must classify anomalies and converge identically to the ndjson
    file source over the SAME event lines (reference: Event Hub
    cardinality-ONE value messages, FnDecompressorEntry.kt:41-51)."""
    from pyspark.sql import functions as F

    from dexspark.events import parse_kafka_values

    # (a) reference: ndjson file source
    live = os.path.join(tmp_warehouse, "live-kref")
    os.makedirs(live)
    for f in binlog_files:
        shutil.copy(f, live)
    engine_file = _mk_engine(spark, tmp_warehouse, "kfile")
    m_file = engine_file.apply_binlog(live)

    # (b) the same lines re-shaped as Kafka records: binary `value`
    kafka_dir = os.path.join(tmp_warehouse, "kafka-values")
    (
        spark.read.text(live)
        .select(F.col("value").cast("binary").alias("value"))
        .write.parquet(kafka_dir)
    )
    engine_k = _mk_engine(spark, tmp_warehouse, "kval")
    stream = spark.readStream.schema("value binary").parquet(kafka_dir)
    parsed = parse_kafka_values(stream)
    assert parsed.isStreaming  # the adapter composes with readStream
    batches = []

    def _apply(df, epoch_id):
        batches.append(engine_k.apply_batch(df))

    q = (
        parsed.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", os.path.join(tmp_warehouse, "ckpt-kval"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    a = {r["doc_id"]: r.asDict(recursive=True) for r in engine_file.table.read().collect()}
    b = {r["doc_id"]: r.asDict(recursive=True) for r in engine_k.table.read().collect()}
    assert a == b
    # anomaly routing identical, not just final state
    assert sum(m.rejects for m in batches) == m_file.rejects
    assert sum(m.skipped for m in batches) == m_file.skipped
    assert sum(m.events_seen for m in batches) == m_file.events_seen


def test_pinned_filter_replay_is_content_idempotent(spark, tmp_warehouse, binlog_files):
    """The plan-stability pin (run_stream computes the fresh-epoch
    filter once per run): a same-batch retry re-applies its events
    through the PINNED filter instead of being dropped by a live one
    — final table state must be identical (LWW re-application is
    content-idempotent), and a RESTART's re-pin must absorb the
    replay entirely (early return, no new commit)."""
    live = os.path.join(tmp_warehouse, "live-pin")
    os.makedirs(live)
    for f in binlog_files:
        shutil.copy(f, live)
    from dexspark.events import read_binlog

    engine = _mk_engine(spark, tmp_warehouse, "pin")
    parsed = read_binlog(spark, live, engine.payload_schema)
    pinned = engine._fresh_epoch_filter()  # pinned BEFORE any commit
    m1 = engine.apply_batch(parsed, fresh_filter=pinned)
    state1 = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in engine.table.read().collect()
    }
    v1 = engine.table.current_version()
    # same-batch retry through the SAME pin: events flow again
    m2 = engine.apply_batch(parsed, fresh_filter=pinned)
    assert m2.events_seen == m1.events_seen  # not filtered
    state2 = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in engine.table.read().collect()
    }
    assert state2 == state1  # content-idempotent
    # restart: a fresh pin absorbs the replay — nothing applied,
    # no rows merged, no new table version (only the ever-live
    # NULL-epoch malformed lines re-flow to their idempotent
    # quarantine rewrite)
    repinned = engine._fresh_epoch_filter()
    v_before = engine.table.current_version()
    m3 = engine.apply_batch(parsed, fresh_filter=repinned)
    assert m3.events_applied == 0 and m3.rows_merged == 0
    assert m3.events_seen < m1.events_seen
    assert engine.table.current_version() == v_before
    assert {
        r["doc_id"]: r.asDict(recursive=True)
        for r in engine.table.read().collect()
    } == state1
    assert v1 >= 2  # sanity: the first apply really committed


def _kafka_jars_available(spark) -> bool:
    """True iff the spark-sql-kafka data source resolves on this
    classpath (plan-time probe; no broker contact — the Kafka source
    connects lazily at query start)."""
    try:
        (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", "localhost:1")
            .option("subscribe", "probe")
            .load()
        )
        return True
    except Exception as e:
        if "DATA_SOURCE_NOT_FOUND" in str(e) or "Failed to find" in str(e):
            return False
        raise  # jars present but something else broke: surface it


def test_kafka_connector_wiring_jar_gated(spark):
    """The format('kafka') wiring (events.read_binlog_kafka): when the
    spark-sql-kafka jars resolve, the reader must build with the full
    option set and parse to the envelope schema — withOUT contacting a
    broker (the source connects at start, not at load). Skips when the
    jars are absent (this sandbox); the value-column shape test above
    is the behavioral backstop either way."""
    from dexspark.events import read_binlog_kafka

    if not _kafka_jars_available(spark):
        pytest.skip("spark-sql-kafka jars not on classpath")
    parsed = read_binlog_kafka(
        spark,
        "localhost:9092",
        "binlog",
        starting_offsets="earliest",
        max_offsets_per_trigger=100_000,
        options={"kafka.security.protocol": "PLAINTEXT"},
    )
    assert parsed.isStreaming
    for c in ("raw", "op", "doc_id", "payload", "commit_ts", "lsn",
              "batch_epoch", "envelope_fail", "is_blank"):
        assert c in parsed.columns, parsed.columns


def test_out_of_order_epoch_delivery_applies_below_base(spark, tmp_warehouse):
    """The source delivers the epoch-5 binlog file BEFORE the epoch-3
    file (maxFilesPerTrigger / listing-order hazard). Seeding the
    watermark base from the first committed batch must not swallow the
    later-arriving lower epoch: both events must land in the table."""
    import json

    live = os.path.join(tmp_warehouse, "live-ooo")
    os.makedirs(live)

    def _ev(doc, toks, ts, lsn, epoch):
        return json.dumps(
            {
                "op": "insert",
                "doc_id": doc,
                "payload": {"tokens": toks, "n_tok": len(toks), "source": "web"},
                "commit_ts": ts,
                "lsn": lsn,
                "batch_epoch": epoch,
            }
        )

    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq-ooo"), sequences_schema(), num_buckets=4
    )
    table.overwrite(spark.createDataFrame([], sequences_schema()))
    engine = CdcEngine(
        spark, table, os.path.join(tmp_warehouse, "ooo"), EngineConfig(num_buckets=4)
    )
    ckpt = os.path.join(tmp_warehouse, "ckpt-ooo")

    # run 1: only the epoch-5 file exists
    with open(os.path.join(live, "epoch-000005-000.ndjson"), "w") as f:
        f.write(_ev("hi", [5, 5], "2024-01-01T00:00:05.000Z", 50, 5) + "\n")
    engine.run_until_caught_up(live, ckpt)
    assert table.is_epoch_committed(5)

    # run 2: the epoch-3 file arrives late
    with open(os.path.join(live, "epoch-000003-000.ndjson"), "w") as f:
        f.write(_ev("lo", [3], "2024-01-01T00:00:03.000Z", 30, 3) + "\n")
    engine.run_until_caught_up(live, ckpt)

    rows = {r["doc_id"]: r.asDict(recursive=True) for r in table.read().collect()}
    assert set(rows) == {"hi", "lo"}, "below-base epoch must be applied, not swallowed"
    assert rows["lo"]["tokens"] == [3]
    assert table.is_epoch_committed(3) and not table.is_epoch_committed(4)

    # idempotence still holds: replaying the whole log changes nothing
    engine.run_until_caught_up(live, os.path.join(tmp_warehouse, "ckpt-ooo2"))
    rows2 = {r["doc_id"]: r.asDict(recursive=True) for r in table.read().collect()}
    assert rows2 == rows


def test_epoch_split_across_micro_batches_no_loss(spark, tmp_warehouse):
    """An epoch whose files straddle a micro-batch boundary
    (maxFilesPerTrigger=1) must not lose its later files: the batch
    that saw only the epoch's first file defers its marker, so the
    remainder still passes the already-committed filter. The final
    epoch's marker lands via the end-of-run flush."""
    import json

    def _ev(doc, toks, ts, lsn, epoch):
        return json.dumps(
            {
                "op": "insert",
                "doc_id": doc,
                "payload": {"tokens": toks, "n_tok": len(toks), "source": "web"},
                "commit_ts": ts,
                "lsn": lsn,
                "batch_epoch": epoch,
            }
        )

    live = os.path.join(tmp_warehouse, "live-split")
    os.makedirs(live)
    # epoch 0 split across TWO files; epoch 1 in a third. A sequential
    # producer appends epoch files in order — enforce that with
    # explicit ascending mtimes (the file source delivers oldest
    # first; same-second ties would otherwise make delivery order
    # arbitrary, which is outside the epoch-monotone contract the
    # deferred marking relies on).
    import time as _time

    t_base = _time.time() - 100
    for i, (name, line) in enumerate(
        [
            ("epoch-000000-000.ndjson", _ev("a", [1], "2024-01-01T00:00:01.000Z", 1, 0)),
            ("epoch-000000-001.ndjson", _ev("b", [2], "2024-01-01T00:00:02.000Z", 2, 0)),
            ("epoch-000001-000.ndjson", _ev("c", [3], "2024-01-01T00:00:03.000Z", 3, 1)),
        ]
    ):
        p = os.path.join(live, name)
        with open(p, "w") as f:
            f.write(line + "\n")
        os.utime(p, (t_base + 10 * i, t_base + 10 * i))

    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq-split"), sequences_schema(),
        num_buckets=4,
    )
    table.overwrite(spark.createDataFrame([], sequences_schema()))
    engine = CdcEngine(
        spark, table, os.path.join(tmp_warehouse, "split"), EngineConfig(num_buckets=4)
    )
    q = engine.run_stream(
        live,
        os.path.join(tmp_warehouse, "ckpt-split"),
        available_now=True,
        max_files_per_trigger=1,  # one file per micro-batch: epoch 0 splits
    )
    q.awaitTermination()
    flushed = engine.flush_epoch_markers()

    rows = {r["doc_id"] for r in table.read().collect()}
    assert rows == {"a", "b", "c"}, "split epoch's later files must be applied"
    assert table.is_epoch_committed(0) and table.is_epoch_committed(1)
    assert flushed == [1]  # the final (boundary) epoch flushed at end-of-run


def test_negative_epoch_event_quarantined_not_applied(spark, tmp_warehouse):
    """A producer-bug event with batch_epoch < 0 can never be made
    idempotent (the already-committed filter always keeps negatives),
    so it is rejected at classify: quarantined, never merged, never
    committed as a marker."""
    import json

    ev = json.dumps(
        {
            "op": "insert",
            "doc_id": "neg",
            "payload": {"tokens": [1], "n_tok": 1, "source": "web"},
            "commit_ts": "2024-01-01T00:00:01.000Z",
            "lsn": 1,
            "batch_epoch": -3,
        }
    )
    live = os.path.join(tmp_warehouse, "live-neg")
    os.makedirs(live)
    with open(os.path.join(live, "events.ndjson"), "w") as f:
        f.write(ev + "\n")
    engine = _mk_engine(spark, tmp_warehouse, "neg")
    m = engine.apply_binlog(live)
    assert m.rejects == 1 and m.rows_merged == 0
    assert "neg" not in {r["doc_id"] for r in engine.table.read().collect()}
    assert not engine.table.is_epoch_committed(-3)
    q = spark.read.parquet(engine.quarantine_path)
    (qr,) = q.collect()
    assert any("batch_epoch" in r for r in qr["fail_reasons"])
    # quarantine partition is in the content-hash fallback namespace,
    # NOT the raw producer epoch (which would collide across batches)
    assert qr["batch_epoch"] != -3 and qr["batch_epoch"] < 0


def test_quarantine_key_namespace_disjoint_from_doc_ids(spark, tmp_warehouse):
    """A document whose doc_id is literally 'q#<lsn>' must not share a
    dedup group with a quarantined event of that lsn — both records
    must survive to their respective sinks."""
    import json

    good = json.dumps(
        {
            "op": "insert",
            "doc_id": "q#42",
            "payload": {"tokens": [7], "n_tok": 1, "source": "web"},
            "commit_ts": "2024-01-01T00:00:02.000Z",
            "lsn": 99,
            "batch_epoch": 0,
        }
    )
    bad = json.dumps(
        {
            "op": "insert",
            "doc_id": "bad-doc",
            # n_tok mismatch -> validation reject, synthetic key q#42
            "payload": {"tokens": [1, 2], "n_tok": 5, "source": "web"},
            "commit_ts": "2024-01-01T00:00:01.000Z",
            "lsn": 42,
            "batch_epoch": 0,
        }
    )
    live = os.path.join(tmp_warehouse, "live-ns")
    os.makedirs(live)
    with open(os.path.join(live, "events.ndjson"), "w") as f:
        f.write(good + "\n" + bad + "\n")
    engine = _mk_engine(spark, tmp_warehouse, "ns")
    m = engine.apply_binlog(live)
    assert m.rejects == 1 and m.rows_merged == 1
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in engine.table.read().collect()}
    assert rows["q#42"]["tokens"] == [7]
    q = spark.read.parquet(engine.quarantine_path)
    assert q.filter(q.doc_id == "bad-doc").count() == 1


def test_epoch_marker_lag_tolerates_tie_interleaved_delivery(spark, tmp_warehouse):
    """Object-store mtime ties can interleave ADJACENT epochs' files
    across micro-batches (delivery no longer epoch-monotone). With
    epoch_marker_lag=2 the top two epochs stay deferred, so epoch 0's
    late file still passes the filter even though epoch 1 was seen
    first; everything is marked by the end-of-run flush."""
    import json
    import time as _time

    def _ev(doc, toks, ts, lsn, epoch):
        return json.dumps(
            {
                "op": "insert",
                "doc_id": doc,
                "payload": {"tokens": toks, "n_tok": len(toks), "source": "web"},
                "commit_ts": ts,
                "lsn": lsn,
                "batch_epoch": epoch,
            }
        )

    live = os.path.join(tmp_warehouse, "live-lag")
    os.makedirs(live)
    t_base = _time.time() - 100
    # adversarial delivery order: epoch 1 first, then epoch 0's two files
    for i, (name, line) in enumerate(
        [
            ("epoch-000001-000.ndjson", _ev("c", [3], "2024-01-01T00:00:03.000Z", 3, 1)),
            ("epoch-000000-000.ndjson", _ev("a", [1], "2024-01-01T00:00:01.000Z", 1, 0)),
            ("epoch-000000-001.ndjson", _ev("b", [2], "2024-01-01T00:00:02.000Z", 2, 0)),
        ]
    ):
        p = os.path.join(live, name)
        with open(p, "w") as f:
            f.write(line + "\n")
        os.utime(p, (t_base + 10 * i, t_base + 10 * i))

    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq-lag"), sequences_schema(),
        num_buckets=4,
    )
    table.overwrite(spark.createDataFrame([], sequences_schema()))
    engine = CdcEngine(
        spark, table, os.path.join(tmp_warehouse, "lag"),
        EngineConfig(num_buckets=4, epoch_marker_lag=2),
    )
    q = engine.run_stream(
        live,
        os.path.join(tmp_warehouse, "ckpt-lag"),
        available_now=True,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    flushed = engine.flush_epoch_markers()
    rows = {r["doc_id"] for r in table.read().collect()}
    assert rows == {"a", "b", "c"}
    assert flushed == [0, 1]
    assert table.is_epoch_committed(0) and table.is_epoch_committed(1)
