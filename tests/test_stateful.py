"""Cross-batch stale-event suppression (operators/stateful.py) —
``applyInPandasWithState`` keyed state across micro-batches.

State must persist across availableNow restarts (it lives in the
checkpoint's state store), suppress redelivered and stale events in
later batches, and never drop a fresh event.
"""

import json
import os

from pyspark.sql import functions as F, types as T

from dexspark.operators.stateful import suppress_stale

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("commit_ts", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _write(path, rows):
    with open(path, "w") as f:
        for d, ts, lsn, p in rows:
            f.write(
                json.dumps({"doc_id": d, "commit_ts": ts, "lsn": lsn, "payload": p})
                + "\n"
            )


def _run(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        suppress_stale(stream, key="doc_id", order_cols=("commit_ts", "lsn"))
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_suppresses_redelivered_and_stale_across_batches(spark, tmp_path):
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    os.makedirs(src)

    _write(
        src / "a.ndjson",
        [
            ("doc-1", 100, 5, "v1"),
            ("doc-1", 100, 7, "v2"),  # same ts, higher lsn -> state (100,7)
            ("doc-2", 50, 1, "x"),
        ],
    )
    _run(spark, src, out, ckpt)

    _write(
        src / "b.ndjson",
        [
            ("doc-1", 100, 7, "v2"),   # exact redelivery -> dropped
            ("doc-1", 100, 6, "old"),  # stale lsn -> dropped
            ("doc-1", 90, 9, "old"),   # stale ts -> dropped
            ("doc-1", 100, 8, "v3"),   # fresh lsn -> forwarded
            ("doc-2", 60, 0, "y"),     # fresh ts -> forwarded
            ("doc-3", 1, 1, "new"),    # unseen key -> forwarded
        ],
    )
    _run(spark, src, out, ckpt)

    rows = {
        (r["doc_id"], r["commit_ts"], r["lsn"]): r["payload"]
        for r in spark.read.parquet(str(out)).collect()
    }
    assert rows == {
        ("doc-1", 100, 5): "v1",
        ("doc-1", 100, 7): "v2",
        ("doc-2", 50, 1): "x",
        ("doc-1", 100, 8): "v3",
        ("doc-2", 60, 0): "y",
        ("doc-3", 1, 1): "new",
    }


def test_timestamp_order_column(spark, tmp_path):
    """commit_ts as a real TimestampType normalizes to epoch ns in
    state; comparisons stay correct."""
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    os.makedirs(src)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("commit_ts", T.TimestampType()),
            T.StructField("lsn", T.LongType()),
        ]
    )

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            suppress_stale(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with open(src / "a.ndjson", "w") as f:
        f.write(json.dumps({"doc_id": "d", "commit_ts": "2024-01-01 10:00:00", "lsn": 2}) + "\n")
    run()
    with open(src / "b.ndjson", "w") as f:
        f.write(json.dumps({"doc_id": "d", "commit_ts": "2024-01-01 09:00:00", "lsn": 9}) + "\n")
        f.write(json.dumps({"doc_id": "d", "commit_ts": "2024-01-01 11:00:00", "lsn": 1}) + "\n")
    run()
    got = sorted(
        (str(r["commit_ts"]), r["lsn"])
        for r in spark.read.parquet(str(out)).collect()
    )
    assert got == [("2024-01-01 10:00:00", 2), ("2024-01-01 11:00:00", 1)]


# ---- engine integration: EngineConfig(suppress_stale=True) ----------


def _env(op, doc, ts, lsn, epoch, tokens=None, src="web"):
    e = {
        "op": op,
        "doc_id": doc,
        "commit_ts": f"2024-01-01T00:00:{ts:02d}.000Z",
        "lsn": lsn,
        "batch_epoch": epoch,
    }
    if op != "delete":
        e["payload"] = {"tokens": tokens, "n_tok": len(tokens), "source": src}
    return e


def _run_engine(spark, root, tag, suppress):
    from dexspark.config import EngineConfig
    from dexspark.lake import LakeTable
    from dexspark.schema import sequences_schema
    from dexspark.stream import CdcEngine

    table = LakeTable.create(
        spark, os.path.join(root, f"t-{tag}"), sequences_schema(), num_buckets=4
    )
    cfg = EngineConfig(num_buckets=4, suppress_stale=suppress)
    return CdcEngine(spark, table, os.path.join(root, f"wh-{tag}"), cfg)


def test_engine_suppresses_stale_retry_under_fresh_epoch(spark, tmp_path):
    """A producer retry that re-emits an OLD event under a NEW epoch
    passes the epoch watermark (the epoch is genuinely fresh) and
    would regress the row via blind LWW upsert — the binlog ordering
    contract's edge. With suppress_stale on, the keyed state drops it
    and the row keeps its newest value. The control run documents the
    contract boundary the flag removes."""
    src = tmp_path / "binlog"
    os.makedirs(src)

    def write(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    write(
        "epoch-0.ndjson",
        [
            _env("insert", "doc-a", ts=10, lsn=1, epoch=0, tokens=[1, 2]),
            _env("insert", "doc-b", ts=10, lsn=2, epoch=0, tokens=[3]),
        ],
    )
    write(
        "epoch-1.ndjson",
        [_env("update", "doc-a", ts=20, lsn=3, epoch=1, tokens=[7, 7, 7])],
    )

    results = {}
    for tag, suppress in (("on", True), ("off", False)):
        eng = _run_engine(spark, str(tmp_path), tag, suppress)
        q = eng.run_stream(
            str(src),
            str(tmp_path / f"ckpt-{tag}"),
            available_now=True,
            max_files_per_trigger=1,
        )
        q.awaitTermination(180)
        # the retry batch: epoch 2 is FRESH, but the doc-a event inside
        # is a stale re-emission of the epoch-0 version
        write(
            f"epoch-2-{tag}.ndjson",
            [_env("update", "doc-a", ts=10, lsn=1, epoch=2, tokens=[1, 2])],
        )
        q = eng.run_stream(
            str(src),
            str(tmp_path / f"ckpt-{tag}"),
            available_now=True,
            max_files_per_trigger=1,
        )
        q.awaitTermination(180)
        results[tag] = {
            r["doc_id"]: list(r["tokens"]) for r in eng.table.read().collect()
        }

    assert results["on"]["doc-a"] == [7, 7, 7]   # stale retry suppressed
    assert results["on"]["doc-b"] == [3]
    assert results["off"]["doc-a"] == [1, 2]     # the regression the flag prevents


def test_quarantined_event_does_not_advance_watermark(spark, tmp_path):
    """The mark only advances on rows that will be APPLIED. A NEWER
    rule-failing event (headed for quarantine) must not shadow a
    later-arriving EARLIER valid event — the batch pipeline picks
    winners among valid events only, and suppression has to agree."""
    src = tmp_path / "binlog-adv"
    os.makedirs(src)

    def write(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    write("epoch-0.ndjson", [_env("insert", "doc-a", ts=10, lsn=1, epoch=0, tokens=[1])])
    # NEWER but invalid (source not in the whitelist -> quarantine)
    write("epoch-1.ndjson", [_env("update", "doc-a", ts=30, lsn=3, epoch=1, tokens=[6], src="bad")])
    # EARLIER than the invalid one, valid: must still be applied
    write("epoch-2.ndjson", [_env("update", "doc-a", ts=20, lsn=2, epoch=2, tokens=[9])])

    eng = _run_engine(spark, str(tmp_path), "adv", suppress=True)
    q = eng.run_stream(
        str(src), str(tmp_path / "ckpt-adv"),
        available_now=True, max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    rows = {r["doc_id"]: list(r["tokens"]) for r in eng.table.read().collect()}
    assert rows["doc-a"] == [9]  # ts=20 valid beat ts=10; invalid ts=30 did not gate it
    # the invalid event is still visible in the error channel
    q_rows = spark.read.parquet(eng.quarantine_path).count()
    assert q_rows == 1
