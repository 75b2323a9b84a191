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
