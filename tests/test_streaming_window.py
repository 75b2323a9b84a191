"""Event-time windowed aggregation under a watermark (SURVEY §2.9).

The same ``F.window`` expression used by the batch query
``stream_window_counts`` runs here under ``readStream`` +
``withWatermark``: windows finalize (append-mode emit) once the
watermark passes their end, and events arriving later than the
watermark are dropped — the streaming late-data contract."""

import json
import os

import pytest
from pyspark.sql import functions as F, types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(path, rows):
    with open(path, "w") as f:
        for ts, et, v in rows:
            f.write(json.dumps({"ts": ts, "event_type": et, "value": v}) + "\n")


def test_windowed_agg_with_watermark(spark, tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)

    def run_available():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(
                F.col("win.start").cast("string").alias("start"), "event_type", "n"
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: three events in the 10:00 window, one in 11:00 —
    # leaves the watermark at max ts 11:10 - 30 min = 10:40
    _write(
        src / "a-first.ndjson",
        [
            ("2024-01-01 10:05:00", "click", 1.0),
            ("2024-01-01 10:20:00", "click", 1.0),
            ("2024-01-01 10:40:00", "view", 1.0),
            ("2024-01-01 11:10:00", "click", 1.0),
        ],
    )
    run_available()
    # batch 2 (separate availableNow run over the same checkpoint): a
    # much later event pushes the watermark far past the 10:00 window,
    # plus a straggler whose whole window is already behind the batch-1
    # watermark (window end 10:00 < 10:40) — Spark drops a late row
    # only when its WINDOW has expired, not merely its timestamp.
    _write(
        src / "b-second.ndjson",
        [
            ("2024-01-01 15:00:00", "click", 1.0),
            ("2024-01-01 09:15:00", "click", 99.0),  # expired window -> dropped
        ],
    )
    run_available()
    got = {
        (r["start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # the 10:00 window finalized with the batch-1 rows
    assert got[("2024-01-01 10:00:00", "click")] == 2
    assert got[("2024-01-01 10:00:00", "view")] == 1
    # the 11:00 window also finalized (watermark 14:30 > 12:00)
    assert got[("2024-01-01 11:00:00", "click")] == 1
    # the expired-window straggler was dropped: no 09:00 window at all
    assert ("2024-01-01 09:00:00", "click") not in got
    # the 15:00 window is still open -> not emitted in append mode
    assert ("2024-01-01 15:00:00", "click") not in got
