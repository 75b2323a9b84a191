"""Lineage + quarantine sinks.

Mirrors the reference's OK/FAIL derived events with embedded parent
provenance (dtos/DecompressEventMessages.kt:5-20: the FAIL event
carries the raw message, the parsed message, and failReason) and its
error container routing (FnDecompressor.kt:109,163-169):

- quarantine rows keep the full original raw line + parsed envelope +
  ``fail_reasons array<string>``;
- lineage rows aggregate per (batch_epoch, partition_id, source):
  events_seen / events_applied / rejects / skipped + batch-level
  rows_merged and wall_ms (the PoC's per-phase timing,
  parse-compare ValidateEntry.java:167-185).

Both are written with **dynamic partition overwrite on batch_epoch**:
redelivering an epoch rewrites exactly that epoch's partition, so the
sinks are idempotent under replay just like the table itself (the
reference gets the same property from id-prefixed output paths,
FnDecompressor.kt:94-95).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_epoch", T.LongType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("events_applied", T.LongType()),
        T.StructField("rejects", T.LongType()),
        T.StructField("skipped", T.LongType()),
        T.StructField("rows_merged", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
    ]
)


def _write_epoch_partitioned(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_epoch")
        .parquet(path)
    )


def write_quarantine(df: DataFrame, path: str, rules=None) -> None:
    """df: raw + envelope columns + fail_reasons + batch_epoch.

    When ``rules`` (a config.RuleSet) carries portal templates for the
    structured reason kinds (validate.STRUCTURED_REASON_KINDS), the
    writer re-renders those ``kind:col:detail`` strings into the
    portal's operator-facing text — one seam covering every quarantine
    writer (engine rejects, patch post-image fails, router unrouted),
    mirroring the reference's per-rule "Error message in Portal"
    column. No templates (the default) = structured strings unchanged."""
    if rules is not None and getattr(rules, "messages", ()):
        from .validate import FAIL_COL, render_portal_reasons

        if FAIL_COL in df.columns:
            df = df.withColumn(
                FAIL_COL, render_portal_reasons(F.col(FAIL_COL), rules)
            )
    _write_epoch_partitioned(df, path)


def write_applied(df: DataFrame, path: str) -> None:
    """Per-event OK lineage: one row per WINNING applied event
    (doc_id, lsn, op, commit_ts, partitioned by batch_epoch). Joining
    the table on doc_id (latest epoch wins) answers "which change
    event produced this row" — the engine's analogue of the
    reference's OK events carrying their parent envelope
    (dtos/DecompressEventMessages.kt:5-20). Same dynamic-overwrite
    idempotence as the other sinks."""
    _write_epoch_partitioned(df, path)


def read_applied(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def expire_epoch_partitions(path: str, below_epoch: int) -> int:
    """Retention sweep for an epoch-partitioned sink: delete
    ``batch_epoch=N`` partition dirs with ``0 <= N < below_epoch``;
    return how many were removed.

    Only non-negative integer partitions are candidates: negative
    epochs are the quarantine's fallback space for unattributable
    rows (no expirable epoch), and the Hive default partition (NULL
    epochs) is skipped by the int parse. Replay cannot resurrect an
    expired epoch — the engine's watermark filter drops
    already-committed epochs before any sink write, and callers only
    pass cutoffs at or below the committed watermark."""
    import shutil

    if not os.path.isdir(path):
        return 0  # sink never written (e.g. applied_lineage off)
    n = 0
    for d in os.listdir(path):
        if not d.startswith("batch_epoch="):
            continue
        try:
            epoch = int(d.split("=", 1)[1])
        except ValueError:
            continue  # __HIVE_DEFAULT_PARTITION__ and friends
        if 0 <= epoch < below_epoch:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
            n += 1
    return n


def write_lineage_rows(rows: list[tuple], path: str) -> None:
    """Driver-side lineage write (pyarrow, no Spark job).

    The lineage rollup is computed by an aggregate whose result is
    already collected on the driver (it is tiny: one row per
    (epoch, input-partition, source, class) group), so spinning up a
    Spark write job for it costs ~2-4s of pure scheduling latency per
    batch. Instead the driver writes hive-partitioned parquet directly:
    one file per batch_epoch dir, temp-file + rename (atomic on POSIX),
    existing files for the epoch removed first — the same idempotent
    dynamic-partition-overwrite semantics as the Spark path, readable
    by ``spark.read.parquet(path)`` unchanged.
    """
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    names = [f.name for f in LINEAGE_SCHEMA.fields]
    by_epoch: dict[int, list[tuple]] = {}
    for r in rows:
        by_epoch.setdefault(int(r[0]), []).append(r[1:])
    for epoch, epoch_rows in by_epoch.items():
        part_dir = os.path.join(path, f"batch_epoch={epoch}")
        os.makedirs(part_dir, exist_ok=True)
        cols = list(zip(*epoch_rows))
        tbl = pa.table(
            {
                "partition_id": pa.array(cols[0], pa.int32()),
                "source": pa.array(cols[1], pa.string()),
                **{
                    n: pa.array(cols[i + 2], pa.int64())
                    for i, n in enumerate(names[3:])
                },
            }
        )
        # Deterministic final name + os.replace = atomic overwrite of
        # the previous epoch file: a crash at any point leaves either
        # the old or the new file, never an empty partition. Stale
        # extra files (older multi-file layouts) are removed only after
        # the replace lands.
        tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(tbl, tmp)
        final = os.path.join(part_dir, "part-00000.parquet")
        os.replace(tmp, final)
        import time

        for old in os.listdir(part_dir):
            p = os.path.join(part_dir, old)
            if not old.endswith(".parquet") or p == final:
                continue
            # .tmp-* files may belong to a CONCURRENT writer still
            # between write_table and os.replace (two engines sharing a
            # warehouse, or a maintenance job beside the stream) —
            # deleting those makes its os.replace fail. Only reap tmp
            # orphans old enough that their writer must have crashed;
            # non-dot extras from older multi-file layouts go at once.
            if old.startswith(".tmp-"):
                try:
                    if time.time() - os.path.getmtime(p) < 3600:
                        continue
                except OSError:
                    continue
            try:
                os.unlink(p)
            except FileNotFoundError:
                pass  # lost a reap race to another writer: already gone


def lineage_rows(classified: DataFrame) -> DataFrame:
    """Aggregate per-partition lineage from a classified event frame.

    ``spark_partition_id()`` is captured at scan time (before any
    shuffle), so the rollup reflects input-partition provenance —
    SURVEY.md A4."""
    return (
        classified.withColumn("partition_id", F.spark_partition_id())
        .groupBy("batch_epoch", "partition_id", F.col("payload.source").alias("source"))
        .agg(
            F.count(F.lit(1)).alias("events_seen"),
            F.sum((F.col("event_class") == "apply").cast("long")).alias("events_applied"),
            F.sum((F.col("event_class") == "reject").cast("long")).alias("rejects"),
            F.sum((F.col("event_class") == "skip").cast("long")).alias("skipped"),
        )
    )


def write_lineage(
    rows: DataFrame, path: str, rows_merged: int, wall_ms: int
) -> None:
    out = rows.withColumn("rows_merged", F.lit(rows_merged).cast("long")).withColumn(
        "wall_ms", F.lit(wall_ms).cast("long")
    )
    _write_epoch_partitioned(out, path)


def read_lineage(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
