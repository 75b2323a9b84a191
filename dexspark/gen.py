"""Deterministic synthetic data: base sequences table + change binlog.

Re-expresses the reference's 5 GB synthetic generator
(proof-of-concept/big-file-generator/src/bigfile/App.java:14-44 —
N lines x M cols x random chars) for the tokenized-sequence model, but
**fully deterministic and distributed**: everything derives from
``spark.range`` ids through ``xxhash64`` — no ``rand()`` (whose output
depends on partitioning), no driver-side loops, linear scale-out.

Anomaly injection follows FIXTURES.md §3 / the reference's negative
test matrix (Unit_FnDecompressor.kt:153-459): malformed JSON, missing
required envelope fields, n_tok mismatch, token out of range, source
not in whitelist, unknown op, delete-for-absent-key.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import SOURCE_WHITELIST, VOCAB_SIZE

EPOCH_TS = "2024-01-01 00:00:00"


def _h(seed: int, *cols) -> F.Column:
    return F.xxhash64(F.lit(seed), *cols)


def _tokens_expr(id_col: F.Column, seed: int, max_len: int, vocab: int) -> F.Column:
    """Deterministic variable-length int array, JVM-side only."""
    length = (F.pmod(_h(seed, id_col), F.lit(max_len)) + 1).cast("int")
    return F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda x: F.pmod(_h(seed + 1, id_col, x), F.lit(vocab)).cast("int"),
    )


def _source_expr(id_col: F.Column, seed: int) -> F.Column:
    arr = F.array(*[F.lit(s) for s in SOURCE_WHITELIST])
    return F.element_at(arr, (F.pmod(_h(seed, id_col), F.lit(len(SOURCE_WHITELIST))) + 1).cast("int"))


def base_sequences(
    spark: SparkSession,
    n_docs: int = 10_000,
    seed: int = 42,
    vocab: int = VOCAB_SIZE,
    max_len: int = 256,
    partitions: int | None = None,
) -> DataFrame:
    """The initial `sequences` table state (FIXTURES.md §1)."""
    df = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    tokens = _tokens_expr(F.col("id"), seed, max_len, vocab)
    return df.select(
        F.format_string("doc%08d", F.col("id")).alias("doc_id"),
        tokens.alias("tokens"),
        F.size(tokens).alias("n_tok"),
        _source_expr(F.col("id"), seed + 7).alias("source"),
    )


def change_events(
    spark: SparkSession,
    n_events: int = 50_000,
    n_docs: int = 10_000,
    n_epochs: int = 10,
    seed: int = 42,
    vocab: int = VOCAB_SIZE,
    max_len: int = 256,
    hot_pct: int = 20,
    anomaly_pct: int = 0,
    ts_group: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic change-event frame with a JSON ``value`` column.

    - ~``hot_pct``% of events target the hottest 1% of keys (skew:
      exercises salting / partial-agg dedup — FIXTURES.md §1);
    - key space is 2x the base table, so inserts of new keys and
      deletes of never-seen keys both occur naturally;
    - ``ts_group`` consecutive lsns share one commit_ts, creating
      commit_ts ties broken by lsn (dedup total-order test);
    - ``anomaly_pct``% of events are corrupted, round-robin over 7
      anomaly kinds (FIXTURES.md §3).
    """
    ev = spark.range(
        0, n_events, numPartitions=partitions or spark.sparkContext.defaultParallelism
    )
    i = F.col("id")
    # ceil division: floor would spill the tail events into an extra
    # unrequested epoch (105 events / 10 epochs -> lsn 100-104 landing
    # in epoch 10), and n_events < n_epochs would mint one epoch per
    # event — both violate the n_epochs contract downstream consumers
    # size by
    per_epoch = max(1, -(-n_events // n_epochs))
    hot_keys = max(1, n_docs // 100)

    is_hot = F.pmod(_h(seed + 11, i), F.lit(100)) < hot_pct
    key = F.when(is_hot, F.pmod(_h(seed + 12, i), F.lit(hot_keys))).otherwise(
        F.pmod(_h(seed + 13, i), F.lit(n_docs * 2))
    )
    opr = F.pmod(_h(seed + 14, i), F.lit(100))
    op = (
        F.when(opr < 30, F.lit("insert"))
        .when(opr < 90, F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    tokens = _tokens_expr(i + 1_000_000_007, seed + 15, max_len, vocab)

    anomaly = F.when(
        F.pmod(_h(seed + 16, i), F.lit(100)) < anomaly_pct,
        F.pmod(_h(seed + 17, i), F.lit(7)),
    ).otherwise(F.lit(-1))

    n_tok = F.when(anomaly == 0, F.size(tokens) + 1).otherwise(F.size(tokens))  # V8 break
    tokens = F.when(
        anomaly == 1, F.concat(tokens, F.array(F.lit(vocab + 13)))  # V10 break
    ).otherwise(tokens)
    n_tok = F.when(anomaly == 1, F.size(tokens)).otherwise(n_tok)
    source = F.when(anomaly == 2, F.lit("badsource")).otherwise(_source_expr(i, seed + 18))
    doc_id = F.when(anomaly == 3, F.lit(None).cast("string")).otherwise(
        F.format_string("doc%08d", key)
    )
    op = F.when(anomaly == 4, F.lit("compact")).otherwise(op)  # unknown op -> skip

    df = ev.select(
        i.alias("lsn"),
        (i / per_epoch).cast("long").alias("batch_epoch"),
        op.alias("op"),
        doc_id.alias("doc_id"),
        F.when(
            op != "delete",
            F.struct(tokens.alias("tokens"), n_tok.cast("int").alias("n_tok"), source.alias("source")),
        ).alias("payload"),
        (
            F.to_timestamp(F.lit(EPOCH_TS))
            + F.make_dt_interval(secs=(i / ts_group).cast("long").cast("double"))
        ).alias("commit_ts"),
        anomaly.alias("_anomaly"),
    )
    json_line = F.to_json(
        F.struct("op", "doc_id", "payload", "commit_ts", "lsn", "batch_epoch")
    )
    value = (
        F.when(df["_anomaly"] == 5, F.concat(F.lit("{malformed::"), json_line))  # bad JSON
        .when(
            df["_anomaly"] == 6,  # missing required envelope field (no commit_ts)
            F.to_json(F.struct("op", "doc_id", "payload", "lsn", "batch_epoch")),
        )
        .otherwise(json_line)
    )
    return df.withColumn("value", value)


def write_binlog(
    df: DataFrame,
    out_dir: str,
    files_per_epoch: int = 4,
    codec: str | None = None,
) -> list[str]:
    """Write the event frame as ndjson files per epoch:
    ``<out>/epoch-<E>-<i>.ndjson[.gz|.zst|...]``. One distributed
    write job (partitionBy), then a driver-side rename of part files
    (cheap: O(files)). ``files_per_epoch`` > 1 keeps the tail scan
    parallel (one reader task per file at minimum). ``codec`` (gzip /
    lz4 ...; availability per Hadoop codec registry) trades scan CPU for wire/bus bandwidth — on a
    bandwidth-bound host the compressed tail scales better with cores.
    Returns paths in epoch order."""
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, f"_staging-{uuid.uuid4().hex}")  # Spark creates it
    try:
        writer = (
            df.select("batch_epoch", "value", F.pmod(F.col("lsn"), F.lit(files_per_epoch)).alias("_f"))
            .repartition(F.col("batch_epoch"), F.col("_f"))
            .drop("_f")
            .write.partitionBy("batch_epoch")
        )
        if codec:
            writer = writer.option("compression", codec)
        writer.text(tmp)
        out_files: list[str] = []
        # numeric sort: lexicographic would order batch_epoch=10 before
        # batch_epoch=2, breaking the "paths in epoch order" contract
        # callers rely on for sequential replay
        epoch_dirs = sorted(
            (d for d in os.listdir(tmp) if d.startswith("batch_epoch=")),
            key=lambda d: int(d.split("=", 1)[1]),
        )
        for d in epoch_dirs:
            epoch = int(d.split("=", 1)[1])
            parts = sorted(
                f
                for f in os.listdir(os.path.join(tmp, d))
                # part-*.txt[.gz|.zst...]; skip hidden .crc checksums
                if not f.startswith((".", "_")) and ".txt" in f and not f.endswith(".crc")
            )
            for k, p in enumerate(parts):
                # preserve the codec suffix (part-*.txt.gz -> .ndjson.gz)
                # so the JSON reader picks the decompressor by extension
                suffix = p.split(".txt", 1)[1]
                dst = os.path.join(
                    out_dir, f"epoch-{epoch:06d}-{k:03d}.ndjson{suffix}"
                )
                shutil.move(os.path.join(tmp, d, p), dst)
                out_files.append(dst)
        return out_files
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def write_binlog_parquet(
    df: DataFrame, out_dir: str, files_per_epoch: int = 4
) -> None:
    """Structured binlog: the envelope columns as parquet partitioned
    by epoch — the Kafka-plus-schema-registry shape of the same
    stream. ~6x smaller on the wire than ndjson AND the tail scan
    skips JSON parsing entirely (columnar decode, epoch partition
    pruning); on a memory-bandwidth-bound host this is the encoding
    that keeps core-scaling honest.

    Anomaly faithfulness: a producer that failed to parse a line can
    only stage the raw bytes — rows whose ``value`` is malformed JSON
    (gen anomaly 5) are written with NULL envelope columns + the raw
    line, and rows whose JSON lacked commit_ts (anomaly 6) get a NULL
    commit_ts, so the engine classifies them exactly like the ndjson
    path does."""
    malformed = F.col("_anomaly") == 5
    no_ts = F.col("_anomaly") == 6
    cols = [
        F.when(~malformed, F.col("op")).alias("op"),
        F.when(~malformed, F.col("doc_id")).alias("doc_id"),
        F.when(~malformed, F.col("payload")).alias("payload"),
        F.when(~malformed & ~no_ts, F.col("commit_ts")).alias("commit_ts"),
        F.when(~malformed, F.col("lsn")).alias("lsn"),
        F.col("value").alias("raw"),
        F.col("batch_epoch"),
    ]
    (
        df.select(*cols, F.pmod(F.xxhash64("raw"), F.lit(files_per_epoch)).alias("_f"))
        .repartition(F.col("batch_epoch"), F.col("_f"))
        .drop("_f")
        .write.partitionBy("batch_epoch")
        .parquet(out_dir)
    )
