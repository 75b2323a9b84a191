"""Change-event envelope parsing — raw + parsed duality.

Mirrors the reference's envelope handling exactly (re-expressed
declaratively):

- the raw message is preserved next to the parsed struct for lineage
  (FnDecompressor.kt:62-65 ``rawEvents.zip(events)`` → here one
  DataFrame with both a ``raw`` string column and parsed columns — the
  "positional self-join" J1 disappears);
- parsing is lenient: unknown JSON fields are ignored
  (dtos/AzureBlobCreateEventMessage.kt:5, test
  Unit_FnDecompressor.kt:573-574 injects extraField);
- malformed JSON does not abort the batch: the row is tagged with a
  parse fail reason and routed to quarantine, the rest proceeds
  (per-event error isolation, FnDecompressor.kt:163-169);
- unknown op types are SKIPPED, not failed (eventType filter,
  FnDecompressor.kt:67-71), and counted in lineage;
- required envelope fields (doc_id, commit_ts, lsn — the analogues of
  id/contentType/contentLength/url, FnDecompressor.kt:76-84) are
  checked as one null-check conjunction; violations → quarantine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .schema import change_event_schema

RAW_COL = "raw"
PARSE_FAIL = "envelope:raw:malformed JSON"
_REQUIRED_ENVELOPE = ("op", "doc_id", "commit_ts", "lsn", "batch_epoch")


def read_binlog(spark: SparkSession, path: str, payload_schema: T.StructType | None = None) -> DataFrame:
    """Batch-read a newline-delimited-JSON change log directory."""
    return parse_envelopes(spark.read.text(path).withColumnRenamed("value", RAW_COL),
                           payload_schema)


def read_binlog_stream(
    spark: SparkSession,
    path: str,
    payload_schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming tail of the change log (file source; Kafka in prod —
    swap ``format("kafka")`` + ``value`` cast, nothing else changes)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(path).withColumnRenamed("value", RAW_COL)
    return parse_envelopes(raw, payload_schema)


def parse_envelopes(raw_df: DataFrame, payload_schema: T.StructType | None = None) -> DataFrame:
    """raw:string -> raw + op/doc_id/payload/commit_ts/lsn/batch_epoch +
    ``envelope_fail`` (null when the envelope is well-formed).

    from_json is lenient like GSON here: extra fields ignored, missing
    fields null. A null parse result == malformed JSON.
    """
    schema = change_event_schema(payload_schema)
    # PERMISSIVE mode + explicit corrupt-record column: malformed JSON
    # lands in _corrupt instead of aborting (the reference's
    # createFailEvent-on-JsonSyntaxException, FnDecompressor.kt:52-58).
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt", T.StringType(), True)]
    )
    df = raw_df.withColumn(
        "_ev",
        F.from_json(
            F.col(RAW_COL), parse_schema, {"columnNameOfCorruptRecord": "_corrupt"}
        ),
    )
    df = df.select(
        RAW_COL,
        *[F.col(f"_ev.{f.name}").alias(f.name) for f in schema.fields],
        (F.col("_ev").isNull() | F.col("_ev._corrupt").isNotNull()).alias("_parse_failed"),
    )
    missing = [
        F.when(
            F.col(c).isNull(), F.lit(f"envelope:{c}:required envelope field missing")
        )
        for c in _REQUIRED_ENVELOPE
    ]
    return df.withColumn(
        "envelope_fail",
        F.when(F.col("_parse_failed"), F.lit(PARSE_FAIL)).otherwise(
            F.get(F.array_compact(F.array(*missing)), 0)
        ),
    ).drop("_parse_failed")


def classify(df: DataFrame, op_whitelist: tuple[str, ...] = ("insert", "update", "delete")) -> DataFrame:
    """Tag each event: 'apply' | 'skip' (unknown op) | 'reject'
    (malformed/missing envelope). Blank/whitespace-only lines are
    skipped like the reference's empty-message guard
    (FnDecompressor.kt:45-49)."""
    return df.withColumn(
        "event_class",
        F.when(F.trim(F.col(RAW_COL)) == "", F.lit("skip"))
        .when(F.col("envelope_fail").isNotNull(), F.lit("reject"))
        .when(~F.col("op").isin(*op_whitelist), F.lit("skip"))
        .otherwise(F.lit("apply")),
    )
