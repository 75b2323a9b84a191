"""Per-key last-writer-wins deduplication (SURVEY.md A5/§2.6).

A change batch may carry many events for one key; only the latest by
the total order (commit_ts DESC, lsn DESC) is applied. The reference's
closest concept is recency-based conflict resolution via
File_created_date (COVID_19_File_and_Row_Level_Validation.xlsx sheet
V2020-07-30, validation order 12).

Three implementations, equal by construction (tested in
tests/test_dedup.py):

- ``latest_per_key_window``  the north_star's literal form:
  row_number() over (partition by key order by commit_ts desc, lsn
  desc) == 1. Simple, but a hot key funnels into one task.
- ``latest_per_key``         aggregate form: max_by(struct(all),
  struct(commit_ts, lsn)). Partial (map-side) aggregation makes it
  skew-resistant by default — each input partition reduces a hot key
  to ONE candidate row before the shuffle. Preferred at scale.
- ``latest_per_key_salted``  explicit two-phase salted reduction for
  the pathological case (one key dominating a batch): phase 1 reduces
  per (key, salt), phase 2 per key. Demonstrates the north_star's
  "salted on hot doc_id prefixes" strategy in pure DataFrame code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _order_struct(order_cols: list[str]) -> F.Column:
    return F.struct(*[F.col(c) for c in order_cols])


def latest_per_key_window(
    df: DataFrame, key: str = "doc_id", order_cols: tuple[str, ...] = ("commit_ts", "lsn")
) -> DataFrame:
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def latest_per_key(
    df: DataFrame, key: str = "doc_id", order_cols: tuple[str, ...] = ("commit_ts", "lsn")
) -> DataFrame:
    """max_by aggregate — partial aggregation pre-shuffle kills skew."""
    payload_cols = [c for c in df.columns if c != key]
    agg = df.groupBy(key).agg(
        F.max_by(F.struct(*payload_cols), _order_struct(list(order_cols))).alias("_row")
    )
    return agg.select(key, *[F.col(f"_row.{c}").alias(c) for c in payload_cols])


def latest_per_key_salted(
    df: DataFrame,
    key: str = "doc_id",
    order_cols: tuple[str, ...] = ("commit_ts", "lsn"),
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-phase: reduce per (key, salt) then per key.

    Salt is derived from the unique tiebreaker (lsn) so events of one
    hot key spread over ``salt_buckets`` reducers in phase 1."""
    payload_cols = [c for c in df.columns if c != key]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(order_cols[-1])), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(key, "_salt").agg(
        F.max_by(F.struct(*payload_cols), _order_struct(list(order_cols))).alias("_row")
    )
    phase2 = phase1.groupBy(key).agg(
        F.max_by(F.col("_row"), _order_struct([f"_row.{c}" for c in order_cols])).alias("_row")
    )
    return phase2.select(key, *[F.col(f"_row.{c}").alias(c) for c in payload_cols])
