"""Per-epoch stream profiling and drift detection.

The reference reports pass/fail counts per run (A1,
csvValidationFunction_Generic.kt:47-48,87-109) and per-phase
statistics (A3, ValidateEntry.java:135-164); a production CDC tail
needs the richer version: per-epoch DATA profiles — null rates,
source mix, token-length distribution, key cardinality — appended as
a sink beside lineage, so an operator can see the corpus drifting
(a producer starts emitting empty token arrays; a new source ramps;
sequence lengths shift under a new tokenizer) without scanning the
table.

Shape: LONG rows ``(batch_epoch, kind, key, value:double)`` — one
schema forever, additive across payload-schema evolution (a new
payload column is just new ``null_frac`` keys, never a sink schema
change — the same additive-evolution stance as the table itself).

Plan: ONE grouping-sets aggregate per call — the epoch-level cell
and the (epoch, source) cells come out of a single shuffle (the same
GROUPING SETS trick the engine's lineage rollup uses,
stream.py apply_batch), then a driver-free unpivot (stack) into long
rows. Per-epoch cell counts are O(epochs x sources) — tiny at any
scale; the aggregate itself is map-side partial everywhere.

Quantiles use ``percentile_approx`` (t-digest style sketch —
mergeable, so partials combine across partitions without a second
shuffle); exact percentiles at 10^10 rows would need a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

PROFILE_KINDS = (
    "n_rows", "null_frac", "distinct_approx",
    "mean", "p50", "p95", "min", "max", "source_frac",
)


def profile_events(
    df: DataFrame,
    epoch_col: str = "batch_epoch",
    source_col: str = "source",
    numeric_col: str = "n_tok",
    key_col: str = "doc_id",
    columns: list[str] | None = None,
) -> DataFrame:
    """Profile ``df`` per ``epoch_col``: long rows
    ``(epoch_col, kind, key, value)``.

    Emitted kinds: ``n_rows`` (key ``_all``), ``null_frac`` per
    profiled column, ``distinct_approx`` for ``key_col``,
    ``mean/p50/p95/min/max`` for ``numeric_col`` (skipped when the
    column is absent), ``source_frac`` per ``source_col`` value
    (skipped when absent; NULL sources keyed ``_null``).
    """
    cols = columns or [c for c in df.columns if c != epoch_col]
    has_src = source_col in df.columns
    has_num = numeric_col in df.columns
    has_key = key_col in df.columns

    aggs = [F.count(F.lit(1)).cast("double").alias("_n")]
    for c in cols:
        aggs.append(
            F.avg(F.col(c).isNull().cast("int")).alias(f"_nf_{c}")
        )
    if has_key:
        aggs.append(
            F.approx_count_distinct(key_col).cast("double").alias("_dk")
        )
    if has_num:
        num = F.col(numeric_col).cast("double")
        aggs += [
            F.avg(num).alias("_mean"),
            F.percentile_approx(num, 0.5).alias("_p50"),
            F.percentile_approx(num, 0.95).alias("_p95"),
            F.min(num).alias("_min"),
            F.max(num).alias("_max"),
        ]

    if has_src:
        cells = df.groupingSets(
            [[epoch_col], [epoch_col, source_col]], epoch_col, source_col
        ).agg(F.grouping(source_col).alias("_g"), *aggs)
        epoch_cells = cells.filter(F.col("_g") == 1)
        src_cells = cells.filter(F.col("_g") == 0)
    else:
        epoch_cells = df.groupBy(epoch_col).agg(*aggs)
        src_cells = None

    pairs = [("n_rows", "_all", F.col("_n"))]
    for c in cols:
        pairs.append(("null_frac", c, F.col(f"_nf_{c}")))
    if has_key:
        pairs.append(("distinct_approx", key_col, F.col("_dk")))
    if has_num:
        for k in ("mean", "p50", "p95", "min", "max"):
            pairs.append((k, numeric_col, F.col(f"_{k}")))
    unpivot = F.array(
        *[
            F.struct(
                F.lit(kind).alias("kind"),
                F.lit(key).alias("key"),
                v.cast("double").alias("value"),
            )
            for kind, key, v in pairs
        ]
    )
    out = epoch_cells.select(
        epoch_col, F.explode(unpivot).alias("_m")
    ).select(epoch_col, "_m.kind", "_m.key", "_m.value")

    if src_cells is not None:
        tot = F.sum("_n").over(Window.partitionBy(epoch_col))
        src_rows = src_cells.select(
            F.col(epoch_col),
            F.lit("source_frac").alias("kind"),
            F.coalesce(F.col(source_col).cast("string"), F.lit("_null")).alias(
                "key"
            ),
            (F.col("_n") / tot).cast("double").alias("value"),
        )
        out = out.unionByName(src_rows)
    return out


def drift(
    profiles: DataFrame,
    epoch_a: int,
    epoch_b: int,
    epoch_col: str = "batch_epoch",
) -> DataFrame:
    """Compare two epochs of a profile frame.

    Returns ``(kind, key, value_a, value_b, abs_diff)`` per metric
    (full outer on (kind, key): a source present in only one epoch
    compares against 0 for frac kinds, NULL otherwise), plus one
    summary row ``('drift_l1', 'source_frac', ...)`` — the L1
    distance between the two source mixes (0 = identical mix, 2 =
    disjoint), the single number a monitor alerts on.
    """
    a = profiles.filter(F.col(epoch_col) == epoch_a).select(
        "kind", "key", F.col("value").alias("value_a")
    )
    b = profiles.filter(F.col(epoch_col) == epoch_b).select(
        "kind", "key", F.col("value").alias("value_b")
    )
    frac = F.col("kind").isin("source_frac", "null_frac")
    j = (
        a.join(b, ["kind", "key"], "full_outer")
        .withColumn(
            "value_a", F.when(frac, F.coalesce("value_a", F.lit(0.0))).otherwise(F.col("value_a"))
        )
        .withColumn(
            "value_b", F.when(frac, F.coalesce("value_b", F.lit(0.0))).otherwise(F.col("value_b"))
        )
        .withColumn("abs_diff", F.abs(F.col("value_b") - F.col("value_a")))
    )
    l1 = j.filter(F.col("kind") == "source_frac").agg(
        F.lit("drift_l1").alias("kind"),
        F.lit("source_frac").alias("key"),
        F.lit(None).cast("double").alias("value_a"),
        F.lit(None).cast("double").alias("value_b"),
        F.coalesce(F.sum("abs_diff"), F.lit(0.0)).alias("abs_diff"),
    )
    return j.unionByName(l1)


def profile_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("batch_epoch", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("key", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )


# ------------------------------------------------- mergeable sketches
#
# The profile's ``distinct_approx`` answers "how many distinct keys in
# THIS epoch" but is a dead end across epochs: distinct counts don't
# add. The sketch sink stores the DataSketches HLL state itself
# (``hll_sketch_agg``, binary, ~2 KB at the default lgK=12), so any
# epoch window unions to an exact-algebra distinct estimate —
# "distinct doc_ids touched in the last 10k epochs" costs a scan of
# 10k tiny sink rows, never a table or binlog re-scan. This is the
# standard mergeable-summary contract (same stance as the profile's
# percentile_approx t-digests, but persisted in mergeable form).


def sketch_events(
    df: DataFrame,
    epoch_col: str = "batch_epoch",
    columns: tuple[str, ...] | list[str] = ("doc_id",),
    lgk: int = 12,
    group_col: str | None = None,
) -> DataFrame:
    """Per-epoch HLL sketches: long rows ``(epoch_col, key,
    sketch:binary)``, one per (epoch, column). ONE map-side-partial
    aggregate; NULLs don't feed the sketch (SQL-distinct semantics).

    With ``group_col`` (e.g. ``source``), sketches are additionally
    keyed per group value — the key string encodes the group as
    ``"<column>@<group>"`` (NULL group → ``@__null__``), so the sink
    schema and every reader (:func:`distinct_over`, compaction, the
    CLI) are unchanged; the per-group rows are one more
    low-cardinality cell per epoch. All sketches in one sink must
    share ``lgk`` so :func:`distinct_over` can union them."""
    cols = [c for c in columns if c in df.columns]
    grouping = [F.col(epoch_col)]
    key_suffix = F.lit("")
    if group_col is not None and group_col in df.columns:
        g = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
        grouping.append(g.alias("_grp"))
        key_suffix = F.concat(F.lit("@"), F.col("_grp"))
    aggs = [
        F.hll_sketch_agg(F.col(c), F.lit(lgk)).alias(f"_sk_{c}")
        for c in cols
    ]
    cells = df.groupBy(*grouping).agg(*aggs)
    unpivot = F.array(
        *[
            F.struct(
                F.concat(F.lit(c), key_suffix).alias("key"),
                F.col(f"_sk_{c}").alias("sketch"),
            )
            for c in cols
        ]
    )
    return cells.select(
        F.col(epoch_col), F.explode(unpivot).alias("_m")
    ).select(epoch_col, "_m.key", "_m.sketch")


def distinct_over(
    sketches: DataFrame,
    epoch_lo: int | None = None,
    epoch_hi: int | None = None,
    epoch_col: str = "batch_epoch",
) -> DataFrame:
    """Union the sketch sink across an epoch window (inclusive
    bounds, None = unbounded) -> ``(key, n_epochs, n_distinct)`` per
    sketched column. Epoch pruning is partition pruning on the sink;
    the union is a map-side-partial aggregate over O(epochs) rows."""
    f = sketches
    if epoch_lo is not None:
        f = f.filter(F.col(epoch_col) >= epoch_lo)
    if epoch_hi is not None:
        f = f.filter(F.col(epoch_col) <= epoch_hi)
    return f.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_epochs"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "n_distinct"
        ),
    )


def sketch_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("batch_epoch", T.LongType()),
            T.StructField("key", T.StringType()),
            T.StructField("sketch", T.BinaryType()),
        ]
    )


# ---------------------------------------------- sink file compaction
#
# The sketch sink is retention-exempt by design (its value is the
# long horizon), so its per-epoch dynamic-overwrite layout —
# ``batch_epoch=N/part-*.parquet``, the layout that makes redelivery
# idempotent — accumulates one directory + file per epoch for the
# stream's LIFETIME: a classic small-files problem at 10^5 epochs.
# ``compact_sketches`` packs every epoch at or below the committed
# watermark (those epochs are never re-applied — the engine's
# watermark filter drops them before any sink write — so their
# partitions will never be overwritten again) into a few large files
# under ``_packed/pack=<through>/``. The underscore prefix means
# ``spark.read.parquet(sink)`` keeps seeing ONLY the live per-epoch
# partitions; ``read_sketches`` unions live + packed and drops
# (epoch, key) duplicates, which makes the crash window between
# pack-write and live-expire harmless and re-running a compaction a
# no-op.

_PACKED_SUBDIR = "_packed"


def read_sketches(spark, path: str) -> DataFrame:
    """All sketch rows: live per-epoch partitions + packed files,
    deduped on (batch_epoch, key) so a compaction crash window (epoch
    present in both) never double-counts ``n_epochs``."""
    import os

    live = spark.read.schema(sketch_schema()).parquet(path)
    packed_path = os.path.join(path, _PACKED_SUBDIR)
    if not os.path.isdir(packed_path):
        return live
    packed = spark.read.parquet(packed_path).select(
        "batch_epoch", "key", "sketch"
    )
    return live.unionByName(packed).dropDuplicates(["batch_epoch", "key"])


def compact_sketches(spark, path: str, through_epoch: int) -> dict:
    """Pack live sketch partitions with ``0 <= batch_epoch <=
    through_epoch`` into ``_packed/pack=<through_epoch>/`` (one file)
    and delete the packed per-epoch dirs. Callers pass a cutoff at or
    below the engine's committed epoch watermark — those epochs are
    replay-stable, so the pack is write-once in practice; the pack
    partition is dynamic-overwritten, so a crash + re-run converges.

    Returns {"packed_epochs": n, "removed_dirs": n}."""
    import os

    from ..lineage import expire_epoch_partitions

    live = (
        spark.read.schema(sketch_schema())
        .parquet(path)
        .filter(
            (F.col("batch_epoch") >= 0)
            & (F.col("batch_epoch") <= through_epoch)
        )
    )
    n_epochs = live.select("batch_epoch").distinct().count()
    if n_epochs == 0:
        return {"packed_epochs": 0, "removed_dirs": 0}
    (
        live.withColumn("pack", F.lit(through_epoch))
        .repartition(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pack")
        .parquet(os.path.join(path, _PACKED_SUBDIR))
    )
    removed = expire_epoch_partitions(path, through_epoch + 1)
    return {"packed_epochs": n_epochs, "removed_dirs": removed}
