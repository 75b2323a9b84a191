"""Incremental materialized aggregate views over the table changelog.

The reference emits per-run pass/fail counts downstream of every
pipeline stage (SURVEY A1/A4: `csvValidationFunction_Generic.kt:47-48`
report maps, OK/FAIL event rollups) — at 10^10 rows the analogous
"summary table over the lake" cannot be recomputed per refresh. This
module maintains an ADDITIVE aggregate view (count + sums per group)
as a downstream consumer of :meth:`LakeTable.changes`, the same
pattern as ``operators.ann.sync_index_from_table``:

* **O(change) refresh.** One changelog read (O(change) for MOR
  commits), one bucket-pruned pre-image probe of the source at the
  last-synced version (only buckets holding changed keys are read),
  one small join against the view's affected groups. The other
  ~100% of the table is never touched.
* **Exactly-once cursor.** The synced-through source version is
  recorded as the VIEW table's own epoch markers, so the data merge
  and the cursor advance are one atomic manifest publish; a crash
  either committed both or neither, and re-running is a no-op.
* **Retraction by snapshot probe.** The changelog deliberately does
  not carry update pre-images (MOR deletes are key-only — see
  ``lake.changes``); the maintainer fetches pre-images itself from
  ``read(version=synced, buckets=touched)``, priced the same as the
  merge that produced the change.

Only additive aggregates (count, sum) are maintained — they are the
ones with exact retraction. min/max need a dirty-group rescan and are
out of contract (document-level means derive as sum/count at read).
Sums over integral columns are exact (bigint); float sums differ from
a full recompute only by FP reassociation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..lake import LakeTable

_GKEY = "_gkey"
_SEP = "\x1f"


def _integral(dt: T.DataType) -> bool:
    return isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )


def _view_schema(
    source_schema: T.StructType, group_cols: list[str], sums: dict[str, str]
) -> tuple[T.StructType, str]:
    """View schema + merge-key name. Multi-column groups get a derived
    string key (the lake's merge key is single-column); the raw group
    columns ride along for direct querying."""
    by_name = {f.name: f for f in source_schema.fields}
    fields = []
    if len(group_cols) > 1:
        key = _GKEY
        fields.append(T.StructField(_GKEY, T.StringType(), False))
    else:
        key = group_cols[0]
    for g in group_cols:
        fields.append(T.StructField(g, by_name[g].dataType, True))
    fields.append(T.StructField("n_rows", T.LongType(), True))
    for src, out in sums.items():
        dt = T.LongType() if _integral(by_name[src].dataType) else T.DoubleType()
        fields.append(T.StructField(out, dt, True))
    return T.StructType(fields), key


def create_agg_view(
    spark: SparkSession,
    root: str,
    source: LakeTable,
    group_cols: list[str],
    sums: dict[str, str],
    num_buckets: int = 8,
) -> LakeTable:
    """Create an EMPTY view table for ``SELECT group_cols, count(*)
    AS n_rows, sum(src) AS out... GROUP BY group_cols`` over
    ``source``. The initial population is just the first
    :func:`refresh_agg_view` — the changelog since table creation IS
    the full content, so there is no separate bootstrap path (and no
    bootstrap/incremental divergence to test for)."""
    schema, key = _view_schema(source.schema, group_cols, sums)
    return LakeTable.create(
        spark,
        root,
        schema,
        key=key,
        num_buckets=num_buckets,
        properties={
            "view.source_key": source.key,
            "view.group_cols": ",".join(group_cols),
            "view.sums": ",".join(f"{s}:{o}" for s, o in sums.items()),
        },
    )


def full_agg(
    df: DataFrame, group_cols: list[str], sums: dict[str, str]
) -> DataFrame:
    """The view's defining query, run wholesale — the oracle the
    incremental path must equal, and a recovery path if the
    changelog's retention window was vacuumed away."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for src, out in sums.items():
        cast = "long" if _integral(df.schema[src].dataType) else "double"
        aggs.append(F.sum(F.col(src).cast(cast)).alias(out))
    out = df.groupBy(*group_cols).agg(*aggs)
    if len(group_cols) > 1:
        out = out.withColumn(_GKEY, F.concat_ws(_SEP, *group_cols))
    return out


def refresh_agg_view(
    source: LakeTable,
    view: LakeTable,
    group_cols: list[str],
    sums: dict[str, str],
    mode: str = "cow",
) -> dict:
    """Fold every source commit in ``(synced, current]`` into the view.

    Per-refresh cost, the reason this works at 10^10 rows:

    1. ``source.changes(synced, cur)`` — O(change) for MOR commits.
    2. Pre-image probe: ``source.read(version=synced)`` pruned to the
       buckets holding changed keys (computed with the synced
       manifest's OWN bucket count, so a rebucket inside the window
       cannot misprune), semi-joined to the changed keys.
    3. Delta aggregation: +1/+val for each key's post-state, -1/-val
       for its pre-state; intermediate states inside the window cancel
       by construction (only endpoints are read).
    4. One merge into the view over only the affected groups, with the
       source versions as the view's epoch markers (exactly-once).
    """
    watermark, _tail = view.epoch_state()
    synced = max(watermark, 0)
    cur = source.current_version()
    if cur <= synced:
        return {"synced_through": synced, "applied": False}

    key = source.key
    ch = source.changes(synced, cur)
    # Collapse to each key's final state in the window. Same-commit
    # upsert+tombstone ties break like the MOR read: the upsert wins.
    last = (
        ch.groupBy(key)
        .agg(
            F.max_by(
                F.struct(*[c for c in ch.columns if c != key]),
                F.struct(
                    F.col("_commit_version"),
                    F.col("_change_type") != F.lit("delete"),
                ),
            ).alias("_c")
        )
        .select(key, "_c.*")
        # consumed three times (post, pre-probe semi-join, bucket
        # collect) — pin so the changelog read executes once
        .localCheckpoint(eager=True)
    )
    post = last.filter(F.col("_change_type") != "delete").drop(
        "_change_type", "_commit_version"
    )
    changed_keys = last.select(key)

    # Pre-images at the synced version, bucket-pruned in THAT
    # manifest's bucket space (a rebucket inside the window must not
    # misprune). The distinct-bucket collect is bounded by num_buckets
    # (same contract as merge's pruning collect). synced == 0 means
    # never refreshed — there is no pre-state (v1 is the empty create
    # commit, v0 has no snapshot).
    if synced == 0:
        pre = source.spark.createDataFrame([], source.schema)
    else:
        nb_pre = int(source.manifest(synced)["num_buckets"])
        touched = [
            r["_bucket"]
            for r in source._bucket_col(changed_keys, key, nb_pre)
            .select("_bucket")
            .distinct()
            .collect()
        ]
        # the synced snapshot reads under ITS OWN column names; align
        # to the current schema (alias-aware) so a rename of the key
        # or a group/sum column between refreshes cannot break the
        # probe join or the delta aggregation
        pre = source._align(
            source.read(buckets=touched, version=synced),
            source.schema,
            aliases=source._aliases_of(source.manifest()),
        ).join(changed_keys, key, "left_semi")

    def contrib(df: DataFrame, sign: int) -> DataFrame:
        cols = [F.col(g) for g in group_cols] + [
            F.lit(sign).cast("long").alias("_w")
        ]
        for src, out in sums.items():
            cast = (
                "long"
                if _integral(source.schema[src].dataType)
                else "double"
            )
            cols.append(
                (F.lit(sign) * F.coalesce(F.col(src).cast(cast), F.lit(0))).alias(
                    f"_d_{out}"
                )
            )
        return df.select(*cols)

    delta = (
        contrib(post, 1)
        .unionByName(contrib(pre, -1))
        .groupBy(*group_cols)
        .agg(
            F.sum("_w").alias("_d_rows"),
            *[F.sum(f"_d_{out}").alias(f"_d_{out}") for out in sums.values()],
        )
    )
    vkey = view.key
    if len(group_cols) > 1:
        delta = delta.withColumn(vkey, F.concat_ws(_SEP, *group_cols))

    # Current view rows for ONLY the affected groups (bucket-pruned on
    # the view side too), then old+delta. Groups reaching zero rows
    # leave the view — the retraction analogue of a full-group delete.
    nb_v = view.num_buckets
    vb = [
        r["_bucket"]
        for r in view._bucket_col(delta.select(vkey), vkey, nb_v)
        .select("_bucket")
        .distinct()
        .collect()
    ]
    cur_rows = view.read(buckets=vb).join(
        delta.select(vkey), vkey, "left_semi"
    )
    old_sum_cols = {out: f"_old_{out}" for out in sums.values()}
    cur_rows = cur_rows.select(
        vkey,
        F.col("n_rows").alias("_old_rows"),
        *[F.col(out).alias(a) for out, a in old_sum_cols.items()],
    )
    merged = delta.join(cur_rows, vkey, "left").select(
        vkey,
        *group_cols,
        (F.coalesce(F.col("_old_rows"), F.lit(0)) + F.col("_d_rows")).alias(
            "n_rows"
        ),
        *[
            (
                F.coalesce(F.col(old_sum_cols[out]), F.lit(0))
                + F.col(f"_d_{out}")
            ).alias(out)
            for out in sums.values()
        ],
    )
    if len(group_cols) == 1:
        merged = merged.select(*group_cols, "n_rows", *sums.values())
    # One pass, consumed twice (upserts + deletes): pin it so the
    # changelog/probe lineage executes once.
    merged = merged.localCheckpoint(eager=True)
    ups = merged.filter(F.col("n_rows") > 0)
    dels = merged.filter(F.col("n_rows") <= 0).select(vkey)
    info = view.merge(
        ups,
        delete_keys=dels,
        mode=mode,
        epochs=list(range(synced + 1, cur + 1)),
    )
    return {"synced_through": cur, "applied": True, **info}


def read_view(view: LakeTable) -> DataFrame:
    """The view's current content (drop the derived key column if the
    group is multi-column — callers address groups by the raw cols)."""
    df = view.read()
    return df.drop(_GKEY) if _GKEY in df.columns else df
