"""The engine driver: change-log tail -> validated exactly-once MERGE.

Pipeline per micro-batch (SURVEY.md §3.1 "new-engine trace"):

    parse envelopes (events.py, raw+parsed duality)
      -> classify apply/skip/reject            (op filter F3, null-checks F4)
      -> drop already-committed epochs          (exactly-once, idempotent)
      -> payload validation                     (validate.py, V8/V10/V11/V13...)
      -> quarantine split                       (V17 error accumulation)
      -> per-key last-writer-wins dedup         (A5; skew-proof aggregate)
      -> schema reconcile + MERGE               (J2/J3/J4; lake.py)
      -> lineage + epoch markers                (A4; lineage.py)

Shuffle budget per batch: ONE shuffle at the dedup aggregate (with
map-side partial aggregation) and ONE join at the merge (broadcast
when the change set is small — AQE decides). Everything else is
narrow. Filters and column pruning reach the scans; validation is
whole-stage-codegen Column exprs (or mapInArrow masks when configured);
no per-row Python anywhere.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .config import EngineConfig
from .events import classify, parse_envelopes, read_binlog, read_binlog_stream
from .lake import LakeTable
from .lineage import write_lineage_rows, write_quarantine
from .validate import FAIL_COL, validate_frame


@dataclass
class BatchMetrics:
    events_seen: int = 0
    events_applied: int = 0
    rejects: int = 0
    skipped: int = 0
    rows_merged: int = 0
    epochs: list[int] = field(default_factory=list)
    wall_ms: int = 0
    phase_ms: dict = field(default_factory=dict)  # per-phase wall (debug)


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        warehouse: str,
        config: EngineConfig | None = None,
        payload_schema: T.StructType | None = None,
    ):
        self.spark = spark
        self.table = table
        self.config = config or EngineConfig()
        # Explicit payload schema = the "schema registry" side of
        # evolution: pass an evolved struct here and the engine
        # reconciles it against the table before MERGE (SURVEY.md J2/V6).
        self.payload_schema = payload_schema
        self.quarantine_path = os.path.join(warehouse, self.config.quarantine_subdir)
        self.lineage_path = os.path.join(warehouse, self.config.lineage_subdir)

    # ------------------------------------------------------------ one batch

    def apply_batch(self, parsed: DataFrame) -> BatchMetrics:
        """Apply one micro-batch of parsed change events exactly-once."""
        t0 = time.monotonic()
        phases: dict[str, int] = {}

        def _mark(name: str, since: float) -> float:
            now = time.monotonic()
            phases[name] = int((now - since) * 1000)
            return now

        rules = self.config.rules
        ev = classify(parsed, op_whitelist=rules.op_whitelist)

        # Exactly TWO passes over the batch: (1) an envelope-only count
        # aggregate (column pruning reaches the JSON parser — token
        # arrays are never parsed here), and (2) ONE full scan that
        # validates, dedups, and stages quarantine rows through a single
        # keyed aggregate whose output (small: one row per touched key)
        # is cached and fan-consumed by merge + quarantine + counts.
        # Full-batch persistence was measured NOT to pay off (block-
        # cache build flat ~13s at any core count; a staging parquet
        # write costs more than the scan it saves — see BENCH notes),
        # but this tiny post-aggregate cache is cheap and load-bearing.

        # --- pass 1: one aggregate = epochs + lineage + all counts ----
        groups = (
            ev.withColumn("partition_id", F.spark_partition_id())
            .groupBy(
                "batch_epoch",
                "partition_id",
                F.col("payload.source").alias("source"),
                "event_class",
            )
            .count()
            .collect()
        )
        committed = self.table.committed_epochs()
        batch_epochs = sorted({r["batch_epoch"] for r in groups if r["batch_epoch"] is not None})
        new_epochs = sorted(set(batch_epochs) - committed)
        tp = _mark("scan_counts", t0)
        if not new_epochs and batch_epochs:
            return BatchMetrics(epochs=[], wall_ms=int((time.monotonic() - t0) * 1000))

        live_groups = [
            r
            for r in groups
            if r["batch_epoch"] is None or r["batch_epoch"] in set(new_epochs)
        ]
        by_class: dict[str, int] = {}
        for r in live_groups:
            by_class[r["event_class"]] = by_class.get(r["event_class"], 0) + r["count"]

        keep_epoch = F.col("batch_epoch").isNull()  # rejects may lack an epoch
        if new_epochs:
            keep_epoch = keep_epoch | F.col("batch_epoch").isin(new_epochs)
        live = ev.filter(keep_epoch)

        # --- pass 2: THE single full scan ------------------------------
        # validate -> tag quarantine rows -> one dedup aggregate that
        # carries BOTH streams: good rows group by doc_id (last-writer-
        # wins), quarantine rows ride the same shuffle under unique
        # synthetic keys ('q#'+lsn; 'q#'+xxhash64(raw) for malformed
        # lines with no lsn), so the raw change log is parsed exactly
        # once per batch. Byte-identical malformed lines collapse into
        # one group and are re-expanded from the group count at write
        # time, so quarantine row counts stay event-exact.
        flat = live.filter(F.col("event_class") != "skip").select(
            "raw",
            "event_class",
            "op",
            "doc_id",
            F.col("payload.*"),
            "commit_ts",
            "lsn",
            "batch_epoch",
            "envelope_fail",
        )
        meta_cols = (
            "raw", "event_class", "op", "doc_id",
            "commit_ts", "lsn", "batch_epoch", "envelope_fail", FAIL_COL,
        )
        payload_cols = [c for c in flat.columns if c not in meta_cols]
        # fail_reasons for every row, then gated: envelope rejects carry
        # their envelope failure; only apply-upserts keep payload-rule
        # failures (deletes have no payload to validate).
        validated = validate_frame(flat, rules, self.config.validator)
        gated = validated.withColumn(
            FAIL_COL,
            F.when(F.col("event_class") == "reject", F.array("envelope_fail"))
            .when(
                (F.col("event_class") == "apply") & (F.col("op") != "delete"),
                F.col(FAIL_COL),
            ),
        )
        is_q = (F.col("event_class") == "reject") | F.coalesce(
            F.size(FAIL_COL) > 0, F.lit(False)
        )
        qkey = F.when(~is_q, F.col("doc_id")).otherwise(
            F.concat(
                F.lit("q#"),
                F.coalesce(
                    F.col("lsn").cast("string"), F.xxhash64("raw").cast("string")
                ),
            )
        )
        staged = gated.select(
            qkey.alias("_qkey"),
            is_q.alias("_is_q"),
            # raw (a lazy to_json re-render for well-formed rows) is
            # materialized + shuffled ONLY for quarantine rows
            F.when(is_q, F.col("raw")).alias("raw"),
            "op",
            "doc_id",
            *payload_cols,
            "commit_ts",
            "lsn",
            "batch_epoch",
            FAIL_COL,
        )
        row_cols = [c for c in staged.columns if c != "_qkey"]
        # `latest` IS persisted: it is small (one row per touched key +
        # one per quarantined event) and feeds a count + two merge
        # inputs + the quarantine write.
        latest = (
            staged.groupBy("_qkey")
            .agg(
                F.max_by(F.struct(*row_cols), F.struct("commit_ts", "lsn")).alias("_r"),
                F.count(F.lit(1)).alias("_n_events"),
            )
            .select(F.col("_r.*"), "_n_events")
            .cache()
        )
        try:
            upserts = latest.filter(
                ~F.col("_is_q") & (F.col("op") != "delete")
            ).select("doc_id", *payload_cols)
            delete_keys = latest.filter(
                ~F.col("_is_q") & (F.col("op") == "delete")
            ).select("doc_id")
            # ONE aggregate job builds the cache AND yields everything
            # the driver needs: merged-row count, the affected-bucket
            # set (passed into merge so it skips its own distinct+
            # collect job), and the quarantined-event count (exact even
            # for collapsed duplicate groups, via _n_events).
            nb = self.table.num_buckets
            stats = latest.agg(
                F.sum((~F.col("_is_q")).cast("long")).alias("rows_merged"),
                F.collect_set(
                    F.when(
                        ~F.col("_is_q"),
                        F.pmod(F.xxhash64("doc_id"), F.lit(nb)).cast("int"),
                    )
                ).alias("buckets"),
                F.sum(
                    F.when(F.col("_is_q"), F.col("_n_events")).otherwise(F.lit(0))
                ).alias("q_events"),
            ).collect()[0]
            rows_merged = int(stats["rows_merged"] or 0)
            affected_buckets = sorted(stats["buckets"])
            n_quarantined = int(stats["q_events"] or 0)
            td = _mark("validate_dedup", tp)

            # Unattributable rows (malformed JSON -> no epoch) get a
            # per-batch fallback partition, -1-min(epoch), so a later
            # batch's dynamic overwrite can never erase them.
            fallback_epoch = -1 - (min(new_epochs) if new_epochs else 0)
            quarantined = (
                latest.filter(F.col("_is_q"))
                # re-expand collapsed duplicates (same qkey) so the
                # quarantine stays one row per rejected event
                .withColumn("_i", F.explode(F.sequence(F.lit(1), F.col("_n_events"))))
                .select(
                    "raw",
                    "doc_id",
                    FAIL_COL,
                    F.coalesce(F.col("batch_epoch"), F.lit(fallback_epoch)).alias(
                        "batch_epoch"
                    ),
                )
            )

            # MERGE and quarantine-write are independent given `latest`
            # (cached) — submit them from two driver threads so the
            # scheduler overlaps one job's I/O waits with the other's
            # compute (both still exactly-once: different sinks).
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                f_merge = pool.submit(
                    self.table.merge,
                    upserts,
                    delete_keys,
                    epochs=new_epochs,
                    affected_buckets=affected_buckets,
                )
                f_quar = pool.submit(
                    write_quarantine, quarantined, self.quarantine_path
                )
                f_merge.result()
                f_quar.result()
            tm = _mark("merge_and_quarantine", td)
            n_env_rejects = by_class.get("reject", 0)
            n_val_rejects = n_quarantined - n_env_rejects

            wall_ms = int((time.monotonic() - t0) * 1000)
            metrics = BatchMetrics(
                events_seen=sum(by_class.values()),
                # validation rejects were classified 'apply' upstream
                events_applied=by_class.get("apply", 0) - n_val_rejects,
                rejects=n_env_rejects + n_val_rejects,
                skipped=by_class.get("skip", 0),
                rows_merged=rows_merged,
                epochs=new_epochs,
                wall_ms=wall_ms,
            )
            # lineage from the pass-1 groups — pure driver-side rollup
            lin_rows = [
                (
                    int(r["batch_epoch"]) if r["batch_epoch"] is not None else fallback_epoch,
                    int(r["partition_id"]),
                    r["source"],
                    int(r["count"]),
                    int(r["count"]) if r["event_class"] == "apply" else 0,
                    int(r["count"]) if r["event_class"] == "reject" else 0,
                    int(r["count"]) if r["event_class"] == "skip" else 0,
                    int(rows_merged),
                    int(wall_ms),
                )
                for r in live_groups
            ]
            write_lineage_rows(lin_rows, self.lineage_path)
            _mark("sinks", tm)
            metrics.phase_ms = phases
            return metrics
        finally:
            latest.unpersist()

    # ------------------------------------------------------------ batch API

    def apply_binlog(self, binlog_path: str) -> BatchMetrics:
        """Apply a whole change-log directory as one batch (replay)."""
        parsed = read_binlog(self.spark, binlog_path, self.payload_schema)
        return self.apply_batch(parsed)

    # --------------------------------------------------------- streaming API

    def run_stream(
        self,
        binlog_path: str,
        checkpoint_path: str,
        available_now: bool = True,
        max_files_per_trigger: int | None = None,
        processing_time: str = "5 seconds",
    ):
        """Tail the change log with Structured Streaming.

        Offsets checkpoint to ``checkpoint_path`` (source-side resume);
        epoch markers in the table manifest make the sink idempotent, so
        at-least-once redelivery from the checkpoint converges to
        exactly-once table state (north_star)."""
        parsed = read_binlog_stream(
            self.spark,
            binlog_path,
            self.payload_schema,
            max_files_per_trigger=max_files_per_trigger,
        )

        def _process(batch_df: DataFrame, epoch_id: int) -> None:
            self.apply_batch(batch_df)

        writer = parsed.writeStream.foreachBatch(_process).option(
            "checkpointLocation", checkpoint_path
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def run_until_caught_up(self, binlog_path: str, checkpoint_path: str) -> None:
        q = self.run_stream(binlog_path, checkpoint_path, available_now=True)
        q.awaitTermination()
