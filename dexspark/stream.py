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
from .dedup import latest_per_key
from .events import classify, parse_envelopes, read_binlog, read_binlog_stream
from .lake import LakeTable
from .lineage import lineage_rows, write_lineage, write_quarantine
from .validate import FAIL_COL, split_quarantine, validate_frame


@dataclass
class BatchMetrics:
    events_seen: int = 0
    events_applied: int = 0
    rejects: int = 0
    skipped: int = 0
    rows_merged: int = 0
    epochs: list[int] = field(default_factory=list)
    wall_ms: int = 0


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
        rules = self.config.rules
        ev = classify(parsed, op_whitelist=rules.op_whitelist).cache()
        try:
            # Exactly-once: drop epochs this table already committed.
            # (Distinct epoch ids per batch are few — driver-safe.)
            committed = self.table.committed_epochs()
            batch_epochs = [
                r[0]
                for r in ev.select("batch_epoch").distinct().collect()
                if r[0] is not None
            ]
            new_epochs = sorted(set(batch_epochs) - committed)
            if not new_epochs and batch_epochs:
                return BatchMetrics(epochs=[], wall_ms=int((time.monotonic() - t0) * 1000))
            keep_epoch = F.col("batch_epoch").isNull()  # rejects may lack an epoch
            if new_epochs:
                keep_epoch = keep_epoch | F.col("batch_epoch").isin(new_epochs)
            live = ev.filter(keep_epoch)

            # --- payload validation on applicable upserts -------------
            apply_df = live.filter(F.col("event_class") == "apply")
            flat = apply_df.select(
                "raw",
                "op",
                "doc_id",
                F.col("payload.*"),
                "commit_ts",
                "lsn",
                "batch_epoch",
            )
            upsert_flat = flat.filter(F.col("op") != "delete")
            validated = validate_frame(upsert_flat, rules, self.config.validator).cache()
            ok_upserts, bad_rows = split_quarantine(validated)
            deletes = flat.filter(F.col("op") == "delete").select(
                "raw", "op", "doc_id", "commit_ts", "lsn", "batch_epoch"
            )

            # --- quarantine: envelope rejects + validation failures ---
            env_rejects = live.filter(F.col("event_class") == "reject").select(
                "raw",
                F.lit(None).cast("string").alias("doc_id"),
                F.array("envelope_fail").alias(FAIL_COL),
                F.col("batch_epoch"),
            )
            val_rejects = bad_rows.select("raw", "doc_id", FAIL_COL, "batch_epoch")
            quarantine = env_rejects.unionByName(val_rejects)

            # --- dedup: deletes compete with upserts per key ----------
            # raw/batch_epoch dropped first: the shuffle only carries
            # what the MERGE needs (raw lives on only in quarantine).
            payload_cols = [
                c for c in ok_upserts.columns if c not in ("raw", "op", "doc_id", "commit_ts", "lsn", "batch_epoch")
            ]
            dedup_cols = ["op", "doc_id", *payload_cols, "commit_ts", "lsn"]
            dedup_input = ok_upserts.select(*dedup_cols).unionByName(
                deletes.select(
                    "op",
                    "doc_id",
                    *[F.lit(None).cast(dict(ok_upserts.dtypes)[c]).alias(c) for c in payload_cols],
                    "commit_ts",
                    "lsn",
                )
            )
            latest = latest_per_key(dedup_input, key="doc_id").cache()
            try:
                upserts = latest.filter(F.col("op") != "delete").select("doc_id", *payload_cols)
                delete_keys = latest.filter(F.col("op") == "delete").select("doc_id")

                # --- counts (one aggregation pass over cached ev) -----
                lin = lineage_rows(live).cache()
                counts = lin.agg(
                    F.sum("events_seen"), F.sum("events_applied"), F.sum("rejects"), F.sum("skipped")
                ).collect()[0]
                # validation rejects were classified 'apply' upstream
                n_val_rejects = val_rejects.count()
                rows_merged = latest.count()

                # --- MERGE (schema reconcile inside) ------------------
                self.table.merge(upserts, delete_keys, epochs=new_epochs)

                wall_ms = int((time.monotonic() - t0) * 1000)
                metrics = BatchMetrics(
                    events_seen=int(counts[0] or 0),
                    events_applied=int(counts[1] or 0) - n_val_rejects,
                    rejects=int(counts[2] or 0) + n_val_rejects,
                    skipped=int(counts[3] or 0),
                    rows_merged=rows_merged,
                    epochs=new_epochs,
                    wall_ms=wall_ms,
                )

                # --- sinks (idempotent per-epoch overwrite) -----------
                write_quarantine(
                    quarantine.withColumn(
                        "batch_epoch", F.coalesce(F.col("batch_epoch"), F.lit(-1))
                    ),
                    self.quarantine_path,
                )
                write_lineage(lin, self.lineage_path, metrics.rows_merged, wall_ms)
                return metrics
            finally:
                latest.unpersist()
                validated.unpersist()
        finally:
            ev.unpersist()

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
