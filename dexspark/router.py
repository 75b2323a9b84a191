"""Multi-table routing: one change log fanned out to N CdcEngines.

The reference runs ONE pipeline per upload container; a production
CDC tail often demultiplexes a single binlog into several target
tables (per tenant, per source system, per doc-id shard). The naive
composition — run N independent engines over the same log with a
pre-filter each — breaks exactly-once bookkeeping in two ways:

1. **N source scans per batch.** Each engine re-reads and re-parses
   the same files. The router materializes the parsed batch ONCE
   (``localCheckpoint``) and every route filters the in-memory
   blocks — one source scan per batch total, the same shape a
   1000-executor cluster wants at 100 TB.
2. **Stuck watermarks on quiet routes.** An engine only learns an
   epoch from the events it SEES; a route that received no events of
   epoch E would keep E in its out-of-order tail forever (manifest +
   already-committed predicate growing with stream lifetime). The
   router computes the batch's epoch set once and passes it to every
   route as ``extra_epochs`` (see :meth:`CdcEngine.apply_batch`):
   epochs that routed zero events to a table are recorded there as
   manifest-only marker commits (``LakeTable.mark_epochs``), so all
   routes' watermarks advance in step and stay O(1).

Routing is a deterministic Column expression over the parsed envelope
(``doc_id``, ``payload.*``, ``op``, ...). Events whose route value is
NULL or matches no route (malformed envelopes, corrupt doc_ids) go to
the ``default`` route when one is named, else to a router-level
quarantine sink (``<warehouse>/_router/unrouted``) with the same
epoch-partitioned dynamic-overwrite idempotence as the engines' own
quarantines — redelivery rewrites identical content in place.

Reference parity: the reference fans one upload event out to one
pipeline (FnDecompressorEntry.kt:41-51 routes by container); this is
the N-target generalization a multi-tenant deployment needs.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .events import binlog_looks_parquet, read_binlog, read_binlog_parquet
from .lineage import write_quarantine
from .stream import BatchMetrics, CdcEngine
from .validate import FAIL_COL


class RoutedEngine:
    """Fan one parsed change-event batch out to named CdcEngines.

    ``routes``: name -> CdcEngine (each with its own LakeTable and
    sinks; typically rooted at ``<warehouse>/<name>``).
    ``route_expr``: Column (or SQL string) evaluated over the parsed
    envelope; its STRING value selects the route by name. Must be
    deterministic — it is evaluated once per route filter over the
    same checkpointed batch.
    ``default``: route name that also receives NULL / unmatched route
    values; ``None`` sends those rows to the router quarantine.
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        routes: dict[str, CdcEngine],
        route_expr: Column | str,
        default: str | None = None,
        max_parallel_routes: int = 4,
    ):
        if not routes:
            raise ValueError("RoutedEngine needs at least one route")
        if default is not None and default not in routes:
            raise ValueError(f"default route {default!r} not in routes")
        self.spark = spark
        self.routes = dict(routes)
        self.default = default
        self._route_col = (
            F.expr(route_expr) if isinstance(route_expr, str) else route_expr
        ).cast("string")
        self.unrouted_path = os.path.join(warehouse, "_router", "unrouted")
        # routes write DISJOINT tables/sinks, so their per-batch applies
        # can overlap via driver threads (Spark job submission is
        # thread-safe; the fair scheduler interleaves their stages).
        # Bounded: each in-flight route holds its aggregate's
        # localCheckpoint blocks, so unbounded fan-out trades memory
        # for no additional throughput once executors are saturated.
        self.max_parallel_routes = max(1, int(max_parallel_routes))

    # ------------------------------------------------------------ one batch

    def _matched(self) -> Column:
        return self._route_col.isin(list(self.routes))

    def apply_batch(
        self, parsed: DataFrame, defer_boundary: bool = False
    ) -> dict[str, BatchMetrics]:
        """Apply one micro-batch through every route exactly-once.

        One source scan: the parsed batch is checkpointed eagerly and
        each route's filter (plus the epoch collect and the unrouted
        write) reads the materialized blocks. The batch's non-negative
        epoch set is passed to every route as ``extra_epochs`` so a
        route that saw none of an epoch's events still commits its
        marker (deferred uniformly under ``defer_boundary`` — a split
        epoch defers on ALL routes, whether or not they saw rows)."""
        batch = parsed.localCheckpoint(eager=True)
        rc = self._route_col
        epochs = sorted(
            int(r[0])
            for r in batch.select("batch_epoch")
            .where(F.col("batch_epoch") >= 0)
            .distinct()
            .collect()
        )
        def _one(name: str, eng: CdcEngine) -> BatchMetrics:
            pred = rc.eqNullSafe(F.lit(name))
            if name == self.default:
                pred = pred | ~self._matched() | rc.isNull()
            return eng.apply_batch(
                batch.filter(pred),
                defer_boundary=defer_boundary,
                extra_epochs=epochs,
            )

        out: dict[str, BatchMetrics] = {}
        if self.max_parallel_routes == 1 or len(self.routes) == 1:
            for name, eng in self.routes.items():
                out[name] = _one(name, eng)
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(self.max_parallel_routes, len(self.routes))
            ) as pool:
                futs = {
                    name: pool.submit(_one, name, eng)
                    for name, eng in self.routes.items()
                }
                for name, fut in futs.items():
                    out[name] = fut.result()
        if self.default is None:
            self._write_unrouted(batch)
        return out

    def _write_unrouted(self, batch: DataFrame) -> None:
        """Router-level quarantine for rows no route claims.

        Epoch-partitioned dynamic overwrite (same sink contract as the
        engines' quarantines): a redelivered batch rewrites the same
        partitions with identical content. NULL / negative epochs fold
        into the ``-1`` fallback partition — unlike the engine's
        content-hashed fallback these rows were never deduped, so the
        partition must be stable across redeliveries of the SAME files
        rather than unique per batch; the overwrite granularity is the
        whole fallback partition either way."""
        unrouted = batch.filter(~self._matched() | self._route_col.isNull()).select(
            "raw",
            "doc_id",
            F.array(
                F.concat(
                    F.lit("unrouted:"),
                    F.coalesce(self._route_col, F.lit("null")),
                )
            ).alias(FAIL_COL),
            F.when(F.col("batch_epoch") >= 0, F.col("batch_epoch"))
            .otherwise(F.lit(-1))
            .alias("batch_epoch"),
        )
        write_quarantine(unrouted, self.unrouted_path)

    # ------------------------------------------------------------ batch/replay

    def apply_binlog(
        self, binlog_path: str, format: str | None = None
    ) -> dict[str, BatchMetrics]:
        """Replay a whole change-log directory as one routed batch."""
        if format is None:
            format = "parquet" if binlog_looks_parquet(binlog_path) else "json"
        reader = read_binlog_parquet if format == "parquet" else read_binlog
        # routes may carry different payload schemas; parse with the
        # first route's (schema reconcile inside each engine handles
        # additive drift route-by-route)
        any_engine = next(iter(self.routes.values()))
        parsed = reader(self.spark, binlog_path, any_engine.payload_schema)
        return self.apply_batch(parsed)

    # --------------------------------------------------------- streaming API

    def run_stream(
        self,
        binlog_path: str,
        checkpoint_path: str,
        available_now: bool = True,
        max_files_per_trigger: int | None = None,
        processing_time: str = "5 seconds",
        format: str | None = None,
    ):
        """Tail the change log once, routing every micro-batch.

        One Structured Streaming query feeds all routes (offsets
        checkpoint once); each route's epoch markers keep its own
        table idempotent, so redelivery after a crash converges every
        route independently."""
        from .events import read_binlog_parquet_stream, read_binlog_stream

        if format is None:
            format = "parquet" if binlog_looks_parquet(binlog_path) else "json"
        stream_reader = (
            read_binlog_parquet_stream if format == "parquet" else read_binlog_stream
        )
        any_engine = next(iter(self.routes.values()))
        parsed = stream_reader(
            self.spark,
            binlog_path,
            any_engine.payload_schema,
            max_files_per_trigger=max_files_per_trigger,
        )

        def _process(batch_df: DataFrame, epoch_id: int) -> None:
            self.apply_batch(batch_df, defer_boundary=True)

        writer = parsed.writeStream.foreachBatch(_process).option(
            "checkpointLocation", checkpoint_path
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def flush_epoch_markers(self) -> dict[str, list[int]]:
        """End-of-stream: commit every route's deferred boundary
        markers (manifest-only; see CdcEngine.flush_epoch_markers)."""
        return {n: e.flush_epoch_markers() for n, e in self.routes.items()}

    def run_until_caught_up(
        self,
        binlog_path: str,
        checkpoint_path: str,
        max_files_per_trigger: int | None = None,
    ) -> None:
        q = self.run_stream(
            binlog_path,
            checkpoint_path,
            available_now=True,
            max_files_per_trigger=max_files_per_trigger,
        )
        q.awaitTermination()
        self.flush_epoch_markers()
