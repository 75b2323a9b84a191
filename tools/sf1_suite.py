"""sf1 (10x) suite: every headline op at 10x the driver bench scale.

VERDICT r4 task 5: the r4 sf1 proof point covered cdc_apply only; this
runs the WHOLE headline window at sf1 and records, per query:

- wall seconds (best of N interleaved passes, the headline protocol),
- a plan-shape assertion: the number of Exchange nodes in the
  compiled physical plan at sf1 must not exceed sf0.1's (no NEW
  shuffles appear from the 10x step; AQE may still coalesce at
  runtime, which only removes exchanges),
- peak process-tree RSS over the whole suite.

The sf1 input is synthesized deterministically from the driver's own
sf0.1 parquet (no external data): each fact table is replicated
``factor`` times with primary/foreign keys offset per copy so join
cardinalities and group counts scale ~10x while referential integrity
holds; dims (region/nation/supplier/part) stay fixed, the TPC-H
shape. Document text gets a tiny per-copy tag so the exact-dup /
near-dup structure replicates per copy instead of collapsing into
cross-copy exact-duplicate clusters (an organic 10x corpus does not
consist of 10 byte-identical shards).

Usage:
    python tools/sf1_suite.py [--factor 10] [--passes 2]
        [--src /root/testdata/sf0.1] [--out /dev/shm/dexspark-sf1]
        [--skip-cdc] [--cdc-events 40000000]

Prints ONE JSON line; BENCH.md folds it into the sf1 table.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

# key offsets per copy, comfortably above sf0.1 max keys
OFF_CUST = 1_000_000
OFF_ORDER = 10_000_000
OFF_DOC = 1_000_000
OFF_VEC = 1_000_000
OFF_EVENT = 10_000_000
OFF_USER = 1_000_000

DIMS = ("region", "nation", "supplier", "part")


def build_scaled(spark, src: str, out: str, factor: int) -> None:
    """Deterministic factor-x replication of the sf0.1 tables."""
    os.makedirs(out, exist_ok=True)
    for name in DIMS:
        df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))

    def reps(df, remap):
        """Union ``factor`` copies with per-copy key remaps.

        One scan per copy of a tiny input; the copy index is a literal
        so every remap folds into whole-stage codegen."""
        parts = []
        for i in range(factor):
            c = df
            for col, expr in remap(i).items():
                c = c.withColumn(col, expr)
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    t = spark.read.parquet(os.path.join(src, "customer.parquet"))
    reps(t, lambda i: {"c_custkey": F.col("c_custkey") + i * OFF_CUST}).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "customer.parquet"))

    t = spark.read.parquet(os.path.join(src, "orders.parquet"))
    reps(
        t,
        lambda i: {
            "o_orderkey": F.col("o_orderkey") + i * OFF_ORDER,
            "o_custkey": F.col("o_custkey") + i * OFF_CUST,
        },
    ).write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))

    t = spark.read.parquet(os.path.join(src, "lineitem.parquet"))
    reps(t, lambda i: {"l_orderkey": F.col("l_orderkey") + i * OFF_ORDER}).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "lineitem.parquet"))

    t = spark.read.parquet(os.path.join(src, "events.parquet"))
    reps(
        t,
        lambda i: {
            "event_id": F.col("event_id") + i * OFF_EVENT,
            "user_id": F.col("user_id") + i * OFF_USER,
        },
    ).write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    t = spark.read.parquet(os.path.join(src, "documents.parquet"))
    reps(
        t,
        lambda i: {
            "doc_id": F.col("doc_id") + i * OFF_DOC,
            # per-copy tag: keeps copies NEAR-duplicates of each other
            # (organic corpora repeat content with small edits) while
            # the per-copy exact/near-dup structure replicates intact
            "text": F.col("text")
            if i == 0
            else F.concat(F.col("text"), F.lit(f" c{i}")),
            "n_chars": F.col("n_chars") + (0 if i == 0 else len(f" c{i}")),
        },
    ).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    t = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    reps(t, lambda i: {"vec_id": F.col("vec_id") + i * OFF_VEC}).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "embeddings.parquet"))


# ------------------------------------------------------------ peak RSS

def _tree_pids(root: int) -> list[int]:
    pids, stack = [], [root]
    while stack:
        p = stack.pop()
        pids.append(p)
        for tdir in glob.glob(f"/proc/{p}/task/*/children"):
            try:
                with open(tdir) as f:
                    stack.extend(int(c) for c in f.read().split())
            except OSError:
                pass
    return pids


def _tree_rss_mb() -> float:
    total = 0
    for p in _tree_pids(os.getpid()):
        try:
            with open(f"/proc/{p}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1])
                        break
        except OSError:
            pass
    return total / 1024.0


class RssWatch:
    def __init__(self, interval: float = 0.5):
        self.peak = 0.0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, args=(interval,), daemon=True)

    def _run(self, interval):
        while not self._stop.is_set():
            self.peak = max(self.peak, _tree_rss_mb())
            self._stop.wait(interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=2)


# ------------------------------------------------------------ plan shape

def n_exchanges(df) -> int:
    """Exchange nodes in the compiled physical plan (pre-AQE: the
    static shape — AQE only coalesces/downgrades at runtime, it never
    ADDS an exchange to this plan)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/dev/shm/dexspark-sf1")
    ap.add_argument("--skip-cdc", action="store_true")
    ap.add_argument("--cdc-events", type=int, default=40_000_000)
    ap.add_argument("--cdc-docs", type=int, default=2_000_000)
    args = ap.parse_args()

    os.environ.setdefault("DEXSPARK_CDC_EVENTS", str(args.cdc_events))
    os.environ.setdefault("DEXSPARK_CDC_DOCS", str(args.cdc_docs))
    import bench
    from dexspark.queries import QUERIES

    with RssWatch() as rss:
        spark = bench._mk_spark(bench.DEFAULT_CPUS)
        t0 = time.monotonic()
        if not os.path.isdir(os.path.join(args.out, "documents.parquet")):
            build_scaled(spark, args.src, args.out, args.factor)
        build_sec = round(time.monotonic() - t0, 1)
        bench.warm_inputs(spark, args.out)

        # static plan shape at both SFs, before any timing
        plan_shape = {}
        for name in bench.HEADLINE:
            fn = QUERIES[name]
            plan_shape[name] = {
                "sf0.1": n_exchanges(fn(spark, args.src)),
                "sf1": n_exchanges(fn(spark, args.out)),
            }

        runs: dict[str, list[float]] = {}
        for _ in range(args.passes):
            for name, ts in bench.run_queries(spark, args.out, reps=1).items():
                runs.setdefault(name, []).extend(ts)
        queries = {n: min(ts) for n, ts in runs.items()}

        # pack + BPE at 10x their bench corpus (2M docs)
        pack = bench.measure_packing(spark, n_docs=200_000 * args.factor)
        bench._BPE_STATE.clear()
        docs, merges = bench._bpe_corpus(spark, n_docs=200_000 * args.factor)
        from dexspark.operators.bpe import bpe_encode

        enc = []
        for _ in range(2):
            t0 = time.monotonic()
            bpe_encode(docs, merges).write.format("noop").mode("overwrite").save()
            enc.append(time.monotonic() - t0)
        bpe = {
            "docs": 200_000 * args.factor,
            "encode_sec": round(min(enc), 3),
            "words_per_sec": round(200_000 * args.factor * 120 / min(enc), 1),
        }

        cdc = None
        if not args.skip_cdc:
            binlog = (
                f"{bench.SCRATCH}/dexspark-bench-input/binlog-{bench._binlog_key()}"
            )
            if not os.path.isdir(binlog):
                bench._write_bench_binlog(spark, binlog)
            cdc = bench.run_cdc(
                spark, f"{bench.SCRATCH}/dexspark-sf1-cdc", shared_binlog=binlog
            )
        host = bench.host_calibration(spark)
        spark.stop()

    new_exchanges = {
        n: s for n, s in plan_shape.items() if s["sf1"] > s["sf0.1"]
    }
    out = {
        "metric": "sf1 (10x) headline suite",
        "factor": args.factor,
        "cpus": bench.DEFAULT_CPUS,
        "build_sec": build_sec,
        "queries": queries,
        "query_runs": runs,
        "plan_exchanges": plan_shape,
        "new_exchanges_at_sf1": new_exchanges,  # must be {}
        "pack": pack,
        "bpe": bpe,
        "peak_rss_mb": round(rss.peak, 1),
        "host": host,
    }
    if cdc is not None:
        out["cdc"] = {
            "events": cdc["events"],
            "apply_sec": cdc["apply_sec"],
            "events_per_sec": cdc["events_per_sec"],
            "rows_merged": cdc["rows_merged"],
            "phase_ms": cdc["phase_ms"],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
