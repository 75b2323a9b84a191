"""Cross-batch stale-event suppression — the custom stateful
streaming operator (SURVEY §2.9, ``applyInPandasWithState``).

The engine's exactly-once design deliberately keeps hard state in the
table itself (epoch watermark + per-key LWW MERGE, SURVEY §2.9
"Stateful op" row): replaying an already-applied event is *correct*,
it just costs a wasted merge of a stale row. This operator is the
optional optimization in FRONT of that: a keyed state store holding
the max ``(commit_ts, lsn)`` ever forwarded per ``doc_id``, dropping
redelivered / out-of-order-stale events BEFORE they reach validate +
dedup + MERGE. On a tail where the broker redelivers aggressively
(at-least-once Event Hub / Kafka semantics — the reference's trigger
redelivers whole messages, FnDecompressorEntry.kt:41-51), this keeps
the merge volume proportional to NEW work, not delivered work.

Scale shape: state is one struct per distinct key, partitioned by the
stream's keyed state store (RocksDB-backed on a real cluster,
checkpoint-persisted — survives restarts and availableNow re-runs);
the per-batch work is one shuffle on ``doc_id`` (the same key the
downstream dedup shuffles on) and a vectorized pandas max/compare per
group — no per-row Python. An idle-key TTL bounds the store for
unbounded key spaces: state for keys quiet longer than ``ttl`` is
evicted. The TTL is a REAL trade, not a free one: a stale retry for
an evicted key is forwarded, and because the table MERGE is a blind
per-batch upsert (it stores no per-row LWW position to compare
against), that forwarded stale row REGRESSES the key until a fresher
event arrives. Set ``ttl_ms`` only when the producer's maximum retry
lag is known to be shorter than the TTL; the default (None = keep
state forever) is the correctness-preserving choice.

Batch semantics note: WITHIN one micro-batch all rows of a group are
forwarded (minus those at-or-below the stored state) — intra-batch
LWW stays the downstream dedup aggregate's job (it does this with
map-side partial aggregation, which a stateful op cannot); this
operator's contract is strictly cross-batch monotonicity per key.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def suppress_stale(
    events: DataFrame,
    key: str = "doc_id",
    order_cols: Tuple[str, str] = ("commit_ts", "lsn"),
    ttl_ms: int | None = None,
    advance_col: str | None = None,
) -> DataFrame:
    """Drop events at-or-below each key's high-water ``order_cols``
    mark from previous micro-batches.

    ``events`` must be a streaming DataFrame; the result streams the
    same schema. ``order_cols`` is the (major, minor) LWW ordering the
    rest of the engine uses — ``(commit_ts, lsn)``; integer or
    timestamp columns (timestamps are stored in state as epoch
    nanoseconds). ``ttl_ms`` evicts state for keys idle longer than
    that processing-time interval (None = keep forever).

    ``advance_col`` (boolean) marks rows that will actually be
    APPLIED downstream (class apply and rule-passing). Rows where it
    is false bypass the state store entirely — they neither advance
    the high-water mark nor get suppressed. Without this gate a
    rule-failing event would advance the mark while itself landing in
    quarantine, and a later-arriving EARLIER valid event — which the
    batch pipeline would apply (quarantine rows carry unique dedup
    keys, so winners are chosen among valid events only) — would be
    silently dropped.
    """
    from pyspark.sql import functions as F

    major, minor = order_cols
    # Rows with a null key or null order columns carry no LWW position
    # (envelope anomalies headed for quarantine): they BYPASS the state
    # store untouched — suppressing them would hide them from the error
    # channel. Streaming self-union of two filters over one source.
    complete = (
        F.col(key).isNotNull()
        & F.col(major).isNotNull()
        & F.col(minor).isNotNull()
    )
    if advance_col is not None:
        complete = complete & F.coalesce(F.col(advance_col), F.lit(False))
    bypass = events.filter(~complete)
    events = events.filter(complete)
    out_schema = events.schema
    state_schema = T.StructType(
        [
            T.StructField("major", T.LongType()),
            T.StructField("minor", T.LongType()),
        ]
    )
    cols = [f.name for f in out_schema.fields]

    def _as_i64(series: pd.Series) -> pd.Series:
        # datetime64 -> epoch ns; integral dtypes pass through
        if series.dtype.kind == "M":
            return series.astype("int64")
        return series.astype("int64", copy=False)

    def fn(
        _key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle-key eviction: drop the watermark struct; the next
            # event for this key is forwarded unconditionally (the
            # table merge re-suppresses true staleness)
            state.remove()
            return
        if state.exists:
            s_major, s_minor = state.get
        else:
            s_major, s_minor = None, None
        best = (s_major, s_minor) if s_major is not None else None
        for pdf in pdfs:
            maj, mnr = _as_i64(pdf[major]), _as_i64(pdf[minor])
            if s_major is not None:
                fresh = (maj > s_major) | ((maj == s_major) & (mnr > s_minor))
                pdf, maj, mnr = pdf[fresh], maj[fresh], mnr[fresh]
            if len(pdf):
                i = maj.idxmax()
                ties = mnr[maj == maj[i]]
                cand = (int(maj[i]), int(ties.max()))
                if best is None or cand > best:
                    best = cand
                yield pdf[cols]
        if best is not None:
            state.update(best)
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    suppressed = events.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )
    return suppressed.unionByName(bypass)
