"""Deterministic stratified sampling and token-budget data mixing.

Training-data pipelines down-sample and re-weight sources before a
run ("data mixing"): keep 10% of crawl, 100% of reference text, and
cap each source at a token budget. Two requirements drive the design
at 100 TB:

* **Determinism** — a re-run (or a second cluster) must pick exactly
  the same rows, so membership is a pure function of the row key, not
  of ``rand()`` / partition iteration order. We hash the key with a
  seeded md5 into a uniform fraction in [0, 1) and compare against the
  stratum's rate. Membership is reproducible in any engine (the
  DuckDB oracle computes the same md5 fraction), survives
  repartitioning, and adding rows never flips existing decisions.
* **No shuffle in the common path** — rate-based sampling is a pure
  ``filter`` (map-only, pushed to the scan); the token-budget take is
  two passes: a tiny histogram aggregate, then a map-only filter for
  every row except the ~1/``n_buckets`` sliver at the budget boundary,
  which alone pays a window. A naive single window partitioned by
  source would shuffle the ENTIRE corpus into one partition per
  source — a skew catastrophe with few sources.

Reference parity: the reference pipeline has no sampler (its corpus
is per-blob); this operator family is part of the "LLM training-data
pipeline" surface the engine adds on top (SURVEY.md §2 addendum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# 2^32 — md5's leading 8 hex chars parsed as an integer fall in
# [0, 2^32), so frac = h / 2^32 is uniform in [0, 1).
_HASH_SPACE = float(1 << 32)


def hash_frac(key: Column, seed: int = 0) -> Column:
    """Uniform deterministic fraction in [0, 1) from a row key.

    ``conv(substr(md5(seed || key), 1, 8), 16, 10) / 2^32`` — the
    DuckDB twin is ``('0x' || substr(md5(seed || key), 1, 8))::BIGINT
    / 4294967296.0`` (same digest, same hex slice, same divisor).
    """
    digest = F.md5(F.concat(F.lit(str(seed)), key.cast("string")).cast("binary"))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("double") / F.lit(
        _HASH_SPACE
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata: str = "source",
    key: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum ``s`` iff hash_frac(key) < rates[s].

    Map-only: the rate lookup is an inlined CASE expression (strata
    sets are small — sources, languages), so the filter reaches the
    scan and no shuffle ever happens. Sampling different rates later
    yields a SUPERSET/SUBSET of this sample (threshold comparison on
    the same hash), which is what reproducible ablations want.
    """
    frac = hash_frac(F.col(key), seed)
    rate = F.lit(float(default_rate))
    for name, r in sorted(rates.items()):
        rate = F.when(F.col(strata) == name, float(r)).otherwise(rate)
    return df.filter(frac < rate)


def _with_frac(df: DataFrame, key: str, seed: int) -> DataFrame:
    """Attach the hash fraction; rows with a NULL key are DROPPED.

    Membership is defined as a pure function of the key, so a NULL
    key has no deterministic identity to sample on — the same rule
    stratified_sample applies implicitly (NULL frac fails the rate
    comparison). Both mixing paths share this, keeping them
    bit-identical on dirty input.
    """
    return df.filter(F.col(key).isNotNull()).withColumn(
        "_frac", hash_frac(F.col(key), seed)
    )


def _toks_col(tokens: str) -> Column:
    """Per-row token cost: NULL and NEGATIVE counts clamp to 0.

    Shared by both mixing paths. The clamp is what keeps the running
    sum monotone — the scalable path's wholesale accept/reject of
    whole buckets is only equivalent to the exact path's inclusive
    running-sum filter when per-row costs can't make a later prefix
    sum dip back under the budget. A negative token count is dirty
    input (an upstream counter bug); costing it 0 keeps the row
    eligible without corrupting the budget arithmetic.
    """
    return F.greatest(F.coalesce(F.col(tokens).cast("long"), F.lit(0)), F.lit(0))


def mix_token_budget_exact(
    df: DataFrame,
    budgets: dict[str, int],
    strata: str = "source",
    key: str = "doc_id",
    tokens: str = "n_chars",
    seed: int = 0,
) -> DataFrame:
    """Reference implementation: ONE window per source (the semantic
    definition the scalable path must reproduce bit-for-bit).

    Rows of each stratum are ordered by (hash_frac, key) — a
    deterministic shuffle — and taken while the running token sum
    (inclusive) stays <= the stratum's budget. Strata without a budget
    entry are dropped; NULL keys are dropped (no deterministic
    identity); NULL or negative token counts cost 0. ``key`` must be unique
    per stratum (same precondition as merge): duplicate keys tie the
    sort and make the boundary row arbitrary. O(corpus) shuffle into
    #strata partitions: correct, but a skew hazard at scale — use
    :func:`mix_token_budget` there.
    """
    w = (
        Window.partitionBy(strata)
        .orderBy("_frac", key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.lit(None).cast("long")
    for name, b in sorted(budgets.items()):
        budget = F.when(F.col(strata) == name, int(b)).otherwise(budget)
    toks = _toks_col(tokens)
    return (
        _with_frac(df, key, seed)
        .withColumn("_run", F.sum(toks).over(w))
        .filter(F.col("_run") <= budget)
        .drop("_frac", "_run")
    )


def mix_token_budget(
    df: DataFrame,
    budgets: dict[str, int],
    strata: str = "source",
    key: str = "doc_id",
    tokens: str = "n_chars",
    seed: int = 0,
    n_buckets: int = 4096,
) -> DataFrame:
    """Scalable exact token-budget mixing: histogram + boundary window.

    Identical output to :func:`mix_token_budget_exact` (the prefix
    ordered by (hash_frac, key) is the same; only the evaluation
    strategy differs):

    1. Bucket each row by ``floor(hash_frac * n_buckets)`` (map-only).
    2. Aggregate per-(stratum, bucket) token sums over BUDGETED strata
       only — map-side partial aggregation, result is <= #budgets *
       n_buckets rows, collected to the driver (bounded by the budget
       dict, not by the data's strata cardinality).
    3. Per stratum, walk the cumulative histogram: buckets strictly
       below the boundary are accepted wholesale (map-only filter —
       no shuffle, no sort); buckets above are rejected wholesale.
    4. ONLY the boundary bucket (~1/n_buckets of the stratum) runs the
       ordered running-sum window, seeded with the accepted prefix's
       token total.

    At 10^10 rows and n_buckets=4096, the window input is ~2.4M rows
    per stratum instead of 10^10 — the skewed per-source window from
    the naive plan disappears.

    Same input contract as the exact path: NULL keys dropped, NULL or
    negative token counts cost 0, ``key`` unique per stratum.
    """
    # Budgeted strata only, from the start: unbudgeted strata are
    # dropped anyway, and filtering first (a) bounds the histogram
    # collect by len(budgets) * n_buckets regardless of the data's
    # strata cardinality and (b) shrinks every downstream scan.
    frac = _with_frac(
        df.filter(F.col(strata).isin(list(budgets))), key, seed
    )
    bucket = F.floor(F.col("_frac") * n_buckets).cast("int")
    frac = frac.withColumn("_bkt", bucket)
    toks = _toks_col(tokens)

    hist = frac.groupBy(strata, "_bkt").agg(F.sum(toks).alias("_toks")).collect()
    per: dict[str, dict[int, int]] = {}
    for row in hist:
        per.setdefault(row[strata], {})[row["_bkt"]] = row["_toks"]

    # Per stratum: boundary bucket index + tokens already spent below it.
    take_below: dict[str, int] = {}  # accept _bkt < this wholesale
    spent_below: dict[str, int] = {}
    for name, b in budgets.items():
        cum = 0
        boundary = n_buckets  # whole stratum fits in budget
        for bkt in sorted(per.get(name, {})):
            t = per[name][bkt]
            if cum + t > int(b):
                boundary = bkt
                break
            cum += t
        take_below[name] = boundary
        spent_below[name] = cum

    def _case(mapping: dict[str, int], default: int) -> Column:
        c = F.lit(default).cast("long")
        for name, v in sorted(mapping.items()):
            c = F.when(F.col(strata) == name, int(v)).otherwise(c)
        return c

    boundary_col = _case(take_below, -1)  # no budget entry -> drop all
    wholesale = frac.filter(F.col("_bkt") < boundary_col).drop("_frac", "_bkt")

    # Boundary sliver: running sum seeded with the wholesale prefix.
    budget_col = _case({k: int(v) for k, v in budgets.items()}, -1)
    spent_col = _case(spent_below, 0)
    w = (
        Window.partitionBy(strata)
        .orderBy("_frac", key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    edge = (
        frac.filter(F.col("_bkt") == boundary_col)
        .withColumn("_run", spent_col + F.sum(toks).over(w))
        .filter(F.col("_run") <= budget_col)
        .drop("_frac", "_bkt", "_run")
    )
    return wholesale.unionByName(edge)


def temperature_budgets(
    df: DataFrame,
    total_tokens: int,
    alpha: float = 0.7,
    strata: str = "source",
    tokens: str = "n_chars",
) -> dict[str, int]:
    """Per-stratum token budgets from temperature-scaled sampling —
    the standard multilingual/DoReMi-style re-weighting: stratum i
    gets a share proportional to ``n_i ** alpha`` of its observed
    token mass. ``alpha=1`` keeps natural proportions, ``alpha=0``
    splits the budget uniformly, the usual 0.2-0.7 band up-weights
    small strata without letting the largest one dominate.

    A stratum can never be asked for more than it has: saturated
    strata (share >= n_i) are capped at n_i and the loop re-splits the
    remaining budget over the rest by the same rule (water-filling;
    terminates in <= #strata rounds, deterministic — strata are
    processed in sorted order and shares truncate to ints).

    ONE map-side-partial aggregate over the corpus (#strata result
    rows); the returned dict feeds :func:`mix_token_budget`, so the
    whole temperature mix stays histogram + boundary-sliver shaped.
    NULL strata rows are ignored (they cannot be budgeted); NULL or
    negative token counts cost 0, matching the mixers.
    """
    if total_tokens < 0:
        raise ValueError("total_tokens must be >= 0")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    toks = _toks_col(tokens)
    counts = {
        r[strata]: int(r["_n"])
        for r in df.filter(F.col(strata).isNotNull())
        .groupBy(strata)
        .agg(F.sum(toks).alias("_n"))
        .collect()
    }
    budgets: dict[str, int] = {}
    remaining = int(total_tokens)
    active = {s for s, n in counts.items() if n > 0}
    for s in set(counts) - active:
        budgets[s] = 0
    while active and remaining > 0:
        weights = {s: counts[s] ** alpha for s in active}
        tot_w = sum(weights.values())
        saturated = False
        for s in sorted(active):
            share = int(remaining * weights[s] / tot_w)
            if share >= counts[s]:
                budgets[s] = counts[s]
                remaining -= counts[s]
                active.remove(s)
                saturated = True
                break
        if not saturated:
            # nobody saturates: final split of the remainder
            for s in sorted(active):
                budgets[s] = int(remaining * weights[s] / tot_w)
            active.clear()
    for s in active:
        budgets[s] = 0
    return budgets


def mix_temperature(
    df: DataFrame,
    total_tokens: int,
    alpha: float = 0.7,
    strata: str = "source",
    key: str = "doc_id",
    tokens: str = "n_chars",
    seed: int = 0,
    n_buckets: int = 4096,
) -> DataFrame:
    """Temperature-scaled data mixing in one call: derive per-stratum
    budgets (:func:`temperature_budgets`) and take each stratum's
    deterministic prefix under them (:func:`mix_token_budget`)."""
    budgets = temperature_budgets(df, total_tokens, alpha, strata, tokens)
    return mix_token_budget(
        df, budgets, strata=strata, key=key, tokens=tokens,
        seed=seed, n_buckets=n_buckets,
    )


def assign_split(
    df: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test labels: the [0, 1) hash
    line is cut into contiguous bands proportional to ``weights``
    (normalized) in sorted-name order, and each row's
    :func:`hash_frac` picks its band. Map-only, no shuffle.

    Properties the training workflow relies on: membership is a pure
    function of (key, seed) — adding documents never moves an
    existing one between splits; and since bands are contiguous,
    growing one split's weight only MIGRATES rows across the adjacent
    boundary (e.g. 0.9/0.1 -> 0.8/0.2 moves exactly the 0.8-0.9 band
    from train to the next split) — no global relabeling. Exactly one
    label per row (the last band's upper bound is forced to 1.0, so
    float rounding cannot leave a sliver unlabeled)."""
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    frac = hash_frac(F.col(key), seed)
    names = sorted(weights)
    cum = 0.0
    expr = F.lit(names[-1])  # last band catches frac up to 1.0
    branches = []
    for name in names[:-1]:
        cum += weights[name] / total
        branches.append((cum, name))
    for hi, name in reversed(branches):
        expr = F.when(frac < F.lit(hi), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)
