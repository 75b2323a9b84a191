"""Stratified sampling / token-budget mixing / decontamination.

Proves: (1) sampling membership is a pure deterministic function of
the key (recomputed independently in Python), map-only (no exchange in
the plan); (2) the scalable histogram+boundary mixing plan is
bit-identical to the one-window semantic definition across budgets,
bucket counts, and degenerate strata; (3) decontamination flags
exactly the docs sharing >= min_hits distinct n-grams with the
benchmark, via a broadcast join.
"""

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from dexspark.operators.decontaminate import (
    contamination_hits,
    decontaminate,
    ngrams,
)
from dexspark.operators.sampling import (
    hash_frac,
    mix_token_budget,
    mix_token_budget_exact,
    stratified_sample,
)


def _py_frac(key, seed=0) -> float:
    h = hashlib.md5(f"{seed}{key}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


def _docs(spark, n=400, n_src=5):
    rows = [
        Row(doc_id=i, source=f"s{i % n_src}", n_chars=(i * 37) % 90 + 10)
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


# ---------------------------------------------------------------- sampling


def test_stratified_sample_matches_python_membership(spark):
    d = _docs(spark)
    rates = {"s0": 0.0, "s1": 0.25, "s2": 0.5, "s3": 1.0}  # s4 -> default 0
    got = {
        r.doc_id for r in stratified_sample(d, rates, seed=7).select("doc_id").collect()
    }
    want = {
        i
        for i in range(400)
        if _py_frac(i, 7) < rates.get(f"s{i % 5}", 0.0)
    }
    assert got == want
    assert len(got & {i for i in range(400) if i % 5 == 0}) == 0  # rate 0
    assert {i for i in range(400) if i % 5 == 3} <= got  # rate 1


def test_stratified_sample_is_map_only_and_nested(spark):
    d = _docs(spark)
    plan = stratified_sample(d, {"s0": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # lowering the rate yields a subset (reproducible ablations)
    half = {r.doc_id for r in stratified_sample(d, {"s0": 0.5}).collect()}
    tenth = {r.doc_id for r in stratified_sample(d, {"s0": 0.1}).collect()}
    assert tenth <= half


def test_hash_frac_uniform_range(spark):
    d = _docs(spark, n=2000, n_src=1)
    stats = d.select(hash_frac(F.col("doc_id")).alias("f")).agg(
        F.min("f"), F.max("f"), F.avg("f")
    ).first()
    assert 0.0 <= stats[0] and stats[1] < 1.0
    assert 0.45 < stats[2] < 0.55


# ------------------------------------------------------------------ mixing


def _mix_key(df):
    return sorted((r.doc_id for r in df.select("doc_id").collect()))


def test_mix_scalable_equals_exact_across_shapes(spark):
    d = _docs(spark)
    cases = [
        ({"s0": 500, "s1": 2000, "s2": 1, "s3": 10**9}, 64),  # truncate/one/all
        ({"s0": 500, "s1": 2000, "s2": 1, "s3": 10**9}, 4),  # coarse buckets
        ({"s4": 777}, 1),  # single bucket == pure window path
        ({"s0": 0}, 64),  # zero budget -> empty
        ({"zz": 100}, 64),  # stratum absent from data
    ]
    for budgets, nb in cases:
        exact = _mix_key(mix_token_budget_exact(d, budgets))
        scal = _mix_key(mix_token_budget(d, budgets, n_buckets=nb))
        assert scal == exact, (budgets, nb)


def test_mix_takes_maximal_prefix_within_budget(spark):
    d = _docs(spark)
    budgets = {"s1": 1500}
    kept = mix_token_budget(d, budgets, n_buckets=32).collect()
    kept_ids = {r.doc_id for r in kept}
    assert sum(r.n_chars for r in kept) <= 1500
    # maximality: the first not-kept doc in hash order would overflow
    s1 = sorted(
        (r for r in d.filter("source = 's1'").collect()),
        key=lambda r: (_py_frac(r.doc_id), r.doc_id),
    )
    run = 0
    for r in s1:
        run += r.n_chars
        if run <= 1500:
            assert r.doc_id in kept_ids
        else:
            assert r.doc_id not in kept_ids  # filter semantics: nothing after
    assert len(kept_ids) < len(s1)


def test_mix_drops_unbudgeted_strata(spark):
    d = _docs(spark)
    out = mix_token_budget(d, {"s2": 10**9}, n_buckets=16)
    assert {r.source for r in out.select("source").distinct().collect()} == {"s2"}


# --------------------------------------------------------------- decontam


def _corpus(spark):
    rows = [
        Row(doc_id=1, text="a b c d e f g h"),  # shares 2 grams with bench
        Row(doc_id=2, text="a b c d x y z w"),  # shares 1 gram
        Row(doc_id=3, text="p q r s t u v w"),  # shares 0
        Row(doc_id=4, text="short text"),  # below n: no grams at all
    ]
    bench = [Row(doc_id=100, text="a b c d e zz"), Row(doc_id=101, text="d e f g h")]
    return spark.createDataFrame(rows), spark.createDataFrame(bench)


def _counted(spark, counts: dict):
    rows = []
    for s, n in counts.items():
        # one row per 10 tokens keeps frames tiny with exact sums
        per, rem = divmod(n, 10)
        rows += [Row(doc_id=f"{s}-{i}", source=s, n_chars=10) for i in range(per)]
        if rem:
            rows.append(Row(doc_id=f"{s}-r", source=s, n_chars=rem))
    return spark.createDataFrame(rows)


def test_temperature_budgets_hand_cases(spark):
    from dexspark.operators.sampling import temperature_budgets

    # equal strata: any alpha splits evenly
    d = _counted(spark, {"a": 100, "b": 100})
    for alpha in (0.0, 0.5, 1.0):
        assert temperature_budgets(d, 100, alpha) == {"a": 50, "b": 50}
    # alpha=1 keeps natural proportions
    d = _counted(spark, {"a": 900, "b": 100})
    assert temperature_budgets(d, 500, 1.0) == {"a": 450, "b": 50}
    # alpha=0 is uniform; water-filling caps the small stratum and
    # re-gives its unused share to the big one
    d = _counted(spark, {"a": 1000, "b": 10})
    assert temperature_budgets(d, 600, 0.0) == {"a": 590, "b": 10}
    # budget above the corpus: everyone saturates at their own mass
    d = _counted(spark, {"a": 50, "b": 20})
    assert temperature_budgets(d, 1000, 0.7) == {"a": 50, "b": 20}
    # intermediate alpha up-weights the small stratum monotonically
    d = _counted(spark, {"a": 1600, "b": 100})
    b1 = temperature_budgets(d, 400, 1.0)["b"]
    b5 = temperature_budgets(d, 400, 0.5)["b"]
    b0 = temperature_budgets(d, 400, 0.0)["b"]
    assert b1 < b5 < b0
    with pytest.raises(ValueError):
        temperature_budgets(d, -1)
    with pytest.raises(ValueError):
        temperature_budgets(d, 10, alpha=-0.1)


def test_mix_temperature_is_budgeted_prefix(spark):
    """mix_temperature == mix_token_budget_exact under the derived
    budgets (the one-window semantic definition), and every stratum's
    taken mass is within budget."""
    from dexspark.operators.sampling import (
        mix_temperature,
        temperature_budgets,
    )

    d = _docs(spark, n=300, n_src=3)
    budgets = temperature_budgets(d, 5000, alpha=0.5)
    got = mix_temperature(d, 5000, alpha=0.5, n_buckets=64)
    want = mix_token_budget_exact(d, budgets)
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )
    taken = {
        r["source"]: r["t"]
        for r in got.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()
    }
    for s, t in taken.items():
        assert t <= budgets[s]


def test_ngrams_shape(spark):
    corpus, _ = _corpus(spark)
    g = ngrams(corpus, n=4).filter("doc_id = 1").collect()
    assert [r.gram for r in g] == [
        "a b c d", "b c d e", "c d e f", "d e f g", "e f g h",
    ]
    assert ngrams(corpus, n=4).filter("doc_id = 4").count() == 0


def test_contamination_hits_counts_distinct_grams(spark):
    corpus, bench = _corpus(spark)
    hits = {r.doc_id: r.n_hits for r in contamination_hits(corpus, bench, n=4).collect()}
    # bench grams: {a b c d, b c d e, c d e zz, d e f g, e f g h}
    assert hits == {1: 4, 2: 1}  # doc 3 and 4: no row at all


def test_decontaminate_thresholds(spark):
    corpus, bench = _corpus(spark)
    strict = {r.doc_id for r in decontaminate(corpus, bench, n=4, min_hits=1).collect()}
    loose = {r.doc_id for r in decontaminate(corpus, bench, n=4, min_hits=2).collect()}
    assert strict == {3, 4}
    assert loose == {2, 3, 4}


def test_decontaminate_plan_broadcasts_benchmark(spark):
    corpus, bench = _corpus(spark)
    plan = (
        contamination_hits(corpus, bench, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_mix_handles_null_keys_and_null_tokens(spark):
    rows = [Row(doc_id=i, source="s0", n_chars=50) for i in range(20)]
    rows += [Row(doc_id=None, source="s0", n_chars=50)]  # no identity -> dropped
    rows += [Row(doc_id=100 + i, source="s0", n_chars=None) for i in range(3)]
    d = spark.createDataFrame(rows, "doc_id int, source string, n_chars int")
    budgets = {"s0": 300}
    exact = _mix_key(mix_token_budget_exact(d, budgets))
    scal = _mix_key(mix_token_budget(d, budgets, n_buckets=8))
    assert scal == exact
    assert None not in scal
    # independent Python recomputation: NULL key dropped, NULL tokens
    # count 0, running-sum filter over (frac, key) order
    ordered = sorted(
        ((r.doc_id, r.n_chars or 0) for r in d.collect() if r.doc_id is not None),
        key=lambda kv: (_py_frac(kv[0]), kv[0]),
    )
    run, want = 0, []
    for k, t in ordered:
        run += t
        if run <= 300:
            want.append(k)
    assert sorted(want) == scal


def test_mix_handles_negative_tokens(spark):
    """Dirty input: NEGATIVE token counts cost 0 in both paths. Without
    the clamp, a negative count lets the exact path's running sum dip
    back under the budget after exceeding it, re-admitting later rows —
    which the scalable path's wholesale bucket rejection can never
    reproduce (prefix-sum monotonicity is what makes it equivalent)."""
    rows = [Row(doc_id=i, source="s0", n_chars=c) for i, c in
            enumerate([8, 5, -6, 2, 7, -100, 3])]
    d = spark.createDataFrame(rows, "doc_id int, source string, n_chars int")
    budgets = {"s0": 10}
    exact = _mix_key(mix_token_budget_exact(d, budgets))
    for nb in (1, 2, 8):
        scal = _mix_key(mix_token_budget(d, budgets, n_buckets=nb))
        assert scal == exact, nb
    # independent recomputation with the clamp contract
    ordered = sorted(
        ((r.doc_id, max(r.n_chars, 0)) for r in d.collect()),
        key=lambda kv: (_py_frac(kv[0]), kv[0]),
    )
    run, want = 0, []
    for k, t in ordered:
        run += t
        if run <= 10:
            want.append(k)
    assert sorted(want) == exact


def test_mix_histogram_ignores_unbudgeted_strata(spark):
    d = _docs(spark)
    plan = (
        mix_token_budget(d, {"s1": 10**9}, n_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the budgeted-strata filter reaches both scans
    assert plan.count("s1") >= 1
    out = mix_token_budget(d, {"s1": 10**9}, n_buckets=8)
    assert {r.source for r in out.select("source").distinct().collect()} == {"s1"}


# ------------------------------------------------------- split labels


def test_assign_split_partitions_exactly(spark):
    from dexspark.operators.sampling import assign_split

    df = spark.range(0, 5000).select(
        F.format_string("doc%05d", F.col("id")).alias("doc_id")
    )
    out = assign_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] + counts["val"] + counts["test"] == 5000
    # bands proportional within sampling noise
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02


def test_assign_split_stable_under_growth_and_contiguous_migration(spark):
    from dexspark.operators.sampling import assign_split

    small = spark.range(0, 1000).select(
        F.format_string("doc%05d", F.col("id")).alias("doc_id")
    )
    big = spark.range(0, 3000).select(
        F.format_string("doc%05d", F.col("id")).alias("doc_id")
    )
    w = {"train": 0.9, "val": 0.1}
    lab_small = {r["doc_id"]: r["split"]
                 for r in assign_split(small, w, seed=1).collect()}
    lab_big = {r["doc_id"]: r["split"]
               for r in assign_split(big, w, seed=1).collect()}
    # adding docs never moves an existing one
    assert all(lab_big[d] == s for d, s in lab_small.items())

    # growing val only migrates train rows into val, never the reverse
    lab2 = {r["doc_id"]: r["split"]
            for r in assign_split(big, {"train": 0.7, "val": 0.3},
                                  seed=1).collect()}
    for d, s in lab_big.items():
        if s == "val":
            assert lab2[d] == "val"


def test_assign_split_validation(spark):
    from dexspark.operators.sampling import assign_split

    df = spark.range(1).select(F.lit("a").alias("doc_id"))
    with pytest.raises(ValueError):
        assign_split(df, {})
    with pytest.raises(ValueError):
        assign_split(df, {"a": -1.0, "b": 2.0})
    with pytest.raises(ValueError):
        assign_split(df, {"a": 0.0})
