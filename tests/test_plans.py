"""Physical-plan hygiene — the scale guarantees, asserted.

- no row-at-a-time Python (BatchEvalPython) anywhere in the engine's
  plans; only Arrow-vectorized exchange (MapInPandas / ArrowEvalPython)
  — BASELINE.json input_hint "no per-row Python";
- filter pushdown + column pruning reach the parquet scans;
- the dedup aggregate keeps map-side partial aggregation.
"""

from pyspark.sql import functions as F, types as T

from dexspark import gen
from dexspark.config import sequences_ruleset
from dexspark.dedup import latest_per_key
from dexspark.validate import arrow_validate


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_arrow_validate_no_per_row_python(spark):
    df = gen.base_sequences(spark, n_docs=10, max_len=8)
    plan = _plan(arrow_validate(df, sequences_ruleset()))
    assert "BatchEvalPython" not in plan
    assert "MapInArrow" in plan


def test_generator_is_jvm_only(spark):
    plan = _plan(gen.base_sequences(spark, n_docs=10))
    assert "Python" not in plan  # pure codegen: no Python boundary at all
    plan = _plan(gen.change_events(spark, n_events=10, n_docs=10))
    assert "Python" not in plan


def test_parquet_filter_pushdown_and_pruning(spark, tmp_path):
    p = str(tmp_path / "t")
    gen.base_sequences(spark, n_docs=100, max_len=8).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("source") == "web").select("doc_id")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(source), EqualTo(source,web)]" in plan
    # column pruning: only the 2 referenced columns in ReadSchema
    assert "ReadSchema: struct<doc_id:string,source:string>" in plan


def test_dedup_partial_aggregation(spark):
    df = spark.createDataFrame(
        [("a", 1, 1, "x")], "doc_id string, commit_ts int, lsn long, v string"
    )
    plan = _plan(latest_per_key(df))
    # partial aggregate (map-side combine) must sit below the exchange
    assert "partial_max_by" in plan
    assert plan.index("Exchange") < plan.index("partial_max_by")


def test_jvm_validator_has_no_python_nodes(spark):
    """The default validator is pure JVM expressions — no Python
    boundary of any kind in the plan (higher-order functions like
    exists()/filter() stay JVM-side even though they opt out of
    whole-stage codegen)."""
    from dexspark.validate import with_fail_reasons

    df = gen.base_sequences(spark, n_docs=10, max_len=8)
    plan = _plan(with_fail_reasons(df, sequences_ruleset()))
    assert "Python" not in plan
    assert "required:doc_id" in plan  # rules compiled into the projection
