"""Int8 embedding quantization (operators/quantize.py): round-trip
error bound, cosine fidelity, the quantize->score->rescore ANN loop's
recall vs exact brute force, and plan hygiene (pure JVM)."""

import math
import os

import pytest
from pyspark.sql import Window, functions as F

from dexspark.operators.quantize import (
    dequantize,
    quantize,
    quantized_cosine,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def test_round_trip_error_bounded(spark, emb):
    """|x - dequant(quant(x))| <= scale/2 per element (symmetric
    rounding), including the all-zero vector edge case."""
    zero = spark.createDataFrame(
        [(999_999, [0.0] * 8)], "vec_id long, embedding array<float>"
    )
    df = dequantize(quantize(emb.select("vec_id", "embedding").unionByName(zero)))
    err = df.select(
        F.array_max(
            F.zip_with(
                "embedding", "deq", lambda a, b: F.abs(a.cast("double") - b)
            )
        ).alias("max_err"),
        (F.col("q_scale") / 2 + 1e-9).alias("bound"),
    )
    assert err.filter(F.col("max_err") > F.col("bound")).count() == 0


def test_quantized_cosine_close_to_exact(spark, emb):
    q = quantize(emb.limit(50))
    a, b = q.alias("a"), q.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        quantized_cosine(
            F.col("a.q_vec"), F.col("a.q_scale"),
            F.col("b.q_vec"), F.col("b.q_scale"),
        ).alias("qcos"),
        (
            F.aggregate(
                F.zip_with(
                    "a.embedding", "b.embedding",
                    lambda x, y: x.cast("double") * y.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, z: acc + z,
            )
            / F.sqrt(F.aggregate(F.transform("a.embedding", lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, z: acc + z))
            / F.sqrt(F.aggregate(F.transform("b.embedding", lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, z: acc + z))
        ).alias("cos"),
    )
    worst = pairs.agg(F.max(F.abs(F.col("qcos") - F.col("cos")))).collect()[0][0]
    assert worst < 0.02, worst  # int8 cosine within 2e-2 of exact


def test_quantized_candidate_rescore_recall(spark, emb):
    """The two-stage loop: top-3k candidates by int8 cosine, exact
    rescore, take top-k — recall@10 vs exact brute force >= 0.9."""
    k = 10
    q = quantize(emb).localCheckpoint(eager=True)
    queries = q.filter(F.col("vec_id") < 5)

    def topk(scored, col, n):
        w = Window.partitionBy("query_id").orderBy(
            F.col(col).desc(), F.col("neighbor_id")
        )
        return scored.withColumn("rk", F.row_number().over(w)).filter(
            F.col("rk") <= n
        )

    joined = (
        F.broadcast(queries.alias("a"))
        .join(q.alias("b"), F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            quantized_cosine(
                F.col("a.q_vec"), F.col("a.q_scale"),
                F.col("b.q_vec"), F.col("b.q_scale"),
            ).alias("qcos"),
            F.aggregate(
                F.zip_with(
                    "a.embedding", "b.embedding",
                    lambda x, y: x.cast("double") * y.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, z: acc + z,
            ).alias("dot"),  # embeddings are same-norm-ish; dot ranks ok
        )
    ).localCheckpoint(eager=True)
    exact_top = {
        (r["query_id"], r["neighbor_id"]) for r in topk(joined, "dot", k).collect()
    }
    cand = topk(joined, "qcos", 3 * k).drop("rk")
    rescored = {
        (r["query_id"], r["neighbor_id"]) for r in topk(cand, "dot", k).collect()
    }
    recall = len(exact_top & rescored) / len(exact_top)
    assert recall >= 0.9, recall


def test_quantize_plan_is_jvm_only(spark, emb):
    plan = (
        dequantize(quantize(emb))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
