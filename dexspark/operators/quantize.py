"""Int8 embedding quantization — the storage/bandwidth lever for
ANN at 100 TB.

A float32 embedding column is 4 bytes/dim; symmetric per-vector int8
quantization stores 1 byte/dim plus one float scale, cutting the
candidate-scan I/O (the dominant ANN cost at scale) ~4x. The standard
two-stage search follows: score candidates on the int8 vectors, then
rescore the top candidates exactly on the float vectors
(`tests/test_quantize.py` measures the recall of exactly that loop).

Everything is JVM higher-order functions (`transform` / `aggregate` /
`zip_with`) — no UDF, no Arrow round-trip, whole-stage codegen keeps
the quantize/dequant/score expressions inside the scan pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _max_abs(col: Column) -> Column:
    return F.array_max(F.transform(col, lambda x: F.abs(x.cast("double"))))


def quantize(df: DataFrame, col: str = "embedding", prefix: str = "q") -> DataFrame:
    """Add ``<prefix>_vec: array<tinyint>`` and ``<prefix>_scale:
    float`` — symmetric per-vector int8: scale = max|x| / 127,
    q_i = round(x_i / scale). All-zero vectors get scale 0 and zero
    codes (dequantizes exactly)."""
    scale = (_max_abs(F.col(col)) / F.lit(127.0)).alias(f"{prefix}_scale")
    df = df.withColumn(f"{prefix}_scale", scale)
    q = F.when(
        F.col(f"{prefix}_scale") == 0.0,
        F.transform(F.col(col), lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            F.col(col),
            lambda x: F.round(x.cast("double") / F.col(f"{prefix}_scale")).cast(
                "tinyint"
            ),
        )
    )
    return df.withColumn(f"{prefix}_vec", q).withColumn(
        f"{prefix}_scale", F.col(f"{prefix}_scale").cast("float")
    )


def dequantize(df: DataFrame, prefix: str = "q", out: str = "deq") -> DataFrame:
    """``<prefix>_vec/<prefix>_scale -> <out>: array<float>``."""
    return df.withColumn(
        out,
        F.transform(
            F.col(f"{prefix}_vec"),
            lambda q: (q.cast("double") * F.col(f"{prefix}_scale")).cast("float"),
        ),
    )


def quantized_dot(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """dot(a, b) approximated from int8 codes: the integer dot product
    (exact in int64 — 128*128*dim fits easily) times both scales."""
    int_dot = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )
    return int_dot.cast("double") * sa.cast("double") * sb.cast("double")


def quantized_cosine(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """cosine(a, b) from int8 codes. The scales cancel in the
    normalization, so this is the integer-code cosine — scale error
    only enters through rounding."""
    return (
        quantized_dot(qa, sa, qb, sb)
        / F.sqrt(quantized_dot(qa, sa, qa, sa))
        / F.sqrt(quantized_dot(qb, sb, qb, sb))
    )
