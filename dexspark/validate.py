"""Validation kernel: RuleSet -> vectorized per-batch checks.

Two execution paths, semantically identical (tested against each other
and against the pandas oracle):

1. ``fail_reasons_column`` — pure Column expressions (whole-stage
   codegen, JVM-side; the fast path for every scalar rule).
2. ``arrow_token_checks`` — pyarrow-vectorized array checks run via
   ``mapInPandas`` (list_value_length / flatten + reduceat on the Arrow
   buffers; zero per-row Python), per BASELINE.json input_hint
   ("vectorized pandas/Arrow UDFs (no per-row Python)").

All rules evaluate (no short-circuit) and accumulate into a
``fail_reasons array<string>`` column — the reference collects every
failure with its row tag the same way
(custom-poc ExternalFunctions.java:9-16 "Row N failed <check>";
SURVEY.md V17). Rows with a non-empty fail_reasons go to quarantine,
mirroring DecompressFailEventMessage{parent, errorPath, failReason}
(dtos/DecompressEventMessages.kt:10-14).
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import reduce

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

from .config import RuleSet

FAIL_COL = "fail_reasons"


# --------------------------------------------------------------- messages
# Message templates follow the reference's portal error-message style
# (one template per rule, XLSX sheet V2020-04-18).

def _msg(rule: str, col: str, detail: str) -> str:
    return f"{rule}:{col}:{detail}"


# ----------------------------------------------------- column-expr compiler

def _is_blank(c: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.StringType):
        return c.isNull() | (F.trim(c) == F.lit(""))
    return c.isNull()


def fail_reasons_column(rules: RuleSet, schema: T.StructType) -> Column:
    """Compile the rule-set to ONE array<string> Column of violations.

    Rules referencing columns absent from ``schema`` are skipped —
    header reconciliation happens separately (schema.reconcile)."""
    dtypes = {f.name: f.dataType for f in schema.fields}
    checks: list[tuple[Column, str]] = []  # (violated?, message)

    for col in rules.required:  # V11
        if col in dtypes:
            checks.append(
                (_is_blank(F.col(col), dtypes[col]), _msg("required", col, "must not be empty"))
            )

    for group in rules.conditional_groups:  # V12: fail iff numSet == 0
        present = [g for g in group if g in dtypes]
        if present:
            all_blank = reduce(
                lambda a, b: a & b, [_is_blank(F.col(g), dtypes[g]) for g in present]
            )
            checks.append(
                (all_blank, _msg("conditional", "|".join(group), "at least one must be set"))
            )

    for col, values in rules.allowed_values:  # V13
        if col in dtypes:
            checks.append(
                (
                    F.col(col).isNotNull() & ~F.col(col).isin(*values),
                    _msg("allowed_values", col, f"must be one of {sorted(values)}"),
                )
            )

    for col, pattern in rules.regex_rules:  # V14
        if col in dtypes:
            checks.append(
                (
                    F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
                    _msg("regex", col, f"must match {pattern}"),
                )
            )

    for col, n in rules.max_length:  # V10 (string form)
        if col in dtypes:
            checks.append(
                (
                    F.col(col).isNotNull() & (F.length(F.col(col)) > n),
                    _msg("max_length", col, f"exceeds {n} chars"),
                )
            )

    for col, lo, hi in rules.token_range:  # V10 (token form)
        if col in dtypes:
            bad = F.exists(
                F.col(col), lambda t: t.isNull() | (t < F.lit(lo)) | (t >= F.lit(hi))
            )
            checks.append(
                (
                    F.col(col).isNotNull() & bad,
                    _msg("token_range", col, f"token outside [{lo},{hi})"),
                )
            )

    for len_col, arr_col in rules.length_equals:  # V8
        if len_col in dtypes and arr_col in dtypes:
            ok = (
                F.col(arr_col).isNotNull()
                & F.col(len_col).isNotNull()
                & (F.size(F.col(arr_col)) == F.col(len_col))
            )
            checks.append((~ok, _msg("length_equals", len_col, f"!= size({arr_col})")))

    for col in rules.int_fields:  # V15
        if col in dtypes and isinstance(dtypes[col], T.StringType):
            checks.append(
                (
                    F.col(col).isNotNull() & F.col(col).cast("long").isNull(),
                    _msg("int_field", col, "not an integer"),
                )
            )

    for col, literal in rules.version_literal:  # V3
        if col in dtypes:
            checks.append(
                (
                    F.col(col) != F.lit(literal),
                    _msg("version", col, f"must equal {literal}"),
                )
            )

    if not checks:
        return F.array().cast("array<string>")
    return F.array_compact(
        F.array(*[F.when(violated, F.lit(message)) for violated, message in checks])
    )


def with_fail_reasons(df: DataFrame, rules: RuleSet) -> DataFrame:
    return df.withColumn(FAIL_COL, fail_reasons_column(rules, df.schema))


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without fail col, quarantined rows with reasons)."""
    ok = df.filter(F.size(FAIL_COL) == 0).drop(FAIL_COL)
    bad = df.filter(F.size(FAIL_COL) > 0)
    return ok, bad


# ------------------------------------------------ Arrow-vectorized path
# The array-heavy checks (V8 length, V10 token range) as true vectorized
# pyarrow compute over mapInPandas — the engine's hot path for wide
# token arrays, where JVM higher-order functions re-walk the list per
# lambda while Arrow works on the flat values buffer directly.


def _token_masks(tokens: pd.Series, n_tok: pd.Series, lo: int, hi: int):
    """Return (len_mismatch, out_of_range) boolean numpy masks."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(tokens)
    n = len(tokens)
    if pa.types.is_null(arr.type):  # every tokens value is null
        null_mask = np.ones(n, dtype=bool)
        return null_mask, np.zeros(n, dtype=bool)
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    null_mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
    lengths = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    ntk = pd.to_numeric(n_tok, errors="coerce").to_numpy(dtype="float64")
    len_mismatch = null_mask | pd.isna(ntk) | (lengths != ntk)

    flat = pc.list_flatten(arr)  # values of non-null lists, concatenated
    bad_vals = pc.or_kleene(
        pc.is_null(flat),
        pc.or_(pc.less(flat, lo), pc.greater_equal(flat, hi)),
    )
    bad_np = pc.fill_null(bad_vals, True).to_numpy(zero_copy_only=False).astype(np.int64)
    # Per-row any(): segment-reduce the flat mask by list offsets.
    # Offsets of the ListArray delimit each row's slice in `flat`.
    offsets = np.asarray(arr.offsets)[:-1] - arr.offsets[0].as_py()
    counts = lengths.copy()
    counts[null_mask] = 0
    if len(bad_np) == 0:
        out_of_range = np.zeros(n, dtype=bool)
    else:
        cum = np.concatenate([[0], np.cumsum(bad_np)])
        starts = offsets.astype(np.int64)
        ends = starts + counts.astype(np.int64)
        out_of_range = (cum[ends] - cum[starts]) > 0
    out_of_range &= ~null_mask
    return len_mismatch, out_of_range


def arrow_validate(df: DataFrame, rules: RuleSet) -> DataFrame:
    """Append fail_reasons using the Arrow-vectorized path for array
    checks and Column expressions for scalar rules.

    Shows up in the plan as MapInPandas (ArrowEvalPython family), never
    BatchEvalPython — enforced by tests/test_plans.py."""
    scalar_rules = RuleSet(
        required=rules.required,
        conditional_groups=rules.conditional_groups,
        allowed_values=rules.allowed_values,
        regex_rules=rules.regex_rules,
        max_length=rules.max_length,
        int_fields=rules.int_fields,
        version_literal=rules.version_literal,
        op_whitelist=rules.op_whitelist,
    )
    df = df.withColumn("_scalar_fails", fail_reasons_column(scalar_rules, df.schema))

    token_specs = []
    dtypes = {f.name for f in df.schema.fields}
    range_by_col = {c: (lo, hi) for c, lo, hi in rules.token_range}
    for len_col, arr_col in rules.length_equals:
        if len_col in dtypes and arr_col in dtypes:
            lo, hi = range_by_col.get(arr_col, (None, None))
            token_specs.append((len_col, arr_col, lo, hi))
    if not token_specs:
        return df.withColumn(FAIL_COL, F.col("_scalar_fails")).drop("_scalar_fails")

    # The Arrow UDF only emits boolean mask columns (pure pyarrow/numpy
    # compute, no Python row loop); the fail_reasons array is composed
    # JVM-side from the masks afterwards.
    mask_fields = []
    for idx, _ in enumerate(token_specs):
        mask_fields.append(T.StructField(f"_len_bad_{idx}", T.BooleanType(), False))
        mask_fields.append(T.StructField(f"_rng_bad_{idx}", T.BooleanType(), False))
    result_schema = T.StructType(list(df.schema.fields) + mask_fields)
    col_order = result_schema.fieldNames()

    def check_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            for idx, (len_col, arr_col, lo, hi) in enumerate(token_specs):
                len_bad, range_bad = _token_masks(
                    pdf[arr_col],
                    pdf[len_col],
                    lo if lo is not None else 0,
                    hi if hi is not None else 2**31,
                )
                pdf[f"_len_bad_{idx}"] = len_bad
                pdf[f"_rng_bad_{idx}"] = range_bad if lo is not None else False
            yield pdf[col_order]

    masked = df.mapInPandas(check_batches, schema=result_schema)
    token_fails = []
    for idx, (len_col, arr_col, lo, hi) in enumerate(token_specs):
        token_fails.append(
            F.when(
                F.col(f"_len_bad_{idx}"),
                F.lit(_msg("length_equals", len_col, f"!= size({arr_col})")),
            )
        )
        if lo is not None:
            token_fails.append(
                F.when(
                    F.col(f"_rng_bad_{idx}"),
                    F.lit(_msg("token_range", arr_col, f"token outside [{lo},{hi})")),
                )
            )
    out = masked.withColumn(
        FAIL_COL,
        F.array_compact(F.concat(F.col("_scalar_fails"), F.array(*token_fails))),
    )
    drop = ["_scalar_fails"] + [f.name for f in mask_fields]
    return out.drop(*drop)
