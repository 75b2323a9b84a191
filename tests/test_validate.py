"""Validation kernel scenarios (FIXTURES.md §3 golden batches; rules
from COVID_19_File_and_Row_Level_Validation.xlsx re-targeted to the
tokenized-sequence payload). Both execution paths must agree:
Column-expr and Arrow-vectorized mapInPandas."""

import pytest
from pyspark.sql import functions as F, types as T

from dexspark.config import RuleSet, sequences_ruleset
from dexspark.validate import (
    FAIL_COL,
    arrow_validate,
    split_quarantine,
    with_fail_reasons,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)

ROWS = [
    ("ok", [1, 2, 3], 3, "web"),                 # valid
    ("len", [1, 2], 3, "books"),                  # V8 n_tok != len(tokens)
    ("rng", [1, 99_999], 2, "code"),              # V10 token out of [0, vocab)
    ("neg", [-1, 2], 2, "wiki"),                  # V10 negative token
    ("src", [1], 1, "parquet"),                   # V13 source not whitelisted
    (None, [1], 1, "web"),                        # V11 doc_id required
    ("nulltok", None, 0, "web"),                  # V11 tokens required
    ("blank", [1], 1, "  "),                      # V11 blank string = empty
    ("multi", [-5], 2, "nope"),                   # several rules at once
]

EXPECT = {
    "ok": set(),
    "len": {"length_equals"},
    "rng": {"token_range"},
    "neg": {"token_range"},
    "src": {"allowed_values"},
    None: {"required"},
    "nulltok": {"required", "length_equals"},
    "blank": {"required", "allowed_values"},  # both rules legitimately fire
    "multi": {"length_equals", "token_range", "allowed_values"},
}


def _reasons(df):
    return {
        r["doc_id"]: {m.split(":")[0] for m in r[FAIL_COL]} for r in df.collect()
    }


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_column_expr_path(df):
    got = _reasons(with_fail_reasons(df, sequences_ruleset()))
    assert got == EXPECT


def test_arrow_path_agrees(df):
    got = _reasons(arrow_validate(df, sequences_ruleset()))
    assert got == EXPECT


def test_split_quarantine(df):
    ok, bad = split_quarantine(with_fail_reasons(df, sequences_ruleset()))
    assert {r["doc_id"] for r in ok.collect()} == {"ok"}
    assert bad.count() == len(ROWS) - 1
    assert FAIL_COL not in ok.columns


def test_all_reasons_accumulate(df):
    """V17: every violated rule reported, no short-circuit (upgrade over
    the reference's continue-on-first-failure, FnDecompressor.kt:70)."""
    row = [r for r in arrow_validate(df, sequences_ruleset()).collect() if r["doc_id"] == "multi"][0]
    assert len(row[FAIL_COL]) == 3


def test_conditional_groups(spark):
    """V12: fail iff zero of the group set
    (ConditionallyRequiredFieldValidator.java:16 numSet == 0)."""
    schema = "a string, b string, c string"
    df = spark.createDataFrame(
        [("x", None, None), (None, "y", None), (None, None, None), ("", " ", None)],
        schema,
    )
    rules = RuleSet(conditional_groups=(("a", "b"),))
    got = [set(r[FAIL_COL]) for r in with_fail_reasons(df, rules).collect()]
    assert got[0] == set() and got[1] == set()
    assert got[2] and got[3]  # all-null and all-blank both fail


def test_regex_maxlen_int_version(spark):
    df = spark.createDataFrame(
        [("A1", "abcdef", "12", "V2"), ("B!", "toolong", "x", "V1")],
        "code string, body string, num string, ver string",
    )
    rules = RuleSet(
        regex_rules=(("code", "^[A-Z][0-9]$"),),      # V14
        max_length=(("body", 6),),                     # V10 string form
        int_fields=("num",),                           # V15
        version_literal=(("ver", "V2"),),              # V3
    )
    out = {r["code"]: {m.split(":")[0] for m in r[FAIL_COL]} for r in with_fail_reasons(df, rules).collect()}
    assert out["A1"] == set()
    assert out["B!"] == {"regex", "max_length", "int_field", "version"}


def test_rules_skip_absent_columns(spark):
    df = spark.createDataFrame([("x",)], "doc_id string")
    out = with_fail_reasons(df, sequences_ruleset())
    reasons = out.collect()[0][FAIL_COL]
    # rules for tokens/n_tok/source skipped (header reconcile handles
    # missing columns separately); doc_id rule still applies
    assert all("doc_id" not in m or "required" in m for m in reasons)


def test_empty_batch(spark):
    """V1 file-not-empty analogue: an empty batch validates to an empty
    frame without error; the engine records it in lineage."""
    df = spark.createDataFrame([], SCHEMA)
    assert arrow_validate(df, sequences_ruleset()).count() == 0


def test_arrow_token_range_without_length_pair(spark):
    """A token_range rule with NO matching length_equals pair must
    still run in arrow mode (it used to be silently skipped there,
    diverging from the jvm path)."""
    df = spark.createDataFrame(
        [("a", [1, 2]), ("b", [999]), ("c", None), ("d", [5, None])],
        "doc_id string, tokens array<int>",
    )
    rules = RuleSet(token_range=(("tokens", 0, 100),))
    jvm = {r["doc_id"]: sorted(r[FAIL_COL]) for r in with_fail_reasons(df, rules).collect()}
    arr = {r["doc_id"]: sorted(r[FAIL_COL]) for r in arrow_validate(df, rules).collect()}
    assert arr == jvm
    assert jvm["b"] and jvm["d"]          # out-of-range + null element fail
    assert jvm["a"] == [] and jvm["c"] == []  # in-range + null array pass


def test_arrow_multiple_ranges_one_column_agrees_with_jvm(spark):
    """Several token_range rules on ONE column, alongside a
    length_equals pair on the same column: arrow mode used to fold the
    ranges into the pair's spec via a dict (last range wins), passing
    rows the jvm path quarantines. One-spec-per-rule restores parity."""
    df = spark.createDataFrame(
        [("ok", [1, 2], 2), ("hi", [90], 1), ("len", [1], 9)],
        "doc_id string, tokens array<int>, n_tok int",
    )
    rules = RuleSet(
        length_equals=(("n_tok", "tokens"),),
        token_range=(("tokens", 0, 1000), ("tokens", 0, 50)),
    )
    jvm = {r["doc_id"]: sorted(r[FAIL_COL]) for r in with_fail_reasons(df, rules).collect()}
    arr = {r["doc_id"]: sorted(r[FAIL_COL]) for r in arrow_validate(df, rules).collect()}
    assert arr == jvm
    assert jvm["ok"] == []
    assert any("token_range" in m for m in jvm["hi"])  # 90 breaks [0,50)
    assert any("length_equals" in m for m in jvm["len"])
