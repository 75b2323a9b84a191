"""PII redaction operator (operators/redact.py)."""

from pyspark.sql import functions as F

from dexspark.operators.redact import (
    DEFAULT_PATTERNS,
    redact,
    redaction_counts,
    redaction_report,
)


def _corpus(spark):
    rows = [
        (0, "contact alice@example.com or bob.smith+x@sub.domain.org now", "a"),
        (1, "server at 192.168.1.254 and 10.0.0.1 responded", "a"),
        (2, "ssn 123-45-6789 leaked with phone (555) 123-4567", "b"),
        (3, "call +1 555 123 4567 or 555-987-6543 today", "b"),
        (4, "perfectly clean text with numbers 12345 and words", "b"),
        (5, "mixed alice@example.com near 8.8.8.8 and 999-12-3456", "c"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


def test_counts_exact(spark):
    got = {r["doc_id"]: r for r in redaction_counts(_corpus(spark)).collect()}
    assert (got[0]["n_email"], got[0]["n_pii"]) == (2, 2)
    assert (got[1]["n_ipv4"], got[1]["n_pii"]) == (2, 2)
    assert (got[2]["n_ssn"], got[2]["n_phone"], got[2]["n_pii"]) == (1, 1, 2)
    assert (got[3]["n_phone"], got[3]["n_pii"]) == (2, 2)
    assert got[4]["n_pii"] == 0
    assert (got[5]["n_email"], got[5]["n_ipv4"], got[5]["n_ssn"]) == (1, 1, 1)


def test_redact_rewrites(spark):
    got = {r["doc_id"]: r["text"] for r in redact(_corpus(spark)).collect()}
    assert got[0] == "contact <EMAIL> or <EMAIL> now"
    assert got[1] == "server at <IP> and <IP> responded"
    assert got[2] == "ssn <SSN> leaked with phone <PHONE>"
    assert got[3] == "call <PHONE> or <PHONE> today"
    assert got[4] == "perfectly clean text with numbers 12345 and words"
    assert "<EMAIL>" in got[5] and "<IP>" in got[5] and "<SSN>" in got[5]


def test_idempotent(spark):
    once = redact(_corpus(spark), keep_counts=False)
    twice = redact(once, keep_counts=False)
    assert sorted(r["text"] for r in once.collect()) == sorted(
        r["text"] for r in twice.collect()
    )
    # and already-redacted text reports zero matches
    assert (
        redaction_counts(once).agg(F.sum("n_pii")).collect()[0][0] == 0
    )


def test_email_wins_over_phone_digits(spark):
    # digits inside an email must not double-count as phone/ssn
    df = spark.createDataFrame(
        [(0, "reach 123-45-6789@example.com please", "a")],
        "doc_id int, text string, source string",
    )
    r = redaction_counts(df).collect()[0]
    assert r["n_email"] == 1
    assert r["n_ssn"] == 0 and r["n_phone"] == 0
    assert redact(df).collect()[0]["text"] == "reach <EMAIL> please"


def test_report_rollup(spark):
    rep = {r["source"]: r for r in redaction_report(_corpus(spark)).collect()}
    assert rep["a"]["n_docs"] == 2 and rep["a"]["n_docs_with_pii"] == 2
    assert rep["a"]["n_email"] == 2 and rep["a"]["n_ipv4"] == 2
    assert rep["b"]["n_docs"] == 3 and rep["b"]["n_docs_with_pii"] == 2
    assert rep["c"]["n_pii"] == 3


def test_plan_is_map_only(spark):
    df = redact(_corpus(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
    assert len(DEFAULT_PATTERNS) == 4
