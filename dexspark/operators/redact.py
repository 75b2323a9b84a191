"""PII redaction: scrub emails/phones/IPs/IDs from a text column.

Training corpora are scrubbed of personally identifiable information
before use (C4, RefinedWeb, and the CCPA/GDPR-driven pipelines all
carry this stage). The operator is a chain of ``regexp_replace``
rewrites — pure JVM, whole-stage-codegen, zero shuffle, zero Python —
plus per-pattern match counts (``regexp_count``) recorded BEFORE the
rewrite so the lineage/metrics rollup can report redaction volume per
source (same observability contract as the validator's fail counts,
SURVEY V17/A4).

Properties the tests pin down:
- idempotence: redacting already-redacted text is a no-op (the
  replacement tokens never match any pattern);
- order-independence of the default patterns (disjoint matches);
- counts are exact match counts, not changed-row flags.

At 100 TB this is a map-only stage: it fuses into the same
WholeStageCodegen span as the validators and costs no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Ordered (name, pattern, replacement). Patterns are deliberately
# conservative/structural (the published C4-style scrubbers are too):
# EMAIL before PHONE so an address's digit runs are consumed first.
DEFAULT_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b",
        "<IP>",
    ),
    (
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        # +1 555 123 4567 / (555) 123-4567 / 555-123-4567
        r"(?:\+?[0-9]{1,2}[ .-]?)?\(?[0-9]{3}\)?[ .-][0-9]{3}[ .-][0-9]{4}\b",
        "<PHONE>",
    ),
]


def redaction_counts(
    df: DataFrame,
    text: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Add ``n_<name>`` exact match counts per pattern + ``n_pii`` total.

    Counts reflect the ORIGINAL text (taken before any rewrite), so a
    phone number inside an email address counts once as email, not
    twice — the counting order mirrors the redaction order.
    """
    pats = patterns if patterns is not None else DEFAULT_PATTERNS
    out = df
    remaining = F.col(text)
    count_cols = []
    for name, pat, repl in pats:
        c = f"n_{name}"
        out = out.withColumn(c, F.regexp_count(remaining, F.lit(pat)))
        count_cols.append(c)
        remaining = F.regexp_replace(remaining, pat, repl)
    total = None
    for c in count_cols:
        total = F.col(c) if total is None else total + F.col(c)
    return out.withColumn("n_pii", total if total is not None else F.lit(0))


def redact(
    df: DataFrame,
    text: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
    keep_counts: bool = True,
) -> DataFrame:
    """Rewrite ``text`` in place with PII replaced by typed tokens.

    One chained ``regexp_replace`` expression — a single projection,
    map-only. With ``keep_counts`` the per-pattern counts (from the
    pre-rewrite text) ride along for the metrics rollup.
    """
    pats = patterns if patterns is not None else DEFAULT_PATTERNS
    base = redaction_counts(df, text, pats) if keep_counts else df
    scrubbed = F.col(text)
    for _, pat, repl in pats:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return base.withColumn(text, scrubbed)


def redaction_report(
    df: DataFrame,
    text: str = "text",
    group_col: str = "source",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Per-group redaction volume (docs touched + matches per pattern).

    The A4-style rollup: one partial-aggregated groupBy, output is
    O(groups).
    """
    pats = patterns if patterns is not None else DEFAULT_PATTERNS
    counted = redaction_counts(df, text, pats)
    aggs = [F.sum(f"n_{name}").alias(f"n_{name}") for name, _, _ in pats]
    return counted.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("n_pii") > 0).cast("bigint")).alias("n_docs_with_pii"),
        F.sum("n_pii").alias("n_pii"),
        *aggs,
    )
