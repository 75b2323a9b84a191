"""Benchmark decontamination: drop corpus docs overlapping an eval set.

Training corpora must not contain evaluation data. The standard test
(GPT-3 appendix C / PaLM / Llama reports) is n-gram overlap: a corpus
document is *contaminated* if it shares at least ``min_hits`` distinct
word n-grams with any benchmark document.

Scale shape — the benchmark side is small (eval suites are MBs; the
corpus is the 100 TB side), which makes the plan broadcast-friendly:

1. benchmark -> explode word n-grams -> distinct -> **broadcast**
   (one tiny set of grams, built once).
2. corpus -> explode word n-grams (map-only; duplicates kept — no
   pre-shuffle) -> broadcast hash join against the benchmark grams
   (map-side, prunes to matching grams only).
3. groupBy(doc_id).agg(count_distinct(gram)) — the ONLY shuffle, and
   it carries just the matching gram rows, a vanishing fraction of
   the corpus.
4. contaminated ids -> left_anti against the corpus (broadcast again:
   the contaminated-id set is bounded by the benchmark's reach).

No all-pairs, no corpus self-join, nothing driver-side. The gram
definition is the engine-wide one (operators/grams.py), shared with
the dedup shingles and the span-dedup anchors so they can never
drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ngrams(
    df: DataFrame, n: int = 8, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, gram) n-grams, JVM-side, duplicates kept (map-only).

    ``text`` may be a string column (split on spaces — word n-grams)
    or an array column (token-id n-grams over pre-tokenized
    sequences, the north-star payload): the unit sequence is chosen
    from the column's dtype, everything downstream is identical.
    """
    from pyspark.sql import types as T

    if isinstance(df.schema[text].dataType, T.ArrayType):
        words = F.col(text).cast("array<string>")
    else:
        words = F.split(F.col(text), " ")
    # words staged into its OWN projection: left inline, the split
    # re-evaluates inside the transform lambda for every shingle
    # (lambda bodies are excluded from codegen subexpression
    # elimination) — O(words²) per doc, measured 12x at 480-word docs.
    # The multi-reference to the non-cheap alias also blocks
    # CollapseProject from re-inlining it.
    staged = df.select(id_col, words.alias("_w"))
    from .grams import gram_strings

    return staged.select(
        id_col, F.explode(gram_strings(F.col("_w"), n)).alias("gram")
    )


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_hits) — distinct benchmark n-grams found per corpus doc.

    Docs with zero hits are absent (inner join); only matching grams
    are ever shuffled.
    """
    bench = F.broadcast(ngrams(benchmark, n, text, id_col).select("gram").distinct())
    return (
        ngrams(corpus, n, text, id_col)
        .join(bench, "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus minus documents with >= min_hits benchmark n-gram hits.

    The contaminated-id side of the anti-join is broadcast: its size
    is bounded by the number of docs the benchmark can reach, not by
    the corpus.
    """
    bad = contamination_hits(corpus, benchmark, n, text, id_col).filter(
        F.col("n_hits") >= min_hits
    )
    return corpus.join(F.broadcast(bad.select(id_col)), id_col, "left_anti")
