"""Repetition-based quality filters (Gopher/MassiveText rules).

The standard pre-training corpus gate (Gopher appendix A1.1, refined
by MassiveText/RefinedWeb): documents dominated by repeated lines,
words, or n-grams are boilerplate/spam and are dropped before
training. This module computes the repetition statistics and compiles
threshold rules into the same ``fail_reasons array<string>`` shape the
engine's row validators use (SURVEY V17) — a quality filter IS a
validation rule over the documents table.

Scale shape — every statistic is a PURE JVM expression evaluated
per row inside whole-stage codegen; there is NO shuffle and NO Python
anywhere:

- duplicate word/line fractions: ``size(array_distinct(x))/size(x)``;
- the top-n-gram fraction (the one that naively needs a
  groupBy(doc, gram) + max — two shuffles): computed per row in
  O(n log n) by sorting the gram array and folding a run-length
  state struct with ``aggregate`` — equal grams are adjacent after
  the sort, so the longest run IS the max frequency. Linear scan,
  constant state, spill-free, unbounded document length safe.

Reference anchors: the reference gates files on content rules before
accepting them (validation order 1-13, SURVEY §2.3); these are the
same gate for the training-corpus domain.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


def _word_ngrams(words: Column, n: int) -> Column:
    """Array of word n-grams — the engine-wide gram definition
    (operators/grams.py), kept under the local name for callers."""
    from .grams import gram_strings

    return gram_strings(words, n)


def _max_run_count(arr: Column) -> Column:
    """Max multiplicity of any element of ``arr`` — one O(n log n) pass.

    ``array_sort`` makes equal elements adjacent; a single
    ``aggregate`` fold tracks (previous element, current run, best
    run). No explode, no shuffle, no per-doc hash map.
    """
    sorted_arr = F.array_sort(arr)
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
        .otherwise(F.lit(1))
        .alias("run"),
        F.greatest(
            acc["best"],
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    return F.aggregate(sorted_arr, zero, step, lambda acc: acc["best"])


def repetition_stats(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition + composition statistics (all JVM).

    Columns added (each a standard Gopher-family signal):
      n_words            word count (single-space tokenization)
      dup_word_frac      1 - |distinct words| / |words|
      dup_line_frac      1 - |distinct lines| / |lines|   (\\n split)
      top_bigram_frac    (max bigram multiplicity * 2) / n_words —
                         fraction of words covered by the most
                         frequent word 2-gram
      top_trigram_frac   same for 3-grams
      mean_word_len      avg characters per word
      frac_alpha_words   fraction of words containing a letter
      symbol_word_ratio  '#' or '...' occurrences per word
    """
    # word/line arrays staged into their own projection: a split left
    # inline would re-evaluate inside _word_ngrams' transform lambda
    # for every bigram/trigram position — O(words²) per doc (lambda
    # bodies are excluded from codegen subexpression elimination; the
    # many references to the non-cheap aliases also block
    # CollapseProject from re-inlining them). Temp names are chosen
    # fresh against the input schema (a caller column literally named
    # _w must survive untouched), and dropped before returning.
    wname, lname = "_w", "_lines"
    while wname in df.columns:
        wname += "_"
    while lname in df.columns:
        lname += "_"
    df = df.withColumns(
        {wname: F.split(F.col(text), " "), lname: F.split(F.col(text), "\n")}
    )
    words = F.col(wname)
    lines = F.col(lname)
    n_words = F.size(words)
    nz = F.greatest(n_words, F.lit(1)).cast("double")

    def frac(c: Column) -> Column:
        return F.round(c, 4)

    return df.withColumns(
        {
            "n_words": n_words,
            "dup_word_frac": frac(
                F.lit(1.0) - F.size(F.array_distinct(words)) / nz
            ),
            "dup_line_frac": frac(
                F.lit(1.0)
                - F.size(F.array_distinct(lines))
                / F.greatest(F.size(lines), F.lit(1)).cast("double")
            ),
            "top_bigram_frac": frac(
                F.least(
                    _max_run_count(_word_ngrams(words, 2)).cast("double")
                    * 2.0
                    / nz,
                    F.lit(1.0),
                )
            ),
            "top_trigram_frac": frac(
                F.least(
                    _max_run_count(_word_ngrams(words, 3)).cast("double")
                    * 3.0
                    / nz,
                    F.lit(1.0),
                )
            ),
            "mean_word_len": frac(
                F.aggregate(
                    words, F.lit(0), lambda a, w: a + F.length(w)
                ).cast("double")
                / nz
            ),
            "frac_alpha_words": frac(
                F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))) / nz
            ),
            "symbol_word_ratio": frac(
                (
                    F.regexp_count(F.col(text), F.lit("#"))
                    + F.regexp_count(F.col(text), F.lit(r"\.\.\."))
                ).cast("double")
                / nz
            ),
        }
    ).drop(wname, lname)


@dataclass(frozen=True)
class QualityThresholds:
    """Gopher rule A1.1 defaults (tunable, codeless-config friendly)."""

    max_dup_word_frac: float = 0.40
    max_dup_line_frac: float = 0.30
    max_top_bigram_frac: float = 0.18
    max_top_trigram_frac: float = 0.16
    min_words: int = 5
    max_words: int = 1_000_000
    min_mean_word_len: float = 2.0
    max_mean_word_len: float = 12.0
    min_frac_alpha_words: float = 0.70
    max_symbol_word_ratio: float = 0.10

    def rules(self) -> list[tuple[str, str]]:
        """(fail message, boolean-SQL-over-stats) pairs."""
        return [
            (f"dup_word_frac > {self.max_dup_word_frac}",
             f"dup_word_frac > {self.max_dup_word_frac}"),
            (f"dup_line_frac > {self.max_dup_line_frac}",
             f"dup_line_frac > {self.max_dup_line_frac}"),
            (f"top_bigram_frac > {self.max_top_bigram_frac}",
             f"top_bigram_frac > {self.max_top_bigram_frac}"),
            (f"top_trigram_frac > {self.max_top_trigram_frac}",
             f"top_trigram_frac > {self.max_top_trigram_frac}"),
            (f"n_words not in [{self.min_words}, {self.max_words}]",
             f"n_words < {self.min_words} OR n_words > {self.max_words}"),
            (f"mean_word_len not in [{self.min_mean_word_len}, "
             f"{self.max_mean_word_len}]",
             f"mean_word_len < {self.min_mean_word_len} "
             f"OR mean_word_len > {self.max_mean_word_len}"),
            (f"frac_alpha_words < {self.min_frac_alpha_words}",
             f"frac_alpha_words < {self.min_frac_alpha_words}"),
            (f"symbol_word_ratio > {self.max_symbol_word_ratio}",
             f"symbol_word_ratio > {self.max_symbol_word_ratio}"),
        ]


def quality_flags(
    stats: DataFrame, thresholds: QualityThresholds | None = None
) -> DataFrame:
    """Compile thresholds to ``fail_reasons array<string>`` + pass flag.

    Same ALL-reasons accumulation contract as the engine's row
    validators (SURVEY V17): every violated rule is reported, rows
    with an empty array pass. Input must carry ``repetition_stats``
    columns.
    """
    t = thresholds or QualityThresholds()
    reasons = F.array_compact(
        F.array(
            *[
                F.when(F.expr(cond), F.lit(msg)).otherwise(F.lit(None))
                for msg, cond in t.rules()
            ]
        )
    )
    return stats.withColumns(
        {"fail_reasons": reasons, "quality_pass": F.size(reasons) == 0}
    )


def filter_quality(
    df: DataFrame,
    thresholds: QualityThresholds | None = None,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end gate: stats -> flags -> passing docs (original schema)."""
    flagged = quality_flags(repetition_stats(df, text, id_col), thresholds)
    return flagged.filter(F.col("quality_pass")).select(*df.columns)
