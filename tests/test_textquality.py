"""Gopher-style repetition quality filters (operators/textquality.py)."""

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dexspark.operators.textquality import (
    QualityThresholds,
    filter_quality,
    quality_flags,
    repetition_stats,
)

# long enough that a unique n-gram is a small fraction of the doc —
# the Gopher top-n-gram thresholds assume non-trivial document length
CLEAN = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(25)) + (
    " the quick brown fox jumps over a lazy dog near an old river bank"
)
REPEAT_WORDS = "spam " * 40 + "end"
REPEAT_BIGRAM = "buy now " * 30 + "other words appear here once only"
SYMBOLS = "### look ### here ### now ### wow ### more ### tags"
TINY = "one two"


def _corpus(spark):
    rows = [
        (0, CLEAN),
        (1, REPEAT_WORDS.strip()),
        (2, REPEAT_BIGRAM.strip()),
        (3, SYMBOLS),
        (4, TINY),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _stats(spark):
    return {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(_corpus(spark)).collect()
    }


def test_dup_word_frac(spark):
    s = _stats(spark)
    words = CLEAN.split(" ")
    expect = round(1 - len(set(words)) / len(words), 4)
    assert s[0]["dup_word_frac"] == expect
    assert s[1]["dup_word_frac"] > 0.9  # 40x "spam"
    assert s[0]["n_words"] == len(words)


def test_top_ngram_frac_matches_bruteforce(spark):
    s = _stats(spark)
    for doc_id, text in [(0, CLEAN), (1, REPEAT_WORDS.strip()),
                         (2, REPEAT_BIGRAM.strip())]:
        words = text.split(" ")
        for n, col in [(2, "top_bigram_frac"), (3, "top_trigram_frac")]:
            grams = [" ".join(words[i:i + n])
                     for i in range(len(words) - n + 1)]
            expect = round(
                min(Counter(grams).most_common(1)[0][1] * n / len(words), 1.0),
                4,
            )
            assert s[doc_id][col] == expect, (doc_id, col)


def test_dup_line_frac(spark):
    df = spark.createDataFrame(
        [(0, "a b\na b\na b\nc d"), (1, "x\ny\nz")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["dup_line_frac"]
           for r in repetition_stats(df).collect()}
    assert got[0] == 0.5  # 4 lines, 2 distinct
    assert got[1] == 0.0


def test_flags_and_filter(spark):
    flagged = quality_flags(repetition_stats(_corpus(spark)))
    by_id = {r["doc_id"]: r for r in flagged.collect()}
    assert by_id[0]["quality_pass"]
    assert not by_id[1]["quality_pass"]  # dup words + top bigram
    assert any("dup_word_frac" in m for m in by_id[1]["fail_reasons"])
    assert not by_id[2]["quality_pass"]  # repeated bigram
    assert any("top_bigram_frac" in m for m in by_id[2]["fail_reasons"])
    assert not by_id[3]["quality_pass"]  # symbol ratio
    assert not by_id[4]["quality_pass"]  # too short
    surviving = filter_quality(_corpus(spark))
    assert [r["doc_id"] for r in surviving.collect()] == [0]
    assert surviving.columns == ["doc_id", "text"]


def test_thresholds_tunable(spark):
    lax = QualityThresholds(
        max_dup_word_frac=1.0, max_top_bigram_frac=1.0,
        max_top_trigram_frac=1.0, min_words=1,
        max_symbol_word_ratio=10.0, min_frac_alpha_words=0.0,
    )
    assert filter_quality(_corpus(spark), lax).count() == 5


SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_real_testdata_and_plan(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    flagged = quality_flags(repetition_stats(docs))
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # per-row only: no shuffle at any scale
    total = flagged.count()
    assert total == docs.count()
    # statistics are sane over the synthetic corpus
    agg = flagged.agg(
        F.min("dup_word_frac"), F.max("dup_word_frac"),
        F.min("top_bigram_frac"), F.max("top_bigram_frac"),
    ).collect()[0]
    assert 0.0 <= agg[0] <= agg[1] <= 1.0
    assert 0.0 <= agg[2] <= agg[3] <= 1.0
