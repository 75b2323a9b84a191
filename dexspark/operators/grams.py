"""ONE gram/shingle definition for the whole engine.

Every n-gram consumer — minhash signatures (dedup_index), ngram
Jaccard (queries), benchmark decontamination (decontaminate),
exact-span dedup (spandedup), repetition stats (textquality) — must
agree on what "the i-th k-gram of a document" means, or the dedup
index, the batch queries, and their DuckDB oracles silently drift.
This module is that single definition; the consumers import it
rather than re-declaring the ``when/sequence`` index expression.

CALLER CONTRACT (the quadratic-split lesson, BENCH.md round-4b):
``words`` must be a STAGED COLUMN (an attribute from its own
projection), never an inline ``F.split(...)`` expression — an
expression passed here lands inside the transform lambdas, where
codegen subexpression elimination cannot reach it, and re-evaluates
once per gram: O(words²) per document.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["word_index", "gram_hashes", "gram_strings"]


def word_index(words: Column, n: int) -> Column:
    """1-based start index of every width-``n`` gram of ``words``;
    empty (never NULL-sized) for docs shorter than ``n`` tokens, and
    NULL-in-NULL-out for NULL word arrays via the ``when``."""
    return F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))


def gram_hashes(words: Column, k: int, scheme: str = "xxhash64") -> Column:
    """Array of k-gram hashes; index i (0-based) anchors tokens
    [i, i+k). ``xxhash64`` hashes the raw token slice (8-byte longs,
    no gram string is ever built); ``md5`` hashes the space-joined
    gram string (the DuckDB-oracle-pinned form)."""
    idx = word_index(words, k)
    if scheme == "md5":
        return F.transform(
            idx, lambda i: F.md5(F.concat_ws(" ", F.slice(words, i, F.lit(k))))
        )
    return F.transform(idx, lambda i: F.xxhash64(F.slice(words, i, F.lit(k))))


def gram_strings(words: Column, n: int) -> Column:
    """Array of space-joined word n-grams (the human-readable form the
    decontamination join and repetition stats use)."""
    return F.transform(
        word_index(words, n), lambda i: F.array_join(F.slice(words, i, n), " ")
    )
