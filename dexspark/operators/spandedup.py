"""Exact duplicate-span detection and removal over token sequences.

The document-level dedup family (exact hash, MinHash/LSH, SimHash,
n-gram Jaccard) removes WHOLE near-duplicate documents. Training
corpora also carry *intra-document* verbatim repetition: licence
headers, navigation boilerplate, quoted replies — long token runs
repeated verbatim across otherwise-distinct documents. The
exact-substring dedup of Lee et al. 2022 ("Deduplicating Training
Data Makes Language Models Better") removes every span of >= L
tokens that occurs more than once in the corpus; their single-node
tool builds a suffix array over the concatenated corpus, which does
not distribute. This module computes the SAME relation with a
k-gram anchoring argument that is pure DataFrame algebra:

  with anchor width k = min_len, a span of >= k tokens duplicated
  anywhere in the corpus contains a duplicated k-gram at every one
  of its k-gram start positions; conversely every duplicated k-gram
  IS a duplicated span of length exactly k. The union of [p, p+k)
  over duplicated-gram starts p is therefore exactly the set of
  token positions covered by some duplicated span of length >= k,
  and merging overlapping/abutting intervals yields the maximal
  duplicated spans.

Plan shape (the 100 TB argument):

  phase A  gram-hash global counts — ONE shuffle of 8-byte hashes
           (map-side partial counts); this is the floor for exact
           corpus-wide duplicate detection, and it is the same
           shuffle the exact-dedup groupBy pays, just at gram grain.
  phase B  positions are resolved ONLY for duplicated grams: the
           (doc, pos, hash) explode is a map-only projection and the
           join against the dup-gram set is duplicate-sized (AQE
           broadcasts it when small — duplication is rare in clean
           corpora, so the common case is a broadcast of the rare
           case). Interval merge is a per-doc window over dup
           positions only.

Hash collisions: xxhash64 over the raw token slice (64-bit) — the
same scheme/argument as the near-dup index signing
(operators/dedup_index.py); an md5-over-joined-strings scheme is
kept for the DuckDB-oracle-pinned driver query.

Reference anchor: the reference deduplicates at file grain only
(idempotent re-write of the same blob path, FnDecompressor.kt:94-95);
span-level dedup is the training-data-domain extension the north
star's corpus hygiene requires, sitting beside the document-level
family in dexspark/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

# the engine-wide gram definition (operators/grams.py); the old
# private name is kept for existing import sites
from .grams import gram_hashes as _gram_hashes

SPAN_MIN_LEN = 8


def _words(docs: DataFrame, text: str, scheme: str):
    """Token-array column for ``text``: split strings on spaces; keep
    token arrays raw for the xxhash64 scheme (hashing int slices
    directly — casting to string costs more than the hash, measured
    in the index-signing work, BENCH.md round-3d trail)."""
    dt = docs.schema[text].dataType
    if not isinstance(dt, T.ArrayType):
        return F.split(F.col(text), " ")
    if scheme == "md5":
        return F.col(text).cast("array<string>")
    return F.col(text)


def duplicate_spans(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_len: int = SPAN_MIN_LEN,
    scheme: str = "xxhash64",
) -> DataFrame:
    """Maximal duplicated spans of >= ``min_len`` tokens.

    Returns ``(id_col, span_start, span_end)`` — 0-based token
    indices, ``span_end`` exclusive — one row per maximal interval of
    positions covered by a corpus-duplicated ``min_len``-gram
    (duplicated across documents OR repeated within one document).
    """
    k = int(min_len)
    if k < 2:
        raise ValueError("min_len must be >= 2")
    # the word array staged into its own projection: a split left
    # inline re-evaluates inside _gram_hashes' lambda per gram —
    # O(words²) per doc on string text (harmless rename for arrays)
    staged = docs.select(F.col(id_col), _words(docs, text, scheme).alias("_w"))
    grams = staged.select(
        F.col(id_col),
        F.posexplode(_gram_hashes(F.col("_w"), k, scheme)).alias("pos", "g"),
    )
    # phase A: global gram counts (map-side partials collapse
    # within-partition repeats — banner grams collapse early)
    dup = grams.groupBy("g").count().filter(F.col("count") >= 2).select("g")
    # phase B: dup-only position resolution. AQE broadcasts `dup`
    # when the duplicate set is small (the common case).
    hits = grams.join(dup, "g").select(id_col, "pos")
    # interval union of [pos, pos+k): fixed width makes span ends
    # monotone in pos, so lag() is the full overlap test — break a
    # run exactly when the gap exceeds k.
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = (
        F.when(F.col("pos") > F.lag("pos").over(w) + k, 1).otherwise(0).alias("brk")
    )
    islands = hits.select(id_col, "pos", brk).withColumn(
        "island", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k).cast("long").alias("span_end"),
        )
        .drop("island")
    )


def remove_duplicate_spans(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_len: int = SPAN_MIN_LEN,
    spans: DataFrame | None = None,
    scheme: str = "xxhash64",
) -> DataFrame:
    """Drop every duplicated-span occurrence from each document.

    Removes ALL copies (Lee et al.'s cut policy — they measure that
    keeping no canonical copy does not hurt; a keep-first policy is
    the composition ``spans.join(canonical_docs, 'left_anti')`` fed
    back through ``spans=``). String ``text`` columns are re-joined
    with single spaces; array columns stay arrays. Adds
    ``n_removed_tokens``. Pass a precomputed ``spans`` frame (e.g.
    filtered, or from a changelog window) to skip re-detection.
    """
    if spans is None:
        spans = duplicate_spans(docs, text, id_col, min_len, scheme)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    is_array = isinstance(docs.schema[text].dataType, T.ArrayType)
    words = _words(docs, text, scheme="raw") if is_array else F.split(F.col(text), " ")
    out = docs.join(per_doc, id_col, "left").withColumn(
        "_spans", F.coalesce(F.col("_spans"), F.array())
    )
    kept = F.filter(
        words,
        lambda tok, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    n_removed = (F.size(words) - F.size(kept)).alias("n_removed_tokens")
    new_text = kept if is_array else F.concat_ws(" ", kept)
    return out.withColumn("n_removed_tokens", n_removed).withColumn(
        text, new_text
    ).drop("_spans")
