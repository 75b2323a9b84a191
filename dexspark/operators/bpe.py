"""Byte-level BPE tokenization, Spark-first (no external tokenizer lib).

The engine's payload is pre-tokenized sequences; upstream of it sits a
tokenizer. ``hash_tokenize`` (operators/corpus.py) is a shape stand-in;
this module is the real thing: GPT-2-style byte-level byte-pair
encoding — learn merge rules, encode text to ``array<int>``, decode
back — with every corpus-scale stage shaped for 100 TB:

* :func:`word_counts` — corpus -> (word, count) via split + explode +
  groupBy: ONE exchange, map-side combined, and the frame it returns
  is O(distinct words), not O(corpus).
* :func:`learn_bpe` — the merge-learning loop is inherently sequential
  (each merge changes the next pair statistics), so it runs
  driver-side over the word-frequency table — the standard industrial
  shape (SentencePiece/HF train on word histograms, not the raw
  corpus). Driver memory is bounded by ``max_words`` (top-K by count,
  deterministic tie-break), NOT by corpus size; the distributed part
  ends at the histogram.
* :func:`bpe_encode` — encodes DISTINCT words once (mapInArrow over
  the deduplicated word frame — Arrow-batched Python, per *distinct
  word* not per token occurrence), then stitches ids back into
  documents by one of two plans (the vocabmap dense/join duality):

  - **partition path** (default): ONE ``mapInArrow`` over the
    documents themselves, with a bounded word->ids cache in the
    closure — Python pays per distinct word PER PARTITION (natural
    language is zipfian, so hit rates are ~99%), and the plan has
    ZERO shuffles: no explode, no join, no reassembly exchange. This
    is how production tokenizers run, and it composes with the
    equally shuffle-free ``pack_sequences`` into a fully map-only
    tokenize->pack stage. (A constant-folded map literal was
    measured and REJECTED: Catalyst map literals have no hash index
    — ``element_at`` linear-scans the keys, O(vocab) per word.)
  - **join path**: posexplode docs ⋈ the distinct-word frame encoded
    once globally (AQE/broadcastable), reassemble in order with
    ``sort_array``+``flatten`` — two bounded exchanges, Python per
    GLOBAL distinct word. Right when per-word Python is the
    bottleneck (huge merge tables, tiny partition reuse).

Token-id space: ids 0..255 are raw bytes; merge ``r`` (0-based rank)
owns id ``256 + r``. :func:`bpe_decode` inverts to the
whitespace-stripped byte stream: ``decode(encode(text)) ==
"".join(text.split())`` — word boundaries are not representable in
the id space under whitespace pre-tokenization, so pieces
concatenate with no separator (pinned by the round-trip test).

Reference anchor: the reference ends at validated CSV rows
(csvValidationFunction_Generic.kt:87-109); tokenization is part of this
engine's training-data extension (SURVEY §2.10), the producer of the
``tokens`` payload the north-star table carries.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

BYTE_VOCAB = 256

__all__ = [
    "word_counts",
    "learn_bpe",
    "encode_word",
    "bpe_encode",
    "bpe_decode",
    "merges_to_vocab",
]


# ---------------------------------------------------------------- learn


def word_counts(
    docs: DataFrame, text: str = "text", max_words: int | None = None
) -> DataFrame:
    """(word, count) histogram of whitespace-separated words.

    One exchange (groupBy word, map-side partial counts). With
    ``max_words`` the result is the top-K by (count desc, word asc) —
    the deterministic cap that bounds the driver-side learn."""
    wc = (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text), r"\s+"), lambda w: w != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )
    if max_words is not None:
        wc = wc.orderBy(F.col("count").desc(), F.col("word")).limit(max_words)
    return wc


def learn_bpe(
    docs_or_counts: DataFrame,
    num_merges: int,
    text: str = "text",
    max_words: int = 1_000_000,
) -> list[tuple[int, int]]:
    """Learn ``num_merges`` byte-pair merges from a corpus (or from a
    precomputed (word, count) frame).

    Returns the ordered merge list: ``merges[r] = (left_id, right_id)``
    producing token ``256 + r``. Ties in pair frequency break on the
    smaller (left, right) pair — fully deterministic.

    The histogram collect is capped at ``max_words`` rows (top-K by
    frequency); everything after it is driver-local — the sequential
    dependency between merges makes this the right split point (the
    cap is the explicit contract; words below it contribute no pair
    statistics, the standard trainer trade)."""
    cols = set(docs_or_counts.columns)
    wc = (
        docs_or_counts
        if {"word", "count"} <= cols
        else word_counts(docs_or_counts, text=text)
    )
    rows = (
        wc.orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    # word -> (mutable symbol list, frequency)
    words: list[tuple[list[int], int]] = [
        (list(r["word"].encode("utf-8")), int(r["count"])) for r in rows
    ]
    # Incremental trainer (the standard inverted-index shape): pair
    # counts and a pair -> {word idx} index are built ONCE; each merge
    # then touches only the words that contain the merged pair —
    # O(total_symbols + num_merges * touched) instead of the naive
    # O(num_merges * total_symbols) full-rescan (pytest pins
    # equality against the naive reference on randomized corpora).
    pair_counts: dict[tuple[int, int], int] = {}
    where: dict[tuple[int, int], set[int]] = {}
    for wi, (syms, freq) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + freq
            where.setdefault(p, set()).add(wi)

    def _sub(p: tuple[int, int], freq: int, wi: int) -> None:
        c = pair_counts.get(p)
        if c is None:
            return
        c -= freq
        if c <= 0:
            pair_counts.pop(p, None)
            where.pop(p, None)
        else:
            pair_counts[p] = c

    merges: list[tuple[int, int]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        new_id = BYTE_VOCAB + len(merges)
        merges.append(best)
        touched = where.pop(best, set())
        pair_counts.pop(best, None)
        for wi in touched:
            syms, freq = words[wi]
            # remove the word's old pair contributions, apply the
            # merge, add the new ones — only changed neighborhoods
            # shift, but re-walking this word keeps the bookkeeping
            # simple and exact (words are short)
            for i in range(len(syms) - 1):
                _sub((syms[i], syms[i + 1]), freq, wi)
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    syms[i : i + 2] = [new_id]
                else:
                    i += 1
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + freq
                where.setdefault(p, set()).add(wi)
    return merges


# --------------------------------------------------------------- encode


def _ranks(merges: list[tuple[int, int]]) -> dict[tuple[int, int], int]:
    ranks = {}
    for r, pair in enumerate(merges):
        p = (int(pair[0]), int(pair[1]))
        if p in ranks:
            raise ValueError(f"duplicate merge pair {p} at ranks {ranks[p]} and {r}")
        ranks[p] = r
    return ranks


def encode_word(word: str, ranks: dict[tuple[int, int], int]) -> list[int]:
    """Encode ONE word: UTF-8 bytes, then repeatedly merge the
    lowest-rank adjacent pair (leftmost on rank ties) — the exact
    GPT-2 application order, so learn->encode round-trips the
    training corpus' own words to their fully-merged forms."""
    syms = list(word.encode("utf-8"))
    while len(syms) >= 2:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [BYTE_VOCAB + best_rank]
    return syms


def _encoded_words(
    spark_words: DataFrame, merges: list[tuple[int, int]]
) -> DataFrame:
    """(word) -> (word, ids array<int>) via mapInArrow: Arrow-batched
    Python over DISTINCT words only. The merge table rides the closure
    (it is vocab-sized: <= ~100k pairs, a few MB)."""
    import pyarrow as pa

    ranks = _ranks(merges)
    out_schema = T.StructType(
        [
            T.StructField("word", T.StringType(), False),
            T.StructField("ids", T.ArrayType(T.IntegerType(), False), False),
        ]
    )

    def enc(batches: Iterator) -> Iterator:
        arrow = pa.schema(
            [("word", pa.string()), ("ids", pa.list_(pa.int32()))]
        )
        for batch in batches:
            ws = batch.column(0).to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ws, type=pa.string()),
                    pa.array([encode_word(w, ranks) for w in ws], type=pa.list_(pa.int32())),
                ],
                schema=arrow,
            )

    return spark_words.select("word").mapInArrow(enc, out_schema)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, int]],
    text: str = "text",
    tokens_col: str = "tokens",
    n_tok_col: str | None = "n_tok",
    broadcast_words: bool | None = None,
    strategy: str = "partition",
    cache_words: int = 1 << 20,
) -> DataFrame:
    """Corpus-scale encode: adds ``tokens array<int>`` (and ``n_tok``)
    to ``docs``.

    ``strategy``: ``"partition"`` (default) — zero-shuffle cached
    mapInArrow over the documents (see module docstring;
    ``cache_words`` bounds the per-task word cache); ``"join"`` —
    distributed explode/join/reassemble paying Python only per global
    distinct word.

    Empty/NULL text encodes to an empty array. The join path groups by
    the non-text columns to reassemble, so under it ``docs`` must be
    row-unique on those (a ``doc_id`` satisfies this); the partition
    path is a pure map with no such requirement — both paths drop
    ``text`` and produce identical schemas."""
    if not merges:
        raise ValueError("empty merge list — learn_bpe first")
    if strategy not in ("partition", "join"):
        raise ValueError(f"strategy {strategy!r} (expected partition|join)")
    if strategy == "partition":
        return _bpe_encode_partition(
            docs, merges, text, tokens_col, n_tok_col, cache_words
        )
    id_cols = [c for c in docs.columns if c != text]
    exploded = docs.select(
        *id_cols,
        F.posexplode_outer(
            F.filter(F.split(F.col(text), r"\s+"), lambda w: w != "")
        ).alias("_pos", "word"),
    )
    words = exploded.select("word").where(F.col("word").isNotNull()).distinct()
    enc = _encoded_words(words, merges)
    if broadcast_words:
        enc = F.broadcast(enc)
    joined = exploded.join(enc, "word", "left")
    # sort_array over struct(pos, ids) restores word order; flatten
    # concatenates word ids. NULL-pos rows (empty docs, from the
    # _outer explode) are dropped via the when() — collect_list skips
    # NULL elements but would keep a struct(NULL, NULL) — so an empty
    # doc aggregates an empty list -> flatten -> empty token array.
    reassembled = (
        joined.groupBy(*id_cols)
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("_pos").isNotNull(),
                                F.struct(F.col("_pos"), F.col("ids")),
                            )
                        )
                    ),
                    lambda s: s["ids"],
                )
            ).alias(tokens_col)
        )
    )
    out = reassembled
    if n_tok_col:
        out = out.withColumn(n_tok_col, F.size(F.col(tokens_col)))
    return out


def _bpe_encode_partition(
    docs: DataFrame,
    merges: list[tuple[int, int]],
    text: str,
    tokens_col: str,
    n_tok_col: str | None,
    cache_words: int,
) -> DataFrame:
    """Zero-shuffle encode: one Arrow-batched pass over the documents,
    word->ids cached per task (cleared when it exceeds
    ``cache_words`` — a hard memory bound; zipfian text keeps the hit
    rate high regardless). Words split on exactly Java's ``\\s`` class
    ([ \\t\\n\\x0b\\f\\r] — NOT Python's unicode-aware ``str.split``,
    which also breaks on NBSP etc.), so the word stream is
    byte-identical to the join path's ``F.split(\\s+)`` for any
    input."""
    import re

    import pyarrow as pa

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    ranks = _ranks(merges)
    keep = [f for f in docs.schema.fields if f.name != text]
    out_schema = T.StructType(
        keep + [T.StructField(tokens_col, T.ArrayType(T.IntegerType(), False), False)]
    )

    def enc(batches: Iterator) -> Iterator:
        cache: dict[str, list[int]] = {}
        for batch in batches:
            texts = batch.column(batch.schema.names.index(text)).to_pylist()
            ids_col = []
            for t in texts:
                out: list[int] = []
                for w in ws.split(t or ""):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        if len(cache) >= cache_words:
                            cache.clear()
                        got = encode_word(w, ranks)
                        cache[w] = got
                    out.extend(got)
                ids_col.append(out)
            cols = [
                batch.column(batch.schema.names.index(f.name)) for f in keep
            ]
            cols.append(pa.array(ids_col, type=pa.list_(pa.int32())))
            yield pa.RecordBatch.from_arrays(
                cols, names=[f.name for f in keep] + [tokens_col]
            )

    out = docs.mapInArrow(enc, out_schema)
    if n_tok_col:
        out = out.withColumn(n_tok_col, F.size(F.col(tokens_col)))
    return out


# --------------------------------------------------------------- decode


def merges_to_vocab(merges: list[tuple[int, int]]) -> dict[int, bytes]:
    """token id -> byte string (ids 0..255 are raw bytes; merge ids
    expand recursively — ranks only reference earlier ids, so one
    forward pass resolves)."""
    vocab = {i: bytes([i]) for i in range(BYTE_VOCAB)}
    for r, (a, b) in enumerate(merges):
        tid = BYTE_VOCAB + r
        if a >= tid or b >= tid:
            raise ValueError(f"merge {r} references a later id ({a}, {b})")
        vocab[tid] = vocab[a] + vocab[b]
    return vocab


def bpe_decode(
    df: DataFrame,
    merges: list[tuple[int, int]],
    tokens_col: str = "tokens",
    out_col: str = "text_decoded",
) -> DataFrame:
    """Decode ``tokens`` back to text, pure JVM: one dense id->piece
    array literal (vocab-sized, same trick as vocabmap's dense LUT),
    ``transform`` + ``concat_ws`` — map-only, no Python.

    Byte-level pieces can split multibyte UTF-8 characters, so the LUT
    carries each piece under the bijective latin-1 byte<->char map
    (every byte -> U+00..U+FF — always a valid JVM string; the GPT-2
    trick, minus the printable-remap). ASCII text round-trips
    verbatim; for arbitrary unicode, ``out.encode("latin-1")
    .decode("utf-8")`` recovers the exact bytes — pinned by the
    round-trip test. Word boundaries are not recoverable from ids
    under whitespace pre-tokenization, so pieces concatenate with no
    separator. Out-of-vocab ids (negative, or beyond the merge table)
    decode to nothing — ``concat_ws`` skips the NULL pieces — rather
    than crashing the job or aliasing into end-of-LUT pieces."""
    vocab = merges_to_vocab(merges)
    lut = F.lit([vocab[i].decode("latin-1") for i in range(len(vocab))])
    # negative ids guarded like vocabmap's dense LUT: try_element_at
    # raises on index 0 (ANSI) and indexes from the END for negatives
    # — a corrupt -2 would silently decode to the last merge piece
    pieces = F.transform(
        F.col(tokens_col),
        lambda t: F.when(t >= 0, F.try_element_at(lut, t + 1)),
    )
    return df.withColumn(out_col, F.concat_ws("", pieces))


def decode_tokens_py(ids: list[int], merges: list[tuple[int, int]]) -> str:
    """Driver-side exact decode (tests): ids -> UTF-8 text."""
    vocab = merges_to_vocab(merges)
    return b"".join(vocab[i] for i in ids).decode("utf-8")
