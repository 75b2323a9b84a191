"""Byte-level BPE: learn / encode / decode (operators/bpe.py).

Scale contract under test: the corpus encode pays Python only per
DISTINCT word (mapInArrow), reassembly is JVM-side, and the result
equals a driver-side reference encode word-for-word.
"""

import pyspark.sql.functions as F
import pytest

from dexspark.operators.bpe import (
    BYTE_VOCAB,
    bpe_decode,
    bpe_encode,
    decode_tokens_py,
    encode_word,
    learn_bpe,
    merges_to_vocab,
    word_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", "low low low lower lower lowest"),
        ("d2", "new newer newest low"),
        ("d3", ""),
        ("d4", None),
        ("d5", "  low\t\tnewer  "),  # ragged whitespace
        ("d6", "héllo wörld héllo"),  # multibyte UTF-8
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def merges(docs):
    return learn_bpe(docs, num_merges=30)


def test_learn_merges_classic_corpus(merges):
    # "low" repeats most: its byte pairs must be learned early, and the
    # fully-merged word must encode to a single token.
    ranks = {p: r for r, p in enumerate(merges)}
    assert len(merges) <= 30
    assert all(a < BYTE_VOCAB + r and b < BYTE_VOCAB + r for r, (a, b) in enumerate(merges))
    assert len(encode_word("low", ranks)) == 1


def test_learn_deterministic(docs):
    assert learn_bpe(docs, 12) == learn_bpe(docs, 12)
    # prefix property: more merges only append
    assert learn_bpe(docs, 20)[:12] == learn_bpe(docs, 12)


def test_word_counts_shape(docs):
    wc = {r["word"]: r["count"] for r in word_counts(docs).collect()}
    assert wc["low"] == 5  # d1 x3, d2 x1, d5 x1
    assert "" not in wc and None not in wc
    top2 = word_counts(docs, max_words=2).collect()
    assert [r["word"] for r in top2] == ["low", "héllo"]  # count desc, word asc


def test_encode_word_round_trip(merges):
    for w in ["low", "lowest", "héllo", "wörld", "x", "née"]:
        ids = encode_word(w, {p: r for r, p in enumerate(merges)})
        assert decode_tokens_py(ids, merges) == w
        assert all(0 <= t < BYTE_VOCAB + len(merges) for t in ids)


def test_encode_word_unseen_falls_back_to_bytes(merges):
    ranks = {p: r for r, p in enumerate(merges)}
    ids = encode_word("zzz~q", ranks)
    assert decode_tokens_py(ids, merges) == "zzz~q"


@pytest.mark.parametrize("strategy", ["partition", "join"])
def test_bpe_encode_matches_reference(spark, docs, merges, strategy):
    out = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"])
        for r in bpe_encode(docs, merges, strategy=strategy).collect()
    }
    ranks = {p: r for r, p in enumerate(merges)}
    for row in docs.collect():
        words = (row["text"] or "").split()
        want = [t for w in words for t in encode_word(w, ranks)]
        got, n = out[row["doc_id"]]
        assert got == want, (strategy, row["doc_id"])
        assert n == len(want)
    # empty + NULL text -> empty array, not NULL
    assert out["d3"] == ([], 0)
    assert out["d4"] == ([], 0)


def test_bpe_encode_paths_agree_on_exotic_whitespace(spark, merges):
    """NBSP is NOT a word break (Java \\s semantics pinned in the
    partition path); both paths agree, columns identical."""
    d = spark.createDataFrame(
        [("a", "low low low"), ("b", "low low")],
        "doc_id string, text string",
    )
    p = bpe_encode(d, merges, strategy="partition")
    j = bpe_encode(d, merges, strategy="join")
    assert p.columns == j.columns
    key = lambda rows: {r["doc_id"]: list(r["tokens"]) for r in rows}  # noqa: E731
    assert key(p.collect()) == key(j.collect())


def test_bpe_encode_cache_bound_exact(spark, docs, merges):
    """A tiny cache bound (forcing constant clears) changes nothing."""
    out = bpe_encode(docs, merges, strategy="partition", cache_words=2)
    ref = bpe_encode(docs, merges, strategy="join")
    key = lambda rows: {r["doc_id"]: list(r["tokens"]) for r in rows}  # noqa: E731
    assert key(out.collect()) == key(ref.collect())


def test_bpe_encode_extra_columns_pass_through(spark, merges):
    df = spark.createDataFrame(
        [("a", "s1", "low low")], "doc_id string, source string, text string"
    )
    row = bpe_encode(df, merges).collect()[0]
    assert row["source"] == "s1" and row["doc_id"] == "a"
    assert len(row["tokens"]) >= 1


def test_bpe_decode_jvm_round_trip(spark, docs, merges):
    enc = bpe_encode(docs, merges)
    dec = bpe_decode(enc, merges).collect()
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in dec:
        want = "".join((originals[r["doc_id"]] or "").split())
        # latin-1 carrier string -> exact original bytes (docstring contract)
        got = r["text_decoded"].encode("latin-1").decode("utf-8")
        assert got == want, r["doc_id"]


def test_plan_join_path_no_per_row_python(spark, docs, merges):
    plan = (
        bpe_encode(docs, merges, strategy="join")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan  # no row-at-a-time UDF
    # Python appears exactly as the Arrow-batched distinct-word encode
    assert plan.count("MapInArrow") == 1


def test_plan_partition_path_zero_shuffle(spark, docs, merges):
    """The default path is ONE Arrow-batched map over the documents —
    no join, no Exchange, no row-at-a-time Python anywhere."""
    plan = (
        bpe_encode(docs, merges, strategy="partition")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInArrow") == 1
    for node in ("BatchEvalPython", "Exchange", "Join"):
        assert node not in plan, node


def test_broadcast_words_hint(spark, docs, merges):
    out = bpe_encode(docs, merges, strategy="join", broadcast_words=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert out.count() == docs.count()


def test_merges_to_vocab_rejects_forward_refs():
    with pytest.raises(ValueError):
        merges_to_vocab([(300, 65)])  # references an id not yet minted


def test_empty_merges_rejected(spark, docs):
    with pytest.raises(ValueError):
        bpe_encode(docs, [])


def _naive_learn(word_freqs, num_merges):
    """Independent reference: full pair-count rescan per merge."""
    words = [(list(w.encode("utf-8")), c) for w, c in word_freqs]
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, freq in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        new_id = 256 + len(merges)
        merges.append(best)
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    syms[i : i + 2] = [new_id]
                else:
                    i += 1
    return merges


def test_incremental_learn_equals_naive(spark):
    """The inverted-index trainer must pick the EXACT same merges as a
    full-rescan reference — counts, tie-breaks and all — on randomized
    zipfian corpora including repeated-symbol words."""
    import random

    rng = random.Random(7)
    alpha = "abcdefg"
    for trial in range(4):
        vocab = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))
            for _ in range(60)
        ]
        vocab += ["aaa", "aaaa", "abab", "aabaa"]  # overlap/repeat stress
        freqs = [(w, rng.randint(1, 50)) for w in set(vocab)]
        docs = spark.createDataFrame(
            [("d", " ".join(w for w, c in freqs for _ in range(c)))],
            "doc_id string, text string",
        )
        got = learn_bpe(docs, 40)
        # learn_bpe's histogram == freqs by construction
        want = _naive_learn(sorted(freqs), 40)
        assert got == want, trial
