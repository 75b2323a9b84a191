"""CDC-maintained near-duplicate index (operators/dedup_index.py).

Load-bearing properties:
1. the index maintained ONLY through the source table's changelog
   equals a fresh full re-signing of the current source state after
   every refresh (upserts re-signed, deletes dropped);
2. the refresh cursor is exactly-once (replaying a synced window is a
   structured no-op);
3. the ingest gate rejects near-duplicates of INDEXED docs and passes
   novel docs, with (batch, corpus) lineage pairs;
4. the probe plan broadcasts the batch side — the corpus index is
   never shuffled (the 100-TB property).

Reference anchor: per-event existence/dup gating in
FnDecompressor.kt:98-101; this is the corpus-level analogue.
"""

import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from dexspark.lake import LakeTable
from dexspark.operators.dedup_index import (
    band_keys,
    gate_batch,
    index_schema,
    minhash_signatures,
    near_dup_candidates,
    sync_dedup_index_from_table,
)

SRC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

# deterministic corpus: docs 0..9 distinct, 100 is a near-dup of 0
# (one word changed in 12), 101 is unrelated, 102 is short (< shingle)
_WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima".split()


def _text(seed, n=12):
    return " ".join(_WORDS[(seed * 7 + i * (seed + 3)) % len(_WORDS)] for i in range(n))


def _docs(spark, ids):
    return spark.createDataFrame([(i, _text(i)) for i in ids], SRC_SCHEMA)


@pytest.fixture()
def source(spark, tmp_path):
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "src"), SRC_SCHEMA,
        key="doc_id", num_buckets=4,
    )
    t.overwrite(_docs(spark, range(10)))
    return t


@pytest.fixture()
def index(spark, tmp_path):
    return LakeTable.create(
        spark, os.path.join(str(tmp_path), "idx"), index_schema(),
        key="doc_id", num_buckets=4,
    )


def _sigset(df):
    return {
        (r["doc_id"], tuple(r[f"h{k}"] for k in range(8)))
        for r in df.collect()
    }


def test_signatures_keep_short_docs_as_null_rows(spark):
    docs = spark.createDataFrame(
        [(1, _text(1)), (2, "too short")], SRC_SCHEMA
    )
    sig = minhash_signatures(docs)
    rows = {r["doc_id"]: r for r in sig.collect()}
    assert set(rows) == {1, 2}
    assert all(rows[1][f"h{k}"] is not None for k in range(8))
    assert all(rows[2][f"h{k}"] is None for k in range(8))
    # band explode drops null-signature docs (exact dedup's job)
    assert {r["doc_id"] for r in band_keys(sig).collect()} == {1}
    # keep_short=False skips the anti-join entirely
    assert {r["doc_id"] for r in minhash_signatures(docs, keep_short=False).collect()} == {1}


_PIN_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "a b c d"),                      # exactly SHINGLE_N words
    (3, "x y z"),                        # short: no shingles
    (4, "rep rep rep rep rep rep rep"),  # duplicate shingles
]
_PIN_TOKS = [(10, list(range(50))), (11, [1, 2, 3]), (12, [7] * 20)]


def _pin_frames(spark):
    return (
        spark.createDataFrame(_PIN_DOCS, SRC_SCHEMA),
        spark.createDataFrame(_PIN_TOKS, "doc_id long, text array<int>"),
    )


def test_md5_hof_signatures_match_exploded_reference(spark):
    """The map-only md5 HOF formulation is byte-identical to the
    original r2 explode+groupBy minhash (min over the same shingle
    multiset) — over strings, token arrays, dup-heavy docs, and
    width-edge docs. This is the scheme the DuckDB oracle pins."""
    from pyspark.sql import functions as F
    from dexspark.operators.dedup_index import MINHASH_K, SHINGLE_N
    from dexspark.operators.decontaminate import ngrams

    def exploded_reference(frame):
        sh = ngrams(frame, n=SHINGLE_N).withColumnRenamed("gram", "shingle")
        proj = sh.select(
            "doc_id",
            F.md5(F.concat(F.lit("0"), F.col("shingle")).cast("binary")).alias("_m0"),
            F.md5(F.concat(F.lit("1"), F.col("shingle")).cast("binary")).alias("_m1"),
        )
        return proj.groupBy("doc_id").agg(
            *[
                F.min(F.substring(F.col(f"_m{k // 4}"), 1 + 8 * (k % 4), 8)).alias(
                    f"h{k}"
                )
                for k in range(MINHASH_K)
            ]
        )

    for frame in _pin_frames(spark):
        got = _sigset(minhash_signatures(frame, keep_short=False, scheme="md5"))
        want = _sigset(exploded_reference(frame))
        assert got == want and got  # non-empty, byte-identical


def test_xxhash_hof_signatures_match_exploded_reference(spark):
    """The engine-default xxhash64 scheme is byte-identical to an
    explode+groupBy reference: base = xxhash64 over each raw token
    slice, h_k = hex of min over xxhash64(k, base)."""
    from pyspark.sql import functions as F
    from dexspark.operators.dedup_index import (
        MINHASH_K,
        SHINGLE_N,
        _shingle_parts,
    )

    def exploded_reference(frame):
        words, idx = _shingle_parts(frame, "text", as_strings=False)
        base = frame.select(
            "doc_id",
            F.explode(
                F.transform(
                    idx, lambda i: F.xxhash64(F.slice(words, i, SHINGLE_N))
                )
            ).alias("_bh"),
        )
        return base.groupBy("doc_id").agg(
            *[
                F.hex(F.min(F.xxhash64(F.lit(k), F.col("_bh")))).alias(f"h{k}")
                for k in range(MINHASH_K)
            ]
        )

    for frame in _pin_frames(spark):
        got = _sigset(minhash_signatures(frame, keep_short=False))
        want = _sigset(exploded_reference(frame))
        assert got == want and got


def test_sync_tracks_source_changes_exactly(spark, source, index):
    def rebuild():
        return _sigset(minhash_signatures(source.read()))

    info = sync_dedup_index_from_table(source, index)
    assert info["applied"] is True
    assert _sigset(index.read()) == rebuild()

    # exactly-once: replay of a synced window is a structured no-op
    v_idx = index.current_version()
    assert sync_dedup_index_from_table(source, index) == {
        "synced_through": source.current_version(), "applied": False,
    }
    assert index.current_version() == v_idx

    # update 2 docs (new text -> new signature), insert 2, delete 2
    upd = spark.createDataFrame(
        [(3, _text(33)), (4, _text(44))], SRC_SCHEMA
    )
    source.merge(upd.unionByName(_docs(spark, [20, 21])), epochs=[1])
    source.merge(
        spark.createDataFrame([], SRC_SCHEMA),
        delete_keys=spark.createDataFrame([(8,), (9,)], "doc_id long"),
        epochs=[2],
        mode="mor",
    )
    sync_dedup_index_from_table(source, index)
    assert _sigset(index.read()) == rebuild()


def test_sync_upsert_then_delete_same_window_lands_deleted(spark, source, index):
    sync_dedup_index_from_table(source, index)
    source.merge(spark.createDataFrame([(5, _text(55))], SRC_SCHEMA), epochs=[1])
    source.merge(
        spark.createDataFrame([], SRC_SCHEMA),
        delete_keys=spark.createDataFrame([(5,)], "doc_id long"),
        epochs=[2],
    )
    sync_dedup_index_from_table(source, index)
    assert index.read().filter(F.col("doc_id") == 5).count() == 0
    assert _sigset(index.read()) == _sigset(minhash_signatures(source.read()))


def test_gate_batch_rejects_near_dups_passes_novel(spark, source, index):
    sync_dedup_index_from_table(source, index)
    near = _text(0).replace("alpha", "zulu", 1)  # 1 of 12 words changed
    batch = spark.createDataFrame(
        [
            (100, near),
            # disjoint vocabulary -> no shingle can match the corpus
            (101, " ".join(f"word{i}" for i in range(12))),
            (102, "tiny doc"),
        ],
        SRC_SCHEMA,
    )
    novel, pairs = gate_batch(index, batch)
    got_pairs = {(r["batch_doc_id"], r["corpus_doc_id"]) for r in pairs.collect()}
    assert (100, 0) in got_pairs  # lineage: which corpus doc shadowed it
    assert all(b != 100 or c == 0 for b, c in got_pairs)
    novel_ids = {r["doc_id"] for r in novel.collect()}
    assert 100 not in novel_ids
    assert {101, 102} <= novel_ids


def test_gate_excludes_self_on_update_recheck(spark, source, index):
    sync_dedup_index_from_table(source, index)
    # re-ingesting doc 0 verbatim under the SAME id is an update, not a dup
    batch = spark.createDataFrame([(0, _text(0))], SRC_SCHEMA)
    pairs = near_dup_candidates(index, batch)
    assert pairs.filter(
        (F.col("batch_doc_id") == 0) & (F.col("corpus_doc_id") == 0)
    ).count() == 0


def test_probe_plan_broadcasts_batch_never_shuffles_corpus(spark, source, index):
    sync_dedup_index_from_table(source, index)
    # steady state: a compacted index serves probes as a map-only
    # scan (a MOR tail would add only its bounded per-bucket
    # reconstruction, never a corpus-wide band shuffle)
    index.compact()
    batch = spark.createDataFrame([(100, _text(2))], SRC_SCHEMA)
    plan = near_dup_candidates(index, batch)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the corpus scan side must reach the join without an exchange:
    # the only allowed hash exchanges are the batch-side signature
    # aggregation (tiny, feeds the broadcast) and the final
    # n_shared_bands count aggregation
    shuffles = plan.count("Exchange hashpartitioning")
    assert shuffles <= 2, plan
