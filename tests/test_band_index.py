"""Posting-list band index (operators/dedup_index.py, indexed path).

Load-bearing properties:
1. changelog-maintained posting lists equal a full rebuild from the
   signature table after any insert/update/delete mix;
2. the indexed probe returns the SAME candidate pairs as the
   full-scan probe, while reading only the probed buckets' files;
3. the two-table sync is crash-safe: a band-committed / sig-uncommitted
   interruption converges on the next call, and replay is a no-op;
4. hot bands cap at POSTING_CAP with a sticky overflow flag and
   graceful (sample-bounded) recall;
5. signatures work over pre-tokenized array<int> docs (the
   north-star payload) identically to text docs.
"""

import os

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from dexspark.lake import LakeTable
from dexspark.operators import dedup_index as DI
from dexspark.operators.dedup_index import (
    band_index_schema,
    band_keys,
    gate_batch,
    index_schema,
    minhash_signatures,
    near_dup_candidates,
    near_dup_candidates_indexed,
    rebuild_band_index,
    sync_band_index,
    sync_dedup_index,
    sync_indexes_from_table,
)

SRC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

_WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima".split()


def _text(seed, n=12):
    return " ".join(_WORDS[(seed * 7 + i * (seed + 3)) % len(_WORDS)] for i in range(n))


def _docs(spark, ids):
    return spark.createDataFrame([(i, _text(i)) for i in ids], SRC_SCHEMA)


@pytest.fixture()
def tables(spark, tmp_path):
    src = LakeTable.create(
        spark, os.path.join(str(tmp_path), "src"), SRC_SCHEMA,
        key="doc_id", num_buckets=4,
    )
    sig = LakeTable.create(
        spark, os.path.join(str(tmp_path), "sig"), index_schema(),
        key="doc_id", num_buckets=4,
    )
    band = LakeTable.create(
        spark, os.path.join(str(tmp_path), "band"), band_index_schema(),
        key="bkey", num_buckets=4,
    )
    return src, sig, band


def _postings_map(band_table):
    return {
        r["bkey"]: (tuple(r["postings"]), r["overflowed"])
        for r in band_table.read().collect()
    }


def _rebuilt_map(spark, tmp_path, sig_table, name="rb"):
    fresh = LakeTable.create(
        spark, os.path.join(str(tmp_path), name), band_index_schema(),
        key="bkey", num_buckets=4,
    )
    rebuild_band_index(fresh, sig_table)
    return _postings_map(fresh)


def test_sync_equals_rebuild_through_insert_update_delete(spark, tmp_path, tables):
    src, sig, band = tables
    src.overwrite(_docs(spark, range(8)))
    sync_indexes_from_table(src, sig, band)
    assert _postings_map(band) == _rebuilt_map(spark, tmp_path, sig, "rb1")

    # update doc 3 (new text -> new bands), delete doc 5, insert 20/21
    src.merge(
        spark.createDataFrame([(3, _text(33)), (20, _text(20)), (21, _text(21))], SRC_SCHEMA),
        delete_keys=spark.createDataFrame([(5,)], "doc_id: long"),
        mode="mor",
    )
    sync_indexes_from_table(src, sig, band)
    assert _postings_map(band) == _rebuilt_map(spark, tmp_path, sig, "rb2")
    # doc 5 is in no posting list, doc 3's new bands are present
    all_docs = {d for ps, _ in _postings_map(band).values() for d in ps}
    assert 5 not in all_docs and 3 in all_docs and 20 in all_docs


def test_indexed_probe_matches_full_scan(spark, tables):
    src, sig, band = tables
    src.overwrite(_docs(spark, range(10)))
    sync_indexes_from_table(src, sig, band)
    # batch: 100 near-dups 0 (same construction as test_dedup_index),
    # 101 unrelated, plus an exact re-send of doc 2 under a new id
    batch = spark.createDataFrame(
        [(100, _text(0)), (101, " ".join(f"word{i}" for i in range(12))), (102, _text(2))],
        SRC_SCHEMA,
    )
    full = {
        (r["batch_doc_id"], r["corpus_doc_id"], r["n_shared_bands"])
        for r in near_dup_candidates(sig, batch).collect()
    }
    idx = {
        (r["batch_doc_id"], r["corpus_doc_id"], r["n_shared_bands"])
        for r in near_dup_candidates_indexed(band, batch).collect()
    }
    assert idx == full and {(p[0], p[1]) for p in idx} >= {(100, 0), (102, 2)}


def test_indexed_probe_prunes_buckets(spark, tables):
    src, sig, band = tables
    src.overwrite(_docs(spark, range(40)))
    sync_indexes_from_table(src, sig, band)
    band.compact()
    total_files = sum(len(fs) for fs in band.manifest()["buckets"].values())
    batch = spark.createDataFrame([(100, _text(0))], SRC_SCHEMA)
    df = near_dup_candidates_indexed(band, batch)
    # one doc -> 4 band keys -> at most 4 of the posting table's
    # buckets are opened
    assert 0 < len(df.inputFiles()) < total_files


def test_gate_batch_band_table_path(spark, tables):
    src, sig, band = tables
    src.overwrite(_docs(spark, range(10)))
    sync_indexes_from_table(src, sig, band)
    batch = spark.createDataFrame(
        [(100, _text(0)), (101, " ".join(f"word{i}" for i in range(12)))], SRC_SCHEMA
    )
    novel, pairs = gate_batch(sig, batch, band_table=band)
    assert {r["doc_id"] for r in novel.collect()} == {101}
    assert {(r["batch_doc_id"], r["corpus_doc_id"]) for r in pairs.collect()} == {(100, 0)}


def test_crash_between_band_and_sig_commit_converges(spark, tmp_path, tables):
    src, sig, band = tables
    src.overwrite(_docs(spark, range(6)))
    sync_indexes_from_table(src, sig, band)
    src.merge(spark.createDataFrame([(6, _text(6)), (0, _text(40))], SRC_SCHEMA), mode="mor")
    # simulate the crash: band fold committed, signature fold lost
    cur = src.current_version()
    b = max(band.epoch_state()[0], 0)
    sync_band_index(band, sig, src.changes(b, cur), epochs=list(range(b + 1, cur + 1)))
    assert max(band.epoch_state()[0], 0) > max(sig.epoch_state()[0], 0)
    # resume: completes the sig fold, converges both to rebuild state
    info = sync_indexes_from_table(src, sig, band)
    assert info["applied"] is True
    assert _postings_map(band) == _rebuilt_map(spark, tmp_path, sig, "rbc")
    # and the replayed call is a structured no-op
    v_sig, v_band = sig.current_version(), band.current_version()
    info2 = sync_indexes_from_table(src, sig, band)
    assert info2["applied"] is False
    assert (sig.current_version(), band.current_version()) == (v_sig, v_band)


def test_posting_cap_overflow_sticky(spark, tmp_path, tables, monkeypatch):
    src, sig, band = tables
    monkeypatch.setattr(DI, "POSTING_CAP", 3)
    # 6 identical docs -> every band key holds all 6 ids, cap 3
    same = spark.createDataFrame([(i, _text(7)) for i in range(6)], SRC_SCHEMA)
    src.overwrite(same)
    sync_indexes_from_table(src, sig, band)
    pm = _postings_map(band)
    assert pm and all(len(ps) == 3 and of for ps, of in pm.values())
    assert all(ps == (0, 1, 2) for ps, _ in pm.values())  # deterministic keep-smallest
    # deleting a retained doc keeps the flag sticky
    src.merge(
        spark.createDataFrame([], SRC_SCHEMA),
        delete_keys=spark.createDataFrame([(1,)], "doc_id: long"),
        mode="mor",
    )
    sync_indexes_from_table(src, sig, band)
    pm = _postings_map(band)
    assert all(of for _, of in pm.values())
    assert all(1 not in ps for ps, _ in pm.values())
    # gate still rejects a near-dup via the retained sample
    batch = spark.createDataFrame([(100, _text(7))], SRC_SCHEMA)
    novel, pairs = gate_batch(sig, batch, band_table=band)
    assert novel.count() == 0 and pairs.count() > 0
    # rebuild resets overflow bookkeeping against current membership
    rebuild_band_index(band, sig)
    pm = _postings_map(band)
    assert all(len(ps) == 3 and of for ps, of in pm.values())


def test_token_array_signatures(spark, tmp_path):
    # north-star payload: (doc_id, tokens array<int>) — shingles are
    # token 4-grams; near-dup = shared token n-gram structure
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        ]
    )
    # one changed token in a 40-token doc: shingle Jaccard ~0.8, so
    # >= 4 of 8 shared minhashes is a robust expectation under any
    # well-mixed hash scheme (was 20 tokens / J~0.42, which only
    # passed by md5-specific luck)
    base = list(range(100, 140))
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base[:10] + [999] + base[11:]),  # near-dup of 0
            (2, list(range(500, 540))),          # unrelated
            (3, [7, 8]),                         # shorter than shingle width
        ],
        schema,
    )
    sig = minhash_signatures(docs, text="tokens")
    rows = {r["doc_id"]: tuple(r[f"h{k}"] for k in range(8)) for r in sig.collect()}
    assert len(rows) == 4 and rows[3] == (None,) * 8
    shared01 = sum(a == b for a, b in zip(rows[0], rows[1]))
    shared02 = sum(a == b for a, b in zip(rows[0], rows[2]))
    assert shared01 > shared02 and shared01 >= 4
    # and the whole index pipeline runs over the token column
    sigt = LakeTable.create(
        spark, os.path.join(str(tmp_path), "tsig"), index_schema(),
        key="doc_id", num_buckets=2,
    )
    sync_dedup_index(
        sigt,
        docs.withColumn("_change_type", F.lit("upsert"))
        .withColumn("_commit_version", F.lit(1)),
        text="tokens",
    )
    pairs = near_dup_candidates(sigt, docs.filter("doc_id = 1"), text="tokens")
    assert (1, 0) in {(r["batch_doc_id"], r["corpus_doc_id"]) for r in pairs.collect()}


def test_sync_survives_source_rebucket_inside_window(spark, tmp_path, tables):
    """A rebucket of the SOURCE table landing inside a sync window
    (and between windows) must not confuse the changelog-driven index
    folds — changes() spans the migration commit, and the index
    tables keep their own bucket space."""
    src, sig, band = tables
    src.overwrite(_docs(spark, range(8)))
    sync_indexes_from_table(src, sig, band)

    # window spanning: merge -> rebucket -> merge, ONE sync after
    src.merge(spark.createDataFrame([(20, _text(20))], SRC_SCHEMA), mode="mor")
    src.rebucket(8)
    src.merge(
        spark.createDataFrame([(21, _text(21)), (3, _text(33))], SRC_SCHEMA),
        delete_keys=spark.createDataFrame([(5,)], "doc_id: long"),
        mode="mor",
    )
    sync_indexes_from_table(src, sig, band)
    assert _postings_map(band) == _rebuilt_map(spark, tmp_path, sig, "rb-rk")
    all_docs = {d for ps, _ in _postings_map(band).values() for d in ps}
    assert {20, 21, 3} <= all_docs and 5 not in all_docs

    # the signature index equals a fresh re-signing of current state
    got = {
        (r["doc_id"], tuple(r[f"h{k}"] for k in range(8)))
        for r in sig.read().collect()
    }
    want = {
        (r["doc_id"], tuple(r[f"h{k}"] for k in range(8)))
        for r in minhash_signatures(src.read()).collect()
    }
    assert got == want
