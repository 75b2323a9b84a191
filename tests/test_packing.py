"""Sequence shaping: chunk_documents (JVM windows) and pack_sequences
(concat-and-chunk packing via mapInArrow)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dexspark.operators.packing import chunk_documents, pack_sequences

EOS = 50256
PAD = 0


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


# ------------------------------------------------------------- chunking


def test_chunk_disjoint_and_tail(spark):
    df = _docs(spark, [("d1", list(range(7)), 7, "web"), ("d2", [9], 1, "code")])
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["tokens"], r["n_tok"])
        for r in chunk_documents(df, max_len=3).collect()
    }
    assert got == {
        ("d1", 0): ([0, 1, 2], 3),
        ("d1", 1): ([3, 4, 5], 3),
        ("d1", 2): ([6], 1),
        ("d2", 0): ([9], 1),
    }


def test_chunk_overlap_stride(spark):
    df = _docs(spark, [("d1", list(range(5)), 5, "web")])
    got = [
        r["tokens"]
        for r in chunk_documents(df, max_len=3, stride=2)
        .orderBy("chunk_idx")
        .collect()
    ]
    # python convention: [tokens[s:s+3] for s in range(0, 5, 2)]
    assert got == [[0, 1, 2], [2, 3, 4], [4]]


def test_chunk_empty_and_null_docs(spark):
    df = _docs(
        spark,
        [("e", [], 0, "web"), ("n", None, None, "web"), ("d", [1], 1, "web")],
    )
    got = chunk_documents(df, max_len=4).collect()
    assert [r["doc_id"] for r in got] == ["d"]


def test_chunk_passes_through_columns_and_is_jvm_only(spark):
    df = _docs(spark, [("d1", [1, 2, 3], 3, "books")])
    out = chunk_documents(df, max_len=2)
    assert set(out.columns) == {"doc_id", "source", "chunk_idx", "tokens", "n_tok"}
    assert out.filter(F.col("source") == "books").count() == 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure JVM: no Arrow/pickle eval nodes


# -------------------------------------------------------------- packing


def _pack_rows(spark, rows, seq_len, parts=1, **kw):
    df = _docs(spark, rows).repartition(parts)
    return pack_sequences(df, seq_len, eos_id=EOS, pad_id=PAD, **kw).collect()


def test_pack_single_partition_exact(spark):
    rows = [
        ("a", [1, 2, 3], 3, "web"),
        ("b", [4, 5], 2, "web"),
        ("c", [6, 7, 8, 9], 4, "web"),
    ]
    # stream (sorted by doc_id): 1 2 3 E 4 5 E 6 7 8 9 E  (12 tokens)
    got = sorted(_pack_rows(spark, rows, seq_len=4), key=lambda r: r["pack_id"])
    assert [r["tokens"] for r in got] == [
        [1, 2, 3, EOS],
        [4, 5, EOS, 6],
        [7, 8, 9, EOS],
    ]
    assert [r["n_real"] for r in got] == [4, 4, 4]
    assert [r["docs"] for r in got] == [["a"], ["b", "c"], ["c"]]


def test_pack_pads_final_remainder(spark):
    got = _pack_rows(spark, [("a", [1, 2], 2, "web")], seq_len=5)
    assert len(got) == 1
    r = got[0]
    assert r["tokens"] == [1, 2, EOS, PAD, PAD]
    assert r["n_real"] == 3 and r["docs"] == ["a"]


def test_pack_long_doc_spans_packs(spark):
    got = sorted(
        _pack_rows(spark, [("a", list(range(1, 10)), 9, "web")], seq_len=4),
        key=lambda r: r["pack_id"],
    )
    assert [r["tokens"] for r in got] == [
        [1, 2, 3, 4],
        [5, 6, 7, 8],
        [9, EOS, PAD, PAD],
    ]
    assert [r["docs"] for r in got] == [["a"], ["a"], ["a"]]
    assert got[-1]["n_real"] == 2


def test_pack_empty_doc_contributes_eos_boundary(spark):
    rows = [("a", [1], 1, "web"), ("b", [], 0, "web"), ("c", None, None, "web")]
    got = _pack_rows(spark, rows, seq_len=8)
    assert len(got) == 1
    assert got[0]["tokens"] == [1, EOS, EOS, EOS, PAD, PAD, PAD, PAD]
    assert got[0]["docs"] == ["a", "b", "c"]


def test_pack_token_conservation_multi_partition(spark):
    """Invariant at scale shape: per partition, concatenating the
    packs' real tokens reproduces doc0+EOS+doc1+EOS+... exactly; all
    packs are exactly seq_len; pack_ids unique."""
    rng = np.random.default_rng(7)
    rows = [
        (f"d{i:04d}", [int(t) for t in rng.integers(1, 1000, rng.integers(0, 40))],
         0, "web")
        for i in range(300)
    ]
    rows = [(d, t, len(t), s) for d, t, _, s in rows]
    seq_len = 64
    df = _docs(spark, rows).repartition(8, "doc_id")
    packs = pack_sequences(df, seq_len, eos_id=EOS, pad_id=PAD).collect()

    assert all(len(r["tokens"]) == seq_len for r in packs)
    ids = [r["pack_id"] for r in packs]
    assert len(ids) == len(set(ids))

    # rebuild each partition's expected stream: group packs by the
    # partition prefix of pack_id, order by seq
    by_part: dict[str, list] = {}
    for r in packs:
        p, s = r["pack_id"].rsplit("-", 1)
        by_part.setdefault(p, []).append((int(s), r))
    # which docs landed in which partition (same repartition + sort)
    doc_part = {
        r["doc_id"]: r["p"]
        for r in df.withColumn("p", F.spark_partition_id()).select(
            "doc_id", "p"
        ).collect()
    }
    tok = dict((d, t) for d, t, _, _ in rows)
    for p, members in by_part.items():
        members.sort()
        stream = []
        for d in sorted(k for k, v in doc_part.items() if str(v) == p):
            stream.extend((tok[d] or []) + [EOS])
        got_stream = []
        for _, r in members:
            got_stream.extend(r["tokens"][: r["n_real"]])
        assert got_stream == stream, f"partition {p} stream mismatch"
    # every partition with docs produced packs
    assert set(by_part) == {str(v) for v in doc_part.values()}


def test_pack_rejects_bad_seq_len(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [("a", [1], 1, "w")]), 1, eos_id=EOS)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [("a", [1], 1, "w")]), 0)


def test_cli_pack_corpus(spark, tmp_warehouse, capsys):
    """--pack-corpus writes exact-seq_len training rows from a table;
    token conservation vs the table contents."""
    import json as _json
    import os

    from dexspark import cli
    from dexspark.lake import LakeTable
    from dexspark.schema import sequences_schema

    t = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "t"), sequences_schema(),
        key="doc_id", num_buckets=2,
    )
    rows = [(f"d{i}", list(range(i % 7 + 1)), i % 7 + 1, "web") for i in range(50)]
    t.overwrite(spark.createDataFrame(rows, schema=sequences_schema()))

    out_dir = os.path.join(tmp_warehouse, "packed")
    rc = cli.main(
        ["--table", t.root, "--pack-corpus", out_dir, "--seq-len", "16",
         "--eos-id", "99", "--pad-id", "0"]
    )
    assert rc == 0
    info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    packed = spark.read.parquet(out_dir)
    assert info["packs"] == packed.count() and info["seq_len"] == 16
    got = packed.collect()
    assert all(len(r["tokens"]) == 16 for r in got)
    n_in = sum(len(tks) + 1 for _, tks, _, _ in rows)  # +EOS per doc
    assert sum(r["n_real"] for r in got) == n_in
