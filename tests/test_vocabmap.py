"""Vocab remap (operators/vocabmap.py) and the shuffle-free
LakeTable.rewrite_payload migration commit."""

import os

import pytest
from pyspark.sql import functions as F

from dexspark.operators.vocabmap import (
    remap_exprs,
    remap_tokens,
    remap_tokens_join,
)

MAP = {1: 10, 2: 20, 3: 30, 5: 50}


def _df(spark):
    rows = [
        ("d1", [1, 2, 3], 3, "a"),
        ("d2", [5, 4, 1], 3, "a"),   # 4 is OOV
        ("d3", [], 0, "b"),
        ("d4", [99, -7], 2, "b"),    # out-of-range + negative: both OOV
    ]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def _tok(df):
    return {r["doc_id"]: (r["tokens"], r["n_tok"]) for r in df.collect()}


def test_dense_unk(spark):
    got = _tok(remap_tokens(_df(spark), MAP, oov="unk", unk_id=0))
    assert got["d1"] == ([10, 20, 30], 3)
    assert got["d2"] == ([50, 0, 10], 3)
    assert got["d3"] == ([], 0)
    assert got["d4"] == ([0, 0], 2)


def test_dense_drop_recomputes_n_tok(spark):
    got = _tok(remap_tokens(_df(spark), MAP, oov="drop"))
    assert got["d2"] == ([50, 10], 2)
    assert got["d4"] == ([], 0)
    assert got["d1"] == ([10, 20, 30], 3)


def test_dense_flag(spark):
    out = remap_tokens(_df(spark), MAP, oov="flag")
    flags = {r["doc_id"]: r["has_oov"] for r in out.collect()}
    assert flags == {"d1": False, "d2": True, "d3": False, "d4": True}


def test_join_path_equals_dense(spark):
    mapping = spark.createDataFrame(
        [(k, v) for k, v in MAP.items()], "old_id int, new_id int"
    )
    for oov in ("unk", "drop"):
        dense = _tok(remap_tokens(_df(spark), MAP, oov=oov))
        joined = _tok(remap_tokens_join(_df(spark), mapping, oov=oov))
        assert joined == dense, oov


def test_dense_plan_is_shuffle_free(spark):
    plan = remap_tokens(_df(spark), MAP)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_rewrite_payload_zero_shuffle_migration(spark, tmp_warehouse):
    """In-place corpus retokenization: rewrite_payload(remap_exprs)
    rewrites every row map-only, preserves epoch state and key layout,
    and lookup()/changes() behave across the commit."""
    from dexspark.gen import base_sequences
    from dexspark.lake import LakeTable
    from dexspark.schema import sequences_schema

    root = os.path.join(tmp_warehouse, "t")
    t = LakeTable.create(
        spark, root, sequences_schema(), key="doc_id", num_buckets=4
    )
    base = base_sequences(spark, n_docs=200, max_len=12)
    t.overwrite(base, epochs=[0, 1])
    before = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    wm_before = t.epoch_state()

    # identity-shift map over the generator's full vocab
    from dexspark.config import VOCAB_SIZE

    vocab = {i: i + 1000 for i in range(0, VOCAB_SIZE)}
    info = t.rewrite_payload(remap_exprs(vocab))
    assert info["rewritten_columns"] == ["n_tok", "tokens"]

    after = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert set(after) == set(before)
    for d, toks in before.items():
        assert after[d] == [x + 1000 for x in toks]
    # epoch state preserved: the rewrite is not a change-apply
    assert t.epoch_state() == wm_before
    # point lookup still bucket-prunes correctly after the rewrite
    d0 = sorted(before)[0]
    row = t.lookup(d0).collect()
    assert len(row) == 1 and row[0]["tokens"] == [x + 1000 for x in before[d0]]
    # changes() emits the rewrite as upserts so consumers reconverge
    ch = t.changes(info["version"] - 1, info["version"])
    assert ch.filter("_change_type = 'upsert'").count() == len(before)
    # time travel still shows the pre-rewrite corpus
    old = {r["doc_id"]: r["tokens"] for r in t.read(version=info["version"] - 1).collect()}
    assert old == before


def test_rewrite_payload_rejects_key_and_unknown_columns(spark, tmp_warehouse):
    from dexspark.gen import base_sequences
    from dexspark.lake import LakeTable
    from dexspark.schema import sequences_schema

    t = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "t2"), sequences_schema(),
        key="doc_id", num_buckets=2,
    )
    t.overwrite(base_sequences(spark, n_docs=10, max_len=4))
    with pytest.raises(ValueError, match="merge key"):
        t.rewrite_payload({"doc_id": F.lit("x")})
    with pytest.raises(ValueError, match="unknown"):
        t.rewrite_payload({"nope": F.lit(1)})


def test_rewrite_payload_folds_mor_history(spark, tmp_warehouse):
    """A MOR table rewrites to a clean (mor=False) snapshot with the
    reconstructed winners transformed."""
    from dexspark.gen import base_sequences
    from dexspark.lake import LakeTable
    from dexspark.schema import sequences_schema

    t = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "t3"), sequences_schema(),
        key="doc_id", num_buckets=2,
    )
    t.overwrite(base_sequences(spark, n_docs=50, max_len=6))
    upd = base_sequences(spark, n_docs=10, max_len=6).withColumn(
        "source", F.lit("patched")
    )
    t.merge(upd, mode="mor")
    want = {r["doc_id"]: r["source"] for r in t.read().collect()}
    t.rewrite_payload({"source": F.upper("source")})
    got = {r["doc_id"]: r["source"] for r in t.read().collect()}
    assert got == {d: s.upper() for d, s in want.items()}
    assert not t.manifest().get("mor", False)


def test_cli_remap_vocab(spark, tmp_warehouse, capsys):
    """--remap-vocab MAP_JSON: in-place tokenizer migration from the
    spark-submit entrypoint."""
    import json

    from pyspark.sql import functions as F

    from dexspark import cli
    from dexspark.lake import LakeTable
    from dexspark.schema import sequences_schema

    root = os.path.join(tmp_warehouse, "seq")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=2)
    df = spark.range(20).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int"), F.lit(999)).alias("tokens"),
        F.lit(2).alias("n_tok"),
        F.lit("s").alias("source"),
    )
    t.overwrite(df)
    mp = os.path.join(tmp_warehouse, "map.json")
    with open(mp, "w") as fh:
        json.dump({str(i): i + 5 for i in range(20)}, fh)  # 999 is OOV

    rc = cli.main(["--table", root, "--remap-vocab", mp, "--remap-oov", "drop"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["remap_vocab"]["rewritten_columns"] == ["n_tok", "tokens"]

    got = {r["doc_id"]: r for r in LakeTable(spark, root).read().collect()}
    assert got["doc-3"]["tokens"] == [8] and got["doc-3"]["n_tok"] == 1


def test_rewrite_payload_stages_on_branch_then_publishes(spark, tmp_warehouse):
    """The audited migration: stage the full-corpus rewrite on a
    branch, verify it, publish — main flips to the rewritten corpus in
    one conditional put. A rewrite on MAIN under a live branch instead
    blocks that branch's publish (table-wide conflict)."""
    from dexspark.gen import base_sequences
    from dexspark.lake import ConcurrentCommitError, LakeTable
    from dexspark.schema import sequences_schema

    root = os.path.join(tmp_warehouse, "mig")
    t = LakeTable.create(
        spark, root, sequences_schema(), key="doc_id", num_buckets=4
    )
    t.overwrite(base_sequences(spark, n_docs=60, max_len=6))
    before = {r["doc_id"]: r["tokens"] for r in t.read().collect()}

    t.create_branch("mig")
    bt = LakeTable(spark, root, branch="mig")
    bt.rewrite_payload({"tokens": F.transform("tokens", lambda x: x + 1)})
    # audit: main untouched, branch rewritten
    assert {r["doc_id"]: r["tokens"] for r in t.read().collect()} == before
    staged = {r["doc_id"]: r["tokens"] for r in bt.read().collect()}
    assert staged == {d: [x + 1 for x in v] for d, v in before.items()}
    t.publish_branch("mig")
    t.drop_branch("mig")
    assert {r["doc_id"]: r["tokens"] for r in t.read().collect()} == staged

    # main-side rewrite under a live branch: the branch's publish must
    # refuse (its merge was audited against pre-rewrite state)
    t.create_branch("b2")
    bt2 = LakeTable(spark, root, branch="b2")
    bt2.merge(base_sequences(spark, n_docs=5, max_len=6))
    t.rewrite_payload({"tokens": F.transform("tokens", lambda x: x + 1)})
    with pytest.raises(ConcurrentCommitError):
        t.publish_branch("b2")
    t.drop_branch("b2")
