"""End-to-end corpus preparation (operators/corpus.py + CLI).

The composite pipeline over a crafted corpus exercising every stage:
quality gate, exact dedup, near-dup components, decontamination,
split assignment, tokenize, pack — with token conservation and
stage accounting asserted against hand-computed expectations."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dexspark.operators.corpus import (
    CorpusConfig,
    hash_tokenize,
    near_dup_representatives,
    prepare_corpus,
)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four five "
    "six seven eight nine ten eleven twelve thirteen fourteen fifteen "
    "sixteen seventeen eighteen nineteen twenty alpha2 bravo2 charlie2 "
    "delta2 echo2 foxtrot2 golf2 hotel2 india2 juliet2 kilo2 lima2 "
    "mike2 november2 oscar2"
)


def _docs(spark):
    base = _WORDS  # 65 words: passes the quality gate
    rows = [
        ("d01", base),
        ("d02", base),  # exact dup of d01 -> dropped (keep min id)
        ("d03", base + " extraword"),  # near-dup of d01 (superset shingles)
        ("d04", "too few words"),  # quality fail (min_words)
        ("d05", base.replace("alpha ", "omega ")),  # near-dup, 1 word changed
        ("d06", "completely different content " + " ".join(
            f"w{i}x unique{i}y token{i}z" for i in range(30)
        )),
        ("d07", "the secret eval answer sequence " + " ".join(
            f"leak{i} benchmark{i}" for i in range(20)
        )),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _eval_set(spark):
    # shares an 8-gram window with d07
    return spark.createDataFrame(
        [("e1", "xx the secret eval answer sequence leak0 benchmark0 "
          "leak1 benchmark1 yy")],
        "doc_id string, text string",
    )


def test_near_dup_representatives_drops_non_reps(spark):
    d = _docs(spark).filter(F.col("doc_id").isin("d01", "d03", "d05", "d06"))
    kept = {r["doc_id"] for r in near_dup_representatives(d).collect()}
    # d01 is the component minimum; d03/d05 are its near-dups
    assert "d01" in kept and "d06" in kept
    assert kept == {"d01", "d06"}, kept


def test_prepare_corpus_end_to_end(spark, tmp_path):
    out = str(tmp_path / "corpus")
    cfg = CorpusConfig(seq_len=64, eos_id=0, splits={"train": 0.8, "val": 0.2})
    report = prepare_corpus(
        spark,
        _docs(spark),
        out,
        eval_sets=[_eval_set(spark)],
        config=cfg,
    )
    st = report["stages"]
    assert st["input"] == 7
    assert st["after_quality"] == 6  # d04 out
    assert st["after_exact_dedup"] == 5  # d02 out
    assert st["after_near_dup"] == 3  # d03, d05 out (d01 representative)
    assert st["after_decontamination"] == 2  # d07 out
    # survivors: d01, d06 — split + packed
    survivors = {"d01", "d06"}
    toks = {
        r["doc_id"]: len(r["text"].split(" "))
        for r in _docs(spark).collect()
        if r["doc_id"] in survivors
    }
    total_expected = sum(n + 1 for n in toks.values())  # +1 EOS per doc
    total_real = sum(s["real_tokens"] for s in report["splits"].values())
    assert total_real == total_expected
    # every pack row is exactly seq_len wide; shards readable
    for name, info in report["splits"].items():
        if info["n_packs"] == 0:
            continue
        rows = spark.read.parquet(info["path"]).collect()
        assert all(len(r["tokens"]) == 64 for r in rows)
        assert sum(r["n_real"] for r in rows) == info["real_tokens"]
    # deterministic: same input + seed -> same report
    report2 = prepare_corpus(
        spark,
        _docs(spark),
        str(tmp_path / "corpus2"),
        eval_sets=[_eval_set(spark)],
        config=cfg,
    )
    assert report2["stages"] == report["stages"]
    assert {
        k: {x: y for x, y in v.items() if x != "path"}
        for k, v in report2["splits"].items()
    } == {
        k: {x: y for x, y in v.items() if x != "path"}
        for k, v in report["splits"].items()
    }


def test_prepare_corpus_perplexity_gate(spark, tmp_path):
    """cfg.max_ppl inserts the lmfilter gate between the written
    quality rules and exact dedup: the LM self-trains on the
    post-quality corpus, the threshold drops the highest-perplexity
    document, and the accounting/report keys land."""
    from dexspark.operators.lmfilter import learn_bigram_lm, score_perplexity
    from dexspark.operators.textquality import filter_quality

    docs = _docs(spark)
    gated = filter_quality(docs)
    lm = learn_bigram_lm(gated)
    ppls = {r["doc_id"]: r["ppl"]
            for r in score_perplexity(gated, lm).collect()}
    ranked = sorted(ppls, key=ppls.get)
    worst = ranked[-1]
    thr = (ppls[ranked[-1]] + ppls[ranked[-2]]) / 2  # drops exactly one

    cfg = CorpusConfig(
        seq_len=64, eos_id=0, splits={"train": 0.8, "val": 0.2},
        max_ppl=thr,
    )
    report = prepare_corpus(
        spark, docs, str(tmp_path / "corpus"),
        eval_sets=[_eval_set(spark)], config=cfg,
    )
    st = report["stages"]
    assert st["after_quality"] == 6
    assert st["after_perplexity"] == 5
    assert report["lm_vocab"] == lm.vocab_size
    # the dropped doc is the worst-scoring one, and it never reaches
    # the later stages' universe
    packed_ids = set()
    for info in report["splits"].values():
        if info["n_packs"]:
            for r in spark.read.parquet(info["path"]).collect():
                packed_ids.update(r["docs"])
    assert worst not in packed_ids


def test_prepare_corpus_tokens_passthrough(spark, tmp_path):
    """A corpus that already carries token arrays skips the tokenizer
    and packs the given tokens verbatim."""
    d = spark.createDataFrame(
        [("a", "x " * 40, list(range(10))), ("b", "y " * 40, list(range(5)))],
        "doc_id string, text string, tokens array<int>",
    )
    cfg = CorpusConfig(
        seq_len=8, quality=False, near_dup=False, exact_dedup=False,
        splits={"train": 1.0},
    )
    report = prepare_corpus(spark, d, str(tmp_path / "o"), config=cfg)
    assert report["splits"]["train"]["real_tokens"] == 10 + 5 + 2  # +EOS each


def test_cli_prepare_corpus(spark, tmp_path, capsys):
    from dexspark import cli

    src = str(tmp_path / "docs")
    _docs(spark).write.parquet(src)
    ev = str(tmp_path / "ev")
    _eval_set(spark).write.parquet(ev)
    out = str(tmp_path / "out")
    rc = cli.main(
        [
            "--prepare-corpus", out,
            "--corpus-src", src,
            "--corpus-eval", ev,
            "--corpus-splits", "train=0.9,val=0.1",
            "--seq-len", "64",
            "--eos-id", "0",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["stages"]["after_decontamination"] == 2
    assert os.path.isdir(out)


def test_prepare_corpus_semantic_dedup_stage(spark, tmp_path):
    """cfg.semantic_dedup drops same-meaning/different-surface docs
    the minhash stage cannot see: d06's embedding is a near-copy of
    d01's (their TEXTS share nothing), so the semantic stage removes
    d06 while the token stages kept it."""
    embs = {
        "d01": [1.0, 0.0, 0.0, 0.0],
        "d02": [0.0, 1.0, 0.0, 0.0],
        "d03": [0.0, 0.0, 1.0, 0.0],
        "d04": [0.0, 0.0, 0.0, 1.0],
        "d05": [-1.0, 0.0, 0.0, 0.0],
        "d06": [1.01, 0.0, 0.0, 0.0],  # semantic dup of d01
        "d07": [0.0, -1.0, 0.0, 0.0],
    }
    edf = spark.createDataFrame(
        [(k, v) for k, v in embs.items()],
        "doc_id string, embedding array<float>",
    )
    docs = _docs(spark).join(edf, "doc_id")
    cfg = CorpusConfig(
        seq_len=64, eos_id=0, splits={"train": 1.0},
        semantic_dedup=True, semantic_tau=0.9,
    )
    report = prepare_corpus(
        spark, docs, str(tmp_path / "c"),
        eval_sets=[_eval_set(spark)], config=cfg,
    )
    st = report["stages"]
    assert st["after_near_dup"] == 3  # d01, d06, d07 (as ever)
    assert st["after_semantic_dedup"] == 2  # d06 out
    assert st["after_decontamination"] == 1  # then d07 out
    packed = set()
    for info in report["splits"].values():
        if info["n_packs"]:
            for r in spark.read.parquet(info["path"]).collect():
                packed.update(r["docs"])
    assert packed == {"d01"}

    # corpora without embeddings: the stage reports itself skipped
    r2 = prepare_corpus(
        spark, _docs(spark), str(tmp_path / "c2"),
        config=CorpusConfig(
            seq_len=64, splits={"train": 1.0}, semantic_dedup=True
        ),
    )
    assert r2["stages"]["after_semantic_dedup"] == (
        "skipped (no embedding column)"
    )


def test_cli_max_ppl_flag(spark, tmp_path, capsys):
    from dexspark import cli

    src = str(tmp_path / "docs")
    _docs(spark).write.parquet(src)
    rc = cli.main(
        [
            "--prepare-corpus", str(tmp_path / "out"),
            "--corpus-src", src,
            "--corpus-splits", "train=1.0",
            "--seq-len", "64",
            "--max-ppl", "1e9",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # wired through: the gate ran (admitting everything at 1e9)
    assert report["stages"]["after_perplexity"] == report["stages"]["after_quality"]
    assert report["lm_vocab"] > 0


def test_prepare_corpus_bpe_tokenizer(spark, tmp_path):
    """bpe_learn_merges switches the tokenize stage to the real BPE:
    merges learned on the post-dedup corpus, token totals equal the
    driver-side reference encode of the survivors."""
    from dexspark.operators.bpe import encode_word, learn_bpe

    cfg = CorpusConfig(
        seq_len=64,
        splits={"train": 1.0},
        bpe_learn_merges=40,
    )
    report = prepare_corpus(
        spark,
        _docs(spark),
        str(tmp_path / "bpe"),
        eval_sets=[_eval_set(spark)],
        config=cfg,
    )
    assert report["bpe_merges_learned"] > 0
    # reference: survivors are d01, d06 (same funnel as the e2e test);
    # learn on exactly that 2-doc corpus mirrors the pipeline's order
    survivors = _docs(spark).filter(F.col("doc_id").isin("d01", "d06"))
    merges = learn_bpe(survivors, 40)
    ranks = {p: r for r, p in enumerate(merges)}
    expected = sum(
        len(encode_word(w, ranks))
        for r in survivors.collect()
        for w in r["text"].split()
    ) + 2  # +1 EOS per doc
    assert report["splits"]["train"]["real_tokens"] == expected


def test_prepare_corpus_bpe_explicit_merges(spark, tmp_path):
    """Pre-learned merges skip the learn stage and drive the encode."""
    from dexspark.operators.bpe import learn_bpe

    merges = learn_bpe(_docs(spark), 20)
    cfg = CorpusConfig(
        seq_len=32, quality=False, near_dup=False, exact_dedup=False,
        splits={"train": 1.0}, bpe_merges=merges,
    )
    report = prepare_corpus(spark, _docs(spark), str(tmp_path / "m"), config=cfg)
    assert "bpe_merges_learned" not in report
    assert report["splits"]["train"]["real_tokens"] > 0


def test_prepare_corpus_tokens_only(spark, tmp_path):
    """The north-star shape: (doc_id, tokens) with NO text column.
    Gates run over token sequences — exact dedup keys the array,
    near-dup shingles token-id windows, decontamination n-grams match
    token windows; quality is reported skipped."""
    from pyspark.sql import functions as F

    base = list(range(40))
    rows = [
        ("a", base),
        ("b", base),                        # exact dup of a
        ("c", base[:39] + [99]),            # near-dup of a (shares shingles)
        ("d", [1000 + i for i in range(40)]),  # distinct
        ("e", [7, 7, 7]),                   # short but kept (no quality gate)
        ("f", [2000 + i for i in range(40)]),  # will be decontaminated
    ]
    docs = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    ev = spark.createDataFrame(
        [("e1", [2005 + i for i in range(10)])], "doc_id string, tokens array<int>"
    )
    cfg = CorpusConfig(seq_len=32, splits={"train": 1.0})
    report = prepare_corpus(
        spark, docs, str(tmp_path / "tk"), eval_sets=[ev], config=cfg
    )
    st = report["stages"]
    assert st["input"] == 6
    assert st["after_quality"] == "skipped (no text column)"
    assert st["after_exact_dedup"] == 5          # b out
    assert st["after_near_dup"] == 4             # c out (a representative)
    assert st["after_decontamination"] == 3      # f out
    # survivors a, d, e -> 40+40+3 real tokens + 3 EOS
    assert report["splits"]["train"]["real_tokens"] == 40 + 40 + 3 + 3
    out = spark.read.parquet(report["splits"]["train"]["path"])
    assert all(len(r["tokens"]) == 32 for r in out.collect())


def test_cli_prepare_corpus_from_dexlake_table(spark, tmp_path, capsys):
    """--corpus-src pointing at a dexlake table root (sniffed by
    _snapshots) packs the CDC-maintained table's tokens directly."""
    import os as _os

    from pyspark.sql import functions as F

    from dexspark import cli
    from dexspark.lake import LakeTable
    from dexspark.schema import sequences_schema

    root = str(tmp_path / "seqtable")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=4)
    df = spark.range(30).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.sequence(F.col("id").cast("int") * 100, F.col("id").cast("int") * 100 + 9)
        .cast("array<int>")
        .alias("tokens"),
        F.lit(10).alias("n_tok"),
        F.lit("s").alias("source"),
    )
    t.overwrite(df)
    out = str(tmp_path / "shards")
    rc = cli.main(
        [
            "--prepare-corpus", out,
            "--corpus-src", root,
            "--corpus-splits", "train=1.0",
            "--seq-len", "16",
            "--eos-id", "0",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["stages"]["input"] == 30
    # 30 docs x (10 tokens + EOS) = 330 real tokens
    assert report["splits"]["train"]["real_tokens"] == 330
    assert _os.path.isdir(_os.path.join(out, "split=train"))


def test_prepare_corpus_dsir_stage(spark, tmp_path):
    """cfg.dsir_frac inserts Gumbel top-k importance resampling after
    decontamination: exactly round(frac * pool) docs survive, heavily
    enriched toward the target corpus's hashed-n-gram distribution;
    the accounting/report keys land; bad configs fail at entry."""
    import pytest as _pytest

    from dexspark.operators.corpus import prepare_corpus as _prep

    # a pool big enough for enrichment to be unambiguous: 40 target-like
    # docs, 40 off-domain; all long enough to pass the quality gate
    sparky = "spark query plan shuffle stage executor partition " \
             "broadcast join aggregate exchange codegen " + _WORDS
    nature = "cat dog tree house garden bird river mountain cloud " \
             "meadow stone forest " + _WORDS
    rows = [(f"s{i:02d}", sparky + f" tail{i}") for i in range(40)]
    rows += [(f"n{i:02d}", nature + f" tail{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    target = spark.createDataFrame(
        [(f"t{i}", sparky + f" extra{i}") for i in range(10)],
        "doc_id string, text string",
    )

    cfg = CorpusConfig(
        seq_len=64, eos_id=0, splits={"train": 1.0},
        near_dup=False,  # the two families are intentionally self-similar
        dsir_frac=0.25, dsir_buckets=256,
    )
    report = prepare_corpus(
        spark, docs, str(tmp_path / "corpus"), config=cfg, dsir_target=target
    )
    st = report["stages"]
    assert st["after_dsir"] == 20  # round(0.25 * 80)
    assert report["dsir"] == {"pool": 80, "k": 20, "n_buckets": 256}
    packed_ids = set()
    for info in report["splits"].values():
        if info["n_packs"]:
            for r in spark.read.parquet(info["path"]).collect():
                packed_ids.update(r["docs"])
    assert len(packed_ids) == 20
    assert sum(1 for d in packed_ids if d.startswith("s")) >= 18

    # entry-point validation: missing target, bad fraction, wrong unit
    with _pytest.raises(ValueError, match="dsir_target"):
        _prep(spark, docs, str(tmp_path / "x1"), config=cfg)
    with _pytest.raises(ValueError, match="dsir_frac"):
        _prep(spark, docs, str(tmp_path / "x2"),
              config=CorpusConfig(dsir_frac=1.5), dsir_target=target)
    tok_docs = docs.select("doc_id", F.array(F.lit(1), F.lit(2)).alias("tokens"))
    with _pytest.raises(ValueError, match="lacks the 'tokens'"):
        _prep(spark, tok_docs, str(tmp_path / "x3"),
              config=CorpusConfig(dsir_frac=0.5, quality=False),
              dsir_target=target)


def test_cli_dsir_flags(spark, tmp_path, capsys):
    """--dsir-frac/--dsir-target/--dsir-buckets drive the DSIR stage in
    --prepare-corpus; --dsir-frac without a target is a clean usage
    error, not a traceback."""
    from dexspark import cli

    # per-doc unique filler: the default pipeline runs near-dup, and a
    # shared suffix would collapse the families before DSIR ever runs
    sparky = "spark query plan shuffle stage executor partition " \
             "broadcast join aggregate exchange codegen"
    nature = "cat dog tree house garden bird river mountain cloud " \
             "meadow stone forest"
    rows = [
        (f"s{i:02d}", sparky + " " + " ".join(f"su{i}w{j}" for j in range(50)))
        for i in range(8)
    ]
    rows += [
        (f"n{i:02d}", nature + " " + " ".join(f"nu{i}w{j}" for j in range(50)))
        for i in range(8)
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id string, text string") \
        .write.parquet(src)
    tgt = str(tmp_path / "target")
    spark.createDataFrame(
        [
            (f"t{i}", sparky + " " + " ".join(f"tu{i}w{j}" for j in range(50)))
            for i in range(6)
        ],
        "doc_id string, text string",
    ).write.parquet(tgt)
    out = str(tmp_path / "out")

    rc = cli.main(
        [
            "--prepare-corpus", out,
            "--corpus-src", src,
            "--corpus-splits", "train=1.0",
            "--seq-len", "64",
            "--eos-id", "0",
            "--dsir-frac", "0.25",
            "--dsir-target", tgt,
            "--dsir-buckets", "256",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["stages"]["after_dsir"] == 4  # round(0.25 * 16)
    assert report["dsir"]["n_buckets"] == 256

    with pytest.raises(SystemExit) as exc:
        cli.main(
            [
                "--prepare-corpus", str(tmp_path / "out2"),
                "--corpus-src", src,
                "--corpus-splits", "train=1.0",
                "--seq-len", "64",
                "--eos-id", "0",
                "--dsir-frac", "0.25",
            ]
        )
    assert exc.value.code == 2  # argparse usage error
