"""Exact duplicate-span detection/removal vs a brute-force Python oracle."""

import os

import pytest

from dexspark.operators.spandedup import duplicate_spans, remove_duplicate_spans

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _oracle_spans(docs, k):
    """Brute force: count every k-gram globally, union [p, p+k) over
    duplicated-gram starts, merge intervals. docs: {id: [tokens]}."""
    counts = {}
    for toks in docs.values():
        for i in range(len(toks) - k + 1):
            g = tuple(toks[i : i + k])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for did, toks in docs.items():
        starts = [
            i
            for i in range(len(toks) - k + 1)
            if counts[tuple(toks[i : i + k])] >= 2
        ]
        spans = []
        for p in starts:
            if spans and p <= spans[-1][1]:  # overlap/abut: end >= p
                spans[-1][1] = max(spans[-1][1], p + k)
            else:
                spans.append([p, p + k])
        if spans:
            out[did] = [tuple(s) for s in spans]
    return out


def _oracle_trim(docs, spans):
    out = {}
    for did, toks in docs.items():
        covered = set()
        for s, e in spans.get(did, []):
            covered.update(range(s, e))
        out[did] = [t for i, t in enumerate(toks) if i not in covered]
    return out


def _collect_spans(df, id_col="doc_id"):
    got = {}
    for r in df.collect():
        got.setdefault(r[id_col], []).append((r["span_start"], r["span_end"]))
    return {k: sorted(v) for k, v in got.items()}


BOILER = ["fast", "cheap", "atomic", "merge", "into", "iceberg", "now", "ok"]


def _corpus():
    """Cross-doc boilerplate, an intra-doc repeat, a k-1 near-miss,
    and a clean doc."""
    u = [f"u{i}" for i in range(30)]
    v = [f"v{i}" for i in range(30)]
    docs = {
        1: u[:5] + BOILER + u[5:10],
        2: v[:3] + BOILER + v[3:12],
        # intra-doc: the same 8 tokens twice, separated
        3: ["a"] + [f"r{i}" for i in range(8)] + ["b", "c"] + [f"r{i}" for i in range(8)] + ["d"],
        # near miss: only 7 tokens shared with BOILER
        4: ["x"] + BOILER[:7] + ["notboiler"] + ["y", "z", "w", "q", "t", "s"],
        5: [f"c{i}" for i in range(20)],
    }
    return docs


def _df(spark, docs, as_array=False):
    rows = [
        (did, toks if as_array else " ".join(toks)) for did, toks in docs.items()
    ]
    typ = "array<string>" if as_array else "string"
    return spark.createDataFrame(rows, f"doc_id int, text {typ}")


@pytest.mark.parametrize("scheme", ["xxhash64", "md5"])
def test_spans_match_oracle(spark, scheme):
    docs = _corpus()
    got = _collect_spans(duplicate_spans(_df(spark, docs), min_len=8, scheme=scheme))
    assert got == _oracle_spans(docs, 8)
    # the near-miss doc and the clean doc produced no spans
    assert 4 not in got and 5 not in got
    # the intra-doc repeat flagged both occurrences
    assert got[3] == [(1, 9), (11, 19)]


def test_long_shared_span_merges_to_one_interval(spark):
    """A 20-token shared run yields ONE maximal interval per doc, not
    13 overlapping gram-sized ones."""
    shared = [f"s{i}" for i in range(20)]
    docs = {1: ["p"] + shared + ["q"], 2: shared + ["z", "z2", "z3"]}
    got = _collect_spans(duplicate_spans(_df(spark, docs), min_len=8))
    assert got == {1: [(1, 21)], 2: [(0, 20)]} == _oracle_spans(docs, 8)


def test_token_array_input(spark):
    """int-token arrays (the tokenized-sequence domain) work raw —
    no string casting."""
    docs = {
        1: list(range(100, 110)) + list(range(5)),
        2: list(range(100, 110)) + list(range(50, 55)),
        3: list(range(200, 215)),
    }
    rows = [(d, t) for d, t in docs.items()]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    got = _collect_spans(duplicate_spans(df, text="tokens", min_len=8))
    assert got == _oracle_spans({k: [str(x) for x in v] for k, v in docs.items()}, 8)


@pytest.mark.parametrize("as_array", [False, True])
def test_remove_matches_oracle(spark, as_array):
    docs = _corpus()
    out = remove_duplicate_spans(_df(spark, docs, as_array), min_len=8)
    spans = _oracle_spans(docs, 8)
    want = _oracle_trim(docs, spans)
    for r in out.collect():
        toks = r["text"] if as_array else (r["text"].split(" ") if r["text"] else [])
        assert toks == want[r["doc_id"]], r["doc_id"]
        assert r["n_removed_tokens"] == len(docs[r["doc_id"]]) - len(want[r["doc_id"]])
    # clean doc untouched
    clean = [r for r in out.collect() if r["doc_id"] == 5][0]
    assert clean["n_removed_tokens"] == 0


def test_remove_with_precomputed_keep_first_spans(spark):
    """Keep-first composition: filtering doc 1's spans out of the
    frame keeps its copy of the boilerplate and cuts doc 2's."""
    docs = {k: v for k, v in _corpus().items() if k in (1, 2)}
    df = _df(spark, docs)
    spans = duplicate_spans(df, min_len=8).filter("doc_id != 1")
    out = {r["doc_id"]: r["text"].split(" ") for r in
           remove_duplicate_spans(df, spans=spans).collect()}
    assert out[1] == docs[1]
    assert "fast" not in out[2]


def test_real_documents_smoke(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    spans = duplicate_spans(docs, min_len=8)
    spans.limit(5).collect()  # runs end-to-end
    bad = spans.filter("span_end - span_start < 8 OR span_start < 0").count()
    assert bad == 0


def test_cli_trim_dup_spans(spark, tmp_path, capsys):
    """--trim-dup-spans MIN_LEN: hygiene rewrite of the whole table;
    boilerplate runs vanish, n_tok recomputed, idempotent on re-run."""
    import json

    from pyspark.sql import functions as F

    from dexspark import cli
    from dexspark.lake import LakeTable
    from dexspark.schema import sequences_schema

    root = str(tmp_path / "seq")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=2)
    boiler = list(range(900, 910))
    rows = [
        ("d1", boiler + [1, 2, 3], 13, "a"),
        ("d2", [7, 8] + boiler, 12, "a"),
        ("d3", [20, 21, 22, 23], 4, "b"),
    ]
    t.overwrite(spark.createDataFrame(rows, schema=sequences_schema()))

    rc = cli.main(["--table", root, "--trim-dup-spans", "8"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["trim_dup_spans"]["tokens_removed"] == 20

    got = {r["doc_id"]: (r["tokens"], r["n_tok"]) for r in
           LakeTable(spark, root).read().collect()}
    assert got["d1"] == ([1, 2, 3], 3)
    assert got["d2"] == ([7, 8], 2)
    assert got["d3"] == ([20, 21, 22, 23], 4)

    # idempotent: nothing left to trim, version unchanged
    v = LakeTable(spark, root).current_version()
    rc = cli.main(["--table", root, "--trim-dup-spans", "8"])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["trim_dup_spans"]["tokens_removed"] == 0
    assert LakeTable(spark, root).current_version() == v
