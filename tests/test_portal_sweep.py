"""Quarantine -> portal-message coverage sweep (VERDICT r4 task 8).

The reference pairs every rule with an operator-facing "Error message
in Portal" (COVID_19_File_and_Row_Level_Validation.xlsx, sheet
V2020-07-30); round 4 wired that for the rule-level validators. This
sweep asserts the REMAINING fail paths — envelope anomalies, the
router's unrouted sink, the near-dup gate, the bulk-CSV parse/blank
channels, and the reprocess rewrites — all render portal text when the
rule-set supplies a template, through the single
validate.render_portal_reasons seam applied at the quarantine writers.
"""

import dataclasses
import json
import os

import pytest
from pyspark.sql import functions as F

from dexspark.config import EngineConfig, RuleSet, sequences_ruleset
from dexspark.lake import LakeTable
from dexspark.schema import sequences_schema
from dexspark.stream import CdcEngine
from dexspark.validate import (
    FAIL_COL,
    STRUCTURED_REASON_KINDS,
    render_portal_reasons,
)

TEMPLATES = {
    "envelope": "The envelope field [{col}] is invalid: {detail}.",
    "parse": "The row could not be parsed as CSV: {detail}.",
    "blank_row": "The row is blank and was not imported.",
    "unrouted": "No destination accepts stream [{col}].",
    "near_dup": "Document duplicates already-ingested document [{detail}].",
}


def _templated(base: RuleSet, kinds=None) -> RuleSet:
    msgs = {k: TEMPLATES[k] for k in (kinds or TEMPLATES)}
    return dataclasses.replace(
        base, messages=tuple(sorted(msgs.items()))
    )


# --------------------------------------------------------------- unit

def test_render_covers_every_structured_kind(spark):
    """Each structured kind renders via its template; untemplated kinds
    and already-rendered prose pass through untouched."""
    assert set(TEMPLATES) == set(STRUCTURED_REASON_KINDS)
    rules = _templated(RuleSet())
    reasons = [
        "envelope:op:required envelope field missing",
        "envelope:raw:malformed JSON",
        "parse:row:malformed CSV record",
        "blank_row:row:all fields empty",
        "unrouted:weird-stream",
        "near_dup:doc:doc00000042",
        "required:tokens:must not be empty",  # untemplated kind
        "Already rendered portal prose. Received: x",  # no kind shape
    ]
    df = spark.createDataFrame([(reasons,)], f"{FAIL_COL}: array<string>")
    out = df.select(
        render_portal_reasons(F.col(FAIL_COL), rules).alias(FAIL_COL)
    ).collect()[0][0]
    assert out[0] == "The envelope field [op] is invalid: required envelope field missing."
    assert out[1] == "The envelope field [raw] is invalid: malformed JSON."
    assert out[2] == "The row could not be parsed as CSV: malformed CSV record."
    assert out[3] == "The row is blank and was not imported."
    assert out[4] == "No destination accepts stream [weird-stream]."
    assert out[5] == "Document duplicates already-ingested document [doc00000042]."
    assert out[6] == reasons[6]
    assert out[7] == reasons[7]


def test_render_noop_without_templates(spark):
    df = spark.createDataFrame(
        [(["envelope:op:required envelope field missing"],)],
        f"{FAIL_COL}: array<string>",
    )
    got = df.select(
        render_portal_reasons(F.col(FAIL_COL), RuleSet()).alias(FAIL_COL)
    ).collect()[0][0]
    assert got == ["envelope:op:required envelope field missing"]


# ------------------------------------------------- engine quarantine

@pytest.fixture()
def portal_engine(spark, tmp_warehouse):
    rules = _templated(sequences_ruleset())
    table = LakeTable.create(
        spark,
        os.path.join(tmp_warehouse, "sequences"),
        sequences_schema(),
        key="doc_id",
        num_buckets=4,
    )
    cfg = EngineConfig(num_buckets=4, rules=rules)
    return CdcEngine(spark, table, tmp_warehouse, cfg), tmp_warehouse


def _write_anomaly_binlog(path: str) -> None:
    os.makedirs(path, exist_ok=True)
    ok = {
        "op": "insert", "doc_id": "doc1", "commit_ts": 1, "lsn": 1,
        "batch_epoch": 0,
        "payload": {"doc_id": "doc1", "tokens": [1, 2], "n_tok": 2,
                    "source": "web"},
    }
    missing_op = {
        "doc_id": "doc2", "commit_ts": 2, "lsn": 2, "batch_epoch": 0,
        "payload": {"doc_id": "doc2", "tokens": [3], "n_tok": 1,
                    "source": "web"},
    }
    with open(os.path.join(path, "epoch-000000-000.ndjson"), "w") as f:
        f.write(json.dumps(ok) + "\n")
        f.write("{this is not json\n")
        f.write(json.dumps(missing_op) + "\n")


def test_engine_quarantine_renders_envelope_templates(spark, portal_engine):
    engine, warehouse = portal_engine
    binlog = os.path.join(warehouse, "binlog")
    _write_anomaly_binlog(binlog)
    engine.apply_binlog(binlog)
    q = spark.read.parquet(engine.quarantine_path)
    reasons = sorted(r for row in q.collect() for r in row[FAIL_COL])
    assert reasons == [
        "The envelope field [op] is invalid: required envelope field missing.",
        "The envelope field [raw] is invalid: malformed JSON.",
    ]
    # the reprocess rewrite keeps the rendered text (still-failing rows)
    engine.reprocess_quarantine()
    q2 = spark.read.parquet(engine.quarantine_path)
    reasons2 = sorted(r for row in q2.collect() for r in row[FAIL_COL])
    assert reasons2 == reasons


# --------------------------------------------------- router unrouted

def test_router_unrouted_renders_template(spark, tmp_warehouse):
    from dexspark import gen
    from dexspark.router import RoutedEngine

    rules = _templated(sequences_ruleset())
    table = LakeTable.create(
        spark,
        os.path.join(tmp_warehouse, "r0", "sequences"),
        sequences_schema(),
        key="doc_id",
        num_buckets=4,
    )
    eng = CdcEngine(
        spark, table, os.path.join(tmp_warehouse, "r0"),
        EngineConfig(num_buckets=4, rules=rules),
    )
    router = RoutedEngine(
        spark,
        tmp_warehouse,
        {"zero": eng},
        route_expr="case when doc_id = 'docA' then 'zero' end",
        rules=rules,
    )
    events = gen.change_events(
        spark, n_events=8, n_docs=2, n_epochs=1, max_len=4, anomaly_pct=0
    )
    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(events, binlog)
    router.apply_binlog(binlog)
    unrouted = spark.read.parquet(router.unrouted_path)
    assert unrouted.count() > 0
    for row in unrouted.collect():
        for r in row[FAIL_COL]:
            assert r == "No destination accepts stream [null]."


# --------------------------------------------- bulk CSV parse channel

def test_bulk_csv_parse_channel_renders_template(spark, tmp_path):
    from dexspark.csv_ingest import ingest_csv_bulk

    rules = _templated(
        RuleSet(required=("a", "b")), kinds=("parse", "blank_row")
    )
    p = tmp_path / "f.csv"
    p.write_text('a,b\n1,2\n"unterminated,3\n,\n')
    results = ingest_csv_bulk(spark, [str(p)], rules=rules)
    res = results[str(p)]
    assert res.quarantine is not None
    reasons = {r for row in res.quarantine.collect() for r in row[FAIL_COL]}
    # the parse channel renders; rule-level reasons rendered separately
    rendered = {
        "The row could not be parsed as CSV: malformed CSV record.",
    }
    assert rendered & reasons
