"""Schema evolution through the engine: additive nullable payload
column + int widening arrive via the binlog, reconcile against the
table, and old rows remain readable (SURVEY.md J2/V6/V15; reference
analogue: runtime header reconciliation,
digital-preservation-poc Entry.java:51-107)."""

import json
import os

from pyspark.sql import types as T

from dexspark.config import EngineConfig
from dexspark.lake import LakeTable
from dexspark.schema import payload_schema, sequences_schema
from dexspark.stream import CdcEngine


def _write_lines(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _event(doc_id, lsn, epoch, payload, op="update"):
    return json.dumps(
        {
            "op": op,
            "doc_id": doc_id,
            "payload": payload,
            "commit_ts": f"2024-01-01T00:00:{lsn:02d}.000Z",
            "lsn": lsn,
            "batch_epoch": epoch,
        }
    )


def test_additive_column_via_binlog(spark, tmp_warehouse):
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq"), sequences_schema(), num_buckets=4
    )
    base = spark.createDataFrame([("a", [1], 1, "web")], sequences_schema())
    table.overwrite(base)

    evolved_payload = T.StructType(
        list(payload_schema().fields) + [T.StructField("lang", T.StringType(), True)]
    )
    engine = CdcEngine(
        spark, table, tmp_warehouse, EngineConfig(num_buckets=4),
        payload_schema=evolved_payload,
    )
    binlog = os.path.join(tmp_warehouse, "binlog")
    _write_lines(
        os.path.join(binlog, "e0.ndjson"),
        [
            _event("b", 1, 0, {"tokens": [5, 6], "n_tok": 2, "source": "wiki", "lang": "en"}),
        ],
    )
    engine.apply_binlog(binlog)
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in table.read().collect()}
    assert rows["b"]["lang"] == "en"
    assert rows["a"]["lang"] is None  # pre-evolution rows null-filled
    evo = table.manifest()["evolution"]
    assert any("add column lang" in a for e in evo for a in e["actions"])


def test_int_widening_via_binlog(spark, tmp_warehouse):
    table = LakeTable.create(
        spark, os.path.join(tmp_warehouse, "seq2"), sequences_schema(), num_buckets=4
    )
    table.overwrite(spark.createDataFrame([("a", [1], 1, "web")], sequences_schema()))

    wide_payload = T.StructType(
        [
            T.StructField("tokens", T.ArrayType(T.LongType()), True),
            T.StructField("n_tok", T.LongType(), True),
            T.StructField("source", T.StringType(), True),
        ]
    )
    # token_range is intentionally absent: this test isolates TYPE
    # widening; a 2**40 token would (correctly) be quarantined by V10.
    from dexspark.config import RuleSet

    rules = RuleSet(required=("doc_id",), length_equals=(("n_tok", "tokens"),))
    engine = CdcEngine(
        spark, table, tmp_warehouse, EngineConfig(num_buckets=4, rules=rules),
        payload_schema=wide_payload,
    )
    binlog = os.path.join(tmp_warehouse, "binlog2")
    big = 2**40
    _write_lines(
        os.path.join(binlog, "e0.ndjson"),
        [_event("c", 1, 0, {"tokens": [big], "n_tok": 1, "source": "web"})],
    )
    engine.apply_binlog(binlog)
    got = {r["doc_id"]: r.asDict(recursive=True) for r in table.read().collect()}
    assert got["c"]["tokens"] == [big]
    assert got["a"]["tokens"] == [1]  # old int32 file readable post-widening
    assert dict(table.read().dtypes)["tokens"] == "array<bigint>"


def test_reconcile_case_insensitive_matches_spark_resolution(spark):
    """Spark resolves columns case-insensitively by default, so an
    incoming 'N_Tok' must map onto the table's 'n_tok' (widening it),
    not be appended as a case-variant duplicate that Spark would then
    call ambiguous."""
    import pytest as _pytest

    from dexspark.schema import SchemaEvolutionError, reconcile, sequences_schema

    incoming = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), True),
            T.StructField("N_Tok", T.LongType(), True),
        ]
    )
    evolved = reconcile(sequences_schema(), incoming)
    names = [f.name for f in evolved.fields]
    assert names == ["doc_id", "tokens", "n_tok", "source"]  # canonical kept
    assert dict((f.name, f.dataType.simpleString()) for f in evolved.fields)[
        "n_tok"
    ] == "bigint"  # widened through the case-variant match

    colliding = T.StructType(
        [
            T.StructField("n_tok", T.IntegerType(), True),
            T.StructField("N_TOK", T.LongType(), True),
        ]
    )
    with _pytest.raises(SchemaEvolutionError, match="case-colliding"):
        reconcile(sequences_schema(), colliding)


def test_merge_aligns_case_variant_frame(spark, tmp_path):
    """End-to-end: merging a frame whose columns differ only by case
    must land the values in the canonical columns (not null-fill them)."""
    import os

    from dexspark.lake import LakeTable
    from dexspark.schema import sequences_schema

    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "seq"), sequences_schema(), num_buckets=2
    )
    t.overwrite(spark.createDataFrame([("a", [1], 1, "web")], sequences_schema()))
    ups = spark.createDataFrame(
        [("b", [2, 3], 2, "wiki")],
        "Doc_ID string, Tokens array<int>, N_TOK int, SOURCE string",
    )
    t.merge(ups, epochs=[1])
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in t.read().collect()}
    assert rows["b"]["tokens"] == [2, 3] and rows["b"]["n_tok"] == 2
    assert rows["b"]["source"] == "wiki"
    assert [f.name for f in t.schema.fields] == ["doc_id", "tokens", "n_tok", "source"]
