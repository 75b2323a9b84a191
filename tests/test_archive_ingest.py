"""decompress -> csv_ingest composition: the reference's production
flow (FnDecompressor.kt:115-150 unzip-then-validate) as ONE entry
point. A zip of CSVs fans out (including a nested zip), each CSV runs
the full file/row validation, non-zip payloads become FAIL records,
non-CSV leaves are skipped."""

import io
import zipfile

from dexspark.config import RuleSet
from dexspark.csv_ingest import ingest_archives

HDR = "patient_id,csv_file_version_no,lab_name,lab_id,result\n"
GOOD = HDR + "p1,V2020-04-18,LabCorp,,Final\n"
BAD = HDR + ",V2020-04-18,,,Pending\n"

RULES = RuleSet(
    required=("patient_id",),
    conditional_groups=(("lab_name", "lab_id"),),
    version_literal=(("csv_file_version_no", "V2020-04-18"),),
    allowed_values=(("result", ("Final", "Corrected")),),
)


def _corpus(tmp_path):
    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w") as z:
        z.writestr("nested_good.csv", GOOD)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.csv", GOOD)
        z.writestr("b.csv", BAD)
        z.writestr("notes.txt", "not a csv")
        z.writestr("inner.zip", inner.getvalue())
    (tmp_path / "batch.zip").write_bytes(buf.getvalue())
    (tmp_path / "broken.zip").write_bytes(b"garbage, not a zip")
    return str(tmp_path)


def test_zip_of_csvs_end_to_end(spark, tmp_path):
    root = _corpus(tmp_path)
    res = ingest_archives(
        spark,
        root,
        RULES,
        scratch=str(tmp_path / "scratch"),
        required_columns=("patient_id", "csv_file_version_no"),
    )
    # archive-level FAIL event for the non-zip payload
    assert len(res.archive_errors) == 1
    assert "not a zip" in res.archive_errors[0][2]
    assert not res.ok
    # non-CSV leaf skipped, not failed
    assert [e for _, e in res.skipped] == ["notes.txt"]
    by_entry = {entry: r for (_, entry), r in res.per_entry.items()}
    assert set(by_entry) == {"a.csv", "b.csv", "inner.zip/nested_good.csv"}
    assert by_entry["a.csv"].clean.count() == 1
    assert by_entry["a.csv"].quarantine.count() == 0
    # nested zip's CSV validated like a top-level one
    assert by_entry["inner.zip/nested_good.csv"].clean.count() == 1
    q = by_entry["b.csv"].quarantine.collect()
    assert len(q) == 1
    kinds = {x.split(":")[0] for x in q[0]["fail_reasons"]}
    assert {"required", "conditional", "allowed_values"} <= kinds


def test_replay_is_idempotent(spark, tmp_path):
    root = _corpus(tmp_path)
    scratch = str(tmp_path / "scratch")
    kw = dict(scratch=scratch, required_columns=("patient_id",))
    r1 = ingest_archives(spark, root, RULES, **kw)
    r2 = ingest_archives(spark, root, RULES, **kw)  # same content-addressed files
    assert {e for _, e in r1.per_entry} == {e for _, e in r2.per_entry}
    for k in r1.per_entry:
        assert r1.per_entry[k].clean.count() == r2.per_entry[k].clean.count()
