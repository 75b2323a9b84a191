"""Golden-scenario CSV validation corpus (SURVEY §5.3).

Synthetic mirrors of the reference's sample files
(`sample-data/HL7v2 lab (COVID ELR)/`): valid template, nested
quotes, empty file, header-only, missing headers, duplicate headers,
wrong version literal, missing conditional fields — each asserting
the XLSX rule-sheet outcome (file-level fail vs row quarantine vs
clean)."""

import os

import pytest
from pyspark.sql import functions as F

from dexspark.config import RuleSet
from dexspark.csv_ingest import ingest_csv
from dexspark.listing import classify_listing, validate_listing

HEADER = "patient_id,csv_file_version_no,lab_name,lab_id,result\n"

RULES = RuleSet(
    required=("patient_id",),
    conditional_groups=(("lab_name", "lab_id"),),
    version_literal=(("csv_file_version_no", "V2020-04-18"),),
    allowed_values=(("result", ("Final", "Corrected")),),
)
REQUIRED_COLS = ("patient_id", "csv_file_version_no")


def _file(tmp_path, name, content):
    p = tmp_path / name
    with open(p, "w") as f:
        f.write(content)
    return str(p)


def test_valid_file_all_clean(spark, tmp_path):
    p = _file(
        tmp_path,
        "valid.csv",
        HEADER
        + "p1,V2020-04-18,LabCorp,,Final\n"
        + "p2,V2020-04-18,,L42,Corrected\n",
    )
    res = ingest_csv(spark, p, RULES, required_columns=REQUIRED_COLS)
    assert res.ok
    assert res.clean.count() == 2
    assert res.quarantine.count() == 0


def test_nested_quotes_parse_clean(spark, tmp_path):
    # AT_COVID_Valid_Nested Quotes: RFC 4180 doubled quotes must pass
    p = _file(
        tmp_path,
        "quotes.csv",
        HEADER + 'p1,V2020-04-18,"Lab ""A"", Inc.",,Final\n',
    )
    res = ingest_csv(spark, p, RULES, required_columns=REQUIRED_COLS)
    assert res.ok
    rows = res.clean.collect()
    assert len(rows) == 1
    assert rows[0]["lab_name"] == 'Lab "A", Inc.'
    assert res.quarantine.count() == 0


def test_empty_file_is_file_level_fail(spark, tmp_path):
    res = ingest_csv(spark, _file(tmp_path, "empty.csv", ""), RULES)
    assert not res.ok
    assert any("file_empty" in e for e in res.file_errors)


def test_header_only_is_file_level_fail(spark, tmp_path):
    res = ingest_csv(
        spark, _file(tmp_path, "headeronly.csv", HEADER), RULES,
        required_columns=REQUIRED_COLS,
    )
    assert not res.ok
    assert any("no data rows" in e for e in res.file_errors)


def test_missing_required_header(spark, tmp_path):
    # AT_COVID_Missing Headers analogue
    p = _file(tmp_path, "nohdr.csv", "a,b,c\n1,2,3\n")
    res = ingest_csv(spark, p, RULES, required_columns=REQUIRED_COLS)
    assert not res.ok
    assert any("header" in e for e in res.file_errors)


def test_duplicate_header_rejected(spark, tmp_path):
    p = _file(
        tmp_path, "dup.csv",
        "patient_id,csv_file_version_no,patient_id\n1,V2020-04-18,2\n",
    )
    res = ingest_csv(spark, p, RULES, required_columns=REQUIRED_COLS)
    assert not res.ok


def test_header_case_and_whitespace_normalized(spark, tmp_path):
    # 'Patient_occupation ,' style header (elr-schema.csvs:7-8)
    p = _file(
        tmp_path, "norm.csv",
        "Patient_ID , CSV_File_Version_No,lab_name,lab_id,result\n"
        "p1,V2020-04-18,L,,Final\n",
    )
    res = ingest_csv(spark, p, RULES, required_columns=REQUIRED_COLS)
    assert res.ok
    assert res.header[0] == "patient_id"
    assert res.clean.count() == 1


def test_wrong_version_literal_quarantined(spark, tmp_path):
    # CSVUpload_incorrect version analogue (XLSX order-6/7)
    p = _file(
        tmp_path, "ver.csv",
        HEADER + "p1,V1999-01-01,L,,Final\n" + "p2,V2020-04-18,L,,Final\n",
    )
    res = ingest_csv(spark, p, RULES, required_columns=REQUIRED_COLS)
    assert res.ok
    assert res.clean.count() == 1
    q = res.quarantine.collect()
    assert len(q) == 1
    assert any("version" in r for r in q[0]["fail_reasons"])


def test_conditional_group_and_required_and_allowed(spark, tmp_path):
    p = _file(
        tmp_path, "rules.csv",
        HEADER
        + ",V2020-04-18,L,,Final\n"        # missing required patient_id
        + "p2,V2020-04-18,,,Final\n"       # conditional group all blank
        + "p3,V2020-04-18,L,,Pending\n"    # disallowed value
        + "p4,V2020-04-18,L,,Final\n",     # clean
    )
    res = ingest_csv(spark, p, RULES, required_columns=REQUIRED_COLS)
    assert res.clean.count() == 1
    q = {
        r["patient_id"]: list(r["fail_reasons"]) for r in res.quarantine.collect()
    }
    assert any("required:patient_id" in x for x in q[None])
    assert any("conditional" in x for x in q["p2"])
    assert any("allowed_values:result" in x for x in q["p3"])


def test_blank_row_quarantined(spark, tmp_path):
    p = _file(
        tmp_path, "blank.csv",
        HEADER + "p1,V2020-04-18,L,,Final\n" + ",,,,\n",
    )
    res = ingest_csv(spark, p, RULES, required_columns=REQUIRED_COLS)
    assert res.clean.count() == 1
    q = res.quarantine.collect()
    assert len(q) == 1
    assert any("blank_row" in r for r in q[0]["fail_reasons"])


def test_all_reasons_accumulate_per_row(spark, tmp_path):
    # V17: one bad row violating three rules reports ALL of them
    p = _file(
        tmp_path, "multi.csv",
        HEADER + ",V1999-01-01,,,Pending\n",
    )
    res = ingest_csv(spark, p, RULES, required_columns=REQUIRED_COLS)
    reasons = res.quarantine.collect()[0]["fail_reasons"]
    kinds = {r.split(":")[0] for r in reasons}
    assert {"required", "version", "conditional", "allowed_values"} <= kinds


def test_listing_classification(spark, tmp_path):
    for name in ("a.csv", "b.CSV", "c.xml", "d.zip", "e.weird"):
        _file(tmp_path, name, "x\n")
    report = validate_listing(spark, str(tmp_path))
    assert report["counts"] == {"passed": 2, "failed": 2, "skipped": 1}
    assert any(p.endswith("a.csv") for p in report["examples"]["passed"])


def test_validate_file_match_is_anchored(spark, tmp_path):
    from dexspark.listing import validate_file

    _file(tmp_path, "table1.csv", "x\n")
    root = str(tmp_path)
    # a bare-name query must not match a longer file name as a suffix
    assert validate_file(spark, root, "1.csv") == "missing"
    assert validate_file(spark, root, "table1.csv") == "passed"


def test_utf8_bom_header_stripped(spark, tmp_path):
    """Excel's "CSV UTF-8" export prefixes the file with EF BB BF; the
    BOM survives strip()/lower() and used to pollute the first column
    name — silently detaching every rule bound to it (or falsely
    failing required-header checks)."""
    p = tmp_path / "bom.csv"
    p.write_bytes(b"\xef\xbb\xbf" + b"doc_id,n_chars\nd1,5\nd2,\n")
    res = ingest_csv(
        spark, str(p),
        rules=RuleSet(required=("doc_id", "n_chars")),
        required_columns=("doc_id",),
    )
    assert res.ok, res.file_errors
    assert res.header == ["doc_id", "n_chars"]
    assert res.clean.count() == 1           # d1 passes
    assert res.quarantine.count() == 1      # d2 misses required n_chars


def test_newline_free_body_rejected_not_materialized(spark, tmp_path):
    """A newline-free multi-MB file named .csv must become a file
    error, not a whole-body string on the driver/executors (the probe
    promises to never read the body)."""
    p = tmp_path / "huge.csv"
    p.write_bytes(b"x" * (2 << 20))  # 2 MiB, no newline
    res = ingest_csv(spark, str(p))
    assert not res.ok
    assert any("header line exceeds" in e for e in res.file_errors)
    # bulk path agrees
    from dexspark.csv_ingest import ingest_csv_bulk

    bulk = ingest_csv_bulk(spark, [str(p)])
    assert any("header line exceeds" in e for e in bulk[str(p)].file_errors)
