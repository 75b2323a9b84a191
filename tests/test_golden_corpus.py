"""The reference's ACTUAL golden files, end-to-end.

Runs ``ingest_csv`` with the shipped COVID-ELR rule-set
(dexspark/rulesets/elr_v2020_07_30.json, mirroring
digital-preservation-poc elr-schema.csvs:19-105 + custom-poc
elr-schema.json:1-16) over the real 101-column corpus at
``sample-data/HL7v2 lab (COVID ELR)/`` and asserts each scenario's
expected outcome from COVID_19_File_and_Row_Level_Validation.xlsx
(encoded P/F in the scenario file names):

- valid template + nested quotes  -> all rows clean
- empty file / missing headers    -> file-level FAIL (V1/V4)
- duplicate headers (old templates / incorrect-version upload)
                                  -> file-level FAIL (V5)
- extra unknown column            -> additive evolution, still clean (V6)
- one of a conditional pair blank -> clean (V12 satisfied)
- both of the pair blank          -> every row quarantined (V12 fail)
"""

import os

import pytest

from dexspark.csv_ingest import ingest_csv
from dexspark.rulesets import load_ruleset

CORPUS = "/root/reference/sample-data/HL7v2 lab (COVID ELR)"
_SC = (
    "InterPartner~CELR~NYSTATE~AIMSPlatform~Prod~Prod~20200415082416800~STOP~V2_"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="reference corpus not present"
)


@pytest.fixture(scope="module")
def elr():
    rules, header = load_ruleset("elr_v2020_07_30")
    return rules, header


def _ingest(spark, elr, name):
    rules, header = elr
    return ingest_csv(spark, os.path.join(CORPUS, name), rules, **header)


def test_scenario_1_valid_template_clean(spark, elr):
    res = _ingest(spark, elr, _SC + "Scenario_1_CSV_template_20200730.csv")
    assert res.ok
    assert len(res.header) == 101
    assert res.clean.count() == 4
    assert res.quarantine.count() == 0


def test_nested_quotes_parse_clean(spark, elr):
    # AT_COVID_Valid_Nested Quotes: RFC 4180 doubled quotes everywhere,
    # including a triple-quoted specimen id on the last row
    res = _ingest(spark, elr, "AT_COVID_Valid_Nested Quotes_CSV File_V2020-07-30_V2.csv")
    assert res.ok
    rows = res.clean.collect()
    assert len(rows) == 4
    assert res.quarantine.count() == 0
    # raw cell is 7 quotes each side -> decodes to 3 literal quotes
    # (verified identical under Python's csv module)
    specimens = sorted(r["testing_lab_specimen_id"] for r in rows)
    assert '"""M00000595"""' in specimens
    labs = {r["testing_lab_name"] for r in rows}
    assert 'Public Health Laboratory, AR' in labs  # comma inside quotes
    assert '"""Public Health Laboratory, AR"""' in labs


def test_empty_file_fails_file_level(spark, elr):
    res = _ingest(spark, elr, "AT_COVID_Empty File_CSV File_V2020-07-30_V2.csv")
    assert not res.ok
    assert any(
        "header" in e.lower() or "file_empty" in e or "is empty" in e
        for e in res.file_errors
    )


def test_missing_headers_fails_file_level(spark, elr):
    res = _ingest(spark, elr, "AT_COVID_Missing Headers_CSV File_V2020-07-30_V2.csv")
    assert not res.ok
    assert any("header" in e.lower() for e in res.file_errors)


def test_incorrect_version_upload_fails(spark, elr):
    # old template: duplicate Instrument_instance_ID header (V5) and
    # V2020-04-18 version rows — rejected at the header gate, with the
    # PORTAL error text (XLSX sheet V2020-07-30, validation order 9)
    res = _ingest(spark, elr, "CSVUpload_incorrect version.csv")
    assert not res.ok
    assert any(
        e.startswith("Invalid Header: Duplicate column(s) present in the file:")
        for e in res.file_errors
    ), res.file_errors


def test_wrong_version_rows_get_portal_file_error(spark, elr, tmp_path):
    """A file with a VALID V2020-07-30 header whose rows carry the old
    version literal quarantines every row with the portal FILE_ERROR
    text, the received value interpolated (XLSX order 7)."""
    rules, header = elr
    known = header["known_columns"]
    body = ",".join(known)
    row = {c: "" for c in known}
    row.update(
        csv_file_version_no="V2020-04-18",
        specimen_collection_date_time="20200601",
        testing_lab_specimen_id="S1",
        test_date="20200601",
        ordering_provider_last_name="X",
        patient_state="NY",
        reporting_facility_name="F",
        specimen_type_free_text="swab",
        test_performed_description="PCR",
        test_result_number="1",
        testing_lab_name="L",
    )
    p = tmp_path / "wrong_version.csv"
    p.write_text(body + "\n" + ",".join(row[c] for c in known) + "\n")
    res = ingest_csv(spark, str(p), rules, **header)
    assert res.ok
    q = res.quarantine.collect()
    assert len(q) == 1
    assert (
        "FILE_ERROR - Invalid CSV file version - Received: [V2020-04-18] - "
        "Expected one of: V2020-07-30" in q[0]["fail_reasons"]
    ), q[0]["fail_reasons"]


def test_empty_file_portal_text(spark, elr, tmp_path):
    # a truly byte-empty file (the golden "Empty File" actually
    # carries a commas-only header and trips the duplicate gate)
    rules, header = elr
    p = tmp_path / "empty.csv"
    p.write_text("")
    res = ingest_csv(spark, str(p), rules, **header)
    assert not res.ok
    assert res.file_errors == ["File empty.csv is empty"], res.file_errors


def test_scenario_1a_old_template_duplicate_header_fails(spark, elr):
    res = _ingest(spark, elr, _SC + "Scenario_1a_CSV_template_20200706.csv")
    assert not res.ok


def test_scenario_1b_old_template_fails(spark, elr):
    res = _ingest(spark, elr, _SC + "Scenario_1b_CSV_template_OLD_PE.csv")
    assert not res.ok


def test_scenario_1c_extra_column_additive_clean(spark, elr):
    # 102 columns: one beyond the template -> tolerated additively (V6),
    # recorded in unknown_columns, rows still clean
    res = _ingest(spark, elr, _SC + "Scenario_1c_CSV_template_Update2_P.csv")
    assert res.ok
    assert res.unknown_columns
    assert res.clean.count() == 4
    assert res.quarantine.count() == 0


def test_scenario_2_specimen_id_blank_passes(spark, elr):
    # accession number present -> conditional pair satisfied
    res = _ingest(spark, elr, _SC + "Scenario_2_Testing_lab_specimen_ID-NodataP.csv")
    assert res.ok
    assert res.clean.count() == 4
    assert res.quarantine.count() == 0


def test_scenario_3_accession_blank_passes(spark, elr):
    res = _ingest(
        spark, elr, _SC + "Scenario_3_Testing_lab_accession_number_No_DataP.csv"
    )
    assert res.ok
    assert res.clean.count() == 4
    assert res.quarantine.count() == 0


def test_scenario_4_both_blank_quarantines_every_row(spark, elr):
    res = _ingest(
        spark,
        elr,
        _SC + "Scenario_4_Testing_lab_accession_number_Specimen_ID_missingF.csv",
    )
    assert res.ok  # header is fine; the failure is row-level
    assert res.clean.count() == 0
    q = res.quarantine.collect()
    assert len(q) == 4
    # the PORTAL message text from the XLSX ("Error message in
    # Portal", conditionally-required group), not the engine's
    # structured rule:col:detail form
    for r in q:
        assert any(
            x == "One of these fields must be populated with data: "
            "testing_lab_accession_number, testing_lab_specimen_id"
            for x in r["fail_reasons"]
        ), r["fail_reasons"]


# ---------------------------------------------------------------- GenV2

GENV2 = (
    "/root/reference/sample-data/HL7v2 case/"
    "GenV2 message as a CSV payload (code-generated template).csv"
)


@pytest.mark.skipif(not os.path.exists(GENV2), reason="GenV2 corpus not present")
def test_genv2_flattened_array_corpus(spark):
    """The reference's SECOND real corpus: a 177-column code-generated
    GenV2 template whose repeating groups are flattened into indexed
    column names (race_category[0].race_category, ... — sample-data/
    HL7v2 case/...(code-generated template).csv:1). Bracket/dot names
    must survive header normalization, rule compilation (backtick
    quoting), parsing, and row validation."""
    from dexspark.config import RuleSet

    rules = RuleSet(
        required=("source_format", "unique_case_id"),
        version_literal=(("message_profile_identifier", "Generic_MMG_V2.0"),),
        allowed_values=(
            ("race_category[0].race_category__code_system", ("CDCREC",)),
        ),
        conditional_groups=(
            ("race_category[0].race_category", "race_category[1].race_category"),
        ),
        regex_rules=(("race_category[0].race_category__code", r"^[0-9-]+$"),),
    )
    res = ingest_csv(
        spark,
        GENV2,
        rules,
        required_columns=(
            "source_format",
            "unique_case_id",
            "race_category[0].race_category",
        ),
    )
    assert res.ok, res.file_errors
    assert len(res.header) == 177
    assert "race_category[0].race_category" in res.header
    assert res.clean.count() == 1  # the template's single sample row passes
    assert res.quarantine.count() == 0
    row = res.clean.collect()[0]
    assert row["race_category[0].race_category"] == "White"
    assert row["unique_case_id"] == "48_GenV2_TC01"

    # and the rules really bite on these columns: break the version +
    # the indexed allowed-value in a copy and both reasons accumulate
    import csv as _csv
    import io as _io

    with open(GENV2) as f:
        rows = list(_csv.reader(f))
    hdr = [c.strip().lower() for c in rows[0]]
    bad = list(rows[1])
    bad[hdr.index("message_profile_identifier")] = "WRONG_VERSION"
    bad[hdr.index("race_category[0].race_category__code_system")] = "NOT_CDCREC"
    buf = _io.StringIO()
    w = _csv.writer(buf)
    w.writerow(rows[0])
    w.writerow(bad)
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix=".csv", delete=False, dir="/tmp"
    ) as tf:
        tf.write(buf.getvalue())
        broken = tf.name
    res2 = ingest_csv(spark, broken, rules)
    q = res2.quarantine.collect()
    assert len(q) == 1
    kinds = {r.split(":", 1)[0] for r in q[0]["fail_reasons"]}
    assert {"version", "allowed_values"} <= kinds
    os.unlink(broken)
