"""Archive fan-out mirror of Unit_FnDecompressor's matrix:
4-file nested zip happy path (:105-146), non-zip labeled zip
(:381-405), empty zip (:408-432)."""

import io
import os
import zipfile

import pytest
from pyspark.sql import functions as F

from dexspark.operators.decompress import read_and_explode


def _zip_bytes(entries: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries.items():
            zf.writestr(name, data)
    return buf.getvalue()


@pytest.fixture()
def archive_dir(tmp_path):
    inner = _zip_bytes({"c.csv": b"c1\n", "d/e.csv": b"e1\n"})
    nested = _zip_bytes({"a.csv": b"a1\n", "b.csv": b"b1\n", "inner.zip": inner})
    (tmp_path / "nested.zip").write_bytes(nested)
    (tmp_path / "fake.zip").write_bytes(b"this is not a zip archive")
    (tmp_path / "empty.zip").write_bytes(_zip_bytes({}))
    return str(tmp_path)


def test_nested_zip_yields_every_leaf(spark, archive_dir):
    out = read_and_explode(spark, archive_dir)
    rows = {
        (os.path.basename(r["source_path"]), r["entry_path"]): (
            bytes(r["content"]) if r["content"] is not None else None,
            r["error"],
        )
        for r in out.collect()
    }
    # 4-file nested happy path: every leaf, with provenance
    assert rows[("nested.zip", "a.csv")] == (b"a1\n", None)
    assert rows[("nested.zip", "b.csv")] == (b"b1\n", None)
    assert rows[("nested.zip", "inner.zip/c.csv")] == (b"c1\n", None)
    assert rows[("nested.zip", "inner.zip/d/e.csv")] == (b"e1\n", None)


def test_error_rows_for_bad_archives(spark, archive_dir):
    out = read_and_explode(spark, archive_dir)
    errs = {
        os.path.basename(r["source_path"]): r["error"]
        for r in out.filter(F.col("error").isNotNull()).collect()
    }
    assert "not a zip" in errs["fake.zip"]
    assert "empty zip" in errs["empty.zip"]


def test_depth_cap_emits_error_row(spark, tmp_path):
    bomb = _zip_bytes({"leaf.txt": b"x"})
    for _ in range(6):
        bomb = _zip_bytes({"b.zip": bomb})
    (tmp_path / "deep.zip").write_bytes(bomb)
    out = read_and_explode(spark, str(tmp_path), max_depth=3)
    rows = out.collect()
    assert len(rows) == 1
    assert "max depth 3 exceeded" in rows[0]["error"]
    assert rows[0]["content"] is None


def test_decompressed_bytes_cap_emits_error_row(spark, tmp_path):
    big = _zip_bytes({"a.txt": b"x" * 100, "b.txt": b"y" * 100})
    (tmp_path / "big.zip").write_bytes(big)
    out = read_and_explode(spark, str(tmp_path), max_total_bytes=150)
    rows = {r["entry_path"]: (r["content"], r["error"]) for r in out.collect()}
    # first entry fits the budget, second trips the cap
    contents = [v for v in rows.values() if v[1] is None]
    capped = [v for v in rows.values() if v[1] is not None]
    assert len(contents) == 1 and len(capped) == 1
    assert "decompressed-bytes cap exceeded" in capped[0][1]


def test_plan_is_arrow_batched(spark, archive_dir):
    plan = read_and_explode(spark, archive_dir)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_corrupt_entry_yields_error_row_not_job_failure(spark, tmp_path):
    """A zip with a valid end-record but corrupt member data (bad CRC)
    must produce a per-entry error row — one bad archive in a backfill
    must never abort the whole job."""
    good = _zip_bytes({"ok.csv": b"fine\n"})
    corrupt = bytearray(_zip_bytes({"bad.csv": b"payload-that-will-be-corrupted"}))
    # flip bytes inside the member data region (after the local header)
    corrupt[40:44] = b"\x00\x00\x00\x00"
    (tmp_path / "good.zip").write_bytes(good)
    (tmp_path / "corrupt.zip").write_bytes(bytes(corrupt))
    out = read_and_explode(spark, str(tmp_path)).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(os.path.basename(r["source_path"]), []).append(r)
    assert by_src["good.zip"][0]["error"] is None  # healthy neighbor unharmed
    errs = [r["error"] for r in by_src["corrupt.zip"] if r["error"]]
    assert errs and any("bad.csv" in e or "bad zip" in e for e in errs)


def test_duplicate_entry_names_disambiguated(spark, tmp_path):
    """A zip holding two entries with the SAME name (append-built
    archives) must yield two rows with distinct entry paths — not one
    content-addressed file where the last writer silently wins."""
    import warnings

    from dexspark.operators.decompress import materialize_entries, read_and_explode

    buf = io.BytesIO()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # zipfile warns on duplicates
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("data.csv", b"first\n")
            zf.writestr("data.csv", b"second\n")
    (tmp_path / "dup.zip").write_bytes(buf.getvalue())
    entries = read_and_explode(spark, str(tmp_path))
    rows = {r["entry_path"]: bytes(r["content"]) for r in entries.collect()}
    assert rows == {"data.csv": b"first\n", "data.csv#dup1": b"second\n"}
    # materialized scratch files are distinct too
    scratch = str(tmp_path / "scratch")
    manifest = materialize_entries(entries, scratch).collect()
    paths = {r["entry_path"]: r["file_path"] for r in manifest}
    assert len(set(paths.values())) == 2
    with open(paths["data.csv"], "rb") as f:
        assert f.read() == b"first\n"
    with open(paths["data.csv#dup1"], "rb") as f:
        assert f.read() == b"second\n"
