"""Header rules V4/V5/V6/V7 (XLSX order 8-10 + csvs normalization)."""

import pytest

from dexspark.schema import HeaderError, check_headers, normalize_columns


def test_normalize(spark):
    df = spark.createDataFrame([(1, 2)], ["Patient_ID ", "  LANG"])
    assert normalize_columns(df).columns == ["patient_id", "lang"]


def test_required_missing():
    with pytest.raises(HeaderError, match="missing required"):
        check_headers(["a", "b"], required=("a", "c"))


def test_duplicates_rejected():
    with pytest.raises(HeaderError, match="duplicate"):
        check_headers(["a", "A ", "b"])  # case/space-insensitive dup


def test_unknown_policy():
    # lenient (JSON path): unknowns returned for additive evolution
    assert check_headers(["a", "x"], known=("a",)) == ["x"]
    # strict (csv-schema path): unknowns rejected
    with pytest.raises(HeaderError, match="unknown"):
        check_headers(["a", "x"], known=("a",), allow_unknown=False)


def test_happy_path():
    assert check_headers(["A", "b"], required=("a",), known=("a", "b")) == []
