"""Recursive archive fan-out: 1 blob -> N entry rows (SURVEY S6).

Mirrors FnDecompressor's stream-unzip (fns-csv-pipeline
FnDecompressor.kt:118-150,199-245): zip payloads explode into one row
per file entry, recursing into nested ``.zip`` entries, skipping
directory entries, and flagging empty archives and non-zip payloads
labeled as zip (the reference emits FAIL events for both,
Unit_FnDecompressor.kt:381-432).

Spark-first shape: ``spark.read.format("binaryFile")`` scans the
blobs; the explode runs in ``mapInPandas`` over Arrow batches (the
bytes never round-trip through per-row Python UDF calls — one Python
invocation per batch, stdlib ``zipfile`` per payload). Output carries
full parent provenance (source path per entry) like the reference's
OK events carry their parent envelope.
"""

from __future__ import annotations

import io
import posixpath
import zipfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("source_path", T.StringType(), False),
        T.StructField("entry_path", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def _explode_one(source: str, name: str, payload: bytes, out: list) -> None:
    """Recurse into one payload; append (entry_path, bytes|None, err)."""
    if not zipfile.is_zipfile(io.BytesIO(payload)):
        out.append((source, name, None, f"not a zip: {name or source}"))
        return
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        entries = [i for i in zf.infolist() if not i.is_dir()]
        if not entries:
            out.append((source, name, None, f"empty zip: {name or source}"))
            return
        for info in entries:
            inner = posixpath.join(name, info.filename) if name else info.filename
            data = zf.read(info)
            if inner.lower().endswith(".zip"):
                _explode_one(source, inner, data, out)  # nested archive
            else:
                out.append((source, inner, data, None))


def explode_archives(blobs: DataFrame) -> DataFrame:
    """(path, content) -> one row per leaf entry, recursively.

    Errors (non-zip payload, empty archive) come back as rows with
    ``error`` set and null content — route them to quarantine like the
    reference's FAIL events; pass-through of non-archive blobs is the
    caller's choice via a pre-filter (content-type check,
    FnDecompressor.kt:118).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list = []
            for path, content in zip(pdf["path"], pdf["content"]):
                _explode_one(path, "", bytes(content or b""), rows)
            yield pd.DataFrame(
                {
                    "source_path": [r[0] for r in rows],
                    "entry_path": [r[1] or None for r in rows],
                    "content": [r[2] for r in rows],
                    "n_bytes": [len(r[2]) if r[2] is not None else None for r in rows],
                    "error": [r[3] for r in rows],
                }
            )

    return blobs.select("path", "content").mapInPandas(batches, schema=ENTRY_SCHEMA)


def read_and_explode(spark: SparkSession, root: str, glob: str = "*.zip") -> DataFrame:
    """Scan a directory of archives and fan out all leaf entries."""
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", True)
        .load(root)
    )
    return explode_archives(blobs)
