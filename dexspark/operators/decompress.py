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


# Zip-bomb guards: a deeply nested archive (zip quine) or a tiny
# archive expanding to huge payloads must produce an error row, not a
# RecursionError / executor OOM. Both caps are per-source-blob.
MAX_DEPTH = 8
MAX_TOTAL_BYTES = 1 << 30  # 1 GiB decompressed per source blob


def _explode_one(
    source: str,
    name: str,
    payload: bytes,
    out: list,
    depth: int = 0,
    budget: list | None = None,
    max_depth: int = MAX_DEPTH,
    max_total_bytes: int = MAX_TOTAL_BYTES,
    seen: dict | None = None,
) -> None:
    """Recurse into one payload; append (entry_path, bytes|None, err)."""
    if depth > max_depth:
        out.append((source, name, None, f"max depth {max_depth} exceeded: {name or source}"))
        return
    budget = budget if budget is not None else [max_total_bytes]
    # duplicate-name counter per SOURCE blob: a zip built by appending
    # can hold two entries with the same name; without disambiguation
    # they'd collapse to one content-addressed scratch file (last
    # writer silently wins) and one manifest key
    seen = seen if seen is not None else {}
    if not zipfile.is_zipfile(io.BytesIO(payload)):
        out.append((source, name, None, f"not a zip: {name or source}"))
        return
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except Exception as e:  # corrupt central directory etc.
        out.append((source, name, None, f"bad zip ({type(e).__name__}: {e}): {name or source}"))
        return
    with zf:
        entries = [i for i in zf.infolist() if not i.is_dir()]
        if not entries:
            out.append((source, name, None, f"empty zip: {name or source}"))
            return
        for info in entries:
            inner = posixpath.join(name, info.filename) if name else info.filename
            n = seen.get(inner, 0)
            seen[inner] = n + 1
            if n:
                inner = f"{inner}#dup{n}"
            budget[0] -= info.file_size
            if budget[0] < 0:
                out.append(
                    (source, inner, None, f"decompressed-bytes cap exceeded at: {inner}")
                )
                return
            try:
                # CRC errors, truncated streams, encrypted entries
                # (RuntimeError), unsupported compression methods
                # (NotImplementedError) — all must become an error ROW,
                # not a task failure: one bad archive in a 10^5-blob
                # backfill must not abort the whole job (the reference
                # emits FAIL events for these)
                data = zf.read(info)
            except Exception as e:
                out.append(
                    (source, inner, None, f"unreadable entry ({type(e).__name__}: {e}): {inner}")
                )
                continue
            if inner.lower().endswith(".zip"):
                _explode_one(
                    source, inner, data, out, depth + 1, budget, max_depth,
                    max_total_bytes, seen,
                )  # nested archive
            else:
                out.append((source, inner, data, None))


def explode_archives(
    blobs: DataFrame,
    max_depth: int = MAX_DEPTH,
    max_total_bytes: int = MAX_TOTAL_BYTES,
) -> DataFrame:
    """(path, content) -> one row per leaf entry, recursively.

    Errors (non-zip payload, empty archive) come back as rows with
    ``error`` set and null content — route them to quarantine like the
    reference's FAIL events; pass-through of non-archive blobs is the
    caller's choice via a pre-filter (content-type check,
    FnDecompressor.kt:118).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # yield per SOURCE BLOB, not per Arrow batch: the bytes cap
            # is per blob, so accumulating a whole batch's decompressed
            # payloads (binaryFile packs many small archives into one
            # partition) would hold batch_size x cap bytes in one
            # Python worker before anything is handed back to the JVM
            for path, content in zip(pdf["path"], pdf["content"]):
                rows: list = []
                _explode_one(
                    path,
                    "",
                    bytes(content or b""),
                    rows,
                    max_depth=max_depth,
                    max_total_bytes=max_total_bytes,
                )
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


MATERIALIZED_SCHEMA = T.StructType(
    [
        T.StructField("source_path", T.StringType(), False),
        T.StructField("entry_path", T.StringType(), True),
        T.StructField("file_path", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def materialize_entries(entries: DataFrame, out_dir: str) -> DataFrame:
    """Write each exploded entry's bytes to ``out_dir`` (executor-side,
    parallel, Arrow-batched) and return the manifest with a
    ``file_path`` instead of inline content.

    File names are content-addressed from (source, entry) so the write
    is idempotent under replay (tmp + atomic rename, same name every
    time). This is the bridge from archive fan-out to the per-file
    ingest path (FnDecompressor.kt:94-95 writes entries to
    id-prefixed blob paths the same way)."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            paths = []
            for src, entry, content in zip(
                pdf["source_path"], pdf["entry_path"], pdf["content"]
            ):
                if content is None:
                    paths.append(None)
                    continue
                digest = hashlib.sha1(f"{src}::{entry}".encode()).hexdigest()[:16]
                name = f"{digest}_{posixpath.basename(entry or 'entry')}"
                final = os.path.join(out_dir, name)
                tmp = final + f".tmp-{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(bytes(content))
                os.replace(tmp, final)
                paths.append(final)
            yield pd.DataFrame(
                {
                    "source_path": pdf["source_path"],
                    "entry_path": pdf["entry_path"],
                    "file_path": paths,
                    "n_bytes": pdf["n_bytes"],
                    "error": pdf["error"],
                }
            )

    return entries.mapInPandas(batches, schema=MATERIALIZED_SCHEMA)


def vacuum_scratch(
    out_dir: str,
    keep_paths,
    min_age_seconds: float = 0.0,
) -> dict:
    """GC the materialize_entries scratch dir.

    Entry files are content-addressed from (source, entry), so replay
    rewrites the same names — but entries whose source archive was
    removed/renamed, and temp files from crashed writers, accumulate
    forever without this. Removes every file not in ``keep_paths``
    (typically the current manifest's ``file_path`` column) and older
    than ``min_age_seconds`` (spare an in-flight materialization's
    fresh writes when GC runs concurrently)."""
    import os
    import time

    keep = {os.path.abspath(p) for p in keep_paths if p}
    removed = 0
    now = time.time()
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if not os.path.isfile(p) or os.path.abspath(p) in keep:
            continue
        if now - os.path.getmtime(p) < min_age_seconds:
            continue
        os.unlink(p)
        removed += 1
    return {"files_removed": removed}


def read_and_explode(
    spark: SparkSession,
    root: str,
    glob: str = "*.zip",
    max_depth: int = MAX_DEPTH,
    max_total_bytes: int = MAX_TOTAL_BYTES,
) -> DataFrame:
    """Scan a directory of archives and fan out all leaf entries."""
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", True)
        .load(root)
    )
    return explode_archives(blobs, max_depth=max_depth, max_total_bytes=max_total_bytes)
