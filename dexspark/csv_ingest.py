"""CSV file ingest + validation — the reference's home domain.

Re-expresses the DEX CSV building block's file/row validation as one
declarative Spark pipeline, so a user of the reference can point this
engine at the same files and rule-sets:

- file-type / listing classification lives in `listing.py` (F1/F2);
- RFC 4180 parse with per-row corrupt-record channel
  (V2 — XLSX order 1-2; reference parser choice
  proof-of-concept/README.md:124, `CSVFormat.RFC4180` in
  custom-poc CompParEntry.java:26);
- file-level checks: not-empty (V1 — XLSX order 3-5), required /
  duplicate / unknown headers (V4/V5/V6 — XLSX order 8-10) after
  case+whitespace normalization (V7 — elr-schema.csvs:3
  @ignoreColumnNameCase, digital-preservation Entry.java:89-98);
- row-level rules compiled from the same codeless RuleSet as the CDC
  path (V3 version literal, V8 column count via the corrupt channel,
  V9 blank rows, V10-V15) accumulating ALL violated rules per row
  (V17, ExternalFunctions.java:9-16) into ``fail_reasons``;
- output is the reference's 3-way lifecycle: clean rows ("processed"),
  quarantined rows with reasons ("error" container), and file-level
  errors (the pipeline's FAIL events).

Everything is DataFrame-native: the only driver-side I/O is reading
the single header line.
"""

from __future__ import annotations

import csv
import io
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .config import RuleSet
from .schema import HeaderError, check_headers
from .validate import FAIL_COL, fail_reasons_column

_CORRUPT = "_corrupt"


@dataclass
class CsvIngestResult:
    clean: DataFrame | None
    quarantine: DataFrame | None
    file_errors: list[str] = field(default_factory=list)
    header: list[str] = field(default_factory=list)
    unknown_columns: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.file_errors


_PROBE_LINES = 17


def _read_header_probe(spark: SparkSession, path: str) -> tuple[str | None, bool | None]:
    """One tiny job for BOTH file-level reads: the header line plus a
    has-data probe. Returns (header_line, has_data) where has_data is
    True (some non-blank line follows the header), False (the whole
    file was read and nothing follows), or None (inconclusive: more
    than _PROBE_LINES lines, all-blank tail so far — caller falls
    back to a count job; pathological case only)."""
    rows = spark.read.text(path).limit(_PROBE_LINES).collect()
    if not rows:
        return None, False
    rest = [r[0] for r in rows[1:]]
    if any(line.strip() for line in rest):
        return rows[0][0], True
    return rows[0][0], (None if len(rows) == _PROBE_LINES else False)


def ingest_csv(
    spark: SparkSession,
    path: str,
    rules: RuleSet | None = None,
    required_columns: tuple[str, ...] = (),
    known_columns: tuple[str, ...] | None = None,
    allow_unknown: bool = True,
) -> CsvIngestResult:
    """Validate one CSV file into (clean, quarantine, file_errors).

    File-level failures (empty file, header violations) short-circuit
    with ``clean=None`` — mirroring the reference's move-to-error of
    the whole blob (FnDecompressor.kt:109). Row-level failures land in
    ``quarantine`` with ``fail_reasons`` + the raw corrupt text when
    the parser itself rejected the row; all other rows stream through
    ``clean`` with the normalized header.
    """
    rules = rules or RuleSet()
    res = CsvIngestResult(clean=None, quarantine=None)

    header_line, has_data = _read_header_probe(spark, path)
    if header_line is None or header_line.strip() == "":
        res.file_errors.append("file_empty:no header row")  # V1 / XLSX order-3
        return res
    # one line, driver-side: proper RFC 4180 header split
    raw_header = next(csv.reader(io.StringIO(header_line)))
    header = [c.strip().lower() for c in raw_header]  # V7
    res.header = header
    try:
        res.unknown_columns = check_headers(  # V4 / V5 / V6
            raw_header,
            required=required_columns,
            known=known_columns,
            allow_unknown=allow_unknown,
        )
    except HeaderError as e:
        res.file_errors.append(f"header:{e}")
        return res

    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in header]
        + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("enforceSchema", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        # RFC 4180: quotes escaped by doubling (nested-quote golden
        # file must parse clean), not by backslash
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )

    data_schema = T.StructType([f for f in schema.fields if f.name != _CORRUPT])
    rule_fails = fail_reasons_column(rules, data_schema)
    blank = F.trim(F.concat_ws("", *[F.col(c) for c in header])) == ""  # V9
    fails = F.array_compact(
        F.concat(
            rule_fails,
            F.array(
                F.when(
                    F.col(_CORRUPT).isNotNull(),
                    F.lit("parse:row:malformed CSV record"),  # V2/V8
                ),
                F.when(blank, F.lit("blank_row:row:all fields empty")),
            ),
        )
    )
    tagged = df.withColumn(FAIL_COL, fails)
    # V1 (no data rows): normally already answered by the header
    # probe's tail — the count job runs only in the pathological
    # all-blank-tail-beyond-probe case.
    if has_data is None:
        has_data = tagged.limit(1).count() > 0
    if not has_data:
        res.file_errors.append("file_empty:no data rows")  # V1 / XLSX order-4
        return res
    res.clean = tagged.filter(F.size(FAIL_COL) == 0).drop(FAIL_COL, _CORRUPT)
    res.quarantine = tagged.filter(F.size(FAIL_COL) > 0)
    return res


@dataclass
class ArchiveIngestResult:
    """Result of the reference's production flow: zip blob(s) ->
    recursive entry fan-out -> per-CSV validation (FnDecompressor.kt:
    115-150 unzips then dispatches each entry onward)."""

    per_entry: dict  # (source_path, entry_path) -> CsvIngestResult
    archive_errors: list  # (source_path, entry_path, error) FAIL events
    skipped: list = field(default_factory=list)  # non-CSV leaf entries

    @property
    def ok(self) -> bool:
        return not self.archive_errors and all(
            r.ok for r in self.per_entry.values()
        )


def ingest_archives(
    spark: SparkSession,
    root: str,
    rules: RuleSet | None = None,
    scratch: str | None = None,
    glob: str = "*.zip",
    **header_kwargs,
) -> ArchiveIngestResult:
    """One entry point for the reference's unzip-then-validate flow.

    Archives under ``root`` fan out recursively (executor-side,
    Arrow-batched — operators/decompress.py), leaf entries are
    materialized to ``scratch`` in parallel, then each CSV entry runs the
    full file/row validation of :func:`ingest_csv`. Archive-level
    errors (non-zip payload, empty zip, depth bomb) surface as FAIL
    records exactly like the reference's error-container events.

    The driver loop is O(entries-per-archive-batch) — in production
    each blob arrives as its own event (the loop IS the event
    dispatcher); all heavy work (decompress, parse, validate) stays
    distributed.
    """
    import tempfile

    from .operators.decompress import materialize_entries, read_and_explode

    scratch = scratch or tempfile.mkdtemp(prefix="dexspark-entries-")
    entries = read_and_explode(spark, root, glob=glob)
    manifest = materialize_entries(entries, scratch).collect()

    per_entry: dict = {}
    archive_errors: list = []
    skipped: list = []
    for r in manifest:
        key = (r["source_path"], r["entry_path"])
        if r["error"] is not None:
            archive_errors.append((r["source_path"], r["entry_path"], r["error"]))
        elif (r["entry_path"] or "").lower().endswith(".csv"):
            per_entry[key] = ingest_csv(spark, r["file_path"], rules, **header_kwargs)
        else:
            skipped.append(key)
    return ArchiveIngestResult(per_entry, archive_errors, skipped)
