"""Canonical schemas + schema-evolution reconciler.

The target table holds pre-tokenized training sequences
(BASELINE.json input_hint):

    sequences(doc_id string, tokens array<int>, n_tok int, source string)

Change events mirror the reference's event envelope — a lenient JSON
record with the raw line preserved alongside the parsed struct
(reference: fns-csv-pipeline FnDecompressor.kt:52-65 keeps
``rawEvents.zip(events)``; dtos/AzureBlobCreateEventMessage.kt:5 parses
leniently, ignoring unknown fields).

Evolution rules (north_star): additive nullable columns are accepted and
the table schema widens; integer types may widen (int -> bigint).
This mirrors the reference's header-reconciliation primitive
(digital-preservation-poc Entry.java:51-107 rewrites the schema against
the actual file header at runtime) and its "unknown headers may be
accepted" JSON path (proof-of-concept/README.md:102-105).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- sequences

def sequences_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.IntegerType(), True),
            T.StructField("source", T.StringType(), True),
        ]
    )


# ------------------------------------------------------------ change events

def payload_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
            T.StructField("n_tok", T.IntegerType(), True),
            T.StructField("source", T.StringType(), True),
        ]
    )


def change_event_schema(payload: T.StructType | None = None) -> T.StructType:
    """Schema of a parsed change-event envelope.

    op: insert|update|delete (unknown ops are skipped, not failed —
    reference FnDecompressor.kt:67-71 skips non-BlobCreated event types).
    (commit_ts, lsn) is the total order used for last-writer-wins dedup.
    """
    return T.StructType(
        [
            T.StructField("op", T.StringType(), True),
            T.StructField("doc_id", T.StringType(), True),
            T.StructField("payload", payload or payload_schema(), True),
            T.StructField("commit_ts", T.TimestampType(), True),
            T.StructField("lsn", T.LongType(), True),
            T.StructField("batch_epoch", T.LongType(), True),
            # optional partial-image mask (EngineConfig.patch_events):
            # the payload columns this event SETS; absent/null = full
            # image. Lenient parse: pre-existing binlogs read null.
            T.StructField("fields", T.ArrayType(T.StringType()), True),
        ]
    )


# ----------------------------------------------------------- evolution

_INT_WIDTH = {"byte": 1, "short": 2, "integer": 3, "long": 4}


def _widen(a: T.DataType, b: T.DataType, path: str) -> T.DataType:
    """Widened type accepting both ``a`` (table) and ``b`` (incoming)."""
    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    if an in _INT_WIDTH and bn in _INT_WIDTH:
        return a if _INT_WIDTH[an] >= _INT_WIDTH[bn] else b
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(_widen(a.elementType, b.elementType, path + ".element"), True)
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        return reconcile(a, b)
    raise SchemaEvolutionError(
        f"incompatible type change at {path!r}: table={a.simpleString()} "
        f"incoming={b.simpleString()} (only additive columns and integer "
        f"widening are supported)"
    )


class SchemaEvolutionError(ValueError):
    pass


def reconcile(
    table: T.StructType,
    incoming: T.StructType,
    aliases: dict[str, str] | None = None,
) -> T.StructType:
    """Merge an incoming batch schema into the table schema.

    - columns present in both: types must match or int-widen;
    - columns only in the table: kept (incoming rows get null);
    - columns only in the incoming batch: appended as nullable
      (additive evolution).

    Returns the evolved table schema. Raises SchemaEvolutionError for
    narrowing or non-integer type changes.

    Matching is CASE-INSENSITIVE (Spark's default resolution,
    spark.sql.caseSensitive=false): an incoming 'N_Tok' maps onto the
    table's 'n_tok' (keeping the table's canonical name) and widens it,
    instead of being appended as a case-variant duplicate — which
    Spark would then refuse to resolve (AMBIGUOUS_REFERENCE) on the
    very next select. Two incoming fields that collide after
    casefolding are rejected for the same reason.

    ``aliases`` (lowercased old name -> canonical current name) maps a
    RENAMED column's former names onto its current one, so a stale
    producer still emitting the pre-rename name evolves nothing — its
    values land in the renamed column instead of spawning a duplicate.
    """
    if aliases:
        incoming = T.StructType(
            [
                T.StructField(
                    aliases.get(f.name.lower(), f.name), f.dataType, f.nullable
                )
                for f in incoming.fields
            ]
        )
    by_name: dict[str, T.StructField] = {}
    for f in incoming.fields:
        k = f.name.lower()
        if k in by_name:
            raise SchemaEvolutionError(
                f"incoming schema has case-colliding columns "
                f"{by_name[k].name!r} and {f.name!r} (Spark resolves "
                f"case-insensitively; they would be ambiguous)"
            )
        by_name[k] = f
    out: list[T.StructField] = []
    for f in table.fields:
        g = by_name.pop(f.name.lower(), None)
        if g is None:
            # incoming rows get null for this column, so the evolved
            # schema must not keep claiming non-nullability — the data
            # would violate it
            out.append(T.StructField(f.name, f.dataType, True))
        else:
            out.append(T.StructField(f.name, _widen(f.dataType, g.dataType, f.name), f.nullable or g.nullable))
    for f in incoming.fields:  # preserve incoming order for new columns
        if f.name.lower() in by_name:
            out.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(out)


def evolution_actions(
    table: T.StructType,
    incoming: T.StructType,
    aliases: dict[str, str] | None = None,
) -> list[str]:
    """Human/lineage-readable description of what reconcile() changed."""
    evolved = reconcile(table, incoming, aliases)
    actions = []
    old = {f.name: f.dataType for f in table.fields}
    for f in evolved.fields:
        if f.name not in old:
            actions.append(f"add column {f.name} {f.dataType.simpleString()}")
        elif old[f.name] != f.dataType:
            actions.append(
                f"widen {f.name} {old[f.name].simpleString()} -> {f.dataType.simpleString()}"
            )
    return actions


# ----------------------------------------------------------- headers
# The reference's header rules (XLSX order 8-10) + normalization
# (elr-schema.csvs:3 @ignoreColumnNameCase; trailing-whitespace headers
# tolerated, digital-preservation-poc Entry.java:89-98).


class HeaderError(ValueError):
    """Header gate violation. ``kind``/``names`` carry the structured
    cause so callers can re-render with a portal message template
    (csv_ingest: RuleSet.messages)."""

    kind: str = "header"
    names: tuple = ()

    @classmethod
    def of(cls, kind: str, names, message: str) -> "HeaderError":
        e = cls(message)
        e.kind = kind
        e.names = tuple(names)
        return e


def normalize_columns(df):
    """V7: case-insensitive, whitespace-tolerant header normalization."""
    return df.toDF(*[c.strip().lower() for c in df.columns])


def check_headers(
    columns: list[str],
    required: tuple[str, ...] = (),
    known: tuple[str, ...] | None = None,
    allow_unknown: bool = True,
) -> list[str]:
    """V4 required-columns-present, V5 no-duplicate-headers,
    V6 unknown-headers policy (the JSON path ignores unknowns, the
    csv-schema path rejects them — proof-of-concept/README.md:97-105;
    here unknown+nullable = additive evolution when allowed).

    Returns the list of unknown columns (candidates for evolution);
    raises HeaderError on missing/duplicate (+unknown when disallowed).
    """
    norm = [c.strip().lower() for c in columns]
    seen, dups = set(), []
    for c in norm:
        if c in seen:
            dups.append(c)
        seen.add(c)
    if dups:
        raise HeaderError.of(  # V5
            "header_duplicate", sorted(set(dups)),
            f"duplicate headers: {sorted(set(dups))}",
        )
    missing = [r for r in required if r.lower() not in seen]
    if missing:
        raise HeaderError.of(  # V4
            "header_missing", missing, f"missing required headers: {missing}"
        )
    unknown = []
    if known is not None:
        unknown = [c for c in norm if c not in {k.lower() for k in known}]
        if unknown and not allow_unknown:
            raise HeaderError.of(  # V6 strict
                "header_unknown", unknown, f"unknown headers: {unknown}"
            )
    return unknown
