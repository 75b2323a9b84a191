"""Loaders for the reference's own codeless-schema artifacts.

The reference's stated requirement is that validation rules live
OUTSIDE code and are hot-swappable (proof-of-concept/README.md:9-12),
and it ships the same COVID-ELR semantics in three encodings:

1. **CSV-Schema 1.1 DSL** (``.csvs``) — digital-preservation-poc
   ``src/main/resources/validatorpoc/elr-schema.csvs:1-107``
   (``version 1.1``, ``@totalColumns 101``, ``@ignoreColumnNameCase``,
   per-column ``notEmpty`` and conditional
   ``if($other/empty and $more/empty, notEmpty)`` rules; runtime
   header reconciliation in ``Entry.java:51-107``).
2. **JSON rule list** — custom-poc
   ``src/main/resources/validatorpoc/elr-schema.json:1-16``
   (``validations`` entries keyed ``Required Fields`` /
   ``Conditionally Required Fields``).
3. **JSON Schema 2020-12** — parse-compare synthesizes
   ``{"allOf": [{"required": [...]}, {"anyOf": [{"required": [a]},
   {"required": [b]}]}]}`` over all-string properties
   (``ValidateEntry.java:63-73``).

Each loader here parses one encoding into the engine's
``(RuleSet, header-kwargs)`` contract — the exact pair
:func:`dexspark.rulesets.load_ruleset` returns — so a DEX team can
point ``ingest_csv`` at the schema artifact they already maintain,
unmodified.  Mapping table (JSON Schema per the 2020-12 vocabulary;
CSV-Schema per the csv-schema 1.1 grammar):

    =======================  =============================
    artifact construct       RuleSet field
    =======================  =============================
    notEmpty / required /    ``required``
    minLength >= 1
    if($a/empty…, notEmpty)  ``conditional_groups``
    anyOf-of-required        ``conditional_groups``
    is("x") [or is("y")]…    ``allowed_values``
    enum                     ``allowed_values``
    const                    ``version_literal``
    regex("p")               ``regex_rules`` (anchored: the
                             CSV-Schema ``regex`` is a full
                             match; Spark ``rlike`` is not)
    pattern                  ``regex_rules`` (unanchored: JSON
                             Schema ``pattern`` is a substring
                             match, same as ``rlike``)
    length(*, n) / maxLength ``max_length``
    =======================  =============================

Header contract: the CSV-Schema encoding declares EVERY column (the
digital-preservation PoC rewrites the schema against the actual file
header at runtime, case-insensitively, tolerating extras additively —
``Entry.java:89-98``), so all declared columns become
``required_columns`` and ``allow_unknown`` stays True.  JSON Schema
``properties`` become ``known_columns``; names listed in a top-level
or ``allOf`` ``required`` become ``required_columns``;
``"additionalProperties": false`` turns ``allow_unknown`` off.

Unsupported constructs RAISE (``ValueError``) rather than silently
dropping a rule — a validation gate that vanishes on load is a data
quality incident, not a convenience.

All column names are normalized the way the ingest path normalizes
headers (``schema.normalize_columns``: strip + lowercase), which also
absorbs the reference schema's trailing-whitespace names
(``"patient_occupation "``, ``elr-schema.csvs:7-8``).
"""

from __future__ import annotations

import json
import re

from ..config import RuleSet

__all__ = [
    "load_csvs",
    "load_json_schema",
    "load_rule_list",
    "load_schema_artifact",
]


def _norm(name: str) -> str:
    return name.strip().strip('"').strip().lower()


# --------------------------------------------------------------- .csvs

_DIRECTIVE = re.compile(r"@(\w+)\s*(.*)$")
_COLUMN = re.compile(r'^("(?:[^"]*)"|[^@"\s][^:]*):\s*(.*)$')
_IF_RULE = re.compile(r"if\(\s*(.+?)\s*,\s*notEmpty\s*\)$")
_EMPTY_REF = re.compile(r"\$([^/\s]+)/empty$")
_IS_TERM = re.compile(r'is\(\s*"([^"]*)"\s*\)$')
_REGEX_RULE = re.compile(r'regex\(\s*"(.*)"\s*\)$')
_LENGTH_RULE = re.compile(r"length\(\s*(\*|\d+)\s*,\s*(\d+)\s*\)$")


def _strip_csvs_comments(text: str) -> str:
    """Remove ``/* ... */`` blocks and ``//`` line comments (quote-
    aware: a ``//`` inside a quoted string — e.g. a regex — stays)."""
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    out_lines = []
    for line in text.splitlines():
        in_q = False
        cut = len(line)
        for i, ch in enumerate(line):
            if ch == '"':
                in_q = not in_q
            elif not in_q and ch == "/" and line[i : i + 2] == "//":
                cut = i
                break
        out_lines.append(line[:cut])
    return "\n".join(out_lines)


def _parse_csvs_rule(col: str, text: str, acc: dict) -> None:
    t = text.strip()
    if not t:
        return
    if t == "notEmpty":
        acc["required"].append(col)
        return
    m = _IF_RULE.fullmatch(t)
    if m:
        refs = []
        for part in re.split(r"\s+and\s+", m.group(1)):
            pm = _EMPTY_REF.fullmatch(part.strip())
            if not pm:
                raise ValueError(
                    f"unsupported CSV-Schema condition for {col!r}: "
                    f"{part.strip()!r} (only $col/empty conjunctions)"
                )
            refs.append(_norm(pm.group(1)))
        group = tuple(sorted(set(refs) | {col}))
        if group not in acc["groups"]:
            acc["groups"].append(group)
        return
    terms = [x.strip() for x in re.split(r"\s+or\s+", t)]
    is_terms = [_IS_TERM.fullmatch(x) for x in terms]
    if all(is_terms):
        acc["allowed"].append((col, tuple(m.group(1) for m in is_terms)))
        return
    m = _REGEX_RULE.fullmatch(t)
    if m:
        # CSV-Schema regex is a FULL match; rlike is a substring match
        acc["regex"].append((col, f"^(?:{m.group(1)})$"))
        return
    m = _LENGTH_RULE.fullmatch(t)
    if m:
        if m.group(1) not in ("*", "0"):
            raise ValueError(
                f"unsupported CSV-Schema length() for {col!r}: {t!r} "
                "(only length(*, max) / length(0, max))"
            )
        acc["max_length"].append((col, int(m.group(2))))
        return
    raise ValueError(f"unsupported CSV-Schema rule for {col!r}: {t!r}")


def load_csvs(text: str) -> tuple[RuleSet, dict]:
    """Parse a CSV-Schema 1.1 document (the subset the reference's
    ``elr-schema*.csvs`` files use, plus ``is``/``regex``/``length``)
    into ``(RuleSet, header kwargs for ingest_csv)``.

    Reference grammar anchors: prolog ``version 1.1`` + ``@totalColumns``
    + ``@ignoreColumnNameCase`` (``elr-schema.csvs:1-3``), column
    definitions with optional rules (``elr-schema.csvs:7-107``)."""
    body = _strip_csvs_comments(text)
    columns: list[str] = []
    acc: dict = {
        "required": [],
        "groups": [],
        "allowed": [],
        "regex": [],
        "max_length": [],
    }
    total_columns = None
    saw_version = False
    for raw in body.splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith("version "):
            saw_version = True
            if line.split()[1] not in ("1.0", "1.1", "1.2"):
                raise ValueError(f"unsupported CSV-Schema version: {line!r}")
            continue
        if line.startswith("@"):
            m = _DIRECTIVE.match(line)
            name = m.group(1) if m else line
            if name == "totalColumns":
                total_columns = int(m.group(2))
            elif name in ("ignoreColumnNameCase", "permitEmpty"):
                pass  # ignoreColumnNameCase == the engine's V7 normalize
            else:
                raise ValueError(f"unsupported CSV-Schema directive: {line!r}")
            continue
        m = _COLUMN.match(line)
        if not m:
            raise ValueError(f"unparseable CSV-Schema line: {line!r}")
        col = _norm(m.group(1))
        if not col:
            raise ValueError(f"empty column name in line: {line!r}")
        columns.append(col)
        _parse_csvs_rule(col, m.group(2), acc)
    if not saw_version:
        raise ValueError("not a CSV-Schema document (no 'version' prolog)")
    if total_columns is not None and total_columns != len(columns):
        raise ValueError(
            f"@totalColumns {total_columns} but {len(columns)} column "
            "definitions parsed"
        )
    rules = RuleSet(
        required=tuple(acc["required"]),
        conditional_groups=tuple(acc["groups"]),
        allowed_values=tuple(acc["allowed"]),
        regex_rules=tuple(acc["regex"]),
        max_length=tuple(acc["max_length"]),
    )
    header = {
        # every declared column must be present (the @totalColumns /
        # header-reconciliation contract, Entry.java:51-107); extras
        # are tolerated additively like the golden Scenario_1c
        "required_columns": tuple(columns),
        "known_columns": tuple(columns),
        "allow_unknown": True,
    }
    return rules, header


# ----------------------------------------------------- JSON Schema 2020-12


def load_json_schema(doc: str | dict) -> tuple[RuleSet, dict]:
    """Parse a JSON Schema 2020-12 object schema of the shape the
    parse-compare finalist builds (``ValidateEntry.java:63-73``):
    all-string ``properties`` + ``allOf`` of ``required`` /
    ``anyOf``-of-``required`` — plus the standard per-property
    vocabulary (``pattern``, ``enum``, ``const``, ``maxLength``,
    ``minLength``)."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    if doc.get("type", "object") != "object":
        raise ValueError("only object schemas validate CSV rows")

    required: list[str] = []
    groups: list[tuple[str, ...]] = []
    allowed: list[tuple[str, tuple]] = []
    regexes: list[tuple[str, str]] = []
    max_length: list[tuple[str, int]] = []
    version: list[tuple[str, str]] = []
    known: list[str] = []

    def walk(node: dict) -> None:
        for name in node.get("required", ()):
            n = _norm(name)
            if n not in required:
                required.append(n)
        for branch in node.get("allOf", ()):
            walk(branch)
        if "anyOf" in node:
            members: list[str] = []
            for alt in node["anyOf"]:
                alt_req = alt.get("required", ())
                if set(alt) - {"required"} or len(alt_req) != 1:
                    raise ValueError(
                        "unsupported anyOf branch (only single-"
                        f"'required' alternatives): {alt!r}"
                    )
                members.append(_norm(alt_req[0]))
            group = tuple(sorted(set(members)))
            if group not in groups:
                groups.append(group)
        for bad in ("oneOf", "not", "if"):
            if bad in node:
                raise ValueError(f"unsupported JSON Schema keyword: {bad!r}")

    walk(doc)
    # header-level required = the 'required' keyword's names (presence
    # in the file); minLength-derived entries below are row-level only
    header_required = tuple(required)
    for name, prop in doc.get("properties", {}).items():
        col = _norm(name)
        known.append(col)
        if not isinstance(prop, dict):
            raise ValueError(f"unsupported property schema for {name!r}")
        if prop.get("type", "string") != "string":
            raise ValueError(
                f"non-string property {name!r}: CSV cells are strings"
            )
        if "const" in prop:
            version.append((col, str(prop["const"])))
        if "enum" in prop:
            allowed.append((col, tuple(str(v) for v in prop["enum"])))
        if "pattern" in prop:
            # JSON Schema pattern is UNanchored, same as rlike
            regexes.append((col, prop["pattern"]))
        if "maxLength" in prop:
            max_length.append((col, int(prop["maxLength"])))
        if int(prop.get("minLength", 0)) >= 1 and col not in required:
            required.append(col)

    rules = RuleSet(
        required=tuple(required),
        conditional_groups=tuple(groups),
        allowed_values=tuple(allowed),
        regex_rules=tuple(regexes),
        max_length=tuple(max_length),
        version_literal=tuple(version),
    )
    header = {
        "required_columns": header_required,
        "known_columns": tuple(known) or None,
        "allow_unknown": doc.get("additionalProperties", True) is not False,
    }
    return rules, header


# ------------------------------------------------- custom-poc rule list


def load_rule_list(doc: str | dict) -> tuple[RuleSet, dict]:
    """Parse the custom-poc JSON rule list (``elr-schema.json:1-16``):
    ``{"validations": [{"key": "Required Fields", "value": [...]},
    {"key": "Conditionally Required Fields", "value": [[...], ...]}]}``."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    required: list[str] = []
    groups: list[tuple[str, ...]] = []
    for entry in doc.get("validations", ()):
        key, value = entry.get("key"), entry.get("value", ())
        if key == "Required Fields":
            required.extend(_norm(v) for v in value)
        elif key == "Conditionally Required Fields":
            for grp in value:
                groups.append(tuple(sorted(_norm(g) for g in grp)))
        else:
            raise ValueError(f"unsupported validation key: {key!r}")
    rules = RuleSet(
        required=tuple(required), conditional_groups=tuple(groups)
    )
    header = {
        "required_columns": tuple(required),
        "known_columns": None,
        "allow_unknown": True,
    }
    return rules, header


# ------------------------------------------------------------ dispatch


def load_schema_artifact(path: str) -> tuple[RuleSet, dict]:
    """Load any supported schema artifact by sniffing its encoding:
    ``.csvs`` → CSV-Schema 1.1; JSON with ``validations`` → custom-poc
    rule list; JSON with ``properties``/``allOf``/``$schema`` → JSON
    Schema 2020-12; JSON with ``rules``/``header`` → the engine's own
    encoding (``load_ruleset`` format)."""
    with open(path) as f:
        text = f.read()
    if path.endswith(".csvs") or text.lstrip().startswith("version "):
        return load_csvs(text)
    doc = json.loads(text)
    if "validations" in doc:
        return load_rule_list(doc)
    if "rules" in doc or "header" in doc:
        rules = RuleSet.from_dict(doc.get("rules", {}))
        h = doc.get("header", {})
        return rules, {
            "required_columns": tuple(h.get("required_columns", ())),
            "known_columns": tuple(h.get("known_columns", ())) or None,
            "allow_unknown": bool(h.get("allow_unknown", True)),
        }
    if "properties" in doc or "allOf" in doc or "$schema" in doc:
        return load_json_schema(doc)
    raise ValueError(f"unrecognized schema artifact: {path}")
