"""Shipped, codeless rule-set artifacts.

The reference requires validation rules to live outside code and be
hot-swappable (proof-of-concept/README.md:9-12); it ships three
encodings of the COVID-ELR rules (elr-schema.csvs, elr-schema.json,
JSON Schema). This package ships the engine's equivalent: one JSON doc
per rule-set, covering BOTH the file-level header contract (required /
known columns, additive-unknown policy — V4/V5/V6) and the row-level
RuleSet (V3 version literal, V10 max length, V11 required, V12
conditional groups) compiled to Column expressions at load.

Usage::

    rules, header = load_ruleset("elr_v2020_07_30")
    result = ingest_csv(spark, path, rules=rules, **header)
"""

from __future__ import annotations

import json
from importlib import resources

from ..config import RuleSet
from .loaders import (  # noqa: F401  (re-exported surface)
    load_csvs,
    load_json_schema,
    load_rule_list,
    load_schema_artifact,
)


def available_rulesets() -> list[str]:
    return sorted(
        r.name[:-5]
        for r in resources.files(__package__).iterdir()
        if r.name.endswith(".json") and not r.name.endswith(".schema.json")
    )


def load_ruleset(name: str) -> tuple[RuleSet, dict]:
    """Load a shipped rule-set: (row-level RuleSet, header kwargs for
    ``ingest_csv``: required_columns / known_columns / allow_unknown).

    Read via importlib.resources so the artifacts load identically
    from a source tree or from the spark-submit --py-files zip."""
    doc = json.loads(
        resources.files(__package__).joinpath(f"{name}.json").read_text()
    )
    rules = RuleSet.from_dict(doc.get("rules", {}))
    h = doc.get("header", {})
    header = {
        "required_columns": tuple(h.get("required_columns", ())),
        "known_columns": tuple(h.get("known_columns", ())) or None,
        "allow_unknown": bool(h.get("allow_unknown", True)),
    }
    return rules, header
