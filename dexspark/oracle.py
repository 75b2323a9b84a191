"""Single-threaded reference oracle: replay the binlog in pure Python.

Semantics mirror the engine 1:1 (and thereby the reference pipeline's
per-event error isolation, FnDecompressor.kt:42-169):

- malformed JSON / missing envelope fields -> quarantined, batch continues;
- unknown op -> skipped silently (FnDecompressor.kt:67-71);
- payload rules (required V11, n_tok==len V8, token-range V10, source
  whitelist V13) -> quarantined;
- remaining events applied in (commit_ts, lsn) total order:
  insert/update = upsert, delete = remove (delete of absent key is a
  recorded no-op, FnDecompressor.kt:98-101).

Deliberately naive — dict + sorted list — so it cannot share a bug
with the distributed path. Used by tests for full-table per-doc_id
token-array equality (BASELINE.json input_hint).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field

from .config import RuleSet, sequences_ruleset

_REQUIRED_ENVELOPE = ("op", "doc_id", "commit_ts", "lsn", "batch_epoch")


@dataclass
class OracleResult:
    state: dict[str, dict] = field(default_factory=dict)
    quarantined: int = 0
    skipped: int = 0
    applied: int = 0
    delete_noops: int = 0


def _valid_payload(doc_id, payload: dict | None, rules: RuleSet) -> bool:
    row = dict(payload or {})
    row["doc_id"] = doc_id
    for col in rules.required:
        v = row.get(col)
        if v is None or (isinstance(v, str) and v.strip() == ""):
            return False
    for len_col, arr_col in rules.length_equals:
        toks, n = row.get(arr_col), row.get(len_col)
        if toks is None or n is None or len(toks) != n:
            return False
    for col, lo, hi in rules.token_range:
        toks = row.get(col)
        if toks is not None and any(t is None or t < lo or t >= hi for t in toks):
            return False
    for col, allowed in rules.allowed_values:
        v = row.get(col)
        if v is not None and v not in allowed:
            return False
    return True


def replay(
    binlog_dir_or_files,
    base_state: dict[str, dict] | None = None,
    rules: RuleSet | None = None,
) -> OracleResult:
    rules = rules or sequences_ruleset()
    if isinstance(binlog_dir_or_files, str):
        files = sorted(glob.glob(os.path.join(binlog_dir_or_files, "*.ndjson")))
    else:
        files = list(binlog_dir_or_files)

    res = OracleResult(state=dict(base_state or {}))
    applicable = []
    for path in files:
        with open(path) as f:
            for line in f:
                line = line.rstrip("\n")
                if line.strip() == "":
                    res.skipped += 1
                    continue
                try:
                    ev = json.loads(line)
                    if not isinstance(ev, dict):
                        raise ValueError
                except ValueError:
                    res.quarantined += 1
                    continue
                if any(ev.get(k) is None for k in _REQUIRED_ENVELOPE):
                    res.quarantined += 1
                    continue
                # negative epochs are rejected (can never be made
                # idempotent — matches events._finalize)
                if isinstance(ev["batch_epoch"], int) and ev["batch_epoch"] < 0:
                    res.quarantined += 1
                    continue
                if ev["op"] not in rules.op_whitelist:
                    res.skipped += 1
                    continue
                if ev["op"] != "delete" and not _valid_payload(
                    ev["doc_id"], ev.get("payload"), rules
                ):
                    res.quarantined += 1
                    continue
                applicable.append(ev)

    # ISO-8601 strings sort identically to their timestamps.
    applicable.sort(key=lambda e: (e["commit_ts"], e["lsn"]))
    for ev in applicable:
        res.applied += 1
        if ev["op"] == "delete":
            if ev["doc_id"] in res.state:
                del res.state[ev["doc_id"]]
            else:
                res.delete_noops += 1
        else:
            res.state[ev["doc_id"]] = dict(ev["payload"])
    return res


def state_from_rows(rows) -> dict[str, dict]:
    """Build oracle state from Spark Row objects of the sequences table."""
    out = {}
    for r in rows:
        d = r.asDict(recursive=True)
        out[d.pop("doc_id")] = d
    return out


def assert_equal_state(oracle_state: dict[str, dict], table_rows, context: str = "") -> None:
    """Full-table per-doc_id token-array equality (the correctness bar
    from BASELINE.json)."""
    got = state_from_rows(table_rows)
    missing = oracle_state.keys() - got.keys()
    extra = got.keys() - oracle_state.keys()
    assert not missing and not extra, (
        f"{context} key mismatch: missing={sorted(missing)[:5]} extra={sorted(extra)[:5]} "
        f"(|oracle|={len(oracle_state)} |table|={len(got)})"
    )
    for k, want in oracle_state.items():
        have = got[k]
        assert list(have["tokens"] or []) == list(want["tokens"] or []), (
            f"{context} token-array mismatch for {k}: {have['tokens']} != {want['tokens']}"
        )
        for c in want:
            if c == "tokens":
                continue
            assert have.get(c) == want.get(c), (
                f"{context} {k}.{c}: {have.get(c)!r} != {want.get(c)!r}"
            )
