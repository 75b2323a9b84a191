"""Deterministic nested-zip corpus for the S6 fan-out driver query.

The corpus mirrors the reference's decompressor test matrix
(Unit_FnDecompressor.kt:153-459): flat archives, nested zip-in-zip,
directory entries (skipped), empty archives and non-zip payloads
(FAIL rows), plus a depth bomb that must trip the recursion cap
instead of crashing the executor.

``write_corpus`` is idempotent (same bytes every call); ``EXPECTED``
is the hand-enumerated entry manifest the operator must produce, used
verbatim as the DuckDB oracle via a VALUES literal.
"""

from __future__ import annotations

import hashlib
import io
import os
import zipfile

CORPUS_DIR = "/tmp/dexspark_s6_corpus"

_LEAVES = {
    "a.csv": b"id,v\n1,x\n",
    "b.csv": b"id,v\n2,y\n",
    "leaf.txt": b"leaf content",
    "sibling.csv": b"id\n3\n",
    "dir/data.txt": b"nested dir file",
    "deep.txt": b"too deep to ever surface",
}

_BOMB_WRAPS = 12  # nest depth > MAX_DEPTH (8) -> error row, not a crash


def _zip_bytes(entries: dict[str, bytes | None]) -> bytes:
    """Build a zip in memory; value None creates a directory entry."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in entries.items():
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, b"" if data is None else data)
    return buf.getvalue()


def _build() -> dict[str, bytes]:
    inner = _zip_bytes({"leaf.txt": _LEAVES["leaf.txt"]})
    bomb = _zip_bytes({"deep.txt": _LEAVES["deep.txt"]})
    for _ in range(_BOMB_WRAPS):
        bomb = _zip_bytes({"b.zip": bomb})
    return {
        "flat.zip": _zip_bytes({"a.csv": _LEAVES["a.csv"], "b.csv": _LEAVES["b.csv"]}),
        "nested.zip": _zip_bytes(
            {"inner.zip": inner, "sibling.csv": _LEAVES["sibling.csv"]}
        ),
        "dirs.zip": _zip_bytes({"dir/": None, "dir/data.txt": _LEAVES["dir/data.txt"]}),
        "empty.zip": _zip_bytes({}),
        "notazip.zip": b"PK but not really a zip payload",
        "bomb.zip": bomb,
    }


def write_corpus(out_dir: str = CORPUS_DIR) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for name, payload in _build().items():
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
    return out_dir


def _md5(b: bytes) -> str:
    return hashlib.md5(b).hexdigest()


# (source_file, entry_path, n_bytes, content_md5, error_kind) — NULLs
# replaced by '' / -1 sentinels so the cross-engine rowset compare
# never orders NULLs.
EXPECTED: list[tuple] = [
    ("flat.zip", "a.csv", len(_LEAVES["a.csv"]), _md5(_LEAVES["a.csv"]), ""),
    ("flat.zip", "b.csv", len(_LEAVES["b.csv"]), _md5(_LEAVES["b.csv"]), ""),
    (
        "nested.zip",
        "inner.zip/leaf.txt",
        len(_LEAVES["leaf.txt"]),
        _md5(_LEAVES["leaf.txt"]),
        "",
    ),
    (
        "nested.zip",
        "sibling.csv",
        len(_LEAVES["sibling.csv"]),
        _md5(_LEAVES["sibling.csv"]),
        "",
    ),
    (
        "dirs.zip",
        "dir/data.txt",
        len(_LEAVES["dir/data.txt"]),
        _md5(_LEAVES["dir/data.txt"]),
        "",
    ),
    ("empty.zip", "", -1, "", "empty zip"),
    ("notazip.zip", "", -1, "", "not a zip"),
    ("bomb.zip", "/".join(["b.zip"] * 9), -1, "", "max depth 8 exceeded"),
]


def expected_values_sql() -> str:
    """The EXPECTED manifest as a DuckDB VALUES literal."""

    def lit(v, typ):
        if isinstance(v, int):
            return f"CAST({v} AS {typ})"
        return "'" + str(v).replace("'", "''") + "'"

    rows = ",\n      ".join(
        "({}, {}, {}, {}, {})".format(
            lit(s, "VARCHAR"),
            lit(e, "VARCHAR"),
            lit(n, "BIGINT"),
            lit(m, "VARCHAR"),
            lit(k, "VARCHAR"),
        )
        for s, e, n, m, k in EXPECTED
    )
    return (
        "SELECT * FROM (VALUES\n      "
        + rows
        + "\n    ) t(source_file, entry_path, n_bytes, content_md5, error_kind)"
    )
