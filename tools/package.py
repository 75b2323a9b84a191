"""Build the spark-submit artifact: dexspark.zip for --py-files.

    python tools/package.py [out.zip]
    spark-submit --py-files dexspark.zip -m dexspark.cli ...

Zips the package sources (code + shipped rule-set JSON artifacts, no
caches/tests) with deterministic entry order and timestamps, so
re-packaging an unchanged tree yields byte-identical artifacts
(reproducible deploys)."""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> list[str]:
    pkg = os.path.join(ROOT, "dexspark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith((".py", ".json")):
                full = os.path.join(dirpath, f)
                entries.append((os.path.relpath(full, ROOT), full))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel, full in entries:
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                zf.writestr(info, fh.read())
    return [rel for rel, _ in entries]


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "dexspark.zip")
    files = build(out)
    print(f"{out}: {len(files)} files")
