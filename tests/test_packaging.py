"""spark-submit artifact: content, importability shape, reproducibility."""

import os
import subprocess
import sys
import zipfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import package  # noqa: E402


def test_zip_contents_and_reproducibility(tmp_path):
    out1 = str(tmp_path / "a.zip")
    out2 = str(tmp_path / "b.zip")
    files = package.build(out1)
    package.build(out2)
    assert open(out1, "rb").read() == open(out2, "rb").read()  # byte-identical
    names = set(files)
    assert "dexspark/__init__.py" in names
    assert "dexspark/cli.py" in names
    assert "dexspark/rulesets/elr_v2020_07_30.json" in names  # artifacts ship
    assert not any("__pycache__" in n or n.endswith(".pyc") for n in names)
    with zipfile.ZipFile(out1) as zf:
        assert sorted(zf.namelist()) == sorted(files)


def test_zip_is_importable_standalone(tmp_path):
    out = str(tmp_path / "dexspark.zip")
    package.build(out)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from dexspark.rulesets import load_ruleset; "
        "r, h = load_ruleset('elr_v2020_07_30'); "
        "assert len(h['known_columns']) == 101; print('ok')"
    ) % out
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=str(tmp_path)
    )
    assert res.returncode == 0, res.stderr
    assert res.stdout.strip() == "ok"
