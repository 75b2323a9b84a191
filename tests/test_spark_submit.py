"""The north-rule deployment shape, for real: ``spark-submit
--py-files dexspark.zip`` in a separate process, with the repo NOT on
the path — proves the packaged artifact is self-contained and the CLI
drives the full batch apply under the actual cluster launcher (not
just an in-process ``cli.main`` call like test_cli.py).
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

from dexspark import gen, oracle
from dexspark.lake import LakeTable

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)
import package  # noqa: E402

_LAUNCHER = """\
import sys
from dexspark.cli import main
sys.exit(main(sys.argv[1:]))
"""


def _spark_submit() -> str | None:
    home = os.environ.get("SPARK_HOME")
    cands = [os.path.join(home, "bin", "spark-submit")] if home else []
    cands.append("/opt/spark/bin/spark-submit")
    for c in cands:
        if os.path.isfile(c):
            return c
    return shutil.which("spark-submit")


def test_spark_submit_py_files_batch_apply(spark, tmp_warehouse):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on this host")

    binlog = os.path.join(tmp_warehouse, "binlog")
    events = gen.change_events(
        spark, n_events=500, n_docs=100, n_epochs=2, max_len=8, anomaly_pct=10
    )
    gen.write_binlog(events, binlog)

    zip_path = os.path.join(tmp_warehouse, "dexspark.zip")
    package.build(zip_path)
    launcher = os.path.join(tmp_warehouse, "run_dexspark.py")
    with open(launcher, "w") as f:
        f.write(_LAUNCHER)

    table_root = os.path.join(tmp_warehouse, "seq")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # cwd = the scratch dir: the repo's dexspark/ is NOT importable in
    # the child; every module must come from the --py-files zip.
    res = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            launcher,
            "--table", table_root,
            "--binlog", binlog,
            "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
            "--warehouse", os.path.join(tmp_warehouse, "wh"),
            "--create", "--num-buckets", "4", "--batch",
        ],
        capture_output=True,
        text=True,
        cwd=tmp_warehouse,
        env=env,
        timeout=570,
    )
    assert res.returncode == 0, res.stderr[-4000:]
    status = json.loads(res.stdout.strip().splitlines()[-1])
    assert status["committed_epochs"] == [0, 1]

    # the child's table state must equal the single-threaded oracle
    table = LakeTable(spark, table_root)
    want = oracle.replay(binlog)
    oracle.assert_equal_state(want.state, table.read().collect(), "spark-submit")
