"""spark-submit entrypoint: end-to-end via the CLI (local catch-up)."""

import json
import os

from dexspark import gen, oracle
from dexspark.lake import LakeTable


def test_cli_catch_up(spark, tmp_warehouse, capsys):
    from dexspark import cli

    binlog = os.path.join(tmp_warehouse, "binlog")
    events = gen.change_events(spark, n_events=500, n_docs=100, n_epochs=2, max_len=8, anomaly_pct=10)
    gen.write_binlog(events, binlog)

    rc = cli.main(
        [
            "--table", os.path.join(tmp_warehouse, "seq"),
            "--binlog", binlog,
            "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
            "--warehouse", os.path.join(tmp_warehouse, "wh"),
            "--create", "--num-buckets", "4",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["committed_epochs"] == [0, 1]

    table = LakeTable(spark, os.path.join(tmp_warehouse, "seq"))
    want = oracle.replay(binlog)
    oracle.assert_equal_state(want.state, table.read().collect(), "cli")
