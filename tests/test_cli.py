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


def test_cli_metadata_modes(spark, tmp_warehouse, capsys):
    """--history / --lookup / --changes work without binlog/checkpoint/
    warehouse args (read-only modes) and report correct state."""
    from dexspark import cli

    binlog = os.path.join(tmp_warehouse, "binlog")
    events = gen.change_events(
        spark, n_events=300, n_docs=50, n_epochs=2, max_len=8, anomaly_pct=0
    )
    gen.write_binlog(events, binlog)
    root = os.path.join(tmp_warehouse, "seq")
    cli.main(
        [
            "--table", root, "--binlog", binlog,
            "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
            "--warehouse", os.path.join(tmp_warehouse, "wh"),
            "--create", "--num-buckets", "4", "--batch",
        ]
    )
    capsys.readouterr()

    assert cli.main(["--table", root, "--history"]) == 0
    hist = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [h["operation"] for h in hist][:1] == ["create"]
    assert hist[-1]["epoch_watermark"] == 1

    table = LakeTable(spark, root)
    some_key = table.read().select("doc_id").first()["doc_id"]
    assert cli.main(["--table", root, "--lookup", some_key]) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["rows"] and got["rows"][0]["doc_id"] == some_key

    out_dir = os.path.join(tmp_warehouse, "chg")
    assert cli.main(["--table", root, "--changes", "1", "--out", out_dir]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == spark.read.parquet(out_dir).count() > 0

    # empty-string operand (unquoted shell variable) is still a lookup
    # request — it must not fall through into tailing mode and error
    # about --binlog/--checkpoint/--warehouse
    assert cli.main(["--table", root, "--lookup", ""]) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got == {"key": "", "rows": []}


def test_cli_maintenance_modes(spark, tmp_warehouse, capsys):
    """--rebucket / --compact / --vacuum: the lake maintenance crons,
    driveable from the same spark-submit entrypoint as the tail."""
    from pyspark.sql import functions as F

    from dexspark import cli
    from dexspark.schema import sequences_schema

    root = os.path.join(tmp_warehouse, "seq")
    t = LakeTable.create(spark, root, sequences_schema(), num_buckets=4)
    df = spark.range(200).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"),
    )
    t.overwrite(df)
    up = spark.createDataFrame([("doc-7", [9], 1, "s2")], schema=sequences_schema())
    t.merge(up, mode="mor")
    assert t.manifest().get("mor") is True

    rc = cli.main(["--table", root, "--rebucket", "8", "--compact", "--vacuum",
                   "--keep-last", "1", "--min-age-seconds", "0"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rebucket"]["num_buckets"] == 8
    # rebucket's full rewrite already folded MOR history down, so the
    # subsequent compact is a no-op — the order is rebucket -> compact
    assert out["compact"]["compacted"] is False
    assert out["vacuum"]["snapshots_expired"] >= 1
    assert out["vacuum"]["data_dirs_removed"] >= 1

    t2 = LakeTable(spark, root)
    assert t2.num_buckets == 8
    assert t2.manifest().get("mor") in (False, None)
    got = {r["doc_id"]: r for r in t2.read().collect()}
    assert len(got) == 200 and got["doc-7"]["source"] == "s2"


def test_cli_scan_range_and_delete_where(spark, tmp_warehouse, capsys):
    """--scan-range (zone-map-pruned key-range read) and --delete-where
    (predicate delete applied as a tombstone MERGE)."""
    from pyspark.sql import functions as F

    from dexspark import cli
    from dexspark.schema import sequences_schema

    root = os.path.join(tmp_warehouse, "seq")
    t = LakeTable.create(
        spark, root, sequences_schema(), num_buckets=4,
        properties={"sort_on_write": True},
    )
    df = spark.range(100).select(
        F.concat(F.lit("doc-"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.when(F.col("id") < 10, "bad-crawl").otherwise("web").alias("source"),
    )
    t.overwrite(df)

    assert cli.main(["--table", root, "--scan-range", "doc-0005", "doc-0008"]) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(r["doc_id"] for r in got["rows"]) == [
        "doc-0005", "doc-0006", "doc-0007", "doc-0008"
    ]

    assert cli.main(["--table", root, "--delete-where", "source = 'bad-crawl'"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["delete_where"]["keys_deleted"] == 10
    t2 = LakeTable(spark, root)
    assert t2.read().count() == 90
    assert t2.read().filter("source = 'bad-crawl'").count() == 0
    # idempotent: re-running the purge deletes nothing and commits nothing
    v = t2.current_version()
    assert cli.main(["--table", root, "--delete-where", "source = 'bad-crawl'"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["delete_where"]["keys_deleted"] == 0
    assert t2.current_version() == v


def test_cli_compact_binlog_without_warehouse(spark, tmp_warehouse, capsys):
    """--compact-binlog is binlog-to-binlog maintenance: it must run
    without --warehouse/--checkpoint (no engine is constructed)."""
    from dexspark import cli

    binlog = os.path.join(tmp_warehouse, "binlog-cb")
    events = gen.change_events(
        spark, n_events=200, n_docs=50, n_epochs=2, max_len=8, anomaly_pct=0
    )
    gen.write_binlog(events, binlog)
    out_dir = os.path.join(tmp_warehouse, "compacted")
    rc = cli.main(
        [
            "--table", os.path.join(tmp_warehouse, "unused"),
            "--binlog", binlog,
            "--compact-binlog", out_dir,
        ]
    )
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["events_out"] <= info["events_in"]
    assert os.path.isdir(out_dir)


def test_cli_reprocess_quarantine_mode_args(spark, tmp_warehouse, capsys):
    """--reprocess-quarantine needs only --table and --warehouse (it
    replays the error container, never the binlog/checkpoint)."""
    from dexspark import cli
    from dexspark.schema import sequences_schema

    LakeTable.create(
        spark, os.path.join(tmp_warehouse, "rq"), sequences_schema(), num_buckets=2
    )
    rc = cli.main(
        [
            "--table", os.path.join(tmp_warehouse, "rq"),
            "--warehouse", os.path.join(tmp_warehouse, "wh-rq"),
            "--reprocess-quarantine",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert out == {
        "recovered": 0,
        "still_failing": 0,
        "deletes_applied": 0,
        "stale_skipped": 0,
    }


def test_cli_merge_mode_mor_and_partial_compact(spark, tmp_warehouse, capsys):
    """--merge-mode mor applies through MOR appends; replay stays
    idempotent (version unchanged); --compact --compact-max-buckets
    folds the history down incrementally, deepest buckets first."""
    from dexspark import cli

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=800, n_docs=100, n_epochs=2, max_len=8, anomaly_pct=10
        ),
        binlog,
    )
    root = os.path.join(tmp_warehouse, "seq")
    args = [
        "--table", root,
        "--binlog", binlog,
        "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
        "--warehouse", os.path.join(tmp_warehouse, "wh"),
        "--num-buckets", "4",
        "--merge-mode", "mor", "--compact-every", "0",
    ]
    assert cli.main(["--create"] + args) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["committed_epochs"] == [0, 1]
    table = LakeTable(spark, root)
    v = table.current_version()
    dirty = table.mor_buckets()
    assert dirty  # the apply landed as MOR appends
    want = {r["doc_id"]: r["tokens"] for r in table.read().collect()}

    # replay: no version bump, no state change
    assert cli.main(args) == 0
    capsys.readouterr()
    assert LakeTable(spark, root).current_version() == v

    # incremental maintenance: one bucket per pass until clean
    remaining = len(dirty)
    while remaining:
        assert cli.main(["--table", root, "--compact",
                         "--compact-max-buckets", "1"]) == 0
        info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert info["compact"]["compacted"] is True
        assert info["compact"]["buckets_compacted"] == 1
        remaining -= 1
        assert info["compact"]["mor_buckets_remaining"] == remaining
    t2 = LakeTable(spark, root)
    assert t2.mor_buckets() == {}
    assert {r["doc_id"]: r["tokens"] for r in t2.read().collect()} == want


def test_cli_tag_modes(spark, tmp_warehouse, capsys):
    """--tag / --tags / --drop-tag run as read-only modes (no binlog/
    checkpoint/warehouse needed) and pin through the same refs the
    library API reads."""
    from dexspark import cli

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=200, n_docs=40, n_epochs=1, max_len=8, anomaly_pct=0
        ),
        binlog,
    )
    root = os.path.join(tmp_warehouse, "seq")
    assert cli.main([
        "--table", root, "--binlog", binlog,
        "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
        "--warehouse", os.path.join(tmp_warehouse, "wh"),
        "--create", "--num-buckets", "4",
    ]) == 0
    capsys.readouterr()
    v = LakeTable(spark, root).current_version()

    assert cli.main(["--table", root, "--tag", "prod"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {
        "name": "prod", "version": v,
    }
    assert cli.main(["--table", root, "--tag", f"pinned={v}"]) == 0
    capsys.readouterr()
    assert cli.main(["--table", root, "--tags"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {
        "prod": v, "pinned": v,
    }
    assert LakeTable(spark, root).read(version="prod").count() > 0
    assert cli.main(["--table", root, "--drop-tag", "pinned"]) == 0
    capsys.readouterr()
    assert cli.main(["--table", root, "--tags"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {"prod": v}


def test_cli_set_property_and_vacuum_dry_run(spark, tmp_warehouse, capsys):
    from dexspark import cli

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=200, n_docs=40, n_epochs=2, max_len=8, anomaly_pct=0
        ),
        binlog,
    )
    root = os.path.join(tmp_warehouse, "seq")
    assert cli.main([
        "--table", root, "--binlog", binlog,
        "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
        "--warehouse", os.path.join(tmp_warehouse, "wh"),
        "--create", "--num-buckets", "4",
    ]) == 0
    capsys.readouterr()
    assert cli.main([
        "--table", root,
        "--set-property", "bloom_filter_key=doc_id",
        "--set-property", "sort_on_write=1",
        "--vacuum", "--keep-last", "1", "--min-age-seconds", "0", "--dry-run",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["properties"]["properties"]["bloom_filter_key"] == "doc_id"
    assert out["vacuum"]["dry_run"] is True
    t = LakeTable(spark, root)
    # dry run deleted nothing
    assert t.manifest(1)["operation"] == "create"
    # unset via empty value
    assert cli.main(["--table", root, "--set-property", "sort_on_write="]) == 0
    capsys.readouterr()
    assert "sort_on_write" not in t.manifest()["properties"]


def test_cli_rollback(spark, tmp_warehouse, capsys):
    from dexspark import cli

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=200, n_docs=40, n_epochs=2, max_len=8, anomaly_pct=0
        ),
        binlog,
    )
    root = os.path.join(tmp_warehouse, "seq")
    assert cli.main([
        "--table", root, "--binlog", binlog,
        "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
        "--warehouse", os.path.join(tmp_warehouse, "wh"),
        "--create", "--num-buckets", "4",
    ]) == 0
    capsys.readouterr()
    t = LakeTable(spark, root)
    v = t.current_version()
    before = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    t.tag("pre-bad")
    t.merge(
        spark.createDataFrame([("bad", [0], 1, "web")], schema=t.schema),
        epochs=[99],
    )
    # rollback by tag name through the CLI
    assert cli.main(["--table", root, "--rollback", "pre-bad"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["rollback"]["restored_from"] == v
    t2 = LakeTable(spark, root)
    assert {r["doc_id"]: r["tokens"] for r in t2.read().collect()} == before
    assert not t2.is_epoch_committed(99)
    # manifest-only stats through the CLI agree with the actual read
    assert cli.main(["--table", root, "--stats"]) == 0
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["exact"] and stats["row_count"] == len(before)


def test_cli_write_audit_publish_flow(spark, tmp_warehouse, capsys):
    """The full WAP loop through the CLI: fork -> tail INTO the branch
    -> audit with --branch --stats -> publish -> main has the data and
    the epochs, atomically."""
    from dexspark import cli

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=300, n_docs=60, n_epochs=3, max_len=8, anomaly_pct=0
        ),
        binlog,
    )
    root = os.path.join(tmp_warehouse, "seq")
    from dexspark.schema import sequences_schema
    LakeTable.create(spark, root, sequences_schema(), num_buckets=4)

    assert cli.main(["--table", root, "--create-branch", "staging"]) == 0
    capsys.readouterr()
    # tail into the branch
    assert cli.main([
        "--table", root, "--branch", "staging", "--binlog", binlog,
        "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
        "--warehouse", os.path.join(tmp_warehouse, "wh"),
        "--num-buckets", "4",
    ]) == 0
    capsys.readouterr()
    # audit: branch has rows, main is empty
    assert cli.main(["--table", root, "--branch", "staging", "--stats"]) == 0
    staged = json.loads(capsys.readouterr().out.strip())
    assert staged["row_count"] > 0
    main = LakeTable(spark, root)
    assert main.read().count() == 0
    assert not main.is_epoch_committed(0)
    # publish
    assert cli.main(["--table", root, "--publish-branch", "staging"]) == 0
    pub = json.loads(capsys.readouterr().out.strip())
    assert pub["noop"] is False
    main = LakeTable(spark, root)
    assert main.read().count() == staged["row_count"]
    assert main.is_epoch_committed(0) and main.is_epoch_committed(2)
    assert cli.main(["--table", root, "--drop-branch", "staging"]) == 0
    capsys.readouterr()
    assert cli.main(["--table", root, "--branches"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {}


def test_cli_branch_tail_with_auto_vacuum_skips_retention(spark, tmp_warehouse, capsys):
    """Tailing into a branch with the engine's auto-vacuum configured
    must stage cleanly (retention is skipped on branch handles, not a
    crash)."""
    from dexspark import cli
    from dexspark.schema import sequences_schema

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=200, n_docs=40, n_epochs=2, max_len=8, anomaly_pct=0
        ),
        binlog,
    )
    root = os.path.join(tmp_warehouse, "seq")
    LakeTable.create(spark, root, sequences_schema(), num_buckets=4)
    assert cli.main(["--table", root, "--create-branch", "s"]) == 0
    capsys.readouterr()
    assert cli.main([
        "--table", root, "--branch", "s", "--binlog", binlog,
        "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
        "--warehouse", os.path.join(tmp_warehouse, "wh"),
        "--num-buckets", "4", "--vacuum-keep-last", "2",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["committed_epochs"] == [0, 1]
    bt = LakeTable(spark, root, branch="s")
    assert bt.read().count() > 0


def test_cli_rename_and_drop_column(spark, tmp_warehouse, capsys):
    from dexspark import cli

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=200, n_docs=40, n_epochs=2, max_len=8, anomaly_pct=0
        ),
        binlog,
    )
    root = os.path.join(tmp_warehouse, "seq")
    assert cli.main([
        "--table", root, "--binlog", binlog,
        "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
        "--warehouse", os.path.join(tmp_warehouse, "wh"),
        "--create", "--num-buckets", "4",
    ]) == 0
    capsys.readouterr()
    assert cli.main([
        "--table", root, "--rename-column", "n_tok:tok_count",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["rename_column"]["version"] > 0
    t = LakeTable(spark, root)
    cols = t.read().columns
    assert "tok_count" in cols and "n_tok" not in cols
    assert t.read().filter("tok_count is not null").count() > 0
    assert cli.main(["--table", root, "--drop-column", "tok_count"]) == 0
    capsys.readouterr()
    assert "tok_count" not in LakeTable(spark, root).read().columns


def test_cli_create_and_refresh_view(spark, tmp_warehouse, capsys):
    from dexspark import cli

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=400, n_docs=60, n_epochs=2, max_len=8, anomaly_pct=0
        ),
        binlog,
    )
    root = os.path.join(tmp_warehouse, "seq")
    vroot = os.path.join(tmp_warehouse, "view")
    assert cli.main([
        "--table", root, "--binlog", binlog,
        "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
        "--warehouse", os.path.join(tmp_warehouse, "wh"),
        "--create", "--num-buckets", "4",
    ]) == 0
    capsys.readouterr()
    assert cli.main(["--table", root, "--create-view", vroot]) == 0
    capsys.readouterr()
    assert cli.main(["--table", root, "--refresh-view", vroot]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["refresh_view"]["applied"] is True
    from dexspark.operators.mview import full_agg, read_view

    t = LakeTable(spark, root)
    view = LakeTable(spark, vroot)
    got = {r["source"]: r.asDict() for r in read_view(view).collect()}
    want = {
        r["source"]: r.asDict()
        for r in full_agg(
            t.read(), ["source"], {"n_tok": "sum_n_tok"}
        ).collect()
    }
    assert got == want
    # re-run: exactly-once cursor makes it a no-op
    assert cli.main(["--table", root, "--refresh-view", vroot]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["refresh_view"]["applied"] is False


def test_cli_near_dup_gate(spark, tmp_warehouse, capsys):
    """--near-dup-gate quarantines a cross-batch near-duplicate and
    leaves the sidecar index tables behind in the warehouse."""
    import json as _json

    from dexspark import cli
    from dexspark.schema import sequences_schema

    A = list(range(100, 140))
    A_NEAR = A[:20] + [9999] + A[21:]

    def _env(doc_id, tokens, lsn, epoch):
        return _json.dumps(
            {
                "op": "insert",
                "doc_id": doc_id,
                "payload": {"tokens": tokens, "n_tok": len(tokens), "source": "web"},
                "commit_ts": f"2024-01-01T00:00:{lsn:02d}.000Z",
                "lsn": lsn,
                "batch_epoch": epoch,
            }
        )

    binlog = os.path.join(tmp_warehouse, "binlog")
    os.makedirs(binlog)
    with open(os.path.join(binlog, "epoch-0-0.ndjson"), "w") as f:
        f.write(_env("docA", A, 1, 0) + "\n")
    with open(os.path.join(binlog, "epoch-1-0.ndjson"), "w") as f:
        f.write(_env("docDUP", A_NEAR, 2, 1) + "\n")
    # force distinct mtimes so maxFilesPerTrigger=1 delivers epoch 0
    # strictly before epoch 1 (same-second writes can tie)
    os.utime(os.path.join(binlog, "epoch-0-0.ndjson"), (1700000000, 1700000000))
    os.utime(os.path.join(binlog, "epoch-1-0.ndjson"), (1700000100, 1700000100))

    wh = os.path.join(tmp_warehouse, "wh")
    rc = cli.main(
        [
            "--table", os.path.join(tmp_warehouse, "seq"),
            "--binlog", binlog,
            "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
            "--warehouse", wh,
            "--create", "--num-buckets", "4",
            "--near-dup-gate", "--max-files-per-trigger", "1",
        ]
    )
    assert rc == 0
    table = LakeTable(spark, os.path.join(tmp_warehouse, "seq"))
    ids = {r["doc_id"] for r in table.read().select("doc_id").collect()}
    assert ids == {"docA"}
    q = spark.read.parquet(os.path.join(wh, "quarantine"))
    row = q.collect()[0]
    assert row["doc_id"] == "docDUP"
    assert row["fail_reasons"] == ["near_dup:doc:docA"]
    assert os.path.isdir(os.path.join(wh, "dedup_sig"))
    assert os.path.isdir(os.path.join(wh, "dedup_band"))


def test_cli_dedup_index_stats_and_rebuild(spark, tmp_warehouse, capsys):
    """--dedup-index-stats reports index health; --rebuild-dedup-index
    catches up + rebuilds and preserves the sync cursor; both refuse
    a warehouse that was never gated."""
    import json as _json

    from dexspark import cli

    def _env(doc_id, tokens, lsn, epoch):
        return _json.dumps(
            {
                "op": "insert",
                "doc_id": doc_id,
                "payload": {"tokens": tokens, "n_tok": len(tokens), "source": "web"},
                "commit_ts": f"2024-01-01T00:00:{lsn:02d}.000Z",
                "lsn": lsn,
                "batch_epoch": epoch,
            }
        )

    binlog = os.path.join(tmp_warehouse, "binlog")
    os.makedirs(binlog)
    with open(os.path.join(binlog, "e.ndjson"), "w") as f:
        f.write(
            "\n".join(
                _env(f"d{i}", list(range(100 * i, 100 * i + 40)), i, 0)
                for i in range(3)
            )
            + "\n"
        )
    wh = os.path.join(tmp_warehouse, "wh")
    tbl = os.path.join(tmp_warehouse, "seq")
    assert cli.main(
        [
            "--table", tbl, "--binlog", binlog,
            "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
            "--warehouse", wh, "--create", "--num-buckets", "4",
            "--near-dup-gate",
        ]
    ) == 0
    capsys.readouterr()

    assert cli.main(["--table", tbl, "--warehouse", wh, "--dedup-index-stats"]) == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the end-of-run marker flush is a data-less commit AFTER the last
    # index fold, so a freshly-tailed table legitimately reads 1 behind
    assert stats["behind"] <= 1
    assert stats["sig"]["docs"] == 3
    assert stats["band"]["bands"] > 0
    assert stats["band"]["overflowed_bands"] == 0

    # rebuild catches the cursors up first, then rebuilds the postings
    assert cli.main(["--table", tbl, "--warehouse", wh, "--rebuild-dedup-index"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rebuilt"] is True
    assert out["behind"] == 0
    assert out["band"]["synced_through"] == stats["source_version"]
    assert out["sig"]["docs"] == 3
    assert out["band"]["bands"] == stats["band"]["bands"]

    # ungated warehouse -> structured refusal, nothing created
    empty_wh = os.path.join(tmp_warehouse, "wh-empty")
    os.makedirs(empty_wh)
    assert cli.main(
        ["--table", tbl, "--warehouse", empty_wh, "--dedup-index-stats"]
    ) == 1
    err = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "no near-dup index" in err["error"]
    assert not os.path.isdir(os.path.join(empty_wh, "dedup_sig"))


def test_cli_bootstrap_dedup_index_prewarms_gate(spark, tmp_warehouse, capsys):
    """--bootstrap-dedup-index folds an existing (never-gated) table
    into freshly-created index tables as an offline job; the first
    gated micro-batch then rejects a near-dup of PRE-EXISTING data."""
    import json as _json

    from dexspark import cli
    from dexspark.schema import sequences_schema

    A = list(range(100, 140))
    A_NEAR = A[:20] + [9999] + A[21:]
    tbl_path = os.path.join(tmp_warehouse, "seq")
    table = LakeTable.create(
        spark, tbl_path, sequences_schema(), key="doc_id", num_buckets=4
    )
    table.overwrite(
        spark.createDataFrame(
            [("docA", A, len(A), "web")], schema=sequences_schema()
        )
    )
    wh = os.path.join(tmp_warehouse, "wh")
    os.makedirs(wh)
    assert cli.main(
        ["--table", tbl_path, "--warehouse", wh, "--bootstrap-dedup-index"]
    ) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["behind"] == 0 and out["sig"]["docs"] == 1
    assert os.path.isdir(os.path.join(wh, "dedup_sig"))

    # first gated batch: near-dup of the bootstrapped doc is rejected
    binlog = os.path.join(tmp_warehouse, "binlog")
    os.makedirs(binlog)
    with open(os.path.join(binlog, "e.ndjson"), "w") as f:
        f.write(
            _json.dumps(
                {
                    "op": "insert", "doc_id": "docDUP",
                    "payload": {"tokens": A_NEAR, "n_tok": len(A_NEAR),
                                "source": "web"},
                    "commit_ts": "2024-01-01T00:00:01.000Z",
                    "lsn": 1, "batch_epoch": 0,
                }
            )
            + "\n"
        )
    assert cli.main(
        [
            "--table", tbl_path, "--binlog", binlog,
            "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
            "--warehouse", wh, "--num-buckets", "4", "--near-dup-gate",
        ]
    ) == 0
    capsys.readouterr()
    ids = {r["doc_id"] for r in LakeTable(spark, tbl_path).read().collect()}
    assert ids == {"docA"}
    q = spark.read.parquet(os.path.join(wh, "quarantine"))
    assert q.collect()[0]["fail_reasons"] == ["near_dup:doc:docA"]


def test_cli_bootstrap_snapshot_then_tail(spark, tmp_warehouse, capsys):
    """--bootstrap-snapshot loads a position-stamped dump; combined
    with tail args the same invocation catches up from the cut; final
    state equals a from-zero replay."""
    import re

    from dexspark import cli
    from dexspark.schema import sequences_schema

    binlog = os.path.join(tmp_warehouse, "binlog")
    events = gen.change_events(
        spark, n_events=600, n_docs=80, n_epochs=4, max_len=8, anomaly_pct=5
    )
    files = gen.write_binlog(events, binlog)
    cut = 1
    early = [
        f
        for f in files
        if int(re.search(r"epoch-(\d+)-", os.path.basename(f)).group(1)) <= cut
    ]
    snap_state = oracle.replay(early).state
    dump = os.path.join(tmp_warehouse, "dump")
    spark.createDataFrame(
        [{"doc_id": k, **v} for k, v in snap_state.items()],
        schema=sequences_schema(),
    ).write.parquet(dump)

    root = os.path.join(tmp_warehouse, "seq")
    # bare bootstrap: exits after the load, no tail args needed
    rc = cli.main(
        [
            "--table", root, "--create", "--num-buckets", "4",
            "--bootstrap-snapshot", dump, "--snapshot-position", str(cut),
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["bootstrap"]["position"] == cut
    assert out["bootstrap"]["epoch_watermark"] == cut

    # tail the full binlog: only post-cut epochs are applied
    rc = cli.main(
        [
            "--table", root,
            "--binlog", binlog,
            "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
            "--warehouse", os.path.join(tmp_warehouse, "wh"),
            "--num-buckets", "4", "--batch",
        ]
    )
    assert rc == 0
    status = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert status["epoch_watermark"] == 3

    table = LakeTable(spark, root)
    want = oracle.replay(files)
    oracle.assert_equal_state(want.state, table.read().collect(), "cli bootstrap")


def test_cli_diagnostics_graceful_on_healthy_deployment(
    spark, tmp_warehouse, capsys
):
    """The diagnostics must not crash on the HEALTHIEST deployment:
    --compact-binlog needs no --table at all (binlog-to-binlog),
    --quarantine-drift over a missing/empty quarantine reports zero
    drift, and --distinct-over without a sketch sink explains how to
    enable it instead of raising PATH_NOT_FOUND (regressions, all
    found by driving the CLI against a zero-anomaly run)."""
    from dexspark import cli

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=100, n_docs=20, n_epochs=1, max_len=8,
            anomaly_pct=0,
        ),
        binlog,
    )
    # 1. no --table for log compaction
    rc = cli.main(
        ["--binlog", binlog, "--compact-binlog", os.path.join(tmp_warehouse, "cb")]
    )
    assert rc == 0
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # 2. drift over a quarantine that was never written / is empty
    rc = cli.main(["--warehouse", tmp_warehouse, "--quarantine-drift", "0,1"])
    assert rc == 0
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["occurrences_a"] == 0 and d["drift_l1"] == 0.0
    os.makedirs(os.path.join(tmp_warehouse, "quarantine"))  # empty dir
    rc = cli.main(["--warehouse", tmp_warehouse, "--quarantine-drift", "0,1"])
    assert rc == 0

    # 3. distinct-over without the sketch sink: clear guidance, rc != 0
    rc = cli.main(["--warehouse", tmp_warehouse, "--distinct-over", "0,1"])
    assert rc == 2
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "profile" in err["error"]


def test_cli_profile_diagnostics_guards(spark, tmp_warehouse, capsys):
    """--drift / --compact-sketches without their sinks explain how to
    enable them instead of raising PATH_NOT_FOUND (same contract as
    --distinct-over)."""
    from dexspark import cli

    rc = cli.main(["--warehouse", tmp_warehouse, "--drift", "0,1"])
    assert rc == 2
    assert "profile" in json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["error"]
    rc = cli.main(["--warehouse", tmp_warehouse, "--compact-sketches", "1"])
    assert rc == 2
    assert "sketch" in json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["error"]


def test_cli_expire_binlog_routed_min_watermark(spark, tmp_warehouse, capsys):
    """--expire-binlog in --route mode uses the MINIMUM watermark
    across routes: an epoch survives while ANY route still needs it."""
    from dexspark import cli

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=300, n_docs=60, n_epochs=3, max_len=8,
            anomaly_pct=0,
        ),
        binlog,
    )
    route_args = [
        "--route", f"a={os.path.join(tmp_warehouse, 'ra')}",
        "--route", f"b={os.path.join(tmp_warehouse, 'rb')}",
        "--route-expr", "pmod(lsn, 2) = 0",
        "--route-default", "b",
        "--warehouse", tmp_warehouse,
    ]
    rc = cli.main(
        route_args
        + [
            "--binlog", binlog,
            "--checkpoint", os.path.join(tmp_warehouse, "ck"),
            "--create", "--num-buckets", "4",
        ]
    )
    assert rc == 0
    capsys.readouterr()
    # hold route b back: roll it to its create version so its
    # watermark rewinds below a's
    tb = LakeTable(spark, os.path.join(tmp_warehouse, "rb"))
    tb.rollback(1)
    rc = cli.main(
        route_args + ["--binlog", binlog, "--expire-binlog", "0", "--dry-run"]
    )
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["min_epoch_watermark"] == -1  # b rewound to pre-ingest
    assert info["expired_epochs"] == []  # nothing expires while b lags
    # retention is pure binlog+epoch_state maintenance: it must work
    # WITHOUT --warehouse (no engine construction on this path)
    no_wh = [a for a in route_args if a != "--warehouse" and a != tmp_warehouse]
    rc = cli.main(
        no_wh + ["--binlog", binlog, "--expire-binlog", "0", "--dry-run"]
    )
    assert rc == 0
    info2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info2["min_epoch_watermark"] == -1
    # a route whose table does not exist yet (fresh warehouse +
    # --create) must not crash the expire: its watermark is the
    # pre-ingest -1, so nothing expires
    rc = cli.main(
        [
            "--route", f"x={os.path.join(tmp_warehouse, 'fresh-x')}",
            "--route-expr", "pmod(lsn, 2) = 0",
            "--create",
            "--binlog", binlog, "--expire-binlog", "0", "--dry-run",
        ]
    )
    assert rc == 0
    info3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info3["min_epoch_watermark"] == -1
    assert info3["expired_epochs"] == []
