"""Outbox: table changelog re-emitted as a binlog, consumed by a
second engine — cascading replication with exactly-once at each hop.

The end-state invariant is the BASELINE token-array equality bar
applied transitively: source table == replica table after the replica
engine tails only the emitted outbox."""

import os

from dexspark import gen, oracle
from dexspark.config import EngineConfig
from dexspark.lake import LakeTable
from dexspark.operators.outbox import emit_changes
from dexspark.schema import sequences_schema
from dexspark.stream import CdcEngine


def _mk(spark, root, name, num_buckets=4, **cfg):
    wh = os.path.join(root, name)
    t = LakeTable.create(
        spark, os.path.join(wh, "t"), sequences_schema(),
        key="doc_id", num_buckets=num_buckets,
    )
    return CdcEngine(
        spark, t, wh, EngineConfig(num_buckets=num_buckets, **cfg)
    ), t


def _binlog(spark, root, name, seed, n_events=800, n_docs=120, n_epochs=2):
    path = os.path.join(root, name)
    gen.write_binlog(
        gen.change_events(
            spark, n_events=n_events, n_docs=n_docs, n_epochs=n_epochs,
            max_len=10, anomaly_pct=10, seed=seed,
        ),
        path,
    )
    return path


def _subset(binlog: str, dest: str, epochs: tuple[int, ...]) -> str:
    """Hardlink only the named epochs' files into ``dest`` (a partial
    delivery of the same log). File names are zero-padded
    (``epoch-000002-000.ndjson``), so parse the number rather than
    prefix-match."""
    import re

    os.makedirs(dest, exist_ok=True)
    linked = 0
    for fn in os.listdir(binlog):
        m = re.match(r"epoch-(\d+)-", fn)
        if m and int(m.group(1)) in epochs:
            os.link(os.path.join(binlog, fn), os.path.join(dest, fn))
            linked += 1
    assert linked, f"no files for epochs {epochs} in {binlog}"
    return dest


def _states_equal(src: LakeTable, dst: LakeTable, ctx: str) -> None:
    oracle.assert_equal_state(
        oracle.state_from_rows(src.read().collect()), dst.read().collect(), ctx
    )


def test_outbox_chain_replicates(spark, tmp_warehouse):
    src_eng, src = _mk(spark, tmp_warehouse, "src")
    dst_eng, dst = _mk(spark, tmp_warehouse, "dst")
    outbox = os.path.join(tmp_warehouse, "outbox")

    # seed the source with a base snapshot, then the first half of a
    # 4-epoch log (the second half lands later as "new" commits)
    base = gen.base_sequences(spark, n_docs=120, max_len=10)
    src.overwrite(base)
    full = _binlog(spark, tmp_warehouse, "b1", seed=1, n_events=1600, n_epochs=4)
    src_eng.apply_binlog(_subset(full, os.path.join(tmp_warehouse, "b1a"), (0, 1)))

    info1 = emit_changes(src, outbox)
    assert info1["synced_through"] == src.current_version()
    assert info1["events"] > 0
    dst_eng.apply_binlog(outbox)  # auto-sniffs the parquet binlog
    _states_equal(src, dst, "after first hop")

    # incremental: more source epochs, second emission emits ONLY the
    # new commits; the replica catches up through the same directory
    src_eng.apply_binlog(full)  # markers keep 0-1, apply 2-3
    info2 = emit_changes(src, outbox)
    assert set(info2["emitted_versions"]).isdisjoint(info1["emitted_versions"])
    assert min(info2["emitted_versions"]) > max(info1["emitted_versions"])
    dst_eng.apply_binlog(outbox)
    _states_equal(src, dst, "after catch-up")

    # quiescent source: emission is a no-op
    info3 = emit_changes(src, outbox)
    assert info3 == {
        "synced_through": src.current_version(),
        "emitted_versions": [],
        "events": 0,
    }

    # redelivery: re-applying the whole outbox must not move the replica
    v = dst.current_version()
    dst_eng.apply_binlog(outbox)
    assert dst.current_version() == v
    _states_equal(src, dst, "after redelivery")


def test_outbox_mor_source_key_only_deletes(spark, tmp_warehouse):
    """A MOR source emits tombstones with no pre-image; the replica
    must still converge (delete envelopes are key-only)."""
    src_eng, src = _mk(spark, tmp_warehouse, "src", merge_mode="mor")
    dst_eng, dst = _mk(spark, tmp_warehouse, "dst")
    outbox = os.path.join(tmp_warehouse, "outbox")

    src_eng.apply_binlog(_binlog(spark, tmp_warehouse, "b1", seed=3))
    emit_changes(src, outbox)
    dst_eng.apply_binlog(outbox)
    _states_equal(src, dst, "mor hop")
    # the generator produces deletes; prove some keys were dropped so
    # the tombstone path was actually exercised
    assert spark.read.parquet(outbox).filter("op = 'delete'").count() > 0


def test_outbox_crash_between_write_and_cursor(spark, tmp_warehouse):
    """Re-emission after a lost cursor advance (crash window) rewrites
    the same epochs; the consumer's markers absorb the duplicates."""
    src_eng, src = _mk(spark, tmp_warehouse, "src")
    dst_eng, dst = _mk(spark, tmp_warehouse, "dst")
    outbox = os.path.join(tmp_warehouse, "outbox")
    src_eng.apply_binlog(_binlog(spark, tmp_warehouse, "b1", seed=4))

    info1 = emit_changes(src, outbox)
    dst_eng.apply_binlog(outbox)
    # simulate the crash: roll the cursor back as if the first
    # emission never recorded it
    os.remove(os.path.join(outbox, "_outbox_cursor.json"))
    info2 = emit_changes(src, outbox)
    assert info2["emitted_versions"] == info1["emitted_versions"]
    v = dst.current_version()
    dst_eng.apply_binlog(outbox)
    assert dst.current_version() == v
    _states_equal(src, dst, "after duplicate emission")


def test_cli_outbox_chain(spark, tmp_warehouse, capsys):
    """--outbox emits from the CLI; a second CLI tail consumes it."""
    import json as _json

    from dexspark import cli

    src_eng, src = _mk(spark, tmp_warehouse, "src")
    src_eng.apply_binlog(_binlog(spark, tmp_warehouse, "b1", seed=9))
    outbox = os.path.join(tmp_warehouse, "outbox")

    assert cli.main(["--table", src.root, "--outbox", outbox]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["synced_through"] == src.current_version()
    assert out["events"] > 0

    dst_root = os.path.join(tmp_warehouse, "replica")
    assert cli.main([
        "--table", dst_root, "--binlog", outbox,
        "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
        "--warehouse", os.path.join(tmp_warehouse, "wh2"),
        "--create", "--num-buckets", "4", "--batch",
    ]) == 0
    capsys.readouterr()
    _states_equal(src, LakeTable(spark, dst_root), "cli chain")


def test_outbox_propagates_schema_evolution(spark, tmp_warehouse):
    """A column added upstream travels through the outbox: the emitted
    log carries a schema sidecar, the replica parses the evolved
    payload (instead of casting it to the default struct) and its
    table evolves additively."""
    import json as _json

    from pyspark.sql import types as T

    from dexspark.schema import payload_schema

    evolved = T.StructType(
        list(payload_schema().fields)
        + [T.StructField("lang", T.StringType(), True)]
    )
    src_eng, src = _mk(spark, tmp_warehouse, "src")
    src_eng.payload_schema = evolved
    dst_eng, dst = _mk(spark, tmp_warehouse, "dst")
    outbox = os.path.join(tmp_warehouse, "outbox")

    lines = [
        _json.dumps({
            "op": "update", "doc_id": f"doc{i:08d}",
            "payload": {"tokens": [1, i], "n_tok": 2, "source": "wiki",
                        "lang": "en" if i % 2 else None},
            "commit_ts": f"2024-01-01T00:00:{i:02d}.000Z",
            "lsn": i, "batch_epoch": 0,
        })
        for i in range(8)
    ]
    blog = os.path.join(tmp_warehouse, "evolved-binlog")
    os.makedirs(blog)
    with open(os.path.join(blog, "epoch-0-0.ndjson"), "w") as f:
        f.write("\n".join(lines) + "\n")
    src_eng.apply_binlog(blog)
    assert "lang" in [f.name for f in src.schema.fields]

    emit_changes(src, outbox)
    assert os.path.exists(os.path.join(outbox, "_outbox_schema.json"))
    # replica engine has NO explicit payload schema — the sidecar must
    # carry the evolution
    dst_eng.apply_binlog(outbox)
    assert "lang" in [f.name for f in dst.schema.fields]
    rows = {r["doc_id"]: r.asDict() for r in dst.read().collect()}
    assert rows["doc00000001"]["lang"] == "en"
    assert rows["doc00000000"]["lang"] is None
    _states_equal(src, dst, "evolved chain")


def test_streaming_engine_emits_outbox_continuously(spark, tmp_warehouse):
    """EngineConfig(outbox_dir=...): the tailing engine re-emits after
    every micro-batch — no manual emit step — and a replica that tails
    only the outbox converges to the source."""
    outbox = os.path.join(tmp_warehouse, "outbox")
    src_eng, src = _mk(spark, tmp_warehouse, "src", outbox_dir=outbox)
    dst_eng, dst = _mk(spark, tmp_warehouse, "dst")

    full = _binlog(spark, tmp_warehouse, "b1", seed=11, n_events=1200, n_epochs=3)
    src_eng.run_until_caught_up(
        full, os.path.join(tmp_warehouse, "ckpt"), max_files_per_trigger=4
    )
    # multiple micro-batches emitted without any manual emit_changes:
    # the cursor tracks the table head
    assert os.path.exists(os.path.join(outbox, "_outbox_cursor.json"))
    from dexspark.operators.outbox import _cursor

    assert _cursor(outbox) == src.current_version()

    dst_eng.apply_binlog(outbox)
    _states_equal(src, dst, "live chain")


def test_outbox_feeds_router(spark, tmp_warehouse):
    """Composability across the CDC ecosystem: a source table's outbox
    is itself a binlog the ROUTER can fan out — source -> outbox ->
    two parity shards, token-equal to the oracle split of the source."""
    from dexspark.router import RoutedEngine

    src_eng, src = _mk(spark, tmp_warehouse, "src")
    src_eng.apply_binlog(_binlog(spark, tmp_warehouse, "b1", seed=21))
    outbox = os.path.join(tmp_warehouse, "outbox")
    emit_changes(src, outbox)

    routes = {}
    for name in ("0", "1"):
        eng, _t = _mk(spark, tmp_warehouse, f"shard-{name}")
        routes[name] = eng
    router = RoutedEngine(
        spark, os.path.join(tmp_warehouse, "router-wh"), routes,
        "cast(cast(substring(doc_id, -1, 1) as int) % 2 as string)",
        default="0",
    )
    router.apply_binlog(outbox)

    split = {"0": {}, "1": {}}
    for d, payload in oracle.state_from_rows(src.read().collect()).items():
        split[str(int(d[-1]) % 2)][d] = payload
    for name, eng in routes.items():
        oracle.assert_equal_state(
            split[name], eng.table.read().collect(), f"shard {name}"
        )
        # epoch set came off the outbox partition-dir names (no scan):
        # every shard's watermark covers every emitted commit version
        w, _tail = eng.table.epoch_state()
        assert w == src.current_version()


def test_branch_tail_never_auto_emits(spark, tmp_warehouse):
    """Tailing INTO a branch with outbox_dir set must not emit: staged
    commits are unpublished — replicating them would leak state main's
    readers never saw."""
    outbox = os.path.join(tmp_warehouse, "outbox")
    _eng, src = _mk(spark, tmp_warehouse, "src")
    src.create_branch("staging")
    branch = LakeTable(spark, src.root, branch="staging")
    from dexspark.stream import CdcEngine as _E

    beng = _E(
        spark, branch, os.path.join(tmp_warehouse, "bwh"),
        EngineConfig(num_buckets=4, outbox_dir=outbox),
    )
    beng.apply_binlog(_binlog(spark, tmp_warehouse, "b1", seed=31))
    assert not os.path.exists(outbox)


def test_cli_routed_emit_outbox_per_route_dirs(spark, tmp_warehouse, capsys):
    """--route + --emit-outbox: each route gets its own outbox subdir
    (one cursor and commit-version epoch space per table)."""
    import json as _json

    from dexspark import cli

    binlog = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(
        gen.change_events(
            spark, n_events=400, n_docs=80, n_epochs=2, max_len=8, anomaly_pct=0
        ),
        binlog,
    )
    outbox = os.path.join(tmp_warehouse, "outbox")
    assert cli.main([
        "--route", "0=" + os.path.join(tmp_warehouse, "t0"),
        "--route", "1=" + os.path.join(tmp_warehouse, "t1"),
        "--route-expr",
        "cast(cast(substring(doc_id, -1, 1) as int) % 2 as string)",
        "--binlog", binlog,
        "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
        "--warehouse", os.path.join(tmp_warehouse, "wh"),
        "--create", "--num-buckets", "4", "--batch",
        "--emit-outbox", outbox,
    ]) == 0
    capsys.readouterr()
    for name in ("0", "1"):
        d = os.path.join(outbox, name)
        assert os.path.exists(os.path.join(d, "_outbox_cursor.json")), d
        # each route's outbox replays into an equal replica
        dst = LakeTable.create(
            spark, os.path.join(tmp_warehouse, f"rep{name}", "t"),
            sequences_schema(), key="doc_id", num_buckets=4,
        )
        from dexspark.stream import CdcEngine as _E

        _E(
            spark, dst, os.path.join(tmp_warehouse, f"rep{name}"),
            EngineConfig(num_buckets=4),
        ).apply_binlog(d)
        src = LakeTable(spark, os.path.join(tmp_warehouse, f"t{name}"))
        _states_equal(src, dst, f"route {name} outbox replica")


def test_replica_follows_source_rollback(spark, tmp_warehouse):
    """A source rollback is itself a commit whose logical diff travels
    through the outbox: the replica converges to the rolled-back state
    without any special handling (restored rows arrive as upserts with
    a newer synthetic commit_ts, vanished rows as deletes)."""
    src_eng, src = _mk(spark, tmp_warehouse, "src")
    dst_eng, dst = _mk(spark, tmp_warehouse, "dst")
    outbox = os.path.join(tmp_warehouse, "outbox")

    full = _binlog(spark, tmp_warehouse, "b1", seed=41, n_events=1600, n_epochs=4)
    src_eng.apply_binlog(_subset(full, os.path.join(tmp_warehouse, "b1a"), (0, 1)))
    good_version = src.current_version()
    emit_changes(src, outbox)
    dst_eng.apply_binlog(outbox)
    _states_equal(src, dst, "before bad batch")

    src_eng.apply_binlog(full)  # the "bad" follow-up epochs
    emit_changes(src, outbox)
    dst_eng.apply_binlog(outbox)
    _states_equal(src, dst, "bad state replicated")

    src.rollback(good_version)
    info = emit_changes(src, outbox)
    assert info["events"] > 0  # the rollback's logical diff
    dst_eng.apply_binlog(outbox)
    _states_equal(src, dst, "after rollback")


import pytest as _pytest


@_pytest.mark.parametrize("seed", [7, 23])
def test_outbox_chain_random_interleaving(spark, tmp_warehouse, seed):
    """Model test: random interleavings of source applies (including
    redeliveries), emissions, cursor-crash rollbacks, and replica
    catch-ups — after a final emit+catch-up the chain reconverges to
    the oracle replay, regardless of history."""
    import random

    rng = random.Random(seed)
    src_eng, src = _mk(spark, tmp_warehouse, "src")
    dst_eng, dst = _mk(spark, tmp_warehouse, "dst")
    outbox = os.path.join(tmp_warehouse, "outbox")

    n_epochs = 4
    full = _binlog(
        spark, tmp_warehouse, "log", seed=seed,
        n_events=1200, n_docs=100, n_epochs=n_epochs,
    )
    chunks = {
        e: _subset(full, os.path.join(tmp_warehouse, f"e{e}"), (e,))
        for e in range(n_epochs)
    }
    delivered = []
    steps = []
    for _ in range(10):
        op = rng.choice(["apply_new", "redeliver", "emit", "catchup", "crash_cursor"])
        steps.append(op)
        if op == "apply_new" and len(delivered) < n_epochs:
            e = len(delivered)
            src_eng.apply_binlog(chunks[e])
            delivered.append(e)
        elif op == "redeliver" and delivered:
            src_eng.apply_binlog(chunks[rng.choice(delivered)])
        elif op == "emit":
            emit_changes(src, outbox)
        elif op == "catchup" and os.path.isdir(outbox):
            dst_eng.apply_binlog(outbox)
        elif op == "crash_cursor":
            cur = os.path.join(outbox, "_outbox_cursor.json")
            if os.path.exists(cur):
                os.remove(cur)
    # drain: deliver what's left, emit, catch up
    for e in range(len(delivered), n_epochs):
        src_eng.apply_binlog(chunks[e])
    emit_changes(src, outbox)
    dst_eng.apply_binlog(outbox)

    want = oracle.replay(full)
    oracle.assert_equal_state(
        want.state, src.read().collect(), f"src after {steps}"
    )
    oracle.assert_equal_state(
        want.state, dst.read().collect(), f"replica after {steps}"
    )


def test_replica_follows_source_rewrite_payload(spark, tmp_warehouse):
    """An in-place corpus rewrite (vocab migration) is a logical
    change: its diff travels through the outbox as ordinary upserts and
    the replica converges to the rewritten corpus."""
    from pyspark.sql import functions as F

    src_eng, src = _mk(spark, tmp_warehouse, "src")
    dst_eng, dst = _mk(spark, tmp_warehouse, "dst")
    outbox = os.path.join(tmp_warehouse, "outbox")

    full = _binlog(spark, tmp_warehouse, "b1", seed=77, n_events=1600, n_epochs=2)
    src_eng.apply_binlog(full)
    emit_changes(src, outbox)
    dst_eng.apply_binlog(outbox)
    _states_equal(src, dst, "before rewrite")

    src.rewrite_payload({"tokens": F.transform("tokens", lambda t: t + 7)})
    info = emit_changes(src, outbox)
    assert info["events"] > 0
    dst_eng.apply_binlog(outbox)
    _states_equal(src, dst, "after rewrite")

    # redelivery of the whole outbox is still a no-op
    v = dst.current_version()
    dst_eng.apply_binlog(outbox)
    assert dst.current_version() == v
    _states_equal(src, dst, "after redelivery")
