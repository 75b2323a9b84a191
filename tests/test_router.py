"""Multi-table router: one binlog fanned out to N engines exactly-once.

The invariant under routing is the same token-array equality bar as
the single-engine path (BASELINE.json input_hint), applied per route:
the union of the routed tables must equal the oracle's full replay
state, split by the route function — plus the router-specific
bookkeeping: EVERY route's watermark advances through every batch
epoch (even epochs that routed zero events to it), and redelivery is
a no-op on every route."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dexspark import gen, oracle
from dexspark.config import EngineConfig
from dexspark.lake import LakeTable
from dexspark.router import RoutedEngine
from dexspark.schema import sequences_schema
from dexspark.stream import CdcEngine

N_DOCS = 200
N_EVENTS = 1_500
N_EPOCHS = 3

# "doc%08d" ends in a digit: parity of the last digit is computable
# identically in Spark (route expr) and Python (oracle split).
# (A string so it builds without an active SparkContext at import.)
PARITY = "cast(cast(substring(doc_id, -1, 1) as int) % 2 as string)"


def _parity(doc_id: str) -> str:
    return str(int(doc_id[-1]) % 2)


def _mk_routes(spark, tmp_warehouse, names=("0", "1"), num_buckets=4):
    routes = {}
    for name in names:
        wh = os.path.join(tmp_warehouse, f"route-{name}")
        table = LakeTable.create(
            spark,
            os.path.join(wh, "sequences"),
            sequences_schema(),
            key="doc_id",
            num_buckets=num_buckets,
        )
        routes[name] = CdcEngine(
            spark, table, wh, EngineConfig(num_buckets=num_buckets)
        )
    return routes


@pytest.fixture()
def binlog(spark, tmp_warehouse):
    events = gen.change_events(
        spark,
        n_events=N_EVENTS,
        n_docs=N_DOCS,
        n_epochs=N_EPOCHS,
        max_len=12,
        anomaly_pct=10,
    )
    path = os.path.join(tmp_warehouse, "binlog")
    gen.write_binlog(events, path)
    return path


def _split_state(state: dict) -> dict[str, dict]:
    out = {"0": {}, "1": {}}
    for k, v in state.items():
        out[_parity(k)][k] = v
    return out


def _count_unroutable(binlog_path: str) -> int:
    """Events whose doc_id yields a NULL parity: malformed JSON and
    NULL/absent doc_id (blank lines are source rows too — the parser
    keeps them as malformed raw, routed nowhere)."""
    n = 0
    for fn in sorted(os.listdir(binlog_path)):
        if not fn.endswith(".ndjson"):
            continue
        with open(os.path.join(binlog_path, fn)) as f:
            for line in f:
                line = line.rstrip("\n")
                try:
                    ev = json.loads(line)
                    if not isinstance(ev, dict):
                        raise ValueError
                except ValueError:
                    n += 1
                    continue
                d = ev.get("doc_id")
                if d is None or not str(d)[-1:].isdigit():
                    n += 1
    return n


def test_parity_routing_matches_oracle_split(spark, tmp_warehouse, binlog):
    routes = _mk_routes(spark, tmp_warehouse)
    router = RoutedEngine(spark, tmp_warehouse, routes, PARITY)
    metrics = router.apply_binlog(binlog)

    want = oracle.replay(binlog)
    split = _split_state(want.state)
    for name, eng in routes.items():
        oracle.assert_equal_state(
            split[name], eng.table.read().collect(), f"route {name}"
        )
        # the quiet half of every epoch still advances this route's
        # watermark: the router passed the batch's epoch set as extras
        w, tail = eng.table.epoch_state()
        assert w == N_EPOCHS - 1 and tail == [], (name, w, tail)

    # quarantine accounting: unroutable events (NULL parity) land in
    # the router sink; every other reject lands in its route's engine
    n_unrouted = _count_unroutable(binlog)
    assert n_unrouted > 0, "fixture should generate unroutable anomalies"
    got_unrouted = spark.read.parquet(router.unrouted_path)
    assert got_unrouted.count() == n_unrouted
    assert got_unrouted.filter(F.size("fail_reasons") == 0).count() == 0
    assert (
        sum(m.rejects for m in metrics.values())
        == want.quarantined - n_unrouted
    )


def test_redelivery_is_noop_on_every_route(spark, tmp_warehouse, binlog):
    # max_parallel_routes=1 exercises the sequential apply path (the
    # other tests run the threaded default); results must be identical
    routes = _mk_routes(spark, tmp_warehouse)
    router = RoutedEngine(
        spark, tmp_warehouse, routes, PARITY, max_parallel_routes=1
    )
    router.apply_binlog(binlog)
    versions = {n: e.table.current_version() for n, e in routes.items()}
    states = {n: oracle.state_from_rows(e.table.read().collect()) for n, e in routes.items()}

    again = router.apply_binlog(binlog)  # full redelivery
    for name, eng in routes.items():
        assert again[name].epochs == []
        assert eng.table.current_version() == versions[name], name
        oracle.assert_equal_state(
            states[name], eng.table.read().collect(), f"redelivered {name}"
        )


def test_quiet_route_watermark_advances_by_markers_only(spark, tmp_warehouse, binlog):
    """A route that never receives a single event must still track the
    stream's epochs (manifest-only marker commits) — otherwise every
    epoch sits in its out-of-order tail forever."""
    routes = _mk_routes(spark, tmp_warehouse)
    router = RoutedEngine(
        spark, tmp_warehouse, routes, F.lit("0"), default="0"
    )
    metrics = router.apply_binlog(binlog)

    quiet = routes["1"].table
    w, tail = quiet.epoch_state()
    assert w == N_EPOCHS - 1 and tail == []
    assert metrics["1"].epochs == list(range(N_EPOCHS))
    assert metrics["1"].events_seen == 0
    # marker-only commits carry no data
    assert quiet.read().count() == 0
    # and the busy route matches the full oracle (default absorbed all)
    want = oracle.replay(binlog)
    oracle.assert_equal_state(
        want.state, routes["0"].table.read().collect(), "default route"
    )
    # with a default route there is no router quarantine
    assert not os.path.exists(router.unrouted_path)


def test_streaming_routed_tail_converges(spark, tmp_warehouse, binlog):
    """Structured Streaming tail through the router with split epochs
    (maxFilesPerTrigger=3 over 4-files-per-epoch binlog): the deferred
    boundary marker logic must hold uniformly across routes."""
    routes = _mk_routes(spark, tmp_warehouse)
    router = RoutedEngine(spark, tmp_warehouse, routes, PARITY)
    router.run_until_caught_up(
        binlog,
        os.path.join(tmp_warehouse, "ckpt"),
        max_files_per_trigger=3,
    )
    want = oracle.replay(binlog)
    split = _split_state(want.state)
    for name, eng in routes.items():
        oracle.assert_equal_state(
            split[name], eng.table.read().collect(), f"streamed route {name}"
        )
        w, tail = eng.table.epoch_state()
        assert w == N_EPOCHS - 1 and tail == [], (name, w, tail)


def test_router_rejects_bad_default(spark, tmp_warehouse):
    routes = _mk_routes(spark, tmp_warehouse)
    with pytest.raises(ValueError):
        RoutedEngine(spark, tmp_warehouse, routes, PARITY, default="nope")
    with pytest.raises(ValueError):
        RoutedEngine(spark, tmp_warehouse, {}, PARITY)


def test_cli_routed_tail(spark, tmp_warehouse, binlog, capsys):
    """--route/--route-expr drive a RoutedEngine through the CLI: both
    tables converge to the oracle parity split and report per-route
    status; rerun (fresh checkpoint) is a no-op."""
    from dexspark import cli

    argv = [
        "--route", "0=" + os.path.join(tmp_warehouse, "t0"),
        "--route", "1=" + os.path.join(tmp_warehouse, "t1"),
        "--route-expr", PARITY,
        "--binlog", binlog,
        "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
        "--warehouse", os.path.join(tmp_warehouse, "wh"),
        "--create", "--num-buckets", "4",
    ]
    assert cli.main(argv) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = oracle.replay(binlog)
    split = _split_state(want.state)
    for name in ("0", "1"):
        assert out["routes"][name]["epoch_watermark"] == N_EPOCHS - 1
        t = LakeTable(spark, os.path.join(tmp_warehouse, f"t{name}"))
        oracle.assert_equal_state(
            split[name], t.read().collect(), f"cli route {name}"
        )

    versions = {n: out["routes"][n]["table_version"] for n in ("0", "1")}
    argv[argv.index("--checkpoint") + 1] = os.path.join(tmp_warehouse, "ckpt2")
    assert cli.main(argv) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {n: out2["routes"][n]["table_version"] for n in ("0", "1")} == versions


def test_cli_route_validation(tmp_warehouse):
    from dexspark import cli
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli.main(["--route", "a=/tmp/x", "--binlog", "b", "--checkpoint",
                  "c", "--warehouse", "w"])  # no --route-expr
    with _pytest.raises(SystemExit):
        cli.main(["--binlog", "b", "--checkpoint", "c", "--warehouse", "w"])  # no --table


def test_route_value_edge_cases(spark, tmp_warehouse):
    """Routing contract under hostile route values: unicode keys,
    values matching no route, NULL doc_ids (malformed envelopes), and
    keys that embed the delimiter — compared against a plain-Python
    split of the same rules."""
    import json as _json

    def _ev(doc_id, lsn, payload=True):
        d = {
            "op": "update",
            "doc_id": doc_id,
            "commit_ts": f"2024-01-01T00:00:{lsn:02d}.000Z",
            "lsn": lsn,
            "batch_epoch": 0,
        }
        if payload:
            d["payload"] = {"tokens": [1, 2], "n_tok": 2, "source": "wiki"}
        return _json.dumps(d)

    doc_ids = [
        "αβγ-a",        # unicode prefix
        "x-b",
        "y-c",          # suffix matches no route -> unrouted
        "z--a",         # embedded delimiter; split(-1) still 'a'
        "plain",        # no delimiter: split(-1) = whole id -> unrouted
        None,           # malformed envelope (doc_id null) -> unrouted
    ]
    lines = [_ev(d, i) for i, d in enumerate(doc_ids)]
    lines.append("{not json")  # parse failure -> NULL route -> unrouted
    blog = os.path.join(tmp_warehouse, "edge-binlog")
    os.makedirs(blog)
    with open(os.path.join(blog, "epoch-0-0.ndjson"), "w") as f:
        f.write("\n".join(lines) + "\n")

    routes = _mk_routes(spark, tmp_warehouse, names=("a", "b"))
    router = RoutedEngine(
        spark, tmp_warehouse, routes,
        "element_at(split(doc_id, '-'), -1)",
    )
    router.apply_binlog(blog)

    def py_route(d):
        if d is None:
            return None
        tail = d.split("-")[-1]
        return tail if tail in ("a", "b") else None

    want = {"a": set(), "b": set()}
    unrouted = 1  # the malformed line
    for d in doc_ids:
        r = py_route(d)
        if r is None:
            unrouted += 1
        else:
            want[r].add(d)
    for name, eng in routes.items():
        got = {r["doc_id"] for r in eng.table.read().collect()}
        assert got == want[name], (name, got, want[name])
        assert eng.table.epoch_state()[0] == 0  # all routes marked epoch 0
    q = spark.read.parquet(router.unrouted_path)
    assert q.count() == unrouted


def test_reprocess_unrouted_after_route_added(spark, tmp_warehouse):
    """Dead-letter replay: events that matched no route are recovered
    once the missing route exists — through the new route's OWN
    quarantine-replay machinery, so validation still gates them."""
    import json as _json

    def _ev(doc_id, lsn, good=True):
        p = {"tokens": [1, 2], "n_tok": 2 if good else 5, "source": "wiki"}
        return _json.dumps({
            "op": "update", "doc_id": doc_id, "payload": p,
            "commit_ts": f"2024-01-01T00:00:{lsn:02d}.000Z",
            "lsn": lsn, "batch_epoch": 0,
        })

    lines = [
        _ev("x-a", 1),
        _ev("q-c", 2),          # no 'c' route yet -> unrouted
        _ev("r-c", 3, good=False),  # unrouted now, INVALID later
        "{broken",              # malformed: unroutable forever
    ]
    blog = os.path.join(tmp_warehouse, "binlog")
    os.makedirs(blog)
    with open(os.path.join(blog, "epoch-0-0.ndjson"), "w") as f:
        f.write("\n".join(lines) + "\n")

    expr = "element_at(split(doc_id, '-'), -1)"
    routes = _mk_routes(spark, tmp_warehouse, names=("a", "b"))
    router = RoutedEngine(spark, tmp_warehouse, routes, expr)
    router.apply_binlog(blog)
    assert spark.read.parquet(router.unrouted_path).count() == 3

    # operator adds the missing route and replays the dead letters
    routes2 = dict(routes, **_mk_routes(spark, tmp_warehouse, names=("c",)))
    router2 = RoutedEngine(spark, tmp_warehouse, routes2, expr)
    info = router2.reprocess_unrouted()
    assert info["rerouted"] == {"a": 0, "b": 0, "c": 2}
    assert info["still_unrouted"] == 1  # the malformed line
    assert info["replay"]["c"]["recovered"] == 1  # q-c passes rules
    assert info["replay"]["c"]["still_failing"] == 1  # r-c: n_tok != len

    got = {r["doc_id"] for r in routes2["c"].table.read().collect()}
    assert got == {"q-c"}
    assert spark.read.parquet(router2.unrouted_path).count() == 1
    # idempotent rerun: nothing left to reroute
    again = router2.reprocess_unrouted()
    assert again["rerouted"] == {"a": 0, "b": 0, "c": 0}
    assert again["still_unrouted"] == 1


def test_cli_reprocess_unrouted(spark, tmp_warehouse, binlog, capsys):
    """--reprocess-unrouted through the CLI: adding a route recovers
    its dead letters."""
    import json as _json

    from dexspark import cli

    wh = os.path.join(tmp_warehouse, "wh")
    base = [
        "--route", "0=" + os.path.join(tmp_warehouse, "t0"),
        "--route-expr", PARITY,
        "--binlog", binlog,
        "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
        "--warehouse", wh,
        "--create", "--num-buckets", "4", "--batch",
    ]
    assert cli.main(base) == 0
    capsys.readouterr()
    # odd-parity docs were unrouted; add route 1 and replay
    argv = [
        "--route", "0=" + os.path.join(tmp_warehouse, "t0"),
        "--route", "1=" + os.path.join(tmp_warehouse, "t1"),
        "--route-expr", PARITY,
        "--warehouse", wh,
        "--create", "--num-buckets", "4",
        "--reprocess-unrouted",
    ]
    assert cli.main(argv) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rerouted"]["1"] > 0
    assert out["replay"]["1"]["recovered"] > 0
    want = oracle.replay(binlog)
    split = _split_state(want.state)
    t1 = LakeTable(spark, os.path.join(tmp_warehouse, "t1"))
    oracle.assert_equal_state(split["1"], t1.read().collect(), "cli replayed route")


def test_consistent_read_pins_complete_fanouts(spark, tmp_warehouse, binlog):
    """consistent_read returns a cross-shard snapshot at the last
    COMPLETE fan-out even while one shard has advanced past it (the
    crash-redelivery window where shards sit at different frontiers)."""
    routes = _mk_routes(spark, tmp_warehouse)
    router = RoutedEngine(spark, tmp_warehouse, routes, PARITY)
    router.apply_binlog(binlog)
    pinned_counts = {
        n: df.count() for n, df in router.consistent_read().items()
    }
    live_counts = {n: e.table.read().count() for n, e in routes.items()}
    assert pinned_counts == live_counts  # quiescent: pin == head

    # simulate a mid-fan-out crash: one route applies a later batch,
    # the pin is never rewritten (no router.apply_batch completion)
    import json as _json

    extra = _json.dumps({
        "op": "update", "doc_id": "zzz-extra-0",
        "payload": {"tokens": [1], "n_tok": 1, "source": "wiki"},
        "commit_ts": "2030-01-01T00:00:00.000Z", "lsn": 999999,
        "batch_epoch": 99,
    })
    blog2 = os.path.join(tmp_warehouse, "late")
    os.makedirs(blog2)
    with open(os.path.join(blog2, "epoch-99-0.ndjson"), "w") as f:
        f.write(extra + "\n")
    routes["0"].apply_binlog(blog2)  # shard 0 is now AHEAD of the pin

    got = router.consistent_read()
    assert got["0"].count() == pinned_counts["0"]  # pinned, not live
    assert routes["0"].table.read().count() == pinned_counts["0"] + 1
    assert got["0"].filter("doc_id = 'zzz-extra-0'").count() == 0

    # the next complete fan-out advances the pin past the straggler
    router.apply_binlog(blog2)  # epoch 99 already on shard 0: no-op there
    got2 = router.consistent_read()
    assert got2["0"].filter("doc_id = 'zzz-extra-0'").count() == 1


def test_eight_route_fanout(spark, tmp_warehouse, binlog):
    """N > pool-size routes: 8 shards through the bounded (4-thread)
    pool — shard union equals the oracle state, no row lost or doubled,
    every shard's watermark in step."""
    names = tuple(str(i) for i in range(8))
    routes = _mk_routes(spark, tmp_warehouse, names=names, num_buckets=2)
    expr = "cast(cast(substring(doc_id, -1, 1) as int) % 8 as string)"
    router = RoutedEngine(spark, tmp_warehouse, routes, expr)
    router.apply_binlog(binlog)

    want = oracle.replay(binlog)
    got_union = {}
    for name, eng in routes.items():
        rows = eng.table.read().collect()
        for r in rows:
            assert str(int(r["doc_id"][-1]) % 8) == name  # routed correctly
            assert r["doc_id"] not in got_union  # shards are disjoint
        got_union.update(oracle.state_from_rows(rows))
        assert eng.table.epoch_state() == (N_EPOCHS - 1, [])
    assert got_union.keys() == want.state.keys()
    for k, v in want.state.items():
        assert list(got_union[k]["tokens"] or []) == list(v["tokens"] or []), k


def test_routed_patch_mode_quiet_route_markers(spark, tmp_warehouse):
    """Patch-mode engines behind the router: the patch apply path must
    honor extra_epochs too — a route that saw no events of an epoch
    still marks it, and composed patches land on the right shard."""
    import json as _json

    def _pev(doc, ts, lsn, epoch, payload, fields):
        return _json.dumps({
            "op": "update", "doc_id": doc,
            "commit_ts": f"2026-01-01 00:00:{ts:02d}", "lsn": lsn,
            "batch_epoch": epoch, "payload": payload, "fields": fields,
        })

    lines = [
        # doc x-a: two composing patches, SAME epoch 0
        _pev("x-a", 1, 1, 0, {"tokens": [1, 2], "n_tok": 2}, ["tokens", "n_tok"]),
        _pev("x-a", 2, 2, 0, {"source": "wiki"}, ["source"]),
        # epoch 1 routes ONLY to 'a' as well: route 'b' stays quiet
        _pev("y-a", 3, 3, 1, {"tokens": [5], "n_tok": 1, "source": "web"},
             ["tokens", "n_tok", "source"]),
    ]
    # real-writer layout: files PARTITION epochs (the listing-derived
    # epoch set assumes this; see RoutedEngine._epochs_from_listing)
    blog = os.path.join(tmp_warehouse, "patch-binlog")
    os.makedirs(blog)
    with open(os.path.join(blog, "epoch-0-0.ndjson"), "w") as f:
        f.write("\n".join(lines[:2]) + "\n")
    with open(os.path.join(blog, "epoch-1-0.ndjson"), "w") as f:
        f.write(lines[2] + "\n")

    routes = {}
    for name in ("a", "b"):
        wh = os.path.join(tmp_warehouse, f"route-{name}")
        t = LakeTable.create(
            spark, os.path.join(wh, "t"), sequences_schema(),
            key="doc_id", num_buckets=4,
        )
        routes[name] = CdcEngine(
            spark, t, wh, EngineConfig(num_buckets=4, patch_events=True)
        )
    router = RoutedEngine(
        spark, tmp_warehouse, routes, "element_at(split(doc_id, '-'), -1)"
    )
    router.apply_binlog(blog)

    rows = {r["doc_id"]: r for r in routes["a"].table.read().collect()}
    assert list(rows["x-a"]["tokens"]) == [1, 2]  # patch 1 survived...
    assert rows["x-a"]["source"] == "wiki"        # ...composed with patch 2
    assert rows["y-a"]["n_tok"] == 1
    # the quiet patch-mode route marked both epochs (manifest-only)
    assert routes["b"].table.read().count() == 0
    assert routes["b"].table.epoch_state() == (1, [])
    # redelivery: no-op on both (patch path honors the markers)
    v = {n: e.table.current_version() for n, e in routes.items()}
    router.apply_binlog(blog)
    assert {n: e.table.current_version() for n, e in routes.items()} == v


def test_unrouted_sink_retention(spark, tmp_warehouse, binlog):
    """unrouted_retention_epochs bounds the dead-letter sink like the
    engines' sink retention: old epoch partitions expire under the
    min route watermark; the -1 fallback partition never does."""
    routes = _mk_routes(spark, tmp_warehouse)
    router = RoutedEngine(
        spark, tmp_warehouse, routes, PARITY, unrouted_retention_epochs=1
    )
    router.apply_binlog(binlog)  # epochs 0..N_EPOCHS-1, watermark 2

    parts = {
        d for d in os.listdir(router.unrouted_path)
        if d.startswith("batch_epoch=")
    }
    kept_epochs = {
        int(d.split("=")[1]) for d in parts
        if not d.split("=")[1].startswith("-")
        and d.split("=")[1].lstrip("-").isdigit()
    }
    # keep=1 under watermark 2: only epoch 2 survives of 0,1,2
    assert all(e >= N_EPOCHS - 1 for e in kept_epochs), kept_epochs
    # the fallback partition (malformed lines) survives retention
    assert any(d.split("=")[1].startswith("-") for d in parts), parts


def test_cli_routes_status(spark, tmp_warehouse, binlog, capsys):
    import json as _json

    from dexspark import cli

    base = [
        "--route", "0=" + os.path.join(tmp_warehouse, "t0"),
        "--route", "1=" + os.path.join(tmp_warehouse, "t1"),
        "--route-expr", PARITY,
        "--warehouse", os.path.join(tmp_warehouse, "wh"),
    ]
    assert cli.main(base + [
        "--binlog", binlog,
        "--checkpoint", os.path.join(tmp_warehouse, "ckpt"),
        "--create", "--num-buckets", "4", "--batch",
    ]) == 0
    capsys.readouterr()
    assert cli.main(base + ["--routes-status"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for name in ("0", "1"):
        assert out["routes"][name]["epoch_watermark"] == N_EPOCHS - 1
        assert out["consistent_pin"][name] == out["routes"][name]["table_version"]
    assert out["unrouted_rows"] > 0  # the parity-NULL anomalies
