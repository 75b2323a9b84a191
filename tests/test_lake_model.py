"""Model-based randomized check of the full LakeTable op surface.

The north rule's acceptance bar is final-state equality ("matching the
reference's final table state after replay ... 100% token-array
equality"). This test drives RANDOM interleavings of every mutating
operation the table supports — merge (copy-on-write AND merge-on-read),
key deletes, predicate deletes, compact, rebucket, overwrite, snapshot
rollback, and branch-stage-then-publish — against a plain Python dict
model, then asserts:

  * final per-doc_id TOKEN-ARRAY equality (the north-rule invariant),
  * time travel: every historical version still reads back as the
    model looked at that point (manifests immutable, commits
    content-addressed),
  * epoch commit markers survive arbitrary interleavings of
    compact/rebucket/overwrite — the engine's redelivery guard
    (stream.py filters batches whose epoch is committed) keys off
    these markers; the redelivered-batch no-op itself is exercised
    end-to-end in test_stream / test_cdc_end_to_end.

Sequences are seeded (reproducible), not hypothesis-driven: each op is
a Spark job, so shrinking would be slow; seeds cover cow/mor mixes,
delete-heavy and rebucket-heavy runs.
"""

import os
import random

import pytest

from dexspark.lake import LakeTable
from dexspark.schema import sequences_schema

KEYS = [f"d{i}" for i in range(24)]
SOURCES = ["web", "books", "code"]


def _payload(rng, key):
    n = rng.randint(0, 6)
    toks = [rng.randint(0, 99) for _ in range(n)]
    return (key, toks, n, rng.choice(SOURCES))


def _snapshot(table, version=None):
    return {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in table.read(version=version).collect()
    }


def _apply_random_ops(spark, table, rng, n_ops):
    """Returns (model_after_final,
    [(version, model_snapshot, committed_epochs)], epochs)."""
    model: dict = {}
    history = []
    epoch = 0
    merged_epochs = []
    for _ in range(n_ops):
        op = rng.choices(
            ["merge", "delete_where", "compact", "rebucket", "overwrite",
             "rollback", "branch_publish", "rewrite_payload"],
            weights=[50, 10, 8, 8, 8, 8, 12, 8],
        )[0]
        if op == "merge":
            ups = [_payload(rng, k) for k in rng.sample(KEYS, rng.randint(1, 8))]
            up_keys = {u[0] for u in ups}
            dels = [
                k for k in rng.sample(KEYS, rng.randint(0, 4)) if k not in up_keys
            ]
            mode = rng.choice(["cow", "mor"])
            table.merge(
                spark.createDataFrame(ups, schema=sequences_schema()),
                spark.createDataFrame([(k,) for k in dels], "doc_id string")
                if dels
                else None,
                epochs=[epoch],
                mode=mode,
            )
            for k, toks, n, src in ups:
                model[k] = (toks, n, src)
            for k in dels:
                model.pop(k, None)
            merged_epochs.append(epoch)
            epoch += 1
        elif op == "delete_where":
            src = rng.choice(SOURCES)
            table.delete_where(f"source = '{src}'", mode=rng.choice(["cow", "mor"]))
            model = {k: v for k, v in model.items() if v[2] != src}
        elif op == "compact":
            # randomly a full fold-down, a depth-gated pass, or a
            # bounded partial pass (deepest buckets first) — partial
            # compaction must be state-identity like the full one
            table.compact(
                min_depth=rng.choice([1, 1, 2]),
                max_buckets=rng.choice([None, 1, 2]),
            )
        elif op == "rebucket":
            table.rebucket(rng.choice([2, 4, 8]))
        elif op == "rollback" and history:
            # restore a random recorded snapshot: data AND the
            # exactly-once epoch markers must rewind together
            version, snap, eps = rng.choice(history)
            table.rollback(version)
            model = dict(snap)
            merged_epochs = list(eps)
        elif op == "branch_publish":
            # write-audit-publish inside the interleaving: stage 1-2
            # merges on a branch, then promote — net model effect is
            # the staged ops, applied atomically
            name = f"br{epoch}"
            table.create_branch(name)
            bt = LakeTable(spark, table.root, branch=name)
            for _ in range(rng.randint(1, 2)):
                ups = [_payload(rng, k) for k in rng.sample(KEYS, rng.randint(1, 6))]
                up_keys = {u[0] for u in ups}
                dels = [
                    k for k in rng.sample(KEYS, rng.randint(0, 3))
                    if k not in up_keys
                ]
                bt.merge(
                    spark.createDataFrame(ups, schema=sequences_schema()),
                    spark.createDataFrame([(k,) for k in dels], "doc_id string")
                    if dels
                    else None,
                    epochs=[epoch],
                    mode=rng.choice(["cow", "mor"]),
                )
                for k, toks, n, src in ups:
                    model[k] = (toks, n, src)
                for k in dels:
                    model.pop(k, None)
                merged_epochs.append(epoch)
                epoch += 1
            table.publish_branch(name)
            table.drop_branch(name)
        elif op == "overwrite":
            rows = [_payload(rng, k) for k in rng.sample(KEYS, rng.randint(1, 6))]
            table.overwrite(spark.createDataFrame(rows, schema=sequences_schema()))
            model = {k: (t, n, s) for k, t, n, s in rows}
        elif op == "rewrite_payload":
            # in-place full-corpus transform (vocab-shift shape): must
            # compose with every other commit type and fold MOR history
            shift = rng.randint(1, 5)
            from pyspark.sql import functions as F

            table.rewrite_payload(
                {"tokens": F.transform("tokens", lambda t: t + shift)}
            )
            model = {
                k: ([t + shift for t in toks], n, src)
                for k, (toks, n, src) in model.items()
            }
        history.append(
            (table.manifest()["version"], dict(model), list(merged_epochs))
        )
    return model, history, merged_epochs


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_op_sequences_match_model(spark, tmp_warehouse, seed):
    rng = random.Random(seed)
    root = os.path.join(tmp_warehouse, f"model{seed}")
    table = LakeTable.create(
        spark, root, sequences_schema(), key="doc_id", num_buckets=4
    )
    model, history, merged_epochs = _apply_random_ops(spark, table, rng, n_ops=9)

    # North-rule invariant: exact per-doc token-array equality.
    assert _snapshot(table) == model

    # Every merged epoch's commit marker survives the whole
    # interleaving (the engine's redelivery guard keys off these).
    for ep in merged_epochs:
        assert table.is_epoch_committed(ep)
    assert not table.is_epoch_committed(10**6)

    # Time travel: every recorded version reads back as the model was.
    for version, snap, _eps in rng.sample(history, min(3, len(history))):
        assert _snapshot(table, version=version) == snap, f"version {version}"


def test_vacuum_preserves_current_state_after_random_ops(spark, tmp_warehouse):
    rng = random.Random(5)
    root = os.path.join(tmp_warehouse, "modelvac")
    table = LakeTable.create(
        spark, root, sequences_schema(), key="doc_id", num_buckets=4
    )
    model, _, _ = _apply_random_ops(spark, table, rng, n_ops=7)
    table.vacuum(keep_last=1, min_age_seconds=0)  # 0 OK: no concurrent writer
    assert _snapshot(table) == model
