"""Exactly-once outbox: re-emit a table's changelog as a binlog.

Closes the CDC loop: everything UPSTREAM of a LakeTable is a binlog
(the engine tails one), and with the outbox everything DOWNSTREAM can
be one too — a replica engine (or any external consumer) tails the
emitted directory with the standard binlog readers. Cascading
replication (A -> B -> C), cross-region fan-out, and the
transactional-outbox pattern (emit events only for COMMITTED table
state, never from the write path) all fall out of one operator.

Construction (all idempotence is structural, no distributed locks):

* **Epoch = source commit version.** Each emitted change event carries
  ``batch_epoch = _commit_version``. The downstream engine's epoch
  markers then give exactly-once *application* for free — a re-emitted
  or re-read epoch is filtered by the consumer's own manifest, the
  same machinery that makes the primary binlog tail idempotent.
* **Total order = (commit version, key hash).** ``commit_ts`` is
  synthesized as ``timestamp_micros(_commit_version)`` — strictly
  increasing across commits, so downstream last-writer-wins replays
  the table's own commit order; ``lsn = xxhash64(doc_id)`` breaks
  same-commit ties deterministically (a key appears at most once per
  commit, so ties are always across distinct keys).
* **Idempotent emission.** Data lands as a STRUCTURED parquet binlog
  partitioned by ``batch_epoch`` with dynamic partition overwrite; the
  cursor (``_outbox_cursor.json``, underscore-prefixed so binlog scans
  ignore it) is advanced only after the write completes. A crash
  between the two re-emits the same versions into the same partitions
  (identical content), and the consumer's markers absorb any
  duplicate delivery — at-least-once emission, exactly-once effect.

Cost: O(change) per emission for MOR sources (`LakeTable.changes`
reads exactly the appended files), bucket-diff bounded for COW.
Physical-only commits (compact / rebucket / merge-noop) emit nothing.

Reference parity: the reference emits OK/FAIL lineage events back to
a bus after each blob (FnDecompressorEntry.kt:41-51 Event Hub
output); this is the table-changelog generalization.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ..lake import LakeTable

CURSOR_FILE = "_outbox_cursor.json"
SCHEMA_FILE = "_outbox_schema.json"  # mirrored by events.OUTBOX_SCHEMA_FILE


def _cursor(out_dir: str) -> int:
    p = os.path.join(out_dir, CURSOR_FILE)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(json.load(f)["synced_through"])


def _write_json(path: str, doc) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, path)  # atomic on POSIX


def _write_cursor(out_dir: str, version: int) -> None:
    _write_json(
        os.path.join(out_dir, CURSOR_FILE), {"synced_through": int(version)}
    )


def emit_changes(
    table: LakeTable, out_dir: str, files_per_commit: int = 2
) -> dict:
    """Emit every commit in ``(cursor, current]`` as binlog epochs.

    Returns ``{"synced_through", "emitted_versions", "events"}``.
    Safe to run on any cadence (cron after each batch, or lazily);
    requires the emitted version range to still be inside the source's
    vacuum retention horizon (same contract as ``changes()``)."""
    os.makedirs(out_dir, exist_ok=True)
    synced = _cursor(out_dir)
    cur = table.current_version()
    if cur <= synced:
        return {"synced_through": synced, "emitted_versions": [], "events": 0}

    key = table.key
    payload_cols = [f.name for f in table.schema.fields if f.name != key]
    ch = table.changes(synced, cur)
    is_del = F.col("_change_type") == "delete"
    events = ch.select(
        F.when(is_del, F.lit("delete")).otherwise(F.lit("update")).alias("op"),
        F.col(key).alias("doc_id"),
        # deletes are key-only downstream (MOR tombstones carry no
        # image anyway; COW pre-images are dropped for parity)
        F.when(~is_del, F.struct(*payload_cols)).alias("payload"),
        F.timestamp_micros(F.col("_commit_version")).alias("commit_ts"),
        F.xxhash64(key).alias("lsn"),
        F.col("_commit_version").alias("batch_epoch"),
    )
    emitted_versions = sorted(
        int(r[0]) for r in events.select("batch_epoch").distinct().collect()
    )
    (
        events.withColumn(
            "_f", F.pmod(F.xxhash64("doc_id"), F.lit(files_per_commit))
        )
        .repartition(F.col("batch_epoch"), F.col("_f"))
        .drop("_f")
        .write.mode("overwrite")
        .partitionBy("batch_epoch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(out_dir)
    )
    # publish the CURRENT payload schema beside the log (the
    # schema-registry-beside-the-topic pattern): a consumer with no
    # explicit payload_schema parses evolved columns instead of
    # casting them away to the default struct. Additive evolution
    # means the latest schema is a superset — older epochs' rows read
    # null for the new columns, exactly the engine's evolution
    # contract. Written before the cursor: the same crash-redelivery
    # window as the data, idempotent rewrite.
    import pyspark.sql.types as T

    _write_json(
        os.path.join(out_dir, SCHEMA_FILE),
        T.StructType([f for f in table.schema.fields if f.name != key]).jsonValue(),
    )
    _write_cursor(out_dir, cur)
    # count from the written files (new partitions only) rather than a
    # second changes() scan
    n_events = 0
    if emitted_versions:
        n_events = (
            table.spark.read.parquet(out_dir)
            .where(F.col("batch_epoch").isin(emitted_versions))
            .count()
        )
    return {
        "synced_through": cur,
        "emitted_versions": emitted_versions,
        "events": int(n_events),
    }
