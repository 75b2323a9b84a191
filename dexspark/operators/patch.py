"""Partial-update (patch) CDC events — Debezium-style partial images.

The reference's envelopes are lenient about absent fields (extra or
missing JSON keys never fail the parse — `AzureBlobCreateEventMessage.
kt:5`, SURVEY §1.1), but its payloads are whole files. A real binlog
tail also carries UPDATE events with *partial* row images (MySQL
binlog_row_image=MINIMAL, Debezium partial updates, Mongo $set): the
event names the columns it sets and says nothing about the rest. A
missing JSON key decodes to null, which is indistinguishable from an
explicit ``SET col = NULL`` — so patch events must carry a ``fields``
array naming what they set, and the engine must resolve them against
the current row before the standard LWW merge.

Semantics implemented by :func:`apply_patches` (all pure JVM
higher-order functions — no Python in the path):

* Events for one key compose IN ``(commit_ts, lsn)`` ORDER — two
  patches to different columns both apply; two to the same column,
  the later wins. (Plain LWW dedup would drop the earlier patch's
  columns entirely — patches are folds, not last-writer-wins.)
* An explicit null set (column listed in ``fields`` with a null
  value) nulls the column; an unlisted column keeps the current
  row's value.
* Interleaved deletes: a delete resets the base row to absent —
  patches after it build on nothing (an insert-by-patch), patches
  before it die with the row. A key whose LAST event is a delete is
  deleted.
* Patches to keys not in the table create rows (unset columns null).

Per-batch cost: one sorted collect_list per key (one shuffle — the
same shuffle the dedup stage already pays), one bucket-pruned read of
the affected buckets joined on key (the same read COW merge pays),
then the standard merge. Resolution happens BEFORE validation in a
pipeline: rules judge the post-image, not the fragment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FIELDS_COL = "fields"


def apply_patches(
    table,
    events: DataFrame,
    mode: str = "cow",
    epochs: list[int] | None = None,
    validate=None,
) -> dict:
    """Fold a patch-event batch into ``table``.

    ``events`` columns: the table key, ``op`` (``upsert`` | ``delete``),
    ``commit_ts``, ``lsn``, every table data column (null-padded), and
    ``fields: array<string>`` naming the columns each upsert actually
    sets (ignored for deletes; a null ``fields`` on an upsert means a
    FULL image — all columns set, the plain-CDC degenerate case).

    ``validate``: optional callable ``DataFrame -> DataFrame`` applied
    to the RESOLVED post-image rows before the merge (rules must judge
    whole rows; a fragment can't satisfy ``n_tok == size(tokens)``).
    Returns the merge info dict plus ``rows_patched``/``rows_deleted``.
    """
    key = table.key
    data_cols = [f.name for f in table.schema.fields if f.name != key]
    all_set = F.array(*[F.lit(c) for c in data_cols])

    ev = events.withColumn(
        FIELDS_COL,
        F.when(F.col("op") == "delete", F.array().cast("array<string>"))
        .otherwise(F.coalesce(F.col(FIELDS_COL), all_set)),
    )
    # one struct per event, (commit_ts, lsn) leading so sort_array
    # orders the fold; per-key event lists are micro-batch sized
    p = F.struct(
        F.col("commit_ts"), F.col("lsn"), F.col("op"), F.col(FIELDS_COL),
        *[F.col(c) for c in data_cols],
    )
    composed = (
        ev.groupBy(key)
        .agg(F.sort_array(F.collect_list(p)).alias("_pl"))
        .withColumn(
            "_ix",
            F.expr("transform(_pl, (p, i) -> struct(i as i, p as p))"),
        )
        .withColumn(
            "_last_del",
            F.coalesce(
                F.expr(
                    "try_element_at(filter(_ix, x -> x.p.op = 'delete'), -1).i"
                ),
                F.lit(-1),
            ),
        )
        # the effective patch list: everything after the last delete
        .withColumn("_eff", F.expr("filter(_ix, x -> x.i > _last_del)"))
        .withColumn("_final_delete", (F.size("_eff") == 0) & (F.col("_last_del") >= 0))
        .withColumn("_had_delete", F.col("_last_del") >= 0)
    )

    # resolve against current rows, reading only the affected buckets
    nb = table.num_buckets
    touched = [
        r["_bucket"]
        for r in table._bucket_col(composed.select(key), key, nb)
        .select("_bucket")
        .distinct()
        .collect()
    ]
    old = table.read(buckets=touched).join(
        composed.select(key), key, "left_semi"
    )
    old = old.select(key, *[F.col(c).alias(f"_old_{c}") for c in data_cols])
    j = composed.join(old, key, "left")

    def resolved(c: str) -> F.Column:
        setters = F.expr(
            f"filter(_eff, x -> array_contains(x.p.{FIELDS_COL}, '{c}'))"
        )
        last_val = F.expr(
            f"try_element_at(filter(_eff, x -> array_contains(x.p.{FIELDS_COL}, '{c}')), -1).p.{c}"
        )
        base = F.when(F.col("_had_delete"), F.lit(None)).otherwise(
            F.col(f"_old_{c}")
        )
        return F.when(F.size(setters) > 0, last_val).otherwise(base).alias(c)

    j = j.localCheckpoint(eager=True)  # consumed twice (ups + dels)
    ups = j.filter(~F.col("_final_delete")).select(
        key, *[resolved(c) for c in data_cols]
    )
    if validate is not None:
        ups = validate(ups)
    dels = j.filter(F.col("_final_delete")).select(key)
    info = table.merge(
        ups,
        delete_keys=dels,
        mode=mode,
        epochs=epochs,
        affected_buckets=touched,
        affected_buckets_nb=nb,
    )
    return info
