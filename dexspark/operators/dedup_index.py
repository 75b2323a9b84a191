"""CDC-maintained near-duplicate index (MinHash signatures + LSH bands).

The continuous-ingest dedup problem: every incoming micro-batch must
be checked for near-duplicates against the ENTIRE corpus ingested so
far — without recomputing corpus signatures per batch and without an
all-pairs join. Classic batch MinHash/LSH (the ``dedup_minhash_lsh``
query) recomputes everything per run; at 100 TB with a streaming tail
that is not viable. This module persists the signatures as a
LakeTable and maintains them FROM THE TABLE'S OWN CHANGELOG
(``LakeTable.changes()``), the same consumer shape as the
CDC-maintained ANN index (operators/ann.py:194) and the north-star's
"index builders tail the lake":

- ``sync_dedup_index``: fold a changelog window into the index —
  signatures are computed for CHANGED docs only (O(change) work),
  deletes become tombstones, the merge is MOR (append-sized commits);
- ``near_dup_candidates``: check an incoming batch against the index —
  batch signatures are tiny and BROADCAST, the corpus index is
  scanned map-only (band explode is a projection), so the corpus is
  NEVER shuffled; candidates are (batch doc, corpus doc) pairs
  sharing >= 1 LSH band;
- ``gate_batch``: the ingest gate — split a batch into novel docs and
  near-dup rejects, one call.

Signature scheme: identical to the oracle-verified batch query
(dexspark/queries.py ``dedup_minhash_lsh`` imports THIS module), so
the persisted index provably agrees with the batch pipeline: 8
minhashes sliced from two seeded md5s over word 4-gram shingles, 4
bands x 2 rows.

Reference anchor: the reference's existence/dup checks gate ingest
per event (FnDecompressor.kt:98-101); this is the corpus-level
analogue for the training-data domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MINHASH_K = 8
MINHASH_BANDS = 4
_ROWS_PER_BAND = MINHASH_K // MINHASH_BANDS
SHINGLE_N = 4


def minhash_signatures(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    keep_short: bool = True,
) -> DataFrame:
    """(id_col, h0..h7) — one row per doc, the sliced 2-md5 scheme.

    Shingles are word ``SHINGLE_N``-grams kept WITH duplicates
    (min() is duplicate-insensitive, so the distinct shuffle is pure
    waste — map-side partial aggregation collapses them for free).
    With ``keep_short`` (the index-maintenance default), docs shorter
    than the shingle width still get a signature row (NULL hashes) so
    the index keeps a row per live doc — costs one anti-join; batch
    pipelines that only consume band buckets pass False and skip it.
    """
    from .decontaminate import ngrams

    sh = ngrams(docs, n=SHINGLE_N, text=text, id_col=id_col).withColumnRenamed(
        "gram", "shingle"
    )
    # two seeded md5s projected BEFORE the aggregate: each computed
    # once per shingle row; the 8 min-aggs slice cheap substrings
    proj = sh.select(
        id_col,
        F.md5(F.concat(F.lit("0"), F.col("shingle")).cast("binary")).alias("_m0"),
        F.md5(F.concat(F.lit("1"), F.col("shingle")).cast("binary")).alias("_m1"),
    )
    sig = proj.groupBy(id_col).agg(
        *[
            F.min(
                F.substring(F.col(f"_m{k // 4}"), 1 + 8 * (k % 4), 8)
            ).alias(f"h{k}")
            for k in range(MINHASH_K)
        ]
    )
    if not keep_short:
        return sig
    # short docs (< SHINGLE_N words) produce no shingles -> re-attach
    # with NULL hashes so every live doc has an index row
    short = docs.select(id_col).join(sig.select(id_col), id_col, "left_anti")
    return sig.unionByName(
        short.select(
            id_col,
            *[F.lit(None).cast("string").alias(f"h{k}") for k in range(MINHASH_K)],
        )
    )


def band_keys(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id_col, band, key) — LSH band buckets, a map-only explode.

    NULL-signature rows (short docs) emit no bands: they can only be
    exact dups, which the engine's exact dedup already catches.
    """
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(
                    *[F.col(f"h{b * _ROWS_PER_BAND + r}") for r in range(_ROWS_PER_BAND)]
                ).alias("key"),
            )
            for b in range(MINHASH_BANDS)
        ]
    )
    return (
        sig.select(id_col, F.explode(entries).alias("_e"))
        .select(id_col, F.col("_e.band").alias("band"), F.col("_e.key").alias("key"))
        .filter(F.col("key").isNotNull())
    )


def index_schema(id_type=None):
    """Persisted index row: doc key + the 8 signature hashes."""
    from pyspark.sql import types as T

    fields = [T.StructField("doc_id", id_type or T.LongType(), False)]
    fields += [
        T.StructField(f"h{k}", T.StringType(), True) for k in range(MINHASH_K)
    ]
    return T.StructType(fields)


def sync_dedup_index(
    index_table, changes: DataFrame, text: str = "text", epochs=None
) -> dict:
    """Fold a source-changelog window into the signature index.

    ``changes``: (doc_id, <text>, _change_type, _commit_version) — the
    LakeTable.changes() surface. Commits collapse to the latest per
    key first (upsert@v7 + delete@v9 must index as deleted).
    Signatures are computed over the CHANGED docs only; the merge is
    MOR so the commit is change-sized. Nothing about the existing
    index is read or shuffled.
    """
    latest = (
        changes.groupBy("doc_id")
        .agg(
            F.max_by(
                F.struct(text, "_change_type"), F.col("_commit_version")
            ).alias("_c")
        )
        .select(
            "doc_id",
            F.col(f"_c.{text}").alias(text),
            F.col("_c._change_type").alias("_change_type"),
        )
    )
    ups = minhash_signatures(
        latest.filter(F.col("_change_type") != "delete").select("doc_id", text)
    )
    dels = latest.filter(F.col("_change_type") == "delete").select("doc_id")
    return index_table.merge(ups, delete_keys=dels, mode="mor", epochs=epochs)


def sync_dedup_index_from_table(source, index_table, text: str = "text") -> dict:
    """Exactly-once incremental maintenance, cursor included.

    Source versions ride the index table's own epoch markers (one
    atomic manifest publish for data + cursor — the construction
    shared with binlog epochs and ann.sync_index_from_table), so a
    crash either committed the window with its markers or nothing;
    re-running is a no-op or a clean resume.
    """
    watermark, _tail = index_table.epoch_state()
    synced = max(watermark, 0)
    cur = source.current_version()
    if cur <= synced:
        return {"synced_through": synced, "applied": False}
    info = sync_dedup_index(
        index_table,
        source.changes(synced, cur),
        text=text,
        epochs=list(range(synced + 1, cur + 1)),
    )
    return {"synced_through": cur, "applied": True, **info}


def near_dup_candidates(
    index_table, batch: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(batch_doc_id, corpus_doc_id, n_shared_bands) candidate pairs.

    The batch side (a micro-batch, tiny vs the corpus) is signed and
    BROADCAST; the index side is one map-only scan (signature read +
    band explode fused into the probe of the broadcast hash join) on
    a compacted index — a MOR tail adds only the bounded per-bucket
    reconstruction. The corpus is never shuffled on its band keys and
    never re-signed. Docs present in BOTH sides under the same id (an
    update re-checking itself) are excluded.

    keep_short=False on the batch: band_keys drops NULL-key rows
    anyway, so the short-doc re-attach anti-join would add two
    exchanges for rows the join can never see.
    """
    batch_bands = band_keys(
        minhash_signatures(batch, text, id_col, keep_short=False)
    ).withColumnsRenamed({"doc_id": "batch_doc_id"})
    idx_bands = band_keys(index_table.read()).withColumnsRenamed(
        {"doc_id": "corpus_doc_id"}
    )
    return (
        idx_bands.join(F.broadcast(batch_bands), ["band", "key"])
        .filter(F.col("corpus_doc_id") != F.col("batch_doc_id"))
        .groupBy("batch_doc_id", "corpus_doc_id")
        # each doc carries exactly ONE key per band, so a (batch,
        # corpus, band) row is unique by construction: plain count()
        # == count_distinct(band) at one exchange instead of two
        .agg(F.count("band").alias("n_shared_bands"))
    )


def gate_batch(
    index_table,
    batch: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_shared_bands: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """(novel_docs, dup_pairs): the continuous-ingest dedup gate.

    Docs whose signature shares >= ``min_shared_bands`` LSH bands with
    any indexed doc are rejected as near-duplicates; the rest pass.
    The reject side keeps the matched corpus doc for lineage (which
    existing doc shadowed this one — the quarantine-provenance
    contract, SURVEY V17).
    """
    pairs = near_dup_candidates(index_table, batch, text, id_col).filter(
        F.col("n_shared_bands") >= min_shared_bands
    )
    dup_ids = pairs.select(F.col("batch_doc_id").alias(id_col)).distinct()
    novel = batch.join(F.broadcast(dup_ids), id_col, "left_anti")
    return novel, pairs
