"""IVF (inverted-file) approximate nearest neighbor over embeddings.

The scale path the LSH sign-bucket query approximates from the other
direction: vectors are assigned to coarse cells (nearest centroid),
and a query searches only its ``nprobe`` closest cells instead of the
full collection — candidate volume ~ N * nprobe / n_cells.

Spark-first shape: the centroid set is tiny and BROADCAST to the
assignment join (no shuffle of the big side for indexing); the index
is repartitioned by cell so a cell's posting list is co-located;
search broadcasts the (query x probed-cell) frame against the index
and takes a per-query top-k window. Everything is built-in DataFrame
ops — no Python in the path.

Centroids here are deterministic (the first ``n_cells`` vectors by
id) so tests are stable; a k-means refinement loop would slot in
between ``centroids`` and ``build_index`` without changing any
downstream shape (each iteration = one broadcast-join assignment +
one mean-aggregate per cell).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(x: F.Column, y: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(x, y, lambda u, v: u.cast("double") * v.cast("double")),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _cosine(a: F.Column, b: F.Column) -> F.Column:
    return _dot(a, b) / F.sqrt(_dot(a, a)) / F.sqrt(_dot(b, b))


def centroids(embeddings: DataFrame, n_cells: int) -> DataFrame:
    """Deterministic coarse centroids: the first ``n_cells`` vectors
    by id (k-means stand-in — see module docstring)."""
    return embeddings.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid")
    )


def _nearest_cells(
    frame: DataFrame, cts: DataFrame, id_col: str, top: int
) -> DataFrame:
    """(id, embedding) x broadcast(centroids) -> the ``top`` nearest
    cells per id: (id, embedding, cell)."""
    scored = frame.crossJoin(F.broadcast(cts)).select(
        F.col(id_col),
        "embedding",
        "cell",
        _cosine(F.col("embedding"), F.col("centroid")).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_sim").desc(), F.col("cell"))
    return (
        scored.withColumn("_pr", F.row_number().over(w))
        .filter(F.col("_pr") <= top)
        .select(id_col, "embedding", "cell")
    )


def refine_centroids(
    embeddings: DataFrame, cts: DataFrame, iterations: int = 2
) -> DataFrame:
    """Lloyd's k-means refinement of the coarse centroids.

    Each iteration is one broadcast-join assignment plus one
    per-cell mean aggregate — the canonical iterative-algorithm shape
    on Spark (no driver-side vectors beyond the tiny centroid set,
    which is collected/broadcast each round by construction of the
    assignment join). Empty cells keep their previous centroid.
    Deterministic given deterministic inputs."""
    for _ in range(iterations):
        assigned = _nearest_cells(
            embeddings.select("vec_id", "embedding"), cts, "vec_id", top=1
        )
        means = (
            assigned.select(
                "cell", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("_pm")
            )
            .select(
                "cell",
                F.transform(F.col("_pm"), lambda s: s["m"].cast("float")).alias(
                    "new_centroid"
                ),
            )
        )
        cts = (
            cts.join(means, "cell", "left")
            .select(
                "cell",
                F.coalesce(F.col("new_centroid"), F.col("centroid")).alias("centroid"),
            )
            .localCheckpoint(eager=True)  # truncate the iterative lineage
        )
    return cts


def build_index(
    embeddings: DataFrame, n_cells: int = 16, cts: DataFrame | None = None
) -> DataFrame:
    """Assign every vector to its nearest centroid; posting lists
    co-located per cell: (vec_id, embedding, cell). Pass refined
    centroids via ``cts`` (and the SAME frame to ``search``)."""
    cts = cts if cts is not None else centroids(embeddings, n_cells)
    assigned = _nearest_cells(
        embeddings.select("vec_id", "embedding"), cts, "vec_id", top=1
    )
    return assigned.repartition("cell")


def search(
    index: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    n_cells: int = 16,
    cts: DataFrame | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Top-k cosine neighbors per query, probing the ``nprobe``
    nearest cells. ``queries``: (vec_id, embedding). Pass the same
    ``cts`` the index was built with when using refined centroids.
    With ``nprobe == n_cells`` the result is exactly brute force
    (tested)."""
    if cts is None:
        cts = index.filter(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid")
        )
    probes = _nearest_cells(
        queries.select(F.col("vec_id").alias("query_id"), "embedding"),
        cts,
        "query_id",
        top=nprobe,
    ).select("query_id", F.col("embedding").alias("q_embedding"), "cell")
    # NO forced broadcast of the probe side: it carries one row per
    # (query, probed cell) WITH the full embedding vector — a 5M-query
    # batch at 768 dims is tens of GB, far past any broadcast budget.
    # The index is already repartitioned by cell, so the join shuffles
    # only the probe side on the cell key; AQE still auto-broadcasts
    # when the query batch is genuinely small (its planner threshold,
    # not a hint that overrides it).
    scored = (
        probes.alias("p")
        .join(index.alias("i"), F.col("p.cell") == F.col("i.cell"))
        .filter(F.col("p.query_id") != F.col("i.vec_id"))
        .select(
            F.col("p.query_id").alias("query_id"),
            F.col("i.vec_id").alias("neighbor_id"),
            _cosine(F.col("p.q_embedding"), F.col("i.embedding")).alias("_cos"),
        )
        # no dedup needed: each index vector lives in exactly one cell,
        # so (query, neighbor) pairs are unique by construction
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", round_to).alias("cos_sim"), "rk")
    )


# ------------------------------------------- CDC-maintained index

def index_schema(id_type=None):
    """Schema of a persisted IVF index table: one row per indexed
    vector with its assigned coarse cell. ``id_type``: the source
    table's key DataType (default bigint)."""
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("vec_id", id_type or T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("cell", T.IntegerType(), True),
        ]
    )


def sync_index(
    index_table, changes: DataFrame, cts: DataFrame, epochs=None
) -> dict:
    """Apply a table changelog to a PERSISTED IVF index — the
    north-star's downstream consumer ("index builders ... tail the
    lake instead of re-reading snapshots") made concrete: the source
    lake emits ``LakeTable.changes(from_v)`` (O(change) for MOR
    commits) and this folds it into an index LakeTable, so the
    embedding index stays fresh without ever re-assigning the other
    ~100% of vectors.

    ``changes``: rows of (vec_id, embedding, _change_type,
    _commit_version) — exactly the changelog surface. Multiple commits
    per key collapse to the latest by ``_commit_version`` first (a
    key upserted in v7 and deleted in v9 must index as deleted).
    Upserts are assigned to their nearest centroid through the same
    broadcast join as ``build_index`` — O(change x n_cells) work, no
    shuffle of the existing index — and applied as a MERGE (MOR: the
    delta is appended, compaction amortizes). Deletes become key
    tombstones.

    The index table is keyed on ``vec_id`` (point updates); cell
    co-location for search's join is restored by the search-side
    ``repartition("cell")`` — one shuffle per QUERY BATCH, amortized
    over all its queries, instead of one full re-bucket per refresh.

    Returns the merge info dict. Cite: reference replays its event
    containers to downstream processors (SURVEY S7); Iceberg's
    incremental scan feeds the same pattern."""
    latest = (
        changes.groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("embedding", "_change_type"), F.col("_commit_version")
            ).alias("_c")
        )
        .select("vec_id", F.col("_c.embedding").alias("embedding"),
                F.col("_c._change_type").alias("_change_type"))
    )
    ups = _nearest_cells(
        latest.filter(F.col("_change_type") != "delete").select(
            "vec_id", "embedding"
        ),
        cts,
        "vec_id",
        top=1,
    ).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        F.col("cell").cast("int").alias("cell"),
    )
    dels = latest.filter(F.col("_change_type") == "delete").select("vec_id")
    return index_table.merge(ups, delete_keys=dels, mode="mor", epochs=epochs)


def sync_index_from_table(source, index_table, cts: DataFrame) -> dict:
    """Exactly-once incremental index maintenance, cursor included.

    The consumer offset ("which source version have I indexed
    through?") is NOT a separate checkpoint file: source versions are
    recorded as the index table's own EPOCH MARKERS, so the data merge
    and the cursor advance are one atomic manifest publish — the same
    exactly-once construction the ingest engine uses for binlog
    epochs, reused wholesale. A crash at any point either committed
    the merge WITH its markers or committed nothing; re-running is a
    no-op (``cur <= synced``) or a clean resume. The marker set stays
    O(1) in the manifest via the standard watermark compaction."""
    watermark, _tail = index_table.epoch_state()
    synced = max(watermark, 0)
    cur = source.current_version()
    if cur <= synced:
        return {"synced_through": synced, "applied": False}
    info = sync_index(
        index_table,
        source.changes(synced, cur),
        cts,
        epochs=list(range(synced + 1, cur + 1)),
    )
    return {"synced_through": cur, "applied": True, **info}


def read_index(index_table) -> DataFrame:
    """The persisted index as the frame ``search`` expects, cell-
    co-located (one shuffle per read, amortized over the query batch)."""
    return index_table.read().repartition("cell")
