"""Semantic deduplication over embeddings (SemDeDup, Abbas et al. 2023).

The embedding-space complement of the token-level dedup family:
k-means-cluster the corpus embeddings, then inside each cluster mark
as duplicates every vector whose cosine similarity to a
higher-priority cluster member exceeds ``tau``. This is exactly the
released SemDeDup procedure — per cluster they take the upper
triangle of the pairwise similarity matrix in a chosen keep order and
drop row ``x`` when ``max_{y before x} cos(x, y) > tau`` — re-expressed
as joins so no cluster's matrix is ever materialized.

Keep orders (the paper evaluates both):
- ``"min_id"``  — keep the earliest vector by id (deterministic,
  replay-stable under re-ingest; the engine default).
- ``"far"``     — keep LOW-similarity-to-centroid examples first (the
  paper's choice: duplicates near the centroid are the redundant
  ones; ties broken by id).

Scale shape:
- cluster assignment is a broadcast-centroid argmax, never a shuffle
  of the corpus. Default path: ONE numpy matmul per Arrow batch
  against the collected centroid matrix (mapInArrow — the assignment
  IS a (batch x dim) @ (dim x cells) product, and BLAS beats an
  expression-tree fold ~20x; measured in bench.py). A pure-JVM
  norm-staged fold path is kept for bit-reproducible verification;
- vector norms are staged ONCE and reused by assignment, rank and
  pair scoring — one fold per candidate pair, not three;
- candidate pairs come from a CELL-EQUALITY self-join (co-partitioned
  on the cell key), so candidate volume is sum of cell^2, not N^2;
- ``cell_cap`` bounds the quadratic term per cell: oversized cells are
  excluded from pair generation and their members all kept —
  recall degrades gracefully instead of a skewed cell going O(N^2)
  (same guard as the sign-LSH buckets and the IVF posting lists);
- the dropped-id set is ONE distinct aggregation; survivors come back
  via a left-anti join on the id.

With Lloyd-refined centroids (``refine_iters > 0``) this is the full
SemDeDup; with seed centroids it is the deterministic variant the
bench/query surface uses. Reference anchor: duplicate-header rule +
LWW dedup (SURVEY V5/A5) — the same keep-one-representative contract
lifted to semantic space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .ann import _dot, centroids, refine_centroids

#: Cells larger than this never generate candidate pairs (quadratic
#: guard; members are kept). Mirrors ann._ANN_BUCKET_CAP semantics.
DEFAULT_CELL_CAP = 4096


def _norm(e: F.Column) -> F.Column:
    return F.sqrt(_dot(e, e))


def assign_cells(
    embeddings: DataFrame,
    cts: DataFrame,
    id_col: str = "vec_id",
    method: str = "arrow",
) -> DataFrame:
    """(id, embedding, _norm, cell): each vector's nearest centroid by
    cosine (argmax over the broadcast centroid set, ties to the
    lowest cell id). The vector's norm rides along so downstream pair
    scoring never recomputes it.

    ``method="arrow"`` (default) runs the argmax as ONE numpy matmul
    per Arrow batch against the collected centroid matrix — the
    assignment is literally (batch x dim) @ (dim x cells), which BLAS
    does ~20x faster than an expression-tree fold; no shuffle, no
    per-row Python (mapInArrow, the engine's vectorized-UDF rule).
    ``method="hof"`` keeps the pure-JVM expression path (one
    norm-reusing fold per (vector, centroid) — bit-reproducible
    against a sequential-fold oracle, and the form the SQL-pinned ANN
    queries use). Both orders ties identically; results differ only
    if two centroids tie within float rounding."""
    staged = embeddings.select(
        id_col, "embedding", _norm(F.col("embedding")).alias("_norm")
    )
    if method == "arrow":
        rows = sorted(
            ((r["cell"], list(r["centroid"])) for r in cts.collect()),
            key=lambda t: t[0],
        )
        if not rows:
            raise ValueError("empty centroid set")
        import numpy as np

        cells = [c for c, _ in rows]
        cmat = np.array([v for _, v in rows], dtype=np.float64)
        cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
        cell_t = cts.schema["cell"].dataType.simpleString()

        def _assign(batches):
            import pyarrow as pa

            for b in batches:
                if b.num_rows == 0:
                    continue
                e = np.stack(
                    b.column("embedding").to_numpy(zero_copy_only=False)
                ).astype(np.float64)
                norms = b.column("_norm").to_numpy(zero_copy_only=False)
                sims = (e @ cmat.T) / norms[:, None]
                # argmax takes the FIRST max -> lowest cell id on ties
                # (cells sorted ascending above)
                best = sims.argmax(axis=1)
                yield pa.RecordBatch.from_arrays(
                    [
                        b.column(0),
                        b.column("embedding"),
                        b.column("_norm"),
                        pa.array([cells[i] for i in best]),
                    ],
                    names=[id_col, "embedding", "_norm", "cell"],
                )

        schema = (
            f"{id_col} {staged.schema[id_col].dataType.simpleString()}, "
            f"embedding {staged.schema['embedding'].dataType.simpleString()}, "
            f"_norm double, cell {cell_t}"
        )
        return staged.mapInArrow(_assign, schema)
    if method != "hof":
        raise ValueError(f"method must be 'arrow' or 'hof', got {method!r}")
    ctsn = cts.select(
        "cell", "centroid", _norm(F.col("centroid")).alias("_cnorm")
    )
    scored = staged.crossJoin(F.broadcast(ctsn)).select(
        id_col,
        "embedding",
        "_norm",
        "cell",
        (
            _dot(F.col("embedding"), F.col("centroid"))
            / (F.col("_norm") * F.col("_cnorm"))
        ).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_sim").desc(), F.col("cell"))
    return (
        scored.withColumn("_pr", F.row_number().over(w))
        .filter(F.col("_pr") <= 1)
        .select(id_col, "embedding", "_norm", "cell")
    )


def semdedup(
    embeddings: DataFrame,
    n_cells: int = 8,
    tau: float = 0.7,
    keep: str = "min_id",
    refine_iters: int = 0,
    cell_cap: int = DEFAULT_CELL_CAP,
    id_col: str = "vec_id",
    cts: DataFrame | None = None,
    method: str = "arrow",
) -> DataFrame:
    """(id, cell, keep) — every input vector flagged keep/drop.

    ``cts`` overrides the centroid set (e.g. one maintained
    incrementally); otherwise deterministic seed centroids, optionally
    Lloyd-refined ``refine_iters`` rounds. ``method`` picks the
    assignment path (see :func:`assign_cells`).
    """
    if keep not in ("min_id", "far"):
        raise ValueError(f"keep must be 'min_id' or 'far', got {keep!r}")
    if cts is None:
        cts = centroids(embeddings, n_cells)
        if refine_iters > 0:
            cts = refine_centroids(embeddings, cts, refine_iters)

    assigned = assign_cells(embeddings, cts, id_col, method=method)
    if keep == "far":
        # priority = ascending similarity to own centroid (outliers
        # kept first), ties by id — rank within the cell so the pair
        # predicate is a plain column comparison.
        ctsn = cts.select(
            "cell", "centroid", _norm(F.col("centroid")).alias("_cnorm")
        )
        sim = assigned.join(F.broadcast(ctsn), "cell").select(
            id_col,
            "cell",
            "embedding",
            "_norm",
            (
                _dot(F.col("embedding"), F.col("centroid"))
                / (F.col("_norm") * F.col("_cnorm"))
            ).alias("_csim"),
        )
        w = Window.partitionBy("cell").orderBy("_csim", id_col)
        ranked = sim.withColumn("_rk", F.row_number().over(w)).drop("_csim")
    else:
        ranked = assigned.withColumn("_rk", F.col(id_col))
    ranked = ranked.localCheckpoint(eager=False)

    small = (
        ranked.groupBy("cell")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= cell_cap)
        .select("cell")
    )
    cand = ranked.join(F.broadcast(small), "cell")
    a, b = cand.alias("a"), cand.alias("b")
    # staged norms: ONE fold per candidate pair (dot), not three
    dropped = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a._rk") < F.col("b._rk")),
        )
        .filter(
            _dot(F.col("a.embedding"), F.col("b.embedding"))
            / (F.col("a._norm") * F.col("b._norm"))
            >= tau
        )
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    return (
        ranked.join(dropped.withColumn("_dup", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cell",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


def semdedup_against(
    corpus: DataFrame,
    reference: DataFrame,
    n_cells: int = 8,
    tau: float = 0.7,
    cell_cap: int = DEFAULT_CELL_CAP,
    id_col: str = "vec_id",
    cts: DataFrame | None = None,
    method: str = "arrow",
) -> DataFrame:
    """Semantic decontamination: corpus rows whose embedding is within
    ``tau`` cosine of ANY reference (eval-set) embedding are dropped;
    survivors return with all their columns.

    The cross-corpus form of the SemDeDup candidate structure — both
    sides are assigned to the same centroid cells, so the probe join
    is cell-equality (each corpus vector is compared only against the
    reference vectors landing in its cell, the IVF posting-list
    shape), never corpus x reference. ``cell_cap`` bounds the
    per-cell reference fan-out: oversized REFERENCE cells are skipped
    (their corpus vectors are kept — the gate degrades open, matching
    the candidate-cap convention). Centroids default to seeds from
    the REFERENCE side (tiny, stable: the eval set defines the
    geometry; re-running with a grown corpus never moves cells).
    """
    if cts is None:
        # the n_cells smallest reference ids (NOT ann.centroids' id <
        # n_cells predicate — reference ids are arbitrary, and may be
        # strings); sort+limit over the tiny eval set is free
        cts = (
            reference.orderBy(id_col)
            .limit(n_cells)
            .select(
                F.col(id_col).alias("cell"),
                F.col("embedding").alias("centroid"),
            )
        )
    c = assign_cells(corpus, cts, id_col, method=method)
    r = assign_cells(reference, cts, id_col, method=method)
    small = (
        r.groupBy("cell")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= cell_cap)
        .select("cell")
    )
    r = r.join(F.broadcast(small), "cell")
    contaminated = (
        c.alias("a")
        .join(r.alias("b"), "cell")
        .filter(
            _dot(F.col("a.embedding"), F.col("b.embedding"))
            / (F.col("a._norm") * F.col("b._norm"))
            >= tau
        )
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


def semdedup_keep(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    **kwargs,
) -> DataFrame:
    """Survivor rows of ``embeddings`` with all their columns — the
    gate form (left-anti join on the dropped ids)."""
    flags = semdedup(embeddings, id_col=id_col, **kwargs)
    drop_ids = flags.filter(~F.col("keep")).select(id_col)
    return embeddings.join(drop_ids, id_col, "left_anti")
