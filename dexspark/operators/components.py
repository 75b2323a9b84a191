"""Connected components over candidate-pair graphs — dedup clustering.

The missing last step of every near-dup pipeline: MinHash/LSH (or
n-gram Jaccard, or embedding buckets) emits candidate PAIRS; the
dedup decision needs GROUPS (keep one representative per component of
the similarity graph). At 100 TB the pair graph has billions of
edges, so the grouping must itself be a distributed fixpoint, not a
driver-side union-find.

Spark-first shape: iterative minimum-label propagation. Each round a
vertex adopts the smallest label among itself and its neighbors —
one join + one aggregate per round, lineage truncated per iteration
with ``localCheckpoint`` (the same iterative-algorithm pattern as the
IVF k-means refinement, operators/ann.py). Converges in O(diameter)
rounds; near-dup similarity graphs are unions of small cliques, so
2-3 rounds in practice. (GraphFrames' production CC uses the
large-star/small-star variant of exactly this loop for skewed
graphs.) The driver-side per-round work is ONE count (the
convergence check) — no vertex data ever leaves the executors.

Reference parity note: the reference has no grouping operator — its
dedup analogue is recency-based conflict resolution (XLSX sheet
V2020-07-30, order 12). This operator serves the LLM-pipeline
extension mandate (SURVEY.md §2 "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(src, dst) edge frame -> (v, component) with component = the
    minimum vertex id reachable from v. Isolated vertices (absent
    from ``edges``) are the caller's to add if wanted.

    Raises RuntimeError if ``max_iter`` rounds don't converge (a
    path-graph worst case needs O(diameter) rounds; similarity
    graphs converge in a handful)."""
    # checkpoint the symmetrized edge frame ONCE: every round joins
    # against it, and without this the upstream pair-producing
    # pipeline (e.g. the full shingle->minhash->band->pair chain) is
    # re-executed per round per consumer — measured 22 s -> ~6 s for
    # the sf0.1 minhash clustering query
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["v"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["v"] == nbr_min["a"], "left")
            .select(
                "v",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.v") == F.col("o.v"))
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("v", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def dedup_groups(
    pairs: DataFrame, left: str = "da", right: str = "db"
) -> DataFrame:
    """Candidate pairs -> per-group rollup: (component, n_members,
    representative) with representative = the minimum member id (the
    standard keep-first dedup policy)."""
    comp = connected_components(pairs, src=left, dst=right)
    return comp.groupBy("component").agg(
        F.count("*").alias("n_members"),
        F.min("v").alias("representative"),
    )
