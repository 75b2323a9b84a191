"""Connected components (operators/components.py): the candidate-pair
-> dedup-group fixpoint. Known-shape graphs + the policy rollup."""

import pytest

from dexspark.operators.components import connected_components, dedup_groups


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["v"]: r["component"] for r in connected_components(df).collect()
    }


def test_two_cliques_and_a_chain(spark):
    comp = _cc(
        spark,
        [
            (1, 2), (2, 3), (1, 3),          # clique {1,2,3}
            (10, 11),                        # pair {10,11}
            (20, 21), (21, 22), (22, 23),    # chain {20..23}
        ],
    )
    assert comp == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20,
    }


def test_long_path_converges(spark):
    # a 12-node path needs multiple label-propagation rounds; the min
    # label must still flood to the far end
    comp = _cc(spark, [(i, i + 1) for i in range(5, 17)])
    assert set(comp.values()) == {5}
    assert len(comp) == 13


def test_direction_irrelevant(spark):
    # edges are symmetrized internally: (big -> small) works too
    comp = _cc(spark, [(9, 3), (3, 7)])
    assert comp == {3: 3, 7: 3, 9: 3}


def test_max_iter_guard(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "src long, dst long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_iter=2)


def test_dedup_groups_rollup(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "da long, db long"
    )
    groups = {
        r["component"]: r.asDict() for r in dedup_groups(pairs).collect()
    }
    assert groups[1]["n_members"] == 3 and groups[1]["representative"] == 1
    assert groups[10]["n_members"] == 2 and groups[10]["representative"] == 10


def test_components_match_union_find_on_random_graphs(spark):
    """Property check: the distributed min-label fixpoint equals a
    pure-Python union-find (with min-element canonical labels) on
    seeded random graphs of varying shape/density."""
    import random

    def union_find_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical label = min member of the set
        return {v: find(v) for v in parent}

    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(5, 60)
        m = rng.randint(1, 2 * n)
        edges = [
            (rng.randint(0, n), rng.randint(0, n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        # union-by-min-root makes every final root the set minimum,
        # matching the min-label fixpoint's canonical labels
        want = union_find_components(edges)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["v"]: r["component"]
            for r in connected_components(df, max_iter=80).collect()
        }
        assert got == want, (trial, edges)
