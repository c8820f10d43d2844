"""Connected components (large-star/small-star) vs a union-find reference."""

import numpy as np

from gstools_core_spark.operators.graph import connected_components


def _union_find(edges):
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
    return {x: find(x) for x in parent}


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "a_id long, b_id long"
    )


def _check(spark, edges):
    got = {
        r["node"]: r["component"]
        for r in connected_components(_edges_df(spark, edges)).collect()
    }
    want = _union_find(edges)
    assert got == want


def test_components_random_graphs(spark):
    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        # sparse non-contiguous ids: realistic doc-id space
        ids = rng.choice(10_000_000, size=120, replace=False)
        edges = [
            (ids[i], ids[j])
            for i, j in rng.integers(0, len(ids), size=(150, 2))
            if i != j
        ]
        _check(spark, edges)


def test_components_long_chain(spark):
    """A length-100 path: the case where naive min-label propagation needs
    100 rounds; star-contraction must resolve it within the round budget."""
    edges = [(i, i + 1) for i in range(100)]
    got = {
        r["node"]: r["component"]
        for r in connected_components(_edges_df(spark, edges)).collect()
    }
    assert set(got) == set(range(101))
    assert set(got.values()) == {0}


def test_components_string_ids(spark):
    """Ids only need to be ORDERABLE — url-keyed dedup graphs are strings.
    (Regression: a long cast broke minhash_dedup(transitive=True) for
    non-numeric id columns.)"""
    edges = [("u/b", "u/a"), ("u/b", "u/c"), ("u/x", "u/y")]
    df = spark.createDataFrame(edges, "a_id string, b_id string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {
        "u/a": "u/a",
        "u/b": "u/a",
        "u/c": "u/a",
        "u/x": "u/x",
        "u/y": "u/x",
    }


def test_components_two_cliques_and_bridge(spark):
    cl1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    cl2 = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    _check(spark, cl1 + cl2)  # two components
    _check(spark, cl1 + cl2 + [(4, 10)])  # bridged: one component
