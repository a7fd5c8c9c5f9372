"""connected_components (operators/graph.py): correctness vs a pure
union-find oracle, convergence on adversarial shapes (long paths are
the worst case for star-contraction), and determinism of labels."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dbt_tpcdi_spark.operators.graph import connected_components


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

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
    # normalize: every node -> min of its component
    return {n: find(n) for n in parent}


def _spark_components(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = connected_components(df)
    return {r.node: r.component for r in out.collect()}


def test_two_components_and_clique(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11)]
    got = _spark_components(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_path_worst_case(spark):
    # a 64-node path sorted against the contraction direction
    edges = [(i, i + 1) for i in range(64)]
    got = _spark_components(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2)]
    got = _spark_components(spark, edges)
    assert got == {1: 1, 2: 1}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(0, 400, 3))  # sparse ids — labels aren't ordinals
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(300)
    ]
    expected = _uf_components([(a, b) for a, b in edges if a != b])
    got = _spark_components(spark, edges)
    assert got == expected


def test_labels_partitioning_invariant(spark):
    edges = [(i, i + 2) for i in range(0, 100, 2)] + [(7, 93), (2, 51)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    one = {
        (r.node, r.component)
        for r in connected_components(df.coalesce(1)).collect()
    }
    many = {
        (r.node, r.component)
        for r in connected_components(df.repartition(13)).collect()
    }
    assert one == many
