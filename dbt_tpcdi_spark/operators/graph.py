"""Distributed connected components — the pairs→clusters step every
dedup pipeline needs (near-dup PAIRS are not actionable until they are
grouped into clusters with one canonical keeper per cluster).

The reference has no graph operator (its dedup surface stops at
GROUP BY fingerprints, ``silver/trades.sql``-style collapses); this is
part of the LLM-data-pipeline extension surface.

Algorithm: alternating Large-Star / Small-Star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
literature), which converges in O(log² n) rounds on any graph and
O(log n) in practice, versus O(diameter) for naive label propagation.
Each round is two shuffles (a groupBy-min and an equi-join) on the
edge list — no adjacency materialization beyond degree, no driver-side
data movement: the only driver actions are O(1)-row convergence
fingerprints, and each iteration is ``localCheckpoint``ed so the plan
stays flat instead of growing exponentially with rounds (on a real
cluster this would be ``checkpoint()`` to durable storage; the
eager-materialization semantics are identical).

Edge invariant maintained between phases: edges point from larger to
smaller node id (``src > dst``), self-loops dropped. At convergence
the edge set is a forest of stars rooted at each component's minimum
node id — exactly the (member, cluster_id) mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """(src > dst) direction, self-loops dropped, deduped."""
    src, dst = F.col("src"), F.col("dst")
    return (
        edges.select(
            F.greatest(src, dst).alias("src"), F.least(src, dst).alias("dst")
        )
        .where(src != dst)
        .distinct()
    )


def _symmetric(edges: DataFrame) -> DataFrame:
    """Both directions as (u, v): u's neighborhood view."""
    return edges.selectExpr("src AS u", "dst AS v").unionAll(
        edges.selectExpr("dst AS u", "src AS v")
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor LARGER than u to min(Γ(u) ∪ {u})."""
    sym = _symmetric(edges)
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(F.col("u"), F.col("mn"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), m.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor SMALLER than u (and u itself) to
    min(smaller neighbors ∪ {u}) — edges arrive (src > dst), so the
    smaller-neighbor view is the edge list itself."""
    mins = edges.groupBy("src").agg(F.min("dst").alias("mn"))
    out = (
        edges.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .unionAll(mins.select(F.col("src"), F.col("mn").alias("dst")))
    )
    return out.where(F.col("src") != F.col("dst")).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """Order-insensitive (count, hash-sum) of the edge set — an O(1)-row
    driver action used only for convergence detection."""
    row = edges.select(
        F.count("*").alias("n"),
        F.coalesce(
            # decimal accumulator: exact and overflow-free under ANSI
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).first()
    return int(row.n), int(row.h)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) for every node with at least one edge;
    ``component`` is the smallest node id in the connected component
    (deterministic labels — safe for cross-engine comparison).

    Isolated nodes don't appear (they have no edges); union the node
    universe afterwards if every node needs a label
    (``F.coalesce(component, node)``).
    """
    e = _canonical(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).localCheckpoint(eager=True)
    prev = _fingerprint(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _fingerprint(e)
        if cur == prev:
            # stable star forest: every edge is (member -> root)
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations (expected O(log^2 n))"
        )
    members = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return members.unionByName(roots)


def components_sql(
    pair_subquery: str, id_a: str = "id_a", id_b: str = "id_b"
) -> str:
    """DuckDB oracle twin: min-reachable-label via a recursive CTE over
    the same pair set. O(Σ component²) intermediate rows — fine at
    oracle scale, which is exactly why the distributed path exists."""
    return f"""
    WITH RECURSIVE pairs AS ({pair_subquery}),
    edges AS (
        SELECT {id_a} AS s, {id_b} AS d FROM pairs
        UNION
        SELECT {id_b} AS s, {id_a} AS d FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.node
    )
    SELECT node, min(lbl) AS component FROM reach GROUP BY node
    """
