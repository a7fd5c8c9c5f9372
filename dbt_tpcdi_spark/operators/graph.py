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


# ---------------------------------------------------------------------------
# PageRank (quantized-integer, fixed iterations)

PR_SCALE = 1_000_000  # rank unit: 1.0 == 10^6
#: damping 0.85 as the exact rational 17/20 — multiplications stay in
#: integer arithmetic so iteration results are bit-identical on any
#: engine or partitioning (floating-point damping would accumulate
#: summation-order drift across engines).
PR_D_NUM, PR_D_DEN = 17, 20


def pagerank_quantized(
    edges: DataFrame, iters: int = 3, conserve_dangling: bool = False
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (``src``,
    ``dst``), all math in scaled integers:

        r'(v) = (3·SCALE) div 20  +  (17 · Σ_{u→v} (r(u) div out(u))) div 20

    Per iteration: one equi-join of ranks onto the (pre-degreed) edge
    list + one map-side-combined sum by dst — the exact shape MLlib's
    PageRank lowers to, with no driver-side data movement at all.
    Integer contributions make the sum order-independent, so the
    result is deterministic under AQE re-partitioning and matches the
    DuckDB twin (``pagerank_sql``) bit-for-bit. Fixed ``iters`` keeps
    the computation SQL-unrollable.

    Dangling nodes (no outgoing edges): by default their mass
    evaporates — the standard simplification when ranks are compared,
    not summed. With ``conserve_dangling=True`` each iteration adds
    one scalar aggregation (Σ rank over sink nodes, a 1-row broadcast
    kept IN the plan — no extra driver round-trip) and every node
    receives ``dmass div n`` extra inflow before damping:

        r'(v) = teleport + (17 · (inflow(v) + dmass div n)) div 20

    which keeps total mass ≈ n·SCALE (up to integer-floor loss) — the
    textbook stochastic-matrix completion, still bit-exact cross-
    engine because the redistribution is one integer division.

    Returns (node, rank_q): every node that appears as src or dst,
    with its scaled-integer rank after ``iters`` iterations from a
    uniform SCALE start.
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("__deg"))
    # materialize the degreed edge list and node set ONCE (checkpoint()
    # on a real cluster): every iteration's action would otherwise
    # re-scan the edges and re-aggregate degrees through the lineage
    fan = edges.join(deg, "src").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank_q", F.lit(PR_SCALE).cast("bigint"))
    teleport = (3 * PR_SCALE) // PR_D_DEN
    if conserve_dangling:
        # sink set and node count are loop-invariant: one anti-join +
        # one metadata-sized count, computed once
        sinks = nodes.join(
            deg.select(F.col("src").alias("node")), "node", "left_anti"
        ).localCheckpoint(eager=True)
        n_nodes = nodes.count()
    for it in range(iters):
        # flatten lineage BETWEEN rounds (durable checkpoint() on a
        # real cluster) so the plan stays two shuffles per iteration;
        # the final iteration returns a live plan, not a checkpoint
        if it:
            ranks = ranks.localCheckpoint(eager=True)
        contrib = (
            fan.join(ranks, fan["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_q div __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        joined = nodes.join(contrib, "node", "left")
        if conserve_dangling:
            dmass = ranks.join(sinks, "node").agg(
                F.coalesce(F.sum("rank_q"), F.lit(0)).alias("__dm")
            )
            joined = joined.crossJoin(F.broadcast(dmass))
            damped = (
                f"({PR_D_NUM} * (coalesce(__in, 0) + __dm div {n_nodes}))"
                f" div {PR_D_DEN}"
            )
        else:
            damped = f"({PR_D_NUM} * coalesce(__in, 0)) div {PR_D_DEN}"
        ranks = joined.select(
            "node",
            (F.lit(teleport) + F.expr(damped)).cast("bigint")
            .alias("rank_q"),
        )
    return ranks


def pagerank_sql(
    edges_sql: str, iters: int = 3, conserve_dangling: bool = False
) -> str:
    """DuckDB twin: the same iterations unrolled as chained CTEs over
    an ``edges_sql`` subquery producing (src, dst). With
    ``conserve_dangling`` each iteration adds the sink-mass scalar CTE
    and the identical ``dmass div n`` redistribution term."""
    teleport = (3 * PR_SCALE) // PR_D_DEN
    ctes = [
        f"__e AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}))",
        """__deg AS MATERIALIZED (
            SELECT src, count(*) AS deg FROM __e GROUP BY 1
        )""",
        """__nodes AS MATERIALIZED (
            SELECT src AS node FROM __e
            UNION SELECT dst FROM __e
        )""",
        f"""__r0 AS (
            SELECT node, cast({PR_SCALE} AS bigint) AS rank_q FROM __nodes
        )""",
    ]
    if conserve_dangling:
        ctes.append(
            "__n AS (SELECT count(*) AS n FROM __nodes)"
        )
    for i in range(iters):
        ctes.append(f"""__c{i} AS (
            SELECT e.dst AS node,
                   sum(r.rank_q // d.deg) AS inflow
            FROM __e e
            JOIN __deg d ON d.src = e.src
            JOIN __r{i} r ON r.node = e.src
            GROUP BY 1
        )""")
        if conserve_dangling:
            ctes.append(f"""__s{i} AS (
                SELECT coalesce(sum(r.rank_q), 0) AS dm
                FROM __r{i} r LEFT JOIN __deg d ON d.src = r.node
                WHERE d.src IS NULL
            )""")
            redistributed = (
                f"coalesce(c.inflow, 0) + (SELECT dm FROM __s{i}) "
                f"// (SELECT n FROM __n)"
            )
        else:
            redistributed = "coalesce(c.inflow, 0)"
        ctes.append(f"""__r{i + 1} AS (
            SELECT n.node,
                   cast({teleport}
                        + ({PR_D_NUM} * ({redistributed})) // {PR_D_DEN}
                        AS bigint) AS rank_q
            FROM __nodes n LEFT JOIN __c{i} c ON n.node = c.node
        )""")
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT node, rank_q FROM __r{iters}"
    )


# ---------------------------------------------------------------------------
# triangle counting (degree-ordered orientation — Suri & Vassilvitskii,
# "Counting Triangles and the Curse of the Last Reducer", WWW'11 —
# public literature). Orienting every edge from its lower-(degree, id)
# endpoint to the higher one makes each triangle a unique directed
# wedge + closing edge, and bounds every node's OUT-degree by
# O(sqrt(m)) — the hub that would explode a naive wedge join fans out
# from its low-degree neighbors instead. Two equi-joins, no node ever
# enumerates its full neighborhood.


def _oriented(edges: DataFrame) -> DataFrame:
    """Orient canonical undirected edges (u < v) by (degree, id):
    src = lower endpoint in that total order."""
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    e = (
        edges.join(deg.withColumnRenamed("n", "u")
                      .withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v")
                 .withColumnRenamed("d", "dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an undirected simple
    graph given as (u, v) rows with u < v, deduped.

    Wedges pair two out-edges of the same source; a wedge closes iff
    the oriented edge between its endpoints exists (exactly one
    orientation can, so each triangle is found once). The triangle's
    three corners then explode to per-node counts. Output: (node,
    n_triangles), nodes in >= 1 triangle only."""
    oe = _oriented(edges)
    w1 = oe.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    w2 = oe.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = (
        w1.join(w2, "a")
        .where(F.col("b") != F.col("c"))
        .join(
            oe,
            (F.col("b") == F.col("src")) & (F.col("c") == F.col("dst")),
        )
        .select("a", "b", "c")
    )
    return (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )


def triangle_counts_sql(edges_sql: str) -> str:
    """DuckDB twin: identical orientation rule, wedge join, and
    per-corner explode. ``edges_sql`` must yield (u, v) with u < v,
    deduped."""
    return f"""
    WITH __te AS ({edges_sql}),
    __td AS (
        SELECT n, count(*) AS d FROM (
            SELECT u AS n FROM __te UNION ALL SELECT v AS n FROM __te
        ) GROUP BY 1
    ),
    __toe AS (
        SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
                    THEN u ELSE v END AS src,
               CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v)
                    THEN v ELSE u END AS dst
        FROM __te JOIN __td du ON du.n = __te.u
                  JOIN __td dv ON dv.n = __te.v
    ),
    __tri AS (
        SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
        FROM __toe w1
        JOIN __toe w2 ON w1.src = w2.src AND w1.dst <> w2.dst
        JOIN __toe ce ON ce.src = w1.dst AND ce.dst = w2.dst
    )
    SELECT node, cast(count(*) AS bigint) AS n_triangles
    FROM (SELECT unnest([a, b, c]) AS node FROM __tri)
    GROUP BY 1
    """
