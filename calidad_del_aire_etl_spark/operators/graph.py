"""Iterative graph analytics: PageRank over a relation-derived graph.

Companion to the connected-components resolver (dedup.py): CC answers
"which docs are the same"; PageRank answers "which nodes matter" — used
in corpus curation for citation/link-based quality weighting.

Scale posture (the same discipline as the CC loop, SURVEY §4):
- edges and degrees are computed once and PERSISTED — every iteration
  re-reads them, so without caching each round would rescan the fact;
- each iteration persists its rank relation and unpersists the
  previous one, keeping lineage depth constant (otherwise plan size
  doubles per round and the job dies at iteration ~20);
- the per-iteration plan is join(edges, ranks on src) → groupBy(dst)
  — one shuffle per round, partitioned by node key both times, so AQE
  reuses the exchange;
- the only driver-side values are the node count N (one scalar) —
  ranks never collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import r4


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list (no dangling-node handling:
    callers pass graphs where every node has out-edges — the bipartite
    order graph below is symmetrized, which guarantees it).

    Returns (node, rank) with rank rounded to 4 decimals."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")).persist()
    nodes = deg.select(F.col("src").alias("node"))
    n = nodes.count()  # one scalar to the driver, by design
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).persist()
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            e.join(deg, "src")
            .join(ranks, e.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("out_deg")).alias("c"))
        )
        new_ranks = contribs.groupBy("node").agg(
            (F.lit(base) + F.lit(damping) * F.sum("c")).alias("rank")
        )
        new_ranks = new_ranks.persist()
        new_ranks.count()  # materialize before dropping the parent
        ranks.unpersist()
        ranks = new_ranks
    out = ranks.select("node", r4(F.col("rank")).alias("rank")).orderBy(
        F.col("rank").desc(), F.col("node").asc()
    )
    e.unpersist()
    deg.unpersist()
    return out


def order_graph_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Symmetrized customer↔supplier edge list from the order fact:
    an edge for every (customer, supplier) pair that traded. Node ids
    are disambiguated by namespace prefix (c:/s:) so the two key
    spaces can't collide."""
    pairs = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("cust"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("supp"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
    rev = pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    return fwd.unionAll(rev)


# ---------------------------------------------------------------------------
# Triangle counting (degree-oriented node-iterator)
# ---------------------------------------------------------------------------


def triangle_count(pairs: DataFrame) -> DataFrame:
    """Global triangle count over an undirected edge list (id_a, id_b)
    — the standard cohesion/clustering signal for the near-dup graph
    (triangle-dense clusters are true duplicate families; triangle-free
    stars are often boilerplate hubs worth different handling).

    Degree-oriented node-iterator (the MapReduce-classic from Suri &
    Vassilvitskii's "Counting Triangles and the Curse of the Last
    Reducer", WWW'11): edges orient from the (degree, id)-SMALLER
    endpoint to the larger, so every node's out-degree is O(√m) even
    for hub nodes — the wedge join fan-out (the quadratic term) is
    bounded per node regardless of skew, which is exactly the "last
    reducer" fix. Each triangle is then counted exactly once: wedges
    (two out-edges of the low node) probe the oriented edge set.

    Plan: degree aggregate → two broadcast degree joins to orient →
    wedge self-join on the low vertex → semi-probe join — all
    equi-joins on ids, no cross product anywhere.
    """
    # Multi-consumer boundaries get LAZY localCheckpoints: sym feeds the
    # degree aggregate AND the orientation join (so the upstream pair
    # generation would re-expand twice), and oriented feeds four
    # consumers (two wedge views + two probe directions → 4× subtree
    # re-expansion, ~450 Exchange mentions in the formatted plan before
    # this). Lazy = the plan truncates to a leaf immediately but the
    # edge-sized materialization happens inside the first action, no
    # extra job.
    # The symmetrizing union reads `pairs` twice, and the pair GENERATION
    # (typically the shingle self-join) is the expensive subtree — cut it
    # to a leaf before the double read. At bench scale the two branches
    # run concurrently so the wall win is modest (2.33 s -> 2.24 s best,
    # 2.80 -> 2.45 median on graph_triangles at sf0.1, r14), but the CPU
    # halves — which is what matters when the cluster is full at 100 TB.
    pairs = pairs.localCheckpoint(eager=False)
    sym = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .union(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # orient: keep (u, v) where (d_u, u) < (d_v, v)
    oriented = (
        sym.join(deg.select(F.col("u"), F.col("d").alias("du")), "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("d").alias("dv")),
            "v",
        )
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
        .localCheckpoint(eager=False)
    )
    w1 = oriented.select(F.col("u"), F.col("v").alias("a"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("b"))
    wedges = w1.join(w2, "u").filter(F.col("a") < F.col("b"))
    # Spark union is POSITIONAL — both selects must emit (a, b) in that
    # order, or the swapped branch silently re-emits the original.
    probe = oriented.select(F.col("u").alias("a"), F.col("v").alias("b")).union(
        oriented.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    tri = wedges.join(probe, ["a", "b"])
    return tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


def triangle_count_sql(pairs_sql: str) -> str:
    """DuckDB oracle twin: same degree orientation, same wedge-probe."""
    return f"""
    WITH pairs AS ({pairs_sql}),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ), deg AS (
      SELECT u, COUNT(*) AS d FROM sym GROUP BY 1
    ), oriented AS (
      SELECT s.u, s.v
      FROM sym s JOIN deg du ON s.u = du.u JOIN deg dv ON s.v = dv.u
      WHERE (du.d < dv.d) OR (du.d = dv.d AND s.u < s.v)
    ), wedges AS (
      SELECT w1.v AS a, w2.v AS b
      FROM oriented w1 JOIN oriented w2 ON w1.u = w2.u
      WHERE w1.v < w2.v
    ), probe AS (
      SELECT u AS a, v AS b FROM oriented
      UNION ALL
      SELECT v AS a, u AS b FROM oriented
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM wedges JOIN probe USING (a, b)
    """
