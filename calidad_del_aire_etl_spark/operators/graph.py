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
