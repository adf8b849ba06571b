"""PageRank: NumPy parity on the real sf0.001 graph + scale guards."""


from __future__ import annotations

import pytest

import numpy as np

import __spark_entry__ as entry
from calidad_del_aire_etl_spark.operators import graph
from calidad_del_aire_etl_spark.registry import load

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_pagerank_matches_numpy(spark):
    edges = graph.order_graph_edges(
        load(spark, SF, "orders"), load(spark, SF, "lineitem")
    )
    got = {r.node: r.rank for r in graph.pagerank(edges, iterations=8).collect()}

    e = edges.distinct().collect()
    nodes = sorted({r.src for r in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for r in e:
        out_deg[idx[r.src]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(8):
        contrib = np.zeros(n)
        for r in e:
            contrib[idx[r.dst]] += rank[idx[r.src]] / out_deg[idx[r.src]]
        rank = 0.15 / n + 0.85 * contrib
    for node, i in idx.items():
        assert abs(got[node] - rank[i]) < 5e-4, node
    # probability mass conserved (no dangling nodes in the symmetrized graph)
    assert abs(sum(got.values()) - 1.0) < 0.01


@pytest.mark.slow
def test_pagerank_query_entry_runs(spark):
    rows = entry.queries()["graph_pagerank"](spark, SF).collect()
    assert 0 < len(rows) <= 50
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_triangle_count_planted_graphs(spark):
    """Exact counts on known shapes, including a hub node (the skew case
    degree orientation exists for): K4 has 4 triangles, a star has 0,
    a star plus one rim edge has 1."""
    from itertools import combinations

    from calidad_del_aire_etl_spark.operators.graph import triangle_count

    def count(edges):
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        return triangle_count(df).collect()[0]["n_triangles"]

    k4 = list(combinations(range(4), 2))
    assert count(k4) == 4
    star = [(0, i) for i in range(1, 8)]
    assert count(star) == 0
    assert count(star + [(3, 5)]) == 1
    # random graph vs brute force
    import random

    rnd = random.Random(7)
    n = 20
    edges = sorted({tuple(sorted(rnd.sample(range(n), 2))) for _ in range(60)})
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    brute = sum(
        1 for a, b, c in combinations(range(n), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert count(edges) == brute
