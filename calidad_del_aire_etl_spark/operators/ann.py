"""Similarity search over embedding columns (SURVEY §2 #30-31).

- Brute-force cosine top-k: the exactness baseline. The query set is
  broadcast, so the big side streams once with no shuffle; cost is
  O(|queries| × N × dim) map work plus a top-k window per query.
- Random-hyperplane LSH top-k: the 100 TB path — rows hash into 2^P
  sign buckets; queries only scan their own bucket. Hyperplanes are
  deterministic ±1 vectors derived from md5, so results are stable
  across runs and engines (recall vs brute force is asserted in
  tests/test_ann.py, the classic accuracy/throughput trade).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import r4
from .dedup import COSINE_SPARK


def bruteforce_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids_pred,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for the rows matching
    ``query_ids_pred`` (a Column predicate), excluding self-matches.
    Deterministic: ties broken by neighbor id on the rounded cosine."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    queries = base.filter(query_ids_pred(F.col("id"))).select(
        F.col("id").alias("qid"), F.col("v").alias("qv")
    )
    cos = r4(F.expr(COSINE_SPARK.format(a="qv", b="v")))
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("id") != F.col("qid"))
        .select("qid", F.col("id").alias("neighbor_id"), cos.alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), "neighbor_id", "cosine", "rank")
    )


def bruteforce_topk_sql(
    table: str, id_col: str, vec_col: str, query_pred_sql: str, k: int = 5
) -> str:
    from .dedup import COSINE_DUCK

    cos = COSINE_DUCK.format(a=f"q.{vec_col}", b=f"c.{vec_col}")
    return f"""
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT q.{id_col} AS query_id, c.{id_col} AS neighbor_id,
             ROUND({cos} + 1e-9, 4) AS cosine,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q.{id_col}
               ORDER BY ROUND({cos} + 1e-9, 4) DESC, c.{id_col} ASC) AS INTEGER) AS rank
      FROM {table} q JOIN {table} c ON q.{id_col} != c.{id_col}
      WHERE {query_pred_sql}
    ) WHERE rank <= {k}
    """


def hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 parity — no RNG state, so
    every executor and every engine derives the same planes."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}_{d}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket_col(vec_col: str, planes: list[list[float]]):
    """Bucket id column: bit p set iff plane_p · v > 0."""
    terms = []
    for p, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"{w}D" for w in plane) + ")"
        dot = (
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> x * y), "
            "cast(0 as double), (acc, x) -> acc + x)"
        )
        terms.append(f"(case when {dot} > 0 then cast({2 ** p} as bigint) else cast(0 as bigint) end)")
    return F.expr(" + ".join(terms))


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids_pred,
    k: int = 5,
    num_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k with multi-probe: candidates come from
    the query's LSH bucket plus every bucket at Hamming distance 1
    (flipping one hyperplane sign), the standard recall/cost knob.
    Scan fraction ≈ (1 + P) / 2^P of the corpus per query."""
    planes = hyperplanes(num_planes, dim)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket_col(vec_col, planes).alias("bucket"),
    )
    probe_exprs = ["bucket"] + [
        f"cast(bucket as bigint) ^ cast({2 ** p} as bigint)" for p in range(num_planes)
    ]
    queries = (
        base.filter(query_ids_pred(F.col("id")))
        .select(
            F.col("id").alias("qid"),
            F.col("v").alias("qv"),
            F.explode(F.expr("array(" + ", ".join(probe_exprs) + ")")).alias("qb"),
        )
    )
    cos = r4(F.expr(COSINE_SPARK.format(a="qv", b="v")))
    scored = (
        base.join(F.broadcast(queries), (F.col("bucket") == F.col("qb")) & (F.col("id") != F.col("qid")))
        .select("qid", F.col("id").alias("neighbor_id"), cos.alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), "neighbor_id", "cosine", "rank")
    )
