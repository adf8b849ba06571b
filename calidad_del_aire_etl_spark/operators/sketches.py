"""Frequency-sketch operators: bounded-memory heavy hitters.

Why not plain ``groupBy(col).count()``? That is exact and already
map-side-combined, but its shuffle carries one row per *distinct item
per partition* — for high-cardinality columns (n-grams, URLs, user
agents) at 100 TB that IS the bottleneck. A Misra-Gries summary caps
the per-partition shuffle contribution at ``capacity + 1`` rows with a
provable undercount bound, which is the standard trade (Misra & Gries
1982; the "parallel frequent items" merge property makes the summaries
mergeable by simple summation).

Guarantees of the merged estimate per item:

    est  <=  true_count  <=  est + max_undercount

where ``max_undercount`` is the sum of every partition's decrement
total (reported exactly, not as the worst-case n/capacity bound — so a
run whose partitions never evict reports 0 and the result is exact,
which also makes the registered query oracle-checkable).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _mg_partition(col: str, capacity: int):
    """Per-partition Misra-Gries fold, Arrow-batch-vectorized: each
    batch's value_counts merges into the summary dict; on overflow the
    (len - capacity)-th smallest count is subtracted from everything
    (a batched decrement round — same invariant, fewer passes)."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        decr = 0
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > capacity:
                cs = sorted(counts.values())
                t = cs[len(counts) - capacity - 1]
                decr += t
                counts = {v: c - t for v, c in counts.items() if c > t}
        items = list(counts.items())
        yield pd.DataFrame(
            {
                "item": [v for v, _ in items] + [None],
                "cnt": [c for _, c in items] + [0],
                "decr": [0] * len(items) + [decr],
            }
        )

    return fold


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, capacity: int = 64
) -> DataFrame:
    """Approximate top-k most frequent values of ``col``.

    Phase 1: one Misra-Gries summary per partition (mapInPandas, Arrow
    batches, <= capacity+1 output rows per partition). Phase 2: merge by
    summation — a groupBy over at most ``capacity x partitions`` rows —
    plus a scalar total of all decrements, broadcast back as the error
    bound. Output: (item, est, est_max, rank), rank by est desc with an
    item tie-break so both engines order identically when exact.
    """
    summ = (
        df.select(F.col(col).cast("string").alias(col))
        .mapInPandas(_mg_partition(col, capacity), "item string, cnt long, decr long")
    )
    # ONE groupBy pass merges both the per-item estimates and the decrement
    # totals (the sentinel null-item rows carry decr), so the mapInPandas
    # stage runs exactly once with no persist to leak (ADVICE r2: the old
    # persist was never released). The merged relation is bounded at
    # capacity x partitions rows, so the unbounded total window is cheap.
    merged = summ.groupBy("item").agg(
        F.sum("cnt").alias("est"), F.sum("decr").alias("decr")
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w = Window.orderBy(F.col("est").desc(), F.col("item").asc())
    topk = (
        merged.withColumn("total_decr", F.sum("decr").over(w_all))
        .filter(F.col("item").isNotNull())
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
    return topk.select(
        "item",
        F.col("est").cast("bigint").alias("est"),
        (F.col("est") + F.col("total_decr")).cast("bigint").alias("est_max"),
        "rank",
    )


def heavy_hitters_exact_sql(table: str, col: str, k: int = 10) -> str:
    """DuckDB twin for the no-eviction regime (capacity >= per-partition
    distinct cardinality): Misra-Gries degenerates to exact counts and
    the decrement total is 0, so est == est_max == exact count."""
    return f"""
    SELECT item, est, est AS est_max, rank FROM (
      SELECT CAST({col} AS VARCHAR) AS item,
             CAST(COUNT(*) AS BIGINT) AS est,
             CAST(ROW_NUMBER() OVER (
               ORDER BY COUNT(*) DESC, CAST({col} AS VARCHAR) ASC) AS INTEGER) AS rank
      FROM {table} GROUP BY 1
    ) WHERE rank <= {k}
    """


def hll_reaggregate(
    df: DataFrame,
    ts_col: str,
    group_col: str,
    id_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable-sketch distinct counting, the 100 TB replacement for
    COUNT(DISTINCT): build ONE Datasketches HLL sketch per (day, group)
    cell — these partials are what a lakehouse persists alongside daily
    rollups — then answer the month×group question by UNIONING the
    daily sketches, never rescanning the fact. The test proves the
    re-aggregated estimate tracks the exact month-level distinct count
    (tolerance ~2 % at lg_k=12), which is exactly the property that
    lets a 1000-executor fleet maintain rolling distincts with
    day-sized increments.

    Sketch bytes are engine-specific, so there is no DuckDB twin
    (rows-only gate); the accuracy guarantee lives in pytest.
    """
    daily = df.groupBy(
        F.to_date(F.col(ts_col)).alias("d"), F.col(group_col).alias("g")
    ).agg(F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("sk"))
    monthly = (
        daily.groupBy(
            F.date_format("d", "yyyy-MM").alias("month"), F.col("g").alias(group_col)
        )
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias(
                "est_distinct"
            ),
            F.count(F.lit(1)).cast("bigint").alias("days_merged"),
        )
    )
    return monthly.orderBy("month", group_col)
