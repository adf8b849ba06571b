"""Analytics widening batch: grouping sets, time-weighted averages,
winsorization, fixed-bin histograms, cumulative distinct counting.

Shapes a 100 TB telemetry/sensor warehouse needs beyond the reference
dashboard (dashboard_calidad_aire.py:64-254): each is one or two
shuffles, partial-aggregated, with exact DECIMAL math wherever a
distributed double sum would be order-dependent.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import r4

DEC = "decimal(18,2)"


# ---------------------------------------------------------------------------
# GROUPING SETS (distinct from rollup/cube: arbitrary, non-hierarchical sets)
# ---------------------------------------------------------------------------


def grouping_sets_profile(events: DataFrame) -> DataFrame:
    """Two independent grouping sets — (event_type) and (day-of-week) —
    in ONE pass via GROUP BY GROUPING SETS.

    At scale this halves the number of fact scans vs running two
    groupBys: Spark expands the sets map-side and partial-aggregates
    both, so the fact is read once. NULL set-markers are coalesced to
    'ALL' so the output is join-safe."""
    base = events.select(
        "event_type",
        F.dayofweek("ts").cast("int").alias("dow"),
        F.col("value").cast(DEC).alias("__v"),
    )
    agg = base.groupingSets(
        [["event_type"], ["dow"]], "event_type", "dow"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        r4(F.sum("__v").cast("double")).alias("sum_value"),
        r4(F.avg(F.col("__v").cast("double"))).alias("avg_value"),
    )
    return agg.select(
        F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
        F.coalesce(F.col("dow").cast("string"), F.lit("ALL")).alias("dow"),
        "n",
        "sum_value",
        "avg_value",
    ).orderBy("event_type", "dow")


GROUPING_SETS_SQL = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(CAST(dow AS VARCHAR), 'ALL') AS dow,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(v) AS DOUBLE) + 1e-9, 4) AS sum_value,
       ROUND(AVG(CAST(v AS DOUBLE)) + 1e-9, 4) AS avg_value
FROM (
  SELECT event_type, CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
)
GROUP BY GROUPING SETS ((event_type), (dow))
ORDER BY event_type, dow
"""


# ---------------------------------------------------------------------------
# Time-weighted average (irregular sampling intervals)
# ---------------------------------------------------------------------------


def time_weighted_avg(events: DataFrame) -> DataFrame:
    """Per-user time-weighted mean value: each reading is weighted by
    the seconds until the NEXT reading (trapezoid-left rule); the final
    open-ended reading carries no weight.

    The right aggregate for irregular sensor streams — a plain AVG
    over-weights bursts. One window shuffle on user_id (in-partition
    sort by ts), then a partial-agg groupBy on the same key, which AQE
    coalesces onto the window's partitioning. Weighted sums run in
    DECIMAL so the distributed sum is order-independent."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt_us = (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).cast(
        "decimal(18,0)"
    )
    wted = events.select(
        "user_id",
        F.col("value").cast(DEC).alias("__v"),
        dt_us.alias("__dt"),
    ).filter(F.col("__dt").isNotNull())
    agg = wted.groupBy(F.col("user_id").cast("int").alias("user_id")).agg(
        F.sum((F.col("__v") * F.col("__dt")).cast("decimal(38,2)")).alias("__num"),
        F.sum("__dt").alias("__den"),
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
    )
    return agg.select(
        "user_id",
        r4(F.col("__num").cast("double") / F.col("__den").cast("double")).alias(
            "time_weighted_avg"
        ),
        r4(F.col("__den").cast("double") / F.lit(1_000_000.0)).alias("span_seconds"),
        "n_intervals",
    ).orderBy("user_id")


TIME_WEIGHTED_SQL = """
SELECT CAST(user_id AS INTEGER) AS user_id,
       ROUND(CAST(SUM(CAST(v * dt AS DECIMAL(38,2))) AS DOUBLE)
             / CAST(SUM(dt) AS DOUBLE) + 1e-9, 4) AS time_weighted_avg,
       ROUND(CAST(SUM(dt) AS DOUBLE) / 1000000.0 + 1e-9, 4) AS span_seconds,
       CAST(COUNT(*) AS BIGINT) AS n_intervals
FROM (
  SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v,
         CAST(epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              - epoch_us(ts) AS DECIMAL(18,0)) AS dt
  FROM events
)
WHERE dt IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Winsorization (percentile capping — the robust-stats sibling of IQR clip)
# ---------------------------------------------------------------------------


def winsorize_profile(events: DataFrame, p_lo: float = 0.05, p_hi: float = 0.95) -> DataFrame:
    """Per-event-type winsorized profile: exact P5/P95 bounds, values
    capped to them, clipped-row counts and winsorized mean reported.

    Plan: one groupBy computes the per-type percentile bounds (exact
    here; `percentile_approx` is the documented 100 TB drop-in), the
    tiny bounds relation broadcasts back onto the fact, and a second
    partial-agg groupBy on the same key produces the profile.

    The bounds snap to a 1e-6 grid on BOTH engines: values are
    2-decimal and the interpolation fraction p·(n−1) has two decimals,
    so the true percentile has ≤ 4 — but Spark's percentile() and
    DuckDB's quantile_cont() interpolate with different internal
    arithmetic, and on sf1's 100×-duplicated values the ~1e-9 cutoff
    noise flipped 50 boundary rows in/out of the clip counts (caught
    by the r12 full-registry sf1 sweep). floor(x·1e6 + 0.5)/1e6 lands
    both engines on the identical double."""
    snap = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / F.lit(1000000.0)  # noqa: E731
    bounds = events.groupBy("event_type").agg(
        snap(F.expr(f"percentile(value, {p_lo})")).alias("__lo"),
        snap(F.expr(f"percentile(value, {p_hi})")).alias("__hi"),
    ).withColumnRenamed("event_type", "__et")
    capped = events.join(
        F.broadcast(bounds), events.event_type == F.col("__et")
    ).select(
        "event_type",
        F.least(F.greatest(F.col("value"), F.col("__lo")), F.col("__hi"))
        .cast("decimal(28,8)")
        .alias("__w"),
        (F.col("value") < F.col("__lo")).cast("int").alias("__clip_lo"),
        (F.col("value") > F.col("__hi")).cast("int").alias("__clip_hi"),
        "__lo",
        "__hi",
    )
    return (
        capped.groupBy("event_type")
        .agg(
            r4(F.first("__lo")).alias("p_lo"),
            r4(F.first("__hi")).alias("p_hi"),
            F.sum("__clip_lo").cast("bigint").alias("n_clipped_lo"),
            F.sum("__clip_hi").cast("bigint").alias("n_clipped_hi"),
            r4(F.sum("__w").cast("double") / F.count(F.lit(1))).alias("winsorized_mean"),
        )
        .orderBy("event_type")
    )


def winsorize_sql(p_lo: float = 0.05, p_hi: float = 0.95) -> str:
    return f"""
SELECT event_type,
       ROUND(ANY_VALUE(lo) + 1e-9, 4) AS p_lo,
       ROUND(ANY_VALUE(hi) + 1e-9, 4) AS p_hi,
       CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
       CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
       ROUND(CAST(SUM(CAST(LEAST(GREATEST(value, lo), hi) AS DECIMAL(28,8))) AS DOUBLE)
             / COUNT(*) + 1e-9, 4) AS winsorized_mean
FROM (
  SELECT event_type, value,
         floor(quantile_cont(value, {p_lo}) OVER (PARTITION BY event_type)
               * 1000000 + 0.5) / 1000000.0 AS lo,
         floor(quantile_cont(value, {p_hi}) OVER (PARTITION BY event_type)
               * 1000000 + 0.5) / 1000000.0 AS hi
  FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Fixed-bin histogram
# ---------------------------------------------------------------------------


def value_histogram(
    events: DataFrame, lo: float = 0.0, hi: float = 500.0, nbins: int = 20
) -> DataFrame:
    """Per-event-type fixed-bin value histogram.

    The bin id is a pure arithmetic expression (no UDF, no percentile
    pass), so binning rides the scan inside WholeStageCodegen and the
    single shuffle carries only (type, bin) partial counts — at most
    |types|×nbins rows per map task regardless of input size."""
    width = (hi - lo) / nbins
    bin_id = F.least(
        F.greatest(F.floor((F.col("value") - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(nbins - 1),
    ).cast("int")
    return (
        events.select("event_type", bin_id.alias("bin_id"))
        .groupBy("event_type", "bin_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "event_type",
            "bin_id",
            r4(F.lit(lo) + F.col("bin_id") * F.lit(width)).alias("bin_lo"),
            "n",
        )
        .orderBy("event_type", "bin_id")
    )


def value_histogram_sql(lo: float = 0.0, hi: float = 500.0, nbins: int = 20) -> str:
    width = (hi - lo) / nbins
    return f"""
SELECT event_type, bin_id,
       ROUND({lo} + bin_id * {width} + 1e-9, 4) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT event_type,
         CAST(LEAST(GREATEST(FLOOR((value - {lo}) / {width}), 0), {nbins - 1}) AS INTEGER)
           AS bin_id
  FROM events
)
GROUP BY event_type, bin_id
ORDER BY event_type, bin_id
"""


# ---------------------------------------------------------------------------
# Cumulative distinct users per day (first-touch trick)
# ---------------------------------------------------------------------------


def cumulative_distinct_users(events: DataFrame) -> DataFrame:
    """Daily new-user and cumulative-distinct-user counts.

    A naive per-day COUNT(DISTINCT) over a growing window is O(days ×
    users); the first-touch trick is two partial-agg groupBys: min(day)
    per user (shuffle on user), then count per first-day (tiny), then a
    running sum over the ~#days-row result — the only window runs on an
    aggregated relation that is small by construction at any scale."""
    first_day = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    daily = first_day.groupBy("first_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("first_day").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    ).orderBy("day")


CUMULATIVE_DISTINCT_SQL = """
SELECT CAST(first_day AS VARCHAR) AS day,
       CAST(COUNT(*) AS BIGINT) AS new_users,
       CAST(SUM(COUNT(*)) OVER (ORDER BY first_day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM (SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id)
GROUP BY first_day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Exponential moving average (recursive smoother as an array fold)
# ---------------------------------------------------------------------------


def ema_per_group(
    events: DataFrame, alpha: float = 0.3, tail_n: int = 5
) -> DataFrame:
    """Per-user EMA (ema_t = α·x_t + (1-α)·ema_{t-1}, seeded with the
    first reading); reports the final EMA and the mean of the last
    ``tail_n`` smoothed points.

    EMA is inherently sequential, which rules out a window frame — but
    it is a FOLD, so each group collapses to a sorted array (one
    groupBy shuffle, map-side combined into partial arrays) and the
    fold runs as a higher-order `aggregate()` entirely JVM-side. State
    per group is O(series length); for unbounded series the streaming
    `applyInPandasWithState` module is the documented path.

    The fold is evaluated ONCE into an (ema, tail) accumulator pair —
    re-deriving the tail from a second fold would recompute the series
    (see the project-collapse trap in SNIPPETS/SURVEY §4)."""
    seq = events.groupBy(F.col("user_id").cast("int").alias("user_id")).agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("__seq")
    )
    # fold state: named_struct(ema double, tail array<double>) — tail keeps
    # the last `tail_n` smoothed values
    fold = (
        "aggregate("
        "  slice(__vals, 2, greatest(size(__vals) - 1, 0)),"
        "  named_struct('ema', cast(__vals[0] as double),"
        "               'tail', array(cast(__vals[0] as double))),"
        f" (acc, x) -> named_struct("
        f"    'ema', {alpha} * x + {1 - alpha} * acc.ema,"
        f"    'tail', slice(concat(acc.tail, array({alpha} * x + {1 - alpha} * acc.ema)),"
        f"                  greatest(size(acc.tail) + 2 - {tail_n}, 1), {tail_n})),"
        "  acc -> acc)"
    )
    folded = seq.select(
        "user_id",
        F.size("__seq").cast("bigint").alias("n_points"),
        F.expr(
            "transform(array(transform(__seq, s -> s.value)), __vals -> " + fold + ")"
        )[0].alias("__st"),
    )
    return folded.select(
        "user_id",
        "n_points",
        r4(F.col("__st.ema")).alias("ema_final"),
        r4(
            F.aggregate(
                "__st.tail", F.lit(0.0), lambda a, x: a + x
            )
            / F.size("__st.tail")
        ).alias("ema_tail_mean"),
    ).orderBy("user_id")


def ema_sql(alpha: float = 0.3, tail_n: int = 5) -> str:
    # DuckDB: list(value ORDER BY ts, event_id) gives the same ordered
    # series; list_reduce folds left with the first element as the seed,
    # matching the Spark fold exactly (identical double op sequence).
    return f"""
SELECT user_id, n_points,
       ROUND(st.ema + 1e-9, 4) AS ema_final,
       ROUND(list_sum(st.tail) / len(st.tail) + 1e-9, 4) AS ema_tail_mean
FROM (
  SELECT CAST(user_id AS INTEGER) AS user_id,
         CAST(len(vals) AS BIGINT) AS n_points,
         list_reduce(
           list_prepend({{'ema': CAST(vals[1] AS DOUBLE),
                          'tail': [CAST(vals[1] AS DOUBLE)]}},
                        list_transform(vals[2:], x -> {{'ema': CAST(x AS DOUBLE), 'tail': CAST([] AS DOUBLE[])}})),
           (acc, s) -> list_transform([{alpha} * s.ema + {1 - alpha} * acc.ema],
                         ne -> {{'ema': ne,
                                 'tail': (acc.tail || [ne])[
                                     GREATEST(len(acc.tail) + 2 - {tail_n}, 1):]}})[1]
         ) AS st
  FROM (
    SELECT user_id, list(value ORDER BY ts, event_id) AS vals
    FROM events GROUP BY user_id
  )
)
ORDER BY user_id
"""


def holt_per_group(
    events: DataFrame, alpha: float = 0.5, beta: float = 0.3, horizon: int = 3
) -> DataFrame:
    """Per-user Holt double exponential smoothing (level + linear
    trend), the next step up from :func:`ema_per_group`'s flat EMA:

        l_t = α·x_t + (1-α)·(l_{t-1} + b_{t-1})
        b_t = β·(l_t − l_{t-1}) + (1-β)·b_{t-1}

    seeded with l=x₁, b=x₁−x₀ (single-reading series degrade to l=x₀,
    b=0). Reports the final level/trend and the ``horizon``-step-ahead
    forecast l + h·b — the classic short-horizon sensor forecast the
    reference's daily projections imply.

    Same scale shape as the EMA: the recurrence is sequential but a
    FOLD, so each user collapses to one sorted array (one groupBy
    shuffle, map-side combined) and the two-state fold runs JVM-side in
    a higher-order ``aggregate`` — no Python, no per-step shuffle.
    State per group is O(series length); unbounded series belong to the
    streaming stateful path. The new level is referenced by both state
    fields, so the step recomputes it in each — bit-identical arithmetic
    on both engines, which is what the oracle hash-matches."""
    nl = f"{alpha} * x + {1 - alpha} * (acc.l + acc.b)"
    fold = (
        "aggregate("
        "  slice(__vals, 3, greatest(size(__vals) - 2, 0)),"
        "  named_struct('l', cast(__vals[1] as double),"
        "               'b', cast(__vals[1] as double) - cast(__vals[0] as double)),"
        f" (acc, x) -> named_struct("
        f"    'l', {nl},"
        f"    'b', {beta} * (({nl}) - acc.l) + {1 - beta} * acc.b),"
        "  acc -> acc)"
    )
    seq = events.groupBy(F.col("user_id").cast("int").alias("user_id")).agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("__seq")
    )
    folded = seq.select(
        "user_id",
        F.size("__seq").cast("bigint").alias("n_points"),
        F.expr(
            "transform(array(transform(__seq, s -> s.value)), __vals -> "
            "case when size(__vals) < 2 "
            "then named_struct('l', cast(__vals[0] as double), 'b', cast(0.0 as double)) "
            "else " + fold + " end)"
        )[0].alias("__st"),
    )
    return folded.select(
        "user_id",
        "n_points",
        r4(F.col("__st.l")).alias("level"),
        r4(F.col("__st.b")).alias("trend"),
        r4(F.col("__st.l") + F.lit(float(horizon)) * F.col("__st.b")).alias(
            f"forecast_{horizon}"
        ),
    ).orderBy("user_id")


def holt_sql(alpha: float = 0.5, beta: float = 0.3, horizon: int = 3) -> str:
    # DuckDB twin: list(value ORDER BY ts, event_id) then the same
    # two-state fold via list_reduce (seed prepended — DuckDB's reduce
    # takes its initial accumulator from the first element, so every
    # element shares the {'l','b'} shape and carries x in the l field).
    # The new level is bound ONCE through a 1-element list_transform
    # (`nl ->`): textually repeating the level expression inside the
    # struct makes DuckDB 1.0's list_reduce give a wrong second-
    # iteration result (single applications are fine — the repeated
    # subexpression is mis-shared across iterations; the EMA oracle
    # uses the same binding for the same reason, and a pytest pins the
    # fold against a plain-python reference).
    return f"""
SELECT user_id, n_points,
       ROUND(st.l + 1e-9, 4) AS level,
       ROUND(st.b + 1e-9, 4) AS trend,
       ROUND(st.l + {float(horizon)} * st.b + 1e-9, 4) AS forecast_{horizon}
FROM (
  SELECT CAST(user_id AS INTEGER) AS user_id,
         CAST(len(vals) AS BIGINT) AS n_points,
         CASE WHEN len(vals) < 2
         THEN {{'l': CAST(vals[1] AS DOUBLE), 'b': CAST(0.0 AS DOUBLE)}}
         ELSE list_reduce(
           list_prepend({{'l': CAST(vals[2] AS DOUBLE),
                          'b': CAST(vals[2] AS DOUBLE) - CAST(vals[1] AS DOUBLE)}},
                        list_transform(vals[3:], x -> {{'l': CAST(x AS DOUBLE), 'b': CAST(0.0 AS DOUBLE)}})),
           (acc, e) -> list_transform(
               [{alpha} * e.l + {1 - alpha} * (acc.l + acc.b)],
               nl -> {{'l': nl,
                       'b': {beta} * (nl - acc.l) + {1 - beta} * acc.b}})[1]
         ) END AS st
  FROM (
    SELECT user_id, list(value ORDER BY ts, event_id) AS vals
    FROM events GROUP BY user_id
  )
)
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Mode (most frequent value) per group, deterministic tie-break
# ---------------------------------------------------------------------------


def mode_per_group(events: DataFrame) -> DataFrame:
    """Most frequent event_type per user (ties → lexicographically
    smallest type).

    groupBy(user, type) partial-aggregates map-side, so the shuffle
    carries at most |users|×|types| rows; the argmax window then runs
    on that already-reduced relation, partitioned by user — never a
    global sort."""
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("user_id").cast("int").alias("user_id"),
            F.col("event_type").alias("mode_event_type"),
            F.col("cnt").alias("mode_count"),
        )
        .orderBy("user_id")
    )


MODE_SQL = """
SELECT CAST(user_id AS INTEGER) AS user_id,
       event_type AS mode_event_type,
       cnt AS mode_count
FROM (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type ASC) AS rn
  FROM events GROUP BY user_id, event_type
)
WHERE rn = 1
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# PSI distribution drift (population stability index between two periods)
# ---------------------------------------------------------------------------


def psi_drift(
    events: DataFrame,
    split_ts: str = "2024-01-16",
    lo: float = 0.0,
    hi: float = 500.0,
    nbins: int = 10,
    eps: float = 1e-4,
) -> DataFrame:
    """Per-event-type PSI between the periods before/after ``split_ts``
    (the ML-ops drift gate: PSI < 0.1 stable, > 0.25 shifted).

    Everything is groupBy arithmetic over fixed bins — no sort, no
    window, no quantile pass — so it runs at any scale in two
    map-side-combined aggregations (one per grain) plus a tiny
    |types|×|bins| join. ε-smoothing keeps empty bins finite."""
    width = (hi - lo) / nbins
    bin_id = F.least(
        F.greatest(F.floor((F.col("value") - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(nbins - 1),
    ).cast("int")
    period = (F.col("ts") >= split_ts).cast("int")
    binned = events.select(
        "event_type", bin_id.alias("bin_id"), period.alias("period")
    )
    cell = binned.groupBy("event_type", "bin_id").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0)).alias("__a"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("__b"),
    )
    tot = cell.groupBy("event_type").agg(
        F.sum("__a").alias("__ta"), F.sum("__b").alias("__tb")
    ).withColumnRenamed("event_type", "__et")
    joined = cell.join(F.broadcast(tot), cell.event_type == F.col("__et"))
    p = F.col("__a") / F.col("__ta") + F.lit(eps)
    q = F.col("__b") / F.col("__tb") + F.lit(eps)
    term = (p - q) * F.log(p / q)
    return (
        joined.groupBy("event_type")
        .agg(r4(F.sum(term)).alias("psi"), F.count(F.lit(1)).cast("bigint").alias("n_bins"))
        .orderBy("event_type")
    )


def psi_sql(
    split_ts: str = "2024-01-16",
    lo: float = 0.0,
    hi: float = 500.0,
    nbins: int = 10,
    eps: float = 1e-4,
) -> str:
    width = (hi - lo) / nbins
    return f"""
WITH cell AS (
  SELECT event_type,
         CAST(LEAST(GREATEST(FLOOR((value - {lo}) / {width}), 0), {nbins - 1}) AS INTEGER)
           AS bin_id,
         SUM(CASE WHEN ts >= TIMESTAMP '{split_ts} 00:00:00' THEN 0 ELSE 1 END) AS a,
         SUM(CASE WHEN ts >= TIMESTAMP '{split_ts} 00:00:00' THEN 1 ELSE 0 END) AS b
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type, SUM(a) AS ta, SUM(b) AS tb FROM cell GROUP BY 1
)
SELECT cell.event_type,
       ROUND(SUM((a / ta + {eps} - b / tb - {eps}) * ln((a / ta + {eps}) / (b / tb + {eps})))
             + 1e-9, 4) AS psi,
       CAST(COUNT(*) AS BIGINT) AS n_bins
FROM cell JOIN tot ON cell.event_type = tot.event_type
GROUP BY cell.event_type
ORDER BY cell.event_type
"""


# ---------------------------------------------------------------------------
# Deterministic per-group N-sample (hash-ordered, no RNG)
# ---------------------------------------------------------------------------


def sample_n_per_group(events: DataFrame, n: int = 10) -> DataFrame:
    """Uniform-ish ``n`` rows per user, deterministic across reruns:
    order by md5(event_id) within each user and keep the first ``n``.

    The hash order is independent of time/value (so the sample is not
    biased by either) and reproducible without RNG state. One window
    shuffle on user_id; the hash is computed map-side."""
    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")).asc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .select(
            F.col("user_id").cast("int").alias("user_id"),
            "event_id",
            F.col("__rn").cast("int").alias("sample_rank"),
        )
        .orderBy("user_id", "sample_rank")
    )


def sample_n_sql(n: int = 10) -> str:
    return f"""
SELECT CAST(user_id AS INTEGER) AS user_id, event_id,
       CAST(rn AS INTEGER) AS sample_rank
FROM (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY md5(CAST(event_id AS VARCHAR)) ASC, event_id ASC) AS rn
  FROM events
)
WHERE rn <= {n}
ORDER BY user_id, sample_rank
"""


# ---------------------------------------------------------------------------
# Hour x day-of-week activity heatmap
# ---------------------------------------------------------------------------


def hour_dow_heatmap(events: DataFrame) -> DataFrame:
    """The dashboard heatmap relation: activity count + mean value per
    (hour-of-day, day-of-week) cell — a 24x7-row output from one
    partial-agg groupBy regardless of input size."""
    return (
        events.groupBy(
            F.hour("ts").cast("int").alias("hour"),
            F.dayofweek("ts").cast("int").alias("dow"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            r4(F.avg("value")).alias("avg_value"),
        )
        .orderBy("hour", "dow")
    )


HEATMAP_SQL = """
SELECT CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
       CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(value) + 1e-9, 4) AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY hour, dow
"""


# ---------------------------------------------------------------------------
# Top-N with OTHER rollup (BI "top 5 + everything else" chart relation)
# ---------------------------------------------------------------------------


def topn_with_others(events: DataFrame, n: int = 3) -> DataFrame:
    """Per-event-type revenue leaders: top-``n`` users by summed value
    plus one OTHER row aggregating the remainder.

    groupBy reduces to |types|x|users| first; ranking windows run on
    that reduced relation partitioned by type; the OTHER rollup is a
    second tiny aggregate over the ranked rows — no extra fact scan."""
    per_user = events.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast(DEC)).alias("__v")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("__v").desc(), F.col("user_id").asc()
    )
    ranked = per_user.withColumn("__rn", F.row_number().over(w))
    labeled = ranked.select(
        "event_type",
        F.when(F.col("__rn") <= n, F.col("user_id").cast("string"))
        .otherwise(F.lit("OTHER"))
        .alias("who"),
        F.when(F.col("__rn") <= n, F.col("__rn")).otherwise(F.lit(n + 1))
        .cast("int")
        .alias("rank"),
        "__v",
    )
    return (
        labeled.groupBy("event_type", "who", "rank")
        .agg(
            r4(F.sum("__v").cast("double")).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )
        .orderBy("event_type", "rank", "who")
    )


def topn_others_sql(n: int = 3) -> str:
    return f"""
WITH per_user AS (
  SELECT event_type, user_id, SUM(CAST(value AS DECIMAL(18,2))) AS v
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT event_type, user_id, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v DESC, user_id ASC) AS rn
  FROM per_user
)
SELECT event_type,
       CASE WHEN rn <= {n} THEN CAST(user_id AS VARCHAR) ELSE 'OTHER' END AS who,
       CAST(CASE WHEN rn <= {n} THEN rn ELSE {n + 1} END AS INTEGER) AS rank,
       ROUND(CAST(SUM(v) AS DOUBLE) + 1e-9, 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ranked
GROUP BY 1, 2, 3
ORDER BY event_type, rank, who
"""


# ---------------------------------------------------------------------------
# Share-of-total (percent contribution within group, window ratio)
# ---------------------------------------------------------------------------


def share_of_total(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Each nation's share of its region... trimmed to the testdata
    shape: per customer-nation, total order value and its share of the
    grand total plus rank — the percent-of-total window family
    (sum over unbounded partition) on a pre-reduced |nations| relation."""
    cust = customer.select("c_custkey", "c_nationkey")
    per_nation = (
        orders.select("o_custkey", F.col("o_totalprice").cast(DEC).alias("__p"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy(F.col("c_nationkey").cast("int").alias("nationkey"))
        .agg(F.sum("__p").alias("__total"))
    )
    named = per_nation.join(
        F.broadcast(nation.select(F.col("n_nationkey").cast("int").alias("nationkey"), "n_name")),
        "nationkey",
    )
    w_all = Window.partitionBy()
    return named.select(
        "nationkey",
        "n_name",
        F.col("__total").cast("double").alias("revenue"),
        r4(
            F.col("__total").cast("double")
            / F.sum(F.col("__total").cast("double")).over(w_all)
            * 100.0
        ).alias("pct_of_total"),
        F.row_number()
        .over(Window.orderBy(F.col("__total").desc(), F.col("nationkey").asc()))
        .cast("int")
        .alias("rank"),
    ).orderBy("rank")


SHARE_SQL = """
WITH per_nation AS (
  SELECT CAST(c.c_nationkey AS INTEGER) AS nationkey,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS total
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT p.nationkey, n.n_name,
       CAST(p.total AS DOUBLE) AS revenue,
       ROUND(CAST(p.total AS DOUBLE) / SUM(CAST(p.total AS DOUBLE)) OVER () * 100.0
             + 1e-9, 4) AS pct_of_total,
       CAST(ROW_NUMBER() OVER (ORDER BY p.total DESC, p.nationkey ASC) AS INTEGER) AS rank
FROM per_nation p JOIN nation n ON n.n_nationkey = p.nationkey
ORDER BY rank
"""


def seasonal_anomaly(events: DataFrame, z_thresh: float = 3.0) -> DataFrame:
    """Seasonality-aware anomaly detection: the baseline is the
    (event_type, day-of-week, hour) cell mean/stddev — the simplest
    profile that removes both daily and weekly cycles — and an event is
    anomalous when its |z| against its own cell exceeds ``z_thresh``.

    Shape: one groupBy builds the |types|x7x24 baseline (tiny), which
    broadcast-joins back onto the stream; the z computation is a narrow
    projection. This is the distributed form of the reference's
    mean±k·sigma outlier rule (dag:207-215), seasonality-adjusted.
    Cells with a single row (stddev NULL) or zero variance never flag.
    """
    keyed = events.select(
        "event_id",
        "event_type",
        "value",
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    )
    base = keyed.groupBy("event_type", "dow", "hr").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count(F.lit(1)).alias("n_cell"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        keyed.join(F.broadcast(base), ["event_type", "dow", "hr"])
        .filter(
            F.col("sigma").isNotNull()
            & (F.col("sigma") > 0)
            & (F.round(F.abs(z) + F.lit(1e-9), 4) > z_thresh)
        )
        .select(
            "event_id",
            "event_type",
            "dow",
            "hr",
            r4(F.col("value")).alias("value"),
            r4(F.col("mu")).alias("cell_mean"),
            r4(z).alias("z"),
        )
    )


def seasonal_anomaly_sql(z_thresh: float = 3.0) -> str:
    return f"""
    WITH keyed AS (
      SELECT event_id, event_type, value,
             CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
             CAST(hour(ts) AS INTEGER) AS hr
      FROM events
    ), base AS (
      SELECT event_type, dow, hr, AVG(value) AS mu,
             stddev_samp(value) AS sigma, COUNT(*) AS n_cell
      FROM keyed GROUP BY 1, 2, 3
    )
    SELECT k.event_id, k.event_type, k.dow, k.hr,
           ROUND(k.value + 1e-9, 4) AS value,
           ROUND(b.mu + 1e-9, 4) AS cell_mean,
           ROUND((k.value - b.mu) / b.sigma + 1e-9, 4) AS z
    FROM keyed k JOIN base b
      ON k.event_type = b.event_type AND k.dow = b.dow AND k.hr = b.hr
    WHERE b.sigma IS NOT NULL AND b.sigma > 0
      AND ROUND(abs((k.value - b.mu) / b.sigma) + 1e-9, 4) > {z_thresh}
    """


# ---------------------------------------------------------------------------
# Robust (median/MAD) outliers
# ---------------------------------------------------------------------------


def mad_outliers(events: DataFrame, k: float = 3.5) -> DataFrame:
    """Robust per-``event_type`` outliers via the modified z-score:
    |x − median| > k · 1.4826 · MAD (MAD = median absolute deviation).
    Unlike the mean/stddev z-score (etl_outlier_iqr's cousin), a single
    extreme reading cannot drag the threshold — the 50% breakdown point
    is the reason fleet telemetry pipelines prefer MAD.

    Plan: two exact-percentile aggregates over the fact (median, then
    MAD of the residuals) — each map-side partially aggregated to one
    sketch row per (type, partition) — with the tiny per-type results
    broadcast back. The fact never shuffles; both joins are map-side.
    Thresholds are r4-rounded on BOTH engines before the comparison so
    an ulp of aggregate nondeterminism cannot flip a boundary row.
    """
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    with_med = events.join(F.broadcast(med), "event_type")
    mad = (
        with_med.groupBy("event_type")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    scored = with_med.join(F.broadcast(mad), "event_type").withColumn(
        "rz",
        F.round(
            F.abs(F.col("value") - F.col("med"))
            / F.greatest(F.lit(1.4826) * F.col("mad"), F.lit(1e-9))
            + F.lit(1e-9),
            4,
        ),
    )
    return (
        scored.filter(F.col("rz") > k)
        .select(
            "event_id",
            "event_type",
            "value",
            r4(F.col("med")).alias("type_median"),
            r4(F.col("mad")).alias("type_mad"),
            F.col("rz").alias("robust_z"),
        )
    )


def mad_outliers_sql(k: float = 3.5) -> str:
    return f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ), mad AS (
      SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY 1
    ), scored AS (
      SELECT e.event_id, e.event_type, e.value, m.med, d.mad,
             ROUND(abs(e.value - m.med)
                   / GREATEST(1.4826 * d.mad, 1e-9) + 1e-9, 4) AS rz
      FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
    )
    SELECT event_id, event_type, value,
           ROUND(med + 1e-9, 4) AS type_median,
           ROUND(mad + 1e-9, 4) AS type_mad,
           rz AS robust_z
    FROM scored WHERE rz > {k}
    """


# ---------------------------------------------------------------------------
# CUSUM changepoint alarms
# ---------------------------------------------------------------------------


def cusum_alarms(events: DataFrame, slack: float = 0.5, h: float = 5.0) -> DataFrame:
    """One-sided CUSUM drift alarms per user: S_i = max(0, S_{i−1} +
    (x_i − target − slack)) crossing ``h`` flags a sustained upward
    shift (a sensor drifting hot) that per-point outlier tests miss.

    The recursive definition has a closed form over prefix sums —
    S_i = cs_i − min_{j≤i}(cs_j) with cs the running sum of deviations —
    so the whole operator is ONE window pass (two window functions over
    the same (user, ts) frame, one shuffle), instead of an iterative
    loop. The window order includes event_id so the sequential FP
    summation order — hence the bitwise result — is identical across
    engines; the target is the r4-rounded per-user mean on BOTH sides.
    """
    target = events.groupBy("user_id").agg(r4(F.avg("value")).alias("target"))
    dev = events.join(F.broadcast(target), "user_id").withColumn(
        "d", F.col("value") - F.col("target") - F.lit(slack)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = dev.withColumn("cs", F.sum("d").over(w)).withColumn(
        "s", F.col("cs") - F.least(F.min("cs").over(w), F.lit(0.0))
    )
    return (
        run.withColumn("s", F.round(F.col("s") + F.lit(1e-9), 4))
        .filter(F.col("s") > h)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "value",
            F.col("s").alias("cusum"),
        )
    )


def cusum_alarms_sql(slack: float = 0.5, h: float = 5.0) -> str:
    return f"""
    WITH target AS (
      SELECT user_id, ROUND(AVG(value) + 1e-9, 4) AS target
      FROM events GROUP BY 1
    ), dev AS (
      SELECT e.user_id, e.event_id, e.ts, e.value,
             e.value - t.target - {slack} AS d
      FROM events e JOIN target t USING (user_id)
    ), cs AS (
      SELECT user_id, event_id, ts, value,
             SUM(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS cs
      FROM dev
    ), run AS (
      SELECT user_id, event_id, ts, value, cs,
             LEAST(MIN(cs) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING), 0.0) AS mn
      FROM cs
    )
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
           ROUND(cs - mn + 1e-9, 4) AS cusum
    FROM run WHERE ROUND(cs - mn + 1e-9, 4) > {h}
    """


# ---------------------------------------------------------------------------
# Welch two-sample t-test (A/B readout)
# ---------------------------------------------------------------------------


def ab_welch_t(events: DataFrame, buckets: int = 2) -> DataFrame:
    """Per-event-type A/B readout: users hash-split into two arms
    (md5 parity — deterministic, no RNG, the same assignment every
    engine/run), then Welch's unequal-variance t statistic and
    Satterthwaite degrees of freedom over ``value``.

    One map-side-combined aggregate per (event_type, arm) — the fact
    never shuffles more than the tiny stats relation; the arm pivot is
    a self-join of two 5-row relations. Welch, not Student: arm
    variances genuinely differ under any real treatment, and pooling
    would understate the error.
    """
    arm = (
        F.expr(
            "pmod(cast(conv(substr(md5(cast(user_id as string)), 1, 15), 16, 10) "
            f"as bigint), {buckets})"
        )
        == 0
    )
    stats = (
        events.withColumn("arm", F.when(arm, F.lit("a")).otherwise(F.lit("b")))
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    a = stats.filter(F.col("arm") == "a").select(
        "event_type",
        F.col("n").alias("na"),
        F.col("m").alias("ma"),
        F.col("v").alias("va"),
    )
    b = stats.filter(F.col("arm") == "b").select(
        "event_type",
        F.col("n").alias("nb"),
        F.col("m").alias("mb"),
        F.col("v").alias("vb"),
    )
    j = a.join(b, "event_type")
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    dof = (se2 * se2) / (
        (F.col("va") / F.col("na")) * (F.col("va") / F.col("na")) / (F.col("na") - 1)
        + (F.col("vb") / F.col("nb")) * (F.col("vb") / F.col("nb")) / (F.col("nb") - 1)
    )
    return j.select(
        "event_type",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        r4(F.col("ma")).alias("mean_a"),
        r4(F.col("mb")).alias("mean_b"),
        r4((F.col("ma") - F.col("mb")) / F.sqrt(se2)).alias("t_stat"),
        r4(dof).alias("welch_df"),
    )


def ab_welch_t_sql(buckets: int = 2) -> str:
    return f"""
    WITH armed AS (
      SELECT event_type, value,
             CASE WHEN (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                        % {buckets}) = 0 THEN 'a' ELSE 'b' END AS arm
      FROM events
    ), stats AS (
      SELECT event_type, arm, CAST(COUNT(*) AS DOUBLE) AS n,
             AVG(value) AS m, VAR_SAMP(value) AS v
      FROM armed GROUP BY 1, 2
    )
    SELECT a.event_type,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           ROUND(a.m + 1e-9, 4) AS mean_a,
           ROUND(b.m + 1e-9, 4) AS mean_b,
           ROUND((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n) + 1e-9, 4) AS t_stat,
           ROUND(pow(a.v / a.n + b.v / b.n, 2)
                 / (pow(a.v / a.n, 2) / (a.n - 1) + pow(b.v / b.n, 2) / (b.n - 1))
                 + 1e-9, 4) AS welch_df
    FROM stats a JOIN stats b ON a.event_type = b.event_type
    WHERE a.arm = 'a' AND b.arm = 'b'
    """


# ---------------------------------------------------------------------------
# Exponentially-decayed counts (recency-weighted popularity)
# ---------------------------------------------------------------------------


def decayed_counts(events: DataFrame, half_life_days: float = 7.0) -> DataFrame:
    """Recency-weighted activity per event type: each event contributes
    2^(−age/half_life), so a week-old event counts half as much as a
    fresh one — the standard trending/popularity scoring that a plain
    count cannot express and a window cannot bound.

    Deterministic anchor: "now" is the corpus's max timestamp (a 1-row
    broadcast, the scalar pattern) — no wall clock, so results are
    reproducible across runs and engines. One map-side-combined
    aggregate; the exp sum's FP order is absorbed by r4.
    """
    anchor = events.agg(F.max("ts").alias("anchor"))
    aged = events.crossJoin(F.broadcast(anchor)).withColumn(
        "w",
        F.expr(
            f"pow(cast(0.5 as double), "
            f"(unix_micros(anchor) - unix_micros(ts)) / 86400.0e6 / {half_life_days})"
        ),
    )
    return (
        aged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            r4(F.sum("w")).alias("decayed_count"),
        )
        .orderBy("event_type")
    )


def decayed_counts_sql(half_life_days: float = 7.0) -> str:
    return f"""
    WITH anchor AS (SELECT MAX(ts) AS anchor FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(pow(CAST(0.5 AS DOUBLE),
                         (epoch_us(anchor.anchor) - epoch_us(ts)) / 86400.0e6
                         / {half_life_days})) + 1e-9, 4) AS decayed_count
    FROM events CROSS JOIN anchor
    GROUP BY event_type
    ORDER BY event_type
    """


# ---------------------------------------------------------------------------
# Daily percentile bands (p50/p95 trend)
# ---------------------------------------------------------------------------


def daily_percentile_bands(events: DataFrame) -> DataFrame:
    """Per-(event_type, day) exact p50/p95 bands — the fleet-health
    trend view (median tracks the regime, p95 tracks the tail; their
    divergence is the capacity signal). One map-side-combined aggregate;
    both engines use the same linear-interpolation percentile."""
    return (
        events.groupBy(
            "event_type", F.to_date("ts").cast("string").alias("date")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            r4(F.expr("percentile(value, 0.5)")).alias("p50"),
            r4(F.expr("percentile(value, 0.95)")).alias("p95"),
        )
        .orderBy("event_type", "date")
    )


def daily_percentile_bands_sql() -> str:
    return """
    SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(value, 0.5) + 1e-9, 4) AS p50,
           ROUND(quantile_cont(value, 0.95) + 1e-9, 4) AS p95
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, date
    """


# ---------------------------------------------------------------------------
# #24h Pareto frontier (skyline)
# ---------------------------------------------------------------------------


def skyline_prune_batch(pdf, min_col: str, max_col: str):
    """Phase-1 conservative skyline prune over one pandas batch: drop a
    row iff some other row in the SAME batch strictly dominates it
    (sort by (min asc, max desc); a row whose strict running max of
    ``max_col`` over preceding rows exceeds its own is dominated).
    Sound by construction — property-tested against the quadratic
    dominance definition in tests/test_properties.py."""
    s = pdf.sort_values(
        [min_col, max_col], ascending=[True, False], kind="mergesort"
    )
    mx = s[max_col].to_numpy()
    prev = np.concatenate(([-np.inf], np.maximum.accumulate(mx)[:-1]))
    return s[prev <= mx]


def pareto_frontier(
    part: DataFrame,
    key_col: str = "p_partkey",
    min_col: str = "p_retailprice",
    max_col: str = "p_size",
) -> DataFrame:
    """2-D Pareto frontier (skyline): parts no other part beats on BOTH
    axes (lower ``min_col`` AND higher ``max_col``, strict on at least
    one) — the best-price-for-size shortlist query. Börzsönyi et al.'s
    SKYLINE OF operator (ICDE'01), expressed as two phases so it never
    goes all-pairs:

    1. **Local conservative prune** (narrow — truly no shuffle: an
       Arrow-batched ``mapInPandas`` pass, one sort per ~10k-row batch):
       within each batch, sort by (min asc, max desc) and drop any row
       whose running strict max of ``max_col`` over preceding rows
       exceeds its own — such a row is dominated by a same-batch row,
       hence dominated globally, so dropping it is always sound.
       For independently-distributed dims the survivors per batch are
       ~O(log batch) in expectation.
    2. **Exact global check** over the tiny pruned relation: a row is
       dominated iff max(max_col) over rows with min_col <= its own
       exceeds its max_col, OR some row with the SAME max_col has a
       strictly lower min_col (the two cases cover strict-dominance
       with ties exactly). The range-frame window here is
       single-partition by design — it runs over phase-1 survivors, not
       the input.

    At 100 TB phase 1 is a narrow per-partition pass over the scan; the
    only shuffle carries the pruned candidate set."""
    proj = part.select(key_col, min_col, max_col)

    def _prune(pdfs):
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            yield skyline_prune_batch(pdf, min_col, max_col)

    local = proj.mapInPandas(_prune, schema=proj.schema)
    w_le = (
        Window.orderBy(F.col(min_col))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_eq = Window.partitionBy(F.col(max_col))
    return (
        local.withColumn("__maxle", F.max(max_col).over(w_le))
        .withColumn("__minpeq", F.min(min_col).over(w_eq))
        .filter(
            (F.col("__maxle") <= F.col(max_col))
            & (F.col("__minpeq") >= F.col(min_col))
        )
        .select(key_col, min_col, max_col)
    )


def pareto_frontier_sql(
    table: str = "part",
    key_col: str = "p_partkey",
    min_col: str = "p_retailprice",
    max_col: str = "p_size",
) -> str:
    # naive quadratic NOT EXISTS — the textbook skyline definition,
    # proving the two-phase pruning drops nothing
    return f"""
    SELECT p.{key_col}, p.{min_col}, p.{max_col}
    FROM {table} p
    WHERE NOT EXISTS (
      SELECT 1 FROM {table} q
      WHERE q.{min_col} <= p.{min_col} AND q.{max_col} >= p.{max_col}
        AND (q.{min_col} < p.{min_col} OR q.{max_col} > p.{max_col})
    )
    """


# ---------------------------------------------------------------------------
# #23r per-user ML feature matrix
# ---------------------------------------------------------------------------


def user_feature_matrix(events: DataFrame) -> DataFrame:
    """Point-in-time ML feature matrix per user — the feature-store
    materialization every churn/propensity model trains on: recency
    ("days since last event"), frequency at two horizons (7 d / 30 d
    event counts), monetary (30 d value sum), breadth (30 d distinct
    event types), and lifetime volume, all relative to a deterministic
    max-ts anchor (the scalar-broadcast pattern — no wall clock, so the
    matrix is reproducible).

    Plan: ONE map-side-combined groupBy over the fact with conditional
    aggregates — horizons are CASE-gated sums, not separate scans or
    self-joins; the count-distinct rides the same Expand pass. At
    100 TB this is exactly one fact shuffle carrying |users| rows."""
    anchor = events.agg(F.max("ts").alias("__anchor"))
    age_days = F.expr("(unix_micros(__anchor) - unix_micros(ts)) / 86400.0e6")
    in7, in30 = age_days <= 7.0, age_days <= 30.0
    return (
        events.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(in7.cast("bigint")).cast("bigint").alias("n_7d"),
            F.sum(in30.cast("bigint")).cast("bigint").alias("n_30d"),
            r4(F.sum(F.when(in30, F.col("value")).otherwise(F.lit(0.0)))).alias(
                "value_30d"
            ),
            F.count_distinct(F.when(in30, F.col("event_type")))
            .cast("bigint")
            .alias("types_30d"),
            r4(F.min(age_days)).alias("days_since_last"),
        )
        .orderBy("user_id")
    )


def user_feature_matrix_sql() -> str:
    age = "(epoch_us((SELECT MAX(ts) FROM events)) - epoch_us(ts)) / 86400.0e6"
    return f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN {age} <= 7.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_7d,
           CAST(SUM(CASE WHEN {age} <= 30.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_30d,
           ROUND(SUM(CASE WHEN {age} <= 30.0 THEN value ELSE 0.0 END) + 1e-9, 4)
             AS value_30d,
           CAST(COUNT(DISTINCT CASE WHEN {age} <= 30.0 THEN event_type END) AS BIGINT)
             AS types_30d,
           ROUND(MIN({age}) + 1e-9, 4) AS days_since_last
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """


# ---------------------------------------------------------------------------
# #31j open-order backlog time series (event-sourcing cumulative balance)
# ---------------------------------------------------------------------------


def open_order_backlog(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Daily backlog of open orders: an order opens on ``o_orderdate``
    and closes on its LAST line shipment (max ``l_shipdate``); backlog
    on day d = cumulative opens − cumulative closes through d. The
    open-balance series every fulfilment/ops dashboard carries, and the
    canonical event-sourcing fold (balance = Σ credits − Σ debits).

    Plan: the one table-sized step is the per-order max-shipdate
    aggregate (map-side combined, shuffles distinct orderkeys); both
    daily count series then live at calendar grain (thousands of rows
    at ANY corpus size), so the full-outer date align and the running-
    sum window — a single-partition window, bounded by the calendar,
    documented like dash_kpis' 1-row crossJoin — cost nothing. At
    100 TB the only knob that matters is the orderkey aggregate, which
    AQE sizes like any other groupBy.
    """
    opens = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_opened")
    )
    closes = (
        lineitem.groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("close_d"))
        .groupBy(F.col("close_d").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_closed"))
    )
    cal = opens.join(closes, on="d", how="full_outer").select(
        "d",
        F.coalesce("n_opened", F.lit(0)).cast("bigint").alias("n_opened"),
        F.coalesce("n_closed", F.lit(0)).cast("bigint").alias("n_closed"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return cal.select(
        F.col("d").cast("string").alias("date"),
        "n_opened",
        "n_closed",
        (F.sum("n_opened").over(w) - F.sum("n_closed").over(w))
        .cast("bigint")
        .alias("backlog"),
    )


def open_order_backlog_sql() -> str:
    return """
    WITH closes_per_order AS (
      SELECT l_orderkey, CAST(MAX(l_shipdate) AS DATE) AS close_d
      FROM lineitem GROUP BY 1
    ), closes AS (
      SELECT close_d AS d, COUNT(*) AS n_closed FROM closes_per_order GROUP BY 1
    ), opens AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_opened
      FROM orders GROUP BY 1
    ), cal AS (
      SELECT COALESCE(o.d, c.d) AS d,
             CAST(COALESCE(o.n_opened, 0) AS BIGINT) AS n_opened,
             CAST(COALESCE(c.n_closed, 0) AS BIGINT) AS n_closed
      FROM opens o FULL OUTER JOIN closes c ON o.d = c.d
    )
    SELECT CAST(d AS VARCHAR) AS date, n_opened, n_closed,
           CAST(SUM(n_opened) OVER w - SUM(n_closed) OVER w AS BIGINT) AS backlog
    FROM cal
    WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


# ---------------------------------------------------------------------------
# Concentration (Gini / Lorenz) per group
# ---------------------------------------------------------------------------


def gini_by_group(
    df: DataFrame,
    group_col: str,
    unit_col: str,
    amount_col: str,
) -> DataFrame:
    """Gini concentration coefficient of ``amount_col`` over units
    (customers, suppliers, domains) WITHIN each group — "how unequal is
    revenue across customers in each nation", the standard market- and
    corpus-concentration readout (a Gini near 1 on tokens-per-domain is
    the signal to cap domains before training).

    Uses the rank formula on ascending amounts:
    ``G = 2·Σ(i·xᵢ) / (n·Σxᵢ) − (n+1)/n`` with deterministic
    (amount, unit) ordering so ties rank identically on any engine.

    Plan: the table-sized step is the per-unit amount aggregate
    (map-side combined). The rank window then runs per GROUP over
    unit-grain rows — at 100 TB with few groups that window is the
    bottleneck; swap the exact rank for a fixed-bin Lorenz histogram
    (same formula over bin midpoints) to make it partial-aggregable;
    the exact form here is the oracle-checkable contract.
    """
    per_unit = df.groupBy(
        F.col(group_col).alias("grp"), F.col(unit_col).alias("unit")
    ).agg(F.sum(F.col(amount_col).cast(DEC)).cast(DEC).alias("amt"))
    w = Window.partitionBy("grp").orderBy(F.col("amt").asc(), F.col("unit").asc())
    ranked = per_unit.select(
        "grp", "amt", F.row_number().over(w).cast("bigint").alias("i")
    )
    return (
        ranked.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_units"),
            F.sum("amt").cast(DEC).alias("total_amount"),
            F.sum(F.col("i") * F.col("amt").cast("double")).alias("__iw"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_units",
            F.col("total_amount").cast("double").alias("total_amount"),
            r4(
                F.lit(2.0) * F.col("__iw")
                / (F.col("n_units") * F.col("total_amount").cast("double"))
                - (F.col("n_units") + F.lit(1.0)) / F.col("n_units")
            ).alias("gini"),
        )
    )


def gini_by_group_sql(
    table: str, group_col: str, unit_col: str, amount_col: str
) -> str:
    return f"""
    WITH per_unit AS (
      SELECT {group_col} AS grp, {unit_col} AS unit,
             CAST(SUM(CAST({amount_col} AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS amt
      FROM {table} GROUP BY 1, 2
    ), ranked AS (
      SELECT grp, amt,
             CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY amt, unit)
                  AS BIGINT) AS i
      FROM per_unit
    )
    SELECT grp AS {group_col},
           CAST(COUNT(*) AS BIGINT) AS n_units,
           CAST(CAST(SUM(amt) AS DECIMAL(18,2)) AS DOUBLE) AS total_amount,
           ROUND(2.0 * SUM(i * CAST(amt AS DOUBLE))
                   / (COUNT(*) * CAST(CAST(SUM(amt) AS DECIMAL(18,2)) AS DOUBLE))
                 - (COUNT(*) + 1.0) / COUNT(*) + 1e-9, 4) AS gini
    FROM ranked GROUP BY 1
    """


def gini_by_group_hist(
    df: DataFrame,
    group_col: str,
    unit_col: str,
    amount_col: str,
    bins: int = 256,
) -> DataFrame:
    """Fixed-bin Lorenz-histogram Gini — the 100 TB path promised by
    :func:`gini_by_group`'s docstring, now as code (VERDICT r8 #5 /
    ADVICE). Same readout, different plan: instead of an exact rank
    window over UNIT-grain rows (at scale, millions of customers per
    nation through one window per group), amounts land in ``bins``
    fixed-width buckets per group and the rank formula is applied
    bin-wise under the units-within-a-bin-are-equal assumption:

        Σ(i·xᵢ) over a bin with all values x̄_b collapses to
        x̄_b·(C_b·n_b + n_b(n_b+1)/2)  with C_b = units in lower bins,

    so ``G = 2·Σ_b [s_b·C_b + s_b(n_b+1)/2] / (n·T) − (n+1)/n`` with
    s_b = bin amount sum. Error is bounded by within-bin dispersion —
    ≲ 1/bins of the amount range.

    Plan: two map-side-combined aggregates over unit-grain rows (the
    per-unit sum, then the per-(group,bin) histogram), a broadcast of
    the one-row-per-group min/max, and a window over ≤ ``bins`` rows
    per group — every table-sized step is partial-aggregable; nothing
    unit-grain is ever sorted or windowed. Deterministic (no sketch),
    so the DuckDB twin hash-matches exactly.
    """
    b = float(bins)
    per_unit = df.groupBy(
        F.col(group_col).alias("grp"), F.col(unit_col).alias("unit")
    ).agg(F.sum(F.col(amount_col).cast(DEC)).cast(DEC).alias("amt"))
    # two consumers (per-group min/max stats, then binning) — checkpoint
    # so the per-unit aggregate's lineage compiles and runs once, not
    # per consumer (same multi-consumer discipline as unigram_logprob)
    per_unit = per_unit.select(
        "grp", F.col("amt").cast("double").alias("amt")
    ).localCheckpoint(eager=False)
    stats = per_unit.groupBy("grp").agg(
        F.min("amt").alias("__mn"), F.max("amt").alias("__mx")
    )
    width = F.when(
        F.col("__mx") > F.col("__mn"), (F.col("__mx") - F.col("__mn")) / F.lit(b)
    ).otherwise(F.lit(1.0))
    binned = per_unit.join(F.broadcast(stats), "grp").select(
        "grp",
        "amt",
        F.least(
            F.lit(int(b) - 1),
            F.greatest(
                F.lit(0), F.floor((F.col("amt") - F.col("__mn")) / width)
            ),
        ).cast("bigint").alias("b"),
    )
    hist = binned.groupBy("grp", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("amt").alias("s_b"),
    )
    w = Window.partitionBy("grp").orderBy("b")
    cum = hist.select(
        "grp",
        "n_b",
        "s_b",
        (F.sum("n_b").over(w) - F.col("n_b")).alias("c_b"),
    )
    contrib = F.col("s_b") * F.col("c_b") + F.col("s_b") * (F.col("n_b") + 1) / 2.0
    return (
        cum.groupBy("grp")
        .agg(
            F.sum("n_b").cast("bigint").alias("n_units"),
            F.sum("s_b").alias("__T"),
            F.sum(contrib).alias("__iw"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_units",
            r4(F.col("__T")).alias("total_amount"),
            r4(
                F.lit(2.0) * F.col("__iw") / (F.col("n_units") * F.col("__T"))
                - (F.col("n_units") + F.lit(1.0)) / F.col("n_units")
            ).alias("gini"),
        )
    )


def gini_by_group_hist_sql(
    table: str, group_col: str, unit_col: str, amount_col: str, bins: int = 256
) -> str:
    b = float(bins)
    return f"""
    WITH per_unit AS (
      SELECT {group_col} AS grp,
             CAST(CAST(SUM(CAST({amount_col} AS DECIMAL(18,2)))
                       AS DECIMAL(18,2)) AS DOUBLE) AS amt
      FROM {table} GROUP BY {group_col}, {unit_col}
    ), stats AS (
      SELECT grp, MIN(amt) AS mn, MAX(amt) AS mx FROM per_unit GROUP BY 1
    ), binned AS (
      SELECT p.grp, p.amt,
             CAST(LEAST({int(b) - 1}, GREATEST(0, FLOOR(
               (p.amt - s.mn) /
               (CASE WHEN s.mx > s.mn THEN (s.mx - s.mn) / {b} ELSE 1.0 END)
             ))) AS BIGINT) AS b
      FROM per_unit p JOIN stats s USING (grp)
    ), hist AS (
      SELECT grp, b, CAST(COUNT(*) AS BIGINT) AS n_b, SUM(amt) AS s_b
      FROM binned GROUP BY 1, 2
    ), cum AS (
      SELECT grp, n_b, s_b,
             SUM(n_b) OVER (PARTITION BY grp ORDER BY b) - n_b AS c_b
      FROM hist
    )
    SELECT grp AS {group_col},
           CAST(SUM(n_b) AS BIGINT) AS n_units,
           ROUND(SUM(s_b) + 1e-9, 4) AS total_amount,
           ROUND(2.0 * SUM(s_b * c_b + s_b * (n_b + 1) / 2.0)
                   / (SUM(n_b) * SUM(s_b))
                 - (SUM(n_b) + 1.0) / SUM(n_b) + 1e-9, 4) AS gini
    FROM cum GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Seasonal decomposition (trend / seasonal / residual)
# ---------------------------------------------------------------------------


def seasonal_decompose(
    events: DataFrame,
    half_window: int = 12,
) -> DataFrame:
    """Classical additive decomposition of the per-type hourly series:
    ``trend`` = centered (2·half_window+1)-hour moving average,
    ``seasonal`` = per-(type, hour-of-day) mean of the detrended
    series, ``resid`` = what's left. The sanity readout behind every
    seasonal-anomaly rule (seasonal_anomaly flags against exactly this
    hour-of-day profile).

    Plan: ONE table-sized aggregate (to hourly grain, map-side
    combined); every window after it runs on the bounded hourly series
    (24·365·types rows per year regardless of SF), partitioned by type —
    series post-aggregation cost is calendar-bounded, so the operator
    stays scan-bound at 100 TB.
    """
    hourly = events.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.avg("value").alias("v"))
    w_trend = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-half_window, half_window)
    )
    with_trend = hourly.withColumn("trend", F.avg("v").over(w_trend)).withColumn(
        "det", F.col("v") - F.col("trend")
    )
    w_seas = Window.partitionBy("event_type", F.hour("hr"))
    out = with_trend.withColumn("seasonal", F.avg("det").over(w_seas))
    return out.select(
        "event_type",
        F.col("hr").cast("string").alias("hr"),
        r4(F.col("v")).alias("value"),
        r4(F.col("trend")).alias("trend"),
        r4(F.col("seasonal")).alias("seasonal"),
        r4(F.col("det") - F.col("seasonal")).alias("resid"),
    )


def seasonal_decompose_sql(half_window: int = 12) -> str:
    return f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, AVG(value) AS v
      FROM events GROUP BY 1, 2
    ), tr AS (
      SELECT *, AVG(v) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN {half_window} PRECEDING AND {half_window} FOLLOWING
             ) AS trend
      FROM hourly
    ), det AS (SELECT *, v - trend AS d FROM tr)
    SELECT event_type, CAST(hr AS VARCHAR) AS hr,
           ROUND(v + 1e-9, 4) AS value,
           ROUND(trend + 1e-9, 4) AS trend,
           ROUND(AVG(d) OVER (PARTITION BY event_type, HOUR(hr)) + 1e-9, 4)
             AS seasonal,
           ROUND(d - AVG(d) OVER (PARTITION BY event_type, HOUR(hr)) + 1e-9, 4)
             AS resid
    FROM det
    """
