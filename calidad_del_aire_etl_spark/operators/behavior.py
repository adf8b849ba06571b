"""Behavioral / product analytics: cohort retention, RFM segmentation,
event-transition matrix.

The warehouse queries every event-stream product team runs; each is
expressed as partial-aggregated groupBys (retention, transitions) or a
bounded window over a pre-reduced relation (RFM), so the shapes hold at
100 TB: the shuffles carry |users| or |cohorts|×|weeks| rows, never raw
events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import r4


# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week;
    for each later week, the share of the cohort still active.

    Two partial-agg passes over (user, week) — first-touch per user,
    then distinct user-weeks — joined on user (both sides already
    reduced to |users| and |user-weeks|). The output is
    |cohorts|×|weeks|, tiny at any scale."""
    uw = events.select(
        "user_id", F.weekofyear("ts").cast("int").alias("week")
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    active = (
        uw.join(first, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.count(F.lit(1)).cast("bigint").alias("active_users"))
    )
    return (
        active.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).cast("int").alias("weeks_since"),
            "active_users",
            "cohort_size",
            r4(F.col("active_users") / F.col("cohort_size")).alias("retention"),
        )
        .orderBy("cohort_week", "weeks_since")
    )


COHORT_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(weekofyear(ts) AS INTEGER) AS week FROM events
), first AS (
  SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
), sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM first GROUP BY 1
), active AS (
  SELECT f.cohort_week, u.week, CAST(COUNT(*) AS BIGINT) AS active_users
  FROM uw u JOIN first f ON u.user_id = f.user_id
  GROUP BY 1, 2
)
SELECT a.cohort_week,
       CAST(a.week - a.cohort_week AS INTEGER) AS weeks_since,
       a.active_users, s.cohort_size,
       ROUND(a.active_users / CAST(s.cohort_size AS DOUBLE) + 1e-9, 4) AS retention
FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week
ORDER BY a.cohort_week, weeks_since
"""


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------


def rfm_segments(events: DataFrame, purchase_type: str = "purchase") -> DataFrame:
    """Recency / Frequency / Monetary quartile scores per user over
    purchase events, plus the composite segment string ("444" = best).

    One groupBy reduces events to |users| rows; the three ntile windows
    then run over that reduced relation (global windows, but on a
    relation whose size is the USER count — at 100 TB events that's
    still ~10⁸ rows, so production would swap ntile for approx-quantile
    cut points; the quartile SEMANTICS are identical and this module
    keeps the exact form as the correctness baseline)."""
    per_user = (
        events.filter(F.col("event_type") == purchase_type)
        .groupBy(F.col("user_id").cast("int").alias("user_id"))
        .agg(
            F.max("ts").alias("__last"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("__mon"),
        )
    )
    # recency rank: later last-purchase = better (higher quartile)
    r_q = F.ntile(4).over(Window.orderBy(F.col("__last").asc(), F.col("user_id").asc()))
    f_q = F.ntile(4).over(Window.orderBy(F.col("frequency").asc(), F.col("user_id").asc()))
    m_q = F.ntile(4).over(Window.orderBy(F.col("__mon").asc(), F.col("user_id").asc()))
    scored = per_user.select(
        "user_id",
        F.col("__last").cast("date").cast("string").alias("last_purchase_day"),
        "frequency",
        F.col("__mon").cast("double").alias("monetary"),
        r_q.cast("int").alias("r_score"),
        f_q.cast("int").alias("f_score"),
        m_q.cast("int").alias("m_score"),
    )
    return scored.select(
        "*",
        F.concat_ws("", "r_score", "f_score", "m_score").alias("segment"),
    ).orderBy("user_id")


def rfm_sql(purchase_type: str = "purchase") -> str:
    return f"""
WITH per_user AS (
  SELECT CAST(user_id AS INTEGER) AS user_id,
         MAX(ts) AS last_ts,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         SUM(CAST(value AS DECIMAL(18,2))) AS mon
  FROM events WHERE event_type = '{purchase_type}' GROUP BY 1
), scored AS (
  SELECT user_id,
         CAST(CAST(last_ts AS DATE) AS VARCHAR) AS last_purchase_day,
         frequency, CAST(mon AS DOUBLE) AS monetary,
         CAST(NTILE(4) OVER (ORDER BY last_ts ASC, user_id ASC) AS INTEGER) AS r_score,
         CAST(NTILE(4) OVER (ORDER BY frequency ASC, user_id ASC) AS INTEGER) AS f_score,
         CAST(NTILE(4) OVER (ORDER BY mon ASC, user_id ASC) AS INTEGER) AS m_score
  FROM per_user
)
SELECT user_id, last_purchase_day, frequency, monetary, r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR)
         AS segment
FROM scored
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Event-transition (Markov) matrix
# ---------------------------------------------------------------------------


def transition_matrix(events: DataFrame) -> DataFrame:
    """First-order transition probabilities between consecutive event
    types per user: P(next = b | current = a).

    One window shuffle on user_id computes the lag pairs; the bigram
    count groupBy reduces to |types|² rows map-side. Row-normalization
    joins the tiny |types| marginal back — broadcast."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            r4(F.col("n") / F.col("__tot")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


TRANSITION_SQL = """
WITH pairs AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT c.from_type, c.to_type, c.n,
       ROUND(c.n / CAST(t.tot AS DOUBLE) + 1e-9, 4) AS p
FROM counts c
JOIN (SELECT from_type, SUM(n) AS tot FROM counts GROUP BY 1) t
  ON c.from_type = t.from_type
ORDER BY c.from_type, c.to_type
"""
