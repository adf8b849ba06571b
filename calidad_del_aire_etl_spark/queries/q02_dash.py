"""Dashboard analytics (SURVEY §2 #13-18) — registered queries, split out of registry.py
(round 10, VERDICT r9 #8: 3.9k lines had become the merge-conflict
magnet). PURELY MECHANICAL: bodies are byte-identical to the original
section; registration ORDER is load-bearing (the driver's external
50-key correctness window samples queries() in registration order), so
``registry`` imports these modules in the original section sequence and
each module preserves its section's internal order."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ..functions import (  # noqa: F401
    aqi_from_pm25,
    aqi_sql,
    quality_category,
    quality_category_sql,
    r4,
)
from ..operators import aggregates, cleaning, features  # noqa: F401
from ..registry import (  # noqa: F401
    _GAPPY_EVENTS_SQL,
    _gappy_events,
    load,
    register,
)

# ---------------------------------------------------------------------------
# Dashboard analytics (SURVEY §2 #13-18) — reference dashboard_calidad_aire.py
# ---------------------------------------------------------------------------

from ..operators import analytics  # noqa: E402

_EVENT_TYPES = ["purchase", "view", "click", "error", "signup"]


@register(
    "dash_kpis",
    analytics.kpis_sql("events", "ts", "user_id", "value", unhealthy_threshold=82.0),
)
def q_dash_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #13 — KPI row (ref dashboard:81-93)."""
    ev = load(spark, sf_dir, "events")
    return analytics.kpis(ev, "ts", "user_id", "value", unhealthy_threshold=82.0)


@register(
    "dash_rolling_mean",
    """
    SELECT event_id, user_id, value,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) + 1e-9, 4) AS rolling_mean
    FROM events
    """,
)
def q_dash_rolling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #14 — trailing 6-row rolling mean (ref dashboard:110-131)."""
    ev = load(spark, sf_dir, "events")
    out = analytics.rolling_mean(
        ev, "ts", "user_id", "value", window_rows=6, order_tiebreak=["event_id"]
    )
    return out.select("event_id", "user_id", "value", "rolling_mean")


@register(
    "dash_dow_distribution",
    """
    SELECT CAST(ISODOW(ts) - 1 AS INTEGER) AS day_of_week,
           ROUND(AVG(value) + 1e-9, 4) AS value_mean,
           ROUND(STDDEV_SAMP(value) + 1e-9, 4) AS value_std,
           ROUND(quantile_cont(value, 0.25) + 1e-9, 4) AS q1,
           ROUND(quantile_cont(value, 0.5) + 1e-9, 4) AS median,
           ROUND(quantile_cont(value, 0.75) + 1e-9, 4) AS q3,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events GROUP BY 1
    """,
)
def q_dash_dow_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #15 — day-of-week distribution (ref dashboard:146-163)."""
    ev = load(spark, sf_dir, "events")
    return analytics.dow_distribution(ev, "ts", "value")


@register(
    "dash_station_compare",
    """
    SELECT user_id,
           ROUND(AVG(value) + 1e-9, 4) AS value_mean,
           ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END) + 1e-9, 4) AS mean_purchase,
           ROUND(AVG(CASE WHEN event_type = 'view' THEN value END) + 1e-9, 4) AS mean_view,
           ROUND(AVG(CASE WHEN event_type = 'click' THEN value END) + 1e-9, 4) AS mean_click,
           ROUND(AVG(CASE WHEN event_type = 'error' THEN value END) + 1e-9, 4) AS mean_error,
           ROUND(AVG(CASE WHEN event_type = 'signup' THEN value END) + 1e-9, 4) AS mean_signup
    FROM events GROUP BY user_id
    """,
)
def q_dash_station_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #16 — per-group multi-metric comparison (ref dashboard:167-192)."""
    ev = load(spark, sf_dir, "events")
    return analytics.group_compare(ev, "user_id", "value", "event_type", _EVENT_TYPES)


@register(
    "dash_hourly_pattern",
    """
    SELECT CAST(HOUR(ts) AS INTEGER) AS hour,
           ROUND(AVG(value) + 1e-9, 4) AS value_mean,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CASE WHEN HOUR(ts) IN (7,8,9,17,18,19) THEN 1 ELSE 0 END AS INTEGER)
             AS is_rush_hour
    FROM events GROUP BY 1, 4
    """,
)
def q_dash_hourly_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #17 — hour-of-day profile (ref dashboard:196-219)."""
    ev = load(spark, sf_dir, "events")
    return analytics.hourly_pattern(ev, "ts", "value")


_CORR_PIVOT_SQL = """
  SELECT user_id, CAST(ts AS DATE) AS d,
         ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END) + 1e-9, 4) AS m_purchase,
         ROUND(AVG(CASE WHEN event_type = 'view' THEN value END) + 1e-9, 4) AS m_view,
         ROUND(AVG(CASE WHEN event_type = 'click' THEN value END) + 1e-9, 4) AS m_click,
         ROUND(AVG(CASE WHEN event_type = 'error' THEN value END) + 1e-9, 4) AS m_error
  FROM events GROUP BY 1, 2
"""

_CORR_PAIRS = [
    ("m_purchase", "m_view"),
    ("m_purchase", "m_click"),
    ("m_purchase", "m_error"),
    ("m_view", "m_click"),
    ("m_view", "m_error"),
    ("m_click", "m_error"),
]


@register(
    "dash_corr_matrix",
    "WITH p AS ({pivot}) SELECT col_a, col_b, corr FROM (\n".format(pivot=_CORR_PIVOT_SQL)
    + "\nUNION ALL\n".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, ROUND(CORR({a}, {b}) + 1e-9, 4) AS corr FROM p"
        for a, b in _CORR_PAIRS
    )
    + "\n)",
)
def q_dash_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 #18 — Pearson correlation matrix, long form
    (ref dashboard:223-243). Metrics are the day×station conditional
    means of each event type (the engine's pivot of the reference's
    pollutant columns)."""
    ev = load(spark, sf_dir, "events")

    def cavg(t: str):
        return r4(F.avg(F.when(F.col("event_type") == t, F.col("value"))))

    pivoted = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(*[cavg(t).alias(f"m_{t}") for t in ["purchase", "view", "click", "error"]])
    return analytics.corr_matrix_long(
        pivoted, ["m_purchase", "m_view", "m_click", "m_error"]
    )


