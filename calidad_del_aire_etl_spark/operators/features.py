"""Feature-engineering operators (reference dag:182-234).

All features are pure column expressions (see ``functions``) applied in a
single narrow projection — no shuffle, fully inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    aqi_from_pm25,
    is_rush_hour,
    is_weekend,
    quality_category,
    weekday0,
)


def with_aqi(df: DataFrame, pm25_col: str, out_col: str = "aqi") -> DataFrame:
    """EPA AQI column (reference dag:184-199)."""
    return df.withColumn(out_col, aqi_from_pm25(F.col(pm25_col)))


def with_quality_category(df: DataFrame, aqi_col: str, out_col: str = "air_quality_category") -> DataFrame:
    """5-level quality category column (reference dag:201-218)."""
    return df.withColumn(out_col, quality_category(F.col(aqi_col)))


def with_temporal_features(df: DataFrame, ts_col: str) -> DataFrame:
    """hour / day_of_week / is_weekend / is_rush_hour / month / date
    (reference dag:220-226); day_of_week is Monday=0 like pandas."""
    ts = F.col(ts_col)
    return (
        df.withColumn("hour", F.hour(ts))
        .withColumn("day_of_week", weekday0(ts))
        .withColumn("is_weekend", is_weekend(ts))
        .withColumn("is_rush_hour", is_rush_hour(ts))
        .withColumn("month", F.month(ts))
        .withColumn("date", F.to_date(ts))
    )


def calendar_dim(events: DataFrame) -> DataFrame:
    """Calendar dimension spanning the fact's date range — the
    warehouse-standard date spine (reference analog: the temporal
    features of dag:220-226, materialized once as a dimension instead
    of recomputed per row). Continuous even over dates with no events:
    the min/max anchor is a 1-row aggregate and the spine is a
    distributed ``sequence`` explode, so a century of dates is ~36 k
    rows from a single scalar — no fact rescan, broadcast-sized
    output by construction."""
    span = events.agg(
        F.to_date(F.min("ts")).alias("__lo"), F.to_date(F.max("ts")).alias("__hi")
    )
    days = span.select(
        F.explode(F.expr("sequence(__lo, __hi, interval 1 day)")).alias("date")
    )
    dow = F.dayofweek("date").cast("int")
    return days.select(
        F.col("date").cast("string").alias("date"),
        F.year("date").cast("int").alias("year"),
        F.month("date").cast("int").alias("month"),
        F.dayofmonth("date").cast("int").alias("day"),
        dow.alias("dow"),
        F.weekofyear("date").cast("int").alias("week_of_year"),
        dow.isin(1, 7).cast("int").alias("is_weekend"),
        F.quarter("date").cast("int").alias("quarter"),
        (F.dayofmonth(F.last_day("date")) == F.dayofmonth("date"))
        .cast("int")
        .alias("is_month_end"),
    ).orderBy("date")


CALENDAR_DIM_SQL = """
WITH span AS (
  SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events
), days AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM span
)
SELECT CAST(d AS VARCHAR) AS date,
       CAST(year(d) AS INTEGER) AS year,
       CAST(month(d) AS INTEGER) AS month,
       CAST(day(d) AS INTEGER) AS day,
       CAST(dayofweek(d) + 1 AS INTEGER) AS dow,
       CAST(weekofyear(d) AS INTEGER) AS week_of_year,
       CAST(CASE WHEN dayofweek(d) IN (0, 6) THEN 1 ELSE 0 END AS INTEGER)
         AS is_weekend,
       CAST(quarter(d) AS INTEGER) AS quarter,
       CAST(CASE WHEN d = last_day(d) THEN 1 ELSE 0 END AS INTEGER)
         AS is_month_end
FROM days ORDER BY date
"""
