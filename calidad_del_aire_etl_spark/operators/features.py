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
