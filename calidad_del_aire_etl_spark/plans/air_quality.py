"""The reference pipeline end-to-end, Spark-native (SURVEY §2 #12).

Reference: Airflow DAG extract ≫ transform ≫ load ≫ validate
(dags/airflow_dag_calidad_aire.py:441). Here each Airflow task becomes a
DataFrame→DataFrame stage and the whole flow is ONE lazy Catalyst plan —
the scheduler's task boundaries (which force CSV materialization between
tasks in the reference, dag:118/256) disappear; only the final load
writes anything.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import aqi_from_pm25, pollution_index, quality_category
from ..operators import aggregates, cleaning, features
from ..sinks import writers
from ..sources.generator import generate_air_quality

POLLUTANTS = ["pm25", "pm10", "no2", "o3", "co", "temperature", "humidity"]


@dataclass
class Pipeline:
    """A named chain of DataFrame stages (the engine's DAG analog)."""

    name: str
    stages: list[tuple[str, Callable[[DataFrame], DataFrame]]] = field(default_factory=list)

    def stage(self, name: str):
        def deco(fn):
            self.stages.append((name, fn))
            return fn

        return deco

    def run(self, df: DataFrame) -> DataFrame:
        for _, fn in self.stages:
            df = fn(df)
        return df


def extract(spark: SparkSession, num_days: int = 90) -> DataFrame:
    """EXTRACT (dag:40-132): distributed synthetic sensor readings."""
    return generate_air_quality(spark, num_days=num_days)


def transform(df: DataFrame) -> DataFrame:
    """TRANSFORM (dag:138-236): clean + feature-engineer, all lazily.

    Order mirrors the reference: interpolate nulls per station →
    IQR-clip pm25/pm10/no2 → dedup on (ts, station) → AQI → category →
    temporal features → composite pollution index.
    """
    for pol in POLLUTANTS:
        df = cleaning.interpolate_linear(
            df, pol, group_cols=["station"], order_cols=["ts"], limit=3
        )
    df = cleaning.iqr_clip(df, ["pm25", "pm10", "no2"], k=3.0)
    df = cleaning.dedup_exact(df, key_cols=["ts", "station"], tiebreak_cols=["pm25"])
    df = df.withColumn("aqi_pm25", aqi_from_pm25(F.col("pm25")))
    df = df.withColumn("air_quality_category", quality_category(F.col("aqi_pm25")))
    df = features.with_temporal_features(df, "ts")
    df = df.withColumn(
        "pollution_index",
        pollution_index(F.col("pm25"), F.col("pm10"), F.col("no2"), F.col("co")),
    )
    return df


def daily_summary(df: DataFrame) -> DataFrame:
    """Daily per-station rollup, column-for-column with dag:244-253."""
    return df.groupBy("date", "station").agg(
        F.round(F.avg("pm25"), 4).alias("pm25_mean"),
        F.max("pm25").alias("pm25_max"),
        F.min("pm25").alias("pm25_min"),
        F.round(F.avg("pm10"), 4).alias("pm10_mean"),
        F.max("pm10").alias("pm10_max"),
        F.round(F.avg("no2"), 4).alias("no2_mean"),
        F.round(F.avg("aqi_pm25"), 4).alias("aqi_pm25_mean"),
        F.round(F.avg("pollution_index"), 4).alias("pollution_index_mean"),
        F.sum("is_rush_hour").cast("bigint").alias("is_rush_hour_sum"),
    )


def load(df: DataFrame, daily: DataFrame, out_dir: str) -> None:
    """LOAD (dag:287-359): snappy parquet partitioned by month + CSV."""
    writers.write_parquet(df.withColumn("month", F.col("month")), f"{out_dir}/hourly",
                          partition_by=["month"])
    writers.write_csv(daily, f"{out_dir}/daily_csv")
    writers.write_parquet(daily, f"{out_dir}/daily")


def validate(df: DataFrame) -> DataFrame:
    """VALIDATE (dag:365-407): quality report over the transformed set."""
    return aggregates.validation_report(
        df, "ts", "station", POLLUTANTS, category_col="air_quality_category"
    )


def run_full_pipeline(spark: SparkSession, out_dir: str, num_days: int = 30) -> dict:
    """extract ≫ transform ≫ load ≫ validate, returning the quality report
    (the reference fails under 1000 rows / warns over 5 % nulls —
    dag:396-401; same thresholds here)."""
    raw = extract(spark, num_days=num_days)
    clean = transform(raw)
    daily = daily_summary(clean)
    load(clean, daily, out_dir)
    report = validate(clean).collect()[0].asDict()
    if report["total_records"] < 1000:
        raise ValueError("insufficient data for analysis")
    report["null_warning"] = bool(report["null_percentage"] > 5)
    return report
