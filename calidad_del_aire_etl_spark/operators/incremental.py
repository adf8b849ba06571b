"""Incremental re-aggregation via dynamic partition overwrite.

The reference recomputes its whole daily summary every run (dag:243-253
runs after a full re-extract). At 100 TB the correct shape is: aggregate
ONLY the dates present in the new batch and overwrite ONLY those date
partitions — every other partition's files are untouched. Spark gives
this natively with ``partitionOverwriteMode=dynamic``; downstream
readers keep partition-pruning on ``date``.

Contract: the incoming batch must carry ALL rows for each date it
touches (the reprocess-the-partition pattern); late rows for an old date
mean re-feeding that date's full slice, which is exactly how
warehouse-style backfills work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def daily_rollup(events: DataFrame) -> DataFrame:
    """Per (date, user) daily aggregate, partition-keyed by date."""
    return (
        events.withColumn("date", F.to_date("ts").cast("string"))
        .groupBy("date", "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


def write_daily_full(summary: DataFrame, path: str) -> None:
    """Initial (or backfill-everything) load: all partitions written."""
    summary.write.mode("overwrite").partitionBy("date").parquet(path)


def incremental_daily_update(
    spark: SparkSession, events_batch: DataFrame, path: str
) -> list[str]:
    """Re-aggregate the batch and overwrite ONLY its date partitions.

    Returns the affected dates. ``partitionOverwriteMode=dynamic`` is set
    per-write (session conf restored), so a 2-date batch against a
    3-year table rewrites 2 directories, not ~1100."""
    summary = daily_rollup(events_batch)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        summary.write.mode("overwrite").partitionBy("date").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return [r["date"] for r in summary.select("date").distinct().collect()]
