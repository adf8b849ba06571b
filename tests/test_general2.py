"""Unit tests for general-analytics batch 2: funnel, range join, SCD2,
percentiles (hand-computed expectations on tiny frames)."""

from __future__ import annotations

import datetime as dt

from calidad_del_aire_etl_spark.operators import general


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_window_funnel_depths(spark):
    rows = [
        # u1 completes the funnel in order
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "purchase"),
        # u2: purchase BEFORE click → depth stops at 2
        (2, _ts(0), "view"), (2, _ts(1), "purchase"), (2, _ts(2), "click"),
        # u3: only view → depth 1
        (3, _ts(0), "view"),
        # u4: click without view → depth 0
        (4, _ts(0), "click"),
        # u5: click at the SAME ts as view → strictly-after fails → depth 1
        (5, _ts(0), "view"), (5, _ts(0), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")
    got = {r["depth"]: r["n_users"] for r in general.window_funnel(df).collect()}
    assert got == {3: 1, 2: 1, 1: 2, 0: 1}


def test_range_join_incidents_window_is_open_interval(spark):
    rows = [
        (100, 1, _ts(10), "error", 0.0),
        (101, 1, _ts(10), "view", 1.0),   # same instant: NOT counted (strict >)
        (102, 1, _ts(30), "click", 2.0),  # inside the hour
        (103, 1, dt.datetime(2024, 1, 1, 1, 10), "view", 4.0),  # at +60m: outside
        (104, 2, _ts(30), "view", 8.0),   # other user: never counted
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    out = general.range_join_incidents(df, "error", 60).collect()
    assert len(out) == 1
    r = out[0]
    assert r["incident_id"] == 100 and r["n_events"] == 1
    assert r["sum_value"] == 2.0 and r["n_types"] == 1


def test_scd2_versions_and_current_flag(spark):
    rows = [
        (1, 7, _ts(0), "bronze", 0.0),
        (2, 7, _ts(5), "silver", 0.0),
        (3, 7, _ts(9), "gold", 0.0),
        (4, 8, _ts(1), "bronze", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )
    out = {(r["user_id"], r["version"]): r for r in general.scd2_from_changelog(df).collect()}
    assert out[(7, 1)]["attr_value"] == "bronze"
    assert out[(7, 1)]["to_us"] == out[(7, 2)]["from_us"]  # contiguous intervals
    assert not out[(7, 1)]["is_current"] and out[(7, 3)]["is_current"]
    assert out[(7, 3)]["to_us"] is None
    assert out[(8, 1)]["is_current"]


def test_percentile_profile_exact(spark):
    rows = [(f"t", float(v)) for v in range(1, 5)]  # 1,2,3,4
    df = spark.createDataFrame(rows, "event_type string, value double")
    r = general.percentile_profile(df, probs=(0.5,)).collect()[0]
    assert r["n"] == 4 and r["p50"] == 2.5  # linear interpolation


def test_q6_is_single_scan_no_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = general.q6_forecast_revenue(li)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    r = general.q6_forecast_revenue(li).collect()[0]
    assert r["n_items"] >= 0


def test_sketch_profile_accuracy_vs_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {r["event_type"]: r for r in general.sketch_profile(ev).collect()}
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for t, e in exact.items():
        assert abs(got[t]["approx_users"] - e["u"]) <= max(2, 0.05 * e["u"])
        assert abs(got[t]["approx_p50"] - e["p50"]) <= max(0.05 * abs(e["p50"]), 0.5)
