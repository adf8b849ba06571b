"""Unit tests for the round-7 operators: snapshot_diff, skew_report,
zipf_fit, open_order_backlog. Cross-engine parity for their registry
queries is covered by the auto-discovering oracle sweep
(test_oracle_parity.py); these pin the SEMANTICS on hand-built frames —
the change-class taxonomy incl. NULL transitions, the skew arithmetic,
the Zipf slope on an exact power law, and the backlog fold.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from calidad_del_aire_etl_spark.operators import analytics2, incremental, text, validation


def test_snapshot_diff_change_classes(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0), (5, 50.0)],
        "k int, v double",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 changed, 3 NULL→value (changed), 4 value→NULL
        # (changed), 5 deleted, 6 added
        [(1, 10.0), (2, 21.0), (3, 30.0), (4, None), (6, 60.0)],
        "k int, v double",
    )
    out = {
        r["k"]: r
        for r in incremental.snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    assert set(out) == {2, 3, 4, 5, 6}  # 1 (unchanged) is dropped
    assert out[2]["change_type"] == "changed" and out[2]["new_v"] == 21.0
    assert out[3]["change_type"] == "changed" and out[3]["old_v"] is None
    assert out[4]["change_type"] == "changed" and out[4]["new_v"] is None
    assert out[5]["change_type"] == "deleted" and out[5]["new_v"] is None
    assert out[6]["change_type"] == "added" and out[6]["old_v"] is None


def test_snapshot_diff_multi_key_and_cols(spark):
    old = spark.createDataFrame([(1, "a", 1.0, "x")], "k1 int, k2 string, v1 double, v2 string")
    new = spark.createDataFrame([(1, "a", 1.0, "y")], "k1 int, k2 string, v1 double, v2 string")
    rows = incremental.snapshot_diff(old, new, ["k1", "k2"], ["v1", "v2"]).collect()
    assert len(rows) == 1 and rows[0]["change_type"] == "changed"
    assert rows[0]["old_v2"] == "x" and rows[0]["new_v2"] == "y"


def test_skew_report_math(spark):
    # key 1 ×6, key 2 ×2, keys 3..6 ×1 → 12 rows over 6 keys, avg 2
    rows = [(1,)] * 6 + [(2,)] * 2 + [(3,), (4,), (5,), (6,)]
    df = spark.createDataFrame(rows, "k int")
    out = validation.skew_report(df, "k", top_n=3).orderBy("rank").collect()
    assert [r["key"] for r in out] == [1, 2, 3]  # ties broken by key asc
    assert [r["cnt"] for r in out] == [6, 2, 1]
    assert out[0]["n_keys"] == 6
    assert out[0]["share_pct"] == 50.0
    assert abs(out[0]["skew_vs_avg"] - 3.0) < 1e-9  # 6 / 2


def test_zipf_fit_recovers_exact_power_law(spark):
    # freq(rank) = round(1000 * rank^-0.8): tokens w1..w40, token wI
    # repeated freq(I) times — OLS on log-log must recover ≈ -0.8 with
    # r2 ≈ 1 (rounding to integer counts adds tiny noise)
    rows = []
    for i in range(1, 41):
        f_i = round(1000 * i ** -0.8)
        rows += [("s", f"w{i:02d} " * 1)] * f_i  # one doc per occurrence
    df = spark.createDataFrame([(s, t.strip()) for s, t in rows], "source string, text string")
    out = text.zipf_fit(df, "source", "text", top_terms=40).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_terms"] == 40
    assert abs(r["zipf_slope"] + 0.8) < 0.02
    assert r["r2"] > 0.999
    assert abs(r["zipf_intercept"] - math.log(1000)) < 0.05


def test_open_order_backlog_fold(spark):
    orders = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-01"), (3, "2024-01-02")],
        "o_orderkey int, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = spark.createDataFrame(
        # order 1 ships lines on the 1st and 3rd → closes on the 3rd;
        # order 2 closes on the 2nd; order 3 closes on the 2nd
        [(1, "2024-01-01"), (1, "2024-01-03"), (2, "2024-01-02"), (3, "2024-01-02")],
        "l_orderkey int, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    out = {r["date"]: r for r in analytics2.open_order_backlog(orders, li).collect()}
    assert out["2024-01-01"]["n_opened"] == 2 and out["2024-01-01"]["n_closed"] == 0
    assert out["2024-01-01"]["backlog"] == 2
    assert out["2024-01-02"]["n_opened"] == 1 and out["2024-01-02"]["n_closed"] == 2
    assert out["2024-01-02"]["backlog"] == 1
    assert out["2024-01-03"]["n_closed"] == 1 and out["2024-01-03"]["backlog"] == 0
