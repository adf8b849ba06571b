"""TPC-H batch-3 shapes: value sanity + physical-plan guards.

Value correctness is covered by the DuckDB oracle twins (driver t2 /
tools/compare.py); these tests pin the *plan shapes* that matter at
100 TB — semi/anti joins stay semi/anti, small sides broadcast, and
no disjunctive join degenerates into a nested loop."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"
Q = entry.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_is_semi_join(spark):
    df = Q["tpch_q4_priority"](spark, SF)
    plan = _plan(df)
    assert "LeftSemi" in plan
    rows = df.collect()
    # every priority bucket count is positive and priorities are distinct
    assert len(rows) == len({r.o_orderpriority for r in rows})
    assert all(r.order_count > 0 for r in rows)


def test_q7_nation_pairs_exclude_self(spark):
    rows = Q["tpch_q7_volume"](spark, SF).collect()
    assert rows, "expected cross-nation volume"
    assert all(r.supp_nation != r.cust_nation for r in rows)
    assert {r.supp_nation for r in rows} <= {"NATION_3", "NATION_7"}


def test_q8_share_bounded(spark):
    rows = Q["tpch_q8_mktshare"](spark, SF).collect()
    assert rows
    assert all(0.0 <= r.mkt_share <= 1.0 for r in rows)


def test_q12_partition_of_join(spark):
    rows = Q["tpch_q12_priority_ship"](spark, SF).collect()
    # high+low per status must equal the plain join count
    from pyspark.sql import functions as F
    from calidad_del_aire_etl_spark.registry import load

    li = load(spark, SF, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, SF, "orders")
    total = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert sum(r.high_line_count + r.low_line_count for r in rows) == total


def test_q14_broadcasts_part(spark):
    df = Q["tpch_q14_promo"](spark, SF)
    assert "BroadcastHashJoin" in _plan(df)
    row = df.collect()[0]
    assert 0.0 <= row.promo_revenue_pct <= 100.0


def test_q15_matches_manual_argmax(spark):
    from pyspark.sql import functions as F
    from calidad_del_aire_etl_spark.registry import load
    from calidad_del_aire_etl_spark.operators.tpch2 import _rev

    li = load(spark, SF, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    manual = (
        li.select("l_suppkey", _rev().alias("r"))
        .groupBy("l_suppkey")
        .agg(F.sum("r").alias("t"))
        .orderBy(F.col("t").desc())
        .first()
    )
    got = Q["tpch_q15_top_supplier"](spark, SF).collect()
    assert any(r.s_suppkey == manual.l_suppkey for r in got)
    # no global single-partition window in the plan
    assert "Window" not in _plan(Q["tpch_q15_top_supplier"](spark, SF))


def test_q16_excludes_blocklist(spark):
    df = Q["tpch_q16_supplier_cnt"](spark, SF)
    plan = _plan(df)
    assert "LeftAnti" in plan
    rows = df.collect()
    assert all(r.supplier_cnt > 0 for r in rows)


def test_q18_threshold_respected(spark):
    rows = Q["tpch_q18_large_orders"](spark, SF).collect()
    assert all(r.sum_qty > 300 for r in rows)


def test_q19_no_nested_loop(spark):
    plan = _plan(Q["tpch_q19_disjunctive"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q22_is_anti_join(spark):
    df = Q["tpch_q22_inactive"](spark, SF)
    assert "LeftAnti" in _plan(df)
    rows = df.collect()
    assert all(r.numcust > 0 for r in rows)
