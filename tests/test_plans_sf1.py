"""Plan-shape assertions at the sf1 layout (round-5 VERDICT #6).

test_plans.py pins shapes at sf0.001, where EVERY relation is tiny and
AQE/auto-broadcast thresholds trivially choose broadcast. At sf1 the
dimensions are 10-150k rows and statistics differ by three orders of
magnitude — a plan property that silently depended on "everything fits
under autoBroadcastJoinThreshold" would pass the small suite and regress
in production. These tests re-assert the engineered properties against
the sf1 parquet layout itself.

Gated like the oracle sweep: they run only when the sf1 directory exists
(built by ``python tools/gen_sf1.py``; override via SPARK_GRAFT_SF1_DIR).
``pytest tests/test_plans_sf1.py`` is part of the round's scale evidence,
not the default CI path.
"""

from __future__ import annotations

import os

import pytest

from calidad_del_aire_etl_spark import registry

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(SF1, "lineitem.parquet")),
    reason=f"sf1 layout not generated at {SF1} (run tools/gen_sf1.py)",
)


def plan(spark, name: str) -> str:
    df = registry.queries()[name](spark, SF1)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q5_dims_stay_broadcast_at_sf1(spark):
    """The q5 star shape is pinned by explicit broadcast() hints, not by
    the optimizer's size estimate — so 150k-row sf1 customer must STILL
    compile to BroadcastHashJoin, and the only exchanges are the fact
    join key and the final aggregate."""
    p = plan(spark, "tpch_q5_local_supplier")
    assert p.count("BroadcastHashJoin") >= 8  # 4 bcast joins x 2 mentions
    assert "SortMergeJoin" not in p
    # lineitem<->orders fact shuffle + final agg shuffle only
    assert p.count("Exchange hashpartitioning") <= 6


def test_q9_thin_fact_shuffle_at_sf1(spark):
    """q9's engineered shape: part/supplier broadcast onto lineitem, ONE
    shuffled fact join (orders, SHUFFLE_HASH — never a fact broadcast),
    nation name joined after the aggregate. At sf1 the 6M-row lineitem
    and 1.5M-row orders must still produce exactly that plan."""
    p = plan(spark, "tpch_q9_profit")
    assert p.count("BroadcastHashJoin") >= 6  # part, supplier, nation
    assert "SortMergeJoin" not in p
    assert "ShuffledHashJoin" in p
    # the fact exchange pair (lineitem side + orders side) + final agg;
    # formatted explain mentions each node twice
    assert p.count("Exchange hashpartitioning") <= 8
    # the thin-shuffle property: the nation NAME column never rides the
    # fact exchange — n_name appears only above the aggregate
    fact_exchange = p.split("ShuffledHashJoin")[0]
    assert "n_name" not in fact_exchange.split("Exchange")[-1]


def test_q1_pushdown_survives_sf1_scan(spark):
    """Predicate pushdown is layout-independent, but the sf1 files were
    written by a different writer (gen_sf1 tiling) — assert the filter
    still reaches PushedFilters against these footers."""
    p = plan(spark, "tpch_q1_pricing")
    assert "LessThanOrEqual(l_shipdate" in p
    assert p.count("Exchange") <= 2


def test_full_pipeline_single_fact_shuffle_at_sf1(spark):
    """The flagship's shuffle budget (one user_id exchange inside the
    pinned checkpoint; everything downstream rides it) must hold against
    the 10M-row sf1 events layout, not just the test sliver."""
    p = plan(spark, "etl_full_pipeline")
    # downstream of the checkpoint: only the tiny bounds aggregate may
    # introduce hashpartitioning; the dedup window and final aggregate
    # must NOT add user_id exchanges
    assert p.count("Exchange hashpartitioning(user_id") == 0


def test_aqe_skew_join_arms_on_sf1_events(spark):
    """The planted-skew guard re-proven on the real sf1 layout: collapse
    half of sf1 events' user_ids onto one key and self-join — the FINAL
    adaptive plan must carry SortMergeJoin(skew=true)/skewed
    AQEShuffleRead, proof the runtime skew splitter is armed against
    production-shaped parquet input, not only the synthetic range()
    micro-table in test_skew.py."""
    from pyspark.sql import functions as F

    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    )
    prev = {k: spark.conf.get(k) for k in keys}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    try:
        ev = spark.read.parquet(os.path.join(SF1, "events.parquet"))
        skewed = ev.select(
            F.when(F.col("event_id") % 2 == 0, F.lit(0))
            .otherwise(F.col("user_id"))
            .alias("k"),
            "value",
        )
        dim = (
            ev.select(F.col("user_id").alias("k"))
            .distinct()
            .union(spark.range(1).select(F.lit(0).alias("k")))
        )
        j = skewed.join(dim, "k").agg(F.sum("value").alias("s"))
        j.collect()
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, (
            "AQE did not mark the sf1 hot partition as skewed:\n"
            + final_plan[:2000]
        )
    finally:
        for key, val in prev.items():
            spark.conf.set(key, val)
