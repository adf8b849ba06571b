"""Heavy-hitters (Misra-Gries) bound tests + weighted-sampling properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calidad_del_aire_etl_spark.operators import corpus, sketches

SF = "/root/testdata/sf0.001"


def test_mg_exact_when_capacity_ample(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {r.item: r for r in sketches.heavy_hitters(ev, "event_type", k=10, capacity=64).collect()}
    exact = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    for item, r in got.items():
        assert r.est == exact[item]
        assert r.est_max == r.est  # zero decrements => exact


def test_mg_bounds_hold_under_eviction(spark):
    """capacity=4 over a skewed stream with ~200 distinct values: the
    estimate must stay within [est, est + reported undercount] of truth
    and the dominant value must surface at rank 1."""
    rows = [("hot",)] * 3000 + [(f"tail_{i % 200}",) for i in range(4000)]
    df = spark.createDataFrame(rows, "v string").repartition(8)
    got = {r.item: r for r in sketches.heavy_hitters(df, "v", k=5, capacity=4).collect()}
    assert "hot" in got and got["hot"].rank == 1
    exact = {r.v: r["count"] for r in df.groupBy("v").count().collect()}
    for item, r in got.items():
        assert r.est <= exact[item] <= r.est_max, (item, r, exact[item])


def test_mg_shuffle_contribution_bounded(spark):
    """The phase-1 summary must emit at most capacity+1 rows per
    partition regardless of input cardinality — the whole point of the
    sketch vs exact groupBy at 100 TB."""
    df = spark.createDataFrame(
        [(f"v{i}",) for i in range(5000)], "v string"
    ).repartition(4)
    summ = df.mapInPandas(
        sketches._mg_partition("v", 16), "item string, cnt long, decr long"
    )
    per_part = (
        summ.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert all(r["count"] <= 17 for r in per_part)


def test_weighted_sample_prefers_heavy_rows(spark):
    """Deterministic priority sampling: every row sampled with
    w=1000 vs a sea of w=1 rows should make heavy rows dominate, and the
    result must be stable across runs and partitioning."""
    rows = [(i, 1000.0 if i < 20 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    pick = lambda d: {r.id for r in corpus.weighted_sample_topk(d, "id", F.col("w"), k=25).collect()}
    got = pick(df)
    heavy = {i for i in got if i < 20}
    assert len(heavy) >= 15  # w-ratio 1000:1 over 20:1980 rows
    assert pick(df.repartition(13)) == got  # partition-invariant


def test_weighted_sample_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -5.0), (3, 2.0)], "id long, w double"
    )
    got = corpus.weighted_sample_topk(df, "id", F.col("w"), k=10).collect()
    assert [r.id for r in got] == [3]


def test_weighted_sample_plan_is_take_ordered(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    q = corpus.weighted_sample_topk(df, "doc_id", F.octet_length(F.col("text")), k=10)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_hll_reaggregation_tracks_exact(spark, sf_dir):
    """Month-level estimates produced by UNIONING daily sketches must
    track the exact month-level distinct counts within HLL error at
    lg_k=12 (~2-3 sigma bound; assert 5%) — the property that makes
    daily sketch partials re-aggregable without fact rescans."""
    from pyspark.sql import functions as F

    from calidad_del_aire_etl_spark.operators.sketches import hll_reaggregate
    from calidad_del_aire_etl_spark.registry import load

    ev = load(spark, sf_dir, "events")
    est = {
        (r["month"], r["event_type"]): r["est_distinct"]
        for r in hll_reaggregate(ev, "ts", "event_type", "user_id").collect()
    }
    exact = {
        (r["month"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.date_format(F.to_date("ts"), "yyyy-MM").alias("month"), "event_type"
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact) and len(est) > 0
    for k in exact:
        assert abs(est[k] - exact[k]) <= max(0.05 * exact[k], 2.0), (
            k, est[k], exact[k]
        )


def test_quantile_histogram_rollup_within_one_bin_of_exact(spark, sf_dir):
    """Merging daily histogram partials is exact (counts add), so the
    month-grain estimate must land within ONE bin width of the true
    percentile — the guarantee that makes persisting daily partials a
    safe substitute for re-scanning the fact at 100 TB."""
    from calidad_del_aire_etl_spark.operators import sketches
    from calidad_del_aire_etl_spark.registry import load
    from calidad_del_aire_etl_spark.session import pin_oracle_compat

    pin_oracle_compat(spark)
    ev = load(spark, sf_dir, "events")
    bins = 256
    est = {
        (r["month"], r["event_type"]): (r["p50_est"], r["p95_est"])
        for r in sketches.quantile_histogram_rollup(
            ev, "ts", "event_type", "value", bins
        ).collect()
    }
    assert est
    import numpy as np

    rows = ev.select(
        F.date_format("ts", "yyyy-MM").alias("m"), "event_type", "value"
    ).collect()
    lo = min(r["value"] for r in rows)
    hi = max(r["value"] for r in rows)
    width = (hi - lo) / bins
    by_cell: dict[tuple, list] = {}
    for r in rows:
        by_cell.setdefault((r["m"], r["event_type"]), []).append(r["value"])
    for cell, vals in by_cell.items():
        v = np.sort(np.array(vals))
        for p, got in zip((0.5, 0.95), est[cell]):
            exact = float(v[min(int(np.ceil(p * len(v))) - 1, len(v) - 1)])
            assert abs(got - exact) <= width + 1e-6, (
                f"{cell} p{int(p * 100)}: est {got} vs exact {exact} "
                f"(bin width {width})"
            )
