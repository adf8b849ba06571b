"""Distributed Bloom-filter ingest dedup: guarantees + determinism."""

from __future__ import annotations

from calidad_del_aire_etl_spark.operators import bloom


def test_no_false_negatives_and_seen_all_dropped(spark):
    """Every existing id must be flagged seen (zero false negatives is
    the Bloom guarantee in the drop direction: nothing new is lost and
    nothing old survives)."""
    existing = spark.range(0, 5000)
    batch = spark.range(0, 5000)  # all already present
    out = bloom.bloom_new_rows(existing, batch, "id", fpp=0.01)
    assert out.count() == 0


def test_false_positive_rate_near_fpp(spark):
    existing = spark.range(0, 20000)
    batch = spark.range(100000, 120000)  # fully disjoint
    survivors = bloom.bloom_new_rows(existing, batch, "id", fpp=0.01).count()
    dropped = 20000 - survivors  # every drop is a false positive
    assert dropped / 20000 < 0.03  # ~1% expected, 3x headroom


def test_bitset_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 3000)
    b1, m1, k1 = bloom.build_bloom(df, "id", 3000, fpp=0.01)
    b2, m2, k2 = bloom.build_bloom(df.repartition(17), "id", 3000, fpp=0.01)
    assert (b1, m1, k1) == (b2, m2, k2)


def test_probe_plan_has_no_join_or_shuffle(spark):
    existing = spark.range(0, 1000)
    batch = spark.range(500, 1500)
    out = bloom.bloom_new_rows(existing, batch, "id", fpp=0.01)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan
