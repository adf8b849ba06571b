"""Count-Min sketch guarantees against exact counts (rows-only gate —
the sketch is approximate by design, so the pin is the Cormode-
Muthukrishnan bounds, not a value hash)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from calidad_del_aire_etl_spark.operators import cms


def test_cms_never_undercounts_and_bounds_overcount(spark):
    rows = [(i % 50,) for i in range(5000)] + [(999, )] * 777
    df = spark.createDataFrame(rows, ["user_id"]).repartition(8)
    exact = {r["user_id"]: r["c"] for r in
             df.groupBy("user_id").count().withColumnRenamed("count", "c").collect()}
    eps, n = 0.001, len(rows)
    out = cms.cms_frequency_profile(df, "user_id", eps=eps, delta=0.01).collect()
    assert {r["user_id"] for r in out} == set(exact)
    for r in out:
        true = exact[r["user_id"]]
        assert r["est_count"] >= true, "CMS undercounted — broken invariant"
        assert r["est_count"] <= true + eps * n + 1, "overcount beyond eps*N"


def test_cms_is_merge_invariant_across_partitionings(spark):
    rows = [(i % 13,) for i in range(1300)]
    a = spark.createDataFrame(rows, ["k"]).repartition(2)
    b = spark.createDataFrame(rows, ["k"]).repartition(17)
    ca, w, d = cms.build_cms(a, "k", eps=0.01, delta=0.05)
    cb, _, _ = cms.build_cms(b, "k", eps=0.01, delta=0.05)
    assert (ca == cb).all(), "sketch must not depend on partitioning"


def test_null_keys_never_poison_the_probe(spark):
    """A NULL key co-batched with real keys must not change how those
    real keys hash: the (h1, h2) columns are coalesced JVM-side and
    validity rides as its own boolean, so Arrow never converts the hash
    columns to float64 (which cannot represent 60-bit hashes exactly —
    the bloom ADVICE r2 lesson, applied structurally here)."""
    rows = [(i % 50,) for i in range(5000)] + [(None,)] * 137
    df = spark.createDataFrame(rows, "user_id int").coalesce(1)
    built, w, d = cms.build_cms(df, "user_id", eps=0.01, delta=0.05)
    keys = df.select("user_id").distinct()
    out = cms.estimate_counts(keys, "user_id", built, w, d).collect()
    by_key = {r["user_id"]: r["est_count"] for r in out}
    # real keys: never undercount (the guarantee a float64 hash
    # corruption would break), NULL key: estimate 0
    for k in range(50):
        assert by_key[k] >= 100, (k, by_key[k])
    assert by_key[None] == 0


def test_params_for_rejects_overflow_regime():
    """depth ≤ 7 keeps h1 + i·h2 < 2^63 on both engines; a smaller
    delta must raise, not silently diverge (ADVICE r13)."""
    import pytest

    from calidad_del_aire_etl_spark.operators import cms

    w, d = cms.params_for(0.001, 0.01)
    assert 1 <= d <= 7
    with pytest.raises(ValueError, match="depth <= 7"):
        cms.params_for(0.001, 1e-5)
