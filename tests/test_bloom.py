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


def test_null_ids_never_poison_the_batch(spark):
    """A NULL id co-batched with real ids must not change how those real
    ids hash (Arrow->pandas turns an int64 column with any null into
    float64, which hashes differently): seen ids are still dropped, and
    null-id rows are kept as definitely-new (ADVICE r2 regression)."""
    existing = spark.range(0, 2000).selectExpr(
        "case when id % 7 = 3 then null else id end as id"
    )
    batch = spark.range(0, 2000).selectExpr(
        "case when id % 5 = 1 then null else id end as id"
    ).coalesce(1)  # one batch => every id co-batched with nulls
    out = bloom.bloom_new_rows(existing, batch, "id", fpp=0.01)
    rows = out.collect()
    surviving_ids = {r.id for r in rows if r.id is not None}
    genuinely_new = {i for i in range(2000) if i % 7 == 3 and i % 5 != 1}
    # HARD guarantee: a seen id never survives. Before the fix, the float64
    # build-side hashing made build and probe disagree on EVERY id in a
    # null-carrying batch, so nearly all 1371 seen ids leaked through.
    assert surviving_ids <= genuinely_new
    # and the bulk of the genuinely-new ids survive (only fpp losses)
    assert len(surviving_ids) >= 0.95 * len(genuinely_new)
    # null-id rows are definitely-new: all kept
    assert sum(1 for r in rows if r.id is None) == 400


def test_params_for_rejects_overflow_regime():
    """The int64 no-overflow argument (h1 + i·h2 < 2^63) only holds for
    k ≤ 7; smaller fpp must fail loudly instead of silently wrapping in
    numpy while the DuckDB twin raises BIGINT overflow (ADVICE r13)."""
    import pytest

    from calidad_del_aire_etl_spark.operators import bloom

    m, k = bloom.params_for(10_000, 0.01)
    assert 1 <= k <= 7 and m % 64 == 0
    with pytest.raises(ValueError, match="k <= 7"):
        bloom.params_for(10_000, 1e-4)
