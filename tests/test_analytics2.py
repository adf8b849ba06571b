"""Analytics widening batch: invariants + plan guards (values are
oracle-checked by tools/compare.py / driver t2)."""

from __future__ import annotations

import pytest

import math

import __spark_entry__ as entry
from pyspark.sql import functions as F

from calidad_del_aire_etl_spark.registry import load

SF = "/root/testdata/sf0.001"
Q = entry.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.slow
def test_grouping_sets_partition_totals(spark):
    rows = Q["grouping_sets_profile"](spark, SF).collect()
    total = load(spark, SF, "events").count()
    by_type = sum(r.n for r in rows if r.dow == "ALL")
    by_dow = sum(r.n for r in rows if r.event_type == "ALL")
    # each grouping set partitions the full fact independently
    assert by_type == total and by_dow == total
    # expanded in one pass: a single Expand node, not two scans
    plan = _plan(Q["grouping_sets_profile"](spark, SF))
    assert plan.count("Scan parquet") == 1


def test_time_weighted_avg_matches_manual(spark):
    df = Q["time_weighted_avg"](spark, SF)
    one = df.orderBy("user_id").first()
    ev = (
        load(spark, SF, "events")
        .filter(F.col("user_id") == one.user_id)
        .orderBy("ts", "event_id")
        .collect()
    )
    num = den = 0.0
    for a, b in zip(ev, ev[1:]):
        dt = (b.ts - a.ts).total_seconds() * 1e6
        num += a.value * dt
        den += dt
    assert math.isclose(one.time_weighted_avg, num / den, rel_tol=1e-6)
    assert one.n_intervals == len(ev) - 1


def test_winsorize_bounds_and_broadcast(spark):
    df = Q["winsorize_profile"](spark, SF)
    assert "BroadcastHashJoin" in _plan(df)
    for r in df.collect():
        assert r.p_lo <= r.p_hi
        assert r.p_lo <= r.winsorized_mean <= r.p_hi
        assert r.n_clipped_lo >= 0 and r.n_clipped_hi >= 0


def test_histogram_counts_total(spark):
    rows = Q["value_histogram"](spark, SF).collect()
    assert sum(r.n for r in rows) == load(spark, SF, "events").count()
    assert all(0 <= r.bin_id < 20 for r in rows)
    # binning is pure arithmetic: no UDF in the plan
    assert "BatchEvalPython" not in _plan(Q["value_histogram"](spark, SF))


def test_cumulative_distinct_monotonic(spark):
    rows = Q["cumulative_distinct_users"](spark, SF).collect()
    assert rows[-1].cum_users == load(spark, SF, "events").select("user_id").distinct().count()
    cums = [r.cum_users for r in rows]
    assert cums == sorted(cums)
    assert sum(r.new_users for r in rows) == cums[-1]


def test_tfidf_ranks_and_df_bounds(spark):
    df = Q["text_tfidf_topk"](spark, SF)
    n_docs = load(spark, SF, "documents").count()
    rows = df.collect()
    assert all(1 <= r.rank <= 5 for r in rows)
    assert all(1 <= r.df <= n_docs for r in rows)
    # per doc: ranks strictly increasing, scores non-increasing
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(a.tfidf >= b.tfidf for a, b in zip(rs, rs[1:]))


def test_contamination_excludes_benchmark_docs(spark):
    rows = Q["corpus_contamination"](spark, SF).collect()
    assert all(r.doc_id % 97 != 0 for r in rows)
    assert all(r.n_contaminated_ngrams > 0 for r in rows)


def test_ema_matches_python_fold(spark):
    df = Q["ema_per_user"](spark, SF)
    one = df.orderBy("user_id").first()
    ev = (
        load(spark, SF, "events")
        .filter(F.col("user_id") == one.user_id)
        .orderBy("ts", "event_id")
        .collect()
    )
    a, ema = 0.3, ev[0].value
    tail = [ema]
    for r in ev[1:]:
        ema = a * r.value + (1 - a) * ema
        tail = (tail + [ema])[-5:]
    assert math.isclose(one.ema_final, ema, abs_tol=2e-4)
    assert math.isclose(one.ema_tail_mean, sum(tail) / len(tail), abs_tol=2e-4)
    assert one.n_points == len(ev)
    # fold runs JVM-side: no Python UDF in the plan
    assert "BatchEvalPython" not in _plan(Q["ema_per_user"](spark, SF))


def test_mode_is_true_argmax(spark):
    rows = Q["mode_per_user"](spark, SF).collect()
    ev = load(spark, SF, "events")
    one = rows[0]
    counts = dict(
        (r.event_type, r.cnt)
        for r in ev.filter(F.col("user_id") == one.user_id)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    best = max(counts.values())
    assert one.mode_count == best
    assert one.mode_event_type == min(t for t, c in counts.items() if c == best)


def test_psi_zero_for_identical_distribution(spark):
    from calidad_del_aire_etl_spark.operators.analytics2 import psi_drift

    ev = load(spark, SF, "events")
    # split so period B is empty-complement-free: compare the data to itself
    doubled = ev.withColumn("ts", F.col("ts")).unionAll(
        ev.withColumn("ts", F.expr("ts + INTERVAL 40 DAYS"))
    )
    rows = psi_drift(doubled, "2024-02-05", 0.0, 500.0, 10, 1e-4).collect()
    # identical per-bin shares on both sides -> PSI ~ 0
    assert all(abs(r.psi) < 1e-3 for r in rows)
    real = {r.event_type: r.psi for r in Q["psi_drift"](spark, SF).collect()}
    assert all(v >= 0.0 for v in real.values())


def test_sample_n_deterministic_and_bounded(spark):
    a = Q["sample_n_per_user"](spark, SF).collect()
    b = Q["sample_n_per_user"](spark, SF).collect()
    assert [(r.user_id, r.event_id) for r in a] == [(r.user_id, r.event_id) for r in b]
    per_user = {}
    for r in a:
        per_user[r.user_id] = per_user.get(r.user_id, 0) + 1
    assert all(v <= 10 for v in per_user.values())


def test_cohort_retention_week_zero_full(spark):
    rows = Q["cohort_retention"](spark, SF).collect()
    # weeks_since=0 is by definition 100% retained
    zero = [r for r in rows if r.weeks_since == 0]
    assert zero and all(abs(r.retention - 1.0) < 1e-9 for r in zero)
    assert all(0.0 <= r.retention <= 1.0 for r in rows)
    assert sum(r.cohort_size for r in zero) == (
        load(spark, SF, "events").select("user_id").distinct().count()
    )


def test_rfm_scores_quartile_bounds(spark):
    rows = Q["rfm_segments"](spark, SF).collect()
    assert all(1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4 for r in rows)
    assert all(r.segment == f"{r.r_score}{r.f_score}{r.m_score}" for r in rows)


def test_transition_rows_sum_to_one(spark):
    rows = Q["event_transition_matrix"](spark, SF).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, 0.0)
        by_from[r.from_type] += r.p
    assert all(abs(v - 1.0) < 1e-2 for v in by_from.values())
    # bigram totals = events minus one first-event per user
    ev = load(spark, SF, "events")
    total = ev.count() - ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == total


def test_column_profile_single_scan(spark):
    from calidad_del_aire_etl_spark.operators import validation

    df = validation.column_profile(load(spark, SF, "events"))
    assert _plan(df).count("Scan parquet") == 1
    got = {(r.column_name, r.metric): r.value for r in df.collect()}
    ev = load(spark, SF, "events")
    assert got[("value", "count")] == ev.count()
    assert got[("event_type", "distinct")] == 5.0
    assert got[("value", "min")] <= got[("value", "mean")] <= got[("value", "max")]


def test_heatmap_cells_cover_all_rows(spark):
    rows = Q["hour_dow_heatmap"](spark, SF).collect()
    assert sum(r.n for r in rows) == load(spark, SF, "events").count()
    assert all(0 <= r.hour <= 23 and 1 <= r.dow <= 7 for r in rows)


def test_topn_others_accounts_for_everything(spark):
    rows = Q["topn_with_others"](spark, SF).collect()
    ev = load(spark, SF, "events")
    total = ev.agg(F.sum(F.col("value").cast("decimal(18,2)"))).collect()[0][0]
    assert abs(sum(r.revenue for r in rows) - float(total)) < 1e-2
    for r in rows:
        if r.who != "OTHER":
            assert r.n_users == 1 and 1 <= r.rank <= 3


def test_share_of_total_sums_to_100(spark):
    rows = Q["share_of_total"](spark, SF).collect()
    assert abs(sum(r.pct_of_total for r in rows) - 100.0) < 0.05
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks)


def test_spearman_matches_pandas(spark):
    """Average-tie rank + Pearson-on-ranks must equal pandas'
    corr(method='spearman') when columns have no NULLs (our per-column
    ranking and pandas' pairwise ranking coincide exactly then)."""
    import pandas as pd

    from calidad_del_aire_etl_spark.operators import analytics

    pdf = pd.DataFrame(
        {
            "a": [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 5.0, 8.0],
            "b": [3.0, 1.0, 4.0, 4.0, 9.0, 2.0, 6.0, 7.0],
            "c": [2.0, 2.0, 2.0, 1.0, 0.0, 4.0, 4.0, 3.0],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        (r.col_a, r.col_b): r.spearman
        for r in analytics.spearman_matrix_long(df, ["a", "b", "c"]).collect()
    }
    want = pdf.corr(method="spearman")
    for (a, b), v in got.items():
        assert abs(v - want.loc[a, b]) < 1e-3, (a, b, v, want.loc[a, b])


def test_spearman_null_rows_drop_pairwise(spark):
    """A NULL in one column must not poison the other pairs."""
    from calidad_del_aire_etl_spark.operators import analytics

    df = spark.createDataFrame(
        [(1.0, 1.0, None), (2.0, 2.0, 1.0), (3.0, 3.0, 2.0), (4.0, 4.0, None)],
        "a double, b double, c double",
    )
    got = {
        (r.col_a, r.col_b): r.spearman
        for r in analytics.spearman_matrix_long(df, ["a", "b", "c"]).collect()
    }
    assert abs(got[("a", "b")] - 1.0) < 1e-9  # perfectly monotone, all 4 rows
    assert abs(got[("a", "c")] - 1.0) < 1e-9  # the 2 complete rows are monotone


def test_pareto_frontier_planted(spark):
    """Skyline with planted dominance chains and ties, scattered across
    partitions so the batch prune + global check both do real work."""
    from calidad_del_aire_etl_spark.operators.analytics2 import pareto_frontier

    rows = [
        # (key, price, size) — frontier: 1 (cheapest), 3 (best size/price
        # tradeoff), 6+7 (duplicate frontier point: neither dominates)
        (1, 10.0, 5),
        (2, 12.0, 5),    # dominated by 1 (same size, pricier)
        (3, 20.0, 9),
        (4, 25.0, 9),    # dominated by 3
        (5, 21.0, 8),    # dominated by 3 (pricier AND smaller)
        (6, 30.0, 12),
        (7, 30.0, 12),   # exact duplicate of 6 — both survive
        (8, 35.0, 11),   # dominated by 6
        (9, 10.0, 4),    # dominated by 1 (same price, smaller)
    ]
    df = spark.createDataFrame(rows, "k int, price double, sz int").repartition(4)
    got = sorted(
        (r.k for r in pareto_frontier(df, "k", "price", "sz").collect())
    )
    assert got == [1, 3, 6, 7]


def test_item_cf_cosine_hand_computed(spark):
    from calidad_del_aire_etl_spark.operators.behavior import item_cf_cosine

    # u1: 2xA 1xB ; u2: 1xA 1xB ; u3: 1xB 3xC  → vectors over (u1,u2,u3)
    # A=(2,1,0) B=(1,1,1) C=(0,0,3)
    rows = []
    for u, t, n in [(1, "A", 2), (1, "B", 1), (2, "A", 1), (2, "B", 1), (3, "B", 1), (3, "C", 3)]:
        rows += [(u, t)] * n
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {
        (r.item_a, r.item_b): (r.co_users, r.cosine)
        for r in item_cf_cosine(df, min_co_users=1).collect()
    }
    import math

    assert out[("A", "B")] == (2, round(3 / (math.sqrt(5) * math.sqrt(3)) + 1e-9, 4))
    assert out[("B", "C")] == (1, round(3 / (math.sqrt(3) * 3) + 1e-9, 4))
    assert ("A", "C") not in out  # no co-user


def test_holt_per_group_matches_python_reference(spark):
    """The two-state Holt fold against a plain-python recurrence —
    guards both the Spark aggregate expression and (via the oracle
    sweep) the DuckDB list_reduce binding workaround, whose unbound
    form returns a WRONG second iteration on DuckDB 1.0."""
    import datetime as dt

    from calidad_del_aire_etl_spark.operators import analytics2

    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 13.0]
    rows = [
        (i, dt.datetime(2024, 1, 1, 10, i), 7, "click", v, None)
        for i, v in enumerate(vals)
    ] + [(99, dt.datetime(2024, 1, 1), 8, "view", 42.0, None)]  # 1-point series
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["user_id"]: r for r in analytics2.holt_per_group(ev).collect()}

    a, b_ = 0.5, 0.3
    l, b = vals[1], vals[1] - vals[0]
    for x in vals[2:]:
        nl = a * x + (1 - a) * (l + b)
        b = b_ * (nl - l) + (1 - b_) * b
        l = nl
    r7 = got[7]
    assert r7["n_points"] == len(vals)
    assert r7["level"] == round(l + 1e-9, 4)
    assert r7["trend"] == round(b + 1e-9, 4)
    assert r7["forecast_3"] == round(l + 3 * b + 1e-9, 4)
    # degenerate single-reading series: level = the reading, flat trend
    assert (got[8]["level"], got[8]["trend"], got[8]["forecast_3"]) == (42.0, 0.0, 42.0)


def test_score_auc_hand_computed_with_ties(spark):
    """AUC against a hand-counted Mann-Whitney U, including a
    positive-negative tie (counts half) and the degenerate one-class
    input (NULL, not a division error)."""
    from pyspark.sql import functions as F

    from calidad_del_aire_etl_spark.operators import text as t

    rows = [(0.9, 1), (0.8, 1), (0.5, 1), (0.5, 0), (0.3, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    got = t.score_auc(df, "s", F.col("y") == 1).collect()[0]
    # pairs: 3 pos x 2 neg = 6; wins 5, tie 0.5 -> AUC = 5.5/6
    assert (got["n_pos"], got["n_neg"]) == (3, 2)
    assert got["auc"] == round(5.5 / 6 + 1e-9, 4)

    one_class = spark.createDataFrame([(0.9, 1), (0.1, 1)], "s double, y int")
    got1 = t.score_auc(one_class, "s", F.col("y") == 1).collect()[0]
    assert got1["auc"] is None and got1["n_neg"] == 0
