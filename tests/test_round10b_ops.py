"""Round-10 widening batch: LSH parameter sweep, hybrid RRF retrieval,
quality-score calibration — each pinned against a hand-computed
reference on a toy corpus (the SURVEY §5 oracle-or-reference
discipline). Cross-engine hashes are covered by the oracle sweep; these
tests pin the SEMANTICS."""


from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from calidad_del_aire_etl_spark.operators import ann, dedup, text
from calidad_del_aire_etl_spark.session import pin_oracle_compat


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_lsh_tuning_matches_closed_form_on_single_pair(spark):
    pin_oracle_compat(spark)
    # two identical docs -> exactly one candidate pair with jaccard 1.0;
    # P(candidate | s=1) = 1 for every config, so exp_tp = 1, exp_fp = 0.
    df = _docs(
        spark,
        [(0, "alpha beta gamma delta epsilon"),
         (1, "alpha beta gamma delta epsilon")],
    )
    out = {
        (r["num_hashes"], r["bands"]): r
        for r in dedup.lsh_tuning(df, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert set(out) == set(dedup.LSH_TUNING_CONFIGS)
    for (h, b), r in out.items():
        assert r["rows_per_band"] == h // b
        assert r["n_true"] == 1
        assert abs(r["exp_tp"] - 1.0) < 1e-9
        assert abs(r["exp_fp"]) < 1e-9
        assert abs(r["exp_recall"] - 1.0) < 1e-9


def test_lsh_tuning_scurve_value_and_band_monotonicity(spark):
    pin_oracle_compat(spark)
    # one overlapping pair with a mid similarity: 3-gram shingles of the
    # two docs overlap partially; whatever s is, the sweep's exp_fp (or
    # exp_tp) must equal the closed form 1-(1-s^r)^b within quantization.
    df = _docs(
        spark,
        [(0, "w1 w2 w3 w4 w5 w6 w7 w8"),
         (1, "w1 w2 w3 w4 w5 x6 x7 x8")],
    )
    s = dedup.jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.0).collect()
    assert len(s) == 1
    sim = s[0]["jaccard"]
    rows_out = dedup.lsh_tuning(df, "doc_id", "text", n=3, threshold=0.5).collect()
    got = {(r["num_hashes"], r["bands"]): r for r in rows_out}
    for (h, b), r in got.items():
        rr = h // b
        p = 1.0 - (1.0 - sim**rr) ** b
        expected = math.floor(p * 10000.0 + 0.5) / 10000.0
        mass = r["exp_tp"] if sim >= 0.5 else r["exp_fp"]
        assert abs(mass - expected) < 1e-9, (h, b, mass, expected)
    # same signature width, more bands (shorter rows) -> collision prob
    # can only go up: the classic S-curve shift toward recall.
    for h in (8, 16, 32):
        cfgs = sorted((bb for hh, bb in got if hh == h))
        masses = [
            got[(h, bb)]["exp_tp"] + got[(h, bb)]["exp_fp"] for bb in cfgs
        ]
        assert masses == sorted(masses)


def test_lsh_tuning_empty_corpus_yields_zero_masses(spark):
    pin_oracle_compat(spark)
    df = _docs(spark, [(0, "only one document here nothing overlaps")])
    out = dedup.lsh_tuning(df, "doc_id", "text", n=3, threshold=0.5).collect()
    assert len(out) == len(dedup.LSH_TUNING_CONFIGS)
    for r in out:
        assert r["n_true"] == 0
        assert r["exp_tp"] == 0.0 and r["exp_fp"] == 0.0
        assert r["exp_recall"] is None


def test_hybrid_rrf_hand_computed_fusion(spark):
    pin_oracle_compat(spark)
    # doc 1: rank 1 sparse only; doc 2: rank 1 dense only; doc 3: rank 2
    # in BOTH lists -> rrf(3) = 2/62 > rrf(1) = rrf(2) = 1/61; tie between
    # 1 and 2 breaks by doc_id.
    docs = _docs(
        spark,
        [(0, "query doc about nothing relevant"),
         (1, "spark spark spark spark spark"),
         (2, "plain filler words only here"),
         (3, "spark mentioned once in passing")],
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.0]), (3, [0.9, 0.1])],
        "vec_id bigint, embedding array<float>",
    )
    out = ann.hybrid_rrf_topk(
        docs, emb, "doc_id", "text", "vec_id", "embedding",
        ["spark"], query_vec_id=0, n=2, k=4,
    ).collect()
    by_rank = {r["fused_rank"]: r for r in out}
    assert by_rank[1]["doc_id"] == 3
    assert abs(by_rank[1]["rrf_score"] - round(2 / 62, 4)) < 1e-9
    assert by_rank[1]["sparse_rank"] == 2 and by_rank[1]["dense_rank"] == 2
    assert by_rank[2]["doc_id"] == 1 and by_rank[2]["dense_rank"] is None
    assert by_rank[3]["doc_id"] == 2 and by_rank[3]["sparse_rank"] is None
    assert abs(by_rank[2]["rrf_score"] - round(1 / 61, 4)) < 1e-9


def test_hybrid_rrf_respects_k_and_orders_deterministically(spark, sf_dir):
    pin_oracle_compat(spark)
    from calidad_del_aire_etl_spark.registry import load

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    out = ann.hybrid_rrf_topk(
        docs, emb, "doc_id", "text", "vec_id", "embedding",
        ["hash", "join", "spark"], query_vec_id=0, n=20, k=10,
    ).collect()
    assert len(out) == 10
    assert [r["fused_rank"] for r in out] == list(range(1, 11))
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # every fused row came from at least one list
    assert all(
        r["sparse_rank"] is not None or r["dense_rank"] is not None for r in out
    )


def test_calibration_eval_hand_computed_bins(spark):
    pin_oracle_compat(spark)
    # Scores are data-derived, so pin the INVARIANTS: bins partition the
    # corpus, rates match a direct recount, w_gap = n/N * abs_gap.
    docs = spark.createDataFrame(
        [
            (0, "the and is to of a in it short", "en"),
            (1, "x" * 400, "zh"),
            (2, "the quick brown fox jumps over the lazy dog again", "en"),
            (3, "!!!! ???? ;;;; @@@@ ####", "zh"),
        ],
        "doc_id bigint, text string, lang string",
    )
    out = text.calibration_eval(docs, "text", F.col("lang") == "en").collect()
    assert sum(r["n"] for r in out) == 4
    scored = text.quality_score(docs, "text").collect()
    n_bins = 10
    for r in out:
        members = [
            s for s in scored
            if min(int(s["quality_score"] * n_bins), n_bins - 1) == r["bin"]
        ]
        assert len(members) == r["n"]
        rate = sum(1 for s in members if s["lang"] == "en") / len(members)
        assert abs(r["pos_rate"] - round(rate, 4)) < 1e-9
        assert abs(r["w_gap"] - round(r["n"] / 4 * abs(
            sum(s["quality_score"] for s in members) / len(members) - rate
        ), 4)) < 2e-4  # avg_score is re-rounded; allow quantization slack
    # ECE = sum of w_gap contributions is a valid probability gap
    ece = sum(r["w_gap"] for r in out)
    assert 0.0 <= ece <= 1.0


def test_calibration_eval_perfectly_calibrated_score_has_zero_gap(spark):
    pin_oracle_compat(spark)
    # All-positive corpus whose scores sit in one bin: pos_rate = 1 and
    # the gap equals |avg_score - 1|, w_gap sums to the same.
    docs = spark.createDataFrame(
        [(i, "the and is to of a in it was he for on are as with", "en")
         for i in range(6)],
        "doc_id bigint, text string, lang string",
    )
    out = text.calibration_eval(docs, "text", F.col("lang") == "en").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 6 and r["pos_rate"] == 1.0
    assert abs(r["abs_gap"] - round(abs(r["avg_score"] - 1.0), 4)) < 2e-4
    assert abs(r["w_gap"] - r["abs_gap"]) < 1e-9


def test_kn_bigram_logprob_hand_computed_model(spark):
    pin_oracle_compat(spark)
    from calidad_del_aire_etl_spark.operators import corpus

    docs = _docs(spark, [(0, "a b a b"), (1, "a b c"), (2, "solo")])
    out = {
        r["doc_id"]: r
        for r in corpus.kn_bigram_logprob(docs, "doc_id", "text").collect()
    }
    # model: c(a,b)=3 c(b,a)=1 c(b,c)=1; c1(a)=3 n1f(a)=1; c1(b)=2
    # n1f(b)=2; n1b(a)=n1b(b)=n1b(c)=1; T=3; d=0.75
    d, T = 0.75, 3.0
    p_ab = (3 - d) / 3 + d * 1 / 3 * (1 / T)
    p_ba = (1 - d) / 2 + d * 2 / 2 * (1 / T)
    p_bc = p_ba
    exp0 = (2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    exp1 = (math.log2(p_ab) + math.log2(p_bc)) / 2
    assert 2 not in out  # single-token doc has no bigrams
    assert out[0]["n_bigrams"] == 3 and out[1]["n_bigrams"] == 2
    assert abs(out[0]["mean_log2_prob"] - round(exp0, 4)) < 1e-9
    assert abs(out[1]["mean_log2_prob"] - round(exp1, 4)) < 1e-9


def test_kn_bigram_penalizes_scrambled_word_order(spark):
    pin_oracle_compat(spark)
    from calidad_del_aire_etl_spark.operators import corpus

    # 20 natural docs sharing a fixed phrase + 1 doc using the SAME
    # unigrams in an order never seen elsewhere: the unigram LM cannot
    # tell them apart, the bigram LM must score the scrambled doc lower.
    natural = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    scrambled = [(99, "dog the lazy over jumps fox brown quick the")]
    docs = _docs(spark, natural + scrambled)
    kn = {
        r["doc_id"]: r["mean_log2_prob"]
        for r in corpus.kn_bigram_logprob(docs, "doc_id", "text").collect()
    }
    uni = {
        r["doc_id"]: r["mean_log2_prob"]
        for r in corpus.unigram_logprob(docs, "doc_id", "text").collect()
    }
    assert kn[99] < kn[0] - 1.0  # bigram LM: decisively less probable
    assert abs(uni[99] - uni[0]) < 0.2  # unigram LM: nearly blind to it


def test_ivf_balance_partitions_corpus_and_prices_skew(spark):
    pin_oracle_compat(spark)
    # two tight clusters, one 3x the other: cells must partition the
    # corpus and the imbalance factor must match the closed form
    # |C| * sum(share^2).
    rows = [(i, [10.0, 0.0], 0) for i in range(6)] + [
        (i, [0.0, 10.0], 1) for i in range(6, 8)
    ]
    em = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = ann.ivf_balance(em, "vec_id", "embedding", "label").collect()
    assert sum(r["n_vectors"] for r in out) == 8
    shares = {r["cell"]: r["share"] for r in out}
    assert abs(shares[0] - 0.75) < 1e-9 and abs(shares[1] - 0.25) < 1e-9
    expected_imb = 2 * (0.75**2 + 0.25**2)
    for r in out:
        assert abs(r["imbalance"] - round(expected_imb, 4)) < 1e-9


def test_ivf_balance_uniform_cells_have_unit_imbalance(spark):
    pin_oracle_compat(spark)
    rows = [(i, [10.0, 0.0], 0) for i in range(4)] + [
        (i, [0.0, 10.0], 1) for i in range(4, 8)
    ]
    em = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = ann.ivf_balance(em, "vec_id", "embedding", "label").collect()
    for r in out:
        assert r["imbalance"] == 1.0 and r["share"] == 0.5


def test_pq_recall_eval_perfect_on_separated_clusters(spark):
    pin_oracle_compat(spark)
    # vectors split into two tight clusters far apart: with one centroid
    # per cluster the PQ codes preserve the coarse geometry, so the PQ
    # top-1 within a 4-point corpus must recover the exact-L2 top-1.
    rows = [
        (0, [10.0, 0.0, 10.0, 0.0], 0), (1, [10.1, 0.0, 10.1, 0.0], 0),
        (2, [0.0, 10.0, 0.0, 10.0], 1), (3, [0.0, 10.1, 0.0, 10.1], 1),
    ]
    em = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = ann.pq_recall_eval(
        em, "vec_id", "embedding", "label", lambda c: c < 2, k=1, m_subspaces=2
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_exact"] == 1 and r["recall_at_k"] == 1.0


def test_l2_bruteforce_matches_manual_distances(spark):
    pin_oracle_compat(spark)
    rows = [(0, [0.0, 0.0]), (1, [3.0, 4.0]), (2, [1.0, 0.0])]
    em = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r["neighbor_id"]: r for r in ann.l2_bruteforce_topk(
        em, "vec_id", "embedding", lambda c: c == 0, k=2).collect()}
    assert out[2]["l2_dist"] == 1.0 and out[2]["rank"] == 1
    assert out[1]["l2_dist"] == 25.0 and out[1]["rank"] == 2


def test_cents_equals_decimal_cast_property():
    # Pure-Python property pin for the family-wide cents discipline:
    # floor(x*100 + 0.5) on the double representation of any 2-decimal
    # money value equals the DECIMAL(18,2) cast's HALF_UP cents — the
    # exact equivalence every TPC-H twin relies on.
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=500, deadline=None)
    @given(st.integers(min_value=0, max_value=10**7 * 100))
    def check(cents_true):
        x = cents_true / 100.0  # the double the generator writes
        got = math.floor(x * 100 + 0.5)
        want = int(
            (Decimal(repr(x)) * 100).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )
        assert got == want == cents_true

    check()


@pytest.mark.slow
def test_ivf_nprobe_sweep_monotone_and_consistent_with_recall_eval(spark, sf_dir):
    pin_oracle_compat(spark)
    from calidad_del_aire_etl_spark.registry import load

    em = load(spark, sf_dir, "embeddings")
    sweep = {
        r["nprobe"]: r
        for r in ann.ivf_nprobe_sweep(
            em, "vec_id", "embedding", "label", lambda c: c < 10, k=5,
            nprobes=(1, 2, 3, 4),
        ).collect()
    }
    # recall is monotone non-decreasing in probe depth (candidate sets nest)
    recalls = [sweep[p]["recall"] for p in (1, 2, 3, 4)]
    assert recalls == sorted(recalls)
    assert all(0.0 <= r <= 1.0 for r in recalls)
    # the sweep's depth-2 point must agree with the independently
    # implemented single-setting recall_eval aggregated over queries
    per_q = ann.recall_eval(
        em, "vec_id", "embedding", "label", lambda c: c < 10, k=5, nprobe=2
    ).collect()
    hits = sum(r["n_hits"] for r in per_q)
    n_exact = sum(r["n_exact"] for r in per_q)
    assert sweep[2]["n_hits"] == hits and sweep[2]["n_exact"] == n_exact


@pytest.mark.slow
def test_ivf_nprobe_sweep_full_depth_reaches_bruteforce_recall(spark):
    pin_oracle_compat(spark)
    # probing EVERY cell = exact search over the whole corpus, so
    # recall at nprobe = |cells| must be 1.0
    rows = [(i, [float(i % 3 == 0) * 10 + i * 0.01, float(i % 3 == 1) * 10,
                 float(i % 3 == 2) * 10, 1.0], i % 3) for i in range(12)]
    em = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = {r["nprobe"]: r for r in ann.ivf_nprobe_sweep(
        em, "vec_id", "embedding", "label", lambda c: c < 4, k=3,
        nprobes=(1, 3),
    ).collect()}
    assert out[3]["recall"] == 1.0


def test_downsample_ltob_keeps_the_spike(spark):
    pin_oracle_compat(spark)
    import datetime as dt

    from calidad_del_aire_etl_spark.operators import analytics

    t0 = dt.datetime(2026, 1, 1)
    # flat series with one spike at position 4: bucket 0 (rows 1-3) is
    # flat, bucket 1 (rows 4-6) must select the spike, not its neighbors
    rows = [
        ("a", t0 + dt.timedelta(minutes=i), i, v)
        for i, v in enumerate([1.0, 1.0, 1.0, 1.0, 9.0, 1.0, 1.0])
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id bigint, value double"
    )
    out = analytics.downsample_ltob(ev, bucket_size=3).collect()
    assert [r["bucket"] for r in out] == [0, 1, 2]
    spike_row = [r for r in out if r["bucket"] == 1][0]
    assert spike_row["value"] == 9.0
    # the tail bucket holds only the edge point (NULL area) - still kept
    tail = [r for r in out if r["bucket"] == 2][0]
    assert tail["area"] is None and tail["value"] == 1.0


def test_downsample_ltob_reduces_to_one_row_per_bucket(spark, sf_dir):
    pin_oracle_compat(spark)
    from calidad_del_aire_etl_spark.operators import analytics
    from calidad_del_aire_etl_spark.registry import load

    ev = load(spark, sf_dir, "events")
    out = analytics.downsample_ltob(ev, bucket_size=100)
    n_series_rows = ev.filter(F.col("value").isNotNull()).groupBy("event_type").count().collect()
    expected = sum((r["count"] + 99) // 100 for r in n_series_rows)
    assert out.count() == expected
