from __future__ import annotations

import pytest

from calidad_del_aire_etl_spark.operators import ann
from calidad_del_aire_etl_spark.registry import load
from calidad_del_aire_etl_spark.session import pin_oracle_compat


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    """The LSH path trades recall for candidate-set size; on the testdata
    it must still recover a reasonable share of true neighbors and every
    returned neighbor must be genuinely in the query's bucket ordering."""
    pin_oracle_compat(spark)
    em = load(spark, sf_dir, "embeddings")
    bf = ann.bruteforce_topk(em, "vec_id", "embedding", lambda c: c < 10, k=5)
    ls = ann.lsh_topk(em, "vec_id", "embedding", lambda c: c < 10, k=5)
    truth = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in ls.collect()}
    assert len(approx) > 0
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"


def test_bruteforce_ranks_are_dense_and_bounded(spark, sf_dir):
    pin_oracle_compat(spark)
    em = load(spark, sf_dir, "embeddings")
    rows = ann.bruteforce_topk(em, "vec_id", "embedding", lambda c: c < 3, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        cosines = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != q for r in rs)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with nprobe=2 of 10 cells scans ~20% of the corpus per query;
    recall against exact brute force must stay useful."""
    pin_oracle_compat(spark)
    em = load(spark, sf_dir, "embeddings")
    bf = ann.bruteforce_topk(em, "vec_id", "embedding", lambda c: c < 10, k=5)
    iv = ann.ivf_topk(em, "vec_id", "embedding", "label", lambda c: c < 10, k=5, nprobe=2)
    truth = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in iv.collect()}
    assert len(approx) > 0
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.2, f"IVF recall collapsed: {recall}"


def test_ivf_centroids_shape(spark, sf_dir):
    pin_oracle_compat(spark)
    em = load(spark, sf_dir, "embeddings")
    cents = ann.ivf_centroids(em, "embedding", "label").collect()
    assert len(cents) == em.select("label").distinct().count()
    assert all(len(r["cv"]) == 64 for r in cents)


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    """Spark Lloyd's loop == NumPy Lloyd's loop (same deterministic
    init, same iteration count) on the real embeddings table."""
    import numpy as np
    from calidad_del_aire_etl_spark.operators import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k, iters = 4, 3
    cents, assigned = ann.kmeans_fit(emb, "vec_id", "embedding", k=k, iters=iters)

    pdf = emb.orderBy("vec_id").toPandas()
    X = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
    C = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        for i in range(k):
            if (lab == i).any():
                C[i] = X[lab == i].mean(axis=0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    lab = d.argmin(axis=1)

    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    want = dict(zip(pdf["vec_id"].tolist(), lab.tolist()))
    mismatches = sum(1 for i in got if got[i] != want[i])
    assert mismatches <= len(got) * 0.01  # float-order tolerance


def test_kmeans_summary_covers_all_points(spark, sf_dir):
    from calidad_del_aire_etl_spark.operators import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ann.kmeans_summary(emb, "vec_id", "embedding", k=4, iters=2)
    rows = out.collect()
    assert sum(r["n_points"] for r in rows) == emb.count()
    assert all(r["mean_sq_dist"] >= 0 for r in rows)


def test_sq_recall_vs_bruteforce(spark, sf_dir):
    """int8 scalar quantization distorts cosine far less than LSH
    bucketing, so the top-5 sets must overlap the exact baseline
    heavily (and perfectly-quantizable ties aside, usually match)."""
    pin_oracle_compat(spark)
    em = load(spark, sf_dir, "embeddings")
    bf = ann.bruteforce_topk(em, "vec_id", "embedding", lambda c: c < 10, k=5)
    sq = ann.sq_topk(em, "vec_id", "embedding", lambda c: c < 10, k=5)
    truth = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in sq.collect()}
    assert len(approx) == len(truth)
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.8, f"SQ recall collapsed: {recall}"


def test_sq_codes_bounded_int8(spark, sf_dir):
    """Every quantized code must fit int8: |q_i| <= 127, and each
    vector's max |q_i| must BE 127 (the scale is max-abs)."""
    from pyspark.sql import functions as F

    pin_oracle_compat(spark)
    em = load(spark, sf_dir, "embeddings")
    codes = em.select(
        F.expr(ann.SQ_QUANT.format(v="embedding")).alias("code")
    ).select(
        F.expr("aggregate(code, cast(0 as bigint), (a, x) -> greatest(a, abs(x)))").alias("mx")
    )
    lo, hi = codes.agg(F.min("mx"), F.max("mx")).collect()[0]
    assert hi <= 127 and lo == 127


def test_pca_project_spectral_invariants(spark):
    """On data with a planted dominant direction, pc1 must capture it:
    projection variances come out in descending order, pc1's variance
    dominates, and projections are centered (mean ~ 0). Deterministic
    across runs (sign canonicalized)."""
    import numpy as np

    rng = np.random.default_rng(7)
    d, n = 8, 400
    direction = np.ones(d) / np.sqrt(d)
    base = rng.normal(0, 0.05, size=(n, d)) + np.outer(
        rng.normal(0, 1.0, size=n), direction
    )
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ann.pca_project(df, "vec_id", "embedding", k=3)
    arr = np.array([[r["pc1"], r["pc2"], r["pc3"]] for r in out.collect()])
    var = arr.var(axis=0)
    assert var[0] > var[1] >= var[2]
    assert var[0] > 5 * var[1]  # the planted direction dominates
    assert np.allclose(arr.mean(axis=0), 0.0, atol=1e-2)  # centered

    out2 = ann.pca_project(df, "vec_id", "embedding", k=3)
    arr2 = np.array([[r["pc1"], r["pc2"], r["pc3"]] for r in out2.collect()])
    assert np.array_equal(arr, arr2)  # run-to-run determinism


def test_pca_project_rejects_empty_and_ragged(spark):
    """Empty input and ragged vector lengths must fail loudly — the
    covariance normalization silently skews otherwise (r3 ADVICE)."""

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="no non-empty vectors"):
        ann.pca_project(empty, "vec_id", "embedding", k=2)

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="ragged"):
        ann.pca_project(ragged, "vec_id", "embedding", k=2)


def test_pq_distance_fidelity_and_recall_above_chance(spark, sf_dir):
    """What PQ actually guarantees is that the asymmetric distance
    approximates true L2 — so the pin is (a) a positive rank
    correlation between pq_dist and the exact L2 distance over a
    query's full candidate list, and (b) top-5 recall vs the exact-L2
    baseline comfortably above chance. (The testdata embeddings are
    near-isotropic and the label-mean codebook is deliberately a
    deterministic training stand-in, so ABSOLUTE recall is weak by
    construction — the structural contract, not a tuned recall number,
    is what this test protects.) Ranks must be dense, distances
    non-negative."""
    import numpy as np

    pin_oracle_compat(spark)
    em = load(spark, sf_dir, "embeddings")
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in em.collect()}
    n = len(vecs)
    truth = set()
    for qid in (i for i in vecs if i < 10):
        d = sorted(
            (float(np.sum((vecs[qid] - v) ** 2)), nid)
            for nid, v in vecs.items() if nid != qid
        )[:5]
        truth |= {(qid, nid) for _, nid in d}
    # full candidate list for one query: k = n-1 exposes every distance
    full = ann.pq_topk(
        em, "vec_id", "embedding", "label", lambda c: c == 0, k=n - 1
    ).collect()
    exact = {nid: float(np.sum((vecs[0] - v) ** 2)) for nid, v in vecs.items() if nid != 0}
    pq_d = np.array([r["pq_dist"] for r in full])
    ex_d = np.array([exact[r["neighbor_id"]] for r in full])
    rho = np.corrcoef(np.argsort(np.argsort(pq_d)), np.argsort(np.argsort(ex_d)))[0, 1]
    assert rho > 0.2, f"ADC distance lost the L2 geometry: rho={rho}"
    pq = ann.pq_topk(em, "vec_id", "embedding", "label", lambda c: c < 10, k=5)
    rows = pq.collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(approx) > 0
    recall = len(truth & approx) / len(truth)
    chance = 5.0 / (n - 1)
    assert recall >= 2 * chance, f"PQ recall not above chance: {recall} vs {chance}"
    by_q = {}
    for r in rows:
        assert r["pq_dist"] >= 0
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_ivfpq_subset_of_ivf_candidates_and_dense_ranks(spark, sf_dir):
    """IVF+PQ's structural contract: it ranks PQ distances over EXACTLY
    the candidate set ivf_topk would scan (same coarse assignment, same
    nprobe cells), so every returned neighbor must live in one of the
    query's nprobe cells, ranks are dense, distances non-negative, and
    recall vs exact L2 stays above chance."""
    import numpy as np

    pin_oracle_compat(spark)
    em = load(spark, sf_dir, "embeddings")
    rows = ann.ivfpq_topk(
        em, "vec_id", "embedding", "label", lambda c: c < 10, k=5, nprobe=2
    ).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["pq_dist"] >= 0
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
    # recall vs exact L2 above chance
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in em.collect()}
    n = len(vecs)
    truth = set()
    for qid in (i for i in vecs if i < 10):
        d = sorted(
            (float(np.sum((vecs[qid] - v) ** 2)), nid)
            for nid, v in vecs.items() if nid != qid
        )[:5]
        truth |= {(qid, nid) for _, nid in d}
    approx = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(truth & approx) / len(truth)
    chance = 5.0 / (n - 1)
    assert recall >= 2 * chance, f"IVFPQ recall not above chance: {recall} vs {chance}"


def test_sq_dists_expansion_matches_broadcast_fold():
    """The GEMM expansion and the elementwise broadcast fold must agree
    exactly AFTER r4 rounding (the only form any consumer sees), and
    identical vectors must come out exactly zero, never negative."""
    import numpy as np

    from calidad_del_aire_etl_spark.operators import ann

    rng = np.random.default_rng(7)
    V = rng.normal(0, 10, (500, 64))
    C = rng.normal(0, 10, (8, 64))
    expansion = ann._sq_dists(V, C)
    fold = ann._np_round4(((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
    assert np.array_equal(expansion, fold)
    same = ann._sq_dists(C, C)
    assert (np.diag(same) == 0.0).all() and (same >= 0).all()


@pytest.mark.slow
def test_knn_label_eval_planted_clusters(spark):
    """#31o: two well-separated label clusters → the k-NN vote recovers
    every query's label (accuracy 1.0 per label); a query planted at a
    50/50 vote boundary resolves by the deterministic smallest-label
    tie-break."""
    import numpy as np

    from calidad_del_aire_etl_spark.operators import ann

    rng = np.random.RandomState(11)
    a, b = rng.randn(8), rng.randn(8)
    rows = []
    for i in range(20):
        rows.append((i, [float(x) for x in a + 0.01 * rng.randn(8)], 0))
    for i in range(20, 40):
        rows.append((i, [float(x) for x in b + 0.01 * rng.randn(8)], 1))
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = {
        r["label"]: (r["n_queries"], r["n_correct"], r["accuracy"])
        for r in ann.knn_label_eval(
            df, "vec_id", "embedding", "label", lambda c: c % 4 == 0, k=5
        ).collect()
    }
    # queries: ids 0,4,...,36 → 5 per cluster... ids 0..36 step 4 =
    # 10 ids, 5 in each label
    assert out[0] == (5, 5, 1.0) and out[1] == (5, 5, 1.0)

    # tie: k=2 neighbors from different labels → vote 1-1 → smallest
    # label wins. Plant a query equidistant between one vector of each
    # label; exclude everything else.
    tie = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),
            (1, [0.0, 1.0], 3),
            (2, [float(2 ** -0.5), float(2 ** -0.5)], 9),
        ],
        "vec_id bigint, embedding array<float>, label int",
    )
    got = ann.knn_label_eval(
        tie, "vec_id", "embedding", "label", lambda c: c == 2, k=2
    ).collect()
    # predicted label is min(3, 7) = 3 != 9 → 0 correct for label 9
    assert [(r["label"], r["n_correct"]) for r in got] == [(9, 0)]
