"""Round-9 additions: cosine range search, Matryoshka truncation
recall, BPE pair statistics, vocabulary coverage."""

from __future__ import annotations

from calidad_del_aire_etl_spark.operators import ann, corpus
from calidad_del_aire_etl_spark.registry import load
from calidad_del_aire_etl_spark.session import pin_oracle_compat


def test_range_search_agrees_with_bruteforce(spark, sf_dir):
    """Range search at threshold t must return exactly the brute-force
    scored pairs with rounded cosine >= t — same scoring, different
    cut. Cross-check against an un-ranked rescore of the top-k path."""
    pin_oracle_compat(spark)
    em = load(spark, sf_dir, "embeddings")
    thr = 0.30
    rs = ann.range_search(em, "vec_id", "embedding", lambda c: c < 5, thr)
    got = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in rs.collect()}
    assert got, "range search returned nothing at a permissive threshold"
    assert all(c >= thr for c in got.values())
    # every k=3 exact top neighbor whose cosine clears the threshold is in
    bf = ann.bruteforce_topk(em, "vec_id", "embedding", lambda c: c < 5, k=3)
    for r in bf.collect():
        if r["cosine"] >= thr:
            assert (r["query_id"], r["neighbor_id"]) in got
            assert got[(r["query_id"], r["neighbor_id"])] == r["cosine"]


def test_range_search_set_equality_vs_unranked_rescore(spark, sf_dir):
    """COMPLETENESS, not just containment (ADVICE r10): the returned
    pair SET must equal an independent unranked rescore of every
    (query, corpus) pair — nothing above the threshold may be missing
    at any rank, and nothing below it may leak in. The rescore
    replicates Spark's fold order (sequential left-to-right sum) and
    r4's HALF_UP-with-nudge rounding so the comparison is exact."""
    import math

    pin_oracle_compat(spark)
    em = load(spark, sf_dir, "embeddings")
    thr = 0.30
    rs = ann.range_search(em, "vec_id", "embedding", lambda c: c < 5, thr)
    got = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in rs.collect()}

    vecs = {r["vec_id"]: r["embedding"] for r in em.collect()}

    def _r4(v: float) -> float:
        v = v + 1e-9
        s = -1.0 if v < 0 else 1.0
        return s * math.floor(abs(v) * 1e4 + 0.5) / 1e4

    def _cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    want = {}
    for qid, qv in vecs.items():
        if qid >= 5:
            continue
        for nid, nv in vecs.items():
            if nid == qid:
                continue
            c = _r4(_cos(qv, nv))
            if c >= thr:
                want[(qid, nid)] = c

    assert set(got) == set(want)
    assert got == want


def test_range_search_excludes_self_and_below_threshold(spark, sf_dir):
    pin_oracle_compat(spark)
    em = load(spark, sf_dir, "embeddings")
    rows = ann.range_search(em, "vec_id", "embedding", lambda c: c < 5, 0.5).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)
    assert all(r["cosine"] >= 0.5 for r in rows)


def test_matryoshka_full_prefix_recall_is_one(spark, sf_dir):
    """Truncating to the FULL dimension must reproduce the reference
    top-k exactly (recall 1.0) — pins that the slicing/tie-break path
    is identical to the reference scoring."""
    pin_oracle_compat(spark)
    em = load(spark, sf_dir, "embeddings")
    dim = len(em.select("embedding").first()[0])
    out = ann.matryoshka_recall(
        em, "vec_id", "embedding", lambda c: c < 5, k=5, dims=(4, dim)
    ).collect()
    by_dim = {r["dim"]: r for r in out}
    assert set(by_dim) == {4, dim}
    assert by_dim[dim]["recall"] == 1.0
    assert by_dim[dim]["hits"] == by_dim[dim]["possible"]
    # truncated recall is a valid fraction and the bookkeeping adds up
    assert 0.0 <= by_dim[4]["recall"] <= 1.0
    assert by_dim[4]["hits"] <= by_dim[4]["possible"]
    assert by_dim[4]["possible"] == 5 * 5  # k per query × |queries|


def test_bpe_pair_counts_hand_checked(spark):
    """Tiny hand-computable corpus: 'ab ab b' → word freqs ab:2, b:1 →
    pairs ab:2, b|:3 (two from 'ab', one from 'b')."""
    pin_oracle_compat(spark)
    df = spark.createDataFrame([("ab ab b",), ("",)], ["text"])
    rows = corpus.bpe_pair_counts(df, "text", k=10).collect()
    counts = {r["pair"]: r["pair_count"] for r in rows}
    assert counts == {"ab": 2, "b|": 3}


def test_bpe_pair_counts_end_of_word_marker(spark):
    """Every word contributes exactly len(word) pairs (interior bigrams
    + terminal marker), so total pair mass = total characters."""
    pin_oracle_compat(spark)
    df = spark.createDataFrame([("spark spark sql",)], ["text"])
    rows = corpus.bpe_pair_counts(df, "text", k=100).collect()
    total = sum(r["pair_count"] for r in rows)
    assert total == 2 * len("spark") + len("sql")
    counts = {r["pair"]: r["pair_count"] for r in rows}
    assert counts["k|"] == 2 and counts["l|"] == 1 and counts["sp"] == 2


def test_vocab_coverage_hand_checked(spark):
    """'a a a b b c' → top-1 covers 3/6, top-2 covers 5/6, top-3 all."""
    pin_oracle_compat(spark)
    df = spark.createDataFrame([("a a a b b c",)], ["text"])
    rows = corpus.vocab_coverage(df, "text", top_ns=(1, 2, 3)).collect()
    by_n = {r["top_n"]: r for r in rows}
    assert by_n[1]["covered_tokens"] == 3 and by_n[1]["total_tokens"] == 6
    assert by_n[2]["covered_tokens"] == 5
    assert by_n[3]["covered_tokens"] == 6
    assert by_n[3]["coverage"] == 1.0 and by_n[3]["oov_rate"] == 0.0
    assert by_n[1]["coverage"] == 0.5


def test_vocab_coverage_monotone_on_corpus(spark, sf_dir):
    pin_oracle_compat(spark)
    docs = load(spark, sf_dir, "documents")
    rows = corpus.vocab_coverage(docs, "text", top_ns=(10, 50, 200)).collect()
    assert [r["top_n"] for r in rows] == [10, 50, 200]
    covs = [r["coverage"] for r in rows]
    assert covs == sorted(covs), "coverage must be non-decreasing in N"
    assert all(0.0 <= c <= 1.0 for c in covs)
    totals = {r["total_tokens"] for r in rows}
    assert len(totals) == 1, "total token count is a corpus constant"
