"""Skew evidence for the heavy-hitter guards (r2 VERDICT #8).

Deliberately skewed synthetics — one shingle phrase in 30 % of documents,
one user owning 50 % of events — asserting that the Jaccard hot-shingle
cap and the salted join keep per-join-key (≈ per-task) input bounded,
not merely that results are correct. These are the invariants that keep
a 1000-executor run free of quadratic join islands and one-reducer
stragglers; bench-scale timing alone cannot distinguish a guarded plan
from an unguarded one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calidad_del_aire_etl_spark.operators import dedup, general

N_DOCS = 400
HOT_SHARE = 0.3  # the hot phrase appears in 30 % of docs
CAP = 10


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """Each doc is unique filler; 30 % additionally share one hot 3-gram."""
    hot = "shared boilerplate footer"
    rows = [
        (
            i,
            f"unique document body number {i} "
            + (hot if i < int(N_DOCS * HOT_SHARE) else f"tail words {i} end"),
        )
        for i in range(N_DOCS)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_cap_bounds_per_key_join_input(skewed_docs):
    """After the guard, no shingle key feeds more than CAP rows into the
    pair self-join — the per-key join island is ≤ CAP² pairs no matter
    how hot the corpus-level shingle is. Unguarded, the hot keys carry
    0.3·N rows each (a (0.3·N)² island)."""
    ex, _ = dedup.guarded_shingles(skewed_docs, "doc_id", "text", n=3, max_doc_freq=CAP)
    max_df = ex.groupBy("sg").count().agg(F.max("count")).collect()[0][0]
    assert max_df <= CAP

    ex_raw, _ = dedup.guarded_shingles(
        skewed_docs, "doc_id", "text", n=3, max_doc_freq=None
    )
    raw_max = ex_raw.groupBy("sg").count().agg(F.max("count")).collect()[0][0]
    assert raw_max >= int(N_DOCS * HOT_SHARE)  # the skew is real ungated


def test_jaccard_cap_kills_hot_only_pairs_keeps_real_dups(spark):
    """Docs related ONLY through the hot phrase must produce no pairs
    (at threshold 0 every surviving shared shingle yields a pair, so
    pair count is a direct probe of join fan-out); genuinely near-dup
    docs still pair because their non-hot shingles survive the cap."""
    hot = "the shared hot phrase here"
    rows = [(i, f"unique body {i} stuff {hot}") for i in range(40)]
    # planted near-dup pair related by non-hot content:
    rows += [
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
        (101, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.0, max_doc_freq=CAP
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (100, 101) in got
    # every hot-only pair is suppressed: the 40 hot docs share nothing else
    assert all(not (a < 40 and b < 40) for a, b in got)


N_EVENTS = 2000
SALTS = 8


@pytest.fixture(scope="module")
def skewed_events(spark):
    """One user owns 50 % of all events (worst-case join/groupBy skew)."""
    rows = [
        (i, (7 if i % 2 == 0 else i % 50), f"t{i % 5}", float(i % 100))
        for i in range(N_EVENTS)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )


def test_salted_join_bounds_per_task_input(skewed_events):
    """Joining on user_id, the hot user's 1000 rows land on ONE reducer
    unsalted. Salted, every (key, salt) cell — the unit a reducer task
    receives — must hold ≈ 1/SALTS of the hot key, within 2× of ideal."""
    dim = skewed_events.groupBy("user_id").agg(F.avg("value").alias("user_mean"))
    out = general.salted_join(
        skewed_events, dim, "user_id", "event_id", num_salts=SALTS, keep_salt=True
    )
    cells = out.groupBy("user_id", "__salt").count()
    hot_max = (
        cells.filter(F.col("user_id") == 7).agg(F.max("count")).collect()[0][0]
    )
    hot_total = skewed_events.filter(F.col("user_id") == 7).count()
    assert hot_total >= N_EVENTS // 2  # the skew is real
    assert hot_max <= 2 * hot_total / SALTS  # and the salt splits it

    # result parity with the plain join (guard changes physics, not rows)
    plain = skewed_events.join(dim, "user_id")
    assert (
        out.drop("__salt").exceptAll(plain).count() == 0
        and plain.exceptAll(out.drop("__salt")).count() == 0
    )


def test_unigram_logprob_head_guard_absorbs_hot_tokens(spark):
    """The Zipf-head guard: a token planted in EVERY doc must land in
    the broadcast head set (handled map-side), so the shuffled tail
    join never carries a key whose fan-out exceeds the head threshold —
    the last-reducer guard for the token→frequency join. Correctness is
    cross-checked against a direct single-join computation."""
    from calidad_del_aire_etl_spark.operators import corpus

    n = 300
    rows = [(i, f"the unique{i} filler{i % 7}") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        r["doc_id"]: (r["n_tokens"], r["mean_log2_prob"])
        for r in corpus.unigram_logprob(docs, "doc_id", "text", head_size=4).collect()
    }
    assert len(out) == n and all(v[0] == 3 for v in out.values())

    # reference: plain exploded join, same probabilities
    toks = docs.select("doc_id", F.explode(F.expr(
        corpus._TOKS.format(t="text"))).alias("tok"))
    freq = toks.groupBy("tok").count()
    total = float(freq.agg(F.sum("count")).collect()[0][0])
    ref = {
        r["doc_id"]: round(r["m"] + 1e-9, 4)
        for r in toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(F.avg(F.log2(F.col("count") / F.lit(total))).alias("m"))
        .collect()
    }
    for d, (_, got) in out.items():
        assert abs(got - ref[d]) < 1e-9, f"doc {d}: {got} vs {ref[d]}"

    # the skew invariant: every token whose doc-frequency exceeds the
    # head threshold is IN the head set, so the tail join's per-key
    # fan-out is bounded by the smallest head frequency
    head = (
        freq.orderBy(F.col("count").desc(), F.col("tok").asc()).limit(4).collect()
    )
    head_toks = {r["tok"] for r in head}
    min_head_freq = min(r["count"] for r in head)
    tail_max = (
        freq.filter(~F.col("tok").isin(head_toks))
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert "the" in head_toks
    assert tail_max <= min_head_freq


def test_aqe_skew_join_splits_hot_partition(spark):
    """The engine's OTHER skew lever: with AQE skew-join on (the session
    default), a sort-merge join whose left side has one key owning half
    the rows must compile to SortMergeJoin(skew=true) with an
    AQEShuffleRead marked skewed in the FINAL adaptive plan — proof the
    runtime guard is armed, not just configured, so an unsalted
    fact-fact join can't strand one straggler task at 100 TB.
    Thresholds are scaled down to test-sized data (production defaults
    target multi-GB partitions)."""
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
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        n = 400_000
        left = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 997).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(997).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").select(F.sum("v").alias("s"))
        j.collect()
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, (
            "AQE did not mark the hot partition as skewed:\n" + final_plan[:2000]
        )
    finally:
        for key, val in prev.items():
            spark.conf.set(key, val)


def test_dup_spans_window_verdict_under_hot_span(spark):
    """The r12 one-exchange window verdict (min(id) != max(id) per span
    hash) must stay correct when one boilerplate span dominates: 2,000
    docs share an identical 40-char boilerplate sentence (every one of
    its 32-char stride-1 sub-spans lands on ONE reducer partition),
    while each doc's remainder is unique. Every doc must flag the
    boilerplate spans as duplicated and nothing else; a singleton doc
    with no shared text must flag zero."""
    import pandas as pd

    from calidad_del_aire_etl_spark.operators import corpus

    boiler = "SHARED-BOILERPLATE sentence exactly here!"  # 41 chars
    rows = [
        (i, boiler + f" unique tail number {i:06d} with filler text")
        for i in range(2000)
    ]
    rows.append((99999, "a fully unique document with no shared spans x"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    out = {
        r["doc_id"]: r
        for r in corpus.dup_spans_exact(df, "doc_id", "text", span_len=32).collect()
    }
    assert len(out) == 2001
    # brute-force reference: span substring -> set of docs
    span_docs = {}
    for did, text in rows:
        for s in range(max(len(text) - 31, 1)):
            span_docs.setdefault(text[s : s + 32], set()).add(did)
    for did, text in rows:
        n = max(len(text) - 31, 1)
        want_dup = sum(
            1 for s in range(n) if len(span_docs[text[s : s + 32]]) >= 2
        )
        got = out[did]
        assert got["n_spans"] == n, (did, got)
        assert got["n_dup_spans"] == want_dup, (did, want_dup, got)
    # the boilerplate's spans are shared by all 2000 docs (one hot hash
    # group per span position on a single reducer) and the singleton
    # flags nothing
    assert out[99999]["n_dup_spans"] == 0
    assert out[0]["n_dup_spans"] > 0
