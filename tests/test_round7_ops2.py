"""Unit tests for the round-7 batch-2 operators: benford_test,
gini_by_group, seasonal_decompose, gopher_rules, perplexity_buckets.
Cross-engine parity for their registry queries is covered by the
auto-discovering oracle sweep (test_oracle_parity.py); these pin the
SEMANTICS on hand-built frames — the Benford shares/χ² on a known digit
mix, Gini on closed-form distributions, the decomposition identity and
hour-of-day profile, each Gopher rule firing in isolation, and the
tercile boundaries of the perplexity buckets.
"""

from __future__ import annotations

import math

from calidad_del_aire_etl_spark.operators import analytics2, corpus, validation


def test_benford_shares_and_chi2(spark):
    # 30 values with first digit 1, 10 with digit 2, 10 with digit 9 —
    # mixed magnitudes so the log10/pow extraction is exercised
    vals = [1.5] * 10 + [123.0] * 10 + [0.019] * 10 + [2.5] * 10 + [900.0] * 10
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r["digit"]: r for r in validation.benford_test(df, "x").collect()}
    assert set(out) == {1, 2, 9}
    assert out[1]["n"] == 30 and out[1]["obs_share"] == 0.6
    assert out[2]["n"] == 10 and out[2]["obs_share"] == 0.2
    exp1 = math.log10(2.0)
    assert abs(out[1]["exp_share"] - round(exp1, 4)) < 1e-9
    chi1 = (30 - 50 * exp1) ** 2 / (50 * exp1)
    assert abs(out[1]["chi2_term"] - chi1) < 1e-3


def test_benford_ignores_nonpositive(spark):
    df = spark.createDataFrame([(0.0,), (-5.0,), (None,), (7.0,)], "x double")
    out = validation.benford_test(df, "x").collect()
    assert len(out) == 1 and out[0]["digit"] == 7 and out[0]["n"] == 1


def test_gini_uniform_and_concentrated(spark):
    # group "eq": all units equal → G = 0; group "one": one unit holds
    # everything → G = (n-1)/n = 0.75 for n=4
    rows = [("eq", u, 10.0) for u in range(4)]
    rows += [("one", 0, 100.0), ("one", 1, 0.0), ("one", 2, 0.0), ("one", 3, 0.0)]
    df = spark.createDataFrame(rows, "g string, u int, a double")
    out = {r["g"]: r for r in analytics2.gini_by_group(df, "g", "u", "a").collect()}
    assert out["eq"]["gini"] == 0.0
    assert abs(out["one"]["gini"] - 0.75) < 1e-9
    assert out["one"]["n_units"] == 4
    assert float(out["one"]["total_amount"]) == 100.0


def test_gini_sums_per_unit_before_ranking(spark):
    # unit 0 appears twice (60+40=100), unit 1 once (100) → equal → G=0
    df = spark.createDataFrame(
        [("g", 0, 60.0), ("g", 0, 40.0), ("g", 1, 100.0)], "g string, u int, a double"
    )
    out = analytics2.gini_by_group(df, "g", "u", "a").collect()
    assert len(out) == 1 and out[0]["gini"] == 0.0 and out[0]["n_units"] == 2


def test_seasonal_decompose_identity_and_profile(spark):
    # value = 10 + (1 if hour even else -1): zero trend slope, a clean
    # 2-hour season. With a full ±12h window the trend hovers near 10
    # and seasonal absorbs the alternation; value == trend+seasonal+resid
    # must hold exactly (post-rounding tolerance).
    rows = []
    for d in range(1, 5):
        for h in range(24):
            v = 10.0 + (1.0 if h % 2 == 0 else -1.0)
            rows.append(("a", f"2024-01-0{d} {h:02d}:13:00", v))
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(rows, "event_type string, ts string, value double")
    ev = ev.withColumn("ts", F.to_timestamp("ts"))
    out = analytics2.seasonal_decompose(ev).collect()
    assert len(out) == 96  # 4 days × 24 h, one row per hourly bucket
    for r in out:
        assert abs(r["value"] - (r["trend"] + r["seasonal"] + r["resid"])) < 5e-4
    # interior rows (full ±12 window, 13 even + 12 odd or vice versa):
    # trend ≈ 10 ± 1/25; the even-hour seasonal is positive, odd negative
    mids = [r for r in out if "2024-01-02" in r["hr"] or "2024-01-03" in r["hr"]]
    assert all(abs(r["trend"] - 10.0) < 0.05 for r in mids)
    even = [r for r in mids if int(r["hr"][11:13]) % 2 == 0]
    odd = [r for r in mids if int(r["hr"][11:13]) % 2 == 1]
    assert all(r["seasonal"] > 0.8 for r in even)
    assert all(r["seasonal"] < -0.8 for r in odd)


GOOD_TEXT = (
    "the quick brown fox jumps over that lazy dog and we have agreed "
    "to walk with them across the field of green grass every day "
) * 3  # ~60 words, mean word length ~4, no bullets, stopwords present


def _gopher(spark, texts):
    df = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)], "doc_id int, text string, source string"
    )
    rows = corpus.gopher_rules(df, "text", "source").collect()
    assert len(rows) == 1
    return rows[0]


def test_gopher_clean_doc_passes(spark):
    r = _gopher(spark, [GOOD_TEXT])
    assert r["n_docs"] == 1 and r["n_pass"] == 1 and r["pass_rate"] == 1.0


def test_gopher_each_rule_fires(spark):
    short = "too short"  # < 50 words
    long_words = " ".join(["pneumonoultramicroscopics"] * 60)  # mean len > 10
    symbols = GOOD_TEXT + " " + "#" * 40  # one '#'-heavy word, ratio > 0.1
    bullets = "\n".join(["- item one two"] * 10)  # 100 % bullet lines
    ellipsis = "\n".join([GOOD_TEXT[:40] + "..."] * 10)  # 100 % ellipsis ends
    numeric = " ".join(["12345"] * 60)  # 0 % alphabetic words
    nostop = " ".join(["zebra"] * 60)  # no stop words
    r = _gopher(spark, [short, long_words, symbols, bullets, ellipsis, numeric, nostop])
    assert r["n_docs"] == 7 and r["n_pass"] == 0
    assert r["fail_word_count"] >= 1
    assert r["fail_mean_word_len"] >= 1
    assert r["fail_symbol_ratio"] >= 1
    assert r["fail_bullet_lines"] >= 1
    assert r["fail_ellipsis_lines"] >= 1
    assert r["fail_alpha_words"] >= 2
    assert r["fail_stop_words"] >= 2


def test_gopher_null_text_excluded(spark):
    df = spark.createDataFrame(
        [(1, GOOD_TEXT, "s"), (2, None, "s")], "doc_id int, text string, source string"
    )
    r = corpus.gopher_rules(df, "text", "source").collect()[0]
    assert r["n_docs"] == 1


def test_perplexity_buckets_terciles(spark):
    # 9 docs in one lang: 3 made of the most common token, 3 medium,
    # 3 of rare tokens → buckets split 3/3/3 with head = most probable
    docs = []
    for i in range(3):
        docs.append((i, "common common common common", "en"))
    for i in range(3, 6):
        docs.append((i, f"common mid{i} mid{i}", "en"))
    for i in range(6, 9):
        docs.append((i, f"rare{i}a rare{i}b rare{i}c", "en"))
    df = spark.createDataFrame(docs, "doc_id int, text string, lang string")
    out = {
        r["bucket"]: r
        for r in corpus.perplexity_buckets(df, "doc_id", "text", "lang").collect()
    }
    assert set(out) == {"head", "middle", "tail"}
    assert all(out[b]["n_docs"] == 3 for b in out)
    assert (
        out["head"]["avg_log2_prob"]
        > out["middle"]["avg_log2_prob"]
        > out["tail"]["avg_log2_prob"]
    )
