"""Round-9 fixes for the two latent cross-engine divergences flagged by
VERDICT r8 #5: (a) ``snapshot_diff_sql`` must classify added/deleted via
presence markers, not ``o.<key> IS NULL`` — the two differ the moment a
key column is legitimately NULL; (b) ``benford_test`` must drop
non-finite values identically on both engines (NaN passes ``> 0`` in
both, and DuckDB's CAST(NaN AS BIGINT) aborts the whole query).

Each test hash-compares the Spark operator against its committed DuckDB
twin ON the degenerate input, via the same comparator the oracle gate
uses.
"""

from __future__ import annotations

from calidad_del_aire_etl_spark import oracle
from calidad_del_aire_etl_spark.operators import incremental, validation


def _duck():
    import duckdb

    return duckdb.connect()


def test_snapshot_diff_null_key_parity(spark):
    """A NULL-key row joins nothing on either engine, so the old-side
    copy must be 'deleted' and the new-side copy 'added' — the pre-fix
    twin classified the old-side copy as 'added' (o.k IS NULL)."""
    old_rows = [(None, 1.0), (1, 10.0), (2, 20.0)]
    new_rows = [(None, 1.0), (1, 11.0), (3, 30.0)]

    def fn(spark, _sf):
        old = spark.createDataFrame(old_rows, "k int, v double")
        new = spark.createDataFrame(new_rows, "k int, v double")
        return incremental.snapshot_diff(old, new, ["k"], ["v"])

    def values_sql(rows):
        lits = ", ".join(
            f"({'NULL' if k is None else k}, {v})" for k, v in rows
        )
        return f"SELECT CAST(k AS INTEGER) AS k, v FROM (VALUES {lits}) AS t(k, v)"

    twin = incremental.snapshot_diff_sql(
        values_sql(old_rows), values_sql(new_rows), ["k"], ["v"]
    )
    con = _duck()
    try:
        n, problems = oracle.compare_query(spark, con, fn, twin, "")
    finally:
        con.close()
    assert problems == [], problems
    # NULL-key: one deleted + one added; k=1 changed; k=2 deleted; k=3 added
    assert n == 5
    out = fn(spark, "").collect()
    null_key = sorted(r["change_type"] for r in out if r["k"] is None)
    assert null_key == ["added", "deleted"]


def test_benford_nonfinite_parity(spark):
    """NaN/±Inf inputs must vanish on BOTH engines instead of producing
    digit 0/10/NULL rows with ±Inf exp_share (Spark) or a hard CAST
    error (DuckDB)."""
    vals = [
        float("nan"), float("inf"), float("-inf"), 0.0, -3.0, None,
        7.0, 70.0, 0.071, 1.5,
    ]

    def fn(spark, _sf):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        return validation.benford_test(df, "x")

    lits = ", ".join(
        "(CAST('nan' AS DOUBLE))" if v != v
        else f"(CAST('{v}' AS DOUBLE))" if v in (float("inf"), float("-inf"))
        else "(CAST(NULL AS DOUBLE))" if v is None
        else f"(CAST({v} AS DOUBLE))"
        for v in vals
    )
    twin = validation.benford_test_sql(f"(VALUES {lits}) AS t(x)", "x")
    con = _duck()
    try:
        n, problems = oracle.compare_query(spark, con, fn, twin, "")
    finally:
        con.close()
    assert problems == [], problems
    out = {r["digit"]: r["n"] for r in fn(spark, "").collect()}
    assert out == {1: 1, 7: 3}  # 7.0, 70.0, 0.071 share digit 7; 1.5 → 1
    assert n == 2


def test_gini_hist_matches_exact_within_tolerance(spark):
    """The Lorenz-histogram Gini (the 100 TB swap) must track the exact
    rank-formula Gini within ~1/bins on a skewed distribution."""
    import random

    from calidad_del_aire_etl_spark.operators import analytics2

    rng = random.Random(7)
    rows = [
        ("g1", u, rng.paretovariate(1.5) * 100.0) for u in range(800)
    ] + [("g2", u, float(rng.randint(1, 1000))) for u in range(500)]
    df = spark.createDataFrame(rows, "g string, u int, a double")
    exact = {
        r["g"]: r["gini"]
        for r in analytics2.gini_by_group(df, "g", "u", "a").collect()
    }
    hist = {
        r["g"]: r["gini"]
        for r in analytics2.gini_by_group_hist(df, "g", "u", "a").collect()
    }
    assert set(hist) == set(exact)
    for g in exact:
        assert abs(hist[g] - exact[g]) < 0.01, (g, hist[g], exact[g])


def test_gini_hist_degenerate_all_equal(spark):
    """Zero-width distribution (all amounts equal) → G = 0 exactly,
    no div-by-zero from the width guard."""
    from calidad_del_aire_etl_spark.operators import analytics2

    df = spark.createDataFrame(
        [("g", u, 5.0) for u in range(10)], "g string, u int, a double"
    )
    out = analytics2.gini_by_group_hist(df, "g", "u", "a").collect()
    assert len(out) == 1 and out[0]["gini"] == 0.0
    assert out[0]["n_units"] == 10 and out[0]["total_amount"] == 50.0


def test_perplexity_buckets_approx_tracks_exact_terciles(spark):
    """Histogram-cut buckets (the 100 TB swap) must produce near-tercile
    bucket sizes and the same orientation (head = most probable)."""
    from calidad_del_aire_etl_spark.operators import corpus

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (
            i,
            " ".join(words[: 1 + i % len(words)] * (2 + i % 5))
            + (f" rare{i}" if i % 3 == 0 else ""),
            "es" if i % 2 == 0 else "en",
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = corpus.perplexity_buckets_approx(df, "doc_id", "text", "lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, buckets in by_lang.items():
        n = sum(r["n_docs"] for r in buckets.values())
        assert n == 60
        # near-tercile sizes (bin-straddle tolerance: half the docs of a
        # straddling bin can shift — generous band for 60 docs)
        for b in ("head", "middle", "tail"):
            assert b in buckets, (lang, buckets.keys())
            assert 5 <= buckets[b]["n_docs"] <= 40, (lang, b, buckets[b])
        # orientation: head holds the highest scores
        assert (
            buckets["head"]["min_log2_prob"]
            >= buckets["middle"]["max_log2_prob"] - 1e-9
        )
        assert (
            buckets["middle"]["min_log2_prob"]
            >= buckets["tail"]["max_log2_prob"] - 1e-9
        )


def test_dup_spans_exact_catches_offgrid_duplicate(spark):
    """A 40-char substring planted at offset 0 in doc 1 and offset 5 in
    doc 2: the strided operator (stride 16) sees no aligned span pair
    and reports zero duplication; the stride-1 variant must catch it."""
    from calidad_del_aire_etl_spark.operators import corpus

    shared = "the quick brown fox jumps over lazy dogs"  # 40 chars
    rows = [
        (1, shared + " unique continuation alpha beta gamma delta"),
        (2, "12345" + shared + " other ending entirely different here"),
        (3, "no duplication in this document at all whatsoever okay"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    strided = {
        r["doc_id"]: r["n_dup_spans"]
        for r in corpus.dup_spans(df, "doc_id", "text").collect()
    }
    exact = {
        r["doc_id"]: r["n_dup_spans"]
        for r in corpus.dup_spans_exact(df, "doc_id", "text").collect()
    }
    assert strided[1] == 0 and strided[2] == 0  # the gap, demonstrated
    # both docs continue with ' ' after the planted 40 chars, so the
    # true shared run is 41 chars -> 41-32+1 = 10 duplicated spans each
    assert exact[1] == 10 and exact[2] == 10
    assert exact[3] == 0


def test_dup_spans_exact_duckdb_parity(spark, tmp_path):
    """Hash parity of the double-polynomial span hash across engines on
    a corpus with off-grid duplicates, short docs, and NULL text."""
    import pandas as pd

    from calidad_del_aire_etl_spark import oracle, registry

    shared = "shared sentence that appears in two documents verbatim!"
    rows = [
        (1, shared + " plus a tail making doc one longer than others"),
        (2, "prefix-" + shared),
        (3, "short"),          # shorter than span_len -> one whole-doc span
        (4, None),              # NULL text drops out on both engines
        (5, "an entirely unique document with no duplicated spans at all"),
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    q = registry.queries()
    o = registry.oracle_sql()
    con = oracle.duck_connection(str(tmp_path))
    try:
        n, problems = oracle.compare_query(
            spark, con, q["corpus_dup_spans_exact"],
            o["corpus_dup_spans_exact"], str(tmp_path),
        )
    finally:
        con.close()
    assert problems == [], problems
    assert n == 4  # doc 4 (NULL) dropped


def test_plans_md_covers_every_headline_query():
    """PLANS.md freshness gate (VERDICT r7 #5 / r8 #4: the audit went
    three rounds stale while SURVEY §5 claimed per-round regeneration).
    There is no repo-side snapshot script to hook — the end-of-round
    commit is driver-made — so enforce it structurally: every HEADLINE
    query must have a row in PLANS.md, which fails the suite the moment
    a new headline query ships without `python tools/plan_audit.py >
    PLANS.md` being re-run."""
    from pathlib import Path

    from bench import HEADLINE

    plans = Path(__file__).resolve().parent.parent / "PLANS.md"
    rows = {
        line.split("|")[1].strip()
        for line in plans.read_text().splitlines()
        if line.startswith("|") and not line.startswith("|---")
    }
    missing = [q for q in HEADLINE if q not in rows]
    assert not missing, (
        f"PLANS.md is stale — regenerate with "
        f"`python tools/plan_audit.py > PLANS.md`; missing: {missing}"
    )
