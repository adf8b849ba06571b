"""Round-13 fixes pinned at unit scale.

1. kpis twin NULL-count parity (ADVICE r12): the driver fixtures carry
   zero NULL values, so the COUNT(*)-vs-COUNT(value) divergence in the
   DuckDB twin was latent — this fixture makes it live.
2. bpe_merges chained-replace rewrite (VERDICT r12 #3): dropping the
   per-round localCheckpoint must not change the merge table.
"""

from __future__ import annotations

import datetime

import pandas as pd

from calidad_del_aire_etl_spark import oracle
from calidad_del_aire_etl_spark.session import pin_oracle_compat


def _null_bearing_events_parquet(tmp_path):
    """Events where NULL values are placed to flip every kpis output if
    either engine counts them: one user (7) is all-NULL (argmax
    denominator), one day (Jan 3) is NULL-heavy enough that COUNT(*)
    would clear the unhealthy threshold while COUNT(value) does not."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(4):
        for i in range(12):
            val = 90.0 + i if (day == 1 and i < 8) else 10.0 + i
            # Jan 3: 9 of 12 values NULL, survivors low -> day healthy
            # under COUNT(value), unhealthy under COUNT(*) semantics
            if day == 2 and i < 9:
                val = None
            # user 7 contributes ONLY NULLs (every day)
            uid = 7 if i == 11 else (i % 4)
            if uid == 7:
                val = None
            rows.append(
                (eid, base + datetime.timedelta(days=day, minutes=13 * i),
                 uid, "view", val, "{}")
            )
            eid += 1
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


def test_kpis_twins_agree_on_null_values(spark, tmp_path):
    """dash_kpis Spark-vs-twin hash parity on a NULL-bearing value
    column: both engines must use the NON-NULL count in the overall
    avg, the per-day unhealthy test, and the worst-group argmax."""
    from calidad_del_aire_etl_spark import registry

    pin_oracle_compat(spark)
    sf = _null_bearing_events_parquet(tmp_path)
    q = registry.queries()
    o = registry.oracle_sql()
    con = oracle.duck_connection(sf)
    try:
        n, problems = oracle.compare_query(
            spark, con, q["dash_kpis"], o["dash_kpis"], sf
        )
    finally:
        con.close()
    assert problems == [], f"dash_kpis: {problems}"
    assert n == 1


def test_kpis_fixture_actually_discriminates(spark, tmp_path):
    """Self-check: on this fixture a COUNT(*)-denominator twin (the
    pre-fix SQL) must MISMATCH — otherwise the parity test above proves
    nothing about NULL handling."""
    from calidad_del_aire_etl_spark import registry
    from calidad_del_aire_etl_spark.operators.analytics import kpis_sql

    pin_oracle_compat(spark)
    sf = _null_bearing_events_parquet(tmp_path)
    fixed = kpis_sql("events", "ts", "user_id", "value", unhealthy_threshold=82.0)
    broken = fixed.replace("COUNT(value)", "COUNT(*)")
    assert broken != fixed
    con = oracle.duck_connection(sf)
    try:
        n, problems = oracle.compare_query(
            spark, con, registry.queries()["dash_kpis"], broken, sf
        )
    finally:
        con.close()
    assert problems, "fixture failed to discriminate COUNT(*) from COUNT(value)"


def test_compare_query_exposes_oracle_frame(spark, tmp_path):
    """compare_query(out=...) hands back the raw twin frame so callers
    can run degenerate_frame without re-executing the twin (ADVICE
    r12); degenerate_result stays as the re-executing fallback."""
    sf = _null_bearing_events_parquet(tmp_path)
    con = oracle.duck_connection(sf)
    try:
        got: dict = {}
        sql = "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events"
        n, problems = oracle.compare_query(
            spark,
            con,
            lambda s, d: s.read.parquet(f"{d}/events.parquet").selectExpr(
                "CAST(count(*) AS LONG) AS n"
            ),
            sql,
            sf,
            out=got,
        )
        assert problems == []
        assert "oracle_df" in got and len(got["oracle_df"]) == 1
        assert not oracle.degenerate_frame(got["oracle_df"])
        assert oracle.degenerate_frame(got["oracle_df"].iloc[0:0])
        assert oracle.degenerate_result(con, sql) == oracle.degenerate_frame(
            got["oracle_df"]
        )
    finally:
        con.close()


def test_bpe_merges_matches_checkpointed_reference(spark):
    """The chained-replace trainer loop (no per-round localCheckpoint)
    must produce the identical merge table to a straightforward
    materialize-per-round run on a corpus with known merge order."""
    from calidad_del_aire_etl_spark.operators import corpus

    texts = ["low lower lowest", "low low newer newest", "wider wide low"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    got = corpus.bpe_merges(df, "text", n_merges=4).collect()
    assert [r["step"] for r in got] == [1, 2, 3, 4]
    # step 1: 'lo' is the most frequent adjacent pair (low×4 +
    # lower + lowest all share l+o → wf-weighted count 6)
    assert got[0]["pair_left"] == "l" and got[0]["pair_right"] == "o"
    assert got[0]["merged"] == "lo" and got[0]["pair_count"] == 6
    # step 2 merges lo+w over the REPLACED vocab of step 1 — proves the
    # chained replace actually applied
    assert (got[1]["pair_left"], got[1]["pair_right"]) == ("lo", "w")
    assert got[1]["pair_count"] == 6
    # merge counts are non-increasing under a deterministic tie-break
    counts = [r["pair_count"] for r in got]
    assert counts == sorted(counts, reverse=True)


def test_ratio_report_overlay_resolves_rounds_in_order():
    """The SF10-ledger overlay: rN_updates apply in ROUND order (r9
    before r13 despite lexicographic order), dict entries update both
    postures, floats update spark only, and plain bench files pass
    through unchanged."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "ratio_report", os.path.join(repo, "tools", "ratio_report.py")
    )
    rr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rr)

    bench = {
        "queries": {"a": 10.0, "b": 5.0},
        "r9_updates": {"queries": {"a": {"spark_pair": 9.0, "duck_pair": 3.0}}},
        "r13_updates": {"queries": {
            "a": {"spark_pair": 7.0, "warm_s": 4.0},
            "b": {"bucketed_warm_s": 3.5},
        }},
        "r14_updates": {"queries": {"b": 4.0}},
    }
    base = {"queries": {"a": 2.0, "b": 1.0}}
    sq, dq, warm, bkt = rr._overlay(bench, base)
    assert sq == {"a": 7.0, "b": 4.0}      # r14 wins over r13; float form ok
    assert dq == {"a": 3.0, "b": 1.0}      # duck_pair override sticks
    assert warm == {"a": 4.0}
    assert bkt == {"b": 3.5}               # r14 bucketed posture column
    sq2, dq2, warm2, bkt2 = rr._overlay({"queries": {"x": 1.0}}, base)
    assert sq2 == {"x": 1.0} and dq2 == base["queries"]
    assert warm2 == {} and bkt2 == {}
