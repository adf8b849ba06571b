"""DAG orchestrator: ordering, retries, failure propagation, and the
air-quality DAG end-to-end (the reference's Airflow surface)."""

from __future__ import annotations

import tempfile

from calidad_del_aire_etl_spark.plans.orchestrator import Dag, air_quality_dag


def test_dag_runs_in_dependency_order_and_passes_values():
    dag = Dag("t")
    order = []

    @dag.task("a")
    def _a(**_):
        order.append("a")
        return 2

    @dag.task("b", upstream=["a"])
    def _b(x):
        order.append("b")
        return x * 10

    @dag.task("c", upstream=["a", "b"])
    def _c(x, y):
        order.append("c")
        return x + y

    res = dag.run()
    assert order == ["a", "b", "c"]
    assert res["c"].value == 22
    assert all(r.state == "success" for r in res.values())


def test_retry_then_succeed():
    dag = Dag("t")
    calls = {"n": 0}

    @dag.task("flaky", retries=3)
    def _f(**_):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    res = dag.run()
    assert res["flaky"].state == "success"
    assert res["flaky"].attempts == 3


def test_failure_skips_transitive_downstream():
    dag = Dag("t")

    @dag.task("a")
    def _a(**_):
        raise RuntimeError("boom")

    @dag.task("b", upstream=["a"])
    def _b(x):
        return x

    @dag.task("c", upstream=["b"])
    def _c(x):
        return x

    @dag.task("d")  # independent root still runs
    def _d(**_):
        return 1

    res = dag.run()
    assert res["a"].state == "failed" and "boom" in res["a"].error
    assert res["b"].state == "skipped" and res["c"].state == "skipped"
    assert res["d"].state == "success"


def test_unknown_upstream_rejected():
    dag = Dag("t")
    try:
        @dag.task("x", upstream=["nope"])
        def _x():
            pass
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_air_quality_dag_end_to_end(spark):
    with tempfile.TemporaryDirectory(prefix="aq_dag_") as d:
        # 5 stations × 10 days × 24 h = 1200 rows — clears the
        # reference's 1000-row validation gate (dag:396)
        dag = air_quality_dag(spark, d, num_days=10)
        res = dag.run()
        assert [r.state for r in res.values()] == ["success"] * 4
        report = res["validate"].value
        assert report["total_records"] >= 1000
        assert "null_warning" in report
        out = spark.read.parquet(f"{d}/daily")
        assert out.count() > 0
