"""Schedule / catch-up semantics (no Spark, no wall-clock sleeps)."""

from __future__ import annotations

from datetime import datetime, timedelta

from calidad_del_aire_etl_spark.plans.orchestrator import (
    Dag,
    Schedule,
    ScheduledDag,
)


def d(day, hour=8, minute=0):
    return datetime(2024, 1, day, hour, minute)


def counting_dag(log):
    dag = Dag("t")

    @dag.task("step")
    def _step(**seed):
        log.append(seed["logical_date"])
        return seed["logical_date"]

    return dag


def test_fire_times_window_fires_at_end():
    s = Schedule.daily(d(1), hour=8)
    assert s.fire_times(after=d(1) - timedelta(days=1), now=d(1, 7)) == []
    assert s.fire_times(after=d(1) - timedelta(days=1), now=d(2, 9)) == [d(2)]


def test_catchup_replays_missed_windows_in_order():
    log = []
    sd = ScheduledDag(counting_dag(log), Schedule.daily(d(1), hour=8), catchup=True)
    runs = sd.run_pending(now=d(2, 9))
    assert [r.logical_date for r in runs] == [d(2)]
    # the scheduler host goes down for two days, then catches up
    runs = sd.run_pending(now=d(5, 8, 30))
    assert [r.logical_date for r in runs] == [d(3), d(4), d(5)]
    assert all(r.state == "success" for r in runs)
    assert log == [d(2), d(3), d(4), d(5)]  # oldest-first, exactly once


def test_no_catchup_runs_latest_only():
    log = []
    sd = ScheduledDag(counting_dag(log), Schedule.daily(d(1), hour=8), catchup=False)
    runs = sd.run_pending(now=d(5, 9))
    assert [(r.logical_date, r.state) for r in runs] == [
        (d(2), "caught_up_skipped"),
        (d(3), "caught_up_skipped"),
        (d(4), "caught_up_skipped"),
        (d(5), "success"),
    ]
    assert log == [d(5)]
    # next poll has nothing new
    assert sd.run_pending(now=d(5, 10)) == []


def test_failed_window_does_not_block_later_windows():
    calls = []
    dag = Dag("flaky")

    @dag.task("a", retries=1)
    def _a(**seed):
        calls.append(seed["logical_date"])
        if seed["logical_date"] == d(3):
            raise RuntimeError("boom")
        return 1

    @dag.task("b", upstream=["a"])
    def _b(a):
        return a + 1

    sd = ScheduledDag(dag, Schedule.daily(d(1), hour=8), catchup=True)
    runs = sd.run_pending(now=d(4, 9))
    states = {r.logical_date: r.state for r in runs}
    assert states == {d(2): "success", d(3): "failed", d(4): "success"}
    bad = [r for r in runs if r.logical_date == d(3)][0]
    assert bad.results["a"].attempts == 2  # retried once
    assert bad.results["b"].state == "skipped"  # skip-propagated
    assert calls.count(d(3)) == 2


def test_every_n_minutes_schedule():
    s = Schedule.every(d(1, 8), minutes=15)
    got = s.fire_times(after=d(1, 8), now=d(1, 9))
    assert got == [d(1, 8, 15), d(1, 8, 30), d(1, 8, 45), d(1, 9)]
