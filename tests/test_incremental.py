"""Dynamic-partition-overwrite incremental rollup: only the batch's
date partitions change; untouched partitions keep their files."""

from __future__ import annotations

import datetime as dt
import glob
import os

from calidad_del_aire_etl_spark.operators import incremental


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )


def _t(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_incremental_overwrites_only_touched_dates(spark, tmp_path):
    path = str(tmp_path / "daily")
    base = _ev(spark, [
        (1, _t(1), 1, 10.0),
        (2, _t(2), 1, 20.0),
        (3, _t(3), 1, 30.0),
    ])
    incremental.write_daily_full(incremental.daily_rollup(base), path)

    day1_files = sorted(glob.glob(f"{path}/date=2024-01-01/*.parquet"))
    day1_mtimes = [os.path.getmtime(f) for f in day1_files]

    # day-2 reprocess: full slice for that date (two events now)
    batch = _ev(spark, [(2, _t(2), 1, 20.0), (9, _t(2, 5), 1, 5.0)])
    touched = incremental.incremental_daily_update(spark, batch, path)
    assert touched == ["2024-01-02"]

    # day 1 files untouched byte-for-byte
    assert sorted(glob.glob(f"{path}/date=2024-01-01/*.parquet")) == day1_files
    assert [os.path.getmtime(f) for f in day1_files] == day1_mtimes

    # partition-column type inference reads `date=` dirs back as DATE
    out = {
        (str(r["date"]), r["user_id"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(path).collect()
    }
    assert out[("2024-01-02", 1)] == (2, 25.0)  # replaced, not appended
    assert out[("2024-01-01", 1)] == (1, 10.0)
    assert out[("2024-01-03", 1)] == (1, 30.0)


def test_static_mode_restored_after_write(spark, tmp_path):
    path = str(tmp_path / "daily2")
    incremental.incremental_daily_update(spark, _ev(spark, [(1, _t(1), 1, 1.0)]), path)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic"
    )
