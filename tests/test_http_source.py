"""HTTP-batch extract source: injected fetcher stub, no network."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from calidad_del_aire_etl_spark.sources.readers import read_http_json

SCHEMA = T.StructType(
    [
        T.StructField("station", T.StringType()),
        T.StructField("pm25", T.DoubleType()),
    ]
)


def test_http_json_fetches_parses_and_quarantines(spark):
    pages = {
        "http://api.test/page1": json.dumps(
            [{"station": "A", "pm25": 12.5}, {"station": "B", "pm25": 30.1}]
        ),
        "http://api.test/page2": json.dumps([{"station": "C", "pm25": 7.0}]),
        "http://api.test/empty": "[]",
    }

    def stub(url: str) -> str:
        if url in pages:
            return pages[url]
        raise ConnectionError("503 service unavailable")

    good, bad = read_http_json(
        spark,
        list(pages) + ["http://api.test/dead"],
        SCHEMA,
        fetcher=stub,
        max_retries=1,
        retry_backoff_s=0.0,
    )
    rows = {(r.station, r.pm25) for r in good.collect()}
    assert rows == {("A", 12.5), ("B", 30.1), ("C", 7.0)}
    failures = bad.collect()
    assert len(failures) == 1
    assert failures[0].url == "http://api.test/dead"
    assert "503" in failures[0].error


def test_http_json_retries_transient_failures(spark):
    """First call per URL fails, retry succeeds — the row must land in
    the good side with no dead-letter entry."""
    from collections import defaultdict

    calls = defaultdict(int)

    def flaky(url: str) -> str:
        calls[url] += 1
        if calls[url] == 1:
            raise TimeoutError("transient")
        return json.dumps([{"station": "X", "pm25": 1.0}])

    good, bad = read_http_json(
        spark,
        ["http://api.test/a", "http://api.test/b"],
        SCHEMA,
        fetcher=flaky,
        max_retries=2,
        retry_backoff_s=0.0,
    )
    assert good.count() == 2
    assert bad.count() == 0


def test_http_json_fetch_runs_distributed(spark, tmp_path):
    """The fetch must run executor-side (mapInPandas over a repartitioned
    URL relation, not a driver loop) and be eagerly checkpointed so both
    consumers read the materialized blocks without re-fetching. Executor
    workers are separate processes, so the probe appends to a shared file
    (local-mode executors share the driver's filesystem)."""
    probe_dir = str(tmp_path)

    def counting(url: str) -> str:
        import os
        import uuid

        with open(os.path.join(probe_dir, f"{uuid.uuid4().hex}.log"), "w") as f:
            f.write(url)
        return "[]"

    good, bad = read_http_json(
        spark, [f"http://api.test/{i}" for i in range(8)], SCHEMA, fetcher=counting
    )
    # lineage is truncated at the eager localCheckpoint: consumers scan
    # the materialized blocks, proving the fetch cannot re-run per branch
    plan = good._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    assert good.count() == 0 and bad.count() == 0
    fetched = [open(p).read() for p in tmp_path.glob("*.log")]
    # each URL fetched exactly once despite two downstream consumers
    assert sorted(fetched) == sorted(f"http://api.test/{i}" for i in range(8))
