"""Structured Streaming jobs (SURVEY §2 #38-40).

The reference's "real-time alternative" is a 15-minute Airflow cron
(README §Scheduling). Spark-first that's a streaming query: file-source
ingest → watermark → windowed aggregation, with
``applyInPandasWithState`` for the custom stateful operator the DSL
can't express. Tests drive these with the file source +
``processAllAvailable()`` so semantics (late data, state carry-over
across batches) are asserted synchronously.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as PSWindow
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

# Test-only crash injection (round-5 VERDICT #4): the crash-replay
# pytests set this to a callable invoked at named points inside the
# foreachBatch commit protocols; raising there kills the RUNNING query
# mid-epoch (foreachBatch runs on the driver, so the exception fails the
# streaming query like any sink crash), after which the test restarts
# from the same checkpoint and asserts convergence. No-op in production.
_test_crash_hook = None


def _crash_point(site: str, batch_id: int) -> None:
    if _test_crash_hook is not None:
        _test_crash_hook(site, batch_id)


def read_events_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """#38 — schema'd file-source stream (one file per micro-batch in
    tests; swap for kafka/kinesis in production — same downstream plan)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def windowed_value_agg(
    stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """#39 — watermarked (sliding) window aggregation: late rows beyond
    the watermark are dropped, the streaming-correctness contract."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """#38b — streaming exact dedup within the watermark horizon:
    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes, so state is bounded by (arrival rate × horizon) —
    the streaming analog of the batch `etl_dedup_exact` operator. A
    duplicate arriving after the horizon is a (documented) miss; that is
    the bounded-state trade every streaming dedup makes."""
    key_cols = key_cols or ["user_id", "event_type", "ts"]
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(key_cols)


SESSION_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double, batches int"
SESSION_STATE_SCHEMA = "n bigint, s double, batches int"


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user aggregate that survives across micro-batches —
    the state is the engine's, not the batch's."""
    n, s, batches = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    batches += 1
    state.update((n, s, batches))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 4)], "batches": [batches]}
    )


def stateful_user_totals(stream: DataFrame) -> DataFrame:
    """#40 — applyInPandasWithState: arbitrary per-key state (running
    totals + batch counter) with Arrow-batched group input."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enrich_stream_with_dim(stream: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """#40b — stream-static enrichment join: every micro-batch hash-joins
    against the (broadcast) static dimension. No streaming state at all —
    the dim is re-resolvable per batch, so slowly-changing dims are
    picked up on re-read; the 100 TB-stream shape for reference-data
    joins (vs. a stateful stream-stream join, which this deliberately
    is not)."""
    return stream.join(F.broadcast(dim), key, "left")


def session_window_agg(
    stream: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """#40c — native session windows: gap-based sessionization as a
    first-class streaming aggregation (merging windows state-side).
    The streaming twin of the batch `sessionize` operator — watermark
    bounds the state exactly as in the windowed agg."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "update"):
    """Drive a streaming DataFrame into an in-memory table synchronously."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def stream_stream_interval_join(
    clicks: DataFrame, purchases: DataFrame, within_minutes: int = 30
) -> DataFrame:
    """#40d — stream-stream inner interval join: each purchase matched
    to the same user's click events in the preceding ``within_minutes``.

    Both sides carry watermarks so Spark can BOUND the join state: a
    buffered click is dropped once the purchase-side watermark passes
    click_ts + within_minutes (state eviction is what makes this run
    forever at 100 TB/day — an unwatermarked stream-stream join grows
    state without bound). The equi-key (user_id) routes both streams
    through one hash partitioning; the time-interval predicate prunes
    within each key group."""
    c = (
        clicks.withWatermark("ts", f"{within_minutes * 2} minutes")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    p = (
        purchases.withWatermark("ts", f"{within_minutes} minutes")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("amount"),
        )
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {within_minutes} MINUTES")
        ),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        "amount",
    )


def idempotent_batch_sink(out_dir: str):
    """#40e — foreachBatch exactly-once parquet sink.

    Structured Streaming guarantees at-least-once foreachBatch calls:
    after a crash the SAME epoch can be re-delivered. Writing each
    micro-batch to ``batch_id=<epoch>/`` with overwrite makes a replay
    rewrite the identical partition instead of duplicating rows — the
    standard idempotent-sink contract (the other half, transactional
    sinks, needs a table format with atomic commit).

    Returns a (batchDF, batchId) -> None callable for
    ``writeStream.foreachBatch``."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                f"{out_dir}/batch_id={batch_id}"
            )
        )
        _crash_point("foreach_batch:post_write", batch_id)

    return write_batch


def run_foreach_batch(stream_df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Wire a stream into the idempotent sink with a checkpoint (the
    checkpoint is what ties epoch ids to source offsets across
    restarts)."""
    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(idempotent_batch_sink(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def incremental_rollup_sink(spark, staged_dir: str, rollup_dir: str):
    """#40f — streaming ≫ incremental-rollup unification: foreachBatch
    drives operators/incremental.py's dynamic-partition-overwrite daily
    rollup, epoch-replay-safe.

    Per micro-batch:

    1. stage the batch's RAW rows under ``batch_id=<epoch>/`` with
       overwrite — the idempotent-staging half (a replayed epoch
       rewrites identical files, never appends);
    2. collect the batch's touched dates (tiny: distinct dates per
       micro-batch);
    3. recompute those dates' rollup partitions from the FULL staged
       history and dynamic-partition-overwrite only them
       (operators/incremental.incremental_daily_update).

    Because the staged set — not the batch — is the aggregation input,
    late rows for an old date just extend that date's staged slice and
    the next recompute folds them in (no all-rows-per-date contract on
    any single batch), and an epoch replay recomputes byte-identical
    partition contents: exactly-once END-TO-END on an at-least-once
    foreachBatch. Reading back only the touched dates keeps the
    recompute proportional to the batch's date span, not table size;
    partition pruning on ``date`` does the bounding."""
    from ..operators import incremental

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{staged_dir}/batch_id={batch_id}")
        dates = [
            r["date"]
            for r in batch_df.select(
                F.to_date("ts").cast("string").alias("date")
            ).distinct().collect()
        ]
        if not dates:
            return
        staged = spark.read.option("basePath", staged_dir).parquet(staged_dir)
        slice_ = staged.filter(F.to_date("ts").cast("string").isin(dates)).drop(
            "batch_id"
        )
        incremental.incremental_daily_update(spark, slice_, rollup_dir)

    return write_batch


def run_incremental_rollup(
    stream_df: DataFrame, staged_dir: str, rollup_dir: str, checkpoint_dir: str
):
    """Wire an event stream into the incremental-rollup sink."""
    spark = stream_df.sparkSession
    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(incremental_rollup_sink(spark, staged_dir, rollup_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


MG_STREAM_OUT = "shard int, item string, est long, decr long"
MG_STREAM_STATE = "ks array<string>, vs array<long>, decr long"


def streaming_heavy_hitters(
    stream: DataFrame, col: str, shards: int = 8, capacity: int = 64
) -> DataFrame:
    """#40g — streaming Misra-Gries top items: per-SHARD bounded sketch
    state (capacity+decrement total) carried across micro-batches via
    applyInPandasWithState. Values hash into ``shards`` state keys, so
    state size is shards x capacity regardless of stream cardinality —
    the streaming twin of operators/sketches.heavy_hitters, with the
    same guarantee (per-shard est <= true <= est + decr; shards
    partition the value space, so per-item bounds survive the final
    cross-shard merge, which is a plain groupBy downstream)."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            ks, vs, decr = state.get
            counts = dict(zip(ks, vs))
        else:
            counts, decr = {}, 0
        for pdf in pdfs:
            for v, c in pdf["v"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > capacity:
                cs = sorted(counts.values())
                t = cs[len(counts) - capacity - 1]
                decr += t
                counts = {v: c - t for v, c in counts.items() if c > t}
        state.update((list(counts.keys()), list(counts.values()), decr))
        items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(items),
                "item": [v for v, _ in items],
                "est": [c for _, c in items],
                "decr": [decr] * len(items),
            }
        )

    keyed = stream.select(
        F.col(col).cast("string").alias("v"),
        F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(shards))
        .cast("int")
        .alias("shard"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=MG_STREAM_OUT,
        stateStructType=MG_STREAM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


GAP_OUT_SCHEMA = (
    "user_id bigint, gap_start timestamp, gap_end timestamp, gap_minutes double"
)
GAP_STATE_SCHEMA = "last_us bigint"


def _make_gap_fn(max_gap_minutes: int):
    """Build the per-sensor gap detector with the threshold bound in
    (closure, so the streaming twin matches the batch operator at ANY
    threshold, not just the default — r3 ADVICE)."""
    threshold_us = max_gap_minutes * 60 * 1_000_000

    def _gap_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-sensor gap detector: state is one integer — the last seen
        event time in epoch-micros. State is O(1) per key forever (vs
        buffering readings), the shape that keeps a million-sensor
        fleet's state store flat.

        applyInPandasWithState delivers a group's micro-batch rows as
        MULTIPLE Arrow chunks with no ordering guarantee, so all chunks
        are concatenated and sorted ONCE before the scan — sorting each
        chunk independently can miss gaps or emit wrong bounds when
        events split across chunks arrive out of event-time order
        (r3 ADVICE)."""
        import pandas as pd

        last = state.get[0] if state.exists else None
        ts_sorted = sorted(t for pdf in pdfs for t in pdf["ts"])
        rows = []
        for ts in ts_sorted:
            cur = int(pd.Timestamp(ts).value // 1_000)  # ns -> us
            if last is not None and cur - last > threshold_us:
                rows.append(
                    (
                        key[0],
                        pd.Timestamp(last * 1_000),
                        pd.Timestamp(cur * 1_000),
                        round((cur - last) / 60e6, 4),
                    )
                )
            last = cur if last is None else max(last, cur)
        state.update((last,))
        yield pd.DataFrame(
            rows, columns=["user_id", "gap_start", "gap_end", "gap_minutes"]
        )

    return _gap_fn


def streaming_sensor_gaps(stream: DataFrame, max_gap_minutes: int = 120) -> DataFrame:
    """#40c — streaming twin of the batch ``etl_sensor_gaps`` operator
    (operators/cleaning.py): per-sensor reading-gap rows as they become
    detectable, across micro-batch boundaries (the gap between the last
    event of batch N and the first of batch N+1 is found via the
    carried state, which a per-batch window could never see)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_gap_fn(max_gap_minutes),
        outputStructType=GAP_OUT_SCHEMA,
        stateStructType=GAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_agg_with_late_audit(
    stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """#40e — the watermarked window agg instrumented for late-data
    observability: an ``observe`` metric stream counts every input row
    and the minimum/maximum event time per micro-batch, and the state
    store reports rows dropped by the watermark via
    ``StreamingQueryProgress.stateOperators[].numRowsDroppedByWatermark``
    (read with :func:`late_drop_metrics`). This is the production answer
    to "how much data are we silently losing to lateness" — the input
    that sizes the watermark, instead of guessing it.
    """
    audited = stream.observe(
        "late_audit",
        F.count(F.lit(1)).alias("n_input_rows"),
        F.min("ts").alias("min_event_ts"),
        F.max("ts").alias("max_event_ts"),
    )
    return windowed_value_agg(audited, window=window, watermark=watermark)


def late_drop_metrics(query) -> dict:
    """Totals from a running/finished query's progress history:
    rows dropped by the watermark (state operators) and rows observed
    (the ``late_audit`` metric). Call after ``processAllAvailable``."""
    import json

    dropped = 0
    observed = 0
    for p in query.recentProgress:
        d = json.loads(p.json) if hasattr(p, "json") else p
        for op in d.get("stateOperators", []):
            dropped += op.get("numRowsDroppedByWatermark", 0)
        obs = d.get("observedMetrics", {}).get("late_audit")
        if obs:
            observed += obs.get("n_input_rows", 0) or 0
    return {"rows_dropped_late": dropped, "rows_observed": observed}


HLL_STREAM_OUT = "shard int, est_distinct double, n_registers int"
HLL_STREAM_STATE = "regs binary"


def streaming_distinct_hll(
    stream: DataFrame, col: str, shards: int = 4, p: int = 12
) -> DataFrame:
    """#40m — streaming approximate distinct count: per-shard HyperLogLog
    register state (2^p bytes, FIXED — the whole point) carried across
    micro-batches via applyInPandasWithState. Values route to shards by
    hash; each shard's registers max-merge new observations (HLL's
    merge = elementwise max, so replays/duplicates are idempotent by
    construction); the global estimate is the HLL union of shard
    registers downstream.

    This is the unbounded-cardinality counterpart of
    ``dropDuplicatesWithinWatermark`` + count: exact streaming distinct
    needs per-key state that grows with cardinality forever; HLL state
    is shards × 2^p bytes for the life of the stream.
    """
    import numpy as np

    m = 1 << p

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        regs = (
            np.frombuffer(state.get[0], dtype=np.uint8).copy()
            if state.exists
            else np.zeros(m, dtype=np.uint8)
        )
        from pandas.util import hash_array

        for pdf in pdfs:
            vals = pdf["v"].astype("str").to_numpy()
            if not len(vals):
                continue
            h = hash_array(vals)
            idx = (h & np.uint64(m - 1)).astype(np.int64)
            rest = (h >> np.uint64(p)).astype(np.uint64)
            # rank = leading-zero count of the remaining 64-p bits + 1;
            # computed as position of the highest set bit
            nbits = 64 - p
            rank = np.full(len(rest), nbits + 1, dtype=np.uint8)
            nz = rest != 0
            hi = np.zeros(len(rest), dtype=np.int64)
            hi[nz] = np.frexp(rest[nz].astype(np.float64))[1]  # ≈ bit length
            rank[nz] = (nbits - hi[nz] + 1).astype(np.uint8)
            np.maximum.at(regs, idx, rank)
        state.update((regs.tobytes(),))
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
        zeros = int(np.sum(regs == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # small-range correction
        yield pd.DataFrame(
            {
                "shard": [key[0]],
                "est_distinct": [float(est)],
                "n_registers": [m],
            }
        )

    keyed = stream.select(
        F.col(col).cast("string").alias("v"),
        F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(shards))
        .cast("int")
        .alias("shard"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=HLL_STREAM_OUT,
        stateStructType=HLL_STREAM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


QH_STREAM_OUT = "event_type string, p50_est double, p95_est double, n_rows long"
QH_STREAM_STATE = "counts binary"


def streaming_quantile_bands(
    stream: DataFrame,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 256,
) -> DataFrame:
    """#40n — streaming p50/p95 per event type from FIXED-SIZE histogram
    state: each group carries ``bins`` int64 counts (2 KiB at 256 bins —
    constant for the life of the stream, the same bounded-state argument
    as the HLL job) across micro-batches via applyInPandasWithState,
    emitting interpolated percentile estimates each batch. The batch
    twin is ``sketches.quantile_histogram_rollup`` — same binning, same
    ceil-target in-bin interpolation, error ≤ one bin width against the
    exact percentile (pytest-pinned on both).

    The [lo, hi] range is a declared parameter (a stream can't take a
    global min/max first); out-of-range values clamp into the edge bins.
    Counting state is NOT replay-idempotent (counts add) — exactly-once
    sinks or upstream dedup are the contract, as for every counting
    stream."""
    import numpy as np

    width = (hi - lo) / bins

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        counts = (
            np.frombuffer(state.get[0], dtype=np.int64).copy()
            if state.exists
            else np.zeros(bins, dtype=np.int64)
        )
        for pdf in pdfs:
            v = pdf["v"].to_numpy(dtype=np.float64)
            if not len(v):
                continue
            idx = np.clip(
                np.floor((v - lo) / width).astype(np.int64), 0, bins - 1
            )
            np.add.at(counts, idx, 1)
        state.update((counts.tobytes(),))
        n = int(counts.sum())
        cum = counts.cumsum()

        def est(p: float) -> float:
            target = int(np.ceil(p * n))
            b = int(np.searchsorted(cum, target))
            cum_before = int(cum[b] - counts[b])
            v = lo + width * (b + (target - cum_before) / float(counts[b]))
            # repo r4 convention: HALF_UP away from zero with the 1e-9
            # nudge — Python round() is HALF_EVEN and diverges from the
            # batch twin (quantile_histogram_rollup's F.round) at
            # boundary values
            y = v + 1e-9
            return float(math.copysign(math.floor(abs(y) * 1e4 + 0.5) / 1e4, y))

        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "p50_est": [est(0.5) if n else None],
                "p95_est": [est(0.95) if n else None],
                "n_rows": [n],
            }
        )

    keyed = stream.select("event_type", F.col(value_col).alias("v"))
    return keyed.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=QH_STREAM_OUT,
        stateStructType=QH_STREAM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# #40o streaming z-score anomaly detector
# ---------------------------------------------------------------------------

ANOMALY_OUT_SCHEMA = "user_id bigint, ts timestamp, value double, z double, is_anomaly int"
ANOMALY_STATE_SCHEMA = "n bigint, mean double, m2 double"


def _make_anomaly_fn(z_thresh: float, min_n: int):
    def _anomaly_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Streaming twin of ``etl_anomaly_flags``: per-user Welford
        state (n, mean, M2) — O(1) per key forever. Each micro-batch is
        scored against the stats of all PRIOR batches (a stable,
        replay-deterministic baseline; z is reported with the repo's
        r4 rounding, the flag compares unrounded |z| like the batch
        twin — scoring row-by-row against a
        shifting intra-batch mean would make results depend on Arrow
        chunking), then merged into the state via Chan's parallel
        update. Until ``min_n`` observations exist the detector stays
        silent (z NULL) instead of flagging against noise.

        All chunks are concatenated before any math (a group's batch can
        arrive as several Arrow chunks in arbitrary order — the
        round-3-advice gap-detector lesson)."""
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        vals = pdf["value"].astype(float)
        if n >= min_n and m2 > 0:
            std = math.sqrt(m2 / (n - 1)) if n > 1 else 0.0
            z = (vals - mean) / std if std > 0 else vals * 0.0
            # repo rounding convention (r4): HALF_UP away from zero with
            # the 1e-9 nudge — pandas .round is HALF_EVEN and diverges
            # from the batch twin at boundary values. The FLAG compares
            # the unrounded z, exactly as etl_anomaly_flags does.
            y = z + 1e-9
            import numpy as _np

            zr = pd.Series(
                _np.sign(y) * _np.floor(_np.abs(y) * 1e4 + 0.5) / 1e4,
                index=vals.index,
            )
            flag = (z.abs() > z_thresh).astype(int)
        else:
            zr = pd.Series([None] * len(pdf), dtype="object")
            flag = pd.Series([0] * len(pdf), dtype="int64")
        # Chan et al. merge of (n, mean, m2) with the batch's moments
        nb = int(len(vals))
        if nb:
            mb = float(vals.mean())
            m2b = float(((vals - mb) ** 2).sum())
            delta = mb - mean
            tot = n + nb
            mean = mean + delta * nb / tot
            m2 = m2 + m2b + delta * delta * n * nb / tot
            n = tot
        state.update((n, mean, m2))
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "ts": pdf["ts"],
                "value": pdf["value"],
                "z": zr,
                "is_anomaly": flag,
            }
        )

    return _anomaly_fn


def streaming_anomaly(
    stream: DataFrame, z_thresh: float = 3.0, min_n: int = 10
) -> DataFrame:
    """#40o — streaming anomaly flags: each event scored against its
    user's running Welford baseline; state is three scalars per user
    regardless of stream length."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_anomaly_fn(z_thresh, min_n),
        outputStructType=ANOMALY_OUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# #40p streaming CDC merge into a versioned table
# ---------------------------------------------------------------------------


def cdc_merge_sink(
    table_path: str,
    key_cols: list[str],
    order_col: str = "ts",
    tiebreak_col: str = "event_id",
):
    """foreachBatch sink that MERGEs each micro-batch into a versioned
    parquet table (Delta-style copy-on-write upsert, the streaming CDC
    apply pattern): the batch first compacts to its LATEST row per key
    (max ``order_col``, id-tiebroken — a batch can carry several changes
    to one key), then ``merge_versioned_parquet`` rewrites only the
    key-matched data files and commits a new snapshot.

    Replay safety: at-least-once foreachBatch delivery would double-
    commit snapshots, so each applied epoch drops a
    ``_commits/batch-<id>`` marker and a redelivered epoch is skipped
    — the transactional half of the idempotent-sink contract that the
    partition-overwrite sink (#40e) gets for free. A crash BETWEEN the
    merge commit and the marker write re-merges the same compacted
    batch on restart: content-idempotent (update-wins of identical
    rows), at the cost of one redundant snapshot version — the
    standard at-least-once residue a manifest-transaction would
    close."""
    from ..sinks.writers import merge_versioned_parquet

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path(table_path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        marker = jvm.org.apache.hadoop.fs.Path(
            f"{table_path}/_commits/batch-{batch_id}"
        )
        if fs.exists(marker):
            return  # epoch replay — already committed
        w = PSWindow.partitionBy(*key_cols).orderBy(
            F.col(order_col).desc(), F.col(tiebreak_col).desc()
        )
        compacted = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        merge_versioned_parquet(spark, table_path, compacted, key_cols)
        _crash_point("cdc_merge:pre_marker", batch_id)
        fs.mkdirs(marker)

    return write_batch


def run_cdc_merge(
    stream_df: DataFrame,
    table_path: str,
    key_cols: list[str],
    checkpoint_dir: str,
    order_col: str = "ts",
    tiebreak_col: str = "event_id",
):
    """Wire a change stream into the versioned-table MERGE sink."""
    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(cdc_merge_sink(table_path, key_cols, order_col, tiebreak_col))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# ---------------------------------------------------------------------------
# #40q streaming MinHash near-dup filter with a persistent band store
# ---------------------------------------------------------------------------

DOCS_SCHEMA = "doc_id bigint, text string"


def read_docs_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source document stream (one parquet file per micro-batch,
    same trigger discipline as read_events_stream)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def minhash_dedup_sink(
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
):
    """foreachBatch near-dup filter: the streaming twin of the
    incremental MinHash probe, with the band store actually PERSISTED —
    each epoch signs only its own micro-batch; the accumulated corpus
    is never re-signed (`dedup.incremental_minhash_probe`).

    Per epoch:
      1. intra-batch LSH pass — a doc that near-dups a LOWER-id doc in
         the same batch drops first (the same survivor rule as the
         batch cluster family);
      2. intra-survivors probe the persisted band store (broadcast the
         tiny batch side, stream the store map-side);
      3. decisions land under ``decisions/epoch=N`` (one row per input
         doc: kept / intra-dup / corpus-dup + matched id + estimated
         Jaccard), survivors' bands append under ``bands/epoch=N``.

    Replay safety: an ``_epochs/batch-N`` marker makes redelivered
    epochs no-ops (same contract as the CDC merge sink), and a crash
    BETWEEN the band write and the marker is also safe: the probe
    filters the store's ``epoch`` partition column to epochs below the
    current one, so a re-run never sees its own partially-committed
    bands (it would otherwise self-match every survivor as a corpus dup
    of itself and overwrite its band partition with an empty relation).
    At 100 TB the band store is the only growing state, it is
    append-only parquet keyed by (b, bkey), and a compaction/bucketing
    pass over it is ordinary table maintenance — no driver state
    anywhere."""
    from ..operators import dedup

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path(store_dir).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        marker = jvm.org.apache.hadoop.fs.Path(f"{store_dir}/_epochs/batch-{batch_id}")
        if fs.exists(marker):
            return  # epoch replay — already applied
        batch = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).localCheckpoint(eager=True)

        # sign the micro-batch text EXACTLY ONCE; intra pairs, the
        # corpus probe, and the store append all reuse this relation
        batch_bands = dedup.minhash_bands(
            batch, "doc_id", "text", n=n, num_hashes=num_hashes, bands=bands
        ).localCheckpoint(eager=True)

        # materialize=False: batch_bands is already an eager checkpoint
        # leaf; re-checkpointing it would hold a second copy of its
        # blocks per micro-batch until GC (ADVICE r14)
        pairs = dedup.pairs_from_bands(
            batch_bands, num_hashes=num_hashes, materialize=False
        ).filter(
            F.col("est_jaccard") >= threshold
        )
        intra = pairs.groupBy(F.col("id_b").alias("doc_id")).agg(
            F.min("id_a").alias("intra_matched_id"),
            F.max("est_jaccard").alias("intra_est"),
        )
        survivors = batch.join(intra, "doc_id", "left_anti")
        survivor_bands = batch_bands.join(
            intra.select(F.col("doc_id").alias("id")), "id", "left_anti"
        )

        bands_path = f"{store_dir}/bands"
        have_store = fs.exists(jvm.org.apache.hadoop.fs.Path(bands_path))
        if have_store:
            # epoch < current: a partially-committed own epoch (crash
            # before the marker landed) must not probe against itself
            store = spark.read.parquet(bands_path).filter(
                F.col("epoch") < batch_id
            )
            flags = dedup.incremental_minhash_probe(
                store, survivors, "doc_id", "text",
                n=n, num_hashes=num_hashes, bands=bands, threshold=threshold,
                new_bands_rel=survivor_bands,
            )
        else:
            flags = survivors.select(
                "doc_id",
                F.lit(0).alias("is_dup_of_corpus"),
                F.lit(None).cast("bigint").alias("matched_corpus_id"),
                F.lit(None).cast("double").alias("best_est_jaccard"),
            )
        flags = flags.localCheckpoint(eager=True)

        decisions = (
            batch.select("doc_id")
            .join(intra, "doc_id", "left")
            .join(flags, "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("intra_matched_id").isNotNull(), "intra")
                .when(F.col("is_dup_of_corpus") == 1, "corpus")
                .otherwise("kept")
                .alias("decision"),
                F.coalesce("intra_matched_id", "matched_corpus_id").alias("matched_id"),
                F.coalesce("intra_est", "best_est_jaccard").alias("est_jaccard"),
            )
        )
        decisions.write.mode("overwrite").parquet(
            f"{store_dir}/decisions/epoch={batch_id}"
        )
        kept = flags.filter(F.col("is_dup_of_corpus") == 0).select(
            F.col("doc_id").alias("id")
        )
        new_bands = survivor_bands.join(kept, "id", "left_semi").select(
            "id", "sig", "b", "bkey"
        )
        new_bands.write.mode("overwrite").parquet(f"{bands_path}/epoch={batch_id}")
        _crash_point("minhash:pre_marker", batch_id)
        fs.mkdirs(marker)

    return write_batch


def run_minhash_dedup(stream_df: DataFrame, store_dir: str, checkpoint_dir: str):
    """Wire a document stream into the near-dup filter sink."""
    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(minhash_dedup_sink(store_dir))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# ---------------------------------------------------------------------------
# #40r: streaming ANN index maintenance (graph-ANN sibling of the
# MinHash band store — the vector corpus is never re-scored)
# ---------------------------------------------------------------------------

VECS_SCHEMA = "vec_id bigint, embedding array<float>"


def ann_index_sink(store_dir: str, id_col: str = "vec_id",
                   vec_col: str = "embedding", k: int = 8):
    """foreachBatch incremental graph-ANN index: each epoch inserts its
    micro-batch of vectors into the PERSISTED NN-Descent graph via
    batched beam placement (`ann_graph.insert_into_graph`) — the
    standing corpus is never re-scored, exactly the MinHash band-store
    discipline applied to similarity search.

    Store layout (all append-only, epoch-partitioned parquet):
      * ``vectors/epoch=N`` — the batch's (id, vector) rows;
      * ``graph/epoch=N``  — adjacency DELTA: the new nodes' lists plus
        only the old nodes whose list changed (a back-link displaced an
        incumbent edge). Readers take each node's latest epoch
        (:func:`ann_index_view`) — last-writer-wins per node, the CDC
        merge convention.

    Replay safety: an ``_epochs/batch-N`` marker makes redelivered
    epochs no-ops, and both loads filter ``epoch < batch_id`` so a
    crash between the data writes and the marker can never make a
    re-run read its own partial output. The first epoch (empty store)
    builds the graph from the batch alone with NN-Descent proper.

    At 100 TB the store is the only growing state; per epoch the work
    is O(batch · beam · k · hops) scoring against the standing graph —
    never O(corpus) — and compaction of old epochs is ordinary table
    maintenance.
    """
    from ..operators import ann_graph

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path(store_dir).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        marker = jvm.org.apache.hadoop.fs.Path(
            f"{store_dir}/_epochs/batch-{batch_id}"
        )
        if fs.exists(marker):
            return  # epoch replay — already applied
        batch = batch_df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        ).localCheckpoint(eager=True)

        vec_path = f"{store_dir}/vectors"
        have_store = fs.exists(jvm.org.apache.hadoop.fs.Path(vec_path))
        if have_store:
            old = (
                spark.read.parquet(vec_path)
                .filter(F.col("epoch") < batch_id)
                .select("id", "v")
            )
            # drop ids already indexed (idempotent upstream redelivery)
            batch_new = batch.join(old, "id", "left_anti").localCheckpoint(
                eager=True
            )
            g_old = ann_index_view(spark, store_dir, max_epoch=batch_id)
            old_adj, new_adj = ann_graph.insert_into_graph(
                old, g_old, batch_new, "bigint", k=k
            )
            # delta: new nodes always; old nodes only where a back-link
            # changed the list (anti-join on the exact row set)
            changed_old = old_adj.join(
                g_old.select("id", "nb", "cosine", "rank"),
                ["id", "nb", "cosine", "rank"],
                "left_anti",
            ).select("id").distinct()
            delta = new_adj.unionByName(
                old_adj.join(changed_old, "id", "left_semi")
            )
        else:
            batch_new = batch
            delta = ann_graph.nndescent_graph(
                batch.select(F.col("id").alias(id_col),
                             F.col("v").alias(vec_col)),
                id_col, vec_col, k=k,
            ).select(
                F.col(id_col).alias("id"),
                F.col("neighbor_id").alias("nb"),
                "cosine", "rank",
            )

        delta.write.mode("overwrite").parquet(f"{store_dir}/graph/epoch={batch_id}")
        batch_new.write.mode("overwrite").parquet(f"{vec_path}/epoch={batch_id}")
        _crash_point("ann_index:pre_marker", batch_id)
        fs.mkdirs(marker)

    return write_batch


def ann_index_view(spark: SparkSession, store_dir: str,
                   max_epoch: int | None = None) -> DataFrame:
    """Current adjacency of the persisted index: each node's rows from
    its LATEST epoch (last-writer-wins per node). ``max_epoch`` bounds
    the read to epochs strictly below it (crash-safe replay reads)."""
    g = spark.read.parquet(f"{store_dir}/graph")
    if max_epoch is not None:
        g = g.filter(F.col("epoch") < max_epoch)
    latest = g.groupBy("id").agg(F.max("epoch").alias("epoch"))
    return g.join(latest, ["id", "epoch"]).select("id", "nb", "cosine", "rank")


def ann_index_search(spark: SparkSession, store_dir: str,
                     queries: DataFrame, k: int = 5, beam: int = 8,
                     hops: int = 3, n_hubs: int = 64) -> DataFrame:
    """Beam-search the persisted index for a (qid, qv) query relation —
    same output contract as the batch ``ann_*_topk`` operators."""
    from pyspark.sql import Window

    from ..operators import ann_graph

    base = (
        spark.read.parquet(f"{store_dir}/vectors").select("id", "v")
    )
    g = ann_index_view(spark, store_dir)
    edges = ann_graph._symmetrize(
        g.select("id", F.col("nb").alias("neighbor_id")), "id"
    )
    state = ann_graph._beam_states(
        base, edges, queries, "bigint", beam, hops, n_hubs
    )
    final = state.filter(F.col("qid") != F.col("node"))
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("node").asc()
    )
    return (
        final.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("node").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def read_vecs_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(VECS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def run_ann_index(stream_df: DataFrame, store_dir: str, checkpoint_dir: str):
    """Wire a vector stream into the incremental ANN index sink."""
    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(ann_index_sink(store_dir))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def ann_index_compact(spark: SparkSession, store_dir: str) -> dict:
    """Table maintenance for the streaming ANN store (the
    vacuum/compact sibling of the versioned-parquet sinks): collapse
    all graph epochs into one last-writer-wins snapshot and all vector
    epochs into one partition, both written as ``epoch=K`` where K is
    the highest epoch compacted — readers see an identical view
    (``epoch < batch_id`` filters and :func:`ann_index_view` keep
    working unchanged, since every surviving row's epoch is <= K), and
    the per-epoch small-file growth resets. Epoch markers are left
    untouched: replay of an already-applied batch stays a no-op.

    Returns {"epochs_before", "rows_graph", "rows_vectors"}.
    """
    import shutil

    g = spark.read.parquet(f"{store_dir}/graph")
    epochs = [r["epoch"] for r in g.select("epoch").distinct().collect()]
    k = max(epochs)
    view = ann_index_view(spark, store_dir).localCheckpoint(eager=True)
    vecs = (
        spark.read.parquet(f"{store_dir}/vectors")
        .select("id", "v")
        .localCheckpoint(eager=True)
    )
    n_g, n_v = view.count(), vecs.count()
    shutil.rmtree(f"{store_dir}/graph")
    shutil.rmtree(f"{store_dir}/vectors")
    view.write.mode("overwrite").parquet(f"{store_dir}/graph/epoch={k}")
    vecs.write.mode("overwrite").parquet(f"{store_dir}/vectors/epoch={k}")
    return {
        "epochs_before": len(epochs),
        "rows_graph": n_g,
        "rows_vectors": n_v,
    }
