"""Distributed Count-Min sketch for approximate frequencies.

Completes the mergeable-sketch family (HLL → distinct counts,
Misra-Gries → heavy hitters, Bloom → membership): CMS answers "how many
times did key x occur" over a stream/corpus too large to groupBy, in
d×w counters regardless of key cardinality.

Scale shape mirrors operators/bloom.py: each partition builds its own
d×w counter matrix via an Arrow-batched ``mapInPandas`` (numpy
``add.at``, no per-row Python), the per-partition matrices SUM-merge on
the driver (CMS is mergeable by construction — addition commutes), and
the merged sketch broadcasts back for a map-side vectorized probe. Only
``num_partitions`` matrices of d·w·8 bytes cross the wire — never keys.

Guarantees (Cormode-Muthukrishnan): estimates NEVER undercount, and
overcount by ≤ ε·N with probability ≥ 1−δ for w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉.
Both bounds are pytest-asserted against exact counts (the lower bound
deterministically, the upper at the guarantee level). Deterministic:
same keys → same sketch on every rerun and partitioning.

Hashing is the same splitmix64-derived Kirsch-Mitzenmacher double
hashing as the Bloom filter (h_i = h1 + i·h2), so the two sketches
share one vectorized primitive.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import _int64_ids, _splitmix64


def params_for(eps: float, delta: float) -> tuple[int, int]:
    """(width, depth) for additive error ≤ eps·N with prob ≥ 1-delta."""
    w = int(math.ceil(math.e / eps))
    d = max(int(math.ceil(math.log(1.0 / delta))), 1)
    return w, d


def _rows(values: np.ndarray, width: int, depth: int) -> Iterator[np.ndarray]:
    """Per-depth column indices for an int64 key array."""
    from pandas.util import hash_array

    assert values.dtype == np.int64, f"key array must be int64, got {values.dtype}"
    h1 = hash_array(values)
    h2 = _splitmix64(h1) | np.uint64(1)
    for i in range(depth):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(width)).astype(np.int64)


def build_cms(
    df: DataFrame, key_col: str, eps: float = 0.001, delta: float = 0.01
) -> tuple[np.ndarray, int, int]:
    """Distributed build → (d×w int64 matrix, width, depth)."""
    width, depth = params_for(eps, delta)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = np.zeros((depth, width), dtype=np.int64)
        for pdf in batches:
            keys, _ = _int64_ids(pdf[key_col])
            if not len(keys):
                continue
            for i, cols in enumerate(_rows(keys, width, depth)):
                np.add.at(counts[i], cols, 1)
        yield pd.DataFrame({"counts": [counts.tobytes()]})

    parts = (
        df.select(F.col(key_col).cast("long").alias(key_col))
        .mapInPandas(build, "counts binary")
        .collect()
    )
    merged = np.zeros((depth, width), dtype=np.int64)
    for r in parts:
        merged += np.frombuffer(r["counts"], dtype=np.int64).reshape(depth, width)
    return merged, width, depth


def estimate_counts(
    keys_df: DataFrame, key_col: str, cms: np.ndarray, width: int, depth: int
) -> DataFrame:
    """Point-query every row's key against the broadcast sketch —
    map-side, vectorized, no shuffle. Adds ``est_count``."""
    spark = keys_df.sparkSession
    bcast = spark.sparkContext.broadcast(cms.tobytes())

    @F.pandas_udf("long")
    def est(s: pd.Series) -> pd.Series:
        counts = np.frombuffer(bcast.value, dtype=np.int64).reshape(depth, width)
        keys, mask = _int64_ids(s)
        mins = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
        for i, cols in enumerate(_rows(keys, width, depth)):
            mins = np.minimum(mins, counts[i][cols])
        out = np.zeros(len(s), dtype=np.int64)
        out[mask] = mins
        return pd.Series(out)

    return keys_df.withColumn("est_count", est(F.col(key_col).cast("long")))


def cms_frequency_profile(
    df: DataFrame, key_col: str, eps: float = 0.001, delta: float = 0.01
) -> DataFrame:
    """End-to-end: build the sketch over the fact, probe each DISTINCT
    key. The distinct relation is the only shuffle; at true stream
    scale the caller probes a candidate set (e.g. Misra-Gries heavy
    hitters) instead and the plan is shuffle-free."""
    cms, width, depth = build_cms(df, key_col, eps, delta)
    keys = df.select(key_col).distinct()
    return estimate_counts(keys, key_col, cms, width, depth)
