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

Hashing (r13 — was pandas hash_array + splitmix64, engine-opaque, which
forced a rows-only gate): Kirsch-Mitzenmacher double hashing
``h_i = h1 + i·h2`` over TWO md5-prefix 60-bit hashes computed
JVM-SIDE (codegen'd, identical expression text in the DuckDB twin);
the Arrow stage receives (h1, h2) ints and only does the vectorized
``(h1 + i·h2) % w`` fold. Every counter is then an exact integer both
engines can reproduce — :func:`cms_frequency_profile_sql` replays the
full sketch, making the registered query a FULL hash-parity gate.
No overflow: h1, h2 < 2^60 and i < d ≤ 5, so h1 + i·h2 < 2^63.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def params_for(eps: float, delta: float) -> tuple[int, int]:
    """(width, depth) for additive error ≤ eps·N with prob ≥ 1-delta."""
    w = int(math.ceil(math.e / eps))
    d = max(int(math.ceil(math.log(1.0 / delta))), 1)
    # Same int64 no-overflow bound as bloom.params_for: h1 + i·h2 stays
    # below 2^63 only for i < d ≤ 7 (delta ≥ ~e^-7 ≈ 0.0009); smaller
    # delta would wrap silently in numpy while the DuckDB twin raises
    # a BIGINT overflow (ADVICE r13).
    if d > 7:
        raise ValueError(
            f"delta={delta!r} needs depth={d}; the cross-engine int64 "
            "overflow-free guarantee holds only for depth <= 7 "
            "(delta >= ~0.001)"
        )
    return w, d


def _hash_exprs(key_col: str) -> tuple[str, str]:
    """Spark-SQL expressions for the (h1, h2) double-hash pair — the
    engines' shared 60-bit md5-prefix bigint, twice (a '#cms2' salt for
    the second draw), h2 forced odd per Kirsch-Mitzenmacher."""
    s = f"cast({key_col} as string)"
    h1 = f"cast(conv(substr(md5({s}), 1, 15), 16, 10) as bigint)"
    h2 = (
        f"(cast(conv(substr(md5(concat({s}, '#cms2')), 1, 15), 16, 10) "
        f"as bigint) | 1)"
    )
    return h1, h2


def build_cms(
    df: DataFrame, key_col: str, eps: float = 0.001, delta: float = 0.01
) -> tuple[np.ndarray, int, int]:
    """Distributed build → (d×w int64 matrix, width, depth). NULL keys
    are dropped at the scan (COUNT semantics — a NULL never counts)."""
    width, depth = params_for(eps, delta)
    h1e, h2e = _hash_exprs(key_col)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = np.zeros((depth, width), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            h1 = pdf["h1"].to_numpy(dtype=np.int64)
            h2 = pdf["h2"].to_numpy(dtype=np.int64)
            for i in range(depth):
                np.add.at(counts[i], (h1 + i * h2) % width, 1)
        yield pd.DataFrame({"counts": [counts.tobytes()]})

    parts = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.expr(h1e).alias("h1"), F.expr(h2e).alias("h2"))
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
    map-side, vectorized, no shuffle. Adds ``est_count`` (0 for NULL
    keys, which the sketch never counted)."""
    spark = keys_df.sparkSession
    bcast = spark.sparkContext.broadcast(cms.tobytes())
    h1e, h2e = _hash_exprs(key_col)

    # NULL keys must not reach Arrow as column nulls: a nullable int64
    # column degrades to float64 pandas-side, which cannot represent
    # 60-bit hashes exactly — coalesce JVM-side and carry validity as
    # its own boolean (the bloom.py null-poison lesson, ADVICE r2).
    @F.pandas_udf("long")
    def est(h1s: pd.Series, h2s: pd.Series, valid: pd.Series) -> pd.Series:
        counts = np.frombuffer(bcast.value, dtype=np.int64).reshape(depth, width)
        mask = valid.to_numpy(dtype=bool)
        h1 = h1s.to_numpy(dtype=np.int64)
        h2 = h2s.to_numpy(dtype=np.int64)
        mins = np.full(len(h1), np.iinfo(np.int64).max, dtype=np.int64)
        for i in range(depth):
            mins = np.minimum(mins, counts[i][(h1 + i * h2) % width])
        out = np.zeros(len(h1), dtype=np.int64)
        out[mask] = mins[mask]
        return pd.Series(out)

    return keys_df.withColumn(
        "est_count",
        est(
            F.expr(f"coalesce({h1e}, 0)"),
            F.expr(f"coalesce({h2e}, 1)"),
            F.col(key_col).isNotNull(),
        ),
    )


def cms_frequency_profile(
    df: DataFrame, key_col: str, eps: float = 0.001, delta: float = 0.01
) -> DataFrame:
    """End-to-end: build the sketch over the fact, probe each DISTINCT
    key. The distinct relation is the only shuffle; at true stream
    scale the caller probes a candidate set (e.g. Misra-Gries heavy
    hitters) instead and the plan is shuffle-free."""
    cms, width, depth = build_cms(df, key_col, eps, delta)
    keys = df.select(key_col).filter(F.col(key_col).isNotNull()).distinct()
    return estimate_counts(keys, key_col, cms, width, depth)


def cms_frequency_profile_sql(
    table: str, key_col: str, eps: float = 0.001, delta: float = 0.01
) -> str:
    """DuckDB twin of :func:`cms_frequency_profile` — every counter is
    an exact integer sum over the shared md5 double-hash, so the twin
    materializes only the TOUCHED (i, col) cells (≤ d·|distinct keys|
    rows, never the full d×w matrix) and takes the min over each key's
    d probes. A probed key always hit its own cells during the build,
    so the join is inner."""
    width, depth = params_for(eps, delta)
    s = f"CAST({key_col} AS VARCHAR)"
    return f"""
    WITH h AS (
      SELECT {key_col} AS k,
             (('0x' || substr(md5({s}), 1, 15))::BIGINT) AS h1,
             ((('0x' || substr(md5({s} || '#cms2'), 1, 15))::BIGINT) | 1) AS h2
      FROM {table} WHERE {key_col} IS NOT NULL
    ), cells AS (
      SELECT i, (h1 + i * h2) % {width} AS col,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM h CROSS JOIN (SELECT unnest(range({depth})) AS i)
      GROUP BY 1, 2
    ), probes AS (
      SELECT DISTINCT k, h1, h2 FROM h
    )
    SELECT p.k AS {key_col}, MIN(c.cnt) AS est_count
    FROM probes p
    CROSS JOIN (SELECT unnest(range({depth})) AS j)
    JOIN cells c ON c.i = j AND c.col = (p.h1 + j * p.h2) % {width}
    GROUP BY 1
    """
