"""Distributed Bloom-filter membership for ingest dedup.

The 100 TB problem: every incremental batch must drop rows whose id the
table already holds. The exact shape is an anti-join — which reshuffles
the full existing id set every batch. A Bloom filter replaces that with
ONE compact bitset: built distributed (each partition ORs its own
bitset — Bloom filters are mergeable by construction), merged on the
driver (bitsets are plain bytes, ~1.2 MB per 10^6 ids at 1 % fpp),
broadcast back, and probed map-side with zero shuffle.

Guarantees: NO false negatives — a genuinely new row is never dropped;
false positives at ~``fpp`` — a few new rows mistaken for dupes, fine
for corpus dedup, not for financial upserts (chain an exact anti-join
on the small surviving set when exactness matters).

All hashing is vectorized numpy on Arrow batches (pandas hash_array →
splitmix64-derived double hashing, h_i = h1 + i*h2 — Kirsch-Mitzenmacher);
no per-row Python. Deterministic: same ids → same bitset on every
engine, rerun, and partitioning.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _positions(values: np.ndarray, m_bits: int, k: int) -> Iterator[np.ndarray]:
    """Bit positions for an int64 id array. The caller MUST pass int64:
    a pandas Series holding any NULL is float64 after Arrow conversion,
    and hash_array(float64) != hash_array(int64) for the same ids — a
    silent build/probe mismatch that would break the no-false-negative
    guarantee (ADVICE r2)."""
    from pandas.util import hash_array

    assert values.dtype == np.int64, f"id array must be int64, got {values.dtype}"
    h1 = hash_array(values)
    h2 = _splitmix64(h1) | np.uint64(1)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)


def _int64_ids(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(int64 ids of non-null rows, boolean not-null mask). Null ids are
    excluded from hashing on BOTH build and probe paths so the two sides
    always hash the same dtype."""
    mask = s.notna().to_numpy()
    ids = s.to_numpy()[mask].astype(np.int64)
    return ids, mask


def params_for(n_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k): m = -n ln p / (ln 2)^2, k = (m/n) ln 2."""
    n = max(n_items, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64  # word-align
    k = max(int(round(m / n * math.log(2))), 1)
    return m, k


def build_bloom(df: DataFrame, id_col: str, n_items: int, fpp: float = 0.01):
    """Distributed build: one bitset per partition via mapInPandas, OR'd
    on the driver. Only ``num_partitions`` bitsets of m/8 bytes each
    cross the wire — never the ids. (At extreme partition counts, OR in
    a tree via a two-level mapInPandas; a single collect is right up to
    thousands of partitions.) Returns (bitset_bytes, m_bits, k)."""
    m_bits, k = params_for(n_items, fpp)
    n_bytes = m_bits // 8

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            ids, _ = _int64_ids(pdf[id_col])
            if not len(ids):
                continue
            for pos in _positions(ids, m_bits, k):
                masks = np.left_shift(1, (pos % 8)).astype(np.uint8)
                np.bitwise_or.at(bits, pos // 8, masks)
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        build, "bits binary"
    ).collect()
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for r in parts:
        merged |= np.frombuffer(r["bits"], dtype=np.uint8)
    return merged.tobytes(), m_bits, k


def filter_new_rows(
    batch: DataFrame, id_col: str, bloom_bytes: bytes, m_bits: int, k: int
) -> DataFrame:
    """Keep only batch rows whose id is definitely NOT in the bloom —
    a map-side Arrow-batched probe against the broadcast bitset, no
    shuffle, no join."""
    spark = batch.sparkSession
    bcast = spark.sparkContext.broadcast(bloom_bytes)

    @F.pandas_udf("boolean")
    def maybe_seen(s: pd.Series) -> pd.Series:
        bits = np.frombuffer(bcast.value, dtype=np.uint8)
        ids, mask = _int64_ids(s)
        seen_valid = np.ones(len(ids), dtype=bool)
        for pos in _positions(ids, m_bits, k):
            probe = np.bitwise_and(np.right_shift(bits[pos // 8], pos % 8), 1)
            seen_valid &= probe.astype(bool)
        # A null id was never recorded at build time, so it is
        # definitely-new: maybe_seen=False keeps the row.
        res = np.zeros(len(s), dtype=bool)
        res[mask] = seen_valid
        return pd.Series(res)

    return batch.filter(~maybe_seen(F.col(id_col).cast("long")))


def bloom_new_rows(
    existing: DataFrame, batch: DataFrame, id_col: str, fpp: float = 0.01
) -> DataFrame:
    """End-to-end: count + build on ``existing``, probe ``batch``."""
    n = existing.count()
    bloom, m_bits, k = build_bloom(existing, id_col, n, fpp)
    return filter_new_rows(batch, id_col, bloom, m_bits, k)
