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

Hashing (r13 — was pandas hash_array + splitmix64, engine-opaque, which
forced the registered query into a rows-only gate): Kirsch-Mitzenmacher
double hashing ``h_i = h1 + i·h2`` over TWO md5-prefix 60-bit hashes
computed JVM-SIDE (codegen'd; identical expression text in the DuckDB
twin), h2 forced odd. The Arrow stage receives (h1, h2) ints plus a
validity boolean — NEVER a nullable int column, which pandas would
degrade to float64 and silently corrupt 60-bit hashes (the ADVICE r2
null-poison lesson, now structural). Every set bit is then a pure
integer fact both engines reproduce: :func:`bloom_new_rows_sql` replays
the touched-bit set and the k-probe conjunction, making the registered
query a FULL hash-parity gate. The (m, k) sizing arithmetic uses
literal constants and floor(+0.5) so both engines derive identical
parameters from the same count (see ``params_for``).

Deterministic: same ids → same bitset on every engine, rerun, and
partitioning. No overflow: h1, h2 < 2^60, i < k ≤ 7 ⇒ h1 + i·h2 < 2^63.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# -ln(fpp)/ln(2)^2 and ln(2), frozen as the double literals BOTH engines
# use (recomputing -n*ln(p)/ln(2)^2 stepwise gives differently-rounded
# doubles per engine; a 1-ulp gap under ceil() would fork m).
_LN2 = math.log(2.0)


def params_for(n_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k): m = n·C word-aligned (C = −ln p / ln²2),
    k = floor(m/n·ln2 + 0.5). Single-multiply + floor(+0.5) forms so a
    SQL twin embedding the same literals computes identical values."""
    n = max(n_items, 1)
    c = -math.log(fpp) / (_LN2 * _LN2)
    m = int(math.ceil(n * c))
    m = ((m + 63) // 64) * 64  # word-align
    k = max(int(math.floor(m / n * _LN2 + 0.5)), 1)
    # The module's int64 no-overflow argument (h1 + i·h2 < 2^63 for
    # h1,h2 < 2^60) only holds for i < k ≤ 7, i.e. fpp ≥ ~0.005.  Below
    # that the numpy side would wrap silently while the DuckDB twin
    # raises a BIGINT overflow — silent cross-engine divergence, so
    # fail loudly instead (ADVICE r13).
    if k > 7:
        raise ValueError(
            f"fpp={fpp!r} needs k={k} hash draws; the cross-engine "
            "int64 overflow-free guarantee holds only for k <= 7 "
            "(fpp >= ~0.005)"
        )
    return m, k


def _hash_exprs(id_col: str) -> tuple[str, str]:
    """Spark-SQL expressions for the (h1, h2) double-hash pair — the
    engines' shared 60-bit md5-prefix bigint, salted '#bl2' for the
    second draw, h2 forced odd."""
    s = f"cast({id_col} as string)"
    h1 = f"cast(conv(substr(md5({s}), 1, 15), 16, 10) as bigint)"
    h2 = (
        f"(cast(conv(substr(md5(concat({s}, '#bl2')), 1, 15), 16, 10) "
        f"as bigint) | 1)"
    )
    return h1, h2


def build_bloom(df: DataFrame, id_col: str, n_items: int, fpp: float = 0.01):
    """Distributed build: one bitset per partition via mapInPandas, OR'd
    on the driver. Only ``num_partitions`` bitsets of m/8 bytes each
    cross the wire — never the ids. (At extreme partition counts, OR in
    a tree via a two-level mapInPandas; a single collect is right up to
    thousands of partitions.) NULL ids are dropped at the scan (they
    are definitely-new on the probe side). Returns (bitset_bytes,
    m_bits, k)."""
    m_bits, k = params_for(n_items, fpp)
    n_bytes = m_bits // 8
    h1e, h2e = _hash_exprs(id_col)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            h1 = pdf["h1"].to_numpy(dtype=np.int64)
            h2 = pdf["h2"].to_numpy(dtype=np.int64)
            for i in range(k):
                pos = (h1 + i * h2) % m_bits
                masks = np.left_shift(1, (pos % 8)).astype(np.uint8)
                np.bitwise_or.at(bits, pos // 8, masks)
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.expr(h1e).alias("h1"), F.expr(h2e).alias("h2"))
        .mapInPandas(build, "bits binary")
        .collect()
    )
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for r in parts:
        merged |= np.frombuffer(r["bits"], dtype=np.uint8)
    return merged.tobytes(), m_bits, k


def filter_new_rows(
    batch: DataFrame, id_col: str, bloom_bytes: bytes, m_bits: int, k: int
) -> DataFrame:
    """Keep only batch rows whose id is definitely NOT in the bloom —
    a map-side Arrow-batched probe against the broadcast bitset, no
    shuffle, no join. NULL-id rows were never recorded at build time,
    so they are definitely-new and always kept."""
    spark = batch.sparkSession
    bcast = spark.sparkContext.broadcast(bloom_bytes)
    h1e, h2e = _hash_exprs(id_col)

    @F.pandas_udf("boolean")
    def maybe_seen(h1s: pd.Series, h2s: pd.Series, valid: pd.Series) -> pd.Series:
        bits = np.frombuffer(bcast.value, dtype=np.uint8)
        mask = valid.to_numpy(dtype=bool)
        h1 = h1s.to_numpy(dtype=np.int64)
        h2 = h2s.to_numpy(dtype=np.int64)
        seen = np.ones(len(h1), dtype=bool)
        for i in range(k):
            pos = (h1 + i * h2) % m_bits
            probe = np.bitwise_and(np.right_shift(bits[pos // 8], pos % 8), 1)
            seen &= probe.astype(bool)
        res = np.zeros(len(h1), dtype=bool)
        res[mask] = seen[mask]
        return pd.Series(res)

    return batch.filter(
        ~maybe_seen(
            F.expr(f"coalesce({h1e}, 0)"),
            F.expr(f"coalesce({h2e}, 1)"),
            F.col(id_col).isNotNull(),
        )
    )


def bloom_new_rows(
    existing: DataFrame, batch: DataFrame, id_col: str, fpp: float = 0.01
) -> DataFrame:
    """End-to-end: count + build on ``existing``, probe ``batch``. The
    count excludes NULL ids so both engines size (m, k) identically."""
    n = existing.filter(F.col(id_col).isNotNull()).count()
    bloom, m_bits, k = build_bloom(existing, id_col, n, fpp)
    return filter_new_rows(batch, id_col, bloom, m_bits, k)


def bloom_new_rows_sql(
    table: str,
    id_col: str,
    existing_pred_sql: str,
    select_cols: str,
    fpp: float = 0.01,
) -> str:
    """DuckDB twin of :func:`bloom_new_rows` where both 'existing' and
    the batch come from ``table`` (existing = rows matching
    ``existing_pred_sql``; batch = all rows): replays the (m, k)
    sizing from the same literal constants, the touched-bit set (≤
    k·|existing| DISTINCT positions — never the m-bit array), and the
    k-probe conjunction. A batch row survives iff ANY of its k
    positions is unset, i.e. its hit count < k."""
    c = -math.log(fpp) / (_LN2 * _LN2)
    s = f"CAST({id_col} AS VARCHAR)"
    hpair = (
        f"(('0x' || substr(md5({s}), 1, 15))::BIGINT) AS h1,"
        f" ((('0x' || substr(md5({s} || '#bl2'), 1, 15))::BIGINT) | 1) AS h2"
    )
    return f"""
    WITH ex AS (
      SELECT {hpair}
      FROM {table} WHERE ({existing_pred_sql}) AND {id_col} IS NOT NULL
    ), p AS (
      SELECT GREATEST(CAST(((CAST(CEIL(GREATEST(COUNT(*), 1) * {c!r}) AS BIGINT)
                             + 63) // 64) * 64 AS BIGINT), 64) AS m,
             GREATEST(COUNT(*), 1) AS n
      FROM ex
    ), pk AS (
      SELECT m, GREATEST(CAST(FLOOR(CAST(m AS DOUBLE) / n * {_LN2!r} + 0.5)
                              AS BIGINT), 1) AS k
      FROM p
    ), bits AS (
      SELECT DISTINCT (ex.h1 + i.i * ex.h2) % pk.m AS pos
      FROM ex, pk, (SELECT unnest(range((SELECT k FROM pk))) AS i) i
    ), probe AS (
      SELECT {id_col}, {hpair} FROM {table}
    ), hits AS (
      -- COUNT(DISTINCT i.i), not COUNT(*): with duplicate ids in the
      -- probed table, per-(row,i) matches would multiply (dups × set
      -- probes) and a row with < k set bits could still reach
      -- nhit >= k, wrongly dropping a genuinely-new row and breaking
      -- the no-false-negative guarantee (ADVICE r13).
      SELECT probe.{id_col}, CAST(COUNT(DISTINCT i.i) AS BIGINT) AS nhit
      FROM probe, pk, (SELECT unnest(range((SELECT k FROM pk))) AS i) i
      JOIN bits ON bits.pos = (probe.h1 + i.i * probe.h2) % pk.m
      WHERE probe.{id_col} IS NOT NULL
      GROUP BY 1
    )
    SELECT {select_cols} FROM {table} t
    LEFT JOIN hits ON hits.{id_col} = t.{id_col}
    WHERE t.{id_col} IS NULL
       OR COALESCE(hits.nhit, 0) < (SELECT k FROM pk)
    """