"""Multimodal binary-column operators (SURVEY §2 #36-37).

Images/audio/video ride through the engine as opaque ``binary`` columns
plus typed metadata. The decode step is STUBBED (no image/audio libs in
this environment) behind a deterministic fake, but everything Spark-side
is real and tested: schemas, Arrow batch shapes, mapInPandas plumbing,
and partition behavior — swap ``_fake_decode`` for a PIL/ffmpeg call and
nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, ok boolean, features array<double>"
)


def with_binary_payload(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (here: UTF-8 bytes of the text
    carrier; in production: the image/audio blob read from object store)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def binary_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over a binary column — byte length, sha256 digest,
    hex magic prefix. Pure JVM expressions; no decode."""
    p = F.col(payload_col)
    return df.select(
        "*",
        F.length(p).cast("bigint").alias("byte_len"),
        F.sha2(p, 256).alias("sha256"),
        F.lower(F.hex(F.substring(p, 1, 4))).alias("magic_hex"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for an image/audio decoder: an 8-bin byte
    histogram normalized to [0, 1]. Replace with a real decoder
    (PIL.Image.open / librosa.load) — the Spark plumbing is identical.
    """
    if not payload:
        raise NotImplementedError("real decoder required for empty payloads")
    bins = [0] * FEATURE_DIM
    for b in payload:
        bins[b >> 5] += 1
    n = len(payload)
    return [round(c / n, 6) for c in bins]


def feature_extract(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams Arrow record batches through Python — the
    scale-safe UDF shape (one serialization per batch, not per row).
    Output: one feature vector per payload plus a success flag, so a
    corrupt blob can't kill a 100 TB job.
    """
    names = [id_col, payload_col]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf[payload_col]:
                try:
                    feats.append(_fake_decode(bytes(payload)))
                    oks.append(True)
                except Exception:
                    feats.append([0.0] * FEATURE_DIM)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": pdf[payload_col].map(len),
                    "ok": oks,
                    "features": feats,
                }
            )

    return df.select(*names).mapInPandas(extract, schema=FEATURE_SCHEMA)
