"""Incremental corpus maintenance: the DAY-N path of a production
LLM-corpus pipeline, composing this round's table verbs with the
incremental dedup machinery.

plans/corpus_curation.py is the batch (day-0) story: curate everything,
chunk, pack. This module is what runs every day after: a small new
batch arrives, is curated, deduped against the EXISTING corpus without
re-signing it (`dedup.incremental_minhash_dedup` — the corpus streams
map-side, the increment broadcasts), and the survivors commit as a new
snapshot of the versioned corpus table (copy-on-write MERGE: only
key-matched files rewrite), with VACUUM bounding storage to the
retention window. Every state transition is a snapshot: yesterday's
corpus stays time-travel-readable while today's commit lands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from ..sinks.writers import (
    merge_versioned_parquet,
    read_versioned_parquet,
    vacuum_versioned_parquet,
    write_versioned_parquet,
)
from .corpus_curation import curate


def bootstrap_corpus(
    spark: SparkSession, docs: DataFrame, table_path: str, min_quality: float = 0.35
) -> int:
    """Day 0: curate the seed corpus and commit it as snapshot v0."""
    return write_versioned_parquet(
        curate(docs, min_quality), table_path, mode="overwrite"
    )


def apply_daily_increment(
    spark: SparkSession,
    table_path: str,
    new_docs: DataFrame,
    min_quality: float = 0.35,
    keep_snapshots: int = 7,
    broadcast_new: bool = True,
) -> dict:
    """Day N: curate the increment, drop near-dups of the existing
    corpus (LSH probe, corpus never re-signed), MERGE survivors as a
    new snapshot, VACUUM past the retention window. Returns the run
    report a scheduler would log."""
    corpus = read_versioned_parquet(spark, table_path)
    curated = curate(new_docs, min_quality).localCheckpoint(eager=True)
    flags = dedup.incremental_minhash_dedup(
        corpus, curated, "doc_id", "text", broadcast_new=broadcast_new
    )
    # A re-sent doc_id whose content still matches ITSELF is a
    # revision, not a duplicate — it must flow through so the MERGE
    # updates the row (matched_corpus_id is the MIN matching id, so a
    # revision that also matches a second, lower-id doc is conservatively
    # treated as a dup of that doc).
    keep = flags.filter(
        (F.col("is_dup_of_corpus") == 0)
        | (F.col("matched_corpus_id") == F.col("doc_id"))
    ).select("doc_id")
    # checkpoint: survivors' lineage carries the CORPUS-wide signing
    # join; without this, count() + MERGE's affected-file probe + the
    # final write would each re-sign the corpus — 3x the pass the
    # module exists to avoid. The materialized relation is only the
    # curated daily increment.
    survivors = curated.join(keep, "doc_id", "left_semi").localCheckpoint(
        eager=True
    )
    n_in, n_kept = curated.count(), survivors.count()
    version = merge_versioned_parquet(spark, table_path, survivors, ["doc_id"])
    vacuumed = vacuum_versioned_parquet(spark, table_path, keep_last=keep_snapshots)
    return {
        "version": version,
        "n_curated_in": n_in,
        "n_corpus_dups_dropped": n_in - n_kept,
        "n_merged": n_kept,
        "files_vacuumed": vacuumed,
    }
