"""Incremental corpus maintenance: the DAY-N path of a production
LLM-corpus pipeline, composing this round's table verbs with the
incremental dedup machinery.

plans/corpus_curation.py is the batch (day-0) story: curate everything,
chunk, pack. This module is what runs every day after: a small new
batch arrives, is curated, and is deduped against the EXISTING corpus
by probing a PERSISTED versioned signature store — day 0 signs the
corpus once; day N signs only the increment, derives the store's band
keys by array slicing (`dedup.bands_from_signatures` +
`incremental_minhash_probe`; the store streams map-side, the increment
broadcasts), and never touches corpus text again. Survivors commit as
a new snapshot of the versioned corpus table AND merge their
signatures into the store (a revised doc's row replaces its stale
signature), with VACUUM bounding both tables to the retention window.
Every state transition is a snapshot: yesterday's corpus stays
time-travel-readable while today's commit lands.
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


def _sig_store_path(table_path: str) -> str:
    return f"{table_path}_sigs"


def bootstrap_corpus(
    spark: SparkSession, docs: DataFrame, table_path: str, min_quality: float = 0.35
) -> int:
    """Day 0: curate the seed corpus, commit it as snapshot v0, and
    commit the matching SIGNATURE store (one (doc_id, sig) row per doc,
    its own versioned table) — the one-time signing that lets every
    later increment probe without touching corpus text again."""
    curated = curate(docs, min_quality).localCheckpoint(eager=True)
    version = write_versioned_parquet(curated, table_path, mode="overwrite")
    sigs = dedup.minhash_signatures(curated, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "sig"
    )
    write_versioned_parquet(sigs, _sig_store_path(table_path), mode="overwrite")
    return version


def apply_daily_increment(
    spark: SparkSession,
    table_path: str,
    new_docs: DataFrame,
    min_quality: float = 0.35,
    keep_snapshots: int = 7,
    broadcast_new: bool = True,
) -> dict:
    """Day N: curate the increment, drop near-dups of the existing
    corpus by probing the PERSISTED signature store (the corpus text is
    never re-read, never re-signed — band keys derive from stored
    signatures by array slicing), MERGE survivors as a new corpus
    snapshot, MERGE their signatures into the store (a revision's row
    replaces its stale signature — an append-only band log would keep
    matching the old text), VACUUM past the retention window. Returns
    the run report a scheduler would log."""
    from ..sinks.writers import latest_version

    curated = curate(new_docs, min_quality).localCheckpoint(eager=True)
    sig_path = _sig_store_path(table_path)
    if latest_version(spark, sig_path) is None:
        # pre-store table (bootstrapped before the signature store
        # existed): sign the corpus once now and commit the store
        corpus = read_versioned_parquet(spark, table_path)
        seed = dedup.minhash_signatures(corpus, "doc_id", "text").select(
            F.col("id").alias("doc_id"), "sig"
        )
        write_versioned_parquet(seed, sig_path, mode="overwrite")
    store = read_versioned_parquet(spark, sig_path).select(
        F.col("doc_id").alias("id"), "sig"
    )
    # sign the increment EXACTLY ONCE: the probe and the store merge
    # both reuse this checkpointed (id, sig) relation
    inc_sigs = dedup.minhash_signatures(curated, "doc_id", "text").localCheckpoint(
        eager=True
    )
    flags = dedup.incremental_minhash_probe(
        dedup.bands_from_signatures(store),
        curated,
        "doc_id",
        "text",
        broadcast_new=broadcast_new,
        new_bands_rel=dedup.bands_from_signatures(inc_sigs),
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
    new_sigs = inc_sigs.join(
        survivors.select(F.col("doc_id").alias("id")), "id", "left_semi"
    ).select(F.col("id").alias("doc_id"), "sig")
    sig_version = merge_versioned_parquet(spark, sig_path, new_sigs, ["doc_id"])
    vacuum_versioned_parquet(spark, sig_path, keep_last=keep_snapshots)
    vacuumed = vacuum_versioned_parquet(spark, table_path, keep_last=keep_snapshots)
    return {
        "version": version,
        "sig_store_version": sig_version,
        "n_curated_in": n_in,
        "n_corpus_dups_dropped": n_in - n_kept,
        "n_merged": n_kept,
        "files_vacuumed": vacuumed,
    }
