"""Corpus-curation DAG: end-to-end orchestrated run over real testdata."""

from __future__ import annotations

import pytest

from calidad_del_aire_etl_spark.plans.corpus_curation import corpus_curation_dag

SF = "/root/testdata/sf0.001"


def test_corpus_dag_end_to_end(spark, tmp_path):
    out = str(tmp_path / "packed")
    dag = corpus_curation_dag(spark, SF, out, budget=512)
    results = dag.run()
    assert all(r.state == "success" for r in results.values()), {
        k: r.state for k, r in results.items()
    }
    # stats task saw at least one language bucket
    assert sum(results["stats"].value.values()) > 0
    # pack output is readable and bins respect the budget shape
    packed = spark.read.parquet(out)
    assert packed.count() > 0
    cols = set(packed.columns)
    assert {"shard", "bin", "n_docs", "sum_tokens"} <= cols


@pytest.mark.slow
def test_incremental_corpus_daily_cycle(spark, tmp_path):
    """Day-0 bootstrap, then two daily increments: a verbatim dup of a
    corpus doc is dropped by the LSH probe, novel docs merge as new
    snapshots, retention vacuums the oldest snapshot, and day-0 stays
    time-travel-readable until vacuumed."""
    from pyspark.sql import functions as F

    from calidad_del_aire_etl_spark.plans import incremental_corpus as ic
    from calidad_del_aire_etl_spark.sinks import writers

    path = str(tmp_path / "corpus_v")
    seed = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "source"
    ).filter(F.col("doc_id") < 200)
    assert ic.bootstrap_corpus(spark, seed, path) == 0
    n0 = writers.read_versioned_parquet(spark, path).count()

    # day 1: one verbatim dup of corpus doc 5 + two novel docs
    dup_text = seed.filter(F.col("doc_id") == 5).first()["text"]
    day1 = spark.createDataFrame(
        [
            (10_001, dup_text, "day1"),
            (10_002, "completely novel text about spark merge vacuum snapshots " * 8, "day1"),
            (10_003, "another genuinely new document body with fresh tokens entirely " * 8, "day1"),
        ],
        "doc_id long, text string, source string",
    )
    rep1 = ic.apply_daily_increment(spark, path, day1, keep_snapshots=2)
    assert rep1["version"] == 1
    assert rep1["n_corpus_dups_dropped"] >= 1  # the verbatim dup died
    cur = writers.read_versioned_parquet(spark, path)
    ids = {r["doc_id"] for r in cur.select("doc_id").collect()}
    assert 10_001 not in ids and {10_002, 10_003} <= ids
    assert cur.count() == n0 + rep1["n_merged"]

    # day 2: a dup under a NEW id dies; a REVISION of corpus doc 5
    # (same id, content still self-similar) flows through as an update
    day2 = spark.createDataFrame(
        [
            (30_000, "completely novel text about spark merge vacuum snapshots " * 8, "day2"),
            (5, dup_text + " revised appendix section", "day2"),
            (20_001, "yet another brand new body of previously unseen content " * 8, "day2"),
        ],
        "doc_id long, text string, source string",
    )
    rep2 = ic.apply_daily_increment(spark, path, day2, keep_snapshots=1)
    assert rep2["version"] == 2
    assert rep2["n_corpus_dups_dropped"] >= 1  # 30_000 (dup of 10_002) died
    cur2 = {r["doc_id"]: r["source"]
            for r in writers.read_versioned_parquet(spark, path)
            .select("doc_id", "source").collect()}
    assert 30_000 not in cur2
    assert cur2[5] == "day2" and cur2[20_001] == "day2"  # revision + insert landed
    # retention=1 → v0/v1 manifests gone; doc 5's rewritten old file is
    # unreferenced by v2 and physically deleted
    assert rep2["files_vacuumed"] > 0
    import pytest as _pytest

    with _pytest.raises(Exception):
        writers.read_versioned_parquet(spark, path, 0).collect()
    with _pytest.raises(Exception):
        writers.read_versioned_parquet(spark, path, 1).collect()

    # the signature store tracks the corpus doc-for-doc: one row per
    # current doc_id (a revision REPLACED doc 5's stale signature —
    # probing with the old one would keep matching the old text)
    sigs = writers.read_versioned_parquet(spark, path + "_sigs")
    sig_ids = {r["doc_id"] for r in sigs.select("doc_id").collect()}
    assert sig_ids == set(cur2)
    assert sigs.count() == len(sig_ids)  # doc-unique
    from calidad_del_aire_etl_spark.operators import dedup as _dedup

    fresh5 = _dedup.minhash_signatures(
        writers.read_versioned_parquet(spark, path).filter(F.col("doc_id") == 5),
        "doc_id", "text",
    ).first()["sig"]
    stored5 = sigs.filter(F.col("doc_id") == 5).first()["sig"]
    assert list(stored5) == list(fresh5)
