"""Corpus-curation DAG: end-to-end orchestrated run over real testdata."""

from __future__ import annotations

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
