"""Round-11 additions: Arrow-kernel two-pass LM scorers
(unigram_logprob / kn_bigram_logprob rewrite) — edge-whitespace
tokenizer parity and forced-tail-path parity against the DuckDB twins.
"""

from __future__ import annotations

import pandas as pd
import pytest

from calidad_del_aire_etl_spark import oracle
from calidad_del_aire_etl_spark.operators import corpus
from calidad_del_aire_etl_spark.session import pin_oracle_compat

# texts exercising every edge of the Java split semantics the Arrow
# tokenizer must reproduce: empty string ('' -> ['']), whitespace-only,
# edge tabs (leading/trailing '' tokens survive trim-of-spaces-only),
# interior runs, NULL, and mixed-case
_EDGE_TEXTS = [
    "",
    "  ",
    "a\tb",
    "\ta b",
    "a b\t",
    "a  b",
    " a b ",
    None,
    "A B a\nb",
    "x\x0by\fz\rw",
    "the the the unique",
]


def _edge_docs_parquet(tmp_path):
    rows = [
        (i, t, "es", f"src{i % 3}", len(t) if t else 0)
        for i, t in enumerate(_EDGE_TEXTS * 5)
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


@pytest.mark.parametrize(
    "key",
    ["corpus_unigram_logprob", "corpus_kn_bigram_logprob",
     "corpus_perplexity_buckets", "corpus_perplexity_buckets_approx"],
)
def test_lm_scorers_edge_whitespace_twins_agree(spark, tmp_path, key):
    """The Arrow tokenizer (corpus._arrow_token_lists) must reproduce
    Java split semantics exactly — including '' tokens from empty
    strings and edge non-space whitespace — or the LM scores diverge
    from the regexp_split_to_array twins on exactly these inputs."""
    from calidad_del_aire_etl_spark import registry

    pin_oracle_compat(spark)
    sf = _edge_docs_parquet(tmp_path)
    q = registry.queries()
    o = registry.oracle_sql()
    con = oracle.duck_connection(sf)
    n, problems = oracle.compare_query(spark, con, q[key], o[key], sf)
    assert problems == [], f"{key}: {problems}"
    assert n > 0


def test_unigram_logprob_forced_tail_path_matches_twin(spark, tmp_path):
    """head_size=2 pushes most of the vocabulary through the
    distributed tail-residual join — the path a 100 TB vocabulary
    actually takes — and the result must still hash-match the twin,
    which has no head/tail notion at all."""
    pin_oracle_compat(spark)
    sf = _edge_docs_parquet(tmp_path)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_log2_prob"])
        for r in corpus.unigram_logprob(docs, "doc_id", "text", head_size=2).collect()
    }
    con = oracle.duck_connection(sf)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            corpus.unigram_logprob_sql("documents", "doc_id", "text")
        ).fetchall()
    }
    assert got == want


def test_kn_bigram_forced_tail_path_matches_twin(spark, tmp_path):
    pin_oracle_compat(spark)
    sf = _edge_docs_parquet(tmp_path)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_log2_prob"])
        for r in corpus.kn_bigram_logprob(
            docs, "doc_id", "text", head_size=3
        ).collect()
    }
    con = oracle.duck_connection(sf)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            corpus.kn_bigram_logprob_sql("documents", "doc_id", "text")
        ).fetchall()
    }
    assert got == want


def _basket_fixture(spark):
    # 4 orders: basket {1,2,3} twice, {1,2} once (plus a dup line), {9} once
    rows = [
        (100, 1), (100, 2), (100, 3),
        (200, 1), (200, 2), (200, 3),
        (300, 1), (300, 2), (300, 2),
        (400, 9),
    ]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def _expected_basket_affinity():
    # n=4 orders; n_1=3, n_2=3, n_3=2; pairs with support>=2:
    # (1,2):3 lift=3*4/(3*3)=1.3333; (1,3):2 lift=2*4/(3*2)=1.3333;
    # (2,3):2 lift=1.3333 — ties break (pa, pb) ascending
    return [
        (1, 2, 3, 1.3333),
        (1, 3, 2, 1.3333),
        (2, 3, 2, 1.3333),
    ]


def test_basket_affinity_hand_computed(spark):
    from calidad_del_aire_etl_spark.operators import behavior

    out = [
        tuple(r)
        for r in behavior.basket_affinity(
            _basket_fixture(spark), min_support=2
        ).collect()
    ]
    assert out == _expected_basket_affinity()


def test_basket_affinity_carries_orders_across_arrow_batches(spark):
    """Force 2-row Arrow batches so every basket straddles a batch
    boundary — the per-partition carry in pair_gen must reassemble them
    (a dropped carry would halve the pair supports)."""
    from calidad_del_aire_etl_spark.operators import behavior

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "2")
    try:
        li = _basket_fixture(spark).coalesce(1)
        out = [
            tuple(r)
            for r in behavior.basket_affinity(li, min_support=2).collect()
        ]
    finally:
        spark.conf.set(key, old)
    assert out == _expected_basket_affinity()


def test_arrow_tokenizer_matches_java_split_semantics():
    """Direct kernel-level pin: Arrow split_pattern_regex under
    utf8_trim(' ') reproduces split(lower(trim(s)), '\\s+') for every
    edge case, including the ''-token rows."""
    toks = corpus._arrow_token_lists(pd.Series(_EDGE_TEXTS))
    assert toks.to_pylist() == [
        [""],
        [""],
        ["a", "b"],
        ["", "a", "b"],
        ["a", "b", ""],
        ["a", "b"],
        ["a", "b"],
        None,
        ["a", "b", "a", "b"],
        ["x", "y", "z", "w"],
        ["the", "the", "the", "unique"],
    ]
