"""Unit tests for corpus-prep operators: chunking, packing, PII scrub,
n-grams, repetition, stratified sampling (hand-computed expectations)."""

from __future__ import annotations

from pyspark.sql import functions as F

from calidad_del_aire_etl_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunk_documents_offsets_and_overlap(spark):
    text = "abcdefghij"  # 10 chars; size=4, overlap=2 → starts 1,3,5,7,9
    out = corpus.chunk_documents(_docs(spark, [(1, text)]), "doc_id", "text", 4, 2)
    got = {r["chunk_idx"]: (r["chunk_text"], r["chunk_len"]) for r in out.collect()}
    assert got == {
        0: ("abcd", 4), 1: ("cdef", 4), 2: ("efgh", 4), 3: ("ghij", 4), 4: ("ij", 2)
    }


def test_chunk_documents_empty_text_single_chunk(spark):
    out = corpus.chunk_documents(_docs(spark, [(1, "")]), "doc_id", "text", 4, 2)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["chunk_len"] == 0


def test_pack_sequences_bins(spark):
    # one shard (shards=1); docs of 3,3,3 tokens, budget 5:
    # cum=3,6,9 → bin=floor((cum-3)/5) = 0,0,1
    rows = [(i, "a b c") for i in range(3)]
    out = corpus.pack_sequences(_docs(spark, rows), "doc_id", "text", budget=5, shards=1)
    got = {r["bin"]: (r["n_docs"], r["sum_tokens"]) for r in out.collect()}
    assert got == {0: (2, 6), 1: (1, 3)}


def test_pack_oversized_doc_gets_own_bins(spark):
    rows = [(0, " ".join(["w"] * 12)), (1, "a b")]  # 12 tokens then 2, budget 5
    out = corpus.pack_sequences(_docs(spark, rows), "doc_id", "text", budget=5, shards=1)
    bins = {r["bin"] for r in out.collect()}
    # doc0: bin floor(0/5)=0; doc1: cum=14 → floor(12/5)=2
    assert bins == {0, 2}


def test_pii_scrub_redacts_and_counts(spark):
    text = "mail a.b+c@foo.org or b@bar.io, call +1 555-123-4567 now"
    out = corpus.pii_scrub(_docs(spark, [(1, text)]), "doc_id", "text").collect()[0]
    assert out["n_emails"] == 2 and out["n_phones"] == 1
    s = out["scrubbed_text"]
    assert "<EMAIL>" in s and "<PHONE>" in s
    assert "@" not in s and "555" not in s


def test_pii_scrub_planted_kinds(spark):
    """One doc per planted PII kind plus a Luhn tripwire: the VALID card
    number becomes <CARD>; the INVALID digit run must NOT — it falls
    through to the phone catch-all."""
    rows = [
        (1, "server at 192.168.1.100 and 10.0.42.7 up"),
        (2, "pay to DE89370400440532013000 today"),
        (3, "ssn 123-45-6789 on file"),
        (4, "card 4111 1111 1111 1111 ok bad 4111111111111112 no"),
        (5, "no pii here at all"),
    ]
    got = {
        r["doc_id"]: r
        for r in corpus.pii_scrub(_docs(spark, rows), "doc_id", "text").collect()
    }
    assert got[1]["n_ips"] == 2 and got[1]["scrubbed_text"].count("<IP>") == 2
    assert got[2]["n_ibans"] == 1 and "<IBAN>" in got[2]["scrubbed_text"]
    assert "DE89" not in got[2]["scrubbed_text"]
    # SSN is phone-shaped: the SSN pass must win (runs first)
    assert got[3]["n_ssns"] == 1 and got[3]["n_phones"] == 0
    assert "<SSN>" in got[3]["scrubbed_text"]
    # Luhn: exactly one of the two 16-digit runs validates
    assert got[4]["n_cards"] == 1
    s4 = got[4]["scrubbed_text"]
    assert s4.count("<CARD>") == 1
    assert "4111 1111 1111 1111" not in s4
    # the invalid run is still redacted — but by the phone catch-all
    assert "4111111111111112" not in s4 and "<PHONE>" in s4
    assert got[5]["scrubbed_text"] == "no pii here at all"
    assert all(
        got[5][c] == 0
        for c in ("n_emails", "n_ips", "n_ibans", "n_ssns", "n_cards", "n_phones")
    )


def test_ngram_topk_counts(spark):
    rows = [(1, "a b a b a"), (2, "a b a")]
    # doc1 trigrams: "a b a","b a b","a b a"; doc2: "a b a"
    out = corpus.ngram_topk(_docs(spark, rows), "text", n=3, k=10).collect()
    assert (out[0]["ngram"], out[0]["freq"]) == ("a b a", 3)
    assert (out[1]["ngram"], out[1]["freq"]) == ("b a b", 1)


def test_repetition_stats_flags(spark):
    rows = [(1, "x y x y x y x y"), (2, "all words here are different okay")]
    out = {
        r["doc_id"]: r
        for r in corpus.repetition_stats(
            _docs(spark, rows), "doc_id", "text", n=3, threshold=0.2
        ).collect()
    }
    # doc1: 6 trigrams, 2 distinct → dup_frac 0.6667 → flagged
    assert out[1]["n_ngrams"] == 6 and out[1]["n_distinct"] == 2
    assert out[1]["is_repetitive"] == 1
    assert out[2]["dup_frac"] == 0.0 and out[2]["is_repetitive"] == 0


def test_repetition_short_doc_zero(spark):
    out = corpus.repetition_stats(
        _docs(spark, [(1, "one two")]), "doc_id", "text", n=3
    ).collect()[0]
    assert out["n_ngrams"] == 0 and out["dup_frac"] == 0.0


def test_stratified_sample_deterministic_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = corpus.stratified_sample(df, "doc_id", "lang", {"en": 8}, default_hex=2)
    twice = corpus.stratified_sample(df, "doc_id", "lang", {"en": 8}, default_hex=2)
    got = {(r["doc_id"], r["lang"]) for r in out.collect()}
    assert got == {(r["doc_id"], r["lang"]) for r in twice.collect()}  # stable
    n_en = sum(1 for _, l in got if l == "en")
    n_fr = sum(1 for _, l in got if l == "fr")
    # 200 docs per stratum at 8/16 and 2/16 — allow generous hash noise
    assert 60 <= n_en <= 140 and 5 <= n_fr <= 55


def test_ngram_split_evaluated_once_in_plan(spark):
    """The let-binding must keep ONE split() in the plan — project
    collapse inlining it into the lambda would re-tokenize per n-gram."""
    df = _docs(spark, [(1, "a b c d")])
    plan = (
        df.select(F.expr(corpus._ngram_expr("text", 3)).alias("g"))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("split(") == 1


def test_mixture_sample_replication_and_downsampling(spark):
    rows = [(i, "keep" if i % 3 == 0 else ("up" if i % 3 == 1 else "down"))
            for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = corpus.mixture_sample(
        df, "doc_id", "source", {"up": 2.5, "down": 0.25}, default_weight=1.0
    )
    rows2 = out.collect()
    again = {(r["doc_id"], r["copy_idx"]) for r in
             corpus.mixture_sample(df, "doc_id", "source",
                                   {"up": 2.5, "down": 0.25}, 1.0).collect()}
    assert {(r["doc_id"], r["copy_idx"]) for r in rows2} == again  # deterministic
    by_src = {}
    for r in rows2:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    assert by_src["keep"] == 200  # weight 1.0 → exactly once
    assert 420 <= by_src["up"] <= 580     # 200 × 2.5 = 500 ± hash noise
    assert 25 <= by_src["down"] <= 75     # 200 × 0.25 = 50 ± hash noise
    # every doc of an upsampled source has copies 0 and 1 at least
    ups = [r for r in rows2 if r["source"] == "up"]
    per_doc = {}
    for r in ups:
        per_doc.setdefault(r["doc_id"], set()).add(r["copy_idx"])
    assert all({0, 1} <= s for s in per_doc.values())


def test_dup_spans_flags_planted_duplication(spark):
    """Two docs sharing a long verbatim paragraph get dup_frac > 0 on
    exactly the shared spans; a unique doc gets 0. Span accounting:
    n_spans == ceil((len - span_len + 1) / stride) for len >= span_len."""
    from calidad_del_aire_etl_spark.operators.corpus import dup_spans

    shared = "this exact paragraph is copied verbatim across two documents " * 3
    rows = [
        (1, shared + "unique tail one alpha beta"),
        (2, shared + "completely different ending gamma delta"),
        (3, "entirely original content with no repetition at all " * 4),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_spans(docs, "doc_id", "text", 32, 16).collect()}
    assert out[1]["n_dup_spans"] > 0 and out[2]["n_dup_spans"] > 0
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_frac"] == 0.0
    for i, txt in ((1, rows[0][1]), (2, rows[1][1]), (3, rows[2][1])):
        expected = (max(len(txt) - 31, 1) + 15) // 16
        assert out[i]["n_spans"] == expected
    # docs 1 and 2 share the same prefix, so their duplicated span
    # COUNTS over the shared region agree
    assert out[1]["n_dup_spans"] == out[2]["n_dup_spans"]


def test_sentence_dedup_strips_planted_boilerplate_keeps_order(spark):
    """A cookie-banner sentence planted in every doc is removed; unique
    sentences survive in original order; a fully-boilerplate doc keeps
    an empty clean_text."""
    from calidad_del_aire_etl_spark.operators import corpus

    banner = "We use cookies to improve your experience"
    rows = [
        (1, f"{banner}. Alpha unique thought one. Beta unique thought two"),
        (2, f"Gamma opens here. {banner}. Delta closes here"),
        (3, f"{banner}"),
        (4, f"{banner}. Epsilon stands alone"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in corpus.sentence_dedup(docs, "doc_id", "text", max_df=3).collect()
    }
    assert len(out) == 4
    assert out[1]["clean_text"] == "Alpha unique thought one. Beta unique thought two"
    assert out[2]["clean_text"] == "Gamma opens here. Delta closes here"
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 1
    assert out[4]["clean_text"] == "Epsilon stands alone"
    assert all(r["n_sentences"] - r["n_removed"] >= 0 for r in out.values())


def test_null_text_matches_duckdb_twin_for_lm_scores(spark, tmp_path):
    """NULL text under explode_outer used to emit a NULL-token row that
    DuckDB's unnest never produces — it could claim a head-vocabulary
    slot and shift the shared Laplace totals (ADVICE r6). Parity-check
    unigram_logprob and dsir_weights against their committed twins on a
    corpus that CONTAINS NULL-text documents."""
    import pandas as pd

    from calidad_del_aire_etl_spark import oracle, registry

    rows = [
        (i, None if i % 5 == 0 else f"alpha beta {'gamma ' * (i % 3)}tok{i}",
         "es", f"src{i % 7}", 20)
        for i in range(40)
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")

    q = registry.queries()
    o = registry.oracle_sql()
    con = oracle.duck_connection(str(tmp_path))
    for key in ("corpus_unigram_logprob", "corpus_dsir_weights"):
        n, problems = oracle.compare_query(spark, con, q[key], o[key], str(tmp_path))
        assert problems == [], f"{key}: {problems}"
        assert 0 < n < 40  # NULL-text docs drop out on BOTH engines
