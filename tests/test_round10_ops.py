"""Round-10 operators: the BPE trainer loop and the span-dedup emit
step — each pinned against a hand-rolled reference implementation on a
toy corpus (the SURVEY §5 oracle-or-reference discipline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from calidad_del_aire_etl_spark.session import pin_oracle_compat
from calidad_del_aire_etl_spark.operators import corpus


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Sennrich et al. (2016) learn_bpe, reduced to essentials: words
    symbolize as chars + a terminal '|' marker; each step counts
    adjacent symbol pairs weighted by word frequency, merges the argmax
    (ties: count desc, left asc, right asc) greedily left-to-right."""
    vocab = {tuple(w) + ("|",): f for w, f in word_freqs.items()}
    merges = []
    for step in range(1, n_merges + 1):
        stats: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_merges_match_reference_implementation(spark):
    """The distributed trainer must reproduce reference BPE's merge
    table exactly — pair choice, merge order, and counts — on a corpus
    with repeated words, overlapping pairs (aaa) and merge chaining."""
    pin_oracle_compat(spark)
    docs = [
        ("low low low lower lowest",),
        ("new newer newest low",),
        ("aaa aaa banana",),
    ]
    df = spark.createDataFrame(docs, ["text"])
    got = [
        (r["step"], r["pair_left"], r["pair_right"], r["merged"], r["pair_count"])
        for r in corpus.bpe_merges(df, "text", n_merges=8).collect()
    ]
    freqs: dict[str, int] = {}
    for (t,) in docs:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    assert got == _reference_bpe(freqs, 8)


def test_bpe_merges_overlapping_pair_is_greedy_left_to_right(spark):
    """'aaaa' with winning pair (a,a): greedy scan yields (aa)(aa), so
    step-2's top pair is (aa,aa) — NOT an overlap artifact like (a,aa)
    outranking it."""
    pin_oracle_compat(spark)
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], ["text"])
    rows = corpus.bpe_merges(df, "text", n_merges=2).collect()
    assert (rows[0]["pair_left"], rows[0]["pair_right"]) == ("a", "a")
    # 'aaaa' -> [aa, aa, |]: pairs (aa,aa) x3 and (aa,|) x3; tie breaks
    # on left asc then right asc -> ('aa', 'aa') wins over ('aa', '|')
    # only if 'a' < '|' is false... '|' (0x7c) > 'a' (0x61), so (aa,aa)
    # wins the tie on right asc.
    assert (rows[1]["pair_left"], rows[1]["pair_right"]) == ("aa", "aa")
    assert rows[1]["pair_count"] == 3


def test_span_dedup_emit_planted_half_duplicated_doc(spark):
    """Three docs: A shares an exact 100-char block with B. The block is
    half of A (-> drop at 0.3) but a fifth of B (-> clip); C is unique
    (-> keep). dup_chars must equal the UNION of the duplicated span
    intervals — exactly the planted block length, not the stride-1
    span count (which over-counts 69 overlapping spans)."""
    pin_oracle_compat(spark)
    shared = "the quick brown fox jumps over the lazy dog again and again until one hundred chars are reached ok!!"
    assert len(shared) == 100
    a = "A" * 50 + shared + "B" * 50                       # 200 chars, 50% dup
    b = "unique prefix " + "x y z w v u t s r q p o n m l k j i h g " * 9 + shared
    c = "completely original text with no repeated blocks anywhere at all"
    assert len(b) >= 450
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in corpus.span_dedup_emit(
            df, "doc_id", "text", span_len=32, drop_frac=0.3
        ).collect()
    }
    assert rows[1]["dup_chars"] == 100
    assert rows[1]["action"] == "drop"
    assert rows[1]["dup_char_frac"] == 0.5
    assert rows[1]["kept_chars"] == 100
    assert rows[2]["dup_chars"] == 100
    assert rows[2]["action"] == "clip"
    assert rows[3]["dup_chars"] == 0
    assert rows[3]["action"] == "keep"
    assert rows[3]["n_dup_spans"] == 0


def test_matryoshka_recall_empty_query_set_twins_agree(spark):
    """ADVICE r9: a predicate matching no queries must produce the SAME
    degenerate result in both engines — the literal dims spine with
    hits=0, possible=0, recall=0.0 (not NaN, not zero rows)."""
    import duckdb

    from calidad_del_aire_etl_spark.operators import ann

    pin_oracle_compat(spark)
    sf = "/root/testdata/sf0.001"
    em = spark.read.parquet(f"{sf}/embeddings.parquet")
    got = ann.matryoshka_recall(
        em, "vec_id", "embedding", lambda c: c < -1, k=5, dims=(4, 8)
    ).collect()
    assert [(r["dim"], r["hits"], r["possible"], r["recall"]) for r in got] == [
        (4, 0, 0, 0.0),
        (8, 0, 0, 0.0),
    ]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    twin = con.sql(
        ann.matryoshka_recall_sql(
            "embeddings", "vec_id", "embedding", "q.vec_id < -1", k=5, dims=(4, 8)
        )
    ).fetchall()
    assert [tuple(r) for r in twin] == [(4, 0, 0, 0.0), (8, 0, 0, 0.0)]


def test_range_search_complete_against_full_rescore(spark):
    """ADVICE r9: completeness beyond the top-3 — the range-search
    result set must EQUAL (not just contain) the full pairwise rescore
    at the threshold: every neighbor with rounded cosine >= t present,
    none below, none missing at any rank."""
    import numpy as np

    from calidad_del_aire_etl_spark.operators import ann

    pin_oracle_compat(spark)
    sf = "/root/testdata/sf0.001"
    em = spark.read.parquet(f"{sf}/embeddings.parquet")
    thr = 0.25
    got = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in ann.range_search(
            em, "vec_id", "embedding", lambda c: c < 5, thr
        ).collect()
    }
    rows = em.select("vec_id", "embedding").collect()
    V = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    expect = {}
    for q in [i for i in V if i < 5]:
        for n, v in V.items():
            if n == q:
                continue
            c = float(V[q] @ v / (np.linalg.norm(V[q]) * np.linalg.norm(v)))
            cr = ann._np_round4(np.array([c]))[0]
            if cr >= thr:
                expect[(q, n)] = cr
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-12
