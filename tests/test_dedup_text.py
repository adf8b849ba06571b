from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calidad_del_aire_etl_spark.operators import dedup, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different words about spark engines here"),
        (5, "el perro corre por la calle de la ciudad"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_collapses_identical(docs):
    out = dedup.exact_dedup(docs, "doc_id", "text").collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 3, 4, 5]  # doc 2 collapsed into 1 (min id survives)


def test_jaccard_identical_is_one(docs):
    out = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and got[(1, 3)] < 1.0  # near dup, shared prefix shingles
    assert not any(4 in p or 5 in p for p in got)


def test_minhash_finds_exact_and_near_dups(docs):
    out = dedup.minhash_lsh_pairs(docs, "doc_id", "text").collect()
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in out}
    assert got[(1, 2)] == 1.0  # identical signature
    assert all(a < b for a, b in got)


def test_simhash_identical_docs_equal_fingerprints(docs):
    out = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs, "doc_id", "text").collect()}
    assert out[1] == out[2]
    assert 0 <= out[1] < 2**16
    # near-dup should be close in hamming distance, far doc should differ
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(out[1], out[3]) <= ham(out[1], out[4])


def test_lang_id_real_sentences(spark):
    rows = [
        (1, "the cat is on the roof of the house and the barn"),
        (2, "el gato está en el tejado de la casa que vemos"),
        (3, "der Hund ist gross und die Katze ist klein das stimmt"),
        (4, "le chat est sur le toit et les oiseaux est une chose"),
        (5, "xyzzy plugh foobar"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scored = text.lang_scores(df, "text")
    out = {r["doc_id"]: r["lang"] for r in scored.select("doc_id", text.lang_pick().alias("lang")).collect()}
    assert out == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "abc 123 x-y!")], "doc_id long, text string")
    r = text.token_counts(df, "text").collect()[0]
    assert r["ws_tokens"] == 3
    assert r["alpha_tokens"] == 3  # abc, x, y
    assert r["num_tokens"] == 1  # 123
    assert r["symbol_tokens"] == 2  # '-', '!'


def test_fingerprint_stable_and_distinct(docs):
    out = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(docs, "text").collect()}
    assert out[1] == out[2]
    assert out[1] != out[4]
    assert len(out[1]) == 32


def test_resolve_duplicate_clusters_chain(spark):
    """A chain a-b-c plus an isolated pair d-e and a singleton f: every
    vertex must get the min id of its component, even across hops."""
    from calidad_del_aire_etl_spark.operators.dedup import resolve_duplicate_clusters

    docs = spark.createDataFrame([(i,) for i in range(1, 7)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], ["id_a", "id_b"]
    )
    out = {r["doc_id"]: (r["canonical_id"], r["is_canonical"])
           for r in resolve_duplicate_clusters(docs, "doc_id", pairs).collect()}
    assert out == {1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (4, 1), 5: (4, 0), 6: (6, 1)}


def test_fuzzy_pairs_finds_planted_edit_within_band(spark):
    from calidad_del_aire_etl_spark.operators import dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumped over the lazy dog again and again"),  # small edit
        (3, "a completely different document about spark physical plans"),
        (4, "zzz " + "the quick brown fox jumps over the lazy dog"),  # edit in prefix -> missed by design
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.edit_dist for r in dedup.fuzzy_pairs(df, "doc_id", "text", max_dist=8, prefix_len=12).collect()}
    assert (1, 2) in got and got[(1, 2)] <= 3
    assert all(3 not in pair for pair in got)
    assert all(4 not in pair for pair in got)  # documented prefix-band recall trade


def test_seasonal_anomaly_flags_only_cell_outliers(spark):
    import datetime as dt

    from calidad_del_aire_etl_spark.operators import analytics2

    base_ts = dt.datetime(2024, 1, 1, 10, 0)  # Monday 10:00
    rows = [(i, base_ts, 7, "click", 10.0 + (i % 3) * 0.5) for i in range(30)]
    rows.append((99, base_ts, 7, "click", 500.0))  # wild outlier, same cell
    # different hour cell, same magnitude — must not borrow the other cell's baseline
    rows += [(200 + i, base_ts.replace(hour=11), 7, "click", 500.0 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id int, event_type string, value double")
    got = [r.event_id for r in analytics2.seasonal_anomaly(df, 3.0).collect()]
    assert got == [99]


@pytest.mark.slow
def test_star_cc_matches_label_prop_and_beats_diameter(spark):
    """Alternating large-star/small-star must label a 64-node chain in a
    round budget far below the chain's diameter (label propagation would
    need ~63 rounds; 6 star rounds suffice), and must agree with the
    label-propagation variant on a mixed graph."""
    from calidad_del_aire_etl_spark.operators.dedup import (
        resolve_duplicate_clusters,
        resolve_duplicate_clusters_star,
    )

    n = 64
    docs = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    out = {
        r["doc_id"]: r["canonical_id"]
        for r in resolve_duplicate_clusters_star(
            docs, "doc_id", chain, max_iters=6
        ).collect()
    }
    assert out == {i: 0 for i in range(n)}

    # Mixed shape: two cliques bridged by one edge, a pair, singletons.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 10), (10, 11), (11, 12), (20, 21)],
        ["id_a", "id_b"],
    )
    docs2 = spark.createDataFrame([(i,) for i in range(25)], ["doc_id"])
    star = {
        (r["doc_id"], r["canonical_id"], r["is_canonical"])
        for r in resolve_duplicate_clusters_star(docs2, "doc_id", pairs).collect()
    }
    prop = {
        (r["doc_id"], r["canonical_id"], r["is_canonical"])
        for r in resolve_duplicate_clusters(docs2, "doc_id", pairs).collect()
    }
    assert star == prop


def test_star_cc_raises_on_exhausted_budget(spark):
    """A budget too small to reach the star fixed point must raise, not
    silently emit non-canonical labels (r3 ADVICE)."""
    import pytest

    from calidad_del_aire_etl_spark.operators.dedup import (
        resolve_duplicate_clusters_star,
    )

    n = 64
    docs = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not reach its fixed point"):
        resolve_duplicate_clusters_star(docs, "doc_id", chain, max_iters=1)


def test_incremental_minhash_flags_corpus_dups_only(spark):
    """A new-batch doc duplicating a corpus doc is flagged with that
    corpus id; a fresh doc is not — and corpus docs are never re-signed
    into the output (only new ids appear)."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "a completely different corpus document about engines"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog tonight"),  # dup of 1
            (11, "entirely novel content that matches nothing at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.incremental_minhash_dedup(
            corpus, new, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert set(out) == {10, 11}
    assert out[10]["is_dup_of_corpus"] == 1 and out[10]["matched_corpus_id"] == 1
    assert out[10]["best_est_jaccard"] == 1.0
    assert out[11]["is_dup_of_corpus"] == 0 and out[11]["matched_corpus_id"] is None


def test_keep_best_one_keeper_per_cluster_and_policy(docs):
    """Every near-dup cluster keeps EXACTLY one doc, and the keeper is
    the (quality desc, id asc) argmax of its cluster; singletons keep
    themselves."""
    out = dedup.dedup_keep_best(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    assert len(out) == 5  # verdict for every input doc
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    # docs 1/2/3 are one near-dup cluster; 4 and 5 are singletons
    assert sorted(len(v) for v in by_cluster.values()) == [1, 1, 3]
    for rows in by_cluster.values():
        keepers = [r for r in rows if r["is_kept"] == 1]
        assert len(keepers) == 1
        best = sorted(rows, key=lambda r: (-r["quality_score"], r["doc_id"]))[0]
        assert keepers[0]["doc_id"] == best["doc_id"]


def test_containment_catches_subdocument_jaccard_misses(spark):
    """A short doc pasted verbatim inside a much longer one: overlap
    coefficient ~1.0 (flagged) while Jaccard stays under 0.5 (missed) —
    the asymmetric-dup gap containment exists to close."""
    short = "alpha beta gamma delta epsilon zeta"
    longer = (
        short
        + " plus a very long tail of additional running prose that keeps"
        " going with many extra words so the union grows far beyond the"
        " intersection and the symmetric measure dilutes toward zero"
    )
    docs2 = spark.createDataFrame(
        [(1, short), (2, longer)], "doc_id long, text string"
    )
    cont = dedup.containment_pairs(docs2, "doc_id", "text", n=3, threshold=0.8).collect()
    assert len(cont) == 1 and cont[0]["containment"] >= 0.99
    assert cont[0]["na"] < cont[0]["nb"]  # short side is the contained one
    jac = dedup.jaccard_pairs(docs2, "doc_id", "text", n=3, threshold=0.5).collect()
    assert jac == []  # symmetric Jaccard misses it entirely
