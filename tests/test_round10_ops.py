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


def test_centered_rolling_mean_matches_pandas_exactly(spark):
    """VERDICT r9 missing #1: center=True must reproduce pandas
    rolling(window=6, center=True) — frame [-3, +2] AND the
    min_periods=window NaN edges — so the dashboard curve has no
    phase shift."""
    import pandas as pd

    from calidad_del_aire_etl_spark.operators import analytics

    pin_oracle_compat(spark)
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    pdf = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=10, freq="h"),
        "g": ["a"] * 10,
        "v": vals,
    })
    df = spark.createDataFrame(pdf)
    got = {
        r["ts"]: r["rolling_mean"]
        for r in analytics.rolling_mean(
            df, "ts", "g", "v", window_rows=6, center=True
        ).collect()
    }
    ref = pdf.set_index("ts")["v"].rolling(window=6, center=True).mean()
    for ts, want in ref.items():
        have = got[ts]
        if pd.isna(want):
            assert have is None, (ts, have)
        else:
            assert have == round(want + 1e-9, 4), (ts, have, want)


def test_dag_on_failure_hook_fires_once_after_retries(spark):
    """VERDICT r9 missing #2 (the reference DAG's email_on_failure):
    the hook fires exactly once per task that exhausts retries, with
    the final TaskResult; downstream skips do NOT fire it; a raising
    hook must not kill the run."""
    from calidad_del_aire_etl_spark.plans.orchestrator import Dag

    fired = []
    dag = Dag("alerting", on_failure=lambda name, res: fired.append((name, res.state, res.attempts)))

    @dag.task("boom", retries=2)
    def _boom(**_):
        raise RuntimeError("planted")

    @dag.task("downstream", upstream=["boom"])
    def _down(x):
        return x

    results = dag.run()
    assert results["boom"].state == "failed"
    assert results["downstream"].state == "skipped"
    assert fired == [("boom", "failed", 3)]  # once, after 1+2 attempts

    # a hook that raises is contained and recorded, not fatal
    dag2 = Dag("bad-hook", on_failure=lambda n, r: 1 / 0)

    @dag2.task("boom2")
    def _boom2(**_):
        raise RuntimeError("planted")

    res2 = dag2.run()
    assert res2["boom2"].state == "failed"
    assert "on_failure hook raised" in res2["boom2"].error


def test_jdbc_ddl_generator_and_derby_bootstrap(spark):
    """VERDICT r9 missing #3 (the reference's PostgresOperator CREATE
    TABLE path): DDL generator covers the type map + decimal + NOT NULL
    + PK; ensure_jdbc_table is idempotent against a real embedded Derby
    and the created table accepts a write_jdbc append."""
    import pytest as _pytest

    from calidad_del_aire_etl_spark.sinks.writers import (
        ensure_jdbc_table,
        jdbc_create_table_sql,
        write_jdbc,
    )

    df = spark.createDataFrame(
        [(1, "x", 1.5)], "id long, name string, score double"
    )
    pg = jdbc_create_table_sql(df.schema, "t", "postgresql", primary_key=["id"])
    assert '"id" BIGINT' in pg and '"name" TEXT' in pg
    assert '"score" DOUBLE PRECISION' in pg and 'PRIMARY KEY ("id")' in pg
    assert pg.startswith('CREATE TABLE IF NOT EXISTS "t"')
    from pyspark.sql.types import DecimalType, StructField, StructType

    dec = StructType([StructField("amt", DecimalType(12, 2), False)])
    assert '"amt" NUMERIC(12,2) NOT NULL' in jdbc_create_table_sql(dec, "d")
    from pyspark.sql.types import ArrayType, StringType

    nested = StructType([StructField("tags", ArrayType(StringType()), True)])
    with _pytest.raises(ValueError, match="no postgresql DDL mapping"):
        jdbc_create_table_sql(nested, "n")

    # Derby integration (embedded driver ships in Spark's jars)
    try:
        spark._jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    except Exception:
        _pytest.skip("Derby embedded driver not on the Spark classpath")
    url = "jdbc:derby:memory:r10_ddl_test;create=true"
    assert ensure_jdbc_table(spark, url, "boot", df.schema, dialect="derby") is True
    assert ensure_jdbc_table(spark, url, "boot", df.schema, dialect="derby") is False
    write_jdbc(df, url, "boot", mode="append")
    back = (
        spark.read.format("jdbc").option("url", url).option("dbtable", "boot").load()
    )
    assert back.count() == 1


def test_semantic_dedup_adaptive_k_bounds_cluster_size(spark):
    """The 100 TB dial (r10): target_cluster_size raises k with N so the
    per-cluster quadratic pass stays bounded (fixed k=8 at sf10 ran one
    20-minute single-task cluster). Adaptive run must still drop a
    planted near-duplicate pair and keep every cluster under ~2x the
    target (k-means clusters aren't perfectly even)."""
    from calidad_del_aire_etl_spark.operators import ann

    pin_oracle_compat(spark)
    em = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = em.count()
    out = ann.semantic_dedup(
        em, "vec_id", "embedding", k=8, iters=2, tau=0.999,
        target_cluster_size=100,
    )
    sizes = out.groupBy("cluster").count().collect()
    assert len(sizes) >= n // 100  # k actually scaled up from 8
    # bounded per-cluster work: no cluster is corpus-sized
    assert max(r["count"] for r in sizes) < 20 * 100
    # exact self-duplicates (tau ~ 1) still detected within clusters:
    # plant one by duplicating a vector under a new id
    import pyspark.sql.functions as F

    dup = em.limit(1).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        "embedding", "label",
    )
    out2 = ann.semantic_dedup(
        em.unionByName(dup), "vec_id", "embedding", k=8, iters=2,
        tau=0.999, target_cluster_size=100,
    )
    planted = out2.filter(F.col("vec_id") >= 10_000_000).collect()
    assert len(planted) == 1 and planted[0]["is_kept"] == 0
