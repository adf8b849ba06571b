"""Text-analysis operators for LLM-data pipelines (SURVEY §2 #32-35).

All operators are pure Catalyst expressions (split / higher-order array
functions / string ops) — no Python in the hot path, so they run inside
whole-stage codegen and scale linearly with document bytes. Every one
has a DuckDB SQL twin built from the same primitives, used as the
correctness oracle.

Portability notes (Spark ↔ DuckDB):
- occurrence counts use the non-overlapping replace() trick — identical
  left-to-right semantics in both engines, no regex dialect drift;
- md5() yields the same lowercase hex in both; string min/max is byte
  lexicographic in both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import r4

# Marker stopwords per language, scored by padded-occurrence counts.
# Deterministic tie-break: earlier languages win.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "les", "et", "est", "une"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS_EN = ["the", "a", "of", "and", "is", "to", "in"]
PUNCT_CHARS = [".", ",", "!", "?", ";", ":"]


def padded(text: Column) -> Column:
    return F.concat(F.lit(" "), text, F.lit(" "))


def occ_count(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count of ``needle`` via replace()."""
    pat = f" {needle} "
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(pat), F.lit(""))))
        / F.lit(len(pat))
    ).cast("bigint")


def occ_count_sql(text_expr: str, needle: str) -> str:
    pat = f" {needle} "
    return (
        f"CAST((LENGTH({text_expr}) - LENGTH(REPLACE({text_expr}, '{pat}', '')))"
        f" / {len(pat)} AS BIGINT)"
    )


def char_count(text: Column, ch: str) -> Column:
    return F.length(text) - F.length(F.replace(text, F.lit(ch), F.lit("")))


def char_count_sql(text_expr: str, ch: str) -> str:
    return f"(LENGTH({text_expr}) - LENGTH(REPLACE({text_expr}, '{ch}', '')))"


def lang_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Add one ``score_<lang>`` column per language profile."""
    p = padded(F.col(text_col))
    for lang, markers in LANG_MARKERS.items():
        score = None
        for m in markers:
            c = occ_count(p, m)
            score = c if score is None else score + c
        df = df.withColumn(f"score_{lang}", score)
    return df


def lang_pick() -> Column:
    """Argmax over the score columns with fixed priority order."""
    langs = list(LANG_MARKERS)
    expr = F.when(
        sum((F.col(f"score_{lg}") for lg in langs), F.lit(0)) == 0, F.lit("und")
    )
    for i, lg in enumerate(langs):
        cond = None
        for other in langs[i + 1 :]:
            c = F.col(f"score_{lg}") >= F.col(f"score_{other}")
            cond = c if cond is None else (cond & c)
        for prev in langs[:i]:
            c = F.col(f"score_{lg}") > F.col(f"score_{prev}")
            cond = c if cond is None else (cond & c)
        expr = expr.when(cond if cond is not None else F.lit(True), F.lit(lg))
    return expr.otherwise(F.lit("und"))


def lang_id_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of lang_scores + lang_pick."""
    langs = list(LANG_MARKERS)
    p = f"(' ' || {text_col} || ' ')"
    score_exprs = []
    for lang, markers in LANG_MARKERS.items():
        score_exprs.append(
            "(" + " + ".join(occ_count_sql(p, m) for m in markers) + f") AS score_{lang}"
        )
    total = " + ".join(f"score_{lg}" for lg in langs)
    cases = [f"WHEN ({total}) = 0 THEN 'und'"]
    for i, lg in enumerate(langs):
        conds = [f"score_{lg} >= score_{o}" for o in langs[i + 1 :]]
        conds += [f"score_{lg} > score_{p_}" for p_ in langs[:i]]
        cond = " AND ".join(conds) if conds else "TRUE"
        cases.append(f"WHEN {cond} THEN '{lg}'")
    pick = "CASE " + " ".join(cases) + " ELSE 'und' END"
    scores = ", ".join(f"score_{lg}" for lg in langs)
    return f"""
    SELECT {id_col}, {pick} AS detected_lang, {scores} FROM (
      SELECT {id_col}, {', '.join(score_exprs)} FROM {table}
    )
    """


def token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace tokens plus BPE-ish class counts (alpha / numeric /
    symbol runs)."""
    t = F.col(text_col)
    return df.select(
        "*",
        F.size(F.split(F.trim(t), r"\s+")).cast("bigint").alias("ws_tokens"),
        F.regexp_count(t, F.lit(r"[A-Za-z]+")).cast("bigint").alias("alpha_tokens"),
        F.regexp_count(t, F.lit(r"[0-9]+")).cast("bigint").alias("num_tokens"),
        F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]")).cast("bigint").alias("symbol_tokens"),
        F.length(t).cast("bigint").alias("n_chars_measured"),
    )


TOKEN_COUNTS_SQL = r"""
    SELECT {id_col},
           CAST(len(regexp_split_to_array(trim({t}), '[ \t\n\x0b\f\r]+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all({t}, '[A-Za-z]+')) AS BIGINT) AS alpha_tokens,
           CAST(len(regexp_extract_all({t}, '[0-9]+')) AS BIGINT) AS num_tokens,
           CAST(len(regexp_extract_all({t}, '[^A-Za-z0-9 \t\n\x0b\f\r]')) AS BIGINT) AS symbol_tokens,
           CAST(LENGTH({t}) AS BIGINT) AS n_chars_measured
    FROM {table}
"""


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic quality score in [0, 1]: rewards reasonable length and
    stopword density, penalizes punctuation soup. Weights are the
    engine's own (the reference has no text ops; SURVEY §2 mandates
    this family for the training-data pipeline)."""
    t = F.col(text_col)
    p = padded(t)
    n_words = F.size(F.split(F.trim(t), r"\s+")).cast("double")
    stop_hits = None
    for w in STOPWORDS_EN:
        c = occ_count(p, w)
        stop_hits = c if stop_hits is None else stop_hits + c
    punct = None
    for ch in PUNCT_CHARS:
        c = char_count(t, ch)
        punct = c if punct is None else punct + c
    n_chars = F.length(t).cast("double")
    # try_divide: ANSI division raises on the 0-char empty doc where
    # the DuckDB twin yields NULL (caught by the degenerate-docs sweep)
    stop_ratio = F.try_divide(stop_hits.cast("double"), n_words)
    punct_ratio = F.try_divide(punct.cast("double"), n_chars)
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + F.greatest(F.lit(1.0) - punct_ratio * 10.0, F.lit(0.0)) * 0.3
    )
    from ..functions import r4

    return df.select(
        "*",
        n_words.cast("bigint").alias("n_words"),
        r4(stop_ratio).alias("stopword_ratio"),
        r4(punct_ratio).alias("punct_ratio"),
        r4(score).alias("quality_score"),
    )


def quality_score_sql(table: str, id_col: str, text_col: str) -> str:
    t = text_col
    p = f"(' ' || {t} || ' ')"
    n_words = rf"CAST(len(regexp_split_to_array(trim({t}), '[ \t\n\x0b\f\r]+')) AS DOUBLE)"
    stop_hits = " + ".join(occ_count_sql(p, w) for w in STOPWORDS_EN)
    punct = " + ".join(char_count_sql(t, ch) for ch in PUNCT_CHARS)
    return f"""
    SELECT {id_col},
           CAST(n_words AS BIGINT) AS n_words,
           ROUND(stop_ratio + 1e-9, 4) AS stopword_ratio,
           ROUND(punct_ratio + 1e-9, 4) AS punct_ratio,
           ROUND(LEAST(n_words / 100.0, 1.0) * 0.4
                 + LEAST(stop_ratio * 5.0, 1.0) * 0.3
                 + GREATEST(1.0 - punct_ratio * 10.0, 0.0) * 0.3 + 1e-9, 4)
             AS quality_score
    FROM (
      SELECT {id_col},
             {n_words} AS n_words,
             CAST(({stop_hits}) AS DOUBLE) / {n_words} AS stop_ratio,
             CAST(({punct}) AS DOUBLE) / CAST(LENGTH({t}) AS DOUBLE) AS punct_ratio
      FROM {table}
    )
    """


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Shannon entropy (bits/char) of each document's character
    distribution — the cheap information-density quality signal (near-0
    for degenerate repeated-char spam, ~4.1 for normal English prose).

    Plan: explode one row per character position → partial-agg
    groupBy (doc, char) → groupBy (doc) folding -Σ p·log2 p. Both
    groupBys map-side combine, so the shuffle carries per-partition
    distinct (doc, char) pairs — bounded by alphabet size per doc, not
    text length."""
    from ..functions import r4

    chars = df.select(
        F.col(id_col).alias("id"),
        F.length(text_col).cast("double").alias("n"),
        F.explode(
            F.expr(f"sequence(1, greatest(char_length({text_col}), 1))")
        ).alias("i"),
        F.col(text_col),
    ).select("id", "n", F.expr(f"substring({text_col}, i, 1)").alias("ch"))
    freq = chars.groupBy("id", "ch").agg(
        F.count(F.lit(1)).cast("double").alias("c"), F.first("n").alias("n")
    )
    return freq.groupBy("id").agg(
        F.first("n").cast("bigint").alias("n_chars_measured"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
        r4(-F.sum(
            F.try_divide(F.col("c"), F.col("n"))
            * F.log2(F.try_divide(F.col("c"), F.col("n")))
        )).alias("entropy_bits"),
    ).withColumnRenamed("id", id_col)


def char_entropy_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
    SELECT {id_col},
           CAST(MIN(n) AS BIGINT) AS n_chars_measured,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
           ROUND(-SUM((c / n) * log2(c / n)) + 1e-9, 4) AS entropy_bits
    FROM (
      SELECT {id_col}, ch, CAST(COUNT(*) AS DOUBLE) AS c, MIN(n) AS n
      FROM (
        SELECT {id_col},
               CAST(LENGTH({text_col}) AS DOUBLE) AS n,
               substr({text_col}, CAST(s AS INTEGER), 1) AS ch
        FROM (
          SELECT {id_col}, {text_col},
                 unnest(generate_series(1, greatest(LENGTH({text_col}), 1))) AS s
          FROM {table}
        )
      )
      GROUP BY 1, 2
    )
    GROUP BY 1
    """


def fingerprint(df: DataFrame, text_col: str, gram: int = 8) -> DataFrame:
    """Winnowing-lite document fingerprint: the minimum md5 over all
    character ``gram``-shingles — one stable 32-hex-char id per doc that
    is invariant to shingle order and robust to small appends."""
    sh = (
        f"transform(sequence(1, greatest(length({text_col}) - {gram - 1}, 1)), "
        f"i -> md5(cast(substring({text_col}, i, {gram}) as binary)))"
    )
    # NULL text: Spark's greatest(NULL,1)=1 would shingle the NULL doc
    # as [md5(NULL)] = [NULL] and count n_shingles = 1, where DuckDB's
    # generate_series(1, NULL) yields none — pin (NULL fingerprint,
    # 0 shingles) for a contentless doc on both engines.
    return df.select(
        "*",
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(F.expr(f"array_min({sh})"))
        .alias("fingerprint"),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.expr(f"size(array_distinct({sh}))"))
        .cast("bigint")
        .alias("n_shingles"),
    )


def fingerprint_sql(table: str, id_col: str, text_col: str, gram: int = 8) -> str:
    sh = (
        f"list_transform(generate_series(1, greatest(length({text_col}) - {gram - 1}, 1)), "
        f"i -> md5(substr({text_col}, i, {gram})))"
    )
    return f"""
    SELECT {id_col}, list_min({sh}) AS fingerprint,
           CAST(len(list_distinct({sh})) AS BIGINT) AS n_shingles
    FROM {table}
    """


# ---------------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------------


def tfidf_topk(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms (smoothed idf =
    ln((N+1)/(df+1))).

    Plan: explode tokens → partial-agg groupBy (doc, term) for tf →
    groupBy (term) for document frequency (both map-side combined — the
    shuffle carries distinct terms, not token instances) → join tf↔df
    on term → scalar doc count broadcast via crossJoin → window top-k
    partitioned by doc. Ordering uses the r4-rounded score so both
    engines break near-ties identically by term."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"filter(split(lower(trim({text_col})), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), t -> t <> '')")
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            r4(
                F.col("tf")
                * F.log((F.col("__n") + 1).cast("double") / (F.col("df") + 1))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", "tfidf")
    )


def tfidf_topk_sql(table: str, id_col: str, text_col: str, k: int = 5) -> str:
    return rf"""
WITH toks AS (
  SELECT {id_col}, unnest(list_filter(
           regexp_split_to_array(lower(trim({text_col})), '[ \t\n\x0b\f\r]+'),
           t -> t <> '')) AS term
  FROM {table}
), tf AS (
  SELECT {id_col}, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.{id_col}, tf.term, tf.tf, dfreq.df,
         ROUND(tf.tf * ln((SELECT COUNT(*) + 1 FROM {table}) / (dfreq.df + 1.0))
               + 1e-9, 4) AS tfidf
  FROM tf JOIN dfreq USING (term)
)
SELECT {id_col}, rank, term, tf, df, tfidf
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY {id_col}
              ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


def normalize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus text normalization: strip non-printable/control bytes,
    lowercase, collapse whitespace runs, trim. The standard pre-dedup
    canonicalization step (near-dup detection over raw text mistakes
    formatting noise for content difference). Pure JVM expressions —
    regexp_replace runs inside whole-stage codegen, no UDF; emits both
    the normalized text and its md5 so downstream exact-dedup can key on
    the canonical form directly."""
    t = F.col(text_col)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(t), r"[^\x20-\x7e]", " "), r" +", " "
        )
    )
    return df.select(
        F.col(id_col),
        F.length(t).cast("bigint").alias("n_raw"),
        norm.alias("norm_text"),
        F.length(norm).cast("bigint").alias("n_norm"),
        F.md5(F.encode(norm, "UTF-8")).alias("norm_hash"),
    )


def normalize_sql(table: str, id_col: str, text_col: str) -> str:
    # 'g' flag: DuckDB regexp_replace is first-match-only by default,
    # Java's replaceAll semantics need the explicit global flag
    norm = (
        f"trim(regexp_replace(regexp_replace(lower({text_col}),"
        f" '[^\\x20-\\x7e]', ' ', 'g'), ' +', ' ', 'g'))"
    )
    return f"""
    SELECT {id_col},
           CAST(length({text_col}) AS BIGINT) AS n_raw,
           {norm} AS norm_text,
           CAST(length({norm}) AS BIGINT) AS n_norm,
           md5({norm}) AS norm_hash
    FROM {table}
    """


# --- #35e readability ------------------------------------------------------


def readability(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch-reading-ease-style readability per document, from three
    regexp counts (all JVM-side, zero shuffle):

    - words: whitespace tokens;
    - sentences: runs of ``.!?`` (min 1 — headline-like fragments count
      as one sentence);
    - syllables: vowel-group runs ``[aeiouyAEIOUY]+`` — the standard
      cheap proxy (hyphenation dictionaries don't distribute).

    score = 206.835 − 1.015·(words/sentence) − 84.6·(syllables/word).
    Low scores flag run-on/dense docs — a quality-filter axis
    complementary to `text_quality_score` (which sees punctuation soup
    and stopword density, not sentence structure)."""
    t = F.col(text_col)
    n_words = F.greatest(
        F.size(F.split(F.trim(t), r"\s+")).cast("double"), F.lit(1.0)
    )
    n_sents = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")).cast("double"), F.lit(1.0)
    )
    n_syll = F.regexp_count(t, F.lit(r"[aeiouyAEIOUY]+")).cast("double")
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sents)
        - F.lit(84.6) * (n_syll / n_words)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        n_sents.cast("bigint").alias("n_sentences"),
        n_syll.cast("bigint").alias("n_syllables"),
        r4(score).alias("flesch_score"),
    )


def readability_sql(table: str, id_col: str, text_col: str) -> str:
    t = text_col
    n_words = rf"GREATEST(CAST(len(regexp_split_to_array(trim({t}), '[ \t\n\x0b\f\r]+')) AS DOUBLE), 1.0)"
    n_sents = r"GREATEST(CAST(len(regexp_extract_all(" + t + r", '[.!?]+')) AS DOUBLE), 1.0)"
    n_syll = r"CAST(len(regexp_extract_all(" + t + r", '[aeiouyAEIOUY]+')) AS DOUBLE)"
    return f"""
    SELECT {id_col},
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sents AS BIGINT) AS n_sentences,
           CAST(n_syll AS BIGINT) AS n_syllables,
           ROUND(206.835 - 1.015 * (n_words / n_sents)
                 - 84.6 * (n_syll / n_words) + 1e-9, 4) AS flesch_score
    FROM (
      SELECT {id_col}, {n_words} AS n_words, {n_sents} AS n_sents,
             {n_syll} AS n_syll
      FROM {table}
    )
    """


# --- #35f BM25 ranked retrieval --------------------------------------------


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval: top-``k`` documents for a fixed query term
    set (Robertson-Sparck-Jones BM25, idf = ln(1 + (N-df+0.5)/(df+0.5))).

    The keyword-search primitive a corpus pipeline uses for targeted
    audits ("show me the docs about X") and for building weak-label
    retrieval sets. Reference analog: the dashboard's filter-then-rank
    readouts (dashboard_calidad_aire.py:81-93) generalized to text.

    Plan — zero wide shuffles on the corpus:
    - per-doc term frequencies come from a NARROW projection
      (``size(filter(tokens, t -> t = term))`` per query term — the
      token array never explodes, nothing shuffles);
    - corpus stats (N, avgdl, per-term document frequency) reduce to ONE
      map-side-combined 1-row aggregate, broadcast back via crossJoin;
    - the global top-k plans as TakeOrdered (per-partition top-k, k-way
      driver merge) — no single-partition global window; the rank
      column is assigned by a window over the already-limited k-row
      relation.

    At 100 TB the corpus is scanned twice (stats pass + scoring pass),
    both narrow column-pruned scans of (id, text); the shuffle volume is
    one 1-row stats relation and k output rows. Ordering uses the
    r4-rounded score with doc-id tie-break so both engines agree."""
    toks = F.expr(
        f"filter(split(lower(trim({text_col})), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), t -> t <> '')"
    )
    tf_cols = [
        F.size(F.filter(toks, lambda t: t == F.lit(term))).cast("double").alias(f"__tf{i}")
        for i, term in enumerate(query_terms)
    ]
    base = df.select(
        F.col(id_col), F.size(toks).cast("double").alias("__dl"), *tf_cols
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("double")).alias(f"__df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    per_term = []
    for i in range(len(query_terms)):
        tf, dfq = F.col(f"__tf{i}"), F.col(f"__df{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - dfq + F.lit(0.5)) / (dfq + F.lit(0.5))
        )
        sat = (tf * F.lit(k1 + 1.0)) / (
            tf
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
        )
        per_term.append(F.when(tf > 0, idf * sat).otherwise(F.lit(0.0)))
    total = per_term[0]
    for c in per_term[1:]:
        total = total + c
    n_matched = None
    for i in range(len(query_terms)):
        m = (F.col(f"__tf{i}") > 0).cast("int")
        n_matched = m if n_matched is None else n_matched + m
    ranked = (
        scored.select(
            F.col(id_col),
            F.col("__dl").cast("bigint").alias("dl"),
            n_matched.alias("n_terms"),
            r4(total).alias("score"),
        )
        .filter(F.col("n_terms") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return ranked.select(
        F.col(id_col),
        F.row_number().over(w).cast("int").alias("rank"),
        "score",
        "n_terms",
        "dl",
    )


def bm25_topk_sql(
    table: str,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    toks = (
        f"list_filter(regexp_split_to_array(lower(trim({text_col})),"
        r" '[ \t\n\x0b\f\r]+'), t -> t <> '')"
    )
    tf_exprs = ", ".join(
        f"CAST(len(list_filter({toks}, t -> t = '{term}')) AS DOUBLE)"
        f" AS tf{i}"
        for i, term in enumerate(query_terms)
    )
    df_exprs = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1.0 ELSE 0.0 END) AS df{i}"
        for i in range(len(query_terms))
    )
    score_terms = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN"
        f" ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * {k1 + 1.0}) / (tf{i} + {k1} * ({1.0 - b} + {b} * dl / avgdl))"
        f" ELSE 0.0 END)"
        for i in range(len(query_terms))
    )
    match_terms = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)"
        for i in range(len(query_terms))
    )
    return f"""
WITH base AS (
  SELECT {id_col}, CAST(len({toks}) AS DOUBLE) AS dl, {tf_exprs}
  FROM {table}
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl, {df_exprs}
  FROM base
), scored AS (
  SELECT base.{id_col},
         CAST(base.dl AS BIGINT) AS dl,
         CAST({match_terms} AS INTEGER) AS n_terms,
         ROUND(({score_terms}) + 1e-9, 4) AS score
  FROM base, stats
)
SELECT {id_col}, CAST(rank AS INTEGER) AS rank, score, n_terms, dl
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, {id_col} ASC) AS rank
  FROM scored WHERE n_terms > 0
)
WHERE rank <= {k}
"""


# --- #35g hashed bag-of-words features -------------------------------------


def hash_features(
    df: DataFrame, id_col: str, text_col: str, k: int = 16
) -> DataFrame:
    """Feature hashing (Weinberger et al. ICML'09): a fixed ``k``-dim
    hashed bag-of-words count vector per document — the classic
    vocabulary-free featurization for corpus-scale classifiers (quality
    filters, domain routers). Buckets come from the repo's shared
    portable md5→bigint hash (dedup.MD5_BIGINT_*) so both engines agree
    bit-for-bit; counts stay integers, so parity is exact with no float
    rounding.

    Plan: ONE narrow projection, with the token array AND the hashed
    bucket array each bound ONCE per row via the nested
    transform-over-single-element-array idiom (Spark does not CSE
    lambda-bearing higher-order functions — inlining the md5 transform
    into each of the k count expressions would hash every token k
    times); the k counts are then cheap integer scans of the bound
    array. Zero shuffles, zero UDFs; at 100 TB this is a map-only pass
    whose output is k ints per doc."""
    from .dedup import MD5_BIGINT_SPARK

    toks = (
        f"filter(split(lower(trim({text_col})), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), t -> t <> '')"
    )
    h = MD5_BIGINT_SPARK.format(x="t")
    fields = ", ".join(
        f"cast(size(filter(arr, b -> b = {j})) as bigint) as f{j}"
        for j in range(k)
    )
    bound = (
        f"get(transform(array({toks}), tk -> "
        f"get(transform(array(transform(tk, t -> {h} % {k})), arr -> "
        f"struct(cast(size(tk) as bigint) as n_tokens, {fields})), 0)"
        f"), 0)"
    )
    return df.select(F.col(id_col), F.expr(bound).alias("__s")).select(
        id_col, "__s.*"
    )


def hash_features_sql(table: str, id_col: str, text_col: str, k: int = 16) -> str:
    toks = (
        f"list_filter(regexp_split_to_array(lower(trim({text_col})),"
        r" '[ \t\n\x0b\f\r]+'), t -> t <> '')"
    )
    barr = (
        f"list_transform({toks}, t ->"
        f" (('0x' || substr(md5(t), 1, 15))::BIGINT) % {k})"
    )
    cols = ", ".join(
        f"CAST(len(list_filter({barr}, b -> b = {j})) AS BIGINT) AS f{j}"
        for j in range(k)
    )
    return f"""
    SELECT {id_col}, CAST(len({toks}) AS BIGINT) AS n_tokens, {cols}
    FROM {table}
    """


def score_auc(df: DataFrame, score_col: str, label_col) -> DataFrame:
    """ROC-AUC of a continuous score against a binary label via the
    Mann-Whitney U statistic with average ranks for ties — the
    classifier-quality readout the eval family (lang_id_eval,
    dedup_minhash_eval, ann_recall_eval) lacked for the quality scorer.

    Scale shape: NO global per-row window. Rows collapse to one row per
    DISTINCT score first (a partial-agg groupBy; 4-decimal scores bound
    the cardinality at ~10^4 regardless of corpus size), the cumulative
    rank arithmetic runs as a window over that tiny relation, and the
    final fold is a scalar aggregate. avg_rank(score) =
    cum_count_below + (ties + 1) / 2; U = Σ_pos avg_rank − n⁺(n⁺+1)/2;
    AUC = U / (n⁺ · n⁻). Empty classes yield NULL AUC (undefined), not
    a division error.

    NULL scores are dropped on BOTH engines before ranking: Spark's
    ``Window.orderBy`` sorts NULLs first while DuckDB's ``ORDER BY``
    sorts them last, so a NULL-score group would feed a different
    cumulative ``below`` into every real score per engine. AUC over a
    NULL score is undefined anyway — exclusion is the statistically
    honest choice, not just the parity-safe one."""
    lab = label_col if isinstance(label_col, Column) else F.col(label_col)
    per_score = (
        df.select(F.col(score_col).alias("s"), lab.cast("int").alias("y"))
        .where(F.col("s").isNotNull())
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("double").alias("cnt"),
            F.sum("y").cast("double").alias("pos"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_score.select(
        "s", "cnt", "pos",
        F.coalesce(F.sum("cnt").over(w), F.lit(0.0)).alias("below"),
    )
    agg = ranked.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).cast("bigint").alias("n_neg"),
        F.sum(F.col("pos") * (F.col("below") + (F.col("cnt") + 1.0) / 2.0)).alias("__r"),
    )
    np_, nn = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    auc = (F.col("__r") - np_ * (np_ + 1.0) / 2.0) / (np_ * nn)
    return agg.select(
        "n_pos",
        "n_neg",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), r4(auc)).alias("auc"),
    )


def score_auc_sql(scored: str, score_expr: str, label_expr: str) -> str:
    """DuckDB twin of :func:`score_auc` over a CTE/table ``scored``:
    same distinct-score collapse, same cumulative-rank arithmetic."""
    return f"""
    SELECT n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN ROUND((r - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0) / 2.0)
                           / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) + 1e-9, 4)
           END AS auc
    FROM (
      SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(cnt - pos) AS BIGINT) AS n_neg,
             SUM(pos * (below + (cnt + 1.0) / 2.0)) AS r
      FROM (
        SELECT s, cnt, pos,
               COALESCE(SUM(cnt) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS below
        FROM (
          SELECT {score_expr} AS s,
                 CAST(COUNT(*) AS DOUBLE) AS cnt,
                 CAST(SUM(CASE WHEN {label_expr} THEN 1 ELSE 0 END) AS DOUBLE) AS pos
          FROM {scored}
          WHERE {score_expr} IS NOT NULL
          GROUP BY 1
        )
      )
    )
    """


# ---------------------------------------------------------------------------
# #33h Zipf-law fit per corpus slice
# ---------------------------------------------------------------------------


def zipf_fit(
    df: DataFrame, group_col: str, text_col: str, top_terms: int = 1000
) -> DataFrame:
    """Per-slice Zipf fit: OLS slope of log(freq) vs log(rank) over each
    slice's ``top_terms`` most frequent tokens. Natural text follows
    Zipf's law with slope ≈ −1; machine-generated boilerplate, scraped
    navigation chrome, and template spam bend the curve — so the slope
    (and its R²) is a cheap corpus-health readout per source/domain,
    used the same way as :func:`quality_score` but at slice grain
    rather than document grain.

    Output: ``{group_col}, n_terms, zipf_slope, zipf_intercept, r2``.

    Plan: tokenize+explode (codegen, map-side), one combined groupBy on
    (slice, token) — the only table-sized shuffle — then a per-slice
    rank window over the DISTINCT-token relation (vocabulary-sized:
    Heaps' law keeps per-slice vocab sublinear in corpus bytes, and the
    window partitions by slice so no global sort), filter to the head,
    and a per-slice OLS aggregate from covar/var moments. At 100 TB the
    vocab relation is the only state and it's millions of rows, not
    billions.
    """
    toks = df.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).where(F.col("tok").isNotNull())
    freq = toks.groupBy("g", "tok").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("g").orderBy(F.col("c").desc(), F.col("tok").asc())
    head = freq.withColumn("r", F.row_number().over(w)).where(
        F.col("r") <= top_terms
    )
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("c").cast("double"))
    pts = head.select("g", x.alias("x"), y.alias("y"))
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    return (
        pts.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            r4(slope).alias("zipf_slope"),
            r4(F.avg("y") - slope * F.avg("x")).alias("zipf_intercept"),
            r4(F.pow(F.corr("x", "y"), 2)).alias("r2"),
        )
        .withColumnRenamed("g", group_col)
    )


def zipf_fit_sql(
    table: str, group_col: str, text_col: str, top_terms: int = 1000
) -> str:
    return f"""
    WITH toks AS (
      SELECT {group_col} AS g,
             unnest(regexp_split_to_array(lower(trim({text_col})), '[ \\t\\n\\x0B\\f\\r]+')) AS tok
      FROM {table}
    ), freq AS (
      SELECT g, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
    ), head AS (
      SELECT g, c,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY c DESC, tok ASC) AS r
      FROM freq
      QUALIFY r <= {top_terms}
    ), pts AS (
      SELECT g, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM head
    )
    SELECT g AS {group_col},
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           ROUND(covar_pop(x, y) / var_pop(x) + 1e-9, 4) AS zipf_slope,
           ROUND(AVG(y) - (covar_pop(x, y) / var_pop(x)) * AVG(x) + 1e-9, 4)
             AS zipf_intercept,
           ROUND(POW(corr(x, y), 2) + 1e-9, 4) AS r2
    FROM pts GROUP BY g
    """


# --- #33i quality-score calibration (reliability buckets / ECE) -----------


def calibration_eval(
    df: DataFrame, text_col: str, pos_pred, n_bins: int = 10
) -> DataFrame:
    """Reliability diagram for the heuristic quality score against a
    weak binary label (``pos_pred``, a boolean Column over the input
    row, e.g. lang == 'en'): the score is bucketed into ``n_bins``
    equal-width bins on [0, 1] and each bin reports its size, mean
    predicted score, empirical positive rate, the calibration gap
    |mean_score − pos_rate|, and the bin's ECE contribution
    (n/N · gap) — Σ w_gap is the Expected Calibration Error
    (Naeini et al. AAAI'15). `quality_auc_eval` answers "does the score
    RANK well"; this answers "can its VALUE be read as a probability",
    which is what a corpus pipeline needs before thresholding the score
    as an accept-probability.

    Plan: one narrow scoring projection (the same zero-shuffle
    quality_score expressions), then ONE map-side-combined aggregate to
    ≤ n_bins rows; the window computing N runs over that ≤ n_bins-row
    relation. Scan-bound at any corpus size.

    Output: (bin int, n bigint, avg_score, pos_rate, abs_gap, w_gap),
    non-empty bins only, ordered by bin."""
    scored = quality_score(df, text_col)
    binned = scored.select(
        F.least(
            F.floor(F.col("quality_score") * n_bins), F.lit(n_bins - 1)
        )
        .cast("int")
        .alias("bin"),
        F.col("quality_score"),
        F.when(pos_pred, 1).otherwise(0).alias("pos"),
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("quality_score").alias("__avg_s"),
        F.avg(F.col("pos").cast("double")).alias("__rate"),
    )
    total = Window.partitionBy()
    return per.select(
        "bin",
        "n",
        r4(F.col("__avg_s")).alias("avg_score"),
        r4(F.col("__rate")).alias("pos_rate"),
        r4(F.abs(F.col("__avg_s") - F.col("__rate"))).alias("abs_gap"),
        r4(
            F.col("n")
            * F.abs(F.col("__avg_s") - F.col("__rate"))
            / F.sum("n").over(total)
        ).alias("w_gap"),
    ).orderBy("bin")


def calibration_eval_sql(
    table: str, id_col: str, text_col: str, pos_pred_sql: str, n_bins: int = 10
) -> str:
    scored = quality_score_sql(table, id_col, text_col)
    return f"""
    WITH scored AS ({scored}),
    j AS (
      SELECT s.quality_score,
             CASE WHEN d.{pos_pred_sql} THEN 1 ELSE 0 END AS pos
      FROM scored s JOIN {table} d ON s.{id_col} = d.{id_col}
    ),
    per AS (
      SELECT CAST(LEAST(FLOOR(quality_score * {n_bins}), {n_bins - 1})
                  AS INTEGER) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             AVG(quality_score) AS avg_s,
             AVG(pos * 1.0) AS rate
      FROM j GROUP BY 1
    )
    SELECT bin, n,
           ROUND(avg_s + 1e-9, 4) AS avg_score,
           ROUND(rate + 1e-9, 4) AS pos_rate,
           ROUND(ABS(avg_s - rate) + 1e-9, 4) AS abs_gap,
           ROUND(n * ABS(avg_s - rate) / SUM(n) OVER () + 1e-9, 4) AS w_gap
    FROM per ORDER BY bin
    """
