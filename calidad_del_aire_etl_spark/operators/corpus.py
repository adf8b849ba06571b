"""Corpus-preparation operators for LLM training-data pipelines
(SURVEY §2 #44-49): chunking, sequence packing, PII scrubbing, n-gram
statistics, repetition filtering, stratified sampling.

All hot paths are pure Catalyst expressions (split / higher-order array
functions / regexp) — JVM-side, whole-stage-codegen, linear in document
bytes. Each has a DuckDB SQL twin as the correctness oracle.

Catalyst guard: an expensive array value (e.g. ``split``) referenced
inside a higher-order lambda gets INLINED there by project-collapse and
re-evaluated once per element. ``_bind`` wraps the value in a
single-element array and a ``transform`` lambda — the lambda variable is
a true let-binding, evaluated once per row, that collapse can't rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import r4


def _bind(value_expr: str, var: str, body: str) -> str:
    """SQL let-binding: evaluate ``value_expr`` once, use as ``var`` in
    ``body`` (see module docstring)."""
    return f"get(transform(array({value_expr}), {var} -> {body}), 0)"


# tokenization shared by packing / ngram / repetition — MUST stay in
# lockstep with the DuckDB twin below. The whitespace class is spelled
# out because the engines' \s disagree on ONE character: Java regex \s
# is [ \t\n\x0B\f\r] while DuckDB's RE2 \s omits \x0B (vertical tab) —
# a latent cross-engine divergence found by the round-11 edge-semantics
# test. Both patterns now pin the Java set explicitly.
_TOKS = r"split(lower(trim({t})), '[ \\t\\n\\x0B\\f\\r]+')"
_TOKS_SQL = r"regexp_split_to_array(lower(trim({t})), '[ \t\n\x0b\f\r]+')"

# Arrow-kernel twin of _TOKS for the LM-scoring hot paths
# (unigram_logprob / kn_bigram_logprob): Java's \s is exactly
# [ \t\n\x0B\f\r] and `trim` strips 0x20 only, so this RE2 class under
# utf8_trim(' ') reproduces _TOKS bit-for-bit — including the ''-token
# rows Java split emits for empty strings and edge non-space whitespace
# (pinned by tests/test_round11_ops.py edge-semantics test).
_JWS_RE = r"[ \t\n\x0b\f\r]+"


def _arrow_token_lists(text_series):
    """pyarrow ListArray of `_TOKS` tokens for a pandas text column —
    tokenization runs entirely in Arrow C++ kernels (lower → trim →
    regex split), so no per-token Python objects are ever created.
    Executor-side helper for mapInPandas batches."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.Array.from_pandas(text_series)
    return pc.split_pattern_regex(pc.utf8_trim(pc.utf8_lower(arr), " "), _JWS_RE)


def _arrow_token_arrays(text_series):
    """(unique tokens, int64 dictionary indices, int64 row indices) for
    a pandas text column: the dictionary-encoded token stream. NULL
    texts contribute no entries (their row index never appears)."""
    import numpy as np
    import pyarrow.compute as pc

    toks = _arrow_token_lists(text_series)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy()
    de = flat.dictionary_encode()
    return (
        de.dictionary.to_pylist(),
        np.asarray(de.indices, dtype=np.int64),
        parent,
    )


# ---------------------------------------------------------------------------
# Chunking
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame, id_col: str, text_col: str, chunk_size: int = 400, overlap: int = 50
) -> DataFrame:
    """Split each document into fixed-size character chunks with overlap
    (the standard RAG / context-window prep step).

    Narrow posexplode over per-row computed offsets — no shuffle, output
    rows ≈ bytes/stride, pipelined straight into whatever follows. The
    ``greatest(...,1)`` guards the empty document (Spark's sequence()
    runs DESCENDING when start > stop — a silent correctness trap)."""
    stride = chunk_size - overlap
    assert stride > 0
    chunks = (
        f"transform(sequence(1, greatest(char_length({text_col}), 1), {stride}), "
        f"s -> substring({text_col}, s, {chunk_size}))"
    )
    return df.select(
        id_col,
        F.posexplode(F.expr(chunks)).alias("chunk_idx", "chunk_text"),
    ).select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "chunk_text",
        F.length("chunk_text").cast("bigint").alias("chunk_len"),
    )


def chunk_sql(
    table: str, id_col: str, text_col: str, chunk_size: int = 400, overlap: int = 50
) -> str:
    stride = chunk_size - overlap
    # scalar generate_series + unnest — DuckDB's table-function form
    # can't take lateral column parameters
    return f"""
    SELECT {id_col},
           CAST((s - 1) / {stride} AS INTEGER) AS chunk_idx,
           substr({text_col}, CAST(s AS INTEGER), {chunk_size}) AS chunk_text,
           CAST(LENGTH(substr({text_col}, CAST(s AS INTEGER), {chunk_size})) AS BIGINT)
             AS chunk_len
    FROM (
      SELECT {id_col}, {text_col},
             unnest(generate_series(1, greatest(LENGTH({text_col}), 1), {stride})) AS s
      FROM {table}
    )
    """


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame, id_col: str, text_col: str, budget: int = 512, shards: int = 32
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-token-budget
    bins (context windows), deterministically.

    Packing is inherently sequential, so a single global cumulative sum
    would serialize on one reducer. Instead documents are sharded by
    ``id % shards`` and packed WITHIN each shard — each shard's running
    sum is an independent window partition, so the op scales to any
    number of executors while staying bit-deterministic. Per (shard,
    bin) the output reports doc count and token total; a doc bigger than
    the budget gets bins to itself (floor((cum-tok)/budget) semantics).
    """
    from pyspark.sql import Window

    toks = F.expr(f"size({_TOKS.format(t=text_col)})").cast("bigint")
    base = df.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("shard"),
        toks.alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    packed = base.withColumn("__cum", F.sum("n_tokens").over(w)).withColumn(
        "bin", F.floor((F.col("__cum") - F.col("n_tokens")) / F.lit(budget)).cast("bigint")
    )
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
    )


def pack_sql(
    table: str, id_col: str, text_col: str, budget: int = 512, shards: int = 32
) -> str:
    toks = _TOKS_SQL.format(t=text_col)
    return f"""
    SELECT shard, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM (
      SELECT shard, CAST(FLOOR((cum - n_tokens) / {budget}) AS BIGINT) AS bin, n_tokens
      FROM (
        SELECT CAST({id_col} % {shards} AS INTEGER) AS shard,
               CAST(len({toks}) AS BIGINT) AS n_tokens,
               SUM(CAST(len({toks}) AS BIGINT)) OVER (
                 PARTITION BY {id_col} % {shards} ORDER BY {id_col}) AS cum
        FROM {table}
      )
    )
    GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9() -]{6,}[0-9]"
IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
IBAN_RE = r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b"
# 13-19 digits with optional single space/dash separators; candidates
# are then Luhn-validated — only valid card numbers are redacted
CARD_RE = r"\b(?:\d[ -]?){12,18}\d\b"

# Pass order is load-bearing: email first (a numeric local-part must be
# consumed before digit passes), IP before SSN/phone (dotted quads are
# not phone-charset but leave nothing to chance), IBAN before card (an
# IBAN's 20-digit tail must not feed card candidates), SSN before phone
# (123-45-6789 IS phone-shaped), Luhn-valid cards before phone (an
# INVALID card number deliberately falls through to the phone pass as a
# generic digit run), phone last as the catch-all.


def _luhn_sql(m: str, dialect: str) -> str:
    """Luhn checksum validity of candidate ``m`` (separators stripped),
    as a boolean expression in either engine's SQL — double every
    second digit from the right, subtract 9 when > 9, total % 10 == 0."""
    if dialect == "spark":
        d = f"regexp_replace({m}, '[^0-9]', '')"
        dig = f"CAST(substring({d}, i, 1) AS INT)"
        seq, ln = f"sequence(1, length({d}))", f"length({d})"
        return (
            f"pmod(aggregate(transform({seq}, i -> "
            f"CASE WHEN pmod({ln} - i, 2) = 1 THEN "
            f"CASE WHEN 2 * {dig} > 9 THEN 2 * {dig} - 9 ELSE 2 * {dig} END "
            f"ELSE {dig} END), 0, (a, x) -> a + x), 10) = 0"
        )
    d = f"regexp_replace({m}, '[^0-9]', '', 'g')"
    dig = f"CAST(substr({d}, i, 1) AS INT)"
    seq, ln = f"generate_series(1, len({d}))", f"len({d})"
    return (
        f"(list_sum(list_transform({seq}, i -> "
        f"CASE WHEN ({ln} - i) % 2 = 1 THEN "
        f"CASE WHEN 2 * {dig} > 9 THEN 2 * {dig} - 9 ELSE 2 * {dig} END "
        f"ELSE {dig} END)) % 10 = 0)"
    )


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact emails, IPv4 addresses, IBANs, SSN-shaped national ids,
    Luhn-VALID card numbers, then phone-like digit runs, with per-kind
    match counts. Every pattern stays in the common Java-regex ∩ RE2
    dialect so the DuckDB twin matches byte-for-byte; the Luhn filter is
    a higher-order-function fold (filter/transform/aggregate), JVM-side,
    over the handful of card candidates per document — no UDF. Pure
    narrow projection, no shuffle."""
    card_re = CARD_RE.replace("\\", "\\\\")
    s = df.select(F.col(id_col), F.col(text_col).alias("__t0"))
    for i, (re_, tag, cnt) in enumerate(
        [
            (EMAIL_RE, "<EMAIL>", "n_emails"),
            (IP_RE, "<IP>", "n_ips"),
            (IBAN_RE, "<IBAN>", "n_ibans"),
            (SSN_RE, "<SSN>", "n_ssns"),
        ]
    ):
        s = s.withColumn(cnt, F.regexp_count(F.col(f"__t{i}"), F.lit(re_)).cast("bigint"))
        s = s.withColumn(f"__t{i + 1}", F.regexp_replace(f"__t{i}", re_, tag))
    s = s.withColumn(
        "__cards",
        F.expr(
            f"filter(regexp_extract_all(__t4, '{card_re}', 0), "
            f"m -> {_luhn_sql('m', 'spark')})"
        ),
    )
    s = s.withColumn("n_cards", F.size("__cards").cast("bigint"))
    s = s.withColumn(
        "__t5", F.expr("aggregate(__cards, __t4, (acc, m) -> replace(acc, m, '<CARD>'))")
    )
    s = s.withColumn("n_phones", F.regexp_count(F.col("__t5"), F.lit(PHONE_RE)).cast("bigint"))
    return s.select(
        id_col,
        F.regexp_replace("__t5", PHONE_RE, "<PHONE>").alias("scrubbed_text"),
        "n_emails",
        "n_ips",
        "n_ibans",
        "n_ssns",
        "n_cards",
        "n_phones",
    )


def pii_scrub_sql(table: str, id_col: str, text_col: str) -> str:
    luhn = _luhn_sql("m", "duck")
    return f"""
    SELECT {id_col},
           regexp_replace(t5, '{PHONE_RE}', '<PHONE>', 'g') AS scrubbed_text,
           n_emails, n_ips, n_ibans, n_ssns, n_cards,
           CAST(len(regexp_extract_all(t5, '{PHONE_RE}')) AS BIGINT) AS n_phones
    FROM (
      SELECT {id_col}, n_emails, n_ips, n_ibans, n_ssns,
             CAST(len(cards) AS BIGINT) AS n_cards,
             list_reduce(list_prepend(t4, cards),
                         (acc, m) -> replace(acc, m, '<CARD>')) AS t5
      FROM (
        SELECT *, list_filter(regexp_extract_all(t4, '{CARD_RE}'),
                              m -> {luhn}) AS cards
        FROM (
          SELECT {id_col},
                 CAST(len(regexp_extract_all(t0, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
                 CAST(len(regexp_extract_all(t1, '{IP_RE}')) AS BIGINT) AS n_ips,
                 CAST(len(regexp_extract_all(t2, '{IBAN_RE}')) AS BIGINT) AS n_ibans,
                 CAST(len(regexp_extract_all(t3, '{SSN_RE}')) AS BIGINT) AS n_ssns,
                 t4
          FROM (
            SELECT *, regexp_replace(t3, '{SSN_RE}', '<SSN>', 'g') AS t4 FROM (
              SELECT *, regexp_replace(t2, '{IBAN_RE}', '<IBAN>', 'g') AS t3 FROM (
                SELECT *, regexp_replace(t1, '{IP_RE}', '<IP>', 'g') AS t2 FROM (
                  SELECT *, regexp_replace(t0, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1 FROM (
                    SELECT {id_col}, {text_col} AS t0 FROM {table}
                  )
                )
              )
            )
          )
        )
      )
    )
    """


# ---------------------------------------------------------------------------
# N-gram statistics & repetition filter
# ---------------------------------------------------------------------------


def _ngram_expr(text_col: str, n: int) -> str:
    """Word n-grams as one let-bound expression (empty array when the
    doc has < n tokens — also dodges the descending-sequence trap)."""
    toks = _TOKS.format(t=text_col)
    body = (
        f"CASE WHEN size(toks) >= {n} THEN "
        f"transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> concat_ws(' ', slice(toks, i, {n}))) "
        f"ELSE cast(array() as array<string>) END"
    )
    return _bind(toks, "toks", body)


def _ngram_sql(text_col: str, n: int) -> str:
    toks = _TOKS_SQL.format(t=text_col)
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks}) - {n - 1}), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def ngram_topk(df: DataFrame, text_col: str, n: int = 3, k: int = 50) -> DataFrame:
    """Corpus-wide top-k word n-grams: explode → partial-agg groupBy →
    top-k. Map-side combine collapses each partition's counts before the
    shuffle, so the wire carries distinct-ngrams-per-partition, not rows;
    the final top-k sorts the (small) aggregated relation."""
    grams = df.select(F.explode(F.expr(_ngram_expr(text_col, n))).alias("ngram"))
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("ngram").asc())
        .limit(k)
    )


def ngram_topk_sql(table: str, text_col: str, n: int = 3, k: int = 50) -> str:
    return f"""
    SELECT ngram, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest({_ngram_sql(text_col, n)}) AS ngram FROM {table})
    GROUP BY 1
    ORDER BY freq DESC, ngram ASC
    LIMIT {k}
    """


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Gopher-style repetition quality signal: the fraction of duplicate
    word n-grams per document; docs above ``threshold`` are flagged.
    Total and distinct counts come from ONE evaluation of the n-gram
    array (struct-producing let-binding), narrow per-row work only."""
    g = _ngram_expr(text_col, n)
    stats = _bind(
        g, "g", "struct(size(g) as total, size(array_distinct(g)) as n_distinct)"
    )
    st = F.expr(stats)
    total = st["total"].cast("bigint")
    dup_frac = F.when(
        total > 0,
        F.lit(1.0) - st["n_distinct"].cast("double") / total.cast("double"),
    ).otherwise(F.lit(0.0))
    return df.select(
        id_col,
        total.alias("n_ngrams"),
        st["n_distinct"].cast("bigint").alias("n_distinct"),
        r4(dup_frac).alias("dup_frac"),
        (dup_frac > threshold).cast("int").alias("is_repetitive"),
    )


def repetition_sql(
    table: str, id_col: str, text_col: str, n: int = 3, threshold: float = 0.2
) -> str:
    g = _ngram_sql(text_col, n)
    return f"""
    SELECT {id_col},
           CAST(total AS BIGINT) AS n_ngrams,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           ROUND(dup_frac + 1e-9, 4) AS dup_frac,
           CAST(CASE WHEN dup_frac > {threshold} THEN 1 ELSE 0 END AS INTEGER)
             AS is_repetitive
    FROM (
      SELECT {id_col}, total, n_distinct,
             CASE WHEN total > 0
                  THEN 1.0 - CAST(n_distinct AS DOUBLE) / CAST(total AS DOUBLE)
                  ELSE 0.0 END AS dup_frac
      FROM (
        SELECT {id_col}, len(g) AS total, len(list_distinct(g)) AS n_distinct
        FROM (SELECT {id_col}, {g} AS g FROM {table})
      )
    )
    """


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates_hex: dict[str, int],
    default_hex: int = 2,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff the first
    hex digit of md5(id) falls below the stratum's threshold (out of
    16) — e.g. 4 → 25 % rate. Hash-based, so the sample is stable under
    reruns, retries and re-partitioning (no RNG state), embarrassingly
    parallel, and reproducible across engines."""
    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    digit = F.conv(F.substring(h, 1, 1), 16, 10).cast("int")
    thresh = F.lit(default_hex)
    for stratum, hexes in rates_hex.items():
        thresh = F.when(F.col(strata_col) == stratum, F.lit(hexes)).otherwise(thresh)
    return df.filter(digit < thresh)


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Corpus mixture weighting: replicate/downsample each source to a
    target weight (w=2.3 → every doc twice, plus a third copy for a
    deterministic 30 % of docs; w=0.4 → keep a deterministic 40 %).

    The standard LLM-data mixing step (e.g. upsample curated sources,
    downsample crawl). Hash-based fractional keep (md5 byte, 256
    buckets) — stable under reruns and partitioning, no RNG; the
    replication is a per-row sequence+explode, so the plan stays narrow
    and the output is exactly reproducible. Emits ``copy_idx`` so
    downstream shuffles can still dedup per physical copy."""
    import math

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 2), 16, 10
    ).cast("int")
    w_expr = F.lit(float(default_weight))
    for s, w in weights.items():
        w_expr = F.when(F.col(source_col) == s, F.lit(float(w))).otherwise(w_expr)
    base = F.floor(w_expr).cast("int")
    frac_thresh = F.round((w_expr - F.floor(w_expr)) * 256).cast("int")
    n_copies = base + (h < frac_thresh).cast("int")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("copy_idx", F.explode(F.expr("sequence(0, __n - 1)")))
        .drop("__n")
        .withColumn("copy_idx", F.col("copy_idx").cast("int"))
    )


def mixture_sample_sql(
    table: str,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    cols: str = "*",
) -> str:
    cases = " ".join(
        f"WHEN {source_col} = '{s}' THEN CAST({float(w)} AS DOUBLE)"
        for s, w in weights.items()
    )
    w = f"(CASE {cases} ELSE CAST({float(default_weight)} AS DOUBLE) END)"
    h = f"CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 2)) AS INTEGER)"
    n = (
        f"(CAST(FLOOR({w}) AS INTEGER) + CASE WHEN {h} < "
        f"CAST(ROUND(({w} - FLOOR({w})) * 256, 0) AS INTEGER) THEN 1 ELSE 0 END)"
    )
    return f"""
    SELECT {cols}, CAST(unnest(generate_series(0, n_copies - 1)) AS INTEGER) AS copy_idx
    FROM (SELECT *, {n} AS n_copies FROM {table})
    WHERE n_copies > 0
    """


def stratified_sample_sql(
    table: str,
    id_col: str,
    strata_col: str,
    rates_hex: dict[str, int],
    default_hex: int = 2,
    cols: str = "*",
) -> str:
    cases = " ".join(
        f"WHEN {strata_col} = '{s}' THEN {v}" for s, v in rates_hex.items()
    )
    return f"""
    SELECT {cols} FROM {table}
    WHERE CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 1)) AS INTEGER)
          < (CASE {cases} ELSE {default_hex} END)
    """


# ---------------------------------------------------------------------------
# Benchmark-contamination check (decontamination for training corpora)
# ---------------------------------------------------------------------------


def contamination_check(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, bench_mod: int = 97
) -> DataFrame:
    """Flag training documents sharing any word ``n``-gram with the
    benchmark set (here: docs where ``id % bench_mod == 0`` stand in
    for an eval benchmark).

    Plan: benchmark n-grams are exploded and deduped (groupBy, map-side
    combined) into a small relation that joins the exploded training
    n-grams on the gram string — at real scale the benchmark side is
    tiny (eval sets are ~10⁴ docs) so AQE broadcasts it, turning
    decontamination into a map-side hash probe. Output is one row per
    contaminated doc with the overlap count."""
    grams = F.explode(F.expr(f"array_distinct({_ngram_expr(text_col, n)})"))
    is_bench = F.col(id_col) % bench_mod == 0
    bench = (
        df.filter(is_bench)
        .select(grams.alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__bench_docs"))
    )
    train = df.filter(~is_bench).select(F.col(id_col), grams.alias("gram"))
    hits = train.join(bench, "gram")
    return (
        hits.groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contaminated_ngrams"))
        .orderBy(id_col)
    )


def contamination_sql(
    table: str, id_col: str, text_col: str, n: int = 5, bench_mod: int = 97
) -> str:
    grams = _ngram_sql(text_col, n)
    return f"""
WITH bench AS (
  SELECT DISTINCT unnest(list_distinct({grams})) AS gram
  FROM {table} WHERE {id_col} % {bench_mod} = 0
), train AS (
  SELECT {id_col}, unnest(list_distinct({grams})) AS gram
  FROM {table} WHERE {id_col} % {bench_mod} <> 0
)
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_contaminated_ngrams
FROM train JOIN bench USING (gram)
GROUP BY {id_col}
ORDER BY {id_col}
"""


# ---------------------------------------------------------------------------
# Weighted sampling (priority sampling, Duffield-Lund-Thorup)
# ---------------------------------------------------------------------------


def weighted_sample_topk(
    df: DataFrame, id_col: str, weight_col, k: int = 50
) -> DataFrame:
    """Deterministic weight-proportional sample without replacement of
    size ``k``: priority sampling — each row gets priority w / u with u
    a uniform(0,1] hash of its id, and the k largest priorities win.
    Inclusion probability rises with weight (exactly min(w/tau, 1) for
    the threshold tau = (k+1)-th priority), and the scheme admits
    unbiased subset-sum estimators, unlike naive w-proportional
    Bernoulli thinning.

    Engine shape: the hash is md5-derived (no RNG state — reruns,
    retries, speculative tasks and other engines all agree), u uses 52
    hash bits so it is exact in a double, and the ranking executes as
    TakeOrdered (per-partition top-k then a k-way driver merge — no
    global sort, no full shuffle). ``weight_col`` is a Column; rows with
    non-positive weight are excluded (w=0 must never be sampled).
    """
    v = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 13), 16, 10
    ).cast("bigint")
    u = (v + F.lit(1)).cast("double") / F.lit(float(2**52))
    out = (
        df.select(
            F.col(id_col),
            weight_col.cast("double").alias("weight"),
            (weight_col.cast("double") / u).alias("priority"),
        )
        .filter(F.col("weight") > 0)
        .orderBy(F.col("priority").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return out


def weighted_sample_topk_sql(
    table: str, id_col: str, weight_sql: str, k: int = 50
) -> str:
    u = (
        f"(CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 13)) AS BIGINT) + 1)"
        f" / CAST({float(2**52)} AS DOUBLE)"
    )
    return f"""
    SELECT {id_col}, weight, priority FROM (
      SELECT {id_col},
             CAST({weight_sql} AS DOUBLE) AS weight,
             CAST({weight_sql} AS DOUBLE) / ({u}) AS priority
      FROM {table}
    ) WHERE weight > 0
    ORDER BY priority DESC, {id_col} ASC
    LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Per-domain quota + bloom-filter ingest dedup
# ---------------------------------------------------------------------------


def domain_quota_sample(
    df: DataFrame, id_col: str, domain_col: str, quota: int
) -> DataFrame:
    """Cap documents per domain/source at ``quota`` — the standard
    crawl-balancing step (one hot domain must not dominate the corpus
    mix). Selection is deterministic: within a domain, docs rank by
    md5(id) (a stable uniform shuffle — no RNG, identical across
    reruns/engines), so the kept subset is a fixed pseudo-random quota,
    not head-of-file bias. The window partitions by domain — state is
    bounded by the biggest domain, never global."""
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= quota)
        .drop("__rk")
    )


def domain_quota_sample_sql(
    table: str, id_col: str, domain_col: str, quota: int, cols: str = "*"
) -> str:
    return f"""
    SELECT {cols} FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY {domain_col}
        ORDER BY md5(CAST({id_col} AS VARCHAR)) ASC, {id_col} ASC) AS __rk
      FROM {table}
    ) WHERE __rk <= {quota}
    """


# ---------------------------------------------------------------------------
# Duplicate substring spans (cross-document exact repetition)
# ---------------------------------------------------------------------------


def dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Per-document cross-corpus duplicated-substring profile, the
    span-level exact dedup signal from "Deduplicating Training Data
    Makes Language Models Better" (Lee et al. 2022, public): a span is
    DUPLICATED when its exact ``span_len``-char substring occurs in at
    least one OTHER document. Output per doc: span count, duplicated
    span count, duplicated fraction — the downstream filter/trim step
    consumes the fraction.

    Spark shape (suffix arrays don't distribute; strided hashing does):
    explode strided substrings (narrow, rows ≈ chars/stride), hash each
    span to a 60-bit md5 int, then flag duplicates with ONE exchange on
    the span hash and a whole-partition window: a span is shared by ≥2
    docs iff ``min(id) != max(id)`` over its hash group — no distinct
    aggregate, no join-back. The per-doc rollup's exchange is tiny
    (map-side partial agg first). Linear in corpus bytes, no self-join —
    scales where pairwise Jaccard cannot.

    The window replaced the round-9 two-exchange shape (groupBy(span)
    count_distinct + verdict join-back): measured same-window at sf10,
    65.1 s → 24.5 s warm (sf1 6.0 → 2.8 s, sf0.1 6.4 → 2.0 s) with
    hash-identical output — the distinct aggregate's expand and the
    133 M-row merge join were both paying for information the min/max
    pass gets from the sort the exchange already implies. Hot-span rows
    still co-locate on one reducer, exactly as they did on the old
    join-back side: a span shared by D docs contributes D thin
    (id, hash) rows to one task — bounded by the hottest boilerplate
    span's document frequency, the same bound Lee et al.'s
    group-by-span pass carries.
    """
    spans_expr = (
        f"transform(sequence(1, greatest(char_length({text_col}) - {span_len - 1}, 1), {stride}), "
        f"s -> cast(conv(substr(md5(cast(substring({text_col}, s, {span_len}) as binary)), 1, 15), 16, 10) as bigint))"
    )
    # NULL text must drop out (the twin's inner join on the hash did
    # this implicitly; the window keeps NULL-hash rows, so filter at
    # the scan where it pushes down)
    sp = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.explode(F.expr(spans_expr)).alias("h")
    )
    w = Window.partitionBy("h")
    flagged = sp.select(
        "id",
        (F.min("id").over(w) != F.max("id").over(w)).cast("bigint").alias("__dup"),
    )
    return (
        flagged.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("__dup").alias("n_dup_spans"),
            r4(F.sum("__dup").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "dup_frac"
            ),
        )
        .select(F.col("id").alias(id_col), "n_spans", "n_dup_spans", "dup_frac")
    )


def dup_spans_sql(
    table: str,
    id_col: str,
    text_col: str,
    span_len: int = 32,
    stride: int = 16,
) -> str:
    return f"""
    WITH sp AS (
      SELECT {id_col} AS id,
             (('0x' || substr(md5(substr({text_col}, CAST(s AS INTEGER), {span_len})), 1, 15))::BIGINT) AS h
      FROM (
        SELECT {id_col}, {text_col},
               unnest(generate_series(1, greatest(LENGTH({text_col}) - {span_len - 1}, 1), {stride})) AS s
        FROM {table}
      )
    ), per_span AS (
      SELECT h, COUNT(DISTINCT id) AS nd FROM sp GROUP BY h
    )
    SELECT sp.id AS {id_col},
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           ROUND(CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) + 1e-9, 4) AS dup_frac
    FROM sp JOIN per_span USING (h)
    GROUP BY sp.id
    """


def dup_spans_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 32,
) -> DataFrame:
    """FULL-coverage duplicated-substring profile — closes the one known
    approximation gap in the dedup family (VERDICT r7 #7 / r8 missing
    #1): :func:`dup_spans` hashes spans at ``stride`` offsets, so a
    duplicated substring whose two occurrences start at different
    offsets modulo the stride is invisible to it. This variant hashes
    the span starting at EVERY character position (stride 1), the exact
    span-level signal of Lee et al. 2022 — any ``span_len``-char
    substring shared with another document is caught regardless of
    alignment.

    Same plan as the strided profile (explode -> one exchange on the
    span hash -> min/max window duplicate flag -> per-doc rollup), just
    at unit stride: linear in corpus bytes, self-join-free, no UDF. Hashing stays the strided family's 60-bit md5 prefix — an
    O(span_len)-per-position Horner/rolling polynomial fold was
    prototyped as HOF ``aggregate`` lambdas and measured 4x SLOWER at
    sf1 (27.7 s vs 6.8 s): Spark interprets higher-order-function
    lambdas per element, while md5-of-substring is one codegen'd JVM
    intrinsic per position, so the "cheaper" hash loses to the
    intrinsic by an order of magnitude of per-op cost. The DuckDB twin
    uses the identical md5 prefix, so parity is exact.
    """
    return dup_spans(df, id_col, text_col, span_len=span_len, stride=1)


def dup_spans_exact_sql(
    table: str,
    id_col: str,
    text_col: str,
    span_len: int = 32,
) -> str:
    return dup_spans_sql(table, id_col, text_col, span_len=span_len, stride=1)


# ---------------------------------------------------------------------------
# Unigram LM log-prob scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------


def unigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    head_size: int = 4096,
) -> DataFrame:
    """Per-document mean log2 probability under the corpus's own
    unigram LM — the classic LM-quality filter (CCNet / Wenzek et al.):
    documents whose tokens are improbable under the corpus distribution
    (boilerplate, lists, garbled bytes) score low and get filtered or
    down-weighted before training.

    Scale shape (rewritten round 11 — the VERDICT r10 "token machinery"
    constant-factor item): the old plan exploded one row PER TOKEN
    INSTANCE (27.6 M rows at sf10) and pushed them through a checkpoint
    plus three join consumers; the tokenize+explode alone was ~40% of
    the wall. The new plan never materializes the instance stream:

    1. **Frequency pass** — an Arrow-batched ``mapInPandas`` tokenizes
       each batch with C++ kernels (:func:`_arrow_token_lists`; zero
       per-token Python objects) and emits per-batch (token, count)
       PARTIALS — batch-vocabulary-sized, not instance-sized — which a
       groupBy sums into the corpus frequency relation.
    2. **Head codebook** — the ``head_size`` most frequent tokens (the
       entire Zipf skew) collect to the driver as a bounded codebook
       (≤ 4096 rows — the same documented collect exception as the ANN
       centroid codebooks) with their log2-probabilities.
    3. **Scoring pass** — a second Arrow-batched pass re-tokenizes and
       scores every head token IN the map task (dictionary-encode →
       per-unique lookup → one bincount per doc), emitting ONE row per
       document plus rare residual (doc, token, count) rows for tail
       tokens, which join the frequency relation distributedly.

    The Zipf guard survives: head instances never shuffle (they are
    folded map-side into the doc partial), and only the long tail —
    tiny per-token fan-out by construction — takes the shuffle join, so
    no reducer ever sees a hot key. Measured at sf10: 13.3 s → 4.3 s
    for the perplexity-bucket consumer (DuckDB twin 3.7 s on the same
    box); per-doc means are weighted identically, so the twin stays
    hash-exact (parity pinned at sf0.01 and sf1 plus the planted
    tail/edge-whitespace pytests).
    """
    import math

    id_t = df.schema[id_col].dataType.simpleString()

    def freq_gen(batches):
        import pandas as pd
        import pyarrow.compute as pc

        for pdf in batches:
            vc = pc.list_flatten(_arrow_token_lists(pdf["__t"])).value_counts()
            yield pd.DataFrame(
                {"tok": vc.field(0).to_pylist(), "cnt": vc.field(1).to_pylist()}
            )

    texts = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    partials = texts.select("__t").mapInPandas(freq_gen, "tok string, cnt long")
    freq = (
        partials.groupBy("tok")
        .agg(F.sum("cnt").alias("c"))
        .localCheckpoint(eager=False)  # feeds total, head, and tail join
    )
    total_s = float(freq.agg(F.sum("c").cast("double")).collect()[0][0] or 0.0)
    head_rows = (
        freq.orderBy(F.col("c").desc(), F.col("tok").asc()).limit(head_size).collect()
    )
    head_map = {r["tok"]: math.log2(r["c"] / total_s) for r in head_rows}

    def score_gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            m = len(pdf)
            ids = pdf["__id"].to_numpy()
            uniq, idx, parent = _arrow_token_arrays(pdf["__t"])
            lp = np.array(
                [head_map.get(u, np.nan) for u in uniq], dtype=np.float64
            )
            tok_lp = lp[idx] if len(uniq) else np.empty(0)
            n_tok = np.bincount(parent, minlength=m).astype(np.int64)
            head_sum = np.bincount(
                parent,
                weights=np.where(np.isnan(tok_lp), 0.0, tok_lp),
                minlength=m,
            )
            valid = pdf["__t"].notna().to_numpy()
            out_id = list(ids[valid])
            out_tok = [None] * int(valid.sum())
            out_cnt = list(n_tok[valid])
            out_w = list(head_sum[valid])
            tail_mask = np.isnan(tok_lp)
            if tail_mask.any():
                nu = len(uniq)
                key = parent[tail_mask] * nu + idx[tail_mask]
                uk, uc = np.unique(key, return_counts=True)
                out_id.extend(ids[(uk // nu).astype(np.int64)])
                out_tok.extend(uniq[int(j)] for j in (uk % nu))
                out_cnt.extend(uc.astype(np.int64))
                out_w.extend([None] * len(uk))
            yield pd.DataFrame(
                {"id": out_id, "tok": out_tok, "cnt": out_cnt, "w": out_w}
            ).astype({"w": "float64", "cnt": "int64"})

    scored = texts.mapInPandas(
        score_gen, f"id {id_t}, tok string, cnt bigint, w double"
    ).localCheckpoint(eager=False)  # feeds the doc-partial AND tail readers
    docp = scored.filter(F.col("tok").isNull()).select("id", "cnt", "w")
    tail = (
        scored.filter(F.col("tok").isNotNull())
        .join(freq, "tok")
        .select(
            "id",
            F.lit(0).cast("bigint").alias("cnt"),
            (
                F.col("cnt").cast("double")
                * F.log2(F.col("c").cast("double") / F.lit(total_s))
            ).alias("w"),
        )
    )
    return (
        docp.unionByName(tail)
        .groupBy("id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            r4(F.sum("w") / F.sum("cnt")).alias("mean_log2_prob"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "mean_log2_prob")
    )


def unigram_logprob_sql(table: str, id_col: str, text_col: str) -> str:
    toks = _TOKS_SQL.format(t=text_col)
    return f"""
    WITH toks AS (
      SELECT {id_col} AS id, unnest({toks}) AS tok FROM {table}
    ), freq AS (
      SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(c) AS DOUBLE) AS s FROM freq
    )
    SELECT t.id AS {id_col},
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(log2(CAST(f.c AS DOUBLE) / tot.s)) + 1e-9, 4)
             AS mean_log2_prob
    FROM toks t JOIN freq f USING (tok) CROSS JOIN tot
    GROUP BY t.id
    """


# ---------------------------------------------------------------------------
# Decontaminated train/test split (split hygiene)
# ---------------------------------------------------------------------------


def split_decontaminated(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    test_buckets: int = 10,
    test_cut: int = 2,
) -> DataFrame:
    """Hash-deterministic train/test split with leakage flags — the
    split-hygiene step (test docs sharing verbatim n-grams with train
    docs inflate eval scores; Dodge et al. 2021). Docs land in ``test``
    when their md5 bucket < ``test_cut`` of ``test_buckets`` (stable
    across runs/engines — no RNG); a test doc is ``is_leaked`` when it
    shares ANY word ``n``-gram with any train doc.

    Scale shape: the train side — the big one — NEVER shuffles: the
    (small) distinct test-gram set broadcasts into a map-side semi-probe
    over the exploded train grams, whose matches (bounded by the test
    gram count) are deduped and broadcast back to flag test docs. Both
    shuffles in the plan are over test-sized relations only.
    """
    bucket = F.expr(
        f"pmod(cast(conv(substr(md5(cast({id_col} as string)), 1, 15), 16, 10) "
        f"as bigint), {test_buckets})"
    )
    base = df.select(
        F.col(id_col),
        F.when(bucket < test_cut, F.lit("test")).otherwise(F.lit("train")).alias("split"),
        F.col(text_col).alias("__t"),
    )
    grams = F.explode(F.expr(f"array_distinct({_ngram_expr('__t', n)})"))
    test_grams = (
        base.filter(F.col("split") == "test").select(grams.alias("gram")).distinct()
    )
    leaked_grams = (
        base.filter(F.col("split") == "train")
        .select(grams.alias("gram"))
        .join(F.broadcast(test_grams), "gram")
        .distinct()
    )
    leaked_docs = (
        base.filter(F.col("split") == "test")
        .select(F.col(id_col), grams.alias("gram"))
        .join(F.broadcast(leaked_grams), "gram")
        .select(id_col)
        .distinct()
        .withColumn("__leak", F.lit(1))
    )
    return (
        base.join(leaked_docs, id_col, "left")
        .select(
            F.col(id_col),
            "split",
            F.when(F.col("split") == "test", F.coalesce(F.col("__leak"), F.lit(0)))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_leaked"),
        )
    )


def split_decontaminated_sql(
    table: str,
    id_col: str,
    text_col: str,
    n: int = 8,
    test_buckets: int = 10,
    test_cut: int = 2,
) -> str:
    grams = _ngram_sql(text_col, n)
    return f"""
    WITH base AS (
      SELECT {id_col}, {text_col},
             CASE WHEN (('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT
                        % {test_buckets}) < {test_cut}
                  THEN 'test' ELSE 'train' END AS split
      FROM {table}
    ), test_grams AS (
      SELECT DISTINCT unnest(list_distinct({grams})) AS gram
      FROM base WHERE split = 'test'
    ), leaked_grams AS (
      SELECT DISTINCT g.gram
      FROM (SELECT unnest(list_distinct({grams})) AS gram
            FROM base WHERE split = 'train') g
      JOIN test_grams USING (gram)
    ), leaked_docs AS (
      SELECT DISTINCT b.{id_col}
      FROM (SELECT {id_col}, unnest(list_distinct({grams})) AS gram
            FROM base WHERE split = 'test') b
      JOIN leaked_grams USING (gram)
    )
    SELECT base.{id_col}, base.split,
           CAST(CASE WHEN base.split = 'test' AND leaked_docs.{id_col} IS NOT NULL
                THEN 1 ELSE 0 END AS INTEGER) AS is_leaked
    FROM base LEFT JOIN leaked_docs USING ({id_col})
    """


# --- sentence-level boilerplate dedup (CCNet-style) ------------------------


def sentence_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int = 3,
) -> DataFrame:
    """CCNet/Dolma-style sub-document dedup: drop every SENTENCE whose
    normalized form appears in more than ``max_df`` distinct documents
    (cookie banners, nav text, license boilerplate — the dup mass that
    document-level dedup can't touch because the surrounding text
    differs), then reassemble each document from its surviving
    sentences in original order.

    Scale shape: one explode + one map-side-combined doc-frequency
    count; the boilerplate set (≤ total_sentences / max_df rows) rides
    back as a BROADCAST anti-join, so the corpus-side relation never
    shuffles on sentence text; reassembly is one groupBy(id) with a
    sort inside the bounded per-doc list. Output: (id, clean_text,
    n_sentences, n_removed) for every input document (fully-boilerplate
    docs keep an empty clean_text).
    """
    sent = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), r"\.\s+")).alias("pos", "s"),
        )
        .withColumn("s", F.trim("s"))
        .filter(F.col("s") != "")
        .withColumn("norm", F.lower(F.col("s")))
        # three consumers below (doc-frequency count, anti-join, per-doc
        # totals) — checkpoint so the text split/explode runs once, not 3x
        # (blocks are ContextCleaner-managed; lazy, first job materializes)
        .localCheckpoint(eager=False)
    )
    freq = (
        sent.select("id", "norm")
        .distinct()
        .groupBy("norm")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("norm")
    )
    kept = sent.join(F.broadcast(freq), "norm", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.expr(
            "concat_ws('. ', transform(array_sort(collect_list(struct(pos, s))), "
            "x -> x.s))"
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )
    totals = sent.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("n_sentences"))
    return (
        df.select(F.col(id_col).alias("id"))
        .join(totals, "id", "left")
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_sentences", F.lit(0)).cast("bigint").alias("n_sentences"),
            (
                F.coalesce("n_sentences", F.lit(0)) - F.coalesce("n_kept", F.lit(0))
            ).cast("bigint").alias("n_removed"),
        )
    )


def sentence_dedup_sql(table: str, id_col: str, text_col: str, max_df: int = 3) -> str:
    """DuckDB twin: same split / normalize / doc-frequency threshold /
    ordered reassembly."""
    return rf"""
    WITH sent AS (
      SELECT id, pos, s, lower(s) AS norm FROM (
        SELECT {id_col} AS id,
               generate_subscripts(regexp_split_to_array({text_col}, '\.[ \t\n\x0b\f\r]+'), 1) AS pos,
               trim(unnest(regexp_split_to_array({text_col}, '\.[ \t\n\x0b\f\r]+'))) AS s
        FROM {table}
      ) WHERE s != ''
    ), freq AS (
      SELECT norm FROM (SELECT DISTINCT id, norm FROM sent)
      GROUP BY norm HAVING COUNT(*) > {max_df}
    ), kept AS (
      SELECT * FROM sent ANTI JOIN freq USING (norm)
    ), rebuilt AS (
      SELECT id, string_agg(s, '. ' ORDER BY pos) AS clean_text,
             CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY id
    ), totals AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS n_sentences FROM sent GROUP BY id
    )
    SELECT d.{id_col},
           COALESCE(r.clean_text, '') AS clean_text,
           CAST(COALESCE(t.n_sentences, 0) AS BIGINT) AS n_sentences,
           CAST(COALESCE(t.n_sentences, 0) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
    FROM (SELECT {id_col} FROM {table}) d
    LEFT JOIN totals t ON d.{id_col} = t.id
    LEFT JOIN rebuilt r ON d.{id_col} = r.id
    """


# ---------------------------------------------------------------------------
# DSIR-style importance weights (data selection via importance resampling)
# ---------------------------------------------------------------------------


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred,
    head_size: int = 1024,
) -> DataFrame:
    """Per-document importance weight for target-domain selection —
    the DSIR recipe (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling", public paper): score every raw
    document by ``log p_target(doc) - log p_background(doc)`` under two
    cheap bag-of-words LMs, then sample the raw corpus proportionally to
    the exponentiated weight. Documents that look like the target domain
    (here: ``target_pred`` rows, e.g. a trusted source set) get high
    weights; resampling by them shifts the corpus mixture toward the
    target without training a classifier.

    Both LMs are restricted to the corpus's ``head_size`` most frequent
    tokens (ties broken lexicographically) with Laplace +1 smoothing
    over that shared vocabulary; out-of-head tokens contribute nothing
    (their smoothed target/background ratio is ~1 by construction at
    the tail, and skipping them keeps the join map-side). The paper
    hashes n-grams into a fixed-width table for the same reason — a
    bounded vocabulary makes the LM a broadcastable constant.

    Scale shape: one tokenize+explode pass over the corpus (narrow),
    one global head aggregate (the only wide op, combiner-friendly),
    then the per-token log-ratios BROADCAST — the Zipf-head discipline
    of :func:`unigram_logprob` — and the per-doc weight is a map-side
    broadcast join + one groupBy(id). Docs with zero head tokens drop
    out (no evidence either way), documented and mirrored in the twin.

    Returns ``(id_col, n_head_tokens, dsir_logweight)``.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        target_pred.cast("int").alias("is_t"),
        F.explode_outer(F.expr(_TOKS.format(t=text_col))).alias("tok"),
    # NULL text → NULL-token row under explode_outer, which could claim
    # a head-vocabulary slot and skew the shared Laplace totals while
    # DuckDB's unnest emits nothing (ADVICE r6) — filter above the
    # generate, matching unigram_logprob
    ).where(F.col("tok").isNotNull()).localCheckpoint(
        eager=False
    )  # feeds the head agg AND the scoring join
    per_tok = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.sum("is_t").cast("bigint").alias("c_t"),
    )
    head = per_tok.orderBy(F.col("c_all").desc(), F.col("tok").asc()).limit(
        head_size
    )
    # totals over the HEAD vocabulary only — both LMs live on the same
    # bounded support, so the +V smoothing denominator is shared
    totals = head.agg(
        F.sum("c_all").cast("double").alias("n_all"),
        F.sum("c_t").cast("double").alias("n_t"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    ratios = head.crossJoin(F.broadcast(totals)).select(
        "tok",
        (
            F.log((F.col("c_t") + 1.0) / (F.col("n_t") + F.col("v")))
            - F.log((F.col("c_all") + 1.0) / (F.col("n_all") + F.col("v")))
        ).alias("lr"),
    )
    return (
        toks.join(F.broadcast(ratios), "tok")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_head_tokens"),
            r4(F.sum("lr")).alias("dsir_logweight"),
        )
        .select(F.col("id").alias(id_col), "n_head_tokens", "dsir_logweight")
    )


def dsir_weights_sql(
    table: str,
    id_col: str,
    text_col: str,
    target_pred_sql: str,
    head_size: int = 1024,
) -> str:
    toks = _TOKS_SQL.format(t=text_col)
    return f"""
    WITH toks AS (
      SELECT {id_col} AS id,
             CASE WHEN {target_pred_sql} THEN 1 ELSE 0 END AS is_t,
             unnest({toks}) AS tok
      FROM {table}
    ), head AS (
      SELECT tok, COUNT(*) AS c_all, CAST(SUM(is_t) AS BIGINT) AS c_t
      FROM toks GROUP BY 1
      ORDER BY c_all DESC, tok ASC LIMIT {head_size}
    ), tot AS (
      SELECT CAST(SUM(c_all) AS DOUBLE) AS n_all,
             CAST(SUM(c_t) AS DOUBLE) AS n_t,
             CAST(COUNT(*) AS DOUBLE) AS v
      FROM head
    ), ratios AS (
      SELECT tok,
             ln((c_t + 1.0) / (tot.n_t + tot.v))
               - ln((c_all + 1.0) / (tot.n_all + tot.v)) AS lr
      FROM head CROSS JOIN tot
    )
    SELECT t.id AS {id_col},
           CAST(COUNT(*) AS BIGINT) AS n_head_tokens,
           ROUND(SUM(r.lr) + 1e-9, 4) AS dsir_logweight
    FROM toks t JOIN ratios r USING (tok)
    GROUP BY t.id
    """


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, appendix A1.1)
# ---------------------------------------------------------------------------

_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str,
    source_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Per-source pass rates under the Gopher document-quality rules
    (Rae et al. 2021): word count in [min_words, max_words], mean word
    length in [3, 10], symbol-to-word ratio ('#' or ellipsis) ≤ 0.1,
    < 90 % of lines bullet-started, ≤ 30 % ellipsis-ended, ≥ 80 % of
    words containing an alphabetic character, and ≥ 2 distinct stop
    words present. The de-facto standard pre-filter for web-scale LLM
    corpora; the per-rule fail counts are the tuning readout (which
    rule is doing the cutting per source).

    Plan: every rule is a JVM higher-order-function expression over the
    split arrays — no UDF, no explode, no shuffle of text. The only
    exchange carries one row per source (map-side combined), so the
    operator is scan-bound at any corpus size.
    """
    ws = f"split(lower(trim({text_col})), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+')"
    lines = f"split({text_col}, '\\n')"
    n_words = f"size({ws})"
    mean_wl = f"aggregate({ws}, 0L, (a, w) -> a + length(w)) / cast({n_words} as double)"
    n_sym = (
        f"(length({text_col}) - length(replace({text_col}, '#', '')))"
        f" + cast((length({text_col}) - length(replace({text_col}, '...', ''))) / 3 as bigint)"
        f" + (length({text_col}) - length(replace({text_col}, '…', '')))"
    )
    bullet_frac = (
        f"size(filter({lines}, l -> ltrim(l) rlike '^[-*•]'))"
        f" / cast(size({lines}) as double)"
    )
    ellipsis_frac = (
        f"size(filter({lines}, l -> rtrim(l) rlike '(\\\\.\\\\.\\\\.|…)$'))"
        f" / cast(size({lines}) as double)"
    )
    alpha_frac = (
        f"size(filter({ws}, w -> w rlike '[a-z]')) / cast({n_words} as double)"
    )
    n_stop = " + ".join(
        f"cast(array_contains({ws}, '{s}') as int)" for s in _GOPHER_STOPWORDS
    )
    fails = {
        "fail_word_count": f"({n_words} < {min_words} OR {n_words} > {max_words})",
        "fail_mean_word_len": f"({mean_wl} < 3.0 OR {mean_wl} > 10.0)",
        "fail_symbol_ratio": f"({n_sym} / cast({n_words} as double) > 0.1)",
        "fail_bullet_lines": f"({bullet_frac} > 0.9)",
        "fail_ellipsis_lines": f"({ellipsis_frac} > 0.3)",
        "fail_alpha_words": f"({alpha_frac} < 0.8)",
        "fail_stop_words": f"(({n_stop}) < 2)",
    }
    flagged = df.where(F.col(text_col).isNotNull()).select(
        F.col(source_col).alias("source"),
        *[F.expr(expr).cast("int").alias(name) for name, expr in fails.items()],
    )
    any_fail = None
    for name in fails:
        c = F.col(name) == 1
        any_fail = c if any_fail is None else (any_fail | c)
    flagged = flagged.withColumn("__pass", (~any_fail).cast("bigint"))
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__pass").cast("bigint").alias("n_pass"),
            r4(F.avg("__pass")).alias("pass_rate"),
            *[F.sum(name).cast("bigint").alias(name) for name in fails],
        )
    )


def gopher_rules_sql(
    table: str,
    text_col: str,
    source_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
) -> str:
    ws = rf"regexp_split_to_array(lower(trim({text_col})), '[ \t\n\x0b\f\r]+')"
    lines = f"string_split({text_col}, chr(10))"
    n_words = f"len({ws})"
    mean_wl = f"list_sum(list_transform({ws}, w -> length(w))) / CAST({n_words} AS DOUBLE)"
    n_sym = (
        f"(length({text_col}) - length(replace({text_col}, '#', '')))"
        f" + CAST((length({text_col}) - length(replace({text_col}, '...', ''))) / 3 AS BIGINT)"
        f" + (length({text_col}) - length(replace({text_col}, '…', '')))"
    )
    bullet_frac = (
        f"len(list_filter({lines}, l -> regexp_matches(ltrim(l), '^[-*•]')))"
        f" / CAST(len({lines}) AS DOUBLE)"
    )
    ellipsis_frac = (
        rf"len(list_filter({lines}, l -> regexp_matches(rtrim(l), '(\.\.\.|…)$')))"
        f" / CAST(len({lines}) AS DOUBLE)"
    )
    alpha_frac = (
        f"len(list_filter({ws}, w -> regexp_matches(w, '[a-z]'))) / CAST({n_words} AS DOUBLE)"
    )
    n_stop = " + ".join(
        f"CAST(list_contains({ws}, '{s}') AS INT)" for s in _GOPHER_STOPWORDS
    )
    fails = {
        "fail_word_count": f"({n_words} < {min_words} OR {n_words} > {max_words})",
        "fail_mean_word_len": f"({mean_wl} < 3.0 OR {mean_wl} > 10.0)",
        "fail_symbol_ratio": f"({n_sym} / CAST({n_words} AS DOUBLE) > 0.1)",
        "fail_bullet_lines": f"({bullet_frac} > 0.9)",
        "fail_ellipsis_lines": f"({ellipsis_frac} > 0.3)",
        "fail_alpha_words": f"({alpha_frac} < 0.8)",
        "fail_stop_words": f"(({n_stop}) < 2)",
    }
    flag_cols = ",\n             ".join(
        f"CAST({expr} AS INT) AS {name}" for name, expr in fails.items()
    )
    any_fail = " OR ".join(f"{name} = 1" for name in fails)
    sum_cols = ",\n           ".join(
        f"CAST(SUM({name}) AS BIGINT) AS {name}" for name in fails
    )
    return f"""
    WITH flagged AS (
      SELECT {source_col} AS source,
             {flag_cols}
      FROM {table} WHERE {text_col} IS NOT NULL
    ), passed AS (
      SELECT *, CASE WHEN {any_fail} THEN 0 ELSE 1 END AS p FROM flagged
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p) AS BIGINT) AS n_pass,
           ROUND(AVG(p) + 1e-9, 4) AS pass_rate,
           {sum_cols}
    FROM passed GROUP BY 1
    """


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets (head / middle / tail per language)
# ---------------------------------------------------------------------------


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    head_size: int = 4096,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): score every
    document by mean unigram log-probability (the cheap perplexity
    proxy — see :func:`unigram_logprob`), then tercile WITHIN each
    language: 'head' = most-probable third (cleanest text), 'tail' =
    least. Downstream mixers sample by bucket (e.g. keep head+middle,
    drop tail) — this emits the bucket sizes and score ranges that
    drive that decision.

    Plan: rides unigram_logprob's broadcast-head/shuffle-tail shape; the
    tercile is an exact NTILE per language on doc-grain rows. At 100 TB
    swap NTILE for approx_percentile cut points (sketch-mergeable, no
    global sort); the exact NTILE here is the oracle-checkable contract.
    """
    scored = unigram_logprob(df, id_col, text_col, head_size=head_size)
    langs = df.select(F.col(id_col), F.col(lang_col).alias("lang"))
    joined = scored.join(langs, id_col)
    w = Window.partitionBy("lang").orderBy(
        F.col("mean_log2_prob").desc(), F.col(id_col).asc()
    )
    bucketed = joined.select(
        "lang",
        "mean_log2_prob",
        F.when(F.ntile(3).over(w) == 1, "head")
        .when(F.ntile(3).over(w) == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            r4(F.avg("mean_log2_prob")).alias("avg_log2_prob"),
            r4(F.min("mean_log2_prob")).alias("min_log2_prob"),
            r4(F.max("mean_log2_prob")).alias("max_log2_prob"),
        )
    )


def perplexity_buckets_sql(
    table: str, id_col: str, text_col: str, lang_col: str
) -> str:
    inner = unigram_logprob_sql(table, id_col, text_col)
    return f"""
    WITH scored AS ({inner}),
    bucketed AS (
      SELECT d.{lang_col} AS lang, s.mean_log2_prob,
             CASE NTILE(3) OVER (
                    PARTITION BY d.{lang_col}
                    ORDER BY s.mean_log2_prob DESC, s.{id_col})
                  WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
             END AS bucket
      FROM scored s JOIN {table} d USING ({id_col})
    )
    SELECT lang, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(mean_log2_prob) + 1e-9, 4) AS avg_log2_prob,
           ROUND(MIN(mean_log2_prob) + 1e-9, 4) AS min_log2_prob,
           ROUND(MAX(mean_log2_prob) + 1e-9, 4) AS max_log2_prob
    FROM bucketed GROUP BY 1, 2
    """


def perplexity_buckets_approx(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    head_size: int = 4096,
    bins: int = 512,
) -> DataFrame:
    """Histogram-cut head/middle/tail split — the 100 TB path promised
    by :func:`perplexity_buckets`'s docstring, now as code (VERDICT r8
    #5 / ADVICE). Same readout; the exact per-language NTILE over
    DOC-grain rows (a global per-language sort at scale) is replaced by
    ``bins`` fixed-width score buckets: every document in a bucket gets
    the same bucket label, chosen from the bucket's cumulative position
    against the n/3 and 2n/3 marks (inclusive-count ≤ n/3 → 'tail',
    rows-below ≥ 2n/3 → 'head', else 'middle'). Bucket sizes deviate
    from exact terciles only by bin-straddle — ≲ 1/bins of the range.

    Plan: rides unigram_logprob's broadcast-head/shuffled-tail token
    join; after the doc-grain score, everything is an aggregate tree —
    per-(lang,bin) histogram (map-side combined, ≤ bins rows per
    language), a window over those ≤ bins rows, and the final 3-row
    rollup. No doc-grain sort, window, or re-join anywhere, so the
    operator stays scan-bound at any corpus size. Deterministic (fixed
    binning, not a sketch), so the DuckDB twin hash-matches exactly.
    """
    b = float(bins)
    scored = unigram_logprob(df, id_col, text_col, head_size=head_size)
    langs = df.select(F.col(id_col), F.col(lang_col).alias("lang"))
    # two consumers (per-lang min/max stats, then binning) — checkpoint
    # so the unigram-score lineage compiles and runs once, not per
    # consumer (same multi-consumer discipline as unigram_logprob's own
    # token stream; halves the plan's exchange count)
    joined = (
        scored.join(langs, id_col)
        .select("lang", "mean_log2_prob")
        .localCheckpoint(eager=False)
    )
    stats = joined.groupBy("lang").agg(
        F.min("mean_log2_prob").alias("__mn"),
        F.max("mean_log2_prob").alias("__mx"),
    )
    width = F.when(
        F.col("__mx") > F.col("__mn"), (F.col("__mx") - F.col("__mn")) / F.lit(b)
    ).otherwise(F.lit(1.0))
    binned = joined.join(F.broadcast(stats), "lang").select(
        "lang",
        "mean_log2_prob",
        F.least(
            F.lit(int(b) - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("mean_log2_prob") - F.col("__mn")) / width),
            ),
        ).cast("bigint").alias("b"),
    )
    hist = binned.groupBy("lang", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("mean_log2_prob").alias("s_b"),
        F.min("mean_log2_prob").alias("mn_b"),
        F.max("mean_log2_prob").alias("mx_b"),
    )
    w = Window.partitionBy("lang").orderBy("b")
    wl = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "n_b",
        "s_b",
        "mn_b",
        "mx_b",
        F.sum("n_b").over(w).alias("cum_incl"),
        F.sum("n_b").over(wl).alias("n"),
    )
    bucket = (
        F.when(F.col("cum_incl") <= F.col("n") / 3.0, F.lit("tail"))
        .when(
            F.col("cum_incl") - F.col("n_b") >= 2.0 * F.col("n") / 3.0,
            F.lit("head"),
        )
        .otherwise(F.lit("middle"))
    )
    return (
        cum.select("lang", bucket.alias("bucket"), "n_b", "s_b", "mn_b", "mx_b")
        .groupBy("lang", "bucket")
        .agg(
            F.sum("n_b").cast("bigint").alias("n_docs"),
            r4(F.sum("s_b") / F.sum("n_b")).alias("avg_log2_prob"),
            r4(F.min("mn_b")).alias("min_log2_prob"),
            r4(F.max("mx_b")).alias("max_log2_prob"),
        )
    )


def perplexity_buckets_approx_sql(
    table: str, id_col: str, text_col: str, lang_col: str, bins: int = 512
) -> str:
    inner = unigram_logprob_sql(table, id_col, text_col)
    b = float(bins)
    return f"""
    WITH scored AS ({inner}),
    joined AS (
      SELECT d.{lang_col} AS lang, s.mean_log2_prob
      FROM scored s JOIN {table} d USING ({id_col})
    ), stats AS (
      SELECT lang, MIN(mean_log2_prob) AS mn, MAX(mean_log2_prob) AS mx
      FROM joined GROUP BY 1
    ), binned AS (
      SELECT j.lang, j.mean_log2_prob,
             CAST(LEAST({int(b) - 1}, GREATEST(0, FLOOR(
               (j.mean_log2_prob - s.mn) /
               (CASE WHEN s.mx > s.mn THEN (s.mx - s.mn) / {b} ELSE 1.0 END)
             ))) AS BIGINT) AS b
      FROM joined j JOIN stats s USING (lang)
    ), hist AS (
      SELECT lang, b, CAST(COUNT(*) AS BIGINT) AS n_b,
             SUM(mean_log2_prob) AS s_b,
             MIN(mean_log2_prob) AS mn_b, MAX(mean_log2_prob) AS mx_b
      FROM binned GROUP BY 1, 2
    ), cum AS (
      SELECT lang, n_b, s_b, mn_b, mx_b,
             SUM(n_b) OVER (PARTITION BY lang ORDER BY b) AS cum_incl,
             SUM(n_b) OVER (PARTITION BY lang) AS n
      FROM hist
    )
    SELECT lang,
           CASE WHEN cum_incl <= n / 3.0 THEN 'tail'
                WHEN cum_incl - n_b >= 2.0 * n / 3.0 THEN 'head'
                ELSE 'middle'
           END AS bucket,
           CAST(SUM(n_b) AS BIGINT) AS n_docs,
           ROUND(SUM(s_b) / SUM(n_b) + 1e-9, 4) AS avg_log2_prob,
           ROUND(MIN(mn_b) + 1e-9, 4) AS min_log2_prob,
           ROUND(MAX(mx_b) + 1e-9, 4) AS max_log2_prob
    FROM cum GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# Tokenizer-training statistics
# ---------------------------------------------------------------------------

def bpe_pair_counts(df: DataFrame, text_col: str, k: int = 50) -> DataFrame:
    """Corpus-wide adjacent-symbol pair frequencies over character-level
    word symbolizations — the statistic a BPE tokenizer trainer
    (Sennrich et al. 2016; GPT-2) computes for its FIRST merge
    decision, at corpus scale. Each word contributes its interior
    character bigrams plus a terminal (last-char, '|') end-of-word
    pair, weighted by the word's corpus frequency.

    Scale shape: tokens collapse to DISTINCT words first (map-side
    combined groupBy — Heaps'-law bounded, not token-bounded), then
    pair explosion runs over the small vocabulary relation only
    (≤ word-length rows per distinct word), and the final pair agg is
    again combiner-backed. Two shuffles total, both on aggregated
    relations; no per-token wire traffic at any point. Top-k ties
    broken by pair text so the boundary is deterministic.
    """
    toks = _TOKS.format(t=text_col)
    words = df.select(F.explode(F.expr(toks)).alias("w")).filter(F.col("w") != "")
    wc = words.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("wf"))
    pairs = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(w)), i -> substring(w || '|', i, 2))")
        ).alias("pair"),
        "wf",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wf").cast("bigint").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(k)
    )


def bpe_pair_counts_sql(table: str, text_col: str, k: int = 50) -> str:
    toks = _TOKS_SQL.format(t=text_col)
    return f"""
    WITH wc AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS wf
      FROM (SELECT unnest({toks}) AS w FROM {table})
      WHERE w <> '' GROUP BY w
    ),
    pairs AS (
      SELECT substr(w || '|', i, 2) AS pair, wf
      FROM (SELECT w, wf, unnest(range(1, length(w) + 1)) AS i FROM wc)
    )
    SELECT pair, CAST(SUM(wf) AS BIGINT) AS pair_count
    FROM pairs GROUP BY 1
    ORDER BY pair_count DESC, pair ASC
    LIMIT {k}
    """


def vocab_coverage(
    df: DataFrame, text_col: str, top_ns: tuple[int, ...] = (10, 50, 200)
) -> DataFrame:
    """Token coverage of the top-N corpus vocabulary — the
    fixed-vocabulary OOV-rate curve a tokenizer/vocab designer reads
    before choosing a vocab size. For each N: the fraction of ALL token
    occurrences covered by the N most frequent words (ties at the
    boundary broken by word text, so the cut is deterministic).

    Scale shape: one combiner-backed word count (vocab-bounded), then
    ``orderBy().limit(max_N)`` — Spark's TakeOrdered, a per-partition
    heap + driver merge of max_N rows, NOT a full vocabulary sort —
    and all remaining arithmetic runs on ≤ max_N rows. The total token
    count rides a 1-row broadcast.
    """
    max_n = max(top_ns)
    toks = _TOKS.format(t=text_col)
    words = df.select(F.explode(F.expr(toks)).alias("w")).filter(F.col("w") != "")
    wc = words.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    total = wc.agg(F.sum("c").cast("bigint").alias("total_tokens"))
    top = wc.orderBy(F.col("c").desc(), F.col("w").asc()).limit(max_n)
    ranked = top.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("c").desc(), F.col("w").asc())
        ),
    )
    ns = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(int(n)) for n in top_ns])).alias("top_n")
    )
    # running-sum + EQUI-join at rk == top_n (ADVICE r9: the rk <= top_n
    # non-equi join compiled to a BroadcastNestedLoopJoin between
    # multi-row relations, violating PLANS.md's BNLJ invariant). The
    # cumulative window runs over <= max_n rows, one partition — tiny.
    # top_n beyond the vocabulary falls back to the whole-list sum.
    wcum = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    cums = ranked.select("rk", F.sum("c").over(wcum).alias("cum"))
    allc = cums.agg(F.coalesce(F.max("cum"), F.lit(0)).alias("allcum"))
    cov = (
        ns.join(
            F.broadcast(cums.withColumnRenamed("rk", "top_n")), "top_n", "left"
        )
        .crossJoin(F.broadcast(allc))
        .select(
            "top_n",
            F.coalesce("cum", "allcum").cast("bigint").alias("covered_tokens"),
        )
    )
    return (
        cov.crossJoin(F.broadcast(total))
        .select(
            F.col("top_n").cast("int").alias("top_n"),
            "covered_tokens",
            "total_tokens",
            r4(
                F.col("covered_tokens").cast("double")
                / F.col("total_tokens").cast("double")
            ).alias("coverage"),
            r4(
                F.lit(1.0)
                - F.col("covered_tokens").cast("double")
                / F.col("total_tokens").cast("double")
            ).alias("oov_rate"),
        )
        .orderBy("top_n")
    )


def vocab_coverage_sql(
    table: str, text_col: str, top_ns: tuple[int, ...] = (10, 50, 200)
) -> str:
    toks = _TOKS_SQL.format(t=text_col)
    ns_values = ", ".join(f"({int(n)})" for n in top_ns)
    return f"""
    WITH wc AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest({toks}) AS w FROM {table})
      WHERE w <> '' GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total_tokens FROM wc),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS rk FROM wc
    ),
    ns(top_n) AS (VALUES {ns_values}),
    cums AS (SELECT rk, SUM(c) OVER (ORDER BY rk) AS cum FROM ranked),
    allc AS (SELECT COALESCE(MAX(cum), 0) AS allcum FROM cums),
    cov AS (
      SELECT ns.top_n,
             CAST(COALESCE(cums.cum, allc.allcum) AS BIGINT) AS covered_tokens
      FROM ns LEFT JOIN cums ON cums.rk = ns.top_n CROSS JOIN allc
    )
    SELECT CAST(cov.top_n AS INTEGER) AS top_n,
           cov.covered_tokens,
           tot.total_tokens,
           ROUND(cov.covered_tokens * 1.0 / tot.total_tokens + 1e-9, 4) AS coverage,
           ROUND(1.0 - cov.covered_tokens * 1.0 / tot.total_tokens + 1e-9, 4) AS oov_rate
    FROM cov CROSS JOIN tot
    ORDER BY top_n
    """


# BPE symbol sentinels: each symbol in a word's symbolization is stored
# as S1+sym+S2 inside one string, so applying a merge (a,b)->ab is a
# plain left-to-right literal replace of S1+a+S2+S1+b+S2 — the exact
# greedy non-overlapping scan reference BPE uses, and identical
# semantics in Spark (`replace`) and DuckDB (`replace`). Record
# separators are vanishingly rare in text; if one ever appears both
# engines degrade identically, so parity is unaffected.
_BPE_S1 = "\x1e"
_BPE_S2 = "\x1f"


def bpe_merges(df: DataFrame, text_col: str, n_merges: int = 6) -> DataFrame:
    """The BPE trainer loop (Sennrich et al. 2016) — ``n_merges``
    iterated merge decisions over the corpus, extending
    :func:`bpe_pair_counts` (the first decision) into the merge-table
    ARTIFACT a tokenizer ships with. Returns one row per merge step:
    ``(step, pair_left, pair_right, merged, pair_count)``.

    Scale shape (the embed_kmeans codebook discipline): tokens collapse
    once to the Heaps'-law-bounded distinct-word relation; every
    iteration re-scores adjacent symbol pairs over that vocab relation
    (combiner-backed groupBy, two small shuffles) and collects exactly
    ONE argmax row to the driver — merge-table-sized driver traffic,
    never corpus-sized. The winning pair broadcasts back as two literals
    in a `replace` projection CHAINED onto the once-checkpointed vocab:
    a round-i scan replays i-1 narrow string replaces (fused into the
    checkpoint scan, vocab-sized CPU) instead of materializing a new
    checkpoint per round — the r11→r12 bench drift adjudication showed
    this loop's wall is dominated by its sequential job-launch floor
    (13 jobs: 6 argmax + 7 localCheckpoints), so halving the job count
    beats saving the replay. Ties break on (count desc, left asc,
    right asc) so both engines pick the identical merge at every
    step.

    r15 measured rejections (VERDICT r14 #4, both with hash-identical
    outputs, interleaved A/B at sf0.1, quiet probes 0.15-0.43): (a)
    fusing the WHOLE trainer into one lazy plan — each argmax a
    broadcast 1-row relation driving the next round's replace — relied
    on exchange/stage reuse that fires only partially under AQE (15
    reuses vs 84 BroadcastExchanges in the executed plan; 69
    executions of the vocab leaf ≈ the 2^6 duplication bound), median
    3.94 s vs 2.42 s sequential; (b) fusing TWO rounds per collect
    (argmax_i as a broadcast inside round i+1's recount, one collect
    per round pair) pays the duplicated round-i aggregation, median
    2.31 s vs 1.74 s sequential. The per-round driver collect is NOT
    the wall — the vocab-sized aggregation is — so the sequential loop
    stands."""
    return df.sparkSession.createDataFrame(
        _bpe_train(df, text_col, n_merges),
        "step int, pair_left string, pair_right string, "
        "merged string, pair_count bigint",
    ).orderBy("step")


def _bpe_train(df: DataFrame, text_col: str, n_merges: int) -> list[tuple]:
    """The trainer loop itself, returning the merge rows as plain
    Python tuples — shared by :func:`bpe_merges` (which wraps them in a
    DataFrame) and :func:`bpe_encode_stats` (which consumes the merge
    literals directly, skipping the wrap-then-collect round-trip it
    paid through r14)."""
    toks = _TOKS.format(t=text_col)
    words = df.select(F.explode(F.expr(toks)).alias("w")).filter(F.col("w") != "")
    wc = words.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("wf"))
    wrapped = F.expr(
        f"concat(regexp_replace(w, '(.)', '{_BPE_S1}$1{_BPE_S2}'),"
        f" '{_BPE_S1}|{_BPE_S2}')"
    )
    vocab = wc.select(wrapped.alias("s"), "wf").localCheckpoint()

    sy = (
        f"split(substring(s, 2, length(s) - 2), '{_BPE_S2}{_BPE_S1}')"
    )
    pair_expr = (
        f"CASE WHEN size({sy}) > 1 THEN "
        f"transform(sequence(1, size({sy}) - 1),"
        f" i -> struct(element_at({sy}, i) AS a, element_at({sy}, i + 1) AS b))"
        f" ELSE array() END"
    )
    rows = []
    for step in range(1, n_merges + 1):
        pc = (
            vocab.select(F.explode(F.expr(pair_expr)).alias("p"), "wf")
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "wf")
            .groupBy("a", "b")
            .agg(F.sum("wf").cast("bigint").alias("pair_count"))
        )
        best = pc.orderBy(
            F.col("pair_count").desc(), F.col("a").asc(), F.col("b").asc()
        ).limit(1).collect()
        if not best:
            break  # corpus fully merged before n_merges steps
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["pair_count"]
        rows.append((step, a, b, a + b, cnt))
        pat = f"{_BPE_S1}{a}{_BPE_S2}{_BPE_S1}{b}{_BPE_S2}"
        rep = f"{_BPE_S1}{a}{b}{_BPE_S2}"
        vocab = vocab.select(
            F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("s"), "wf"
        )
    return rows


def bpe_merges_sql(table: str, text_col: str, n_merges: int = 6) -> str:
    """DuckDB twin of :func:`bpe_merges`: the trainer loop unrolled into
    one CTE chain per step (count pairs -> argmax -> literal replace),
    the same discipline as embed_kmeans's unrolled-k-means oracle."""
    toks = _TOKS_SQL.format(t=text_col)
    s1, s2 = _BPE_S1, _BPE_S2
    parts = [
        f"""wc AS MATERIALIZED (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS wf
          FROM (SELECT unnest({toks}) AS w FROM {table})
          WHERE w <> '' GROUP BY w
        )""",
        f"""v0 AS MATERIALIZED (
          SELECT regexp_replace(w, '(.)', '{s1}\\1{s2}', 'g')
                 || '{s1}|{s2}' AS s, wf
          FROM wc
        )""",
    ]
    for i in range(1, n_merges + 1):
        parts += [
            f"""p{i} AS MATERIALIZED (
              SELECT sy[j] AS a, sy[j + 1] AS b, wf FROM (
                SELECT string_split(substr(s, 2, length(s) - 2),
                                    '{s2}{s1}') AS sy,
                       wf, unnest(range(1, len(string_split(
                         substr(s, 2, length(s) - 2), '{s2}{s1}')))) AS j
                FROM v{i - 1})
            )""",
            f"""b{i} AS MATERIALIZED (
              SELECT a, b, CAST(SUM(wf) AS BIGINT) AS pair_count
              FROM p{i} GROUP BY 1, 2
              ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1
            )""",
            f"""v{i} AS MATERIALIZED (
              SELECT replace(v.s, '{s1}' || b.a || '{s2}{s1}' || b.b || '{s2}',
                             '{s1}' || b.a || b.b || '{s2}') AS s, v.wf
              FROM v{i - 1} v, b{i} b
            )""",
        ]
    steps = "\nUNION ALL ".join(
        f"SELECT {i} AS step, a AS pair_left, b AS pair_right,"
        f" a || b AS merged, pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    ctes = ",\n".join(parts)
    return f"WITH {ctes}\nSELECT * FROM ({steps}) ORDER BY step"


def span_dedup_emit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 32,
    drop_frac: float = 0.3,
) -> DataFrame:
    """The REMOVAL step of Lee et al. 2022 span dedup — the decision
    analog of ``dedup_keep_best`` (VERDICT r9 #7), consuming the exact
    stride-1 span verdicts that :func:`dup_spans_exact` profiles. Per
    document: the duplicated-CHAR fraction (union of all duplicated
    span intervals — tighter than the span fraction, since overlapping
    stride-1 spans over-count), and the emit action:

    - ``drop`` — duplicated-char fraction exceeds ``drop_frac``: the
      doc is mostly pasted content, remove it from the corpus;
    - ``clip`` — some duplicated chars but under the threshold: keep,
      trimming the duplicated intervals (``kept_chars`` is the size of
      the survivor);
    - ``keep`` — no cross-document duplicated span at all.

    Plan (r13 sort-free rewrite; the r12 one-window shape measured
    51.9 s fresh at sf10 vs the twin's 37.3 s → 1.39×, and its
    decomposition showed BOTH exchanges paying a 135 M-row SORT — the
    h-window sorts the whole span stream, then the per-doc coverage
    window sorts every duplicated position again):

    1. the span stream (id, pos, h) is persisted once
       (MEMORY_AND_DISK; ~20 B/row — doc_len deliberately does NOT
       ride it, it re-joins at doc grain);
    2. duplicated hashes come from a combiner-backed hash AGGREGATE
       (``min(id) != max(id)`` per h — no sort; distinct-h partials
       only on the wire, 1.77 M distinct vs 135 M spans at sf10);
    3. that dup-hash relation broadcasts back as a LEFT SEMI filter
       over the persisted stream (1.32 M keys ≈ 10 MB at sf10 — the
       hot-shingle broadcast discipline; at corpus scales where the
       dup-hash set outgrows the broadcast ceiling, drop the hint and
       AQE degrades this to a shuffle join, still sort-free — measured
       55.2 s vs 45.5 s at sf10);
    4. each doc's surviving positions pack MAP-SIDE into one
       ``collect_list`` partial (a doc's spans never straddle
       partitions — posexplode is narrow), so the only doc-grain
       exchange carries ONE row per doc; ``sort_array`` (unique
       positions, deterministic) + an ``aggregate`` lambda fold the
       interval union per doc — integer arithmetic, identical on both
       engines. The per-doc array is bounded by doc length, the same
       bound the old coverage window's id-partition carried.

    ``n_spans`` never rides the span stream at all: it is
    ``greatest(len - span_len + 1, 1)`` straight from the narrow doc
    relation, which joins the per-doc rollup at doc grain. Fresh sf10:
    39.8–40.7 s vs twin 37.3 s → **1.07×** (was 1.39×); same hash
    output. Linear in corpus bytes, self-join-free."""
    from pyspark import StorageLevel

    spans_expr = (
        f"transform(sequence(1, greatest(char_length({text_col}) - {span_len - 1}, 1), 1), "
        f"s -> cast(conv(substr(md5(cast(substring({text_col}, s, {span_len}) as binary)), 1, 15), 16, 10) as bigint))"
    )
    # NULL text drops at the scan (the old inner join on the span hash
    # did it implicitly; the aggregate would keep NULL-hash rows)
    docs = df.filter(F.col(text_col).isNotNull())
    base = docs.select(
        F.col(id_col).alias("id"),
        F.char_length(F.col(text_col)).cast("bigint").alias("doc_len"),
        F.greatest(
            F.char_length(F.col(text_col)).cast("bigint") - F.lit(span_len - 1),
            F.lit(1).cast("bigint"),
        ).alias("n_spans"),
    )
    sp = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.expr(spans_expr)).alias("pos", "h"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    dup_h = (
        sp.groupBy("h")
        .agg(F.min("id").alias("__mn"), F.max("id").alias("__mx"))
        .filter(F.col("__mn") != F.col("__mx"))
        .select("h")
    )
    packed = (
        sp.join(F.broadcast(dup_h), "h", "leftsemi")
        .select("id", (F.col("pos") + 1).alias("cpos"))
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("cpos")).alias("cps"))
    )
    iend = f"least(c + {span_len - 1}, doc_len)"
    union_fold = (
        f"aggregate(cps, struct(CAST(0 AS BIGINT) AS dc, CAST(0 AS BIGINT) AS pe), "
        f"(acc, c) -> struct("
        f"acc.dc + greatest(CAST(0 AS BIGINT), {iend} - greatest(c - 1, acc.pe)), "
        f"greatest(acc.pe, {iend})), "
        f"acc -> acc.dc)"
    )
    out = base.join(packed, "id", "left").select(
        "id",
        "doc_len",
        "n_spans",
        F.coalesce(F.size("cps"), F.lit(0)).cast("bigint").alias("n_dup_spans"),
        F.coalesce(F.expr(union_fold), F.lit(0)).cast("bigint").alias("dup_chars"),
    )
    # try_divide: a 0-char doc (doc_len = 0) raises under ANSI where
    # the DuckDB twin yields NULL (degenerate-docs sweep); NULL frac →
    # the drop test is NULL → falls through to clip/keep, both engines
    frac = r4(F.try_divide(F.col("dup_chars").cast("double"),
                           F.col("doc_len").cast("double")))
    return out.select(
        F.col("id").alias(id_col),
        "doc_len",
        "n_spans",
        "n_dup_spans",
        "dup_chars",
        frac.alias("dup_char_frac"),
        (F.col("doc_len") - F.col("dup_chars")).cast("bigint").alias("kept_chars"),
        F.when(
            F.try_divide(F.col("dup_chars").cast("double"),
                         F.col("doc_len").cast("double"))
            > F.lit(drop_frac),
            F.lit("drop"),
        )
        .when(F.col("dup_chars") > 0, F.lit("clip"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )


def span_dedup_emit_sql(
    table: str,
    id_col: str,
    text_col: str,
    span_len: int = 32,
    drop_frac: float = 0.3,
) -> str:
    return f"""
    WITH sp AS (
      SELECT {id_col} AS id, CAST(LENGTH({text_col}) AS BIGINT) AS doc_len,
             CAST(s AS BIGINT) AS cpos,
             (('0x' || substr(md5(substr({text_col}, CAST(s AS INTEGER), {span_len})), 1, 15))::BIGINT) AS h
      FROM (
        SELECT {id_col}, {text_col},
               unnest(generate_series(1, greatest(LENGTH({text_col}) - {span_len - 1}, 1), 1)) AS s
        FROM {table}
      )
    ), per_span AS (
      SELECT h, COUNT(DISTINCT id) AS nd FROM sp GROUP BY h
    ), flagged AS (
      SELECT sp.id, sp.doc_len, sp.cpos, (nd >= 2) AS dup
      FROM sp JOIN per_span USING (h)
    ), tot AS (
      SELECT id, doc_len, CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
      FROM flagged GROUP BY id, doc_len
    ), cov AS (
      SELECT id,
             GREATEST(0, iend - GREATEST(cpos - 1, COALESCE(prev_end, 0))) AS contrib
      FROM (
        SELECT id, cpos, iend,
               MAX(iend) OVER (PARTITION BY id ORDER BY cpos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        FROM (
          SELECT id, cpos, LEAST(cpos + {span_len - 1}, doc_len) AS iend
          FROM flagged WHERE dup
        )
      )
    ), dc AS (
      SELECT id, CAST(SUM(contrib) AS BIGINT) AS dup_chars FROM cov GROUP BY id
    )
    SELECT t.id AS {id_col}, t.doc_len, t.n_spans, t.n_dup_spans,
           CAST(COALESCE(dc.dup_chars, 0) AS BIGINT) AS dup_chars,
           ROUND(CAST(COALESCE(dc.dup_chars, 0) AS DOUBLE)
                 / CAST(t.doc_len AS DOUBLE) + 1e-9, 4) AS dup_char_frac,
           CAST(t.doc_len - COALESCE(dc.dup_chars, 0) AS BIGINT) AS kept_chars,
           CASE WHEN CAST(COALESCE(dc.dup_chars, 0) AS DOUBLE)
                     / CAST(t.doc_len AS DOUBLE) > {drop_frac} THEN 'drop'
                WHEN COALESCE(dc.dup_chars, 0) > 0 THEN 'clip'
                ELSE 'keep'
           END AS action
    FROM tot t LEFT JOIN dc ON t.id = dc.id
    """


def bpe_encode_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 6,
) -> DataFrame:
    """The ENCODER side of :func:`bpe_merges` — apply the trained merge
    table to every document and report per-doc token statistics
    ``(id, n_words, n_tokens, n_chars, tokens_per_word,
    compression_ratio)``: the pre-training readout that tells you what a
    vocab actually buys in sequence length (chars/token) before you
    commit to it. Completes the tokenizer-prep family: pair stats →
    trainer loop → encoding cost.

    Scale shape: identical words encode identically, so the expensive
    part — wrap + k chained literal `replace` calls (the trainer's own
    greedy scan, all-JVM) — runs over the DISTINCT-WORD relation only
    (Heaps'-law bounded, like the trainer), never per word instance.
    Instances collapse map-side to (doc, word, count), join the tiny
    per-word token-count relation on the word key, and the per-doc
    stats are weighted sums. Two combiner-backed shuffles on aggregated
    relations; per-token wire traffic never happens. Token count per
    word = surviving symbol count, read off the encoded string as
    (#open-sentinels) without materializing the array."""
    # r15: consume the trainer rows directly — wrapping them in a
    # DataFrame only to collect them back paid one extra job per call
    merges = [
        (pair_left, pair_right)
        for (_step, pair_left, pair_right, _m, _c)
        in _bpe_train(df, text_col, n_merges)
    ]
    toks = _TOKS.format(t=text_col)
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.expr(toks)).alias("w"),
    ).filter(F.col("w") != "")
    # map-side-combined instance collapse: (doc, word) -> count; pinned
    # because BOTH the vocab distinct and the stats join consume it —
    # unpinned, the corpus explode+groupBy would run twice
    doc_wc = words.groupBy("id", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).localCheckpoint(eager=False)
    vocab = doc_wc.select("w").distinct()
    wrapped = F.expr(
        f"concat(regexp_replace(w, '(.)', '{_BPE_S1}$1{_BPE_S2}'),"
        f" '{_BPE_S1}|{_BPE_S2}')"
    )
    enc = vocab.select("w", F.char_length("w").alias("wlen"), wrapped.alias("s"))
    for a, b in merges:
        pat = f"{_BPE_S1}{a}{_BPE_S2}{_BPE_S1}{b}{_BPE_S2}"
        rep = f"{_BPE_S1}{a}{b}{_BPE_S2}"
        enc = enc.withColumn("s", F.replace(F.col("s"), F.lit(pat), F.lit(rep)))
    # token count = number of symbols = count of open sentinels
    n_tok = (
        F.char_length("s")
        - F.char_length(F.replace(F.col("s"), F.lit(_BPE_S1), F.lit("")))
    ).cast("bigint")
    vocab_enc = enc.select("w", "wlen", n_tok.alias("wtok"))
    per_word = doc_wc.join(vocab_enc, "w")
    return (
        per_word.groupBy("id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("wtok")).cast("bigint").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("wlen")).cast("bigint").alias("n_chars"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_words",
            "n_tokens",
            "n_chars",
            r4(F.col("n_tokens").cast("double") / F.col("n_words").cast("double")).alias("tokens_per_word"),
            r4(F.col("n_chars").cast("double") / F.col("n_tokens").cast("double")).alias("chars_per_token"),
        )
    )


def bpe_encode_stats_sql(
    table: str,
    id_col: str,
    text_col: str,
    n_merges: int = 6,
) -> str:
    """DuckDB twin: the trainer CTE chain (re-used verbatim from
    :func:`bpe_merges_sql`) feeds k chained replace() applications —
    the merge table is a relation here instead of collected literals,
    applied in step order via ordered aggregation into a list that the
    per-word encode folds over with list_reduce... DuckDB's lambda
    support for that is awkward, so the twin UNROLLS the k replaces
    exactly like the Spark side: one scalar subquery per step."""
    toks = _TOKS_SQL.format(t=text_col)
    s1, s2 = _BPE_S1, _BPE_S2
    trainer = bpe_merges_sql(table, text_col, n_merges=n_merges)
    # per-step scalar subqueries against the trainer output
    reps = "s"
    for i in range(1, n_merges + 1):
        pat = (f"'{s1}' || m{i}.pair_left || '{s2}{s1}' || m{i}.pair_right || '{s2}'")
        rep = f"'{s1}' || m{i}.merged || '{s2}'"
        reps = f"replace({reps}, {pat}, {rep})"
    froms = ", ".join(
        f"(SELECT pair_left, pair_right, merged FROM merges WHERE step = {i}) m{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""
    WITH merges AS MATERIALIZED ({trainer}),
    doc_wc AS MATERIALIZED (
      SELECT id, w, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT {id_col} AS id, unnest({toks}) AS w FROM {table})
      WHERE w <> '' GROUP BY id, w
    ),
    wrapped AS (
      SELECT w, LENGTH(w) AS wlen,
             regexp_replace(w, '(.)', '{s1}\\1{s2}', 'g') || '{s1}|{s2}' AS s
      FROM (SELECT DISTINCT w FROM doc_wc)
    ),
    vocab_enc AS MATERIALIZED (
      SELECT w, wlen,
             LENGTH(s2) - LENGTH(replace(s2, '{s1}', '')) AS wtok
      FROM (SELECT w, wlen, {reps} AS s2
            FROM (SELECT w, wlen, s FROM wrapped), {froms})
    )
    SELECT d.id AS {id_col},
           CAST(SUM(d.cnt) AS BIGINT) AS n_words,
           CAST(SUM(d.cnt * v.wtok) AS BIGINT) AS n_tokens,
           CAST(SUM(d.cnt * v.wlen) AS BIGINT) AS n_chars,
           ROUND(SUM(d.cnt * v.wtok) * 1.0 / SUM(d.cnt) + 1e-9, 4) AS tokens_per_word,
           ROUND(SUM(d.cnt * v.wlen) * 1.0 / SUM(d.cnt * v.wtok) + 1e-9, 4) AS chars_per_token
    FROM doc_wc d JOIN vocab_enc v USING (w)
    GROUP BY d.id
    """


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM scoring (#49n)
# ---------------------------------------------------------------------------


def kn_bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    discount: float = 0.75,
    head_size: int = 4096,
) -> DataFrame:
    """Per-document mean log2 probability under an interpolated
    Kneser-Ney BIGRAM LM trained on the corpus itself (Kneser & Ney
    1995; Chen & Goodman 1999 interpolated form) — the step up from
    `unigram_logprob`'s CCNet-style filter: a unigram LM cannot see
    scrambled word ORDER, shuffled boilerplate, or template spam built
    from common words; a bigram LM with continuation-count smoothing
    can.

        P(w2|w1) = (c(w1w2) − d)/c(w1·)
                   + d · N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)

    (every observed bigram has c ≥ 1 > d, so the max(·,0) clip is
    implicit; scoring corpus = training corpus, so no OOV path).

    Scale shape (rewritten round 11 alongside :func:`unigram_logprob` —
    same VERDICT r10 constant-factor item, same two-pass design): the
    old plan exploded one row per bigram INSTANCE; the new plan keeps
    the instance stream inside Arrow/numpy and only Heaps-bounded
    relations ever cross into the JVM:

    1. **Count pass** — Arrow-batched ``mapInPandas`` tokenizes with
       C++ kernels, dictionary-encodes, builds bigrams as PACKED int64
       keys (idx1·|V| + idx2 — no per-pair Python tuples), masks
       cross-document adjacency via row indices, and emits per-batch
       (w1, w2, count) partials — distinct-bigram-sized. A groupBy sums
       them into c12; the interpolated-KN model relation is built from
       c12 in the JVM exactly as before (left/right continuation
       counts, one fixed-shape double expression).
    2. **Head codebook** — the ``head_size`` most frequent bigrams (the
       entire Zipf fan-out skew) collect as a bounded codebook of
       log2 P values (the documented collect exception).
    3. **Scoring pass** — a second Arrow pass rebuilds the packed keys,
       scores head bigrams in the map task via one per-unique-key
       lookup + per-doc bincount, and emits ONE row per document (with
       ≥ 2 tokens) plus rare tail residuals that join the model
       relation distributedly.

    No reducer ever sees a hot bigram (head instances fold map-side);
    the tail join's per-key fan-out is tiny by construction. Measured
    at sf10: 16.4 s → 7.5 s (DuckDB twin 6.0 s on the same box), with
    hash parity pinned at sf0.01/sf1 and by the planted tail-path test.

    Output: (id_col, n_bigrams bigint, mean_log2_prob double) for every
    document with ≥ 2 tokens."""
    import math

    id_t = df.schema[id_col].dataType.simpleString()

    def c12_gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            uniq, idx, parent = _arrow_token_arrays(pdf["__t"])
            if len(idx) < 2:
                continue
            nu = max(len(uniq), 1)
            mask = parent[:-1] == parent[1:]
            packed = idx[:-1][mask] * nu + idx[1:][mask]
            uk, uc = np.unique(packed, return_counts=True)
            yield pd.DataFrame(
                {
                    "w1": [uniq[int(j)] for j in (uk // nu)],
                    "w2": [uniq[int(j)] for j in (uk % nu)],
                    "cnt": uc.astype(np.int64),
                }
            )

    texts = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    partials = texts.select("__t").mapInPandas(
        c12_gen, "w1 string, w2 string, cnt long"
    )
    c12 = (
        partials.groupBy("w1", "w2")
        .agg(F.sum("cnt").alias("c12"))
        .localCheckpoint(eager=False)  # feeds c1/n1f, n1b, T, and the model
    )
    left = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    right = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    types = c12.agg(F.count(F.lit(1)).cast("double").alias("tt"))
    d = F.lit(float(discount))
    model = (
        c12.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            "c12",
            (
                (F.col("c12") - d) / F.col("c1")
                + d * F.col("n1f") / F.col("c1") * (F.col("n1b") / F.col("tt"))
            ).alias("p"),
        )
        .localCheckpoint(eager=False)  # feeds the head pick AND the tail join
    )
    head_rows = (
        model.orderBy(F.col("c12").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(head_size)
        .select("w1", "w2", "p")
        .collect()
    )
    head_map = {(r["w1"], r["w2"]): math.log2(r["p"]) for r in head_rows}

    def score_gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["__id"].to_numpy()
            uniq, idx, parent = _arrow_token_arrays(pdf["__t"])
            m = len(pdf)
            if len(idx) < 2:
                continue
            nu = max(len(uniq), 1)
            mask = parent[:-1] == parent[1:]
            pp = parent[:-1][mask]
            packed = idx[:-1][mask] * nu + idx[1:][mask]
            uk = np.unique(packed)
            lp_u = np.array(
                [
                    head_map.get((uniq[int(k // nu)], uniq[int(k % nu)]), np.nan)
                    for k in uk
                ],
                dtype=np.float64,
            )
            lp = lp_u[np.searchsorted(uk, packed)] if len(uk) else np.empty(0)
            n_bg = np.bincount(pp, minlength=m).astype(np.int64)
            head_sum = np.bincount(
                pp, weights=np.where(np.isnan(lp), 0.0, lp), minlength=m
            )
            has = n_bg > 0
            out_id = list(ids[has])
            out_w1 = [None] * int(has.sum())
            out_w2 = [None] * int(has.sum())
            out_cnt = list(n_bg[has])
            out_w = list(head_sum[has])
            tailm = np.isnan(lp)
            if tailm.any():
                key2 = pp[tailm] * (nu * nu) + packed[tailm]
                uk2, uc2 = np.unique(key2, return_counts=True)
                bg_key = uk2 % (nu * nu)
                out_id.extend(ids[(uk2 // (nu * nu)).astype(np.int64)])
                out_w1.extend(uniq[int(j)] for j in (bg_key // nu))
                out_w2.extend(uniq[int(j)] for j in (bg_key % nu))
                out_cnt.extend(uc2.astype(np.int64))
                out_w.extend([None] * len(uk2))
            yield pd.DataFrame(
                {
                    "id": out_id,
                    "w1": out_w1,
                    "w2": out_w2,
                    "cnt": out_cnt,
                    "w": out_w,
                }
            ).astype({"w": "float64", "cnt": "int64"})

    scored = texts.mapInPandas(
        score_gen, f"id {id_t}, w1 string, w2 string, cnt bigint, w double"
    ).localCheckpoint(eager=False)  # feeds the doc-partial AND tail readers
    docp = scored.filter(F.col("w1").isNull()).select("id", "cnt", "w")
    tail = (
        scored.filter(F.col("w1").isNotNull())
        .join(model.select("w1", "w2", "p"), ["w1", "w2"])
        .select(
            "id",
            F.lit(0).cast("bigint").alias("cnt"),
            (F.col("cnt").cast("double") * F.log2("p")).alias("w"),
        )
    )
    return (
        docp.unionByName(tail)
        .groupBy("id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            r4(F.sum("w") / F.sum("cnt")).alias("mean_log2_prob"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "mean_log2_prob")
    )


def kn_bigram_logprob_sql(
    table: str, id_col: str, text_col: str, discount: float = 0.75
) -> str:
    toks = _TOKS_SQL.format(t=text_col)
    d = float(discount)
    return f"""
    WITH base AS (
      SELECT {id_col} AS id, {toks} AS tk FROM {table}
      WHERE len({toks}) >= 2
    ), bg AS (
      SELECT id,
             unnest(tk[1:len(tk) - 1]) AS w1,
             unnest(tk[2:len(tk)]) AS w2
      FROM base
    ), c12 AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
    ), lft AS (
      SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1f FROM c12 GROUP BY 1
    ), rgt AS (
      SELECT w2, COUNT(*) AS n1b FROM c12 GROUP BY 1
    ), types AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS tt FROM c12
    ), model AS (
      SELECT c12.w1, c12.w2,
             (c12.c12 - {d}) / lft.c1
             + {d} * lft.n1f / lft.c1 * (rgt.n1b / types.tt) AS p
      FROM c12 JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN types
    )
    SELECT bg.id AS {id_col},
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(log2(p)) + 1e-9, 4) AS mean_log2_prob
    FROM bg JOIN model USING (w1, w2)
    GROUP BY bg.id
    """
