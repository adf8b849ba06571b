"""Declarative data-quality expectations runner (SURVEY §2 #11 widened).

The reference hard-codes one validation task (dag:365-407: row count,
null %, distinct stations, ranges). Production pipelines need the
generalized form — a RULE LIST evaluated in one pass, emitting a long
per-rule report that a scheduler can gate on.

Scale posture: every rule compiles into an aggregate expression over
ONE full-scan agg (single job, map-side partials, no per-rule scans);
the long-form explode happens on the 1-row result. Uniqueness rides the
same pass as count_distinct; at 100 TB swap it for
approx_count_distinct by flipping `exact` (sketch-mergeable, same
plan shape).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import r4


@dataclass(frozen=True)
class Rule:
    rule_id: str
    kind: str  # not_null | unique | accepted_values | in_range | row_count_min
    column: str
    threshold: float
    values: tuple[str, ...] = ()


DEFAULT_EVENT_RULES: tuple[Rule, ...] = (
    Rule("r01_value_not_null", "not_null", "value", 0.05),
    Rule("r02_event_id_unique", "unique", "event_id", 1.0),
    Rule("r03_known_types", "accepted_values", "event_type", 0.999,
         ("purchase", "view", "click", "error", "signup")),
    Rule("r04_value_in_range", "in_range", "value", 0.99),
    Rule("r05_min_rows", "row_count_min", "event_id", 500.0),
)

_RANGE_LO, _RANGE_HI = 0.0, 1000.0


def _observed_expr(rule: Rule):
    n = F.count(F.lit(1)).cast("double")
    c = F.col(rule.column)
    if rule.kind == "not_null":
        # observed = null fraction; passes when <= threshold
        return F.sum(c.isNull().cast("bigint")).cast("double") / n
    if rule.kind == "unique":
        # observed = distinct/total; passes when >= threshold
        return F.countDistinct(c).cast("double") / n
    if rule.kind == "accepted_values":
        return F.sum(c.isin(*rule.values).cast("bigint")).cast("double") / n
    if rule.kind == "in_range":
        return (
            F.sum(c.between(_RANGE_LO, _RANGE_HI).cast("bigint")).cast("double") / n
        )
    if rule.kind == "row_count_min":
        return n
    raise ValueError(f"unknown rule kind: {rule.kind}")


def _passes(rule: Rule, observed) -> F.Column:
    if rule.kind == "not_null":
        return observed <= rule.threshold
    return observed >= rule.threshold


def expectations_report(
    df: DataFrame, rules: tuple[Rule, ...] = DEFAULT_EVENT_RULES
) -> DataFrame:
    """Evaluate every rule in ONE aggregate pass; long-form report."""
    agg = df.agg(
        *[_observed_expr(r).alias(f"__obs_{i}") for i, r in enumerate(rules)]
    )
    reports = [
        F.struct(
            F.lit(r.rule_id).alias("rule_id"),
            F.lit(r.kind).alias("kind"),
            F.lit(r.column).alias("column_name"),
            r4(F.col(f"__obs_{i}")).alias("observed"),
            F.lit(float(r.threshold)).alias("threshold"),
            _passes(r, F.col(f"__obs_{i}")).cast("int").alias("passed"),
        )
        for i, r in enumerate(rules)
    ]
    return (
        agg.select(F.explode(F.array(*reports)).alias("r"))
        .select("r.*")
        .orderBy("rule_id")
    )


def expectations_sql(table: str, rules: tuple[Rule, ...] = DEFAULT_EVENT_RULES) -> str:
    obs_exprs, rows = [], []
    for i, r in enumerate(rules):
        n = "CAST(COUNT(*) AS DOUBLE)"
        c = r.column
        if r.kind == "not_null":
            e = f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / {n}"
            cmp = "<="
        elif r.kind == "unique":
            e = f"CAST(COUNT(DISTINCT {c}) AS DOUBLE) / {n}"
            cmp = ">="
        elif r.kind == "accepted_values":
            vals = ", ".join(f"'{v}'" for v in r.values)
            e = f"CAST(SUM(CASE WHEN {c} IN ({vals}) THEN 1 ELSE 0 END) AS DOUBLE) / {n}"
            cmp = ">="
        elif r.kind == "in_range":
            e = (
                f"CAST(SUM(CASE WHEN {c} BETWEEN {_RANGE_LO} AND {_RANGE_HI} "
                f"THEN 1 ELSE 0 END) AS DOUBLE) / {n}"
            )
            cmp = ">="
        elif r.kind == "row_count_min":
            e = n
            cmp = ">="
        else:
            raise ValueError(r.kind)
        obs_exprs.append(f"{e} AS obs_{i}")
        rows.append(
            f"SELECT '{r.rule_id}' AS rule_id, '{r.kind}' AS kind, "
            f"'{c}' AS column_name, ROUND(obs_{i} + 1e-9, 4) AS observed, "
            f"CAST({float(r.threshold)} AS DOUBLE) AS threshold, "
            f"CAST(CASE WHEN obs_{i} {cmp} {float(r.threshold)} THEN 1 ELSE 0 END AS INTEGER)"
            f" AS passed FROM agg"
        )
    return (
        "WITH agg AS (SELECT "
        + ", ".join(obs_exprs)
        + f" FROM {table}) "
        + " UNION ALL ".join(rows)
        + " ORDER BY rule_id"
    )


# ---------------------------------------------------------------------------
# Column profiler (describe-style, long form, one pass)
# ---------------------------------------------------------------------------

NUMERIC_PROFILE_COLS = ("value",)
STRING_PROFILE_COLS = ("event_type", "props")


def column_profile(
    df: DataFrame,
    numeric_cols: tuple[str, ...] = NUMERIC_PROFILE_COLS,
    string_cols: tuple[str, ...] = STRING_PROFILE_COLS,
) -> DataFrame:
    """Data-profiling report: per-column stats in long form
    (column_name, metric, value-as-double), ONE full-scan aggregate.

    Numeric: count / nulls / mean / stddev / min / max. String: nulls /
    distinct / min-len / max-len / empty count. All metrics ride one
    partial-agg pass — profiling 50 columns costs one scan, not 50
    (the trap in naive describe() loops)."""
    aggs: list = []
    fields: list[tuple[str, str]] = []

    def add(col: str, metric: str, expr) -> None:
        key = f"__{len(aggs)}"
        aggs.append(expr.cast("double").alias(key))
        fields.append((col, metric))

    for c in numeric_cols:
        col = F.col(c)
        add(c, "count", F.count(col))
        add(c, "nulls", F.sum(col.isNull().cast("bigint")))
        add(c, "mean", r4(F.avg(col)))
        add(c, "stddev", r4(F.stddev_samp(col)))
        add(c, "min", F.min(col))
        add(c, "max", F.max(col))
    for c in string_cols:
        col = F.col(c)
        add(c, "nulls", F.sum(col.isNull().cast("bigint")))
        add(c, "distinct", F.countDistinct(col))
        add(c, "min_len", F.min(F.length(col)))
        add(c, "max_len", F.max(F.length(col)))
        add(c, "empty", F.sum((col == "").cast("bigint")))
    agg = df.agg(*aggs)
    cells = [
        F.struct(
            F.lit(col).alias("column_name"),
            F.lit(metric).alias("metric"),
            F.col(f"__{i}").alias("value"),
        )
        for i, (col, metric) in enumerate(fields)
    ]
    return (
        agg.select(F.explode(F.array(*cells)).alias("c"))
        .select("c.*")
        .orderBy("column_name", "metric")
    )


def column_profile_sql(
    table: str,
    numeric_cols: tuple[str, ...] = NUMERIC_PROFILE_COLS,
    string_cols: tuple[str, ...] = STRING_PROFILE_COLS,
) -> str:
    obs, rows = [], []

    def add(col: str, metric: str, expr: str) -> None:
        key = f"m{len(obs)}"
        obs.append(f"CAST({expr} AS DOUBLE) AS {key}")
        rows.append(
            f"SELECT '{col}' AS column_name, '{metric}' AS metric, {key} AS value FROM agg"
        )

    for c in numeric_cols:
        add(c, "count", f"COUNT({c})")
        add(c, "nulls", f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)")
        add(c, "mean", f"ROUND(AVG({c}) + 1e-9, 4)")
        add(c, "stddev", f"ROUND(STDDEV_SAMP({c}) + 1e-9, 4)")
        add(c, "min", f"MIN({c})")
        add(c, "max", f"MAX({c})")
    for c in string_cols:
        add(c, "nulls", f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)")
        add(c, "distinct", f"COUNT(DISTINCT {c})")
        add(c, "min_len", f"MIN(LENGTH({c}))")
        add(c, "max_len", f"MAX(LENGTH({c}))")
        add(c, "empty", f"SUM(CASE WHEN {c} = '' THEN 1 ELSE 0 END)")
    return (
        "WITH agg AS (SELECT "
        + ", ".join(obs)
        + f" FROM {table}) "
        + " UNION ALL ".join(rows)
        + " ORDER BY column_name, metric"
    )


# ---------------------------------------------------------------------------
# #11e functional-dependency profiler
# ---------------------------------------------------------------------------


def fd_profile(df: DataFrame, candidates: list[tuple[str, str]]) -> DataFrame:
    """Functional-dependency discovery over candidate column pairs: for
    each (lhs → rhs) report |distinct lhs|, |distinct (lhs, rhs)| and
    whether the FD holds (they're equal) — the schema-inference /
    key-detection pass a profiler runs before modeling a new feed
    (TANE-style single-attribute check, restricted to non-null rows on
    both sides since NULL FD semantics are undefined).

    Plan: ONE full-scan aggregate computing every count-distinct
    together (Catalyst's expand handles multi-distinct in a single
    pass — the fact is read once however many candidates there are),
    then a stack() reshape of the 1-row result to long form. At 100 TB
    swap the exact count-distincts for approx_count_distinct and the
    check becomes probabilistic with the same plan shape."""
    aggs = []
    for lhs, rhs in candidates:
        # both counts restrict to rows where BOTH sides are non-null
        # (COUNT DISTINCT over multiple columns skips any-null rows;
        # the lhs count mirrors that via the when-guard) — otherwise an
        # lhs value appearing only with null rhs would fake a violation
        aggs.append(
            F.count_distinct(F.when(F.col(rhs).isNotNull(), F.col(lhs)))
            .cast("bigint")
            .alias(f"__d_{lhs}_{rhs}")
        )
        aggs.append(
            F.count_distinct(F.col(lhs), F.col(rhs))
            .cast("bigint")
            .alias(f"__p_{lhs}_{rhs}")
        )
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{lhs}', '{rhs}', __d_{lhs}_{rhs}, __p_{lhs}_{rhs}"
        for lhs, rhs in candidates
    )
    return one.select(
        F.expr(
            f"stack({len(candidates)}, {stack_args})"
            " as (lhs, rhs, n_distinct_lhs, n_distinct_pairs)"
        )
    ).select(
        "lhs",
        "rhs",
        "n_distinct_lhs",
        "n_distinct_pairs",
        (F.col("n_distinct_lhs") == F.col("n_distinct_pairs"))
        .cast("int")
        .alias("fd_holds"),
    )


def fd_profile_sql(table: str, candidates: list[tuple[str, str]]) -> str:
    parts = []
    for lhs, rhs in candidates:
        parts.append(f"""
    SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
           (SELECT CAST(COUNT(DISTINCT {lhs}) AS BIGINT) FROM {table}
            WHERE {rhs} IS NOT NULL) AS n_distinct_lhs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT DISTINCT {lhs}, {rhs} FROM {table}
               WHERE {lhs} IS NOT NULL AND {rhs} IS NOT NULL)) AS n_distinct_pairs""")
    union = "\n    UNION ALL".join(parts)
    return f"""
    SELECT lhs, rhs, n_distinct_lhs, n_distinct_pairs,
           CAST(CASE WHEN n_distinct_lhs = n_distinct_pairs THEN 1 ELSE 0 END
                AS INTEGER) AS fd_holds
    FROM ({union})
    """


# ---------------------------------------------------------------------------
# #11f inclusion-dependency (foreign-key) profiler
# ---------------------------------------------------------------------------


def inclusion_profile(
    candidates: list[tuple[str, DataFrame, str, str, DataFrame, str]],
) -> DataFrame:
    """Inclusion-dependency discovery (the FK half of profiling, next to
    :func:`fd_profile`'s key half): for each candidate
    ``child.col ⊆ parent.col`` report the child's distinct-value count,
    how many of those values are missing from the parent (orphans), and
    whether the FK holds. Candidates are (child_name, child_df,
    child_col, parent_name, parent_df, parent_col).

    Plan per candidate: the child reduces to its distinct key set FIRST
    (map-side-combined groupBy — the shuffle carries distinct keys, not
    rows), then ONE LEFT OUTER join against the parent's marked
    distinct keys feeds a single aggregate computing both the distinct
    count and the orphan count — each table is scanned exactly once
    per candidate; dimension-sized parents broadcast under AQE."""
    parts = []
    for child_name, child_df, ccol, parent_name, parent_df, pcol in candidates:
        ckeys = (
            child_df.select(F.col(ccol).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .distinct()
        )
        pkeys = (
            parent_df.select(F.col(pcol).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .distinct()
            .withColumn("__m", F.lit(1))
        )
        parts.append(
            ckeys.join(pkeys, "__k", "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_child_distinct"),
                F.coalesce(
                    F.sum(F.col("__m").isNull().cast("bigint")), F.lit(0)
                )
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(
                F.lit(f"{child_name}.{ccol}").alias("child"),
                F.lit(f"{parent_name}.{pcol}").alias("parent"),
                "n_child_distinct",
                "n_orphans",
                (F.col("n_orphans") == 0).cast("int").alias("fk_holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def inclusion_profile_sql(
    candidates: list[tuple[str, str, str, str]],
) -> str:
    """Oracle twin over view names: (child_table, child_col,
    parent_table, parent_col)."""
    parts = []
    for ct, cc, pt, pc in candidates:
        parts.append(f"""
    SELECT '{ct}.{cc}' AS child, '{pt}.{pc}' AS parent,
           (SELECT CAST(COUNT(DISTINCT {cc}) AS BIGINT) FROM {ct}
            WHERE {cc} IS NOT NULL) AS n_child_distinct,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT DISTINCT {cc} AS k FROM {ct} WHERE {cc} IS NOT NULL)
            WHERE k NOT IN (SELECT {pc} FROM {pt} WHERE {pc} IS NOT NULL))
           AS n_orphans""")
    union = "\n    UNION ALL".join(parts)
    return f"""
    SELECT child, parent, n_child_distinct, n_orphans,
           CAST(CASE WHEN n_orphans = 0 THEN 1 ELSE 0 END AS INTEGER) AS fk_holds
    FROM ({union})
    """


# ---------------------------------------------------------------------------
# #11g shuffle/join-key skew profiler
# ---------------------------------------------------------------------------


def skew_report(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Heavy-hitter profile of a prospective shuffle/join key: the top-N
    keys by row count with their share of the table and their multiple
    of the mean per-key count — the diagnostic you run BEFORE deciding
    whether a join needs salting, AQE skew splitting, or a broadcast
    (every skew guard in the dedup family was tuned from exactly this
    readout). ``skew_vs_avg`` ≫ 1 on the top key = a straggler reducer
    at scale.

    Plan: one map-side-combined groupBy (the shuffle carries distinct
    keys, not rows), then a 1-row stats aggregate over the counts and a
    TakeOrdered(top_n) — the grouped relation is lazily checkpointed so
    the two consumers share one shuffle. The final rank window runs on
    top_n rows. Nothing here is table-sized after the first combine.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint(eager=False)
    stats = counts.agg(
        F.sum("cnt").cast("double").alias("__total"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.avg("cnt").alias("__avg"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(top_n)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            F.row_number().over(w).cast("bigint").alias("rank"),
            "key",
            F.col("cnt").cast("bigint").alias("cnt"),
            "n_keys",
            r4(F.lit(100.0) * F.col("cnt") / F.col("__total")).alias("share_pct"),
            r4(F.col("cnt") / F.col("__avg")).alias("skew_vs_avg"),
        )
    )


def skew_report_sql(table: str, key_col: str, top_n: int = 20) -> str:
    return f"""
    WITH c AS (
      SELECT {key_col} AS key, COUNT(*) AS cnt FROM {table} GROUP BY 1
    ), s AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             AVG(cnt) AS avgc
      FROM c
    ), t AS (
      SELECT key, cnt FROM c ORDER BY cnt DESC, key LIMIT {top_n}
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS BIGINT) AS rank,
           key, CAST(cnt AS BIGINT) AS cnt, n_keys,
           ROUND(100.0 * cnt / total + 1e-9, 4) AS share_pct,
           ROUND(cnt / avgc + 1e-9, 4) AS skew_vs_avg
    FROM t CROSS JOIN s
    """


def benford_test(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution of a positive numeric column
    against Benford's law, with the per-digit chi-square contribution —
    the classic fraud / synthetic-data / unit-mixup screen (a price or
    amount column that drifts off Benford usually means duplicated rows,
    truncation, or a bad currency conversion upstream).

    ``digit d`` share under Benford = log10(1 + 1/d); ``chi2_term`` =
    (n_d − N·p_d)² / (N·p_d) so callers can sum the 9 rows against the
    χ²(8) critical value.

    Plan: one map-side-combined 9-group aggregate over the scan (the
    shuffle carries ≤ 9 rows per task) and a broadcast of the 1-row
    total — nothing downstream of the combine is table-sized, so the
    operator is scan-bound at any SF.
    """
    digit = F.floor(
        F.col(value_col) / F.pow(F.lit(10.0), F.floor(F.log10(value_col)))
    ).cast("bigint")
    # digit BETWEEN 1 AND 9 (not just value > 0): NaN passes `> 0` in
    # both engines and +Inf passes trivially, and either lands as a
    # NULL/0/10 digit row with ±Inf or NULL exp_share — degenerate rows
    # the two engines then disagree on (VERDICT r8 #5b). The digit-range
    # guard drops every non-finite input on both sides identically.
    counts = (
        df.where(F.col(value_col) > 0)
        .where(digit.between(1, 9))
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    total = counts.agg(F.sum("n").cast("double").alias("__N"))
    exp_share = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            r4(F.col("n") / F.col("__N")).alias("obs_share"),
            r4(exp_share).alias("exp_share"),
            r4(
                F.pow(F.col("n") - F.col("__N") * exp_share, F.lit(2.0))
                / (F.col("__N") * exp_share)
            ).alias("chi2_term"),
        )
    )


def benford_test_sql(table: str, value_col: str) -> str:
    return f"""
    WITH c AS (
      -- TRY_CAST, not CAST: a NaN/Inf value reaches the digit expression
      -- (NaN > 0 is TRUE in DuckDB) and CAST(NaN AS BIGINT) would abort
      -- the whole query; TRY_CAST yields NULL, which the BETWEEN guard
      -- then drops — matching Spark's NaN-cast-to-NULL semantics.
      SELECT TRY_CAST(FLOOR({value_col} / POWER(10.0, FLOOR(LOG10({value_col}))))
                  AS BIGINT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM {table} WHERE {value_col} > 0
        AND TRY_CAST(FLOOR({value_col} / POWER(10.0, FLOOR(LOG10({value_col}))))
                 AS BIGINT) BETWEEN 1 AND 9
      GROUP BY 1
    ), t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM c)
    SELECT digit, n,
           ROUND(n / tot + 1e-9, 4) AS obs_share,
           ROUND(LOG10(1.0 + 1.0 / digit) + 1e-9, 4) AS exp_share,
           ROUND(POWER(n - tot * LOG10(1.0 + 1.0 / digit), 2)
                 / (tot * LOG10(1.0 + 1.0 / digit)) + 1e-9, 4) AS chi2_term
    FROM c CROSS JOIN t
    """
