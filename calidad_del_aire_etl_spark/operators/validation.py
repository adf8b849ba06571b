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
