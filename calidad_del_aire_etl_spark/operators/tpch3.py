"""TPC-H query-shape batch 4 — the remaining canonical shapes.

Adaptations to the trimmed testdata schema are explicit and mirrored
exactly in the DuckDB twins:

- Q13 : customer order-count distribution (exact — LEFT OUTER + double
        groupBy; the comment filter has no analog column and is omitted)
- Q21 : suppliers who kept multi-supplier orders waiting. "Late" reuses
        the Q4 convention (shipped > 60 days after order date) since
        receipt/commit dates are absent; "sole late supplier on a
        multi-supplier finalized order" is the canonical shape.
- Q9  : product-type profit by nation × year. ps_supplycost is absent;
        the stand-in is 60 % of p_retailprice (deterministic, both
        engines), keeping the revenue-minus-cost fact math.
- Q11 : important stock value per part vs a scalar fraction of total
        (partsupp value stands in as supplied-revenue per part from the
        nation's suppliers).
- Q20 : suppliers of name-prefixed parts whose shipped volume in a year
        exceeds a threshold (availqty absent; shipped-quantity share is
        the stand-in).
- Q2  : min-cost supplier per part in a region. The part-supplier
        relation is lineitem's distinct (partkey, suppkey) (same
        stand-in as Q16); pseudo supply cost is deterministic in
        (retailprice, suppkey) so the argmin-per-part shape survives.

All dims broadcast; fact-fact joins shuffle on their keys; money in
DECIMAL (order-independent sums) rounded via r4 at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import r4

DEC = "decimal(18,2)"


def _d(col: str):
    return F.col(col).cast(DEC)


def _rev():
    """Revenue in exact int64 10⁻⁴-dollar units (see general._rev4 —
    the q1/q9 BigDecimal finding applied family-wide)."""
    from .general import _rev4

    return _rev4()


# --- Q13: customer order-count distribution --------------------------------

def q13_custdist(customer: DataFrame, orders: DataFrame) -> DataFrame:
    per_cust = (
        customer.join(
            orders.select("o_custkey", "o_orderkey"),
            customer.c_custkey == orders.o_custkey,
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- Q21: suppliers who kept orders waiting --------------------------------

def q21_waiting(
    supplier: DataFrame, lineitem: DataFrame, orders: DataFrame, late_days: int = 60
) -> DataFrame:
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    o = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    flagged = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), late_days))
        .cast("int")
        .alias("is_late"),
    )
    # `flagged` feeds both the per-order supplier counts and the culprit
    # scan — without materialization the lineitem x orders join (the
    # query's only fact shuffle) executes twice. Measured at sf0.1
    # (interleaved A/B, quiet window): 1.58 s -> 1.31 s; at scale this
    # halves the fact shuffle count, which dominates q21. Non-reliable
    # blocks: losing an executor that holds them fails the job instead
    # of recomputing — prefer reliable checkpoint() on fault-prone
    # fleets.
    flagged = flagged.localCheckpoint(eager=False)
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    # the sole late supplier on a multi-supplier finalized order
    culprits = (
        flagged.filter(F.col("is_late") == 1)
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.filter(
                (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
    )
    return (
        culprits.join(F.broadcast(supplier), culprits.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
    )


def q21_sql(late_days: int = 60) -> str:
    """Oracle twin of :func:`q21_waiting`. Parameterized on ``late_days``
    so a caller passing a non-default lateness keeps parity with the
    Spark side (ADVICE r2: the old constant SQL silently diverged)."""
    return f"""
WITH flagged AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {int(late_days)} DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp
  FROM flagged GROUP BY 1
), culprits AS (
  SELECT DISTINCT f.l_orderkey, f.l_suppkey
  FROM flagged f JOIN per_order p ON f.l_orderkey = p.l_orderkey
  WHERE f.is_late = 1 AND p.n_supp >= 2 AND p.n_late_supp = 1
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM culprits c JOIN supplier s ON c.l_suppkey = s.s_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC
"""


Q21_SQL = q21_sql()  # default-parameter twin kept for the registry


# --- Q9: product-type profit by nation and year ----------------------------

def _cents(col: str):
    """Double dollars → bigint cents (HALF_UP, identical to the
    DECIMAL(18,2) cast for any double within ~1 ulp of a 2-decimal
    value, which is how the generator writes every money column).

    floor(x·100 + 0.5), NOT F.round: Spark's Round on DoubleType goes
    through BigDecimal.setScale — one heap allocation per element,
    measured GC-bound at sf10 with 4 casts/row — while floor of a
    double stays inside codegen'd double math. Equal to HALF_UP for
    every non-negative value (money columns are non-negative here)."""
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("bigint")


def q9_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_token: str = "a",
) -> DataFrame:
    """Fact math in bigint cents, not DECIMAL (round-5 sf1 weak entry:
    4.09x its twin). DECIMAL(28,6) multiply/sum runs on Spark's Decimal
    slow path; the same values are EXACT in int64 10^-4-dollar units —
    rev = ext_c*(100-disc_c), cost*qty = cost_c*qty_c — so the whole
    per-row chain stays in codegen'd long arithmetic, value-identical to
    the DuckDB twin's decimal pipeline (175/175 rows hash-matched at
    sf1). Group sums stay exact up to |sum| < 9.2e14 dollars per
    (nation, year) — ~7x above a 100 TB TPC-H's largest group — and the
    final long→double cast is exact below 2^53 before the shared r4.

    Join shape: dims broadcast; the one fact-fact join (lineitem ⨝
    orders) is hinted SHUFFLE_HASH with orders as build side — both
    sides still shuffle on the key (scale-safe, no broadcast of a
    fact), but each task builds a hash table over its orders partition
    instead of sorting both sides, the same choice a vectorized engine
    makes. The shuffle row is kept THIN: (l_orderkey, s_nationkey int,
    a4 long) — the nation NAME never rides the exchange; it is
    broadcast-joined onto the ~nations×years aggregate AFTER the final
    groupBy. Measured at sf1: 2.7 s (DECIMAL + SMJ + name-through-
    shuffle) → 1.8 s (cents) → 1.3 s (thin shuffle).
    """
    p = part.filter(F.col("p_name").contains(name_token)).select(
        "p_partkey",
        # CAST(0.6*retail AS DECIMAL(18,2)) in cents: (60*retail_c) is a
        # multiple of 20, +50 then truncating-divide by 100 is HALF_UP
        # (never a tie); subtracting pmod first keeps the double
        # division exact (numerator a multiple of 100, magnitude << 2^53)
        ((lambda x: (x - F.pmod(x, 100)) / 100)(_cents("p_retailprice") * 60 + 50))
        .cast("bigint")
        .alias("cost_c"),
    )
    amount4 = (
        _cents("l_extendedprice") * (100 - _cents("l_discount"))
        - F.col("cost_c") * _cents("l_quantity")
    )
    thin = (
        lineitem.join(F.broadcast(p), lineitem.l_partkey == p.p_partkey)
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("l_orderkey", F.col("s_nationkey").alias("nk"), amount4.alias("a4"))
    )
    agg = (
        thin.join(
            orders.select(
                "o_orderkey", F.year("o_orderdate").cast("int").alias("o_year")
            ).hint("SHUFFLE_HASH"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("nk", "o_year")
        .agg(F.sum("a4").alias("a4_sum"))
    )
    return (
        agg.join(F.broadcast(nation), F.col("nk") == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "o_year",
            r4(F.col("a4_sum").cast("double") / 10000.0).alias("sum_profit"),
        )
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


def q9_sql(name_token: str = "a") -> str:
    return f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       ROUND(CAST(SUM(
         CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
           AS DECIMAL(28,6))
         - CAST(CAST(CAST(0.6 AS DECIMAL(18,2)) * CAST(p.p_retailprice AS DECIMAL(18,2)) AS DECIMAL(18,2))
                * CAST(l.l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,6))
       ) AS DOUBLE) + 1e-9, 4) AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%{name_token}%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
ORDER BY nation ASC, o_year DESC
"""


# --- Q11: important stock value per part -----------------------------------

def q11_important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str,
    fraction: float = 0.001,
) -> DataFrame:
    nat_supp = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .filter(F.col("n_name") == nation_name)
        .select("s_suppkey")
    )
    li = lineitem.join(F.broadcast(nat_supp), lineitem.l_suppkey == nat_supp.s_suppkey)
    # fact-side sum in exact int64 10⁻⁴-dollar units (the q1/q9
    # BigDecimal finding); the DECIMAL re-scale and the exact
    # threshold comparison run on the ~|parts|-row aggregate only,
    # value-identical to the twin's all-DECIMAL pipeline
    per_part = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("__v4"))
    vdec = (F.col("__v4").cast("decimal(38,6)") / F.lit(10000)).alias("value_dec")
    per_part = per_part.select("l_partkey", vdec)
    total = per_part.agg(
        (F.sum("value_dec") * F.lit(fraction).cast("decimal(18,6)")).alias("thresh")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("thresh"))
        .select(
            F.col("l_partkey").cast("bigint").alias("p_partkey"),
            r4(F.col("value_dec").cast("double")).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("p_partkey").asc())
    )


def q11_sql(nation_name: str, fraction: float = 0.001) -> str:
    rev = (
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
        " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
        " AS DECIMAL(28,6))"
    )
    return f"""
WITH nat_li AS (
  SELECT l.l_partkey, {rev} AS rev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = '{nation_name}'
), per_part AS (
  SELECT l_partkey, SUM(rev) AS value_dec FROM nat_li GROUP BY 1
)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
       ROUND(CAST(value_dec AS DOUBLE) + 1e-9, 4) AS part_value
FROM per_part
WHERE value_dec > (SELECT SUM(value_dec) * CAST({fraction} AS DECIMAL(18,6)) FROM per_part)
ORDER BY part_value DESC, p_partkey ASC
"""


# --- Q20: suppliers with excess shipped volume of prefixed parts -----------

def q20_excess_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    nation_name: str,
    prefix: str,
    year: int,
    min_qty: float,
) -> DataFrame:
    p = part.filter(F.col("p_name").startswith(prefix)).select("p_partkey")
    li = lineitem.filter(F.year("l_shipdate") == year).join(
        F.broadcast(p), lineitem.l_partkey == p.p_partkey
    )
    vol = li.groupBy("l_suppkey").agg(
        F.sum(_d("l_quantity")).cast("double").alias("qty")
    )
    heavy = vol.filter(F.col("qty") > min_qty).select("l_suppkey")
    return (
        supplier.join(F.broadcast(heavy), supplier.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .filter(F.col("n_name") == nation_name)
        .select("s_name", r4(_d("s_acctbal").cast("double")).alias("s_acctbal"))
        .orderBy("s_name")
    )


def q20_sql(nation_name: str, prefix: str, year: int, min_qty: float) -> str:
    return f"""
SELECT s.s_name,
       ROUND(CAST(CAST(s.s_acctbal AS DECIMAL(18,2)) AS DOUBLE) + 1e-9, 4) AS s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = '{nation_name}'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '{prefix}%' AND year(l.l_shipdate) = {year}
    GROUP BY l.l_suppkey
    HAVING CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) > {min_qty}
  )
ORDER BY s.s_name
"""


# --- Q2: min-cost supplier per part in a region ----------------------------

def _pseudo_cost():
    """Deterministic stand-in for ps_supplycost: retailprice scaled by a
    supplier-keyed factor in [0.50, 0.99] — both engines compute the
    identical DECIMAL."""
    factor = (
        F.lit(0.5).cast("decimal(18,6)")
        + (F.pmod(F.col("s_suppkey"), F.lit(50)).cast("decimal(18,6)")
           / F.lit(100).cast("decimal(18,6)"))
    )
    return (_d("p_retailprice") * factor).cast("decimal(18,6)")


def q2_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
    region_name: str,
    size_mod: int = 5,
) -> DataFrame:
    ps = lineitem.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    p = part.filter(F.pmod(F.col("p_size"), F.lit(size_mod)) == 0).select(
        "p_partkey", "p_retailprice"
    )
    s = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .filter(F.col("r_name") == region_name)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    j = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .withColumn("cost", _pseudo_cost())
    )
    w = Window.partitionBy("ps_partkey").orderBy(
        F.col("cost").asc(), F.col("s_suppkey").asc()
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("ps_partkey").cast("bigint").alias("p_partkey"),
            "s_name",
            F.col("n_name").alias("nation"),
            r4(_d("s_acctbal").cast("double")).alias("s_acctbal"),
            r4(F.col("cost").cast("double")).alias("supply_cost"),
        )
        .orderBy(F.col("supply_cost").desc(), F.col("p_partkey").asc())
    )


def q2_sql(region_name: str, size_mod: int = 5) -> str:
    cost = (
        "CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) * "
        "(CAST(0.5 AS DECIMAL(18,6)) + CAST(s.s_suppkey % 50 AS DECIMAL(18,6))"
        " / CAST(100 AS DECIMAL(18,6))) AS DECIMAL(18,6))"
    )
    return f"""
WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem),
j AS (
  SELECT ps.ps_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name, {cost} AS cost
  FROM ps
  JOIN part p ON ps.ps_partkey = p.p_partkey AND p.p_size % {size_mod} = 0
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{region_name}'
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY ps_partkey ORDER BY cost ASC, s_suppkey ASC) AS rk
  FROM j
)
SELECT CAST(ps_partkey AS BIGINT) AS p_partkey, s_name, n_name AS nation,
       ROUND(CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) + 1e-9, 4) AS s_acctbal,
       ROUND(CAST(cost AS DOUBLE) + 1e-9, 4) AS supply_cost
FROM ranked WHERE rk = 1
ORDER BY supply_cost DESC, p_partkey ASC
"""
