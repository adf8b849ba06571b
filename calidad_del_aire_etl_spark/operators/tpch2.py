"""TPC-H query-shape batch 3 (SURVEY §2 general-analytics widening).

The remaining canonical TPC-H shapes, adapted to the trimmed testdata
schema (no partsupp / shipmode / commitdate — see TESTDATA.md):

- Q4  : EXISTS semi-join count (late-shipment orders by priority)
- Q7  : nation-pair volume by year (fact joins, dims broadcast)
- Q8  : market-share ratio by year (conditional agg over star join)
- Q12 : two-way conditional CASE aggregation after fact-fact join
- Q14 : promo revenue ratio (conditional sum / total sum, one scan)
- Q15 : argmax supplier by window-period revenue (scalar-max broadcast)
- Q16 : distinct-count by part attrs with broadcast anti-join exclusion
- Q17 : correlated per-part average, small-quantity revenue
- Q18 : large-order HAVING filter joined back to dimensions
- Q19 : disjunctive OR-of-ANDs predicate pushdown
- Q22 : scalar-subquery threshold + anti-join on recent activity

Money math in DECIMAL (order-independent distributed sums, see
general.py); final doubles rounded via r4 on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import r4

DEC = "decimal(18,2)"


def _d(col: str):
    return F.col(col).cast(DEC)


def _rev():
    """extendedprice·(1−discount) in EXACT int64 10⁻⁴-dollar units —
    the q1/q9 BigDecimal finding applied family-wide: DECIMAL
    multiply/sum runs interpreted, floor-cents stays in codegen'd
    long arithmetic with identical values (HALF_UP for non-negative
    money). Final projections re-scale via _undec (one decimal
    division + double cast on the few output rows, matching the
    twins' single DECIMAL → double rounding)."""
    from .general import _rev4

    return _rev4()


def _undec(col: str, unit: int = 10000):
    from .general import _undec as _u

    return _u(col, unit)


# ---------------------------------------------------------------------------
# Q4: order-priority checking via EXISTS (left-semi join).
# ---------------------------------------------------------------------------


def q4_priority(orders: DataFrame, lineitem: DataFrame, date_lo: str, date_hi: str) -> DataFrame:
    """TPC-H Q4 shape: how many orders in a quarter had at least one
    line item shipped >60 days after the order date.

    Plan: both sides pruned to (key, date) columns before the LEFT SEMI
    join — a semi-join never amplifies rows, and the payload never
    shuffles. The priority count is a tiny 5-group aggregate after."""
    o = orders.filter(
        (F.col("o_orderdate") >= date_lo) & (F.col("o_orderdate") < date_hi)
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(F.col("o_orderdate"), 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{date_lo} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{date_hi} 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations, by year.
# ---------------------------------------------------------------------------


def q7_volume(
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation_a: str,
    nation_b: str,
) -> DataFrame:
    """TPC-H Q7 shape: revenue flowing supplier-nation → customer-nation
    for the two (a,b)/(b,a) pairs, grouped by ship year.

    Plan: nation is 25 rows → broadcast into supplier and customer,
    which pre-filters BOTH fact-join inputs to 2/25 of the keys before
    any shuffle. lineitem↔orders is the one big shuffle; supplier and
    customer joins stay broadcast at bench scale and degrade to AQE
    shuffle joins at 100 TB without a code change."""
    n2 = nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        "n_nationkey", "n_name"
    )
    supp = supplier.join(
        F.broadcast(n2), supplier.s_nationkey == n2.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(n2), customer.c_nationkey == n2.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    ords = orders.select("o_orderkey", "o_custkey").join(
        cust, F.col("o_custkey") == cust.c_custkey
    )
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("int").alias("l_year"),
        _rev().alias("__rev"),
    ).join(supp, F.col("l_suppkey") == supp.s_suppkey)
    joined = li.join(ords, li.l_orderkey == ords.o_orderkey).filter(
        F.col("supp_nation") != F.col("cust_nation")
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("__rev").alias("__r"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            r4(_undec("__r")).alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       ROUND(CAST(SUM(rev) AS DOUBLE) + 1e-9, 4) AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  WHERE ns.n_name IN ('{a}', '{b}') AND nc.n_name IN ('{a}', '{b}')
    AND ns.n_name <> nc.n_name
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8: national market share within a region for one part type.
# ---------------------------------------------------------------------------


def q8_market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    region_name: str,
    target_nation: str,
    p_type: str,
) -> DataFrame:
    """TPC-H Q8 shape: share of a region's `p_type` purchase volume
    supplied by one nation, per order year.

    Plan: part (filtered to one type) broadcasts into lineitem — that is
    the most selective pre-shuffle filter, so the big lineitem↔orders
    shuffle moves only matching rows. The share is a conditional-sum /
    total-sum pair in ONE aggregate pass (no second scan, no self-join)."""
    rnk = (
        region.filter(F.col("r_name") == region_name)
        .join(nation, F.col("r_regionkey") == F.col("n_regionkey"))
        .select("n_nationkey")
    )
    cust = customer.join(
        F.broadcast(rnk), customer.c_nationkey == rnk.n_nationkey
    ).select("c_custkey")
    pt = part.filter(F.col("p_type") == p_type).select("p_partkey")
    supp_n = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    li = (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey", _rev().alias("__rev"))
        .join(F.broadcast(pt), F.col("l_partkey") == pt.p_partkey)
        .join(supp_n, F.col("l_suppkey") == supp_n.s_suppkey)
    )
    ords = orders.select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("int").alias("o_year")
    ).join(cust, F.col("o_custkey") == cust.c_custkey)
    joined = li.join(ords, li.l_orderkey == ords.o_orderkey)
    target = F.when(F.col("supp_nation") == target_nation, F.col("__rev")).otherwise(
        F.lit(0).cast("bigint")
    )
    agg = joined.groupBy("o_year").agg(
        F.sum(target).alias("__t"), F.sum("__rev").alias("__a")
    )
    # _undec on BOTH operands replicates the twin's exact
    # DECIMAL-sum → double conversions before the one double division
    return agg.select(
        "o_year",
        r4(_undec("__t") / _undec("__a")).alias("mkt_share"),
    ).orderBy("o_year")


Q8_SQL = """
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = '{target}' THEN rev ELSE 0 END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE) + 1e-9, 4) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
         ns.n_name AS supp_nation,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '{ptype}'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = nc.n_regionkey AND r.r_name = '{region}'
)
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q12: priority counts by line status after a fact-fact join.
# ---------------------------------------------------------------------------


def q12_priority_by_status(
    orders: DataFrame, lineitem: DataFrame, date_lo: str, date_hi: str
) -> DataFrame:
    """TPC-H Q12 shape (shipmode→linestatus): per line status in a ship
    window, how many lines belong to critical- vs normal-priority orders.

    Plan: lineitem pruned to (key, status) + pushed-down date range;
    orders pruned to (key, priority). One shuffle join, then a 2-group
    CASE aggregate — the canonical conditional-aggregation pattern."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= date_lo) & (F.col("l_shipdate") < date_hi)
    ).select("l_orderkey", "l_linestatus")
    o = orders.select("o_orderkey", "o_orderpriority")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{date_lo} 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '{date_hi} 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q14: promo revenue percentage for one ship month-range.
# ---------------------------------------------------------------------------


def q14_promo_share(
    lineitem: DataFrame, part: DataFrame, date_lo: str, date_hi: str
) -> DataFrame:
    """TPC-H Q14 shape: % of window revenue from PROMO-type parts.

    Plan: date-pruned lineitem scan, part broadcast, single aggregate
    producing both the conditional and total sums — ratio computed on
    the one-row result. Zero extra passes."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= date_lo) & (F.col("l_shipdate") < date_hi)
    ).select("l_partkey", _rev().alias("__rev"))
    pt = part.select("p_partkey", "p_type")
    joined = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", F.col("__rev")).otherwise(
        F.lit(0).cast("bigint")
    )
    agg = joined.agg(F.sum(promo).alias("__p"), F.sum("__rev").alias("__a"))
    return agg.select(
        r4(F.lit(100.0) * _undec("__p") / _undec("__a")).alias(
            "promo_revenue_pct"
        )
    )


Q14_SQL = """
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE) + 1e-9, 4) AS promo_revenue_pct
FROM (
  SELECT p.p_type,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{date_lo} 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '{date_hi} 00:00:00'
)
"""


# ---------------------------------------------------------------------------
# Q15: top supplier(s) by revenue in a window period.
# ---------------------------------------------------------------------------


def q15_top_supplier(
    supplier: DataFrame, lineitem: DataFrame, date_lo: str, date_hi: str
) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the max period revenue.

    Plan: one partial-agg groupBy(suppkey) over the pruned scan, then
    the scalar max is cross-joined back as a broadcast (1 row) — NOT a
    global window, which would funnel every supplier through a single
    partition at scale."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= date_lo) & (F.col("l_shipdate") < date_hi)
    ).select("l_suppkey", _rev().alias("__rev"))
    rev = li.groupBy("l_suppkey").agg(F.sum("__rev").alias("__total"))
    mx = rev.agg(F.max("__total").alias("__mx"))
    # bigint max-equality is exact (the DECIMAL form compared decimals;
    # int64 units make the scalar-max argmax tie semantics trivially so)
    top = rev.join(F.broadcast(mx), rev.__total == mx.__mx).select(
        "l_suppkey", r4(_undec("__total")).alias("total_revenue")
    )
    s = supplier.select("s_suppkey", "s_name")
    return (
        top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{date_lo} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{date_hi} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, ROUND(CAST(r.total AS DOUBLE) + 1e-9, 4) AS total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total = (SELECT MAX(total) FROM rev)
ORDER BY s.s_suppkey
"""


# ---------------------------------------------------------------------------
# Q16: distinct-supplier counts per part attribute, minus an exclusion set.
# ---------------------------------------------------------------------------


def q16_supplier_counts(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    brand_not: str,
    type_not: str,
    sizes: list[int],
) -> DataFrame:
    """TPC-H Q16 shape (lineitem stands in for partsupp): distinct
    suppliers able to supply each (brand, type, size) bucket, excluding
    a supplier blocklist.

    Plan: the part-supplier relation is `lineitem.select(partkey,
    suppkey).distinct()` — a map-side-combined dedup. The blocklist
    anti-join broadcasts (suppliers with '9' in the key padding);
    count_distinct rides the same shuffle as the groupBy."""
    ps = lineitem.select("l_partkey", "l_suppkey").distinct()
    bad = supplier.filter(F.col("s_name").like("%99%")).select("s_suppkey")
    ps = ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
    pt = part.filter(
        (F.col("p_brand") != brand_not)
        & (F.col("p_type") != type_not)
        & F.col("p_size").isin([int(s) for s in sizes])
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    joined = ps.join(F.broadcast(pt), ps.l_partkey == pt.p_partkey)
    return (
        joined.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def q16_sql(brand_not: str, type_not: str, sizes: list[int]) -> str:
    size_list = ", ".join(str(int(s)) for s in sizes)
    return f"""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> '{brand_not}' AND p.p_type <> '{type_not}'
  AND p.p_size IN ({size_list})
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%99%')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q17: small-quantity order revenue (correlated per-part average).
# ---------------------------------------------------------------------------


def q17_small_quantity(lineitem: DataFrame, part: DataFrame, brand: str) -> DataFrame:
    """TPC-H Q17 shape: weekly revenue lost to below-half-average-
    quantity orders of one brand.

    Plan: the correlated `avg(l_quantity) per part` subquery becomes a
    groupBy(partkey) aggregate joined back to the fact — Spark's
    standard decorrelation. Both sides pre-filter on the broadcast
    brand part list, so the agg and the join touch only that brand's
    rows, not the whole fact table."""
    pt = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(
        F.broadcast(pt), lineitem.l_partkey == pt.p_partkey
    ).select("p_partkey", "l_quantity", "l_extendedprice")
    avg_qty = li.groupBy("p_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("__half_avg")
    ).withColumnRenamed("p_partkey", "__pk")
    small = li.join(F.broadcast(avg_qty), li.p_partkey == F.col("__pk")).filter(
        F.col("l_quantity") < F.col("__half_avg")
    )
    agg = small.agg(F.sum(_d("l_extendedprice")).alias("__s"))
    return agg.select(
        r4(F.col("__s").cast("double") / F.lit(7.0)).alias("avg_yearly")
    )


Q17_SQL = """
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 + 1e-9, 4)
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = '{brand}'
WHERE l.l_quantity < (
  SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
"""


# ---------------------------------------------------------------------------
# Q18: large-volume orders (HAVING subquery joined back to dims).
# ---------------------------------------------------------------------------


def q18_large_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, min_qty: float
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with customer context.

    Plan: groupBy(l_orderkey) + HAVING shrinks the fact to a tiny key
    set FIRST; that result broadcasts into orders, and the surviving
    orders broadcast into customer. The expensive relation never joins
    anything at full width."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_d("l_quantity")).alias("__sq"))
        .filter(F.col("__sq") > min_qty)
    )
    o = orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    joined = o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
    c = customer.select("c_custkey", "c_name")
    return (
        joined.join(c, joined.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("__sq").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


Q18_SQL = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(big.sq AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {min_qty}
) big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o_totalprice DESC, o.o_orderkey
"""


# ---------------------------------------------------------------------------
# Q19: disjunctive predicate revenue (OR-of-ANDs pushdown).
# ---------------------------------------------------------------------------


def q19_disjunctive(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue matching three alternative
    (brand, size-range, quantity-range) conjunctions.

    Plan: the part-side conjuncts (brand+size) are pushed into the
    broadcast build side BEFORE the join — only parts that could match
    ANY branch are shipped; the residual per-branch quantity test runs
    as the join condition. Catalyst keeps the whole disjunction inside
    WholeStageCodegen."""
    pt = part.select("p_partkey", "p_brand", "p_size")
    li = lineitem.select("l_partkey", "l_quantity", _rev().alias("__rev"))
    branch1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    branch3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    joined = li.join(
        F.broadcast(pt),
        (li.l_partkey == pt.p_partkey) & (branch1 | branch2 | branch3),
    )
    return joined.agg(F.sum("__rev").alias("__r")).select(
        r4(_undec("__r")).alias("revenue")
    )


Q19_SQL = """
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) + 1e-9, 4)
         AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q22: wealthy-but-recently-inactive customers per nation.
# ---------------------------------------------------------------------------


def q22_inactive_wealthy(
    customer: DataFrame, orders: DataFrame, recent_date: str
) -> DataFrame:
    """TPC-H Q22 shape (phone prefix → nation key): customers with
    above-average positive balances and NO orders since `recent_date`.

    Plan: the scalar AVG subquery becomes a 1-row broadcast cross join
    (never a driver collect); the NOT EXISTS becomes a left-anti join
    against the date-pruned orders key column only. Output is a 25-group
    aggregate."""
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__avg")
    )
    recent = orders.filter(F.col("o_orderdate") >= recent_date).select("o_custkey")
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy(F.col("c_nationkey").cast("int").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            r4(F.sum(_d("c_acctbal")).cast("double")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SQL = """
SELECT CAST(c_nationkey AS INTEGER) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) + 1e-9, 4) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{recent_date} 00:00:00'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""
