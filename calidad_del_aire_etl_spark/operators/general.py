"""General analytics operators on the TPC-H-ish tables (SURVEY §2 #19-24).

Engine-completeness demonstrations: multi-agg scans, star joins with
broadcast dimensions, window top-k, sessionization, pivot. Money math
must be exact and order-independent — the only way a distributed sum
can hash-match a single-threaded oracle bit-for-bit (double sums
differ by summation order at 10⁵+ rows). It rides as EXACT int64
10⁻²/10⁻⁴/10⁻⁶-dollar units through every fact-side scan/join/agg
(_cents/_rev4 — Spark's DECIMAL multiply/sum runs interpreted and
F.round-on-double allocates per element, the round-10 BigDecimal
finding), with the DECIMAL re-scale confined to the few-row final
projection (_undec — one decimal division + ONE double cast, the
same single rounding the DECIMAL twins perform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import r4

DEC = "decimal(18,2)"


def _d(col: str):
    return F.col(col).cast(DEC)


def _cents(col: str):
    """Double dollars → bigint cents; floor(x·100+0.5) = HALF_UP for
    non-negative money and stays in codegen'd double math (the q1/q9
    BigDecimal finding — F.round on double allocates per element and
    DECIMAL aggregation runs interpreted)."""
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("bigint")


def _rev4():
    """extendedprice·(1−discount) in EXACT int64 10⁻⁴-dollar units —
    the shared revenue expression for the Q3/Q5/Q6/Q10 shapes."""
    return _cents("l_extendedprice") * (100 - _cents("l_discount"))


def _undec(col: str, unit: int):
    """Exact decimal re-scale of an int64 unit sum, then ONE
    round-to-nearest double cast — the same single rounding the
    DECIMAL twin performs (see q1_pricing_summary). Run it on the
    final few-row relation only."""
    return (F.col(col).cast("decimal(38,6)") / F.lit(unit)).cast("double")


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "2001-09-01") -> DataFrame:
    """TPC-H Q1 shape: one partial-aggregating scan, eight aggregates.

    Catalyst plan: parquet scan with the shipdate filter pushed down →
    partial HashAggregate (map-side) → single shuffle on the 6-value
    grouping key → final HashAggregate. Nothing here grows with data
    size except the scan.

    Fact math in bigint cents, not DECIMAL (the q9_profit discipline,
    tpch3.py:161 — Spark's Decimal multiply/sum is the interpreted slow
    path). Units: qty/price sums in 10⁻² (cents), disc_price in 10⁻⁴,
    charge in 10⁻⁶ dollars — every per-row product of ≤ 2-decimal
    inputs is EXACT in int64, and group sums stay exact up to
    |sum_charge| < 9.2e12 dollars per (flag, status) group. Unlike q9's
    ~175 groups, this shape has ~6, so a group's 10⁻⁶-unit sum passes
    2⁵³ already at sf1 — dividing the unit out in DOUBLE would
    double-round differently from the twin's DECIMAL → double cast.
    The unit division therefore runs in DECIMAL on the ≤ 6 output rows
    only (exact, then ONE deterministic round-to-nearest double cast —
    the same single rounding the twin performs), keeping the 60 M-row
    hot path pure codegen'd long arithmetic."""
    # floor(x·100+0.5) = HALF_UP for non-negative money, and stays in
    # codegen'd double math (F.round on double allocates a BigDecimal
    # per element — measured GC-bound at sf10 with 4 casts per row)
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("bigint")  # noqa: E731
    disc_price4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    charge6 = disc_price4 * (100 + cents("l_tax"))
    out = (
        lineitem.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents("l_quantity")).alias("__sq"),
            F.sum(cents("l_extendedprice")).alias("__sbp"),
            F.sum(disc_price4).alias("__sdp"),
            F.sum(charge6).alias("__sc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )

    def undec(col: str, unit: int):
        # exact decimal re-scale of the int64 sum, then one double cast
        return (F.col(col).cast("decimal(38,6)") / F.lit(unit)).cast("double")

    sq_d = undec("__sq", 100)
    sbp_d = undec("__sbp", 100)
    return out.select(
        "l_returnflag",
        "l_linestatus",
        sq_d.alias("sum_qty"),
        sbp_d.alias("sum_base_price"),
        r4(undec("__sdp", 10000)).alias("sum_disc_price"),
        r4(undec("__sc", 1000000)).alias("sum_charge"),
        r4(sq_d / F.col("count_order")).alias("avg_qty"),
        r4(sbp_d / F.col("count_order")).alias("avg_price"),
        "count_order",
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) + 1e-9, 4)
         AS sum_disc_price,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) + 1e-9, 4)
         AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) + 1e-9, 4)
         AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) + 1e-9, 4)
         AS avg_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{cutoff} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-03-15",
    topn: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: selective dimension broadcast into the fact scan.

    customer (filtered) is broadcast; orders joins it without a shuffle;
    lineitem↔orders is the one real shuffle (AQE handles skew). Top-N
    runs on the already-aggregated relation. Revenue rides as exact
    int64 10⁻⁴-dollar units through the join/agg/sort (per-order sums
    ≤ 7 lines, always < 2⁵³); the decimal re-scale runs on the topn
    rows only."""
    revenue = _rev4()
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = lineitem.filter(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", revenue.alias("__rev")
    )
    joined = li.join(
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey),
        li.l_orderkey == ords.o_orderkey,
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate").agg(F.sum("__rev").alias("__r"))
    return (
        agg.orderBy(F.col("__r").desc(), F.col("o_orderkey").asc())
        .limit(topn)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            r4(_undec("__r", 10000)).alias("revenue"),
        )
    )


Q3_SQL = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       ROUND(CAST(rev AS DOUBLE) + 1e-9, 4) AS revenue
FROM (
  SELECT o.o_orderkey, o.o_orderdate,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = '{segment}'
    AND o.o_orderdate < TIMESTAMP '{cutoff} 00:00:00'
    AND l.l_shipdate > TIMESTAMP '{cutoff} 00:00:00'
  GROUP BY 1, 2
  ORDER BY rev DESC, o_orderkey ASC
  LIMIT {topn}
)
"""


def q5_local_supplier(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, every dimension broadcast.

    region→nation→{customer, supplier} are all tiny: the physical plan
    is lineitem⋈orders (one shuffle) with four BroadcastHashJoins
    layered on — the canonical 100 TB star-join shape. The fact-fact
    join is hinted SHUFFLE_HASH with the date-filtered orders as build
    side (the q9 discipline: both sides still shuffle on the key —
    scale-safe — but no 60 M-row sort); revenue rides as exact int64
    10⁻⁴-dollar units (per-nation sums < 2⁵³ through sf10) and the
    decimal re-scale runs on the ~|nations| output rows.

    Strategy measured at sf10 (warm, best-of-2) before keeping the
    hint: SHUFFLE_HASH 3.78 s, unhinted SMJ 5.87 s, broadcasting the
    date-filtered orders 3.07 s. The broadcast wins only ~0.7 s here
    (the scan dominates, not the thin 3-column shuffle) and is
    scale-UNSAFE — one year of orders at 100 TB is not driver-sized —
    so the shuffle-hash plan stays."""
    nat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    ords = orders.filter(
        (F.col("o_orderdate") >= date_lo) & (F.col("o_orderdate") < date_hi)
    ).select("o_orderkey", "o_custkey")
    joined = (
        lineitem.select("l_orderkey", "l_suppkey", _rev4().alias("__rev"))
        .join(ords.hint("SHUFFLE_HASH"), F.col("l_orderkey") == ords.o_orderkey)
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum("__rev").alias("__r"))
        .select("n_name", r4(_undec("__r", 10000)).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name, ROUND(CAST(rev AS DOUBLE) + 1e-9, 4) AS revenue
FROM (
  SELECT n.n_name,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{region_name}'
    AND o.o_orderdate >= TIMESTAMP '{date_lo} 00:00:00'
    AND o.o_orderdate < TIMESTAMP '{date_hi} 00:00:00'
  GROUP BY 1
)
"""


def topk_per_group(
    orders: DataFrame, group_col: str = "o_orderpriority", k: int = 3
) -> DataFrame:
    """Window top-k per group — the standard row_number pattern; one
    shuffle on the group key."""
    w = Window.partitionBy(group_col).orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(group_col, "o_orderkey", "o_totalprice", "rank")
    )


TOPK_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY o_orderpriority
         ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rank
FROM orders
QUALIFY rank <= {k}
"""


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: lag + conditional running sum — one
    shuffle on user_id, two in-partition window passes. Emits per-session
    stats with exact microsecond durations."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.withColumn(
        "__new",
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
            > F.lit(gap_us)
        )
        .cast("bigint")
        .alias("__new"),
    ).withColumn("__new", F.coalesce(F.col("__new"), F.lit(1)))
    sess = marked.withColumn(
        "session_id",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
        F.sum(_d("value")).cast("double").alias("sum_value"),
    )


SESSIONIZE_SQL = """
SELECT user_id, session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (
  SELECT user_id, ts, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id)) > {gap_us}
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
  )
)
GROUP BY 1, 2
"""


def pivot_event_types(events: DataFrame, types: list[str]) -> DataFrame:
    """Wide pivot: one row per user, per-type counts and exact sums.

    Implemented as conditional aggregation rather than ``.pivot()`` so
    the plan is a single groupBy (pivot's two-pass type discovery is
    skipped — types are declared)."""
    aggs = []
    for t in types:
        is_t = F.col("event_type") == t
        aggs.append(F.sum(is_t.cast("bigint")).alias(f"n_{t}"))
        aggs.append(
            F.sum(F.when(is_t, _d("value")).otherwise(F.lit(0).cast(DEC)))
            .cast("double")
            .alias(f"sum_{t}")
        )
    return events.groupBy("user_id").agg(*aggs)


def pivot_sql(types: list[str]) -> str:
    cols = []
    for t in types:
        cols.append(
            f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        )
        cols.append(
            f"CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(18,2)) "
            f"ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_{t}"
        )
    return f"SELECT user_id, {', '.join(cols)} FROM events GROUP BY user_id"


def q6_forecast_revenue(
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    qty_max: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins.

    The whole query is one map-side pass: all four predicates push into
    the parquet scan (shipdate min/max prune row groups at 100 TB), the
    product folds in the projection, and a single partial+final sum
    crosses the wire as one row per task. The canonical 'is pushdown
    working' probe."""
    # exact int64 10⁻⁴-dollar units (ext_c·disc_c); the one-group sum
    # passes 2⁵³ around sf10, so the unit division runs in DECIMAL on
    # the single output row (q1's discipline)
    rev = _cents("l_extendedprice") * _cents("l_discount")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= date_lo)
            & (F.col("l_shipdate") < date_hi)
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < qty_max)
        )
        .agg(F.sum(rev).alias("__r"), F.count(F.lit(1)).alias("n_items"))
        .select(
            r4(_undec("__r", 10000)).alias("revenue"),
            F.col("n_items").cast("bigint").alias("n_items"),
        )
    )


Q6_SQL = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) + 1e-9, 4)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{date_lo} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{date_hi} 00:00:00'
  AND l_discount BETWEEN {disc_lo} AND {disc_hi}
  AND l_quantity < {qty_max}
"""


def q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    topn: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter.

    lineitem is pre-filtered to returns before the join (the selective
    predicate runs at the scan, not after the shuffle); customer is
    broadcast so the only shuffle is lineitem⋈orders on orderkey, then
    one partial-agg groupBy on custkey. Top-N happens on the aggregated
    (small) relation."""
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", _rev4().alias("__rev")
    )
    ords = orders.filter(
        (F.col("o_orderdate") >= date_lo) & (F.col("o_orderdate") < date_hi)
    ).select("o_orderkey", "o_custkey")
    agg = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("__rev").alias("__r"))
    )
    return (
        agg.join(
            F.broadcast(customer.select("c_custkey", "c_name", "c_acctbal")),
            agg.o_custkey == F.col("c_custkey"),
        )
        .orderBy(F.col("__r").desc(), F.col("c_custkey").asc())
        .limit(topn)
        .select(
            "c_custkey",
            "c_name",
            r4(_undec("__r", 10000)).alias("revenue"),
            r4(F.col("c_acctbal")).alias("c_acctbal"),
        )
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       ROUND(CAST(rev AS DOUBLE) + 1e-9, 4) AS revenue,
       ROUND(c_acctbal + 1e-9, 4) AS c_acctbal
FROM (
  SELECT c.c_custkey, c.c_name, c.c_acctbal,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '{date_lo} 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '{date_hi} 00:00:00'
  GROUP BY 1, 2, 3
  ORDER BY rev DESC, c_custkey ASC
  LIMIT {topn}
)
"""


def range_join_incidents(
    events: DataFrame, trigger_type: str = "error", window_minutes: int = 60
) -> DataFrame:
    """Interval/range join: each ``trigger_type`` event opens a
    [ts, ts+window) incident window; count the same user's subsequent
    activity inside it.

    The equi-key (user_id) carries the shuffle, so Catalyst plans a hash
    join with the range predicate as a cheap post-join filter — NOT an
    O(n·m) cross product. At 100 TB the join stays key-partitioned; the
    time window only trims matches inside each key group. (A pure range
    join with no equi-key would need a bucketed time-bin blow-up
    instead.)"""
    win_us = window_minutes * 60 * 1_000_000
    ev = events.select(
        F.col("user_id").alias("e_user"),
        F.unix_micros("ts").alias("e_us"),
        "event_type",
        _d("value").alias("__v"),
    )
    trig = events.filter(F.col("event_type") == trigger_type).select(
        F.col("event_id").alias("incident_id"),
        F.col("user_id").alias("t_user"),
        F.unix_micros("ts").alias("t_us"),
    )
    j = ev.join(
        trig,
        (ev.e_user == trig.t_user)
        & (F.col("e_us") > F.col("t_us"))
        & (F.col("e_us") < F.col("t_us") + F.lit(win_us)),
    )
    return j.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("__v")).cast("double").alias("sum_value"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
    )


RANGE_JOIN_SQL = """
SELECT t.event_id AS incident_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(COUNT(DISTINCT e.event_type) AS BIGINT) AS n_types
FROM events e
JOIN (SELECT event_id, user_id, ts FROM events
       WHERE event_type = '{trigger_type}') t
  ON e.user_id = t.user_id
 AND epoch_us(e.ts) > epoch_us(t.ts)
 AND epoch_us(e.ts) < epoch_us(t.ts) + {win_us}
GROUP BY 1
"""


def window_funnel(
    events: DataFrame, steps: tuple[str, str, str] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered-funnel analysis: how far each user progressed through
    step1 → step2 → step3 with strictly increasing timestamps.

    Two chained conditional aggregations per user — min(t1), then
    min(t2 > t1), then min(t3 > t2) — expressed as one groupBy producing
    t1 plus per-(type) sorted ts arrays, with the 'first element after
    x' probes done by ``array`` higher-order ``filter`` JVM-side. One
    shuffle on user_id; state per user is 3 small sorted arrays (bounded
    by that user's event count), the classic scalable funnel layout."""
    s1, s2, s3 = steps
    g = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == s1, F.unix_micros("ts"))).alias("t1"),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == s2, F.unix_micros("ts")))
        ).alias("ts2"),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == s3, F.unix_micros("ts")))
        ).alias("ts3"),
    )
    # get() (not [0]) — ANSI mode throws on indexing an empty array
    t2 = F.expr("get(filter(ts2, x -> x > t1), 0)")
    g = g.withColumn("t2", F.when(F.col("t1").isNotNull(), t2))
    t3 = F.expr("get(filter(ts3, x -> x > t2), 0)")
    g = g.withColumn("t3", F.when(F.col("t2").isNotNull(), t3))
    depth = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    per_user = g.select("user_id", depth.cast("int").alias("depth"))
    return (
        per_user.groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select("depth", F.col("n_users").cast("bigint").alias("n_users"))
    )


FUNNEL_SQL = """
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_users
FROM (
  SELECT user_id,
         CAST(CASE WHEN t3 IS NOT NULL THEN 3
                   WHEN t2 IS NOT NULL THEN 2
                   WHEN t1 IS NOT NULL THEN 1
                   ELSE 0 END AS INTEGER) AS depth
  FROM (
    SELECT user_id, t1,
           (SELECT MIN(epoch_us(e2.ts)) FROM events e2
             WHERE e2.user_id = u.user_id AND e2.event_type = '{s2}'
               AND epoch_us(e2.ts) > u.t1) AS t2,
           (SELECT MIN(epoch_us(e3.ts)) FROM events e3
             WHERE e3.user_id = u.user_id AND e3.event_type = '{s3}'
               AND epoch_us(e3.ts) > (SELECT MIN(epoch_us(e2.ts)) FROM events e2
                                       WHERE e2.user_id = u.user_id
                                         AND e2.event_type = '{s2}'
                                         AND epoch_us(e2.ts) > u.t1)) AS t3
    FROM (
      SELECT user_id,
             MIN(CASE WHEN event_type = '{s1}' THEN epoch_us(ts) END) AS t1
      FROM events GROUP BY user_id
    ) u
  )
)
GROUP BY 1
"""


def percentile_profile(
    events: DataFrame, probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)
) -> DataFrame:
    """Per-type exact percentile profile (linear interpolation).

    Exact ``percentile`` is the correctness baseline; the 100 TB path
    swaps in ``percentile_approx`` (t-digest-style mergeable sketch,
    single pass, bounded memory) — same call shape, declared here in the
    docstring rather than the plan so the oracle stays exact."""
    aggs = [
        r4(F.expr(f"percentile(value, {p})")).alias(f"p{int(p * 100)}") for p in probs
    ]
    return (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), *aggs)
        .select("event_type", F.col("n").cast("bigint").alias("n"),
                *[f"p{int(p * 100)}" for p in probs])
    )


def percentile_sql(probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)) -> str:
    cols = ", ".join(
        f"ROUND(quantile_cont(value, {p}) + 1e-9, 4) AS p{int(p * 100)}" for p in probs
    )
    return (
        f"SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, {cols} "
        "FROM events GROUP BY event_type"
    )


def scd2_from_changelog(events: DataFrame) -> DataFrame:
    """SCD Type-2 dimension build from a change log: each (user_id,
    event_type) change event becomes a versioned row with
    [effective_from, effective_to) validity and an is_current flag.

    Pure window formulation — one shuffle on the natural key, lead() for
    the closing timestamp, row_number() for the version ordinal. This is
    the warehouse-standard history table; at 100 TB the state per key is
    just that key's change rows (no global sort)."""
    w = Window.partitionBy("user_id").orderBy("effective_from", "event_id")
    return events.select(
        "user_id",
        F.col("event_type").alias("attr_value"),
        F.col("ts").alias("effective_from"),
        "event_id",
    ).select(
        "user_id",
        "attr_value",
        F.row_number().over(w).cast("int").alias("version"),
        F.unix_micros("effective_from").alias("from_us"),
        F.unix_micros(F.lead("effective_from").over(w)).alias("to_us"),
        F.lead("effective_from").over(w).isNull().alias("is_current"),
    )


SCD2_SQL = """
SELECT user_id, event_type AS attr_value,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
       CAST(epoch_us(ts) AS BIGINT) AS from_us,
       CAST(epoch_us(LEAD(ts) OVER w) AS BIGINT) AS to_us,
       LEAD(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def sketch_profile(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Sketch-based per-group profile: HyperLogLog++ distinct counts and
    t-digest-style approximate percentiles.

    At 100 TB exact COUNT(DISTINCT) explodes the shuffle (one row per
    distinct pair through the wire) and exact percentile needs a full
    sort; both sketches are small, mergeable, map-side-combined
    aggregates — the shuffle carries one sketch per (partition, group).
    Accuracy bounds (HLL rsd, percentile_approx error) are asserted
    against the exact values in tests/test_general2.py; no DuckDB oracle
    because the two engines' sketch internals differ by design."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).cast("bigint").alias("approx_users"),
        F.expr("approx_percentile(value, array(0.5, 0.95), 10000)").alias("__q"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    ).select(
        "event_type",
        "approx_users",
        r4(F.col("__q")[0]).alias("approx_p50"),
        r4(F.col("__q")[1]).alias("approx_p95"),
        "n_events",
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_id_col: str,
    num_salts: int = 8,
    keep_salt: bool = False,
) -> DataFrame:
    """Skew-safe equi-join: fact rows spread across ``num_salts``
    sub-keys (deterministic hash of the fact's id column — stable under
    retries and speculation), the dim side replicated once per salt.

    Result rows are identical to a plain inner join; what changes is the
    physical distribution — a hot key that would land its entire
    partition on one reducer is split ``num_salts`` ways. The manual
    alternative to AQE's skew-join for the agg-after-join and
    non-sort-merge cases AQE doesn't rewrite. ``keep_salt=True``
    retains the ``__salt`` column so tests can assert the physical
    distribution invariant (tests/test_skew.py).
    """
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(fact_id_col)), F.lit(num_salts)).cast("int")
    )
    replicated_dim = dim.select(
        "*", F.explode(F.expr(f"sequence(0, {num_salts - 1})")).alias("__salt")
    ).withColumn("__salt", F.col("__salt").cast("int"))
    joined = salted_fact.join(replicated_dim, on=[key, "__salt"])
    return joined if keep_salt else joined.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    out_col: str = "asof_value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-series as-of join: each left row picks the most recent right
    row with ``right.ts <= left.ts`` in the same key group (NULL when no
    right row precedes it).

    Spark has no native ASOF JOIN; the scalable formulation is
    union-then-window: tag both sides, sort each key group once by
    (ts, side, tiebreak) with right rows first at equal ts, and carry the
    last non-null right value forward. ONE shuffle on the key and one
    in-partition sort — same cost envelope as any windowed op, no range
    cross-join, no per-row probe. Right rows sharing (key, ts) resolve
    deterministically by ``tiebreak_col``.
    """
    payload = [c for c in left.columns if c not in key_cols and c != ts_col]
    tb_l = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    tb_r = F.col(tiebreak_col) if tiebreak_col and tiebreak_col in right.columns else F.lit(0)
    lt = left.select(
        *key_cols,
        ts_col,
        *payload,
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("double").alias("__rv"),
        tb_l.cast("bigint").alias("__tb"),
    )
    rt = right.select(
        *key_cols,
        ts_col,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in payload],
        F.lit(0).alias("__is_left"),
        F.col(value_col).cast("double").alias("__rv"),
        tb_r.cast("bigint").alias("__tb"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        lt.unionByName(rt)
        .withColumn(out_col, F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
        .drop("__is_left", "__rv", "__tb")
    )


def scd2_point_in_time(events: DataFrame) -> DataFrame:
    """Point-in-time (as-of) join of facts onto an SCD2 dimension: each
    purchase is matched to the status version (built from the user's
    signup/error change log) that was valid AT the purchase timestamp.

    The temporal-warehouse correctness query: joining on is_current
    instead silently rewrites history. Plan shape: equi-key (user_id)
    hash join with the [from_us, to_us) interval as a post-join filter
    — same never-BNLJ posture as the range join; the dimension side is
    |change events| per key, already reduced by the SCD2 window."""
    changes = events.filter(F.col("event_type").isin("signup", "error"))
    dim = scd2_from_changelog(changes).select(
        F.col("user_id").alias("d_user"), "attr_value", "version", "from_us", "to_us"
    )
    facts = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("__ts_us"),
        F.col("value").alias("amount"),
    )
    j = facts.join(
        dim,
        (facts.user_id == dim.d_user)
        & (F.col("__ts_us") >= F.col("from_us"))
        & ((F.col("to_us").isNull()) | (F.col("__ts_us") < F.col("to_us"))),
    )
    return j.select(
        "event_id",
        F.col("user_id").cast("int").alias("user_id"),
        F.col("attr_value").alias("status_at_purchase"),
        F.col("version").alias("status_version"),
        F.col("amount").cast("double").alias("amount"),
    ).orderBy("event_id")


SCD2_PIT_SQL = """
WITH changes AS (
  SELECT * FROM events WHERE event_type IN ('signup', 'error')
), dim AS (
  SELECT user_id AS d_user, event_type AS attr_value,
         CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
         CAST(epoch_us(ts) AS BIGINT) AS from_us,
         CAST(epoch_us(LEAD(ts) OVER w) AS BIGINT) AS to_us
  FROM changes
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), facts AS (
  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value AS amount
  FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, CAST(f.user_id AS INTEGER) AS user_id,
       d.attr_value AS status_at_purchase,
       d.version AS status_version,
       CAST(f.amount AS DOUBLE) AS amount
FROM facts f
JOIN dim d ON f.user_id = d.d_user
          AND f.ts_us >= d.from_us
          AND (d.to_us IS NULL OR f.ts_us < d.to_us)
ORDER BY f.event_id
"""


# --- grid-bucketed spatial self-join ---------------------------------------


def geo_close_pairs(
    coords: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    max_km: float = 5.0,
) -> DataFrame:
    """All pairs of points within ``max_km`` (equirectangular km:
    111.32·√(Δlat² + Δlon²)) WITHOUT the all-pairs cross join — the
    spatial-join banding pattern: points hash into grid cells of side ≥
    max_km, one side replicates into its 3×3 cell neighborhood (9 rows,
    a constant), and the equi-join on the cell key finds every
    candidate exactly once (a pair within range can differ by at most
    one cell index on each axis). The quadratic term is bounded per
    cell — the same guarantee LSH bands give MinHash — and the exact
    distance filter keeps the output identical to the naive join.

    Output (id_a < id_b, dist_km ≤ max_km), each pair exactly once:
    replicating only side A means the ordered probe (a → b's home
    cell) matches at one unique offset.
    """
    cell_deg = max_km / 111.32
    base = coords.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
        F.floor(F.col(lat_col) / cell_deg).cast("long").alias("cx"),
        F.floor(F.col(lon_col) / cell_deg).cast("long").alias("cy"),
    )
    probes = base.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dx -> "
                "transform(sequence(-1, 1), dy -> struct(cx + dx as cx, cy + dy as cy))))"
            )
        ).alias("cell"),
    ).select("id_a", "lat_a", "lon_a", F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"))
    raw = F.lit(111.32) * F.sqrt(
        (F.col("lat_a") - F.col("lat")) * (F.col("lat_a") - F.col("lat"))
        + (F.col("lon_a") - F.col("lon")) * (F.col("lon_a") - F.col("lon"))
    )
    # filter on the UNROUNDED distance: the 3x3 cell guarantee only
    # covers true-distance <= max_km; a rounded-down boundary pair
    # (true d = max_km + 4e-5) could pass a rounded filter while living
    # two cells away, silently missing a row the definition admits
    return (
        probes.join(base, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id"))
        .withColumn("__raw", raw)
        .filter(F.col("__raw") <= max_km)
        .select("id_a", F.col("id").alias("id_b"), r4(F.col("__raw")).alias("dist_km"))
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session-level distribution profile — the product-analytics
    readout layered on :func:`sessionize`: per user, session count,
    mean/max events per session, mean session duration (seconds) and
    single-event-session (bounce) rate. Adds one partial-agg groupBy
    on user_id on top of sessionize's single fact shuffle; AQE
    coalesces it onto the same partitioning, so the fact still
    shuffles once."""
    s = sessionize(events, gap_minutes)
    return (
        s.groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            r4(F.avg("n_events")).alias("avg_events"),
            F.max("n_events").cast("bigint").alias("max_events"),
            r4(F.avg(F.col("duration_us") / 1_000_000.0)).alias("avg_duration_s"),
            r4(
                F.sum((F.col("n_events") == 1).cast("bigint"))
                / F.count(F.lit(1))
            ).alias("bounce_rate"),
        )
        .orderBy("user_id")
    )


SESSION_STATS_SQL = """
WITH sess AS ({sessionize})
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       ROUND(AVG(n_events) + 1e-9, 4) AS avg_events,
       CAST(MAX(n_events) AS BIGINT) AS max_events,
       ROUND(AVG(duration_us / 1000000.0) + 1e-9, 4) AS avg_duration_s,
       ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) + 1e-9, 4)
         AS bounce_rate
FROM sess
GROUP BY user_id
ORDER BY user_id
"""


def scd2_apply(existing: DataFrame, changes: DataFrame) -> DataFrame:
    """Incremental SCD2 maintenance — the daily-apply counterpart of
    :func:`scd2_from_changelog`: merge a new batch of change events
    into an already-built history WITHOUT reprocessing closed rows.
    Only keys present in the batch are touched: their current row
    closes at the batch's first change, batch changes append as new
    versions continuing the key's version sequence; every other key's
    rows pass through untouched. Contract: batch timestamps are later
    than the key's current effective_from (late data needs a rebuild of
    that key, as in any warehouse SCD2 apply).

    Scale shape: the touched-key set broadcasts; untouched history
    (the overwhelming mass of a 100 TB dimension) streams through an
    anti-join with no window; windows run only over touched keys' rows.
    Correctness gate: the registry query hash-matches
    ``scd2_build(all events)`` — apply∘build ≡ rebuild, proven by the
    oracle."""
    # `existing` feeds FOUR consumers below (untouched anti-join, and the
    # semi-joined ex_t's three readers: closed_pass, closing, base_v) —
    # without materialization the whole history build (a window over the
    # full changelog) re-executes once per consumer. Checkpoint it with
    # its user_id hash partitioning pinned so every downstream
    # groupBy/window on user_id still rides the existing exchange.
    # Measured on scd2_apply_incremental at sf0.1: 1.35 s -> 1.07 s (r14).
    # At 100 TB this is the standard posture anyway: the standing
    # dimension is a stored table, not a recomputed lineage. (The
    # checkpoint blocks are non-reliable — executor loss fails the job
    # rather than recomputing; a real deployment reads the dimension
    # from storage, which has the same no-lineage property but survives.)
    from ..session import checkpoint_keeping_partitioning

    existing = checkpoint_keeping_partitioning(existing)
    touched = changes.select("user_id").distinct()
    untouched = existing.join(F.broadcast(touched), "user_id", "left_anti")
    ex_t = existing.join(F.broadcast(touched), "user_id", "left_semi")

    first_new = changes.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("__first_us")
    )
    base_v = ex_t.groupBy("user_id").agg(F.max("version").alias("__maxv"))

    closed_pass = ex_t.filter(~F.col("is_current"))
    closing = (
        ex_t.filter(F.col("is_current"))
        .join(F.broadcast(first_new), "user_id")
        .select(
            "user_id",
            "attr_value",
            "version",
            "from_us",
            F.col("__first_us").alias("to_us"),
            F.lit(False).alias("is_current"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fresh = (
        changes.select(
            "user_id", F.col("event_type").alias("attr_value"), "ts", "event_id"
        )
        .join(F.broadcast(base_v), "user_id", "left")
        .select(
            "user_id",
            "attr_value",
            (F.coalesce(F.col("__maxv"), F.lit(0)) + F.row_number().over(w))
            .cast("int")
            .alias("version"),
            F.unix_micros("ts").alias("from_us"),
            F.unix_micros(F.lead("ts").over(w)).alias("to_us"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )
    )
    return untouched.unionByName(closed_pass).unionByName(closing).unionByName(fresh)


# ---------------------------------------------------------------------------
# Blocked fuzzy entity matching (record linkage)
# ---------------------------------------------------------------------------


def blocked_fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_dist: int = 12,
) -> DataFrame:
    """Record linkage with blocking: candidate pairs are generated ONLY
    inside equal blocking-key groups (an equi-join, never a cross join),
    scored by Levenshtein edit distance JVM-side, and resolved to the
    best match per left entity (lowest distance, ties to lowest right
    id).

    The blocking key is the scalability contract — linkage is inherently
    all-pairs WITHIN a block (|L_b|x|R_b| candidates), so production keys
    must bound block cardinality (multi-pass over several cheap keys is
    the standard recall fix, cf. the Fellegi-Sunter / Dedupe literature).
    The operator itself is a plain shuffle equi-join on the key, so a
    well-chosen key scales to any corpus; a degenerate key (one giant
    block) degrades to the quadratic the caller asked for.

    Returns ``(left_id, right_id, dist)`` for the best match per left
    row with distance <= max_dist.
    """
    l = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_text).alias("__ltxt"),
        *[F.col(c).alias(f"__bk{i}") for i, c in enumerate(block_cols)],
    )
    r = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_text).alias("__rtxt"),
        *[F.col(c).alias(f"__bk{i}") for i, c in enumerate(block_cols)],
    )
    keys = [f"__bk{i}" for i in range(len(block_cols))]
    pairs = (
        l.join(r, on=keys)
        .withColumn("dist", F.levenshtein(F.col("__ltxt"), F.col("__rtxt")))
        .filter(F.col("dist") <= max_dist)
    )
    # Best match per left entity as min(struct(dist, rid)) — struct
    # ordering is field-by-field, so this IS "lowest distance, ties to
    # lowest right id", but as an aggregate it gets map-side partial
    # combine: the |block|² candidate stream collapses to one row per
    # left entity BEFORE the shuffle, where the previous row_number
    # window shuffled and sorted every scored pair — shuffled volume
    # now scales with |L|, not the pair count. (The sf0.1 3.8 s → 1.0 s
    # win was this plus spreading the 1-file probe scan to 32 tasks in
    # the registry caller; at a real SF the scan parallelizes itself.)
    return (
        pairs.groupBy("__lid")
        .agg(F.min(F.struct(F.col("dist"), F.col("__rid"))).alias("__best"))
        .select(
            F.col("__lid").alias(left_id),
            F.col("__best.__rid").alias(right_id),
            F.col("__best.dist").cast("int").alias("dist"),
        )
    )


def blocked_fuzzy_match_sql(
    left_table: str,
    right_table: str,
    block_cols_l: list[str],
    block_cols_r: list[str],
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_dist: int = 12,
) -> str:
    on = " AND ".join(
        f"l.{a} = r.{b}" for a, b in zip(block_cols_l, block_cols_r)
    )
    return f"""
    WITH pairs AS (
      SELECT l.{left_id} AS lid, r.{right_id} AS rid,
             levenshtein(l.{left_text}, r.{right_text}) AS dist
      FROM {left_table} l JOIN {right_table} r ON {on}
    ), ranked AS (
      SELECT lid, rid, dist,
             ROW_NUMBER() OVER (PARTITION BY lid ORDER BY dist ASC, rid ASC) AS rn
      FROM pairs WHERE dist <= {max_dist}
    )
    SELECT lid AS {left_id}, rid AS {right_id}, CAST(dist AS INTEGER) AS dist
    FROM ranked WHERE rn = 1
    """
