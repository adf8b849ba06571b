"""Behavioral / product analytics: cohort retention, RFM segmentation,
event-transition matrix.

The warehouse queries every event-stream product team runs; each is
expressed as partial-aggregated groupBys (retention, transitions) or a
bounded window over a pre-reduced relation (RFM), so the shapes hold at
100 TB: the shuffles carry |users| or |cohorts|×|weeks| rows, never raw
events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import r4


# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week;
    for each later week, the share of the cohort still active.

    Two partial-agg passes over (user, week) — first-touch per user,
    then distinct user-weeks — joined on user (both sides already
    reduced to |users| and |user-weeks|). The output is
    |cohorts|×|weeks|, tiny at any scale."""
    uw = events.select(
        "user_id", F.weekofyear("ts").cast("int").alias("week")
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    active = (
        uw.join(first, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.count(F.lit(1)).cast("bigint").alias("active_users"))
    )
    return (
        active.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).cast("int").alias("weeks_since"),
            "active_users",
            "cohort_size",
            r4(F.col("active_users") / F.col("cohort_size")).alias("retention"),
        )
        .orderBy("cohort_week", "weeks_since")
    )


COHORT_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(weekofyear(ts) AS INTEGER) AS week FROM events
), first AS (
  SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
), sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM first GROUP BY 1
), active AS (
  SELECT f.cohort_week, u.week, CAST(COUNT(*) AS BIGINT) AS active_users
  FROM uw u JOIN first f ON u.user_id = f.user_id
  GROUP BY 1, 2
)
SELECT a.cohort_week,
       CAST(a.week - a.cohort_week AS INTEGER) AS weeks_since,
       a.active_users, s.cohort_size,
       ROUND(a.active_users / CAST(s.cohort_size AS DOUBLE) + 1e-9, 4) AS retention
FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week
ORDER BY a.cohort_week, weeks_since
"""


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------


def rfm_segments(events: DataFrame, purchase_type: str = "purchase") -> DataFrame:
    """Recency / Frequency / Monetary quartile scores per user over
    purchase events, plus the composite segment string ("444" = best).

    One groupBy reduces events to |users| rows; the three ntile windows
    then run over that reduced relation (global windows, but on a
    relation whose size is the USER count — at 100 TB events that's
    still ~10⁸ rows, so production would swap ntile for approx-quantile
    cut points; the quartile SEMANTICS are identical and this module
    keeps the exact form as the correctness baseline)."""
    per_user = (
        events.filter(F.col("event_type") == purchase_type)
        .groupBy(F.col("user_id").cast("int").alias("user_id"))
        .agg(
            F.max("ts").alias("__last"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("__mon"),
        )
    )
    # recency rank: later last-purchase = better (higher quartile)
    r_q = F.ntile(4).over(Window.orderBy(F.col("__last").asc(), F.col("user_id").asc()))
    f_q = F.ntile(4).over(Window.orderBy(F.col("frequency").asc(), F.col("user_id").asc()))
    m_q = F.ntile(4).over(Window.orderBy(F.col("__mon").asc(), F.col("user_id").asc()))
    scored = per_user.select(
        "user_id",
        F.col("__last").cast("date").cast("string").alias("last_purchase_day"),
        "frequency",
        F.col("__mon").cast("double").alias("monetary"),
        r_q.cast("int").alias("r_score"),
        f_q.cast("int").alias("f_score"),
        m_q.cast("int").alias("m_score"),
    )
    return scored.select(
        "*",
        F.concat_ws("", "r_score", "f_score", "m_score").alias("segment"),
    ).orderBy("user_id")


def rfm_sql(purchase_type: str = "purchase") -> str:
    return f"""
WITH per_user AS (
  SELECT CAST(user_id AS INTEGER) AS user_id,
         MAX(ts) AS last_ts,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         SUM(CAST(value AS DECIMAL(18,2))) AS mon
  FROM events WHERE event_type = '{purchase_type}' GROUP BY 1
), scored AS (
  SELECT user_id,
         CAST(CAST(last_ts AS DATE) AS VARCHAR) AS last_purchase_day,
         frequency, CAST(mon AS DOUBLE) AS monetary,
         CAST(NTILE(4) OVER (ORDER BY last_ts ASC, user_id ASC) AS INTEGER) AS r_score,
         CAST(NTILE(4) OVER (ORDER BY frequency ASC, user_id ASC) AS INTEGER) AS f_score,
         -- NULLS FIRST pins DuckDB to Spark's ASC default (nulls
         -- first); mon is NULL for a user whose purchase values are
         -- all NULL, and the engines' default NULL sort order differs
         -- (caught by the NULL-planted sweep).
         CAST(NTILE(4) OVER (ORDER BY mon ASC NULLS FIRST, user_id ASC) AS INTEGER) AS m_score
  FROM per_user
)
SELECT user_id, last_purchase_day, frequency, monetary, r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR)
         AS segment
FROM scored
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Event-transition (Markov) matrix
# ---------------------------------------------------------------------------


def transition_matrix(events: DataFrame) -> DataFrame:
    """First-order transition probabilities between consecutive event
    types per user: P(next = b | current = a).

    One window shuffle on user_id computes the lag pairs; the bigram
    count groupBy reduces to |types|² rows map-side. Row-normalization
    joins the tiny |types| marginal back — broadcast."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            r4(F.col("n") / F.col("__tot")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


TRANSITION_SQL = """
WITH pairs AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT c.from_type, c.to_type, c.n,
       ROUND(c.n / CAST(t.tot AS DOUBLE) + 1e-9, 4) AS p
FROM counts c
JOIN (SELECT from_type, SUM(n) AS tot FROM counts GROUP BY 1) t
  ON c.from_type = t.from_type
ORDER BY c.from_type, c.to_type
"""


# ---------------------------------------------------------------------------
# Market-basket affinity (pair support + lift)
# ---------------------------------------------------------------------------


def _basket_pair_expand(oks, pks, out):
    """Vectorized per-order pair expansion of an (ok, pk) block sorted
    by ok: dedup (ok, pk), then for every basket-size group emit the
    packed min<<32|max keys of all i ≤ j pairs in one numpy gather —
    the diagonal (pk, pk) keys double as the per-part support markers.
    Returns the number of baskets in the block. Executor-side helper
    for :func:`basket_affinity`."""
    import numpy as np

    if len(oks) == 0:
        return 0
    m = np.unique(np.stack([oks, pks], axis=1), axis=0)
    oks, pks = m[:, 0], m[:, 1]
    new = np.empty(len(oks), dtype=bool)
    new[0] = True
    np.not_equal(oks[1:], oks[:-1], out=new[1:])
    sizes = np.bincount(np.cumsum(new) - 1)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    for s in np.unique(sizes):
        starts = offs[np.where(sizes == s)[0]]
        mat = pks[(starts[:, None] + np.arange(s)[None, :]).ravel()].reshape(-1, s)
        iu, ju = np.triu_indices(int(s), 0)
        a = mat[:, iu].ravel()
        b = mat[:, ju].ravel()
        out.append((np.minimum(a, b) << 32) + np.maximum(a, b))
    return len(sizes)


def basket_affinity(
    lineitem: DataFrame, min_support: int = 3, topn: int = 50
) -> DataFrame:
    """Part-pair affinity over order baskets: for parts a < b
    co-occurring in ≥ ``min_support`` orders, lift =
    (n_ab · N) / (n_a · n_b) — the classic association signal
    (lift > 1: bought together more than chance).

    Scale shape (rewritten round 11 — the VERDICT r10 GC-burn item):
    still ONE fact shuffle, but the basket build and pair expansion now
    run in a single Arrow-batched ``mapInPandas`` pass instead of
    collect_set + interpreted higher-order transform/flatten/slice
    expressions. The old shape allocated boxed per-basket long arrays
    for 160 M pair rows — Spark evaluates HOF lambdas interpreted, and
    the alloc churn thrashed the GCLocker (the logged warning). Now the
    fact's (ok, pk) rows shuffle once clustered+sorted by order key and
    stream through numpy: per Arrow batch the partition-sorted block is
    deduped, baskets are grouped BY SIZE (TPC-H holds ≤ 7 lines), and
    each size group emits all packed min<<32|max pair keys in one
    vectorized gather, pre-aggregated per batch — C-speed, zero boxed
    objects, zero interpreted lambdas. An order straddling two Arrow
    batches is carried over inside the per-partition iterator, so no
    basket is ever split. The diagonal (pk, pk) keys are the per-part
    supports and a k=-1 sentinel per partition carries the basket
    count (the hash repartition makes partitions ok-disjoint, so the
    sentinels sum to the global order count — no second scan), same
    decode scheme as the previous shape. Measured at sf10: 28.2 s →
    11.5 s fresh-process best-of-2 (DuckDB twin 6.2 s on the same
    box, 1.9×; was 3.6×); sf1 parity exact, and the batch-straddle
    carry is pinned by a forced-2-row-batch pytest.
    """
    raw = (
        lineitem.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .repartition("ok")
        .sortWithinPartitions("ok")
    )

    def pair_gen(batches):
        import numpy as np
        import pandas as pd

        hold_ok = np.empty(0, dtype=np.int64)
        hold_pk = np.empty(0, dtype=np.int64)
        chunks = []
        n_baskets = 0
        for pdf in batches:
            oks = np.concatenate([hold_ok, pdf["ok"].to_numpy(np.int64)])
            pks = np.concatenate([hold_pk, pdf["pk"].to_numpy(np.int64)])
            if len(oks) == 0:
                continue
            # hold back the trailing (possibly batch-straddling) order
            cut = np.searchsorted(oks, oks[-1], side="left")
            hold_ok, hold_pk = oks[cut:], pks[cut:]
            n_baskets += _basket_pair_expand(oks[:cut], pks[:cut], chunks)
        n_baskets += _basket_pair_expand(hold_ok, hold_pk, chunks)
        if chunks:
            uk, uc = np.unique(np.concatenate(chunks), return_counts=True)
            # the hash repartition makes partitions ok-DISJOINT, so the
            # per-partition basket counts sum to the global order count:
            # one k=-1 sentinel row replaces a whole countDistinct scan
            yield pd.DataFrame(
                {
                    "k": np.concatenate([[-1], uk]),
                    "n": np.concatenate(
                        [[n_baskets], uc.astype(np.int64)]
                    ).astype(np.int64),
                }
            )

    counts = (
        raw.mapInPandas(pair_gen, "k bigint, n bigint")
        .groupBy("k")
        .agg(F.sum("n").alias("n"))
        # the SMALL counts relation (≈ distinct pairs) feeds three
        # consumers, two of them BROADCAST builds — those run as
        # concurrent exchange jobs, and against a lazy checkpoint each
        # re-computes the whole pair pipeline before any of them
        # materializes it (measured 13.4 s → 32.7 s with eager=False
        # here). EAGER, the ann_graph round discipline.
        .localCheckpoint(eager=True)
    )
    hi, lo = F.shiftright("k", 32), F.col("k") % F.lit(2**32)
    n_orders = counts.filter(F.col("k") == -1).select(
        F.col("n").cast("double").alias("n_orders")
    )
    part_n = counts.filter((F.col("k") >= 0) & (hi == lo)).select(
        hi.alias("pk"), F.col("n").alias("n_part")
    )
    pair_n = counts.filter(
        (F.col("k") >= 0) & (hi < lo) & (F.col("n") >= min_support)
    ).select(hi.alias("pa"), lo.alias("pb"), F.col("n").alias("n_ab"))
    scored = (
        pair_n.join(
            F.broadcast(part_n.select(F.col("pk").alias("pa"), F.col("n_part").alias("na"))), "pa"
        )
        .join(
            F.broadcast(part_n.select(F.col("pk").alias("pb"), F.col("n_part").alias("nb"))), "pb"
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            F.col("n_ab").cast("bigint").alias("n_together"),
            r4(
                F.col("n_ab").cast("double")
                * F.col("n_orders")
                / (F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("lift").desc(), F.col("pa").asc(), F.col("pb").asc()).limit(topn)


def basket_affinity_sql(min_support: int = 3, topn: int = 50) -> str:
    return f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), n_orders AS (
      SELECT CAST(COUNT(DISTINCT ok) AS DOUBLE) AS n_orders FROM basket
    ), part_n AS (
      SELECT pk, COUNT(*) AS n_part FROM basket GROUP BY 1
    ), pair_n AS (
      SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS n_ab
      FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}
    )
    SELECT pa, pb, CAST(n_ab AS BIGINT) AS n_together,
           ROUND(CAST(n_ab AS DOUBLE) * n_orders.n_orders
                 / (CAST(na.n_part AS DOUBLE) * CAST(nb.n_part AS DOUBLE)) + 1e-9, 4)
             AS lift
    FROM pair_n
    JOIN part_n na ON pair_n.pa = na.pk
    JOIN part_n nb ON pair_n.pb = nb.pk
    CROSS JOIN n_orders
    ORDER BY lift DESC, pa ASC, pb ASC
    LIMIT {topn}
    """


# ---------------------------------------------------------------------------
# Conversion attribution (first/last touch)
# ---------------------------------------------------------------------------


def conversion_attribution(events: DataFrame) -> DataFrame:
    """First-touch and last-touch attribution per conversion: for every
    ``purchase`` event, the first and the most recent PRECEDING
    ``click``/``view`` touch by the same user (ties on ts broken by
    event_id, so both engines agree row-for-row).

    One window shuffle on user: running first/last over the ordered
    event stream via conditional min/max of a (ts, event_id)-encoded
    struct — no self-join, no per-conversion rescan (the naive
    formulation joins conversions × touches and explodes on active
    users; this form is linear in the stream).
    """
    touch = F.col("event_type").isin("click", "view")
    # encode (ts, event_id) as a sortable string so min/max pick the
    # earliest/latest touch; micros are < 16 digits, ids < 19.
    key = F.when(
        touch,
        F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 16, "0"),
            F.lit("|"),
            F.lpad(F.col("event_id").cast("string"), 19, "0"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = events.withColumn("first_touch_key", F.min(key).over(w)).withColumn(
        "last_touch_key", F.max(key).over(w)
    )
    conv = enriched.filter(F.col("event_type") == "purchase")
    to_id = lambda c: F.expr(f"cast(cast(split({c}, '\\\\|')[1] as bigint) as bigint)")
    return conv.select(
        "user_id",
        F.col("event_id").alias("conversion_id"),
        F.unix_micros("ts").alias("conversion_ts_us"),
        to_id("first_touch_key").alias("first_touch_id"),
        to_id("last_touch_key").alias("last_touch_id"),
    )


def conversion_attribution_sql() -> str:
    return """
    WITH keyed AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN event_type IN ('click', 'view') THEN
               lpad(CAST(epoch_us(ts) AS VARCHAR), 16, '0') || '|'
               || lpad(CAST(event_id AS VARCHAR), 19, '0')
             END AS tkey
      FROM events
    ), run AS (
      SELECT user_id, event_id, ts, event_type,
             MIN(tkey) OVER w AS first_touch_key,
             MAX(tkey) OVER w AS last_touch_key
      FROM keyed
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT user_id, event_id AS conversion_id,
           epoch_us(ts) AS conversion_ts_us,
           CAST(str_split(first_touch_key, '|')[2] AS BIGINT) AS first_touch_id,
           CAST(str_split(last_touch_key, '|')[2] AS BIGINT) AS last_touch_id
    FROM run WHERE event_type = 'purchase'
    """


def top_event_paths(events: DataFrame, path_len: int = 3, k: int = 20) -> DataFrame:
    """Top-k most common length-``path_len`` event-type sequences
    (sliding n-grams over each user's ordered event stream) — the
    which-journeys-dominate readout between the transition matrix
    (order 1) and full funnel analysis (fixed target).

    One window shuffle on user_id builds the lead n-gram; the path
    groupBy is map-side combined down to |types|^len rows; top-k via
    TakeOrdered (rank ties broken by path text so both engines agree).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cols = [F.col("event_type")] + [
        F.lead("event_type", i).over(w) for i in range(1, path_len)
    ]
    # every component must be non-null: concat_ws silently SKIPS nulls
    # (the SQL twin's || propagates them), so guarding only the last
    # lead would count malformed short paths on null event types
    full = cols[0].isNotNull()
    for c in cols[1:]:
        full = full & c.isNotNull()
    paths = events.select(
        F.concat_ws(" > ", *cols).alias("path"),
        full.alias("__full"),
    ).filter(F.col("__full"))
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w2 = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("rank") <= k)
        .select("path", "n", "rank")
    )


def top_event_paths_sql(path_len: int = 3, k: int = 20) -> str:
    leads = ["event_type"] + [
        f"LEAD(event_type, {i}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        for i in range(1, path_len)
    ]
    concat = " || ' > ' || ".join(leads)
    # all components non-null (mirrors the Spark side's guard — a null
    # anywhere must drop the window, not produce a NULL/short path)
    notnull = " AND ".join(f"({c}) IS NOT NULL" for c in leads)
    return f"""
    WITH paths AS (
      SELECT {concat} AS path, {notnull} AS is_full FROM events
    ), counts AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM paths
      WHERE is_full GROUP BY 1
    )
    SELECT path, n, rank FROM (
      SELECT path, n,
             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path ASC) AS INTEGER) AS rank
      FROM counts
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# #23q item-item collaborative filtering
# ---------------------------------------------------------------------------


def item_cf_cosine(events: DataFrame, min_co_users: int = 2) -> DataFrame:
    """Item-item collaborative-filtering similarity (Sarwar et al.
    WWW'01): cosine between event types' implicit-rating vectors, where
    rating(user, type) = interaction count. The "users who did X also
    did Y" recommender primitive.

    Plan: the raw event stream reduces FIRST to the (user, type, cnt)
    rating matrix (map-side-combined groupBy — the only pass over the
    fact); the pair generation is a self-join on user_id whose fan-out
    per user is bounded by the CATALOG size (< |items|² rows per user,
    never |events|²); item norms reduce to an |items|-row relation that
    broadcasts. At 100 TB the shuffles carry |users|·|items| rating
    rows and |items|² pair partials — both catalog-bounded."""
    ratings = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    a, b_ = ratings.alias("a"), ratings.alias("b")
    pairs = (
        a.join(b_, "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("item_a"),
            F.col("b.event_type").alias("item_b"),
        )
        .agg(
            F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("dot"),
            F.count(F.lit(1)).cast("bigint").alias("co_users"),
        )
    )
    norms = ratings.groupBy("event_type").agg(
        F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))).alias("norm")
    )
    na = F.broadcast(norms.select(F.col("event_type").alias("item_a"), F.col("norm").alias("__na")))
    nb = F.broadcast(norms.select(F.col("event_type").alias("item_b"), F.col("norm").alias("__nb")))
    return (
        pairs.join(na, "item_a")
        .join(nb, "item_b")
        .filter(F.col("co_users") >= min_co_users)
        .select(
            "item_a",
            "item_b",
            "co_users",
            r4(F.col("dot") / (F.col("__na") * F.col("__nb"))).alias("cosine"),
        )
    )


def item_cf_cosine_sql(min_co_users: int = 2) -> str:
    return f"""
    WITH ratings AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type AS item_a, b.event_type AS item_b,
             SUM(a.cnt * b.cnt) AS dot,
             CAST(COUNT(*) AS BIGINT) AS co_users
      FROM ratings a JOIN ratings b USING (user_id)
      WHERE a.event_type < b.event_type
      GROUP BY 1, 2
    ), norms AS (
      SELECT event_type, sqrt(SUM(cnt * cnt)) AS norm
      FROM ratings GROUP BY 1
    )
    SELECT item_a, item_b, co_users,
           ROUND(dot / (na.norm * nb.norm) + 1e-9, 4) AS cosine
    FROM pairs
    JOIN norms na ON na.event_type = item_a
    JOIN norms nb ON nb.event_type = item_b
    WHERE co_users >= {min_co_users}
    """
