"""Join-strategy and window-analytics query corpus.

The reference contains zero explicit joins (SURVEY.md §2.4 no-join note)
— its only join-like semantics are outer union-by-name and attaching
per-key aggregates back to rows.  This module supplies the join surface
a query engine is expected to have, each query shaped to exercise a
distinct *physical* strategy that matters at 100 TB:

- semi / anti joins (existence predicates without payload shuffle),
- broadcast dimension joins (no shuffle of the fact table),
- aggregate-then-join (shrink before the shuffle),
- ROLLUP hierarchical aggregation,
- running / lag window analytics,
- as-of join via the union + last(ignorenulls) window technique
  (one shuffle, no per-row subquery),
- range join via time-bucket equi-join expansion (turns an inequality
  join — a broadcast-nested-loop trap — into a shuffled equi-join),
- salted join for single-value key skew (salt-invariant result),
- per-group mean imputation (tiny aggregate broadcast back),
- exact per-group quantiles (the sketch-swap point for 100 TB),
- batch sessionization (lag + running-sum windows; cross-checked
  against the streaming stateful operator),
- 5-way star with a self-aliased broadcast dim (TPC-H Q7 shape).

Every query is DuckDB-oracle-checked (value hash at sf0.01 and sf0.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_lab_three_spark.operators.rankstats import (
    N_COL,
    RANK_COL,
    global_ranks,
    group_quantiles,
    ntile_from_rank,
)
from big_data_lab_three_spark.operators.relational import skyline_2d
from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.sources import table


@register(
    "semi_join_exists",
    ids="join: left-semi (EXISTS) — late-shipping order priority census (TPC-H Q4 shape)",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS realized as a left-semi join: lineitem contributes only its
    join keys to the shuffle (no payload columns), and each order emits at
    most once regardless of matching line count.  At 100 TB this is the
    difference between shuffling 11 lineitem columns and shuffling 2."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "anti_join_idle",
    ids="join: left-anti (NOT EXISTS) + broadcast dim — customers with no recent orders per nation",
    oracle="""
SELECT n_name,
       count(*)                 AS idle_customers,
       round(avg(c_acctbal), 4) AS avg_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01'
)
GROUP BY n_name
ORDER BY n_name
""",
)
def anti_join_idle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join on the distinct recent-order
    customer keys, then a broadcast join to the 25-row nation dim.  The
    anti side is pre-filtered (pushed to the parquet scan) and
    pre-projected to the single key column; nation never shuffles."""
    c = table(spark, sf_dir, "customer")
    o_keys = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o_keys, c.c_custkey == o_keys.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("idle_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
        .orderBy("n_name")
    )


@register(
    "promo_revenue",
    ids="join: broadcast dim + conditional aggregation (TPC-H Q14 shape)",
    oracle="""
SELECT round(
         100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                          THEN CAST(l_extendedprice AS DECIMAL(12,2))
                               * (1 - CAST(l_discount AS DECIMAL(4,2)))
                          ELSE 0 END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
         4) AS promo_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1997-07-01'
""",
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share: the shipdate filter pushes to the parquet
    scan, part is explicitly broadcast (a dimension ~1/30 the fact's rows
    and 2 needed columns), and the conditional sum folds into one
    map-side partial aggregate — the whole query is one scan-bound stage
    plus a 1-row reduce."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    # exact decimal sums both sides of the ratio — see pricing_summary note
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_share")
        )
    )


@register(
    "big_orders",
    ids="join: aggregate-then-join with HAVING (TPC-H Q18 shape)",
    oracle="""
SELECT c_name, o_orderkey, o_totalprice, round(sum_qty, 2) AS sum_qty
FROM (
    SELECT l_orderkey, sum(l_quantity) AS sum_qty
    FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
) big
JOIN orders   o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey  = o.o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders: aggregate lineitem FIRST (6M rows → ~1 per
    order, HAVING prunes to a handful), then join the tiny survivor set to
    orders and customer.  Aggregating before joining is the load-bearing
    choice — the join input shrinks by orders of magnitude, and at scale
    the survivor side broadcasts.  Deterministic top-20 via unique
    (o_totalprice DESC, o_orderkey) sort."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    return (
        F.broadcast(big)
        .join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name", "o_orderkey", "o_totalprice",
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@register(
    "rollup_revenue",
    ids="agg: hierarchical ROLLUP (region → nation → grand total)",
    oracle="""
SELECT coalesce(r_name, 'ALL') AS r_name,
       coalesce(n_name, 'ALL') AS n_name,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS orders
FROM orders o
JOIN customer c ON o.o_custkey   = c.c_custkey
JOIN nation   n ON c.c_nationkey = n.n_nationkey
JOIN region   r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name, n_name
""",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region/nation with ROLLUP subtotals and grand total.
    nation and region broadcast; the customer join shuffles once on
    custkey; the rollup itself is a single hash-agg pass that emits the
    (r), (r,n), and () grouping sets without re-scanning."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            "revenue",
            "orders",
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "window_running",
    ids="window: running sum + lag delta per partition (§2.7 analytic windows)",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       round(o_totalprice - lag(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta_prev
FROM orders
WHERE o_custkey % 10 = 0
""",
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend and order-over-order delta.  One
    shuffle on the partition key serves both window functions (same
    partitioning + ordering → one sort, one window exec).  Ordering
    includes the unique o_orderkey tiebreak so lag/running values are
    deterministic under hash comparison."""
    o = table(spark, sf_dir, "orders").where(F.col("o_custkey") % 10 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(running), 2).alias("running_spend"),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
        ).alias("delta_prev"),
    )


@register(
    "asof_join_events",
    ids="join: as-of (latest click at-or-before each purchase) via union+window",
    oracle="""
WITH tagged AS (
    SELECT user_id, ts, event_id, 1 AS is_purchase,
           CAST(NULL AS BIGINT) AS click_id
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT user_id, ts, event_id, 0, event_id
    FROM events WHERE event_type = 'click'
), w AS (
    SELECT *, last_value(click_id IGNORE NULLS) OVER (
        PARTITION BY user_id ORDER BY ts, is_purchase, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_id
    FROM tagged
)
SELECT event_id AS purchase_id, user_id, asof_click_id
FROM w WHERE is_purchase = 1
""",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — for every purchase, the latest click by the same user
    at or before the purchase timestamp.  Spark has no ASOF JOIN
    operator; the scalable realization is union both sides, one window
    pass per key ordered by time, ``last(click_id, ignorenulls=True)``.
    Exactly ONE shuffle (on user_id) regardless of either side's size —
    versus the per-row correlated subquery (broadcast-nested-loop) a
    naive translation produces.  Tie rule: a click at the identical
    timestamp sorts before the purchase (is_purchase tiebreak), so
    ts_click <= ts_purchase inclusive semantics hold deterministically."""
    e = table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(1).alias("is_purchase"),
        F.lit(None).cast("long").alias("click_id"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id",
        F.lit(0).alias("is_purchase"),
        F.col("event_id").alias("click_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        purchases.unionByName(clicks)
        .withColumn(
            "asof_click_id", F.last("click_id", ignorenulls=True).over(w)
        )
        .where(F.col("is_purchase") == 1)
        .select(
            F.col("event_id").alias("purchase_id"), "user_id", "asof_click_id"
        )
    )


@register(
    "range_join_events",
    ids="join: time-range (clicks within 60 min before purchase) via bucket expansion",
    oracle="""
SELECT p.event_id AS purchase_id,
       count(c.event_id) AS clicks_before
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 60 MINUTE
 AND c.ts <  p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
""",
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range join — clicks in the 60 minutes before each purchase.
    A naive inequality join is a broadcast-nested-loop (O(n·m) — the
    100 TB trap).  Instead both sides bucket to 1-hour bins: a purchase's
    lookback window spans at most 2 bins, so purchases explode to 2
    (user_id, bin) keys and the join becomes a plain shuffled EQUI-join
    with a residual range filter.  Each click lives in exactly one bin,
    so no dedup is needed; count() ignores the NULLs unmatched exploded
    copies produce, keeping LEFT JOIN zero-count semantics."""
    e = table(spark, sf_dir, "events")
    # `ts` is nanosecond-epoch LongType (TIMESTAMP(NANOS) parquet — see
    # sources.readers.table); bin and range math stay on the raw longs.
    bin_ns = 3_600 * 1_000_000_000  # 60-minute buckets, in nanos
    p = (
        e.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withColumn(
            "bin",
            F.explode(
                F.array(
                    F.expr(f"p_ts div {bin_ns}") - 1,
                    F.expr(f"p_ts div {bin_ns}"),
                )
            ),
        )
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.expr(f"ts div {bin_ns}").alias("bin"),
    )
    joined = p.join(
        c,
        (p.p_user == c.c_user)
        & (p.bin == c.bin)
        & (c.c_ts >= p.p_ts - F.lit(bin_ns))
        & (c.c_ts < p.p_ts),
        "left",
    )
    return (
        joined.groupBy("purchase_id")
        .agg(F.count("click_id").alias("clicks_before"))
    )


@register(
    "grouped_mean_impute",
    ids="A5 variant: per-group mean imputation (per-key aggregate joined back, §2.4 note)",
    oracle="""
WITH cleaned AS (
    SELECT event_id, event_type,
           CASE WHEN value < 0.1 THEN NULL ELSE value END AS value
    FROM events
), imputed AS (
    SELECT event_type,
           coalesce(value, avg(value) OVER (PARTITION BY event_type)) AS value
    FROM cleaned
)
SELECT event_type,
       round(sum(value), 2) AS total_value,
       round(avg(value), 4) AS mean_value,
       count(*) AS n
FROM imputed
GROUP BY event_type
ORDER BY event_type
""",
)
def grouped_mean_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean imputation BY GROUP — the join-back-of-per-key-aggregates
    pattern SURVEY.md §2.4 names as the reference's semantic need
    (``SimpleImputer`` at ``src/train.py:61-66``, generalized per-key).
    Values under the validity floor become NULL (P4 sentinel rule), each
    group's mean is computed once (tiny aggregate), broadcast back, and
    coalesced in — the fact table shuffles once for the final agg; the
    impute join itself is shuffle-free."""
    e = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(F.col("value") < 0.1, None).otherwise(F.col("value")).alias("value"),
    )
    means = e.groupBy("event_type").agg(F.avg("value").alias("_grp_mean"))
    return (
        e.join(F.broadcast(means), "event_type")
        .select(
            "event_type",
            F.coalesce("value", "_grp_mean").alias("value"),
        )
        .groupBy("event_type")
        .agg(
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 4).alias("mean_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "skew_salted_join",
    ids="join: salted skew join (hot-key spreading) — semantics-preserving",
    oracle="""
SELECT c_mktsegment,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment through a SALTED join: the fact side
    gets a random (seeded) salt in [0, 8), the dimension side is
    replicated once per salt value, and the join key becomes
    (custkey, salt) — one hot customer's rows now spread over 8 reducers
    instead of melting one.  The salt never reaches the output, so the
    result hash-matches the plain-join oracle exactly.  This is the
    manual remedy for single-value key skew, the case AQE's skew-join
    partition splitting cannot reach."""
    from big_data_lab_three_spark.operators.relational import salted_join

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        salted_join(o, c, "o_custkey", "c_custkey", salt_buckets=8)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "quantile_profile",
    ids="agg: exact continuous quantiles per group (median / p90 / p99)",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group continuous quantiles — the profiling aggregate a
    data-quality pass runs next to null/distinct counts.

    Scale path (the registered one since r3): Spark's exact
    ``percentile`` buffers EVERY group value in one aggregation buffer
    — with 3 ``l_returnflag`` groups that is all of lineitem's prices
    in three tasks, an OOM at 100×.  Instead, ``global_ranks``
    (operators/rankstats.py) assigns each row its exact per-group rank
    distributed (range partition + local rank + broadcast offsets), and
    the continuous quantile is read off the two rows flanking
    ``h = (n-1)·p`` per group via the shared
    ``operators.rankstats.group_quantiles`` helper (also behind
    ``winsorize_stats``/``anomaly_mad``): ``v_lo + (h-⌊h⌋)·(v_hi-v_lo)``
    — the same interpolation ``percentile``/``quantile_cont`` define, so
    the exact oracle still pins it.  Memory per task is bounded by the
    range partition, never the group."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    qs = group_quantiles(
        li,
        "l_extendedprice",
        ("l_returnflag",),
        {"p50": 0.5, "p90": 0.9, "p99": 0.99},
        count_col="n",
    )
    return qs.select(
        "l_returnflag",
        F.round("p50", 4).alias("p50"),
        F.round("p90", 4).alias("p90"),
        F.round("p99", 4).alias("p99"),
        "n",
    ).orderBy("l_returnflag")


@register(
    "sessionize_batch",
    ids="window: batch sessionization (gap-split via lag + running sum)",
    oracle="""
WITH gaps AS (
    SELECT user_id, epoch_us(ts) AS us, value,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                     > CAST(720 AS BIGINT) * 60 * 1000000
                  OR lag(epoch_us(ts)) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), numbered AS (
    SELECT user_id, us, value,
           sum(new_session) OVER (
               PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_id
    FROM gaps
)
SELECT user_id,
       CAST(session_id AS INT)       AS session_id,
       CAST(count(*) AS INT)         AS n_events,
       round(sum(value), 4)          AS total_value,
       min(us)                       AS start_us,
       max(us)                       AS end_us
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as a BATCH window computation — the SQL-expressible
    twin of the streaming ``applyInPandasWithState`` operator
    (``streaming.sessionize``): a session boundary is a >12h gap in a
    user's event stream; session ids are the running sum of boundary
    flags.  One shuffle on user_id serves the lag, the running sum, and
    (same key) the final per-session aggregation.
    ``tests/test_streaming.py`` cross-checks the two implementations —
    the streaming engine's finalized sessions must appear here verbatim."""
    from big_data_lab_three_spark.sources import events

    gap_us = 720 * 60 * 1_000_000
    ev = events(spark, sf_dir).select(
        "user_id", "event_id", "value",
        F.unix_micros("ts_utc").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = Window.partitionBy("user_id").orderBy("us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    boundary = (
        F.lag("us").over(w).isNull()
        | ((F.col("us") - F.lag("us").over(w)) > gap_us)
    ).cast("int")
    return (
        ev.withColumn("new_session", boundary)
        .withColumn("session_id", F.sum("new_session").over(run).cast("int"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "bilateral_trade",
    ids="join: 5-way star with a self-aliased dim (TPC-H Q7 shape)",
    oracle="""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS ship_year,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders   o  ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey  = c.c_custkey
JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
JOIN nation   cn ON c.c_nationkey = cn.n_nationkey
JOIN nation   sn ON s.s_nationkey = sn.n_nationkey
WHERE sn.n_name < cn.n_name
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
ORDER BY supp_nation, cust_nation, ship_year
""",
)
def bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume (TPC-H Q7 shape): the lineitem fact joins
    orders (key shuffle), then every remaining side — customer,
    supplier, and nation twice under different aliases — broadcasts.
    The date filter pushes to the fact scan, and the asymmetric
    ``supp < cust`` predicate halves the pair matrix without a second
    pass.  One fact shuffle total; the self-aliased dim shows that
    broadcast reuse is free (same 25-row table, two hash relations)."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            # Exact DECIMAL arithmetic: double sums of non-cent-quantized
            # products drift by an ULP with summation order, flipping the
            # round() at half-cent boundaries between engines.  Decimal
            # sums are order-independent and bit-identical to DuckDB's.
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1).cast("decimal(18,4)")
                       - F.col("l_discount").cast("decimal(18,4)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "pivot_matrix",
    ids="agg: pivot (long → wide conditional aggregation)",
    oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN o_totalprice END), 2) AS urgent,
       round(sum(CASE WHEN o_orderpriority = '2-HIGH'
                      THEN o_totalprice END), 2) AS high,
       round(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
                      THEN o_totalprice END), 2) AS medium,
       round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                      THEN o_totalprice END), 2) AS not_specified,
       round(sum(CASE WHEN o_orderpriority = '5-LOW'
                      THEN o_totalprice END), 2) AS low
FROM orders
GROUP BY year(o_orderdate)
ORDER BY order_year
""",
)
def pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue pivot: order year down, priority across.  The pivot
    values are DECLARED explicitly, which matters twice: the plan skips
    the extra distinct-values job Spark otherwise runs, and the output
    schema is static (a 100 TB pivot over undeclared values is two full
    passes and an unbounded column count).  A declared pivot compiles to
    exactly the oracle's conditional aggregation — one hash-agg pass."""
    o = table(spark, sf_dir, "orders")
    pretty = {
        "1-URGENT": "urgent", "2-HIGH": "high", "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "not_specified", "5-LOW": "low",
    }
    wide = (
        o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderpriority", list(pretty))
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return wide.select(
        "order_year",
        *[F.col(f"`{k}`").alias(v) for k, v in pretty.items()],
    ).orderBy("order_year")


@register(
    "window_distribution",
    ids="window: distribution functions (ntile / percent_rank / cume_dist)",
    oracle="""
SELECT c_custkey,
       c_mktsegment,
       CAST(ntile(4) OVER w AS INT)          AS balance_quartile,
       round(percent_rank() OVER w, 6)       AS pct_rank,
       round(cume_dist() OVER w, 6)          AS cume
FROM customer
WHERE c_custkey % 7 = 0
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_mktsegment, c_custkey
""",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — quartile assignment and relative
    rank per market segment.  All three share one (partition, order)
    spec: one exchange, one sort, one window exec.  Ordering carries the
    unique c_custkey tiebreak so ntile boundaries are deterministic."""
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") % 7 == 0)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w).cast("int").alias("balance_quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


@register(
    "returned_revenue",
    ids="join: 4-way + filtered fact + deterministic top-k (TPC-H Q10 shape)",
    oracle="""
SELECT c.c_custkey,
       c.c_name,
       n.n_name,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders   o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey  = c.c_custkey
JOIN nation   n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lost revenue from returned items (TPC-H Q10 shape): the
    returnflag filter pushes into the lineitem scan (~1/4 survives), the
    date filter into orders; customer and nation broadcast; one fact
    shuffle on orderkey, then a customer-keyed aggregate and a
    deterministic top-20 (revenue DESC, custkey tiebreak).  Revenue in
    exact DECIMAL — see pricing_summary."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(price * (one - disc)), 2)
            .cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "forecast_revenue",
    ids="agg: pure filter→reduce, triple pushed predicate (TPC-H Q6 shape)",
    oracle="""
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE)
           AS revenue_increase
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= CAST(0.05 AS DOUBLE)
  AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < 24
""",
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue increase if mid-range discounts were dropped (TPC-H Q6
    shape): no join, no group — just a conjunctive filter and a single
    reduce.  All three predicates (date range, discount band, quantity
    cap) push into the parquet scan, so at 100 TB the plan is pure
    scan-side row-group skipping plus a one-value-per-mapper reduce:
    the cheapest shape a query can have.  Revenue in exact DECIMAL —
    see pricing_summary."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(price * disc), 2)
            .cast("double").alias("revenue_increase")
        )
    )


@register(
    "disjunctive_pushdown",
    ids="join: OR-of-ANDs predicate over broadcast dim (TPC-H Q19 shape)",
    oracle="""
SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1  AND 15
       AND l.l_quantity BETWEEN 1  AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 16 AND 30
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#4'  AND p.p_size BETWEEN 31 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of conjunctive brand/size/quantity branches (TPC-H
    Q19 shape).  The predicate straddles the join, so Catalyst cannot
    apply it until after the match — but it *derives* the single-side
    residuals (the OR of each branch's part-only and lineitem-only
    conjuncts) and pushes those into both scans, shrinking the join
    inputs while the full three-branch filter still runs post-join.
    Part broadcasts; the fact table never shuffles.  At 100 TB the
    derived lineitem residual (quantity ∈ [1,30]) is what keeps the
    probe side scan-bound instead of full-width."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(16, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(31, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(branch)
        .agg(
            F.round(F.sum(price * (one - disc)), 2)
            .cast("double").alias("revenue")
        )
    )


@register(
    "idle_big_spenders",
    ids="join: scalar-subquery threshold + anti join + substring bucket (TPC-H Q22 shape)",
    oracle="""
SELECT cntrycode,
       count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS totacctbal
FROM (
    SELECT substr(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / count(*)
        FROM customer
        WHERE c_acctbal > 0.0
    )
) c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY cntrycode
ORDER BY cntrycode
""",
)
def idle_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Well-funded customers with no *recent* orders, grouped by an
    account code carved out of the customer name (TPC-H Q22 shape): a
    scalar aggregate becomes the filter threshold, then an anti join
    drops everyone who ordered in 2001 (the date filter pushes into the
    orders scan before the anti join ships custkeys).  The one-row average broadcasts (a
    cross join with a 1-row side is a broadcast nested loop of cost
    |customer|), and the anti join ships only custkeys.  The threshold
    is computed as exact-DECIMAL sum ÷ count so both engines divide
    identical doubles — an unrounded double average would drift an ULP
    with summation order and flip membership at the boundary."""
    c = table(spark, sf_dir, "customer")
    thr = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("thr")
        )
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("thr"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select(
            F.substring("c_name", 17, 2).alias("cntrycode"),
            "c_acctbal",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(12,2)")), 2)
            .cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "small_quantity_revenue",
    ids="join: correlated per-group threshold as agg-then-join (TPC-H Q17 shape)",
    oracle="""
SELECT CAST(round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)))
                       AS DOUBLE) / 7.0, 4) AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12'
  AND l.l_quantity < (
      SELECT 0.2 * avg(l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
  )
""",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to small-quantity orders of one brand (TPC-H Q17
    shape).  The correlated per-part average is decorrelated into an
    aggregate-then-join: lineitem is first semi-joined to the brand's
    parts (so the average is computed ONLY for parts that can match),
    the per-part averages — a tiny table, one row per part — broadcast
    back, and the threshold filter runs rowwise.  A naive correlated
    subquery would rescan lineitem per outer row.  Quantities are
    small integers whose sums are exact in double regardless of
    partition order, so both engines derive identical thresholds."""
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(
            F.broadcast(avg_qty), F.col("l_partkey") == F.col("a_partkey")
        )
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
                .cast("double") / 7.0,
                4,
            ).cast("double").alias("avg_yearly")
        )
    )


@register(
    "market_share",
    ids="join: 8-table star with conditional share agg (TPC-H Q8 shape)",
    oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(sum(CASE WHEN n2.n_name = 'NATION_9'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2))) END)
            AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS mkt_share
FROM part, supplier, lineitem, orders, customer,
     nation n1, nation n2, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
  AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND p_type = 'ECONOMY'
GROUP BY o_year
ORDER BY o_year
""",
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_9's share of ECONOMY-part volume sold into EUROPE, per
    year (TPC-H Q8 shape) — the widest join in the corpus: fact table
    against five broadcast dimensions with nation self-aliased for the
    two roles (customer's region membership vs supplier's nationality).
    Only lineitem⋈orders shuffles; every dimension (part filtered to
    one type, supplier, customer, both nation aliases, region)
    broadcasts, and the date filter pushes into the orders scan.  The
    share ratio divides two exact-DECIMAL sums cast to double once —
    identical across engines without rounding (sum(CASE WHEN .. END)
    skips non-matching rows via NULL on both engines)."""
    li = table(spark, sf_dir, "lineitem")
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("n2_name"),
    )
    r = (
        table(spark, sf_dir, "region")
        .where(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    vol = price * (one - disc)
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    return (
        joined.groupBy(
            F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(
            (
                F.sum(F.when(F.col("n2_name") == "NATION_9", vol))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "order_count_histogram",
    ids="join: left-outer + double aggregation (TPC-H Q13 shape)",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-customer order counts (TPC-H Q13 shape):
    LEFT join keeps order-less customers as count 0, then a second
    aggregation histograms the counts.  The first groupBy keys on
    c_custkey (same key as the join — no extra exchange under AQE);
    the second aggregates the already-tiny (customer-cardinality)
    intermediate.  ``count(o_orderkey)`` skips the NULLs a left join
    manufactures, on both engines.  Ordering (custdist DESC, c_count
    DESC) is unique — c_count appears once per histogram row."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "gapfill_timeseries",
    ids="timeseries: hourly gap-fill / temporal densification over a sparse series",
    oracle="""
WITH f AS (
    SELECT date_trunc('hour', ts) AS h
    FROM events WHERE event_type = 'error' AND value >= 200.0
), c AS (
    SELECT h, count(*) AS n FROM f GROUP BY h
), b AS (
    SELECT min(h) AS mn, max(h) AS mx FROM f
), s AS (
    SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b
)
SELECT epoch_us(s.h) AS hour_us, coalesce(c.n, 0) AS n
FROM s LEFT JOIN c ON s.h = c.h
ORDER BY hour_us
""",
)
def gapfill_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly counts of a SPARSE event series with every missing hour
    filled with zero — temporal densification, the step that turns raw
    event logs into a regular series (forecasting inputs, SLO burn
    charts).  The hour spine is generated from a one-row min/max
    aggregate via ``sequence`` + ``explode`` — no driver loop, no
    driver collect — and broadcasts into a LEFT join against the
    pre-aggregated counts: the raw events are touched exactly once, and
    the join side that grows with the time span (the spine) is bounded
    by hours-in-range, not data volume."""
    from big_data_lab_three_spark.sources import events

    f = (
        events(spark, sf_dir)
        .where((F.col("event_type") == "error") & (F.col("value") >= 200.0))
        .select(F.date_trunc("hour", "ts_utc").alias("h"))
    )
    counts = f.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    spine = (
        f.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("h")
        )
    )
    return (
        F.broadcast(spine)
        .join(counts, "h", "left")
        .select(
            F.unix_micros("h").alias("hour_us"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .orderBy("hour_us")
    )


@register(
    "price_histogram",
    ids="agg: fixed-width numeric binning (continuous histogram)",
    oracle="""
SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin,
       count(*) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS total
FROM orders
GROUP BY bin
ORDER BY bin
""",
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width binning of a continuous column (the width_bucket /
    histogram primitive; order_count_histogram covers the discrete
    case).  The bin id is a pure projection, so the whole histogram is
    one hash aggregate — and because the bin expression divides by an
    exact binary-representable constant before ``floor``, bin
    membership is identical across engines."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / F.lit(25000.0))
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("bin")
    )


@register(
    "latest_snapshot",
    ids="window: latest-record-per-key compaction (CDC / upsert-read semantics)",
    oracle="""
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
FROM (
    SELECT user_id, event_id, ts, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
    FROM events
)
WHERE rn = 1
ORDER BY user_id
""",
)
def latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The newest event per user — changelog compaction, i.e. how an
    upsert table reads without a MERGE-capable format: one
    ``row_number`` window per key ordered by event time (event_id
    tiebreak for same-timestamp determinism), filtered to rn = 1.  ONE
    shuffle on the key; at 100 TB the same plan serves as the
    batch-compaction job behind a snapshot view, and a skewed key
    moves it to the salted pattern.  The window filter prunes to one
    row per key BEFORE any downstream join would see the data."""
    from big_data_lab_three_spark.sources import events

    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts_utc"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts_utc").alias("ts_us"),
            "event_type",
            "value",
        )
        .orderBy("user_id")
    )


@register(
    "cdc_upsert_apply",
    ids="temporal versioning: CDC MERGE semantics — changelog applied to a base snapshot (upsert + delete)",
    oracle="""
WITH last AS (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
    FROM events
), applied AS (
    SELECT c.c_custkey,
           c.c_name,
           CASE WHEN l.user_id IS NULL THEN c.c_acctbal
                ELSE round(l.value, 4) END AS acctbal,
           CASE WHEN l.user_id IS NULL THEN 'unchanged'
                ELSE 'updated' END AS merge_action,
           l.event_type AS last_op
    FROM customer c
    LEFT JOIN (SELECT * FROM last WHERE rn = 1) l
           ON l.user_id = c.c_custkey
)
SELECT c_custkey, c_name, acctbal, merge_action
FROM applied
WHERE last_op IS NULL OR last_op <> 'error'
ORDER BY c_custkey
""",
)
def cdc_upsert_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a MERGE-capable table format —
    the batch job every lakehouse upsert pipeline runs: compact the
    changelog to its newest record per key (``latest_snapshot``'s
    window), then LEFT-apply it to the base snapshot: matched keys take
    the new value (upsert), keys whose final record is a tombstone
    (``event_type = 'error'`` stands in for a delete marker) drop out,
    unmatched base rows pass through unchanged.

    Scale shape: the changelog compacts to ≤1 row per key BEFORE the
    join, so the join input is key-bounded, not changelog-bounded; one
    window shuffle + one key-partitioned join, both on ``user_id`` —
    AQE can even reuse the partitioning.  Rewriting only matched
    partitions (partition-overwrite on the join output) is the standard
    deployment; semantics here are the judged part."""
    from big_data_lab_three_spark.sources import events

    ev = events(spark, sf_dir)
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts_utc"), F.desc("event_id")
    )
    last = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "value")
    )
    applied = (
        c.select("c_custkey", "c_name", "c_acctbal")
        .join(last, last.user_id == F.col("c_custkey"), "left")
        .select(
            "c_custkey",
            "c_name",
            F.when(F.col("user_id").isNull(), F.col("c_acctbal"))
            .otherwise(F.round("value", 4))
            .alias("acctbal"),
            F.when(F.col("user_id").isNull(), F.lit("unchanged"))
            .otherwise(F.lit("updated"))
            .alias("merge_action"),
            F.col("event_type").alias("last_op"),
        )
    )
    return (
        applied.where(
            F.col("last_op").isNull() | (F.col("last_op") != "error")
        )
        .drop("last_op")
        .orderBy("c_custkey")
    )


@register(
    "incremental_rollup_merge",
    ids="aggregation: mergeable partial-aggregate state — incremental rollup equals the full recompute",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS revenue,
       CAST(min(o_orderdate) AS DATE) AS first_order,
       CAST(max(o_orderdate) AS DATE) AS last_order
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def incremental_rollup_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance, proven by
    construction: the table is split into two disjoint 'ingest batches'
    (odd/even orderkey — standing in for yesterday's state and today's
    delta), each batch is aggregated to mergeable partial state
    (count/sum/min/max — all commutative monoids), and the states are
    MERGED (sum the counts/sums, min the mins, max the maxes).  The
    oracle aggregates the whole table directly, so the test pins the
    algebra every incremental pipeline relies on: merge(partial(A),
    partial(B)) == full(A ∪ B), with exact-DECIMAL sums so the claim is
    bit-level, not approximate.

    Scale shape: at 100 TB this is the nightly pattern — aggregate ONLY
    the new partition, merge into stored state; the merge input is
    group-cardinality-sized, never data-sized."""
    o = table(spark, sf_dir, "orders")

    def partial(batch: DataFrame) -> DataFrame:
        return batch.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )

    yesterday = partial(o.where(F.col("o_orderkey") % 2 == 0))
    today = partial(o.where(F.col("o_orderkey") % 2 == 1))
    merged = (
        yesterday.unionByName(today)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
            F.min("first_order").alias("first_order"),
            F.max("last_order").alias("last_order"),
        )
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        "revenue",
        F.col("first_order").cast("date").alias("first_order"),
        F.col("last_order").cast("date").alias("last_order"),
    ).orderBy("o_orderpriority")


@register(
    "funnel_conversion",
    ids="window: ordered multi-step funnel (view → click → purchase) with strict event-time progression",
    oracle="""
WITH v AS (
    SELECT user_id, min(epoch_us(ts)) AS t_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
    FROM events e JOIN v ON v.user_id = e.user_id
    WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
    FROM events e JOIN c ON c.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
    GROUP BY e.user_id
)
SELECT count(*)                                    AS n_viewed,
       count(c.user_id)                            AS n_clicked,
       count(p.user_id)                            AS n_purchased,
       CAST(round(CAST(count(c.user_id) AS DOUBLE) / count(*), 4)
            AS DOUBLE)                             AS view_to_click,
       CAST(round(CAST(count(p.user_id) AS DOUBLE)
                  / nullif(count(c.user_id), 0), 4) AS DOUBLE)
                                                   AS click_to_purchase
FROM v
LEFT JOIN c ON c.user_id = v.user_id
LEFT JOIN p ON p.user_id = v.user_id
""",
)
def funnel_conversion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: a user converts a step only with an event
    strictly AFTER their first event of the previous step (first view →
    first later click → first later purchase).  The composition is
    min-aggregates + per-step self-joins, each keyed on ``user_id``.

    Scale shape: every stage is (filter by type → per-user min) — the
    aggregates collapse to ≤1 row per user BEFORE any join, so all
    joins are key-bounded; they share the ``user_id`` partitioning, and
    AQE reuses it instead of re-exchanging.  No windows over raw events
    — the min-per-step formulation avoids materializing per-user event
    sequences entirely."""
    from big_data_lab_three_spark.sources import events

    ev = events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts_utc").alias("us")
    )

    def first_after(evs: DataFrame, etype: str, prev: DataFrame, prev_col: str, out: str) -> DataFrame:
        return (
            evs.where(F.col("event_type") == etype)
            .join(prev, "user_id")
            .where(F.col("us") > F.col(prev_col))
            .groupBy("user_id")
            .agg(F.min("us").alias(out))
        )

    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    c = first_after(ev, "click", v, "t_view", "t_click")
    p = first_after(ev, "purchase", c, "t_click", "t_purchase")
    funnel = (
        v.join(c.select("user_id", "t_click"), "user_id", "left")
        .join(p.select("user_id", "t_purchase"), "user_id", "left")
    )
    n_viewed = F.count(F.lit(1))
    n_clicked = F.count("t_click")
    n_purchased = F.count("t_purchase")
    return funnel.agg(
        n_viewed.alias("n_viewed"),
        n_clicked.alias("n_clicked"),
        n_purchased.alias("n_purchased"),
        F.round(n_clicked.cast("double") / n_viewed, 4)
        .cast("double")
        .alias("view_to_click"),
        F.round(
            n_purchased.cast("double") / F.nullif(n_clicked, F.lit(0)), 4
        )
        .cast("double")
        .alias("click_to_purchase"),
    )


@register(
    "retention_cohorts",
    ids="temporal analytics: weekly retention cohorts (first-activity week × weeks-since)",
    oracle="""
WITH firsts AS (
    SELECT user_id,
           min(epoch_us(date_trunc('week', ts))) AS cohort_us
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT e.user_id,
           f.cohort_us,
           (epoch_us(date_trunc('week', e.ts)) - f.cohort_us)
               // (CAST(7 AS BIGINT) * 86400 * 1000000) AS week_n
    FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT cohort_us,
       CAST(week_n AS BIGINT) AS week_n,
       count(*) AS n_active
FROM activity
GROUP BY cohort_us, week_n
ORDER BY cohort_us, week_n
""",
)
def retention_cohorts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users grouped by their first-activity
    week (cohort), counted as active in every later week they appear —
    the engagement report every product-analytics stack runs.

    Scale shape: one per-user min (cohort), one distinct over (user,
    week) — both key-partitioned aggregates on ``user_id`` — then a
    group-cardinality-sized final rollup.  The cohort join input is ≤1
    row per user; no windows, no self-join over raw events."""
    from big_data_lab_three_spark.sources import events

    ev = events(spark, sf_dir).select(
        "user_id",
        F.unix_micros(F.date_trunc("week", F.col("ts_utc"))).alias("week_us"),
    )
    firsts = ev.groupBy("user_id").agg(F.min("week_us").alias("cohort_us"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_us",
            F.expr("(week_us - cohort_us) div (CAST(7 AS BIGINT) * 86400 * 1000000)").alias(
                "week_n"
            ),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_us", "week_n")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_us", "week_n")
    )


@register(
    "equi_depth_histogram",
    ids="window: equi-depth histogram via ntile — the complement of the fixed-width price_histogram",
    oracle="""
WITH t AS (
    SELECT o_totalprice,
           ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
    FROM orders
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       count(*) AS n_orders,
       CAST(round(min(o_totalprice), 2) AS DOUBLE) AS lo,
       CAST(round(max(o_totalprice), 2) AS DOUBLE) AS hi
FROM t
GROUP BY bucket
ORDER BY bucket
""",
)
def equi_depth_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (equal row counts per bucket, data-driven
    boundaries) over order totals — what an optimizer's statistics
    collector or a skew diagnosis computes, complementing
    ``price_histogram``'s fixed-width bins.  Bucket membership is made
    deterministic with an ``o_orderkey`` tiebreak so both engines
    assign identical rows to identical buckets.

    Scale path (the registered one since r3): the EXACT ntile answer,
    but computed distributed — ``global_ranks`` range-partitions on
    ``(o_totalprice, o_orderkey)``, ranks locally per partition, and
    shifts by broadcast per-partition offsets (operators/rankstats.py);
    ``ntile_from_rank`` then derives the SQL-standard bucket from the
    rank in closed form.  No row ever passes through a single-task
    ``WindowExec`` — the only serialized work is the ∼32-row offsets
    frame.  The oracle pins it against DuckDB's native ``ntile``,
    row-for-row."""
    o = table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    ranked = global_ranks(
        o, order_cols=("o_totalprice", "o_orderkey")
    )
    t = ranked.select(
        "o_totalprice",
        ntile_from_rank(F.col(RANK_COL), F.col(N_COL), 10)
        .cast("int")
        .alias("bucket"),
    )
    return (
        t.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).cast("double").alias("lo"),
            F.round(F.max("o_totalprice"), 2).cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "window_range_frames",
    ids="window: value-based RANGE frames (trailing 7-day revenue over a daily series)",
    oracle="""
WITH daily AS (
    SELECT o_orderpriority,
           date_diff('day', DATE '1992-01-01', o_orderdate) AS day_n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                AS DOUBLE) AS day_rev,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
)
SELECT o_orderpriority,
       CAST(day_n AS BIGINT) AS day_n,
       round(sum(day_rev) OVER w7, 2) AS trailing_7d_rev,
       CAST(sum(n_orders) OVER w7 AS BIGINT) AS trailing_7d_orders,
       round(min(day_rev) OVER w7, 2) AS trailing_7d_min_day
FROM daily
WINDOW w7 AS (
    PARTITION BY o_orderpriority ORDER BY day_n
    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
)
ORDER BY o_orderpriority, day_n
""",
)
def window_range_frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE window frames — the time-series shape ROWS
    frames get wrong whenever days are missing: ``RANGE BETWEEN 6
    PRECEDING`` covers the last 7 CALENDAR days of the ordered value,
    however many rows exist in them.  Computed over a per-(priority,
    day) pre-aggregate, so (a) the window input is days × priorities,
    orders of magnitude below the fact table, and (b) the frame has no
    peer rows — every RANGE aggregate is tie-free and deterministic.
    One shuffle for the daily rollup; the window reuses the rollup's
    partitioning requirement on o_orderpriority."""
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            "o_orderpriority",
            F.datediff(
                F.col("o_orderdate"), F.lit("1992-01-01").cast("date")
            ).alias("day_n"),
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2
            )
            .cast("double")
            .alias("day_rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w7 = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day_n")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "o_orderpriority",
        F.col("day_n").cast("long").alias("day_n"),
        F.round(F.sum("day_rev").over(w7), 2).alias("trailing_7d_rev"),
        F.sum("n_orders").over(w7).cast("long").alias("trailing_7d_orders"),
        F.round(F.min("day_rev").over(w7), 2).alias("trailing_7d_min_day"),
    ).orderBy("o_orderpriority", "day_n")


@register(
    "skyline_pareto",
    ids="operator: 2-D skyline / Pareto frontier (SFS local prune + exact sweep) — dominance query",
    oracle="""
SELECT p.p_partkey, p.p_size, p.p_retailprice
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_retailprice <= p.p_retailprice
      AND q.p_size >= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
ORDER BY p.p_partkey
""",
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of ``part`` under (minimize retail
    price, maximize size): every part no other part dominates — the
    multi-criteria shortlist operator.  The oracle states dominance
    declaratively (quadratic NOT EXISTS — fine for DuckDB at oracle
    scale, lethal at 100 TB); the engine path is
    :func:`operators.relational.skyline_2d` — distributed
    sort-filter-skyline: mapInPandas local prune per partition, exact
    sweep on the tiny pruned frontier, broadcast rejoin (see its
    docstring for why each stage scales).  The same operator is
    property-tested against the quadratic definition on arbitrary
    point sets (tests/test_properties.py)."""
    part = table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    return skyline_2d(part, "p_retailprice", "p_size").orderBy("p_partkey")


@register(
    "target_encode",
    ids="ml-features: smoothed target (mean) encoding of a categorical column — the leakage-aware feature-engineering table",
    oracle="""
WITH g AS (
    SELECT sum(o_totalprice) / count(*) AS gmean FROM orders
), cat AS (
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           sum(o_totalprice) AS s
    FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       n,
       round(s / n, 4) AS cat_mean,
       round((s + 10 * gmean) / (n + 10), 4) AS encoded,
       round((s + 10 * gmean) / (n + 10) - gmean, 4) AS shift_vs_global
FROM cat CROSS JOIN g
ORDER BY o_orderpriority
""",
)
def target_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding (the standard mean-encoding feature for
    gradient-boosted and linear models): each category's encoding is
    the Bayesian shrinkage ``(Σy_c + m·ȳ) / (n_c + m)`` with m=10 — a
    rare category pulls toward the global mean instead of memorizing
    its few targets, which is the leakage-control half of the
    technique.  ``shift_vs_global`` surfaces how far each category
    moves the prior, the quantity a feature audit reviews.

    Scale shape: one partial-aggregating rollup keyed by the category
    plus a 1-row global aggregate broadcast into the projection — two
    scans collapse to one exchange each, no window, no row-level
    output (the per-row encoded column at 100 TB is a broadcast map
    join of THIS table, not a recompute)."""
    o = table(spark, sf_dir, "orders")
    g = o.agg(
        (F.sum("o_totalprice") / F.count(F.lit(1))).alias("gmean")
    )
    cat = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").alias("s"),
    )
    return (
        cat.crossJoin(F.broadcast(g))
        .select(
            "o_orderpriority",
            "n",
            F.round(F.col("s") / F.col("n"), 4).alias("cat_mean"),
            F.round(
                (F.col("s") + 10 * F.col("gmean")) / (F.col("n") + 10), 4
            ).alias("encoded"),
            F.round(
                (F.col("s") + 10 * F.col("gmean")) / (F.col("n") + 10)
                - F.col("gmean"),
                4,
            ).alias("shift_vs_global"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "copurchase_topk",
    ids="analytics: market-basket co-purchase top-3 per part (self-join on basket key, bounded pair fan-out)",
    oracle="""
WITH basket AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
), sym AS (
    SELECT pa AS part, pb AS other, n_orders FROM pairs
    UNION ALL
    SELECT pb AS part, pa AS other, n_orders FROM pairs
), ranked AS (
    SELECT part, other, n_orders,
           row_number() OVER (
               PARTITION BY part
               ORDER BY n_orders DESC, other ASC) AS rn
    FROM sym WHERE n_orders >= 2
)
SELECT part, other, n_orders, CAST(rn AS INT) AS rank
FROM ranked WHERE rn <= 3
ORDER BY part, rank
""",
)
def copurchase_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-purchase affinity: for every part, the top-3 parts
    most often sharing an order with it (≥2 co-occurrences) — the
    classic market-basket / "customers also bought" table.

    Scale shape: the pair generation is a self-join keyed on the BASKET
    id, so fan-out per order is C(items, 2) with items ≤ 7 in this
    schema — bounded per basket, linear overall (the trap at 100 TB is
    pairing on the ITEM side, which explodes on popular items; keying
    on the basket avoids it).  The ``pa < pb`` canonical orientation
    halves the pair table; symmetry is restored by a cheap union of
    projections of the AGGREGATED pair counts, not of the raw pairs.
    All values are exact integers with id tiebreaks — no rounding
    conventions needed anywhere."""
    li = table(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.select(
        "l_orderkey", F.col("l_partkey").alias("pa")
    )
    b = basket.select(
        "l_orderkey", F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    sym = pairs.select(
        F.col("pa").alias("part"), F.col("pb").alias("other"), "n_orders"
    ).unionByName(
        pairs.select(
            F.col("pb").alias("part"),
            F.col("pa").alias("other"),
            "n_orders",
        )
    )
    w = Window.partitionBy("part").orderBy(
        F.desc("n_orders"), F.asc("other")
    )
    return (
        sym.where(F.col("n_orders") >= 2)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .orderBy("part", "rank")
    )


@register(
    "ab_test_ztest",
    ids="analytics: two-proportion z-test for an A/B split (experimentation readout, closed-form from integer counts)",
    oracle="""
WITH assigned AS (
    SELECT user_id % 2 AS variant,
           CASE WHEN value > 50 THEN 1 ELSE 0 END AS converted
    FROM events
), v AS (
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(converted) AS BIGINT) AS conv
    FROM assigned GROUP BY variant
), wide AS (
    SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
           max(CASE WHEN variant = 0 THEN conv END) AS c0,
           max(CASE WHEN variant = 1 THEN n END) AS n1,
           max(CASE WHEN variant = 1 THEN conv END) AS c1
    FROM v
)
SELECT n0, c0, n1, c1,
       round(CAST(c0 AS DOUBLE) / n0, 4) AS p0,
       round(CAST(c1 AS DOUBLE) / n1, 4) AS p1,
       round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
             / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)), 4) AS z_stat,
       abs((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
           / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                  * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                  * (1.0 / n0 + 1.0 / n1))) > 1.96 AS significant_95
FROM wide
""",
)
def ab_test_ztest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic 50/50 user split —
    the experimentation readout an analytics engine serves daily: a
    pooled-variance z statistic for conversion (value > 50) between
    variants, with the 95% two-sided decision.

    Every input to the closed form is an exact integer count, so the
    statistic is one fixed float expression evaluated identically on
    both engines — round(4) only on the reported columns.  (The split
    here is ``user_id % 2`` for determinism; a production assignment
    hashes a salt + user id — same engine-portable md5 idiom as
    ``cv_fold_balance``.)

    Scale shape: one conditional aggregation pass keyed by the 2-value
    variant — map-side partial, 2-row exchange, then a 1-row pivot and
    pure projection."""
    e = table(spark, sf_dir, "events")
    assigned = e.select(
        F.pmod(F.col("user_id"), F.lit(2)).alias("variant"),
        (F.col("value") > 50).cast("long").alias("converted"),
    )
    v = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (p1 - p0) / F.sqrt(
        pp * (1 - pp) * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(p0, 4).alias("p0"),
        F.round(p1, 4).alias("p1"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


@register(
    "skew_profile",
    ids="ops: join-key skew profiler (max/mean ratio, top-1 share, exact Gini) — the pre-flight check before keying a shuffle",
    oracle="""
WITH k AS (
    SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_suppkey
), ranked AS (
    SELECT cnt,
           row_number() OVER (ORDER BY cnt ASC, l_suppkey ASC) AS r
    FROM k
), tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(max(cnt) AS BIGINT) AS max_cnt
    FROM k
)
SELECT n_keys, n_rows, max_cnt,
       round(CAST(n_rows AS DOUBLE) / n_keys, 4) AS mean_cnt,
       round(CAST(max_cnt AS DOUBLE) * n_keys / n_rows, 4)
           AS max_over_mean,
       round(CAST(max_cnt AS DOUBLE) / n_rows, 6) AS top1_share,
       round(CAST((SELECT sum((2 * r - n_keys - 1) * cnt) FROM ranked)
                  AS DOUBLE) / (CAST(n_keys AS DOUBLE) * n_rows), 4)
           AS gini
FROM tot
""",
)
def skew_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for ``l_suppkey`` — the pre-flight a
    shuffle-keying decision reads: max/mean partition-load ratio
    (≈ the straggler factor a plain hash join would suffer), top-1 key
    share, and the exact Gini coefficient of the key distribution via
    the rank identity ``Σ(2r−n−1)·cnt / (n·total)`` — an
    order-independent INTEGER sum (ranks are deterministic with the
    key tiebreak), so no float-summation drift exists to round away.
    `skew_salted_join` is the treatment; this query is the diagnosis.

    Scale shape: one (key) rollup — bounded by key cardinality — then
    a window over the KEY table (not the fact table) for ranks and a
    1-row profile."""
    li = table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.asc("cnt"), F.asc("l_suppkey"))
    ranked = k.withColumn("r", F.row_number().over(w))
    g = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.sum(F.col("r") * F.col("cnt")).alias("rc"),
    ).withColumn(
        # Σ(2r−n−1)·cnt = 2Σr·cnt − (n+1)Σcnt — keeps the Gini sum a
        # plain integer aggregate (no window inside an aggregate)
        "gsum",
        2 * F.col("rc") - (F.col("n_keys") + 1) * F.col("n_rows"),
    )
    return g.select(
        "n_keys",
        "n_rows",
        "max_cnt",
        F.round(F.col("n_rows").cast("double") / F.col("n_keys"), 4).alias(
            "mean_cnt"
        ),
        F.round(
            F.col("max_cnt").cast("double")
            * F.col("n_keys")
            / F.col("n_rows"),
            4,
        ).alias("max_over_mean"),
        F.round(
            F.col("max_cnt").cast("double") / F.col("n_rows"), 6
        ).alias("top1_share"),
        F.round(
            F.col("gsum").cast("double")
            / (F.col("n_keys").cast("double") * F.col("n_rows")),
            4,
        ).alias("gini"),
    )
