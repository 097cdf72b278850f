"""Set operations, grouping-set completion, and wide→long reshaping.

Extends the reference's set-operation surface (SURVEY.md §2.4: unions
U1/U2 and dedup U3 are its only set ops) with the remaining ANSI
relational set operators — INTERSECT and EXCEPT — plus the two reshape
operators that complete families started elsewhere in the corpus:
CUBE (rollup_revenue covers ROLLUP) and unpivot/melt (pivot_matrix
covers the wide direction).

Physical shapes at 100 TB:

- INTERSECT plans as distinct + left-semi join: both sides reduce to
  their key sets before any pairing, so the exchange carries unique
  keys, never source rows.
- EXCEPT plans as distinct + left-anti join — same key-only profile.
- CUBE is ONE hash-aggregate pass over an Expand node (4 grouping
  sets from a single scan), not four scans.
- unpivot is a projection-only Expand — no shuffle at all; the tiny
  aggregate that feeds it here is the usual partial-agg shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.sources import table


@register(
    "set_intersect",
    ids="setop: INTERSECT (distinct + semi join) — customers active in both order states",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_custkey
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers holding both finished ('F') and open ('O') orders, via
    INTERSECT.  Spark plans this as distinct-then-left-semi: each side's
    scan is pruned to the single key column with the status filter
    pushed down, both sides de-duplicate map-side before the exchange,
    and the semi join pairs unique keys only — at 100 TB the shuffle
    carries customer-cardinality, not order-cardinality, rows."""
    o = table(spark, sf_dir, "orders")
    f_side = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o_side = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_side.intersect(o_side).orderBy("o_custkey")


@register(
    "set_except",
    ids="setop: EXCEPT (distinct + anti join) — customers who lapsed after 1997",
    oracle="""
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01'
ORDER BY o_custkey
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who ordered during 1997 but never after — EXCEPT as
    distinct + left-anti join.  Both date filters push to the parquet
    scans and both sides project to the key column alone; the anti
    probe side additionally de-duplicates, so neither exchange ever
    exceeds distinct-customer cardinality."""
    o = table(spark, sf_dir, "orders")
    in_97 = o.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    after = o.where(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select("o_custkey")
    # subtract == ANSI EXCEPT (distinct) — exceptAll would keep
    # multiplicity and let repeat 1997 customers survive the subtraction
    return in_97.subtract(after).orderBy("o_custkey")


@register(
    "cube_revenue",
    ids="agg: CUBE grouping sets (status × priority, all four subtotal planes)",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL')    AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL')  AS o_orderpriority,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS revenue,
       count(*) AS orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
""",
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order revenue across every (status, priority) plane — CUBE emits
    the (s,p), (s,·), (·,p), and (·,·) grouping sets from ONE
    hash-aggregate over an Expand node; the naive equivalent is four
    scans unioned.  Completes the grouping-sets family next to
    rollup_revenue's hierarchy.  Revenue sums in exact decimal on both
    engines (grouping-null placeholders coalesced to 'ALL' so the
    sort keys are total)."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias(
                "o_orderpriority"
            ),
            "revenue",
            "orders",
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@register(
    "unpivot_metrics",
    ids="reshape: unpivot/melt (inverse of pivot_matrix) — wide per-flag metrics to long",
    oracle="""
WITH wide AS (
    SELECT l_returnflag,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
                AS DOUBLE) AS sum_price,
           CAST(count(*) AS DOUBLE) AS line_count
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price', sum_price FROM wide
UNION ALL
SELECT l_returnflag, 'line_count', line_count FROM wide
ORDER BY l_returnflag, metric
""",
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag metric triple melted to (flag, metric, value) long
    form — the inverse reshape of pivot_matrix.  ``DataFrame.unpivot``
    is a projection-only Expand (one output row per id × value column):
    no shuffle, no UNION-ALL rescan of the aggregate, and the upstream
    groupBy is the only exchange.  All three metrics cast to double so
    the melted value column is single-typed on both engines; the price
    sum is exact-decimal before the cast."""
    wide = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_price"),
            F.count(F.lit(1)).cast("double").alias("line_count"),
        )
    )
    return (
        wide.unpivot(
            ["l_returnflag"],
            ["sum_qty", "sum_price", "line_count"],
            "metric",
            "value",
        )
        .orderBy("l_returnflag", "metric")
    )


_GROUPING_SETS_SQL = """
SELECT CASE WHEN grouping(o_orderstatus) = 0
            THEN 'by_status' ELSE 'by_priority' END AS plane,
       coalesce(o_orderstatus, o_orderpriority) AS group_key,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS revenue,
       count(*) AS orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY plane, group_key
"""


@register(
    "grouping_sets_revenue",
    ids="agg: explicit GROUPING SETS (independent subtotal planes) + GROUPING() marker",
    oracle=_GROUPING_SETS_SQL,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouping-sets shape neither ROLLUP nor CUBE can express:
    exactly the two independent one-column subtotal planes (by status,
    by priority) with no cross plane and no grand total — one Expand +
    one hash aggregate instead of two scans unioned.  ``GROUPING()``
    disambiguates which plane a row belongs to (the correct way —
    coalescing NULLs alone cannot distinguish a grouping placeholder
    from a genuinely NULL key).  The SAME ANSI text runs verbatim on
    both engines (the ``sql_front_door`` pattern), so the grouping-set
    semantics, marker function, and exact-decimal sums are all
    value-hash-pinned."""
    from big_data_lab_three_spark.sources import sql as run_sql

    return run_sql(spark, sf_dir, _GROUPING_SETS_SQL)
