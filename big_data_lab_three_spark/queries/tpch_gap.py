"""Remaining TPC-H query shapes (Q2, Q9, Q11, Q12, Q16, Q20, Q21).

Completes the 22-shape TPC-H sweep started in ``queries/analytics.py``
and ``queries/core.py``.  The driver's star schema has no ``partsupp``
table and no ``l_shipmode / l_commitdate / l_receiptdate`` columns, so
each query keeps the *physical shape* that makes its TPC-H original
interesting — correlated-min decorrelation, multi-way star with LIKE
pushdown, scalar-subquery HAVING, NOT-IN anti join with count-distinct,
nested-aggregate semi join, double-EXISTS self-join — re-targeted at the
columns that exist:

- lineitem stands in for partsupp as the part↔supplier relation
  (unit price from l_extendedprice / l_quantity replaces ps_supplycost,
  shipped quantity replaces ps_availqty);
- l_returnflag = 'R' stands in for "late" in the Q21 blame query;
- o_orderpriority buckets stand in for shipmode in the Q12 census.

All joins are shaped for 100 TB: dimensions broadcast, fact-table
scans carry only the columns the query needs, existence predicates ship
keys not payloads, and correlated subqueries are decorrelated into
single-pass window/aggregate plans instead of per-row rescans.

The reference itself has zero joins (SURVEY.md §2.4 no-join note —
`/root/reference/src/` never calls pandas merge/join); this corpus
supplies the join surface "same query capabilities" implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.sources import table


@register(
    "cheapest_supplier",
    ids="join: correlated-min decorrelated to a window (TPC-H Q2 shape)",
    oracle="""
WITH price AS (
    SELECT l_partkey, l_suppkey,
           min(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE)
               / l_quantity) AS unit_cost
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'PROMO' AND p_size <= 15
    GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       CAST(round(unit_cost, 4) AS DOUBLE) AS unit_cost
FROM price
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE unit_cost = (SELECT min(unit_cost) FROM price p2
                   WHERE p2.l_partkey = price.l_partkey)
ORDER BY s_acctbal DESC, s_name, p_partkey, s_name
LIMIT 100
""",
)
def cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-price supplier per part (TPC-H Q2 shape), with lineitem's
    observed unit price (l_extendedprice / l_quantity) standing in for
    ps_supplycost.  The correlated ``= (SELECT min(..))`` subquery is
    decorrelated into ONE window pass: the per-(part, supplier) price
    list is partitioned by part and each row compares against
    ``min() OVER`` — no second scan, no per-row rescan.  The part
    filter is applied BEFORE the price aggregation (broadcast semi
    shape), so at 100 TB the groupBy only ever sees candidate parts'
    lineitems.  Unit prices are computed double-identically on both
    engines (exact decimal cast, then one double division), so the
    min-equality filter cannot drift.  LIMIT is paired with a unique
    (s_acctbal, s_name, p_partkey) ordering."""
    p = (
        table(spark, sf_dir, "part")
        .where((F.col("p_type") == "PROMO") & (F.col("p_size") <= 15))
        .select("p_partkey", "p_brand")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    unit = (
        F.col("l_extendedprice").cast("decimal(12,2)").cast("double")
        / F.col("l_quantity")
    )
    price = li.groupBy("l_partkey", "l_suppkey", "p_partkey", "p_brand").agg(
        F.min(unit).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    best = price.withColumn("min_cost", F.min("unit_cost").over(w)).where(
        F.col("unit_cost") == F.col("min_cost")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        best.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("unit_cost", 4).cast("double").alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "nation_profit",
    ids="join: 5-way star + LIKE pushdown + year rollup (TPC-H Q9 shape)",
    oracle="""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE) AS profit
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN part     ON p_partkey = l_partkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
""",
)
def nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation revenue by order year for parts matching a name
    substring (TPC-H Q9 shape, minus the partsupp cost term the schema
    lacks).  The LIKE filter prunes part to a broadcast-sized dim BEFORE
    the fact join, supplier and nation broadcast, and only
    lineitem⋈orders shuffles — one exchange for a five-table star.  The
    year is extracted AFTER the join from the order date and grouped
    with the nation in a single hash aggregate.  Revenue sums in exact
    decimal on both engines, rounded once at the end."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(F.sum(price * (one - disc)), 2)
            .cast("double")
            .alias("profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "important_parts",
    ids="agg: scalar-subquery HAVING over grouped value (TPC-H Q11 shape)",
    oracle="""
WITH value AS (
    SELECT l_partkey,
           sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS val
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
)
SELECT l_partkey,
       CAST(round(val, 2) AS DOUBLE) AS part_value
FROM value
WHERE CAST(val AS DOUBLE) > 0.001 * (
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_7'
)
ORDER BY part_value DESC, l_partkey
""",
)
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts that carry an outsized share of one nation's shipped value
    (TPC-H Q11 shape, lineitem value standing in for partsupp stock
    value).  The per-part value table is computed ONCE and persisted;
    the grand total — the scalar subquery — is a second tiny aggregate
    over that same cached intermediate, broadcast back as a one-row
    cross join, so the fact table is scanned exactly once even though
    the SQL text reads it twice.  Value sums are exact decimal on both
    engines; the 0.001 fraction multiplies identical doubles, so
    threshold membership cannot drift at the boundary."""
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_7")
        .select("n_nationkey")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    value = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("val")
    )
    value.persist()
    total = value.agg(
        (F.sum("val").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        value.crossJoin(F.broadcast(total))
        .where(F.col("val").cast("double") > F.col("threshold"))
        .select(
            "l_partkey",
            F.round("val", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@register(
    "priority_shipping",
    ids="join: fact-fact equi-join + conditional census (TPC-H Q12 shape)",
    oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'N'
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority census per line status (TPC-H Q12 shape, with
    l_linestatus standing in for the schema's missing l_shipmode).
    Both fact scans are pre-projected to exactly the columns the query
    touches (lineitem: 2 join/group columns after the pushed returnflag
    + shipdate filters; orders: key + priority), so the one
    unavoidable fact-fact shuffle ships minimal payload.  The
    high/low split is a conditional sum inside a single hash
    aggregate — not two passes."""
    li = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_returnflag") == "N")
            & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "supplier_part_census",
    ids="join: NOT-IN anti join + count-distinct census (TPC-H Q16 shape)",
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def supplier_part_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct suppliers can deliver each (brand, type, size)
    bucket, excluding black-listed suppliers (TPC-H Q16 shape, lineitem
    standing in for the partsupp relation).  The NOT IN becomes a
    broadcast left-anti join on the (non-null) supplier key — safe here
    because s_suppkey is never null; a nullable NOT-IN column would
    need the null-aware variant.  Part prunes to the IN-list sizes
    before the fact join and broadcasts.  count(DISTINCT) expands to
    Spark's two-phase distinct aggregate: partial per-partition
    de-dup before the exchange, so the shuffle carries unique
    (bucket, suppkey) pairs, not raw lineitems."""
    p = (
        table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#3")
            & (F.col("p_type") != "MEDIUM")
            & (F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "excess_suppliers",
    ids="join: nested-aggregate semi join (TPC-H Q20 shape)",
    oracle="""
WITH shipped AS (
    SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
)
SELECT s_name, CAST(round(CAST(s_acctbal AS DECIMAL(12,2)), 2) AS DOUBLE)
           AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM shipped s1
    WHERE qty > 0.3 * (SELECT sum(qty) FROM shipped s2
                       WHERE s2.l_partkey = s1.l_partkey)
)
ORDER BY s_name
""",
)
def excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who dominate the yearly flow of some 'small%' part —
    shipping over 30% of its total (TPC-H Q20 shape: IN over a
    nested-aggregate subquery; shipped quantity stands in for the
    schema's missing ps_availqty).  The correlated per-part total is
    ONE window sum over the already-aggregated (supplier, part)
    quantity table — no rescan; the qualifying supplier keys then
    semi-join supplier, so the dimension never carries non-matching
    rows forward.  Quantities are small integers summed exactly in
    double; the 0.3 multiplier is the same literal double on both
    engines."""
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    shipped = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_suppkey", "l_partkey", "l_quantity")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    keys = (
        shipped.withColumn("part_total", F.sum("qty").over(w))
        .where(F.col("qty") > F.lit(0.3) * F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(keys, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select(
            "s_name",
            F.round(F.col("s_acctbal").cast("decimal(12,2)"), 2)
            .cast("double")
            .alias("s_acctbal"),
        )
        .orderBy("s_name")
    )


@register(
    "sole_blame_suppliers",
    ids="join: double-EXISTS self-join as one-pass window (TPC-H Q21 shape)",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders     ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for returned items in multi-supplier
    finished orders (TPC-H Q21 shape; l_returnflag = 'R' stands in for
    the schema's missing receipt-after-commit lateness).  The classic
    plan needs THREE lineitem scans (l1, EXISTS l2, NOT-EXISTS l3);
    here both existence predicates are decorrelated into ONE scan:
    aggregate lineitem to (order, supplier) with its returned-line
    count, then a window over the order computes the number of
    co-suppliers and the order's total returned lines.  A row
    qualifies iff it has returned lines, has co-suppliers
    (supplier_cnt > 1 ⇔ EXISTS), and owns ALL the order's returned
    lines (own = total ⇔ NOT EXISTS).  numwait counts qualifying
    *lineitems* (sum of per-pair returned-line counts), matching the
    row-granularity of the SQL's count(*).  At 100 TB this turns two
    fact-fact self-joins into one map-side-combined aggregate plus a
    same-key window — a single exchange of (order, supplier) pairs."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("r_lines")
    )
    w = Window.partitionBy("l_orderkey")
    qual = (
        per_pair.withColumn("supplier_cnt", F.count(F.lit(1)).over(w))
        .withColumn("total_r", F.sum("r_lines").over(w))
        .where(
            (F.col("r_lines") > 0)
            & (F.col("supplier_cnt") > 1)
            & (F.col("total_r") == F.col("r_lines"))
        )
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qual.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("r_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
