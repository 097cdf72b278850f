"""Relational query corpus (SURVEY.md §7.2) — one registry entry per
SQL-expressible operator from the §2 inventory, over the driver's
TPC-H-ish tables.

Each function's docstring names the §2 operator IDs it exercises and the
reference behavior it re-expresses (file:line into ``/root/reference``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_lab_three_spark.operators import (
    binarize_label,
    confusion_matrix,
    classification_report,
    distinct_profile,
    null_profile,
    topk,
    union_by_name,
    value_counts,
    zscore,
)
from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.schemas import conform
from big_data_lab_three_spark.sources import table


# --------------------------------------------------------------------------
# Flagship
# --------------------------------------------------------------------------

@register(
    "pricing_summary",
    ids="A1,A5,A9 aggregate shapes; flagship",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                      * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query (TPC-H Q1 shape): scan → filter → wide hash-agg →
    sort.  Exercises the whole Catalyst path: parquet predicate pushdown on
    ``l_shipdate``, column pruning to 7 of 11 columns, map-side partial
    aggregation, 6-group final agg.  At 100 TB this plan is scan-bound, as
    it should be — no joins, one shuffle of 6 partial rows per mapper."""
    li = table(spark, sf_dir, "lineitem")
    # Exact DECIMAL money math (values are cent-quantized, casts lossless):
    # double sums of price*(1-disc) products drift an ULP with summation
    # order and can flip round() at half-cent boundaries vs the oracle.
    # Decimal sums are order-independent and engine-identical; averages
    # derive from the exact sums so both engines divide identical doubles.
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    cnt = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(price * (one - disc)), 2)
            .cast("double").alias("sum_disc_price"),
            F.round(F.sum(price * (one - disc) * (one + tax)), 2)
            .cast("double").alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / cnt, 4).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / cnt, 4).alias("avg_price"),
            F.round(F.sum(disc).cast("double") / cnt, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Projections / filters / per-column transforms (§2.2)
# --------------------------------------------------------------------------

@register(
    "scan_project",
    ids="S1,P2",
    oracle="""
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity < 10
""",
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+P2 — scan with column pruning (reference drop-list projection,
    ``src/preprocess.py:65-88``).  ``.explain`` shows ReadSchema with
    exactly 4 columns and PushedFilters on ``l_quantity``."""
    return (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") < 10)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    )


@register(
    "strip_conform",
    ids="P1,P6",
    oracle="""
SELECT o_orderkey,
       o_totalprice,
       CAST(NULL AS DOUBLE) AS o_projected_margin
FROM orders
""",
)
def strip_conform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P6 — schema conform to a contract with a missing column
    (reference ``src/predict.py:138`` ``reindex(columns=...,
    fill_value=nan)``): absent ``o_projected_margin`` becomes typed NULLs.
    Pure projection — scan pruned to the 2 present contract columns."""
    o = table(spark, sf_dir, "orders")
    return conform(o, ["o_orderkey", "o_totalprice", "o_projected_margin"])


@register(
    "binarize_label",
    ids="P3",
    oracle="""
SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS state,
       count(*) AS n
FROM orders
GROUP BY 1
ORDER BY state
""",
)
def binarize_label_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — label binarization (reference ``src/preprocess.py:84``:
    ``1 if a == 'BENIGN' else 0``, NULL → 0) + group counts."""
    o = table(spark, sf_dir, "orders")
    return (
        binarize_label(o, src="o_orderstatus", positive="F", out="state")
        .groupBy("state")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("state")
    )


@register(
    "nullify_outliers",
    ids="P4",
    oracle="""
WITH nulled AS (
  SELECT CASE WHEN value > 250 OR value < 0.1 THEN NULL ELSE value END AS v
  FROM events
)
SELECT count(*)                           AS n_rows,
       count(v)                           AS n_valid,
       count(*) - count(v)                AS n_nulled,
       round(avg(v), 4)                   AS avg_valid
FROM nulled
""",
)
def nullify_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — sentinel/invalid numeric → NULL then aggregate (reference
    ``src/preprocess.py:85`` normalizes ±inf to NaN/NULL; the test data has
    no infs, so out-of-range sentinels stand in).  NULL-aware ``count``/
    ``avg`` then behave exactly like the pandas reference's ``isna``-driven
    stats (SURVEY.md §1.2 NaN-vs-NULL note)."""
    ev = table(spark, sf_dir, "events")
    v = F.col("value")
    nulled = ev.select(
        F.when((v > 250) | (v < 0.1), F.lit(None)).otherwise(v).alias("v")
    )
    return nulled.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_valid"),
        (F.count(F.lit(1)) - F.count("v")).alias("n_nulled"),
        F.round(F.avg("v"), 4).alias("avg_valid"),
    )


@register(
    "filter_predicate",
    ids="P5,A1",
    oracle="""
SELECT count(*) AS n,
       round(sum(l_extendedprice), 2) AS revenue
FROM lineitem
WHERE l_quantity >= 45 AND l_discount <= 0.02
""",
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+A1 — boolean-mask row filter + count (reference nb cells 5/27).
    Both predicates reach the parquet scan as PushedFilters."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_quantity") >= 45) & (F.col("l_discount") <= 0.02))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@register(
    "label_encode",
    ids="P9",
    oracle="""
WITH dict AS (
  SELECT p_type,
         CAST(dense_rank() OVER (ORDER BY p_type) - 1 AS BIGINT) AS p_type_code
  FROM (SELECT DISTINCT p_type FROM part)
)
SELECT p.p_partkey, p.p_type, d.p_type_code
FROM part p JOIN dict d USING (p_type)
""",
)
def label_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — string → dense int codes, sklearn ``LabelEncoder`` contract
    (codes = 0-based rank of sorted distinct values; reference nb cell 23).
    Dictionary built from distinct values only, broadcast-joined back — the
    fact table never shuffles."""
    from big_data_lab_three_spark.operators import label_encode

    p = table(spark, sf_dir, "part")
    return (
        label_encode(p, ["p_type"])
        .select(
            "p_partkey", "p_type", F.col("p_type_code").cast("long").alias("p_type_code")
        )
    )


# --------------------------------------------------------------------------
# Unions / dedup (§2.4)
# --------------------------------------------------------------------------

@register(
    "union_all_days",
    ids="U1",
    oracle="""
SELECT o_orderstatus, count(*) AS n
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def union_all_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — vertical union by name (reference nb cell 4: ``pd.concat`` of 8
    day-files).  The table is split into three same-schema frames by status
    and re-unioned — a pure plan-level concat, no shuffle."""
    o = table(spark, sf_dir, "orders")
    parts = [o.where(F.col("o_orderstatus") == s) for s in ("F", "O", "P")]
    return (
        union_by_name(parts)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


@register(
    "union_mismatched",
    ids="U2",
    oracle="""
WITH u AS (
  SELECT c_custkey, c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
  FROM customer
  UNION ALL
  SELECT c_custkey, CAST(NULL AS DOUBLE) AS c_acctbal, c_mktsegment
  FROM customer
)
SELECT count(*)                                          AS n_rows,
       CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                                         AS acctbal_nulls,
       CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                                         AS segment_nulls
FROM u
""",
)
def union_mismatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — outer union of mismatched schemas with NULL fill (reference nb
    cells 33-37: ``pd.concat`` of differently-schemaed frames;
    ``unionByName(allowMissingColumns=True)``) + null counts."""
    c = table(spark, sf_dir, "customer")
    a = c.select("c_custkey", "c_acctbal")
    b = c.select("c_custkey", "c_mktsegment")
    u = union_by_name([a, b], allow_missing_columns=True)
    return u.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("c_acctbal").isNull().cast("long")).alias("acctbal_nulls"),
        F.sum(F.col("c_mktsegment").isNull().cast("long")).alias("segment_nulls"),
    )


@register(
    "dedup_rows",
    ids="U3",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus, l_quantity
FROM (
  SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem
  UNION ALL
  SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem
)
""",
)
def dedup_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 — full-row dedup (reference nb cells 5/7 ``drop_duplicates``;
    288,804 dups found there).  Duplicates are seeded by self-union (the
    synthetic tables are dup-free), then ``dropDuplicates`` — a hash-agg on
    all columns with map-side partials, the scalable exact-dedup plan."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    return li.unionByName(li).dropDuplicates()


# --------------------------------------------------------------------------
# Profiling aggregates (§2.3)
# --------------------------------------------------------------------------

@register(
    "null_profile",
    ids="A3,A8",
    oracle="""
WITH nulled AS (
  SELECT CASE WHEN value > 250 THEN NULL ELSE value END AS value,
         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS event_type
  FROM events
), n AS (SELECT count(*) AS total FROM nulled)
SELECT 'value' AS col_name,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_count,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / (SELECT total FROM n) AS null_frac
FROM nulled
UNION ALL
SELECT 'event_type',
       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / (SELECT total FROM n)
FROM nulled
""",
)
def null_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A8 — per-column null count + proportion in ONE wide agg
    (reference nb cells 17/22/37 run one pandas pass per column; here
    Catalyst fuses all columns into a single hash-agg stage)."""
    ev = table(spark, sf_dir, "events")
    nulled = ev.select(
        F.when(F.col("value") > 250, None).otherwise(F.col("value")).alias("value"),
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("event_type"))
        .alias("event_type"),
    )
    return null_profile(nulled, ["value", "event_type"]).select(
        F.col("column").alias("col_name"), "null_count", "null_frac"
    )


@register(
    "distinct_profile",
    ids="A2",
    oracle="""
SELECT 'c_custkey' AS col_name, count(DISTINCT c_custkey) AS distinct_count FROM customer
UNION ALL
SELECT 'c_nationkey', count(DISTINCT c_nationkey) FROM customer
UNION ALL
SELECT 'c_mktsegment', count(DISTINCT c_mktsegment) FROM customer
UNION ALL
SELECT 'c_acctbal', count(DISTINCT c_acctbal) FROM customer
""",
)
def distinct_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — per-column distinct count (reference nb cells 15-16
    ``nunique``).  Exact here; ``distinct_profile(approx=True)`` is the
    HyperLogLog scale path for 100 TB (one mergeable sketch pass)."""
    c = table(spark, sf_dir, "customer")
    return distinct_profile(
        c, ["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"]
    ).select(F.col("column").alias("col_name"), "distinct_count")


@register(
    "mode_impute",
    ids="A4,O3",
    oracle="""
WITH nulled AS (
  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS prio
  FROM orders
), m AS (
  SELECT prio AS mode_v
  FROM nulled
  WHERE prio IS NOT NULL
  GROUP BY prio
  ORDER BY count(*) DESC, prio ASC
  LIMIT 1
)
SELECT coalesce(prio, (SELECT mode_v FROM m)) AS priority, count(*) AS n
FROM nulled
GROUP BY 1
ORDER BY priority
""",
)
def mode_impute_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+O3 — most-frequent-value imputation (reference nb cells 18/39:
    ``df.fillna(df.mode().iloc[0])``; pandas takes the SMALLEST value on
    ties, so both sides order by count DESC, value ASC).  The 1-row mode is
    broadcast back — no global window, no driver round-trip."""
    o = table(spark, sf_dir, "orders")
    nulled = o.select(
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("prio")
    )
    mode_row = (
        nulled.where(F.col("prio").isNotNull())
        .groupBy("prio")
        .count()
        .orderBy(F.desc("count"), F.asc("prio"))
        .limit(1)
        .select(F.col("prio").alias("_mode"))
    )
    return (
        nulled.crossJoin(F.broadcast(mode_row))
        .select(F.coalesce("prio", "_mode").alias("priority"))
        .groupBy("priority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("priority")
    )


@register(
    "mean_impute",
    ids="A5",
    oracle="""
WITH nulled AS (
  SELECT CASE WHEN l_orderkey % 5 = 0 THEN NULL ELSE l_quantity END AS qty
  FROM lineitem
), s AS (SELECT avg(qty) AS mean_qty FROM nulled)
SELECT count(*)                                   AS n,
       round(sum(coalesce(qty, (SELECT mean_qty FROM s))), 2) AS sum_qty_imputed,
       round(avg(coalesce(qty, (SELECT mean_qty FROM s))), 4) AS avg_qty_imputed
FROM nulled
""",
)
def mean_impute_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — mean imputation (reference ``src/train.py:61-66``
    ``SimpleImputer(strategy='mean')``).  Mean from one agg, broadcast
    cross-join of the 1-row stats (never a global ``avg() over ()`` window,
    which would funnel the table through one task)."""
    li = table(spark, sf_dir, "lineitem")
    nulled = li.select(
        F.when(F.col("l_orderkey") % 5 == 0, None)
        .otherwise(F.col("l_quantity"))
        .alias("qty")
    )
    stats = nulled.agg(F.avg("qty").alias("mean_qty"))
    filled = nulled.crossJoin(F.broadcast(stats)).select(
        F.coalesce("qty", "mean_qty").alias("qty_i")
    )
    return filled.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("qty_i"), 2).alias("sum_qty_imputed"),
        F.round(F.avg("qty_i"), 4).alias("avg_qty_imputed"),
    )


@register(
    "zscore_scale",
    ids="A6",
    oracle="""
WITH s AS (
  SELECT avg(l_extendedprice) AS m, stddev_samp(l_extendedprice) AS sd
  FROM lineitem
)
SELECT l_returnflag,
       round(avg((l_extendedprice - m) / sd), 4)        AS z_mean,
       round(stddev_samp((l_extendedprice - m) / sd), 4) AS z_std,
       count(*)                                          AS n
FROM lineitem, s
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def zscore_scale_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — z-score standardization (reference ``StandardScaler``,
    ``src/train.py:61-66``): global mean/std from one agg pass, broadcast
    back, then per-group stats of the scaled column verify mean≈0/std≈1
    overall."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    z = zscore(li, ["l_extendedprice"])
    return (
        z.groupBy("l_returnflag")
        .agg(
            F.round(F.avg("l_extendedprice"), 4).alias("z_mean"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("z_std"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "value_counts",
    ids="A7,O1,O2",
    oracle="""
SELECT c_mktsegment, count(*) AS n
FROM customer
GROUP BY c_mktsegment
ORDER BY n DESC, c_mktsegment ASC
LIMIT 3
""",
)
def value_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+O1+O2 — group-count descending with head (reference nb cell 43
    ``value_counts()``); deterministic value tiebreak so top-k is
    well-defined (SURVEY.md §7.4)."""
    c = table(spark, sf_dir, "customer")
    return (
        value_counts(c, "c_mktsegment")
        .select("c_mktsegment", F.col("count").alias("n"))
        .orderBy(F.desc("n"), F.asc("c_mktsegment"))
        .limit(3)
    )


@register(
    "crosstab_confusion",
    ids="A9,A10",
    oracle="""
SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label,
       CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END  AS prediction,
       count(*) AS n
FROM lineitem
GROUP BY 1, 2
ORDER BY label, prediction
""",
)
def crosstab_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9+A10 — confusion-matrix counts (reference nb cell 49
    ``confusion_matrix``): one groupBy over derived label/prediction
    columns."""
    li = table(spark, sf_dir, "lineitem")
    labeled = li.select(
        (F.col("l_returnflag") == "R").cast("int").alias("label"),
        (F.col("l_discount") > 0.05).cast("int").alias("prediction"),
    )
    return confusion_matrix(labeled)


@register(
    "classification_report",
    ids="A11",
    oracle="""
WITH labeled AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label,
         CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END  AS prediction
  FROM lineitem
), cm AS (
  SELECT label, prediction, count(*) AS n FROM labeled GROUP BY 1, 2
), per_label AS (
  SELECT label AS class, CAST(sum(n) AS BIGINT) AS support FROM cm GROUP BY 1
), per_pred AS (
  SELECT prediction AS class, CAST(sum(n) AS BIGINT) AS predicted_n
  FROM cm GROUP BY 1
), tp AS (
  SELECT label AS class, n AS tp FROM cm WHERE label = prediction
)
SELECT c.class,
       round(CAST(coalesce(t.tp, 0) AS DOUBLE) / p.predicted_n, 6) AS precision,
       round(CAST(coalesce(t.tp, 0) AS DOUBLE) / c.support, 6)     AS recall,
       c.support
FROM per_label c
JOIN per_pred p USING (class)
LEFT JOIN tp t USING (class)
ORDER BY class
""",
)
def classification_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — per-class precision/recall (reference nb cell 51
    ``classification_report``), derived relationally from confusion counts
    (tiny frames, broadcast joins)."""
    li = table(spark, sf_dir, "lineitem")
    labeled = li.select(
        (F.col("l_returnflag") == "R").cast("int").alias("label"),
        (F.col("l_discount") > 0.05).cast("int").alias("prediction"),
    )
    rep = classification_report(labeled)
    return rep.select(
        "class",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        "support",
    ).orderBy("class")


# --------------------------------------------------------------------------
# Sorts / top-k / windows (§2.5, §2.7) and joins (§2.4 no-join note)
# --------------------------------------------------------------------------

@register(
    "topk_sort",
    ids="O1,O2 + join",
    oracle="""
SELECT c.c_custkey,
       c.c_name,
       round(sum(o.o_totalprice), 2) AS total_spend
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 5
""",
)
def topk_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2 + join — top-5 customers by total spend.  The customer dim is
    explicitly broadcast (at 100 TB the orders fact never shuffles for this
    join); ``orderBy().limit()`` compiles to TakeOrderedAndProject, not a
    global sort."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    joined = o.join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"], "inner"
    )
    return topk(
        joined.groupBy("c_custkey", "c_name").agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend")
        ),
        order=[F.desc("total_spend"), F.asc("c_custkey")],
        k=5,
    )


@register(
    "window_rank",
    ids="O3,W (§2.7)",
    oracle="""
SELECT c_custkey,
       c_nationkey,
       c_acctbal,
       rk,
       prev_custkey,
       round(run_bal, 2) AS run_bal
FROM (
  SELECT c_custkey, c_nationkey, c_acctbal,
         CAST(row_number() OVER (
             PARTITION BY c_nationkey
             ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS rk,
         lag(c_custkey) OVER (
             PARTITION BY c_nationkey ORDER BY c_custkey ASC) AS prev_custkey,
         sum(c_acctbal) OVER (
             PARTITION BY c_nationkey ORDER BY c_custkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_bal
  FROM customer
)
WHERE rk <= 3
""",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 — ranking + analytic windows (generalizes the reference's O3
    argmax-per-group, nb cell 18): row_number / lag / running sum, one
    shuffle on the partition key.  Explicit ROWS frame so Spark and the
    oracle agree on peer handling."""
    c = table(spark, sf_dir, "customer")
    w_rank = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    w_seq = Window.partitionBy("c_nationkey").orderBy(F.asc("c_custkey"))
    w_run = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w_rank).alias("rk"),
            F.lag("c_custkey").over(w_seq).alias("prev_custkey"),
            F.sum("c_acctbal").over(w_run).alias("run_bal"),
        )
        .where(F.col("rk") <= 3)
        .select(
            "c_custkey", "c_nationkey", "c_acctbal", "rk", "prev_custkey",
            F.round("run_bal", 2).alias("run_bal"),
        )
    )


@register(
    "shipping_priority",
    ids="join (3-way), O1,O2",
    oracle="""
SELECT l.l_orderkey,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join (TPC-H Q3 shape).  Filters push into both scans; the
    filtered customer dim broadcasts into orders, and only the surviving
    orders shuffle against lineitem on the join key — the join order a
    100 TB plan needs."""
    c = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem")
    joined = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    return topk(
        joined.groupBy("l_orderkey").agg(
            # exact decimal sum — see pricing_summary note
            F.round(F.sum(price * (one - disc)), 2)
            .cast("double").alias("revenue")
        ),
        order=[F.desc("revenue"), F.asc("l_orderkey")],
        k=10,
    )


# --------------------------------------------------------------------------
# Semi-structured (§2.1 S3)
# --------------------------------------------------------------------------

@register(
    "json_flatten",
    ids="S3",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
       count(*) AS n
FROM events
GROUP BY 1
ORDER BY k
""",
)
def json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — JSON record flattening (reference ``src/predict.py:133-135``
    ``pd.json_normalize``): extract a field from the ``props`` JSON string
    and aggregate.  ``get_json_object`` runs JVM-side (no Python UDF)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object(F.col("props"), "$.k").cast("int").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# Multi-join showcases (§2.4 no-join note: joins exposed as first-class)
# --------------------------------------------------------------------------

@register(
    "regional_revenue",
    ids="join (6-way star), A-aggs; broadcast-dim plan",
    oracle="""
SELECT n.n_name,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-table star join (TPC-H Q5 shape): region/nation/supplier/
    customer all broadcast (each far under the 10 MB threshold at any
    SF where they are dims); the only shuffles are orders⋈lineitem on
    the orderkey and the final 1-row-per-nation aggregate.  The
    region filter prunes before the nation broadcast, so the fact
    tables only meet surviving dimension rows."""
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    return joined.groupBy("n_name").agg(
        # exact decimal sum — see pricing_summary note
        F.round(F.sum(price * (one - disc)), 2)
        .cast("double").alias("revenue")
    )


@register(
    "top_supplier",
    ids="join + window over agg (TPC-H Q15 shape)",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
              AS DOUBLE) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-07-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s.s_suppkey
""",
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-max supplier (TPC-H Q15 shape).  The scalar subquery
    (``max(total_rev)``) is a second tiny aggregate over the persisted
    per-supplier revenue table, broadcast back as a one-row cross join
    (the ``important_parts`` pattern) — so lineitem is scanned once and
    no row ever enters an un-partitioned window.  An empty-frame
    ``max() OVER ()`` would be dim-sized here, but the aggregate form
    keeps the whole plan partial-agg + broadcast, which also survives a
    fact-sized input unchanged."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    rev = li.groupBy("l_suppkey").agg(
        # exact decimal sum — see pricing_summary note
        F.round(F.sum(price * (one - disc)), 2)
        .cast("double").alias("total_rev")
    )
    rev.persist()
    mx = rev.agg(F.max("total_rev").alias("mx"))
    top = rev.crossJoin(F.broadcast(mx)).where(
        F.col("total_rev") == F.col("mx")
    )
    s = table(spark, sf_dir, "supplier")
    return (
        top.join(F.broadcast(s), top["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@register(
    "summary_stats",
    ids="A1,A5,A6 describe-parity profile",
    oracle="""
SELECT 'l_discount' AS col_name,
       count(l_discount) AS n_rows,
       round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
           / count(l_discount), 6) AS mean,
       round(sqrt((CAST(sum(CAST(l_discount AS DECIMAL(4,2))
                      * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             - CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
               * CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
               / count(l_discount))
            / (count(l_discount) - 1)), 6) AS std,
       min(l_discount) AS min_val,
       max(l_discount) AS max_val
FROM lineitem
UNION ALL
SELECT 'l_extendedprice' AS col_name,
       count(l_extendedprice) AS n_rows,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           / count(l_extendedprice), 6) AS mean,
       round(sqrt((CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             - CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               * CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               / count(l_extendedprice))
            / (count(l_extendedprice) - 1)), 6) AS std,
       min(l_extendedprice) AS min_val,
       max(l_extendedprice) AS max_val
FROM lineitem
UNION ALL
SELECT 'l_quantity' AS col_name,
       count(l_quantity) AS n_rows,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           / count(l_quantity), 6) AS mean,
       round(sqrt((CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             - CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               * CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               / count(l_quantity))
            / (count(l_quantity) - 1)), 6) AS std,
       min(l_quantity) AS min_val,
       max(l_quantity) AS max_val
FROM lineitem
ORDER BY col_name
""",
)
def summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.describe()`` parity (pandas describe / nb EDA cells): per-column
    count, mean, sample std, min, max for the lineitem measures — ONE scan,
    one fused agg (the pandas reference makes a separate pass per column;
    SURVEY.md §4.2 single-``agg`` rule).

    Hash-parity technique: mean and std are derived from exact DECIMAL
    sums (``sum(x)``, ``sum(x*x)``) cast to double only once — both
    engines then evaluate the *same* IEEE expression
    ``(ss - s*s/n)/(n-1)`` — plus the corpus-wide derived-value
    rounding (6 dp).  Exact sums kill the summation-order drift a plain
    ``avg``/``stddev`` (Spark Welford vs DuckDB formula) would have,
    but the rounding is still REQUIRED: at sf0.1 the ``sum(x*x)``
    DECIMAL exceeds 2^53 quanta and the engines' DECIMAL→DOUBLE casts
    round that conversion differently by one ULP (found by the full
    sf0.1 gate; invisible at sf0.01).  At 100 TB this stays a single
    scan-bound pass with a 15-value reduce."""
    li = table(spark, sf_dir, "lineitem")
    cols = [
        ("l_discount", "decimal(4,2)"),
        ("l_extendedprice", "decimal(12,2)"),
        ("l_quantity", "decimal(12,2)"),
    ]
    aggs = []
    for name, dectype in cols:
        d = F.col(name).cast(dectype)
        aggs += [
            F.count(F.col(name)).alias(f"n__{name}"),
            F.sum(d).cast("double").alias(f"s__{name}"),
            F.sum(d * d).cast("double").alias(f"ss__{name}"),
            F.min(F.col(name)).alias(f"mn__{name}"),
            F.max(F.col(name)).alias(f"mx__{name}"),
        ]
    row = li.agg(*aggs)
    stats = row.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("col_name"),
                        F.col(f"n__{name}").alias("n_rows"),
                        F.col(f"s__{name}").alias("s"),
                        F.col(f"ss__{name}").alias("ss"),
                        F.col(f"mn__{name}").alias("min_val"),
                        F.col(f"mx__{name}").alias("max_val"),
                    )
                    for name, _ in cols
                ]
            )
        )
    )
    n = F.col("n_rows")
    s = F.col("s")
    ss = F.col("ss")
    return stats.select(
        "col_name",
        "n_rows",
        F.round(s / n, 6).alias("mean"),
        F.round(F.sqrt((ss - s * s / n) / (n - 1)), 6).alias("std"),
        "min_val",
        "max_val",
    ).orderBy("col_name")


@register(
    "corr_matrix",
    ids="A-family EDA extension: pairwise Pearson correlation, one pass",
    oracle="""
WITH m AS (
    SELECT count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s_q,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS s_p,
           CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS s_d,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS ss_q,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS ss_p,
           CAST(sum(CAST(l_discount AS DECIMAL(4,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS ss_d,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
                    * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS s_qp,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS s_qd,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS s_pd
    FROM lineitem
)
SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
       round((n * s_qp - s_q * s_p)
           / (sqrt(n * ss_q - s_q * s_q) * sqrt(n * ss_p - s_p * s_p)),
           12) AS corr_xy
FROM m
UNION ALL
SELECT 'l_quantity' AS col_x, 'l_discount' AS col_y,
       round((n * s_qd - s_q * s_d)
           / (sqrt(n * ss_q - s_q * s_q) * sqrt(n * ss_d - s_d * s_d)),
           12) AS corr_xy
FROM m
UNION ALL
SELECT 'l_extendedprice' AS col_x, 'l_discount' AS col_y,
       round((n * s_pd - s_p * s_d)
           / (sqrt(n * ss_p - s_p * s_p) * sqrt(n * ss_d - s_d * s_d)),
           12) AS corr_xy
FROM m
ORDER BY col_x, col_y
""",
)
def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the lineitem measures — the EDA
    heatmap companion to ``summary_stats`` (the pandas reference's
    notebook profiles columns pairwise; nb EDA cells).  ONE scan
    computes all ten moment sums, then each pair's coefficient derives
    from them on the driver-sized 1-row result.

    Hash-parity: moments are exact DECIMAL sums cast to double once;
    both engines then evaluate the same IEEE expression
    ``(n·sxy − sx·sy) / (√(n·sxx − sx²)·√(n·syy − sy²))``, rounded to
    12 dp — needed because at sf0.1 the second-moment DECIMALs exceed
    2^53 quanta and the engines' DECIMAL→DOUBLE casts differ by one ULP
    (full-sf0.1-gate finding).  Built-in ``F.corr``
    (Welford-style, partition-order-dependent) could not hash-match
    DuckDB's ``corr`` — deriving from exact sums is what makes the
    cross-engine check possible.  At 100 TB: one scan-bound pass, a
    10-value reduce, O(pairs) driver math."""
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(12,2)")
    p = F.col("l_extendedprice").cast("decimal(12,2)")
    d = F.col("l_discount").cast("decimal(4,2)")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("s_q"),
        F.sum(p).cast("double").alias("s_p"),
        F.sum(d).cast("double").alias("s_d"),
        F.sum(q * q).cast("double").alias("ss_q"),
        F.sum(p * p).cast("double").alias("ss_p"),
        F.sum(d * d).cast("double").alias("ss_d"),
        F.sum(q * p).cast("double").alias("s_qp"),
        F.sum(q * d).cast("double").alias("s_qd"),
        F.sum(p * d).cast("double").alias("s_pd"),
    )

    def corr_expr(sx, sy, ssx, ssy, sxy):
        n = F.col("n")
        return (n * F.col(sxy) - F.col(sx) * F.col(sy)) / (
            F.sqrt(n * F.col(ssx) - F.col(sx) * F.col(sx))
            * F.sqrt(n * F.col(ssy) - F.col(sy) * F.col(sy))
        )

    pairs = [
        ("l_quantity", "l_extendedprice",
         corr_expr("s_q", "s_p", "ss_q", "ss_p", "s_qp")),
        ("l_quantity", "l_discount",
         corr_expr("s_q", "s_d", "ss_q", "ss_d", "s_qd")),
        ("l_extendedprice", "l_discount",
         corr_expr("s_p", "s_d", "ss_p", "ss_d", "s_pd")),
    ]
    return m.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(x).alias("col_x"),
                        F.lit(y).alias("col_y"),
                        F.round(e, 12).alias("corr_xy"),
                    )
                    for x, y, e in pairs
                ]
            )
        )
    ).orderBy("col_x", "col_y")


@register(
    "order_digest",
    ids="agg: ordered array aggregation (collect_list → deterministic digest)",
    oracle="""
SELECT o_custkey,
       count(*) AS n_orders,
       string_agg(CAST(o_orderkey AS VARCHAR), ','
                  ORDER BY o_orderkey) AS order_keys
FROM orders
GROUP BY o_custkey
ORDER BY o_custkey
""",
)
def order_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer ordered order-key digest — the array-aggregation
    primitive (collect_list) made hash-comparable: ``collect_list`` is
    partition-order-dependent, so the engine sorts the array before
    serializing (`sort_array` ∘ `collect_list` ≡ SQL ``string_agg(...
    ORDER BY)``).  One hash aggregate; the digest stays bounded by the
    per-key cardinality, and at 100 TB a skewed key would move this to
    the salted-aggregate pattern (`skew_salted_join`)."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.concat_ws(
                ",",
                F.sort_array(F.collect_list(F.col("o_orderkey"))),
            ).alias("order_keys"),
        )
        .orderBy("o_custkey")
    )


# One ANSI-SQL string executed VERBATIM by both engines: the Spark side
# runs it through the engine's SQL front door (sources.sql → temp views
# over the same parquet), the oracle side hands the identical text to
# DuckDB.  Exact-DECIMAL sums so distributed summation order cannot
# perturb a bit; every computed column aliased once, shared by both.
_ANSI_SHARED_SQL = """
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
           AS sum_base_price,
       CAST(min(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS min_discount,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "sql_front_door",
    ids="SQL surface parity: one ANSI string runs verbatim on both engines",
    oracle=_ANSI_SHARED_SQL,
)
def sql_front_door_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-SQL parity proof: the SAME SQL text this query registers as
    its DuckDB oracle is executed by Spark via ``sources.sql`` (temp
    views over the parquet tables; Catalyst sees through views, so
    pushdown/pruning match the DataFrame plans).  Any user migrating
    ANSI SQL workloads to this engine runs them unchanged."""
    from big_data_lab_three_spark.sources import sql as run_sql

    return run_sql(spark, sf_dir, _ANSI_SHARED_SQL)
