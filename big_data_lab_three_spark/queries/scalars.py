"""Scalar-function and statistical-moment families.

The reference's scalar surface is four functions (SURVEY.md §2.6:
``str.strip``, a conditional, z-score arithmetic, an int cast).  A
user switching engines expects the standard scalar library, so this
module exercises the wider families end-to-end against the DuckDB
oracle:

- ``string_funcs``      — the string family (length/upper/substring/
  split/concat_ws/lpad/translate/reverse/instr/contains/levenshtein)
  evaluated per-row so every value is hash-compared, not just an
  aggregate of them.
- ``cond_flag_census``  — conditional/boolean aggregates (``count_if``,
  ``bool_and``, ``bool_or``, filtered exact-decimal sums).
- ``moments_profile``   — skewness / excess kurtosis from exact-DECIMAL
  power sums, extending summary_stats' count/mean/std to the 3rd and
  4th moments.

Hash-parity notes: every function here was chosen because its
semantics are engine-identical (1-based ``instr``/``strpos``, boundary
behavior of ``split``, Levenshtein distance is well-defined); moment
arithmetic mirrors the exact expression tree on both engines over
exact decimal sums, so the doubles agree bit-for-bit before shared
rounding (only +,-,*,/ and sqrt — all IEEE-correctly-rounded — no
``pow``, whose libm vs JVM last-bit behavior differs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.sources import table


@register(
    "string_funcs",
    ids="scalar string family (extends §2.6's strip-only surface); per-row hash-compared",
    oracle="""
SELECT p_partkey,
       upper(p_name)                                        AS name_upper,
       CAST(length(p_name) AS INTEGER)                      AS name_len,
       substring(p_name, 1, 8)                              AS name_prefix,
       CAST(len(string_split(p_name, ' ')) AS INTEGER)      AS n_words,
       concat_ws('-', p_brand, p_type)                      AS brand_type,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0')             AS padded_key,
       replace(p_name, ' ', '_')                            AS name_snake,
       reverse(p_brand)                                     AS brand_rev,
       CAST(strpos(p_name, 'a') AS INTEGER)                 AS first_a,
       contains(p_name, 'red')                              AS has_red,
       CAST(levenshtein(p_brand, p_type) AS INTEGER)        AS brand_type_dist
FROM part
WHERE p_partkey <= 200
ORDER BY p_partkey
""",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery over ``part``, emitted per-row (keyed and
    ordered by ``p_partkey``) so the driver hash-checks every scalar
    value rather than a lossy aggregate.

    Scale shape: pure projection — no shuffle, no aggregation; the
    ``p_partkey <= 200`` predicate is pushed to the parquet scan
    (row-group min/max skipping) and everything else runs inside one
    whole-stage-codegen span.  At 100 TB this family's cost model is
    "scan bandwidth", which is exactly what a projection should be.
    """
    p = table(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.upper(name).alias("name_upper"),
        F.length(name).alias("name_len"),
        F.substring(name, 1, 8).alias("name_prefix"),
        F.size(F.split(name, " ")).alias("n_words"),
        F.concat_ws("-", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.translate(name, " ", "_").alias("name_snake"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.instr(name, "a").alias("first_a"),
        name.contains("red").alias("has_red"),
        F.levenshtein(F.col("p_brand"), F.col("p_type")).alias("brand_type_dist"),
    ).orderBy("p_partkey")


@register(
    "cond_flag_census",
    ids="conditional/boolean aggregates: count_if, bool_and/bool_or, filtered sum (A7/A9 family extension)",
    oracle="""
SELECT o_orderstatus,
       count(*)                                             AS n_orders,
       count(*) FILTER (WHERE o_totalprice > 200000)        AS n_big,
       bool_and(o_orderpriority = '1-URGENT')               AS all_urgent,
       bool_or(o_orderpriority = '1-URGENT')                AS any_urgent,
       CAST(round(coalesce(
           sum(CAST(o_totalprice AS DECIMAL(12,2)))
               FILTER (WHERE o_totalprice > 200000), 0), 2) AS DOUBLE)
                                                            AS big_revenue
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def cond_flag_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate census per order status: filtered counts
    (``count_if`` ≡ ``COUNT(*) FILTER``), universal/existential boolean
    aggregates, and a filtered exact-decimal revenue sum (coalesced to
    0 so a status with no big orders still hashes identically).

    Scale shape: all five aggregates fuse into ONE partial+final hash
    aggregate over a 3-group key — conditionals are evaluated map-side
    inside codegen, so adding a predicate costs arithmetic, not a pass.
    The pandas reference runs one full-frame pass per statistic
    (SURVEY.md §4.2); this is the single-pass fusion it can't do.
    """
    o = table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 200000
    urgent = F.col("o_orderpriority") == "1-URGENT"
    price_d = F.col("o_totalprice").cast("decimal(12,2)")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_if(big).alias("n_big"),
            F.bool_and(urgent).alias("all_urgent"),
            F.bool_or(urgent).alias("any_urgent"),
            F.round(
                F.coalesce(F.sum(F.when(big, price_d)), F.lit(0).cast("decimal(12,2)")), 2
            )
            .cast("double")
            .alias("big_revenue"),
        )
        .orderBy("o_orderstatus")
    )


def _central_moments(n: Column, s1: Column, s2: Column, s3: Column, s4: Column):
    """Central moments m2..m4 from raw power sums, all-double arithmetic.

    The expression tree here is mirrored token-for-token in the
    ``moments_profile`` oracle SQL: identical IEEE ops over identical
    inputs ⇒ identical doubles on both engines.
    """
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean * mean * mean
    m4 = (
        s4 / n
        - 4 * mean * (s3 / n)
        + 6 * mean * mean * (s2 / n)
        - 3 * mean * mean * mean * mean
    )
    return mean, m2, m3, m4


@register(
    "moments_profile",
    ids="statistical moments: skewness + excess kurtosis from exact-DECIMAL power sums (A5/A6 family extension)",
    oracle="""
WITH sums AS (
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(7,2))) AS DOUBLE) AS s1,
           CAST(sum(CAST(CAST(l_quantity AS DECIMAL(7,2))
                         * CAST(l_quantity AS DECIMAL(7,2)) AS DECIMAL(18,4)))
                AS DOUBLE) AS s2,
           CAST(sum(CAST(CAST(CAST(l_quantity AS DECIMAL(7,2))
                              * CAST(l_quantity AS DECIMAL(7,2)) AS DECIMAL(18,4))
                         * CAST(l_quantity AS DECIMAL(7,2)) AS DECIMAL(26,6)))
                AS DOUBLE) AS s3,
           CAST(sum(CAST(CAST(CAST(CAST(l_quantity AS DECIMAL(7,2))
                                   * CAST(l_quantity AS DECIMAL(7,2)) AS DECIMAL(18,4))
                              * CAST(l_quantity AS DECIMAL(7,2)) AS DECIMAL(26,6))
                         * CAST(l_quantity AS DECIMAL(7,2)) AS DECIMAL(34,8)))
                AS DOUBLE) AS s4
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag,
       n_rows,
       round(s1 / n, 4)                                          AS mean_qty,
       round(s2 / n - (s1 / n) * (s1 / n), 4)                    AS var_pop,
       round((s3 / n - 3 * (s1 / n) * (s2 / n)
              + 2 * (s1 / n) * (s1 / n) * (s1 / n))
             / (sqrt(s2 / n - (s1 / n) * (s1 / n))
                * (s2 / n - (s1 / n) * (s1 / n))), 4) + 0.0      AS skewness,
       round((s4 / n - 4 * (s1 / n) * (s3 / n)
              + 6 * (s1 / n) * (s1 / n) * (s2 / n)
              - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
             / ((s2 / n - (s1 / n) * (s1 / n))
                * (s2 / n - (s1 / n) * (s1 / n))) - 3, 4) + 0.0  AS kurtosis_excess
FROM sums
ORDER BY l_returnflag
""",
)
def moments_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of ``l_quantity`` per
    return flag, computed from exact-DECIMAL raw power sums (Σx, Σx²,
    Σx³, Σx⁴) so the distributed sum order cannot perturb the result;
    the moment algebra then runs in doubles mirroring the oracle's
    expression tree exactly (no ``pow`` — see module docstring).

    Built-in ``skewness()``/``kurtosis()`` are deliberately NOT used
    for the judged values: engines disagree on sample-vs-population
    bias corrections, and their streaming-update arithmetic is
    order-dependent.  Power sums are the mergeable form — at 100 TB
    this is one map-side-combined hash aggregate (4 extra multiplies
    per row inside codegen), same shape as any other profile pass.
    """
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(7,2)")
    q2 = (q * q).cast("decimal(18,4)")
    q3 = (q2 * q).cast("decimal(26,6)")
    q4 = (q3 * q).cast("decimal(34,8)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q2).cast("double").alias("s2"),
        F.sum(q3).cast("double").alias("s3"),
        F.sum(q4).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mean, m2, m3, m4 = _central_moments(n, s1, s2, s3, s4)
    return sums.select(
        "l_returnflag",
        "n_rows",
        F.round(mean, 4).alias("mean_qty"),
        F.round(m2, 4).alias("var_pop"),
        # `+ 0.0` normalizes IEEE -0.0 to 0.0 after rounding (one group
        # lands on -0 in DuckDB but 0 here; both engines agree post-add).
        (F.round(m3 / (F.sqrt(m2) * m2), 4) + F.lit(0.0)).alias("skewness"),
        (F.round(m4 / (m2 * m2) - 3, 4) + F.lit(0.0)).alias(
            "kurtosis_excess"
        ),
    ).orderBy("l_returnflag")
