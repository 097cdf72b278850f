"""Hypothesis-testing / drift-detection query family — the statistics a
production data-quality or A/B harness computes over a 100 TB fact
table: Mann-Whitney rank-sum, two-sample Kolmogorov-Smirnov on a fixed
grid, chi-square independence, and Benford first-digit goodness-of-fit.

These extend the reference's evaluation surface (SURVEY.md §2.3 —
accuracy / confusion-matrix / classification-report over batch frames)
with the distribution-level tests that monitor the SAME pipelines at
scale: `ab_test_ztest` (r7) covers proportions; this module covers
ranks, whole distributions, contingency tables, and digit-law anomaly
screens.

Scale + hash-parity design shared by all four queries:

- the DATA pass is always one distributed groupBy onto a bounded census
  table (50 quantity values, a fixed $100 price grid, a 15-cell
  contingency table, 9 digits) — windows only ever run over that
  bounded aggregate, never over raw rows;
- every statistic is assembled from EXACT BIGINT census counts
  (tie-corrected rank sums via `2·R1 = Σ n1(v)·(2·cum(v)+t(v)+1)`,
  KS distance as the integer `max |c1·n2 − c2·n1|`, chi-square
  deviations as `o·n − r·s`), so both engines feed bit-identical
  doubles into one shared closed-form expression;
- irrational constants (Benford's `log10(1+1/d)`) are spelled as
  12-digit decimal LITERALS on both engines — never recomputed through
  `log`, whose last-ulp behavior differs between runtimes;
- multi-cell double sums are quantized per cell (`floor(x·1e9 + 0.5)`,
  values are non-negative so half-up == half-away) and summed as
  BIGINT, sidestepping partial-sum-order nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_lab_three_spark.functions.numeric import (
    quantized_sum as _qsum,
)
from big_data_lab_three_spark.operators.rankstats import (
    N_COL,
    RANK_COL,
    global_ranks,
    ntile_from_rank,
)
from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.sources import table


@register(
    "mann_whitney_u",
    ids="stat-test: Mann-Whitney U rank-sum (tie-corrected, exact integer rank algebra)",
    oracle="""
WITH x AS (
    SELECT CAST(l_quantity AS BIGINT) AS q,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g1
    FROM lineitem
    WHERE l_returnflag IN ('R', 'A')
), v AS (
    SELECT q,
           CAST(sum(g1) AS BIGINT) AS n1v,
           CAST(count(*) AS BIGINT) AS tv
    FROM x GROUP BY q
), c AS (
    SELECT q, n1v, tv,
           CAST(coalesce(sum(tv) OVER (ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cb
    FROM v
), s AS (
    SELECT CAST(sum(n1v) AS BIGINT) AS n1,
           CAST(sum(tv - n1v) AS BIGINT) AS n2,
           CAST(sum(n1v * (2 * cb + tv + 1)) AS BIGINT) AS two_r1,
           CAST(sum(tv * tv * tv - tv) AS BIGINT) AS ties,
           CAST(count(*) AS BIGINT) AS n_value_groups
    FROM c
)
SELECT n1, n2, n_value_groups,
       CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u_stat,
       round((CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE)
              - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             / (2 * sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12)
                 * (CAST(n1 + n2 + 1 AS DOUBLE)
                    - CAST(ties AS DOUBLE)
                      / (CAST(n1 + n2 AS DOUBLE)
                         * CAST(n1 + n2 - 1 AS DOUBLE))))), 6) AS z_score,
       round(1 - CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)
           AS rank_biserial
FROM s
""",
)
def mann_whitney_u_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test: do returned ('R') and accepted
    ('A') line items draw their quantities from the same distribution?
    The nonparametric sibling of `ab_test_ztest` — the test a shift
    monitor runs when the metric is ordinal and heavy-tailed, where a
    t-test's mean is the wrong summary.

    Tie handling is EXACT and integer-only: quantities collapse to a
    50-row value census; with `cum(v)` the count strictly below `v` and
    `t(v)` the tied count at `v`, every tied row gets the midrank, so
    `2·R1 = Σ n1(v)·(2·cum(v) + t(v) + 1)` — a BIGINT.  The normal
    approximation uses the standard tie-corrected variance
    `n1·n2/12 · (n+1 − Σ(t³−t)/(n(n−1)))`; both engines evaluate the
    identical double expression from identical integers, and sqrt is
    IEEE-correctly-rounded, so round(6) is decoration, not a tolerance.
    Rank-biserial `1 − 2U/(n1·n2)` is the reported effect size.

    Scale shape: one groupBy shuffle onto ≤50 rows (value domain, not
    corpus size); the prefix window runs over that census only; 1-row
    output."""
    x = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag").isin("R", "A"))
        .select(
            F.col("l_quantity").cast("long").alias("q"),
            (F.col("l_returnflag") == "R").cast("long").alias("g1"),
        )
    )
    v = x.groupBy("q").agg(
        F.sum("g1").alias("n1v"), F.count(F.lit(1)).alias("tv")
    )
    wb = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    c = v.select(
        "n1v",
        "tv",
        F.coalesce(F.sum("tv").over(wb), F.lit(0)).alias("cb"),
    )
    s = c.agg(
        F.sum("n1v").alias("n1"),
        F.sum(F.col("tv") - F.col("n1v")).alias("n2"),
        F.sum(
            F.col("n1v") * (2 * F.col("cb") + F.col("tv") + 1)
        ).alias("two_r1"),
        F.sum(
            F.col("tv") * F.col("tv") * F.col("tv") - F.col("tv")
        ).alias("ties"),
        F.count(F.lit(1)).alias("n_value_groups"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    two_u = (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)).cast(
        "double"
    )
    n = F.col("n1") + F.col("n2")
    var = (n1d * n2d / F.lit(12)) * (
        (n + 1).cast("double")
        - F.col("ties").cast("double")
        / (n.cast("double") * (n - 1).cast("double"))
    )
    return s.select(
        "n1",
        "n2",
        "n_value_groups",
        (two_u / F.lit(2)).alias("u_stat"),
        F.round((two_u - n1d * n2d) / (F.lit(2) * F.sqrt(var)), 6).alias(
            "z_score"
        ),
        F.round(F.lit(1) - two_u / (n1d * n2d), 6).alias("rank_biserial"),
    )


@register(
    "ks_drift",
    ids="stat-test: two-sample Kolmogorov-Smirnov on a fixed $100 price grid (exact integer ECDF distance)",
    oracle="""
WITH x AS (
    SELECT CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS grid,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g1
    FROM lineitem
    WHERE l_returnflag IN ('R', 'A')
), v AS (
    SELECT grid,
           CAST(sum(g1) AS BIGINT) AS c1v,
           CAST(count(*) - sum(g1) AS BIGINT) AS c2v
    FROM x GROUP BY grid
), c AS (
    SELECT grid,
           CAST(sum(c1v) OVER (ORDER BY grid) AS BIGINT) AS c1,
           CAST(sum(c2v) OVER (ORDER BY grid) AS BIGINT) AS c2
    FROM v
), t AS (
    SELECT CAST(sum(c1v) AS BIGINT) AS n1,
           CAST(sum(c2v) AS BIGINT) AS n2,
           CAST(count(*) AS BIGINT) AS n_grid
    FROM v
), best AS (
    SELECT c.grid, abs(c.c1 * t.n2 - c.c2 * t.n1) AS dnum,
           t.n1, t.n2, t.n_grid
    FROM c, t
    ORDER BY dnum DESC, c.grid ASC
    LIMIT 1
)
SELECT n1, n2, n_grid, grid * 100 AS grid_at,
       round(CAST(dnum AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS d_stat,
       round((CAST(dnum AS DOUBLE)
              / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
             * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    / CAST(n1 + n2 AS DOUBLE)), 6) AS ks_lambda
FROM best
""",
)
def ks_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the
    returned ('R') and accepted ('A') price distributions, evaluated on
    a fixed $100 grid — the binned-ECDF form a streaming drift monitor
    actually maintains (per-bin counters), not the all-points form that
    would need a global sort of raw rows.

    The supremum distance is EXACT integer arithmetic on the grid:
    `D = max |c1(g)·n2 − c2(g)·n1| / (n1·n2)` over cumulative bin
    counts, with the argmax bin reported (ties break to the lowest
    grid cell).  `ks_lambda = D·sqrt(n1·n2/(n1+n2))` is the scaled
    statistic compared against the Kolmogorov critical values.  Grid
    membership uses `floor(price/100.0)` — one IEEE double division by
    a literal on both engines, so bin assignment is bit-identical.

    Scale shape: one groupBy shuffle onto the bounded grid (≤ ~5k cells
    regardless of corpus size — price domain over grid step); prefix
    sums and the argmax run over that census; 1-row output."""
    x = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag").isin("R", "A"))
        .select(
            F.floor(F.col("l_extendedprice") / F.lit(100.0)).alias("grid"),
            (F.col("l_returnflag") == "R").cast("long").alias("g1"),
        )
    )
    v = x.groupBy("grid").agg(
        F.sum("g1").alias("c1v"),
        (F.count(F.lit(1)) - F.sum("g1")).alias("c2v"),
    )
    v.persist()
    wc = Window.orderBy("grid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = v.select(
        "grid",
        F.sum("c1v").over(wc).alias("c1"),
        F.sum("c2v").over(wc).alias("c2"),
    )
    t = v.agg(
        F.sum("c1v").alias("n1"),
        F.sum("c2v").alias("n2"),
        F.count(F.lit(1)).alias("n_grid"),
    )
    best = (
        c.crossJoin(F.broadcast(t))
        .select(
            "grid",
            F.abs(
                F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")
            ).alias("dnum"),
            "n1",
            "n2",
            "n_grid",
        )
        .orderBy(F.col("dnum").desc(), F.col("grid").asc())
        .limit(1)
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    d_stat = F.col("dnum").cast("double") / (n1d * n2d)
    return best.select(
        "n1",
        "n2",
        "n_grid",
        (F.col("grid") * 100).alias("grid_at"),
        F.round(d_stat, 6).alias("d_stat"),
        F.round(
            d_stat
            * F.sqrt(n1d * n2d / (F.col("n1") + F.col("n2")).cast("double")),
            6,
        ).alias("ks_lambda"),
    )


@register(
    "chi_square_test",
    ids="stat-test: chi-square independence over a contingency table (exact integer deviations, quantized cell sum)",
    oracle="""
WITH cell AS (
    SELECT o_orderpriority AS priority, o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS observed
    FROM orders GROUP BY 1, 2
), m AS (
    SELECT priority, status, observed,
           CAST(sum(observed) OVER (PARTITION BY priority) AS BIGINT) AS rm,
           CAST(sum(observed) OVER (PARTITION BY status) AS BIGINT) AS sm,
           CAST(sum(observed) OVER () AS BIGINT) AS n
    FROM cell
), q AS (
    SELECT priority, status, observed, rm, sm, n,
           CAST(rm * sm AS DOUBLE) / n AS expected,
           (CAST(observed * n - rm * sm AS DOUBLE)
            * CAST(observed * n - rm * sm AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(rm AS DOUBLE)
                  * CAST(sm AS DOUBLE)) AS contrib
    FROM m
), tot AS (
    SELECT CAST(sum(CAST(floor(contrib * 1000000000 + 0.5) AS BIGINT))
               AS BIGINT) AS chiq,
           CAST(max(n) AS BIGINT) AS n,
           CAST(count(DISTINCT priority) AS BIGINT) AS nr,
           CAST(count(DISTINCT status) AS BIGINT) AS nc
    FROM q
)
SELECT q.priority, q.status, q.observed,
       round(q.expected, 4) AS expected,
       round(q.contrib, 6) AS contrib,
       round(CAST(tot.chiq AS DOUBLE) / 1000000000, 6) AS chi2,
       CAST((tot.nr - 1) * (tot.nc - 1) AS BIGINT) AS dof,
       round(sqrt((CAST(tot.chiq AS DOUBLE) / 1000000000)
                  / (CAST(tot.n AS DOUBLE)
                     * least(tot.nr - 1, tot.nc - 1))), 6) AS cramers_v
FROM q, tot
""",
)
def chi_square_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between order priority and order
    status — the contingency-table screen a labeling-balance audit runs
    (is the label column independent of the slice column?), reported
    per cell with the pooled statistic, dof, and Cramér's V effect size
    repeated on every row.

    Parity is engineered at two levels: each cell's deviation is the
    EXACT BIGINT `o·n − r·s` (expected counts `r·s/n` never materialize
    as intermediate floats in the statistic), and the 15 per-cell
    double contributions are quantized to 1e-9 and integer-summed, so
    the total is immune to partial-sum ordering — the trick `ab_test`-
    style single-expression queries don't need but multi-cell sums do.

    Scale shape: one groupBy shuffle onto the R×C cell table (bounded
    by the category domains, 15 rows here); margins via windows over
    that census; the 1-row total broadcast back; 15-row output."""
    cell = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    m = cell.select(
        "priority",
        "status",
        "observed",
        F.sum("observed")
        .over(Window.partitionBy("priority"))
        .alias("rm"),
        F.sum("observed").over(Window.partitionBy("status")).alias("sm"),
        F.sum("observed").over(Window.partitionBy()).alias("n"),
    )
    dev = (
        F.col("observed") * F.col("n") - F.col("rm") * F.col("sm")
    ).cast("double")
    q = m.select(
        "priority",
        "status",
        "observed",
        "rm",
        "sm",
        "n",
        ((F.col("rm") * F.col("sm")).cast("double") / F.col("n")).alias(
            "expected"
        ),
        (
            (dev * dev)
            / (
                F.col("n").cast("double")
                * F.col("rm").cast("double")
                * F.col("sm").cast("double")
            )
        ).alias("contrib"),
    )
    q.persist()
    tot = q.agg(
        _qsum(F.col("contrib"), 1000000000).alias("chiq"),
        F.max("n").alias("nn"),
        F.countDistinct("priority").alias("nr"),
        F.countDistinct("status").alias("nc"),
    )
    chi2 = F.col("chiq").cast("double") / F.lit(1000000000)
    return q.crossJoin(F.broadcast(tot)).select(
        "priority",
        "status",
        "observed",
        F.round("expected", 4).alias("expected"),
        F.round("contrib", 6).alias("contrib"),
        F.round(chi2, 6).alias("chi2"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"),
        F.round(
            F.sqrt(
                chi2
                / (
                    F.col("nn").cast("double")
                    * F.least(F.col("nr") - 1, F.col("nc") - 1)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


# log10(1 + 1/d) for d = 1..9, spelled as 12-digit decimal literals so
# BOTH engines parse the identical double — never recomputed via log()
# (whose last-ulp behavior is runtime-specific).
_BENFORD_P = (
    (1, 0.301029995664),
    (2, 0.176091259056),
    (3, 0.124938736608),
    (4, 0.096910013008),
    (5, 0.079181246048),
    (6, 0.066946789631),
    (7, 0.057991946978),
    (8, 0.051152522447),
    (9, 0.045757490561),
)

_BENFORD_VALUES_SQL = ", ".join(f"({d}, {p!r})" for d, p in _BENFORD_P)


@register(
    "benford_census",
    ids="stat-test: Benford first-digit law goodness-of-fit over order totals (literal constants, quantized chi2)",
    oracle=f"""
WITH d AS (
    SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                       1, 1) AS BIGINT) AS digit
    FROM orders
), c AS (
    SELECT digit, CAST(count(*) AS BIGINT) AS n_d FROM d GROUP BY digit
), t AS (
    SELECT CAST(sum(n_d) AS BIGINT) AS n FROM c
), p AS (
    SELECT CAST(digit AS BIGINT) AS digit,
           CAST(benford_p AS DOUBLE) AS benford_p
    FROM (VALUES {_BENFORD_VALUES_SQL}) AS v(digit, benford_p)
), q AS (
    SELECT p.digit, coalesce(c.n_d, 0) AS n_d, p.benford_p, t.n,
           (CAST(coalesce(c.n_d, 0) AS DOUBLE)
            - CAST(t.n AS DOUBLE) * p.benford_p)
           * (CAST(coalesce(c.n_d, 0) AS DOUBLE)
              - CAST(t.n AS DOUBLE) * p.benford_p)
           / (CAST(t.n AS DOUBLE) * p.benford_p) AS contrib
    FROM p LEFT JOIN c ON p.digit = c.digit, t
), tot AS (
    SELECT CAST(sum(CAST(floor(contrib * 1000000000 + 0.5) AS BIGINT))
               AS BIGINT) AS chiq
    FROM q
)
SELECT q.digit, CAST(q.n_d AS BIGINT) AS n_d,
       round(CAST(q.n_d AS DOUBLE) / q.n, 6) AS obs_share,
       q.benford_p,
       round(q.contrib, 6) AS contrib,
       round(CAST(tot.chiq AS DOUBLE) / 1000000000, 6) AS chi2
FROM q, tot
""",
)
def benford_census_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit goodness-of-fit over order totals — the
    classic fabricated-data / upstream-corruption screen: a synthetic
    or truncated feed's leading-digit histogram departs from
    `log10(1+1/d)` long before summary stats move.

    The 9 Benford probabilities are decimal LITERALS shared by both
    engines (see `_BENFORD_P`); the digit census is exact integers from
    one groupBy; the chi-square distance quantizes each of the 9 cell
    contributions to 1e-9 and integer-sums them (partial-sum-order
    immunity, same convention as `chi_square_test`).  Missing digits
    survive as zero-count rows via the LEFT JOIN from the constant
    table, keeping the output schema fixed at 9 rows at every SF.

    Scale shape: one groupBy shuffle onto ≤9 rows; everything after is
    arithmetic over the broadcast census; 9-row output."""
    d = table(spark, sf_dir, "orders").select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_d"))
    c.persist()
    t = c.agg(F.sum("n_d").alias("n"))
    p = spark.createDataFrame(
        list(_BENFORD_P), schema="digit long, benford_p double"
    )
    nd = F.coalesce(F.col("n_d"), F.lit(0))
    e = F.col("n").cast("double") * F.col("benford_p")
    q = (
        p.join(F.broadcast(c), "digit", "left")
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            nd.alias("n_d"),
            "benford_p",
            "n",
            (
                (nd.cast("double") - e) * (nd.cast("double") - e) / e
            ).alias("contrib"),
        )
    )
    q.persist()
    tot = q.agg(_qsum(F.col("contrib"), 1000000000).alias("chiq"))
    return q.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_d",
        F.round(F.col("n_d").cast("double") / F.col("n"), 6).alias(
            "obs_share"
        ),
        "benford_p",
        F.round("contrib", 6).alias("contrib"),
        F.round(F.col("chiq").cast("double") / F.lit(1000000000), 6).alias(
            "chi2"
        ),
    )


@register(
    "acf_lags",
    ids="stat-test: autocorrelation of the daily order-count series at lags 1..7 (all-BIGINT exact)",
    oracle="""
WITH d AS (
    SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS day_id,
           CAST(count(*) AS BIGINT) AS c
    FROM orders GROUP BY 1
), t AS (
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
    FROM d
), dev AS (
    SELECT d.day_id, t.n * d.c - t.s AS dv FROM d, t
), den AS (
    SELECT CAST(sum(dv * dv) AS BIGINT) AS den FROM dev
), lags AS (
    SELECT CAST(range AS BIGINT) AS lag FROM range(1, 8)
), num AS (
    SELECT l.lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(a.dv * b.dv) AS BIGINT) AS num
    FROM lags l
    JOIN dev a ON TRUE
    JOIN dev b ON b.day_id = a.day_id + l.lag
    GROUP BY l.lag
)
SELECT num.lag, num.n_pairs,
       round(CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE), 6) AS acf
FROM num, den
ORDER BY lag
""",
)
def acf_lags_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily ORDER-COUNT series at
    calendar lags 1..7 — the seasonality diagnostic a forecasting
    pipeline runs before choosing its seasonal period (a weekly cycle
    shows as a lag-7 peak).

    Counts (not revenue) keep the algebra wholly inside BIGINT: with
    deviations `dv_t = n·c_t − S` (the mean cleared by multiplying
    through by n, which cancels in the ratio), `acf_k =
    Σ dv_t·dv_{t+k} / Σ dv_t²` — every sum is exact and well under
    2^53, so the single double division is bit-identical on both
    engines.  Calendar gaps (days with no orders, present at the
    smallest SF) simply contribute no pair, and `n_pairs` reports the
    effective overlap per lag.

    Scale shape: one rollup shuffle onto ~2400 day rows; the lag
    expansion is a broadcast self-join of that census (days × 7, never
    the orders); 7-row output."""
    d = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day_id")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d.persist()
    t = d.agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("s")
    )
    dev = d.crossJoin(F.broadcast(t)).select(
        "day_id", (F.col("n") * F.col("c") - F.col("s")).alias("dv")
    )
    dev.persist()
    den = dev.agg(F.sum(F.col("dv") * F.col("dv")).alias("den"))
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    b = dev.select(
        F.col("day_id").alias("day_b"), F.col("dv").alias("dv_b")
    )
    num = (
        dev.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(b),
            F.col("day_b") == F.col("day_id") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("dv") * F.col("dv_b")).alias("num"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            F.round(
                F.col("num").cast("double") / F.col("den").cast("double"), 6
            ).alias("acf"),
        )
        .orderBy("lag")
    )


@register(
    "cusum_changepoint",
    ids="stat-test: CUSUM changepoint of the daily revenue series (exact integer argmax, binary-segmentation first split)",
    oracle="""
WITH d AS (
    SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS day_id,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
), p AS (
    SELECT day_id,
           CAST(sum(cents) OVER (ORDER BY day_id) AS BIGINT) AS prefix,
           CAST(row_number() OVER (ORDER BY day_id) AS BIGINT) AS t
    FROM d
), tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
    FROM d
), sc AS (
    SELECT p.day_id, p.t, p.prefix, tot.n, tot.s,
           tot.n * p.prefix - p.t * tot.s AS signed
    FROM p, tot
    WHERE p.t < tot.n
    ORDER BY abs(tot.n * p.prefix - p.t * tot.s) DESC, p.day_id ASC
    LIMIT 1
)
SELECT n AS n_days, day_id AS cp_day,
       round(CAST(signed AS DOUBLE) / (CAST(n AS DOUBLE) * 100), 4)
           AS cusum_peak,
       round(CAST(prefix AS DOUBLE) / (CAST(t AS DOUBLE) * 100), 4)
           AS mean_before,
       round(CAST(s - prefix AS DOUBLE) / (CAST(n - t AS DOUBLE) * 100), 4)
           AS mean_after
FROM sc
""",
)
def cusum_changepoint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the daily revenue series — the first
    split of binary segmentation: the day `t` maximizing
    `|Σ_{i≤t}(x_i − x̄)|`, i.e. where the level most decisively shifts.
    The screen a metrics-drift monitor runs before alerting "revenue
    regime changed at day D".

    The argmax is EXACT: multiplying the CUSUM through by n gives
    `n·prefix_t − t·S` — pure BIGINT on cent-quantized revenue (at the
    replicated sf1 tier the terms peak near 5·10^16, comfortably inside
    int64), so the winning day needs no float comparison at all; ties
    break to the earliest day.  Only the four REPORTED columns divide
    back to dollars as doubles, rounded.

    Scale shape: one rollup shuffle onto ~2400 day rows; prefix sums
    and the argmax run over that bounded census; 1-row output."""
    d = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day_id")
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                    "long"
                )
            ).alias("cents")
        )
    )
    d.persist()
    w = Window.orderBy("day_id")
    p = d.select(
        "day_id",
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("prefix"),
        F.row_number().over(w).cast("long").alias("t"),
    )
    tot = d.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    signed = F.col("n") * F.col("prefix") - F.col("t") * F.col("s")
    sc = (
        p.crossJoin(F.broadcast(tot))
        .where(F.col("t") < F.col("n"))
        .select("day_id", "t", "prefix", "n", "s", signed.alias("signed"))
        .orderBy(F.abs(F.col("signed")).desc(), F.col("day_id").asc())
        .limit(1)
    )
    return sc.select(
        F.col("n").alias("n_days"),
        F.col("day_id").alias("cp_day"),
        F.round(
            F.col("signed").cast("double")
            / (F.col("n").cast("double") * 100),
            4,
        ).alias("cusum_peak"),
        F.round(
            F.col("prefix").cast("double")
            / (F.col("t").cast("double") * 100),
            4,
        ).alias("mean_before"),
        F.round(
            (F.col("s") - F.col("prefix")).cast("double")
            / ((F.col("n") - F.col("t")).cast("double") * 100),
            4,
        ).alias("mean_after"),
    )


@register(
    "gini_split_census",
    ids="ml-prim: histogram-based best-split finder (LightGBM-style) — exact value census, Gini argmin per feature",
    oracle="""
WITH x AS (
    SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
           CAST(l_quantity AS BIGINT) AS q,
           CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
           CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tx
    FROM lineitem
), u AS (
    SELECT 'quantity' AS feature, q AS val, y FROM x
    UNION ALL SELECT 'discount', d, y FROM x
    UNION ALL SELECT 'tax', tx, y FROM x
), c AS (
    SELECT feature, val, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(y) AS BIGINT) AS pos
    FROM u GROUP BY 1, 2
), p AS (
    SELECT feature, val, cnt, pos,
           CAST(sum(cnt) OVER w AS BIGINT) AS nl,
           CAST(sum(pos) OVER w AS BIGINT) AS posl,
           CAST(sum(cnt) OVER (PARTITION BY feature) AS BIGINT) AS n,
           CAST(sum(pos) OVER (PARTITION BY feature) AS BIGINT) AS npos,
           row_number() OVER (PARTITION BY feature ORDER BY val DESC)
               AS rdesc
    FROM c
    WINDOW w AS (PARTITION BY feature ORDER BY val
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), s AS (
    SELECT feature, val, nl, posl, n, npos,
           2 * (CAST(posl * (nl - posl) AS DOUBLE) / nl
                + CAST((npos - posl) * ((n - nl) - (npos - posl))
                       AS DOUBLE) / (n - nl))
               / n AS impurity
    FROM p WHERE rdesc > 1
), best AS (
    SELECT *, row_number() OVER (PARTITION BY feature
                  ORDER BY impurity ASC, val ASC) AS rk
    FROM s
)
SELECT feature, val AS best_thr, nl, posl,
       round(impurity, 6) AS impurity,
       round(2 * CAST(npos * (n - npos) AS DOUBLE) / n / n - impurity, 6)
           AS gain
FROM best WHERE rk = 1
ORDER BY feature
""",
)
def gini_split_census_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based best-split finder — the inner loop of every
    distributed decision-tree/GBDT learner (LightGBM/XGBoost hist
    mode): collapse each feature to an exact (value → count, positives)
    census, then scan candidate thresholds `val ≤ v` for the split
    minimizing weighted Gini impurity of the returned-flag label.

    Exactness: the census is pure BIGINT (discount/tax quantized to
    integer percent via the shared `floor(x·100 + 0.5)` half-away
    convention); prefix sums give `(n_left, pos_left)` per threshold;
    the weighted impurity `2·(pL(nL−pL)/nL + pR(nR−pR)/nR)/n` is one
    shared double expression over those integers — every product stays
    under 2^53 even at the sf1 tier, so both engines compute the
    bit-identical double and the argmin (ties → lowest threshold)
    needs no rounding tolerance.  The max value per feature is excluded
    (an empty right side is not a split).

    Scale shape: one stack-projection scan, one groupBy onto the
    ~70-row value census (domains: 50 quantities, 11 discounts, 9
    taxes); all windows partition BY FEATURE over that census; 3-row
    output.  This is exactly why hist-mode GBDT scales: candidate
    evaluation runs on the census, never the fact."""
    x = table(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
        F.col("l_quantity").cast("long").alias("q"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).alias("d"),
        F.floor(F.col("l_tax") * 100 + F.lit(0.5)).alias("tx"),
    )
    u = x.select(
        F.expr(
            "stack(3, 'quantity', q, 'discount', d, 'tax', tx)"
        ).alias("feature", "val"),
        "y",
    )
    c = u.groupBy("feature", "val").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    wf = Window.partitionBy("feature")
    w = wf.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = c.select(
        "feature",
        "val",
        F.sum("cnt").over(w).alias("nl"),
        F.sum("pos").over(w).alias("posl"),
        F.sum("cnt").over(wf).alias("n"),
        F.sum("pos").over(wf).alias("npos"),
        F.row_number().over(wf.orderBy(F.col("val").desc())).alias("rdesc"),
    )
    nr = F.col("n") - F.col("nl")
    posr = F.col("npos") - F.col("posl")
    impurity = (
        F.lit(2)
        * (
            (F.col("posl") * (F.col("nl") - F.col("posl"))).cast("double")
            / F.col("nl")
            + (posr * (nr - posr)).cast("double") / nr
        )
        / F.col("n")
    )
    s = p.where(F.col("rdesc") > 1).select(
        "feature", "val", "nl", "posl", "n", "npos",
        impurity.alias("impurity"),
    )
    best = s.withColumn(
        "rk",
        F.row_number().over(
            wf.orderBy(F.col("impurity").asc(), F.col("val").asc())
        ),
    ).where(F.col("rk") == 1)
    parent = (F.col("npos") * (F.col("n") - F.col("npos"))).cast("double")
    return best.select(
        "feature",
        F.col("val").alias("best_thr"),
        "nl",
        "posl",
        F.round("impurity", 6).alias("impurity"),
        F.round(
            F.lit(2) * parent / F.col("n") / F.col("n")
            - F.col("impurity"),
            6,
        ).alias("gain"),
    ).orderBy("feature")


def _bloom_pos(key_str, i: int, m: int):
    """Bit position of hash ``i`` for a key string: the shared
    md5-60-bit convention (see extras module docstring) mod ``m`` —
    bit-identical across engines."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bloom{i}:"), key_str)), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % m
    )


@register(
    "bloom_prune_census",
    ids="sketch: portable Bloom-filter semi-join pruning census (md5 positions, measured FPR + fact prune fraction)",
    oracle="""
WITH member AS (
    SELECT s_suppkey AS key, CAST(s_nationkey < 5 AS INTEGER) AS is_member
    FROM supplier
), bits AS (
    SELECT DISTINCT
           CAST(('0x' || substr(md5('bloom' || CAST(i AS VARCHAR) || ':'
                    || CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) % 4096
               AS pos
    FROM member, (SELECT unnest([1, 2, 3]) AS i)
    WHERE is_member = 1
), probe AS (
    SELECT key, is_member,
           CAST(('0x' || substr(md5('bloom' || CAST(i AS VARCHAR) || ':'
                    || CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) % 4096
               AS pos
    FROM member, (SELECT unnest([1, 2, 3]) AS i)
), hits AS (
    SELECT probe.key, max(probe.is_member) AS is_member,
           CAST(sum(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hit
    FROM probe LEFT JOIN bits ON probe.pos = bits.pos
    GROUP BY probe.key
), verdict AS (
    SELECT key, is_member,
           CASE WHEN n_hit = 3 THEN 1 ELSE 0 END AS bloom_pos
    FROM hits
), summary AS (
    SELECT CAST(sum(is_member) AS BIGINT) AS n_members,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(CASE WHEN is_member = 1 AND bloom_pos = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS true_pos,
           CAST(sum(CASE WHEN is_member = 0 AND bloom_pos = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS false_pos
    FROM verdict
), nbits AS (
    SELECT CAST(count(*) AS BIGINT) AS bits_set FROM bits
), fact AS (
    SELECT CAST(count(*) AS BIGINT) AS fact_rows,
           CAST(sum(v.is_member) AS BIGINT) AS fact_kept_exact,
           CAST(sum(v.bloom_pos) AS BIGINT) AS fact_kept_bloom
    FROM lineitem l JOIN verdict v ON l.l_suppkey = v.key
)
SELECT 4096 AS m_bits, 3 AS k_hashes,
       s.n_members, nb.bits_set,
       round(CAST(nb.bits_set AS DOUBLE) / 4096, 6) AS load_factor,
       s.n_probes, s.true_pos, s.false_pos,
       round(CAST(s.false_pos AS DOUBLE) / (s.n_probes - s.n_members), 6)
           AS fpr,
       f.fact_rows, f.fact_kept_exact, f.fact_kept_bloom,
       round(1 - CAST(f.fact_kept_bloom AS DOUBLE) / f.fact_rows, 6)
           AS fact_prune_frac
FROM summary s, nbits nb, fact f
""",
)
def bloom_prune_census_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, measured end to end: build a
    4096-bit / 3-hash filter over the member suppliers (nations 0-4),
    probe EVERY supplier, and report the filter's measured false-
    positive rate plus the fraction of lineitem FACT rows a bloom
    pre-filter would prune before the real join — the runtime-filter
    pattern (Spark's own `spark.sql.optimizer.runtimeFilter.*`) made
    inspectable and oracle-checked.

    Portability: bit positions use the repo's md5-60-bit convention
    (`conv(substr(md5(...), 1, 15), 16, 10)` ==
    `('0x' || substr(md5(...), 1, 15))::BIGINT`) mod 4096, so the bit
    set, every probe verdict, and the measured FPR are bit-identical
    across engines — no probabilistic tolerance needed.  `true_pos ==
    n_members` in the output IS the no-false-negatives guarantee,
    verified, not assumed.

    Scale shape: the filter is dimension-sized by construction (≤4096
    positions after DISTINCT) and broadcasts; per-supplier verdicts
    (dim-sized) broadcast onto the fact scan, so the fact is touched by
    one pass with a map-side hash probe — exactly how a runtime filter
    deploys at 100 TB; 1-row output."""
    m, k = 4096, 3
    member = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"),
        (F.col("s_nationkey") < 5).cast("int").alias("is_member"),
    )
    key_str = F.col("key").cast("string")
    pos_arr = F.array(*[_bloom_pos(key_str, i, m) for i in range(1, k + 1)])
    probe = member.select(
        "key", "is_member", F.explode(pos_arr).alias("pos")
    )
    probe.persist()
    bits = (
        probe.where(F.col("is_member") == 1).select("pos").distinct()
    )
    hits = (
        probe.join(
            F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left"
        )
        .groupBy("key")
        .agg(
            F.max("is_member").alias("is_member"),
            F.sum(
                F.when(F.col("hit").isNotNull(), 1).otherwise(0)
            ).alias("n_hit"),
        )
    )
    verdict = hits.select(
        "key",
        "is_member",
        F.when(F.col("n_hit") == k, 1).otherwise(0).alias("bloom_pos"),
    )
    verdict.persist()
    summary = verdict.agg(
        F.sum("is_member").alias("n_members"),
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(
            (
                (F.col("is_member") == 1) & (F.col("bloom_pos") == 1)
            ).cast("long")
        ).alias("true_pos"),
        F.sum(
            (
                (F.col("is_member") == 0) & (F.col("bloom_pos") == 1)
            ).cast("long")
        ).alias("false_pos"),
    )
    nbits = bits.agg(F.count(F.lit(1)).alias("bits_set"))
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("key")
    )
    fact = (
        li.join(F.broadcast(verdict), "key")
        .agg(
            F.count(F.lit(1)).alias("fact_rows"),
            F.sum("is_member").alias("fact_kept_exact"),
            F.sum("bloom_pos").alias("fact_kept_bloom"),
        )
    )
    return (
        summary.crossJoin(F.broadcast(nbits))
        .crossJoin(F.broadcast(fact))
        .select(
            F.lit(m).cast("int").alias("m_bits"),
            F.lit(k).cast("int").alias("k_hashes"),
            "n_members",
            "bits_set",
            F.round(F.col("bits_set").cast("double") / m, 6).alias(
                "load_factor"
            ),
            "n_probes",
            "true_pos",
            "false_pos",
            F.round(
                F.col("false_pos").cast("double")
                / (F.col("n_probes") - F.col("n_members")),
                6,
            ).alias("fpr"),
            "fact_rows",
            "fact_kept_exact",
            "fact_kept_bloom",
            F.round(
                F.lit(1)
                - F.col("fact_kept_bloom").cast("double")
                / F.col("fact_rows"),
                6,
            ).alias("fact_prune_frac"),
        )
    )


@register(
    "psi_drift",
    ids="stat-test: population stability index between order-price cohorts (smoothed shares, quantized bin sum)",
    oracle="""
WITH x AS (
    SELECT least(9, CAST(floor(o_totalprice / 50000.0) AS BIGINT)) AS bin,
           CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
                THEN 1 ELSE 0 END AS is_ref,
           CASE WHEN year(CAST(o_orderdate AS DATE)) = 2000
                THEN 1 ELSE 0 END AS is_act
    FROM orders
    WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 2000)
), g AS (
    SELECT CAST(range AS BIGINT) AS bin FROM range(0, 10)
), c AS (
    SELECT g.bin,
           CAST(coalesce(sum(x.is_ref), 0) AS BIGINT) AS n_ref,
           CAST(coalesce(sum(x.is_act), 0) AS BIGINT) AS n_act
    FROM g LEFT JOIN x ON x.bin = g.bin
    GROUP BY g.bin
), t AS (
    SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
           CAST(sum(n_act) AS BIGINT) AS ta
    FROM c
), q AS (
    SELECT c.bin, c.n_ref, c.n_act,
           (CAST(c.n_ref AS DOUBLE) + 0.5) / (CAST(t.tr AS DOUBLE) + 5.0)
               AS ref_share,
           (CAST(c.n_act AS DOUBLE) + 0.5) / (CAST(t.ta AS DOUBLE) + 5.0)
               AS act_share
    FROM c, t
), k AS (
    SELECT bin, n_ref, n_act, ref_share, act_share,
           (act_share - ref_share) * ln(act_share / ref_share) AS contrib
    FROM q
), tot AS (
    SELECT CAST(sum(CAST(floor(contrib * 1000000 + 0.5) AS BIGINT))
               AS BIGINT) AS psiq
    FROM k
)
SELECT k.bin, k.n_ref, k.n_act,
       round(k.ref_share, 6) AS ref_share,
       round(k.act_share, 6) AS act_share,
       round(k.contrib, 6) AS contrib,
       round(CAST(tot.psiq AS DOUBLE) / 1000000, 6) AS psi
FROM k, tot
""",
)
def psi_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index — THE model-monitoring drift metric
    (credit-risk lineage: PSI < 0.1 stable, 0.1-0.25 watch, > 0.25
    shifted) — between the 1995 reference and year-2000 actual
    order-price cohorts on a fixed $50k / 10-bin grid.

    Definitional choices, shared verbatim by both engines: the full
    bin grid comes from a constant range (empty bins survive), shares
    use Laplace smoothing `(cnt + 0.5)/(n + 5.0)` so `ln` never sees
    zero, and per-bin contributions quantize to 1e-6 before the
    integer total (`ln` is the one transcendental the statistic cannot
    avoid — last-ulp runtime differences sit ~10 orders below the
    quantum, the same tolerance-by-construction `bm25_rank` uses).

    Scale shape: one groupBy shuffle onto the 10-bin census; the grid
    join, totals, and PSI all run on constant-size frames; 10-row
    output."""
    year = F.year(F.to_date("o_orderdate"))
    x = (
        table(spark, sf_dir, "orders")
        .where(year.isin(1995, 2000))
        .select(
            F.least(
                F.lit(9), F.floor(F.col("o_totalprice") / F.lit(50000.0))
            ).alias("bin"),
            (year == 1995).cast("long").alias("is_ref"),
            (year == 2000).cast("long").alias("is_act"),
        )
    )
    g = spark.range(0, 10).select(F.col("id").alias("bin"))
    c = (
        g.join(F.broadcast(x.groupBy("bin").agg(
            F.sum("is_ref").alias("sr"), F.sum("is_act").alias("sa")
        )), "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("sr"), F.lit(0)).alias("n_ref"),
            F.coalesce(F.col("sa"), F.lit(0)).alias("n_act"),
        )
    )
    c.persist()
    t = c.agg(F.sum("n_ref").alias("tr"), F.sum("n_act").alias("ta"))
    q = c.crossJoin(F.broadcast(t)).select(
        "bin",
        "n_ref",
        "n_act",
        (
            (F.col("n_ref").cast("double") + F.lit(0.5))
            / (F.col("tr").cast("double") + F.lit(5.0))
        ).alias("ref_share"),
        (
            (F.col("n_act").cast("double") + F.lit(0.5))
            / (F.col("ta").cast("double") + F.lit(5.0))
        ).alias("act_share"),
    )
    k = q.select(
        "*",
        (
            (F.col("act_share") - F.col("ref_share"))
            * F.log(F.col("act_share") / F.col("ref_share"))
        ).alias("contrib"),
    )
    k.persist()
    tot = k.agg(_qsum(F.col("contrib"), 1000000).alias("psiq"))
    return k.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_act",
        F.round("ref_share", 6).alias("ref_share"),
        F.round("act_share", 6).alias("act_share"),
        F.round("contrib", 6).alias("contrib"),
        F.round(F.col("psiq").cast("double") / F.lit(1000000), 6).alias(
            "psi"
        ),
    )


# alpha*(1-alpha)^i for alpha=0.3, i=0..31 — generated ONCE in Python
# and shared as identical decimal literals by both engines (runtime
# pow() is not ulp-portable).  The 32-lag truncation leaks <1e-5 of
# total weight; normalizing by the present-lag weight sum makes the
# estimator exact over whatever window is available (pandas
# ewm(adjust=True) semantics, truncated).
_EWMA_W = tuple((i, round(0.3 * 0.7**i, 12)) for i in range(32))
_EWMA_W_SQL = ", ".join(f"({i}, {w!r})" for i, w in _EWMA_W)


@register(
    "ewma_smooth",
    ids="timeseries: truncated exponential smoothing of daily revenue (32 literal weights, adjust-normalized)",
    oracle=f"""
WITH d AS (
    SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS day_id,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
), m AS (
    SELECT max(day_id) AS mx FROM d
), w AS (
    SELECT CAST(i AS BIGINT) AS lag, CAST(wt AS DOUBLE) AS wt
    FROM (VALUES {_EWMA_W_SQL}) AS v(i, wt)
), tgt AS (
    SELECT d.day_id, d.cents FROM d, m WHERE d.day_id > m.mx - 10
), j AS (
    SELECT tgt.day_id, tgt.cents, w.wt, src.cents AS lag_cents
    FROM tgt JOIN w ON TRUE
    JOIN d src ON src.day_id = tgt.day_id - w.lag
), s AS (
    SELECT day_id, CAST(max(cents) AS BIGINT) AS cents,
           CAST(count(*) AS BIGINT) AS n_lags,
           CAST(sum(CAST(floor(wt * lag_cents + 0.5) AS BIGINT))
               AS BIGINT) AS numq,
           CAST(sum(CAST(floor(wt * 1000000000 + 0.5) AS BIGINT))
               AS BIGINT) AS denq
    FROM j GROUP BY day_id
)
SELECT day_id,
       round(CAST(cents AS DOUBLE) / 100, 2) AS revenue,
       n_lags,
       round(CAST(numq AS DOUBLE)
             / (CAST(denq AS DOUBLE) / 1000000000) / 100, 4) AS ewma
FROM s ORDER BY day_id
""",
)
def ewma_smooth_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue for the
    final 10 calendar days — the level estimate a forecasting monitor
    serves.  The recursion is replaced by its 32-lag truncated closed
    form with the weights `0.3·0.7^i` as shared decimal LITERALS
    (leakage < 1e-5 of total weight), normalized by the weight mass of
    the lags actually present — so calendar gaps and the series head
    get pandas `ewm(adjust=True)` semantics identically on both
    engines, declaratively (no iteration for either engine to replay).

    Portability: daily revenue is exact cents; each `w·cents` product
    quantizes to one cent-quantum and integer-sums (cent terms peak
    ~3e12 at the sf1 tier — far inside int64 even ×32); the weight mass
    quantizes at 1e-9.  One double division chain at the end.

    Scale shape: one rollup shuffle onto the ~2400-day census; the
    10-target × 32-lag expansion is a broadcast join of that census;
    ≤10-row output."""
    d = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day_id")
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                    "long"
                )
            ).alias("cents")
        )
    )
    d.persist()
    m = d.agg(F.max("day_id").alias("mx"))
    w = spark.createDataFrame(list(_EWMA_W), schema="lag long, wt double")
    tgt = d.crossJoin(F.broadcast(m)).where(
        F.col("day_id") > F.col("mx") - 10
    )
    src = d.select(
        F.col("day_id").alias("src_day"), F.col("cents").alias("lag_cents")
    )
    j = tgt.crossJoin(F.broadcast(w)).join(
        F.broadcast(src),
        F.col("src_day") == F.col("day_id") - F.col("lag"),
    )
    s = j.groupBy("day_id").agg(
        F.max("cents").alias("cents"),
        F.count(F.lit(1)).alias("n_lags"),
        _qsum(F.col("wt") * F.col("lag_cents"), 1).alias("numq"),
        _qsum(F.col("wt"), 1000000000).alias("denq"),
    )
    return s.select(
        "day_id",
        F.round(F.col("cents").cast("double") / 100, 2).alias("revenue"),
        "n_lags",
        F.round(
            F.col("numq").cast("double")
            / (F.col("denq").cast("double") / F.lit(1000000000))
            / 100,
            4,
        ).alias("ewma"),
    ).orderBy("day_id")


@register(
    "rfm_segments",
    ids="analytics: RFM customer segmentation via distributed exact quintiles (integer census output)",
    oracle="""
WITH base AS (
    SELECT o_custkey AS custkey,
           CAST(max(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
               AS BIGINT) AS recency,
           CAST(count(*) AS BIGINT) AS frequency,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS monetary
    FROM orders GROUP BY 1
), q AS (
    SELECT custkey, monetary,
           ntile(5) OVER (ORDER BY recency, custkey) AS r_q,
           ntile(5) OVER (ORDER BY frequency, custkey) AS f_q,
           ntile(5) OVER (ORDER BY monetary, custkey) AS m_q
    FROM base
)
SELECT CAST(r_q AS INTEGER) AS r_q,
       CAST(f_q AS INTEGER) AS f_q,
       CAST(m_q AS INTEGER) AS m_q,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(monetary) AS BIGINT) AS monetary_cents
FROM q
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def rfm_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value census: per
    customer, Recency (last order day), Frequency (order count), and
    Monetary (lifetime cents), each cut into exact quintiles, then the
    (r, f, m) cell census with total monetary value per cell.  The
    "5-5-5 = champions" readout every CRM / LTV pipeline starts from.

    All three quintile assignments ride the distributed exact-ntile
    path (`global_ranks` + `ntile_from_rank`, custkey tiebreak — the
    bit-for-bit twin of SQL `ntile(5) OVER (ORDER BY v, custkey)`), so
    no global window ever touches the customer frame on the Spark
    side.  Monetary is exact cents (BIGINT), making every output
    column integer — hash parity without any rounding convention.

    Scale shape: one rollup shuffle onto the per-customer frame, three
    range-partition rank passes over it (customers, not orders), one
    groupBy onto ≤125 cells; the fact is scanned once."""
    base = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(
                F.datediff(
                    F.to_date("o_orderdate"),
                    F.lit("1970-01-01").cast("date"),
                ).cast("long")
            ).alias("recency"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                    "long"
                )
            ).alias("monetary"),
        )
    )
    base.persist()
    cur = base
    for dim, col in (("r_q", "recency"), ("f_q", "frequency"), ("m_q", "monetary")):
        ranked = global_ranks(cur, order_cols=(col, "custkey"))
        cur = ranked.withColumn(
            dim,
            ntile_from_rank(F.col(RANK_COL), F.col(N_COL), 5).cast("int"),
        ).drop(RANK_COL, N_COL)
    return (
        cur.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").alias("monetary_cents"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


@register(
    "feature_hash_census",
    ids="ml-prim: hashing-trick collision census over the (brand, type) feature vocabulary (md5 positions)",
    oracle="""
WITH f AS (
    SELECT DISTINCT p_brand || ':' || p_type AS feature
    FROM part
), h AS (
    SELECT feature,
           CAST(('0x' || substr(md5('fh:' || feature), 1, 15)) AS BIGINT)
               % 64 AS bucket
    FROM f
), b AS (
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_in_bucket
    FROM h GROUP BY bucket
)
SELECT CAST(sum(n_in_bucket) AS BIGINT) AS n_features,
       64 AS n_buckets,
       CAST(count(*) AS BIGINT) AS buckets_used,
       CAST(max(n_in_bucket) AS BIGINT) AS max_bucket_features,
       CAST(sum(CASE WHEN n_in_bucket > 1 THEN n_in_bucket ELSE 0 END)
           AS BIGINT) AS collided_features,
       round(CAST(sum(CASE WHEN n_in_bucket > 1 THEN n_in_bucket
                           ELSE 0 END) AS DOUBLE)
             / sum(n_in_bucket), 6) AS collision_rate
FROM b
""",
)
def feature_hash_census_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick audit — the census a feature-engineering pipeline
    runs before committing to `HashingTF`-style dimensionality: hash
    the ~150-value (brand, type) vocabulary into 64 buckets with the
    repo's md5-60-bit convention and measure the collision profile
    (birthday regime: most features SHOULD share buckets at this
    load factor — the census quantifies exactly how many, so the
    downstream model's collision noise is a measured quantity, not a
    hope).

    Everything is exact integers from portable md5 positions; the only
    double is the reported collision rate.

    Scale shape: the vocabulary census is one distinct + groupBy over
    the part dimension (bounded by the feature DOMAIN at any corpus
    size); 1-row output."""
    f = (
        table(spark, sf_dir, "part")
        .select(
            F.concat_ws(":", "p_brand", "p_type").alias("feature")
        )
        .distinct()
    )
    h = f.select(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fh:"), F.col("feature"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        .__mod__(64)
        .alias("bucket")
    )
    b = h.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_in_bucket"))
    collided = F.sum(
        F.when(F.col("n_in_bucket") > 1, F.col("n_in_bucket")).otherwise(0)
    )
    return b.agg(
        F.sum("n_in_bucket").alias("n_features"),
        F.lit(64).cast("int").alias("n_buckets"),
        F.count(F.lit(1)).alias("buckets_used"),
        F.max("n_in_bucket").alias("max_bucket_features"),
        collided.alias("collided_features"),
        F.round(
            collided.cast("double") / F.sum("n_in_bucket"), 6
        ).alias("collision_rate"),
    )


@register(
    "conformal_interval",
    ids="ml-eval: split-conformal prediction intervals per segment (md5 3-way split, exact order-statistic quantile, measured coverage)",
    oracle="""
WITH o AS (
    SELECT o.o_orderkey AS okey,
           c.c_mktsegment AS segment,
           CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents,
           CAST(('0x' || substr(md5('cf:' || CAST(o.o_orderkey AS VARCHAR)),
                                1, 15)) AS BIGINT) % 5 AS fold
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), model AS (
    SELECT segment,
           CAST(sum(cents) AS DOUBLE) / count(*) AS yhat
    FROM o WHERE fold >= 2 GROUP BY segment
), cal AS (
    SELECT o.segment, abs(CAST(o.cents AS DOUBLE) - m.yhat) AS score,
           o.okey
    FROM o JOIN model m ON o.segment = m.segment
    WHERE o.fold = 0
), ranked AS (
    SELECT segment, score,
           row_number() OVER (PARTITION BY segment
               ORDER BY score, okey) AS r,
           count(*) OVER (PARTITION BY segment) AS n_cal
    FROM cal
), qhat AS (
    SELECT segment, CAST(n_cal AS BIGINT) AS n_cal, score AS q
    FROM ranked
    WHERE r = least(CAST(floor((9 * (n_cal + 1) + 9) / 10.0) AS BIGINT),
                    n_cal)
), ev AS (
    SELECT o.segment,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN abs(CAST(o.cents AS DOUBLE) - m.yhat)
                              <= q.q THEN 1 ELSE 0 END) AS BIGINT)
               AS covered
    FROM o
    JOIN model m ON o.segment = m.segment
    JOIN qhat q ON o.segment = q.segment
    WHERE o.fold = 1
    GROUP BY o.segment
)
SELECT ev.segment, qhat.n_cal, ev.n_eval,
       round(qhat.q / 100, 4) AS qhat_dollars,
       round(CAST(ev.covered AS DOUBLE) / ev.n_eval, 6) AS coverage
FROM ev JOIN qhat ON ev.segment = qhat.segment
ORDER BY ev.segment
""",
)
def conformal_interval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals — the distribution-free
    uncertainty wrapper a serving layer puts around ANY point model:
    with a disjoint md5 3-way split (train 60% / calibration 20% /
    eval 20%), the calibration scores' ceil(0.9·(n+1))-th smallest
    absolute residual is a finite-sample-valid 90% interval half-width,
    and the held-out eval coverage REPORTED HERE verifies the guarantee
    empirically (~0.9 per segment).  Model = per-segment train-mean —
    deliberately crude; conformal validity doesn't care.

    Exactness: the md5 fold split is the repo's portable convention;
    the quantile is an ORDER STATISTIC (rank `min(ceil(0.9(n+1)), n)`
    with okey tiebreak — no interpolation), selected per segment by the
    distributed rank pass; scores are one shared double expression over
    exact cents; coverage is an integer count.

    Scale shape: one fact⋈dim broadcast join, one groupBy for the
    5-row model, one grouped rank pass over the CALIBRATION slice
    (20% of customers' orders, grouped by segment), broadcast q̂ back
    onto the eval slice; 5-row output."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = (
        table(spark, sf_dir, "orders")
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("c_mktsegment").alias("segment"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("cf:"),
                                F.col("o_orderkey").cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % 5
            ).alias("fold"),
        )
    )
    o.persist()
    model = (
        o.where(F.col("fold") >= 2)
        .groupBy("segment")
        .agg(
            (
                F.sum("cents").cast("double") / F.count(F.lit(1))
            ).alias("yhat")
        )
    )
    cal = (
        o.where(F.col("fold") == 0)
        .join(F.broadcast(model), "segment")
        .select(
            "segment",
            F.abs(F.col("cents").cast("double") - F.col("yhat")).alias(
                "score"
            ),
            "okey",
        )
    )
    ranked = global_ranks(
        cal, order_cols=("score", "okey"), group_cols=("segment",)
    )
    k = F.least(
        F.floor((9 * (F.col(N_COL) + 1) + 9) / F.lit(10.0)).cast("long"),
        F.col(N_COL),
    )
    qhat = ranked.where(F.col(RANK_COL) == k).select(
        "segment",
        F.col(N_COL).alias("n_cal"),
        F.col("score").alias("q"),
    )
    ev = (
        o.where(F.col("fold") == 1)
        .join(F.broadcast(model), "segment")
        .join(F.broadcast(qhat), "segment")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(
                (
                    F.abs(F.col("cents").cast("double") - F.col("yhat"))
                    <= F.col("q")
                ).cast("long")
            ).alias("covered"),
            F.max("n_cal").alias("n_cal"),
            F.max("q").alias("q"),
        )
    )
    return ev.select(
        "segment",
        "n_cal",
        "n_eval",
        F.round(F.col("q") / 100, 4).alias("qhat_dollars"),
        F.round(
            F.col("covered").cast("double") / F.col("n_eval"), 6
        ).alias("coverage"),
    ).orderBy("segment")


@register(
    "lorenz_gap_census",
    ids="analytics: Lorenz decile concentration of customer lifetime value (exact cents, distributed ntile)",
    oracle="""
WITH base AS (
    SELECT o_custkey AS custkey,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
), q AS (
    SELECT custkey, cents,
           ntile(10) OVER (ORDER BY cents, custkey) AS decile
    FROM base
), d AS (
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM q GROUP BY 1
), t AS (
    SELECT CAST(sum(cents) AS BIGINT) AS total FROM d
)
SELECT d.decile, d.n_customers, d.cents,
       round(CAST(d.cents AS DOUBLE) / t.total, 6) AS share,
       round(CAST(sum(d.cents) OVER (ORDER BY d.decile) AS DOUBLE)
             / t.total, 6) AS cum_share
FROM d, t
ORDER BY d.decile
""",
)
def lorenz_gap_census_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz concentration census: customers cut into lifetime-value
    deciles, each decile's share and cumulative share of total revenue
    — the "top decile carries X% of revenue" readout that complements
    `skew_profile`'s single Gini number with the full curve (and the
    business twin of the join-key skew problem: the same curve says
    which customer keys will be shuffle stragglers).

    Exactness: lifetime value is exact cents; decile membership rides
    the distributed exact-ntile path (custkey tiebreak — the
    `rfm_segments` convention); shares are single double divisions of
    exact BIGINTs, rounded only for display.

    Scale shape: one rollup shuffle onto the customer frame, one
    range-partition rank pass over it, a 10-row census after; windows
    only over that census; 10-row output."""
    base = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                    "long"
                )
            ).alias("cents")
        )
    )
    ranked = global_ranks(base, order_cols=("cents", "custkey"))
    q = ranked.withColumn(
        "decile",
        ntile_from_rank(F.col(RANK_COL), F.col(N_COL), 10).cast("int"),
    )
    d = q.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("cents"),
    )
    d.persist()
    t = d.agg(F.sum("cents").alias("total"))
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n_customers",
            "cents",
            F.round(
                F.col("cents").cast("double") / F.col("total"), 6
            ).alias("share"),
            F.round(
                F.sum("cents").over(wc).cast("double") / F.col("total"), 6
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )
