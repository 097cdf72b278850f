"""Robust-statistics query family — winsorized moments, median/MAD
outlier detection, and sketch-accuracy gating.

The reference's profiling surface is means/stds over columns that
contain ±inf and heavy tails (SURVEY.md §2.3 A5/A6 — the CICIDS rate
columns); a production data-quality pass needs the robust versions that
don't let one corrupt row move the statistic.  All three queries here
are built on scale-safe primitives:

- exact per-group quantiles come from the distributed-rank machinery
  (``operators/rankstats.py`` — range partition + local rank +
  broadcast offsets; no whole-group percentile buffer, no single-task
  window), the same path ``quantile_profile`` registered in r3;
- tiny derived frames (per-group bounds/medians) broadcast back onto
  the fact, so winsorizing/flagging is a map-side projection;
- the HLL sketch check pins ``approx_count_distinct``'s error INSIDE
  the value-hashed oracle output, so the mergeable sketch the 100 TB
  path relies on is itself correctness-gated.

Hash-parity: quantile interpolation mirrors the engines' shared
``lo + frac·(hi - lo)`` double arithmetic (see ``quantile_profile``);
clip/flag comparisons use those bit-identical bounds; floating
aggregates are rounded on both sides; integer counts are cast BIGINT in
the oracle (DuckDB sums of ints are HUGEINT otherwise).
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
from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.sources import table


@register(
    "winsorize_stats",
    ids="agg: winsorized moments per group (exact p05/p95 clip, distributed ranks)",
    oracle="""
WITH b AS (
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.05) AS lo,
           quantile_cont(l_extendedprice, 0.95) AS hi
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(least(greatest(l.l_extendedprice, b.lo), b.hi)), 4)
           AS wins_mean,
       round(stddev_samp(least(greatest(l.l_extendedprice, b.lo), b.hi)), 4)
           AS wins_std,
       CAST(sum(CASE WHEN l.l_extendedprice < b.lo THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clip_lo,
       CAST(sum(CASE WHEN l.l_extendedprice > b.hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clip_hi
FROM lineitem l
JOIN b USING (l_returnflag)
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
)
def winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean/std per return flag: clip ``l_extendedprice`` to
    its exact per-group [p05, p95] band, then take ordinary moments —
    the robust location/scale estimate that survives corrupt extreme
    rows, plus how many rows each tail clipped.

    Scale shape: the bounds frame is 3 rows (via
    :func:`group_quantiles` — one range shuffle, bounded memory); it
    broadcasts back so the clip is a map-side ``least/greatest``
    projection, and the final moments are one partial-aggregated
    hash agg.  No group ever sits in a single buffer or task.  The clip
    comparisons use bit-identical bounds on both engines (shared
    interpolation arithmetic), so the tail counts are exact."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    bounds = group_quantiles(
        li, "l_extendedprice", ("l_returnflag",), {"lo": 0.05, "hi": 0.95}
    )
    v = F.col("l_extendedprice")
    clipped = li.join(F.broadcast(bounds), "l_returnflag").select(
        "l_returnflag",
        F.least(F.greatest(v, F.col("lo")), F.col("hi")).alias("wv"),
        (v < F.col("lo")).cast("long").alias("clip_lo"),
        (v > F.col("hi")).cast("long").alias("clip_hi"),
    )
    return (
        clipped.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("wv"), 4).alias("wins_mean"),
            F.round(F.stddev_samp("wv"), 4).alias("wins_std"),
            F.sum("clip_lo").alias("n_clip_lo"),
            F.sum("clip_hi").alias("n_clip_hi"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "anomaly_mad",
    ids="agg: median/MAD robust outlier flagging (two distributed-rank passes)",
    oracle="""
WITH m AS (
    SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
    FROM lineitem
    GROUP BY l_returnflag
), d AS (
    SELECT l.l_returnflag,
           abs(l.l_extendedprice - m.med) AS adev,
           m.med AS med
    FROM lineitem l
    JOIN m USING (l_returnflag)
), md AS (
    SELECT l_returnflag, quantile_cont(adev, 0.5) AS mad
    FROM d
    GROUP BY l_returnflag
)
SELECT d.l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(min(d.med), 4) AS med,
       round(min(md.mad), 4) AS mad,
       CAST(sum(CASE WHEN d.adev > 4.4478 * md.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM d
JOIN md USING (l_returnflag)
GROUP BY d.l_returnflag
ORDER BY d.l_returnflag
""",
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per return flag: a row is anomalous when
    its absolute deviation from the group median exceeds 3 robust
    standard deviations (3·1.4826·MAD = 4.4478·MAD — the literal is
    pre-multiplied so both engines evaluate one identical constant).
    Median/MAD is the estimator pair that keeps a 50% breakdown point —
    the outliers themselves cannot move the threshold, unlike the
    mean/std z-score (``zscore_scale``).

    Scale shape: two :func:`group_quantiles` passes (median of values,
    then median of absolute deviations), each one range-partition
    shuffle with bounded memory; both tiny per-group frames broadcast
    back, so flagging is a map-side comparison feeding one partial
    hash agg.  The MAD pass ranks a DERIVED column (``|x - med|``) —
    the pattern that shows rank machinery composes: quantiles of
    expressions, not just of stored columns."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    med = group_quantiles(
        li, "l_extendedprice", ("l_returnflag",), {"med": 0.5}
    )
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        "med",
        F.abs(F.col("l_extendedprice") - F.col("med")).alias("adev"),
    )
    mad = group_quantiles(dev, "adev", ("l_returnflag",), {"mad": 0.5})
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("med"), 4).alias("med"),
            F.round(F.min("mad"), 4).alias("mad"),
            F.sum(
                (F.col("adev") > F.lit(4.4478) * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "hll_distinct_check",
    ids="agg: HLL++ approx_count_distinct with in-oracle accuracy gate",
    oracle="""
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT)  AS custkeys,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS orderkeys,
       TRUE AS custkeys_hll_ok,
       TRUE AS orderkeys_hll_ok
FROM orders
""",
)
def hll_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts next to an HLL++ sketch accuracy gate.

    ``count(DISTINCT ...)`` is exact but pays a de-dup exchange per
    column; ``approx_count_distinct`` is the 100 TB path — a fixed-size
    mergeable HLL++ register set per partition, ONE map-side-combined
    pass for any number of columns, no distinct shuffle.  The sketch is
    deterministic for given data (seeded xxHash64, deterministic
    merge), so the within-5%-of-exact flags are stable booleans the
    DuckDB oracle pins to TRUE — the sketch's error bound is checked by
    the same value-hash gate as everything else, not just promised
    (rsd=0.02 ⇒ 5% ≈ 2.5σ; verified across sf0.001/0.01/0.1).
    """
    o = table(spark, sf_dir, "orders")
    within = lambda approx, exact: (  # noqa: E731
        F.abs(approx.cast("double") - exact.cast("double"))
        <= F.lit(0.05) * exact.cast("double")
    )
    # The exact and approx sides are DELIBERATELY separate aggregates
    # (1-row × 1-row cross-join, the accepted tiny-crossJoin pattern):
    # fusing them makes Catalyst's multi-distinct Expand rewrite key the
    # partial stage by (o_orderkey, o_custkey, gid) WHILE carrying the
    # ~800-word HLL++ register buffers per group — ≈3 GB through the
    # exchange at sf0.1 for two 8-byte answers (measured 3.8s → 0.8s
    # same-day).  Split, the approx pass partial-combines ONE global
    # sketch per column and the Expand carries only counts.
    exact = o.agg(
        F.countDistinct("o_custkey").alias("custkeys"),
        F.countDistinct("o_orderkey").alias("orderkeys"),
    )
    approx = o.agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("_a_cust"),
        F.approx_count_distinct("o_orderkey", 0.02).alias("_a_order"),
    )
    agg = exact.crossJoin(approx)
    return agg.select(
        "custkeys",
        "orderkeys",
        within(F.col("_a_cust"), F.col("custkeys")).alias("custkeys_hll_ok"),
        within(F.col("_a_order"), F.col("orderkeys")).alias(
            "orderkeys_hll_ok"
        ),
    )


@register(
    "auc_rank",
    ids="ml-eval: exact distributed ROC-AUC via tie-averaged ranks (Mann-Whitney)",
    oracle="""
WITH r AS (
    SELECT o_totalprice AS score,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
           rank() OVER (ORDER BY o_totalprice) AS rk,
           count(*) OVER (PARTITION BY o_totalprice) AS cnt
    FROM orders
), t AS (
    SELECT sum(CASE WHEN pos = 1 THEN rk + (cnt - 1) / 2.0 END) AS rsum,
           sum(pos) AS np,
           sum(1 - pos) AS nn
    FROM r
)
SELECT CAST(np AS BIGINT) AS n_pos,
       CAST(nn AS BIGINT) AS n_neg,
       round((rsum - np * (np + 1) / 2.0) / (np * nn), 6) AS auc
FROM t
""",
)
def auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of a score column against a binary label, computed
    distributed via the Mann-Whitney rank-sum identity:
    ``AUC = (Σ ranks(positives) − n₊(n₊+1)/2) / (n₊·n₋)`` with
    tie-averaged ranks.  sklearn's ``roc_auc_score`` (the reference's
    M7 scoring surface, ``src/train.py``) sorts all scores on one node;
    this is the shape that evaluates a model over a 100 TB scored
    corpus without collecting it.

    Tie handling without a second data pass: :func:`global_ranks`
    assigns arbitrary distinct ranks within a tie group, and the MEAN of
    those ranks per distinct score equals the tie-averaged rank — so a
    per-score aggregate (sum of ranks, label counts) feeds the rank-sum
    directly.  Two shuffles total: the rank's range partition, then a
    hash agg keyed by distinct score; both partial-aggregated, nothing
    single-task.  The label here (orderstatus = 'F' vs totalprice) is
    an arbitrary-but-deterministic fixture — the machinery is the
    deliverable."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("score"),
        (F.col("o_orderstatus") == "F").cast("int").alias("pos"),
    )
    ranked = global_ranks(o, order_cols=("score",))
    per_score = ranked.groupBy("score").agg(
        F.avg(F.col(RANK_COL)).alias("arank"),
        F.sum("pos").alias("np_g"),
        F.count(F.lit(1)).alias("n_g"),
    )
    t = per_score.agg(
        F.sum(F.col("arank") * F.col("np_g")).alias("rsum"),
        F.sum("np_g").alias("np"),
        F.sum(F.col("n_g") - F.col("np_g")).alias("nn"),
    )
    np_, nn = F.col("np").cast("double"), F.col("nn").cast("double")
    return t.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.round(
            (F.col("rsum") - np_ * (np_ + 1) / F.lit(2.0)) / (np_ * nn), 6
        ).alias("auc"),
    )


@register(
    "gk_quantile_check",
    ids="agg: approx_percentile (Greenwald-Khanna) with in-oracle rank-error gate",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n,
       TRUE AS gk_p50_ok,
       TRUE AS gk_p99_ok
FROM lineitem
""",
)
def gk_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate-quantile twin of ``hll_distinct_check``: Spark's
    ``approx_percentile`` (Greenwald-Khanna, accuracy parameter 100 ⇒
    rank error ≤ n/100) is the mergeable sketch the 100 TB profile path
    uses where ``quantile_profile``'s exact machinery isn't needed.
    The sketch is deterministic for given data, so its guarantee is
    checkable inside the oracle gate: re-rank the value GK returned
    (one pass computing both ``count(x < v)`` and ``count(x ≤ v)``
    against the broadcast 1-row sketch result) and emit whether the
    value's REALIZED RANK INTERVAL — ``[count(<v)+1, count(≤v)]``, the
    set of ranks a tied value legitimately occupies — overlaps the
    tolerance band ``target ± 2·n/100``.  Gating on the upper rank
    alone would flip to FALSE on coarse-valued columns where a single
    tie run is wider than the band even though GK's rank guarantee
    holds (a returned value inside a huge tie run has SOME rank within
    ε·n of the target; ``count(≤v)`` is merely the largest of them).
    Booleans the DuckDB oracle pins to TRUE; error-bound verification
    rides the same value hash as every exact query."""
    li = table(spark, sf_dir, "lineitem").select("l_extendedprice")
    sketch = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 100).alias("v50"),
        F.percentile_approx("l_extendedprice", 0.99, 100).alias("v99"),
    )
    v = F.col("l_extendedprice")
    checked = li.crossJoin(F.broadcast(sketch)).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((v < F.col("v50")).cast("long")).alias("lt50"),
        F.sum((v <= F.col("v50")).cast("long")).alias("le50"),
        F.sum((v < F.col("v99")).cast("long")).alias("lt99"),
        F.sum((v <= F.col("v99")).cast("long")).alias("le99"),
    )
    n = F.col("n").cast("double")
    tol = F.lit(2.0) * n / F.lit(100.0)

    def interval_ok(lt: str, le: str, q: float):
        target = F.lit(q) * n
        lo = F.col(lt).cast("double") + F.lit(1.0)  # smallest tied rank
        hi = F.col(le).cast("double")  # largest tied rank
        return (lo <= target + tol) & (hi >= target - tol)

    return checked.select(
        "n",
        interval_ok("lt50", "le50", 0.5).alias("gk_p50_ok"),
        interval_ok("lt99", "le99", 0.99).alias("gk_p99_ok"),
    )


@register(
    "calibration_bins",
    ids="ml-eval: score-decile reliability diagram (distributed ntile + per-bin label rate)",
    oracle="""
WITH t AS (
    SELECT o_totalprice AS score,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
           ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
    FROM orders
)
SELECT CAST(bin AS INTEGER) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(score), 4) AS mean_score,
       round(avg(CAST(pos AS DOUBLE)), 6) AS frac_pos
FROM t
GROUP BY bin
ORDER BY bin
""",
)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram over score deciles — the calibration
    companion to ``auc_rank``: bucket the scored corpus into 10
    equal-count bins (exact SQL ``ntile`` semantics) and report each
    bin's mean score against its realized positive rate.  A calibrated
    model's curve hugs the diagonal; this is the evaluation table a
    quality-classifier training loop (Gopher/CCNet-style corpus
    filtering) watches per epoch.

    Scale shape: bin membership comes from the distributed rank path
    (``global_ranks`` + closed-form ``ntile_from_rank``, one range
    shuffle, deterministic ``o_orderkey`` tiebreak — never a
    single-task global window), and the per-bin rollup partial-
    aggregates into 10 groups."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("score"),
        "o_orderkey",
        (F.col("o_orderstatus") == "F").cast("int").alias("pos"),
    )
    ranked = global_ranks(o, order_cols=("score", "o_orderkey"))
    binned = ranked.withColumn(
        "bin",
        ntile_from_rank(F.col(RANK_COL), F.col(N_COL), 10).cast("int"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("score"), 4).alias("mean_score"),
            F.round(F.avg(F.col("pos").cast("double")), 6).alias("frac_pos"),
        )
        .orderBy("bin")
    )


@register(
    "revenue_trend",
    ids="ml-eval: distributed OLS trend over daily revenue (exact moment sums)",
    oracle="""
WITH d AS (
    SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               - 9300 AS x,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(19,2))
               AS y
    FROM orders
    GROUP BY 1
), m AS (
    SELECT count(*) AS n,
           CAST(sum(x) AS DOUBLE) AS sx,
           CAST(sum(x * x) AS DOUBLE) AS sxx,
           CAST(sum(y) AS DOUBLE) AS sy,
           CAST(sum(y * y) AS DOUBLE) AS syy,
           CAST(sum(x * y) AS DOUBLE) AS sxy
    FROM d
)
SELECT CAST(n AS BIGINT) AS n_days,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
           AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM m
""",
)
def revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed simple linear regression: the OLS slope / intercept /
    R² of daily order revenue against time — the trend fit a forecast
    or drift-monitor job runs over the whole history without collecting
    it (sklearn's ``LinearRegression`` — the reference's M3 family —
    fits in driver memory; this fits from five moment sums).

    Numerics, applying the sf0.1 ULP lesson (see ``summary_stats``):
    x is the epoch day CENTERED by a fixed literal (−9300, mid-range of
    the 1992-1998 order dates) so the ``n·Σxy − Σx·Σy`` cancellation
    keeps ~8 more significant bits; all five moments are EXACT (integer
    x sums, DECIMAL y/xy sums) cast to double once; both engines then
    evaluate the identical IEEE formula and the outputs carry the
    corpus-wide derived-value rounding.  The daily total is DECIMAL(19,2)
    — width > 18 forces DuckDB's int128 physical type so ``y*y`` widens
    to DECIMAL(38,4) instead of overflowing int64 at sf0.1.

    Scale shape: one shuffle to the ~2400-day rollup (map-side partial
    into day groups), then a 5-value reduce — the same
    one-pass-plus-tiny-reduce shape as ``summary_stats``, however large
    orders grows."""
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            (
                F.datediff(
                    F.to_date("o_orderdate"),
                    F.lit("1970-01-01").cast("date"),
                ).cast("long")
                - 9300
            ).alias("x")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("decimal(19,2)")
            .alias("y")
        )
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sxx = F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = num / den
    return m.select(
        F.col("n").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 4).alias("intercept"),
        F.round(num * num / (den * (n * syy - sy * sy)), 6).alias("r2"),
    )


@register(
    "freq_items_check",
    ids="agg: heavy-hitters sketch (lossy counting) with in-oracle no-false-negative gate",
    oracle="""
WITH f AS (
    SELECT o_orderpriority, count(*) AS n,
           count(*) * 1.0 / (SELECT count(*) FROM orders) AS frac
    FROM orders
    GROUP BY o_orderpriority
)
SELECT CAST(count(*) AS BIGINT) AS n_heavy_true,
       TRUE AS all_heavy_in_sketch
FROM f
WHERE frac > 0.1
""",
)
def freq_items_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitters via ``DataFrame.stat.freqItems`` (the
    Karp/Demaine-Lopez-Ortiz/Munro streaming lossy-counting algorithm —
    one pass, fixed memory, mergeable) gated in-oracle: the algorithm
    GUARANTEES every value with frequency above the support threshold
    appears in its output under ANY partitioning/merge order (false
    positives possible, false negatives not), so "every truly >10%
    value is in the 5%-support sketch" is a deterministic boolean the
    DuckDB oracle pins TRUE — robust even if the driver's session
    partitions the scan differently.  Third sketch-accuracy gate next
    to HLL (``hll_distinct_check``) and GK (``gk_quantile_check``);
    at 100 TB this is how per-column top-value profiling runs without a
    per-column groupBy exchange."""
    o = table(spark, sf_dir, "orders")
    sketch_row = o.stat.freqItems(["o_orderpriority"], support=0.05)
    sketch = sketch_row.select(
        F.explode("o_orderpriority_freqItems").alias("val")
    )
    total = o.count()
    heavy = (
        o.groupBy(F.col("o_orderpriority").alias("val"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 0.1 * total)
    )
    joined = heavy.join(
        F.broadcast(sketch.withColumn("_hit", F.lit(1))), "val", "left"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_heavy_true"),
        (F.sum(F.coalesce("_hit", F.lit(0))) == F.count(F.lit(1))).alias(
            "all_heavy_in_sketch"
        ),
    )


@register(
    "theil_sen_trend",
    ids="ml-eval: Theil-Sen robust trend over daily revenue (median of pairwise slopes via distributed exact ranks)",
    oracle="""
WITH d AS (
    SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               - 9300 AS x,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(19,2))
               AS y
    FROM orders
    GROUP BY 1
), pr AS (
    SELECT a.x AS xi, b.x AS xj,
           CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope
    FROM d a JOIN d b ON a.x < b.x
), ranked AS (
    SELECT slope,
           row_number() OVER (ORDER BY slope, xi, xj) AS r,
           count(*) OVER () AS np
    FROM pr
), sen AS (
    SELECT slope AS sen_slope, CAST(np AS BIGINT) AS n_pairs
    FROM ranked WHERE r = (np + 1) // 2
), ic AS (
    SELECT CAST(d.y AS DOUBLE) - sen.sen_slope * d.x AS icand, d.x,
           count(*) OVER () AS nd
    FROM d CROSS JOIN sen
), icr AS (
    SELECT icand, row_number() OVER (ORDER BY icand, x) AS r, nd
    FROM ic
)
SELECT CAST(ic2.nd AS BIGINT) AS n_days,
       sen.n_pairs,
       round(sen.sen_slope, 6) AS sen_slope,
       round(ic2.icand, 4) AS sen_intercept
FROM sen, (SELECT icand, nd FROM icr WHERE r = (nd + 1) // 2) ic2
""",
)
def theil_sen_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue — the median of all
    pairwise slopes, with the median intercept of ``y − slope·x``: the
    estimator that shrugs off the outlier days OLS chases (~29%
    breakdown point vs 0 for ``revenue_trend``'s OLS, which is exactly
    why drift monitors prefer it).

    The pair table is bounded by DAYS² (the aggregated series, never
    the raw orders), and both medians are EXACT via the distributed
    rankstats pass (``global_ranks`` — one range-partition shuffle, no
    global window over the pair table; the lower-median rank
    ``(n+1) div 2`` with (slope, xi, xj) tiebreaks is fully
    deterministic).  Slope numerators are exact DECIMAL differences
    cast to double once, so every pairwise slope is the identical IEEE
    double on both engines; round(6)/round(4) only on the reported
    columns.

    Scale shape: one rollup to ~2400 day rows, a broadcast self-join
    pair expansion (days², independent of order count), one
    range-partition rank shuffle per median, 1-row output."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        (
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).cast("long")
            - 9300
        ).alias("x")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(19,2)")
        .alias("y")
    )
    daily.persist()
    a = daily.select(F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = daily.select(F.col("x").alias("xj"), F.col("y").alias("yj"))
    pairs = (
        a.join(F.broadcast(b), F.col("xi") < F.col("xj"))
        .select(
            "xi",
            "xj",
            (
                (F.col("yj") - F.col("yi")).cast("double")
                / (F.col("xj") - F.col("xi"))
            ).alias("slope"),
        )
    )
    ranked = global_ranks(pairs, ["slope", "xi", "xj"])
    lower_median = F.floor((F.col(N_COL) + 1) / 2)
    sen = ranked.where(F.col(RANK_COL) == lower_median).select(
        F.col("slope").alias("sen_slope"),
        F.col(N_COL).alias("n_pairs"),
    )
    ic = daily.crossJoin(F.broadcast(sen)).select(
        "sen_slope",
        "n_pairs",
        (F.col("y").cast("double") - F.col("sen_slope") * F.col("x")).alias(
            "icand"
        ),
        "x",
    )
    icr = global_ranks(ic, ["icand", "x"])
    return icr.where(F.col(RANK_COL) == lower_median).select(
        F.col(N_COL).alias("n_days"),
        "n_pairs",
        F.round("sen_slope", 6).alias("sen_slope"),
        F.round("icand", 4).alias("sen_intercept"),
    )


@register(
    "isotonic_calibration",
    ids="ml-eval: isotonic (PAVA) calibration over score deciles via the exact minimax closed form",
    oracle="""
WITH t AS (
    SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
           ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
    FROM orders
), b AS (
    SELECT CAST(bin AS INTEGER) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(pos) AS BIGINT) AS p
    FROM t GROUP BY bin
), pre AS (
    SELECT bin, n, p,
           sum(n) OVER (ORDER BY bin) AS np,
           sum(p) OVER (ORDER BY bin) AS pp
    FROM b
), seg AS (
    SELECT j.bin AS j, k.bin AS k,
           CAST(k.pp - (j.pp - j.p) AS DOUBLE)
               / (k.np - (j.np - j.n)) AS seg_avg
    FROM pre j JOIN pre k ON j.bin <= k.bin
), inner_min AS (
    SELECT i.bin AS bin, s.j,
           min(s.seg_avg) AS m
    FROM pre i JOIN seg s ON s.j <= i.bin AND s.k >= i.bin
    GROUP BY 1, 2
), fit AS (
    SELECT bin, max(m) AS iso
    FROM inner_min GROUP BY bin
)
SELECT b.bin, b.n,
       round(CAST(b.p AS DOUBLE) / b.n, 6) AS raw_rate,
       round(fit.iso, 6) AS iso_rate
FROM b JOIN fit USING (bin)
ORDER BY bin
""",
)
def isotonic_calibration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of the score→label mapping — what PAVA
    (pool-adjacent-violators) computes, obtained here through the
    exact MINIMAX closed form ``iso_i = max_{j≤i} min_{k≥i}
    wavg(bins j..k)``: mathematically identical to the iterative
    pooling, but a pure join-aggregate over the 10-bin table, so BOTH
    engines evaluate it declaratively (no iteration to replay).  The
    isotonic rate is the monotone-nondecreasing fit a model-calibration
    step (quality classifiers, reranker score calibration) applies
    when the raw reliability curve wiggles.

    Every segment average is an exact rational — integer prefix-sum
    differences, one double division — so min/max selection is
    engine-portable without rounding conventions; round(6) only on the
    reported columns.

    Scale shape: bin membership rides the distributed rankstats path
    (one range shuffle over orders); everything after is joins over a
    10-row frame (55 segments) — free at any corpus size."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("score"),
        "o_orderkey",
        (F.col("o_orderstatus") == "F").cast("long").alias("pos"),
    )
    ranked = global_ranks(o, order_cols=("score", "o_orderkey"))
    binned = ranked.withColumn(
        "bin",
        ntile_from_rank(F.col(RANK_COL), F.col(N_COL), 10).cast("int"),
    )
    b = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("p")
    )
    wb = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = b.select(
        "bin", "n", "p",
        F.sum("n").over(wb).alias("np"),
        F.sum("p").over(wb).alias("pp"),
    )
    j = pre.select(
        F.col("bin").alias("j"),
        (F.col("pp") - F.col("p")).alias("pp0"),
        (F.col("np") - F.col("n")).alias("np0"),
    )
    k = pre.select(
        F.col("bin").alias("k"),
        F.col("pp").alias("ppk"),
        F.col("np").alias("npk"),
    )
    seg = (
        j.join(F.broadcast(k), F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            (
                (F.col("ppk") - F.col("pp0")).cast("double")
                / (F.col("npk") - F.col("np0"))
            ).alias("seg_avg"),
        )
    )
    i = pre.select(F.col("bin").alias("i"))
    inner_min = (
        i.join(
            F.broadcast(seg),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("seg_avg").alias("m"))
    )
    fit = inner_min.groupBy("i").agg(F.max("m").alias("iso"))
    return (
        b.join(fit, b["bin"] == fit["i"])
        .select(
            "bin",
            "n",
            F.round(F.col("p").cast("double") / F.col("n"), 6).alias(
                "raw_rate"
            ),
            F.round("iso", 6).alias("iso_rate"),
        )
        .orderBy("bin")
    )
