"""Unit-level checks for the robust-statistics family — the DuckDB
oracle gate pins these queries end-to-end on the driver tables; these
tests pin the underlying MATH against independent numpy computations on
adversarial small inputs (ties, tiny groups, single-row groups), where
rank/interpolation bugs actually live.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_lab_three_spark.queries.robust import group_quantiles


def _auc_numpy(scores: list[float], labels: list[int]) -> float:
    """Tie-averaged Mann-Whitney AUC, computed independently."""
    order = np.argsort(scores, kind="stable")
    s = np.asarray(scores, dtype=float)[order]
    y = np.asarray(labels)[order]
    ranks = np.empty(len(s))
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and s[j + 1] == s[i]:
            j += 1
        ranks[i : j + 1] = (i + 1 + j + 1) / 2.0  # average of 1-based ranks
        i = j + 1
    np_pos = int(y.sum())
    nn = len(y) - np_pos
    rsum = float(ranks[y == 1].sum())
    return (rsum - np_pos * (np_pos + 1) / 2.0) / (np_pos * nn)


@pytest.mark.parametrize("seed", [0, 1])
def test_auc_rank_matches_numpy_with_ties(spark, seed):
    rng = np.random.default_rng(seed)
    # integer scores force heavy ties — the case naive rank AUC breaks
    scores = rng.integers(0, 10, size=400).astype(float).tolist()
    labels = (rng.random(400) < 0.3).astype(int).tolist()
    from big_data_lab_three_spark.operators.rankstats import (
        RANK_COL,
        global_ranks,
    )

    df = spark.createDataFrame(
        list(zip(scores, labels)), "score double, pos int"
    )
    ranked = global_ranks(df, order_cols=("score",))
    per_score = ranked.groupBy("score").agg(
        F.avg(F.col(RANK_COL)).alias("arank"),
        F.sum("pos").alias("np_g"),
        F.count(F.lit(1)).alias("n_g"),
    )
    row = per_score.agg(
        F.sum(F.col("arank") * F.col("np_g")).alias("rsum"),
        F.sum("np_g").alias("np"),
        F.sum(F.col("n_g") - F.col("np_g")).alias("nn"),
    ).first()
    auc = (row.rsum - row.np * (row.np + 1) / 2.0) / (row.np * row.nn)
    assert math.isclose(auc, _auc_numpy(scores, labels), rel_tol=1e-12)


@pytest.mark.parametrize(
    "values",
    [
        [1.0],  # single row: every quantile is the value itself
        [3.0, 1.0],  # two rows: pure interpolation
        [5.0, 5.0, 5.0, 5.0],  # all ties
        [2.0, 7.5, 7.5, 7.5, 9.0, -1.0, 0.0],  # ties straddling h
    ],
)
def test_group_quantiles_matches_numpy_linear(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = group_quantiles(
        df, "v", (), {"p25": 0.25, "p50": 0.5, "p99": 0.99}
    ).first()
    for key, p in (("p25", 0.25), ("p50", 0.5), ("p99", 0.99)):
        want = float(np.percentile(values, p * 100, method="linear"))
        assert math.isclose(getattr(got, key), want, rel_tol=1e-12), (
            f"{key}: {getattr(got, key)} != numpy {want} on {values}"
        )


def test_group_quantiles_per_group_isolation(spark):
    """Groups must not contaminate each other's quantiles — one huge
    outlier group next to a tiny group."""
    rows = [("a", float(i)) for i in range(100)] + [("b", 1e9)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r.g: r.p50
        for r in group_quantiles(df, "v", ("g",), {"p50": 0.5}).collect()
    }
    assert math.isclose(got["a"], 49.5, rel_tol=1e-12)
    assert got["b"] == 1e9


def test_group_quantiles_ignores_nulls_like_quantile_cont(spark):
    """NULLs must not shift quantiles (quantile_cont/percentile ignore
    them) nor poison low-p flanking rows — global_ranks sorts NULLs
    first, so the helper has to drop them before ranking."""
    rows = [("a", v) for v in [None, None, 1.0, 2.0, 3.0, 4.0, None]]
    df = spark.createDataFrame(rows, "g string, v double")
    got = group_quantiles(
        df, "v", ("g",), {"p0": 0.0, "p50": 0.5}, count_col="n"
    ).first()
    assert got.p0 == 1.0  # a NULL flanking row would make this None
    assert math.isclose(got.p50, 2.5, rel_tol=1e-12)
    assert got.n == 4  # count(v) semantics, not count(*)


def test_pagerank_mass_conserves_and_degree_correlates(spark, sf_dir):
    """Invariants the chained-CTE oracle can't state directly: total
    rank mass is conserved (Σr = 1 — no dangling vertices in the
    co-occurrence graph), every rank is positive and bounded below by
    the teleport floor 0.15/n, and rank orders with degree at the top
    (the max-degree vertex outranks the median vertex)."""
    from big_data_lab_three_spark.queries import load_all

    rows = load_all()["pagerank_check"].spark(spark, sf_dir).collect()
    n = len(rows)
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-4, f"rank mass {total} != 1"
    assert all(r.pagerank >= 0.15 / n - 1e-9 for r in rows)
    by_deg = sorted(rows, key=lambda r: r.degree)
    assert by_deg[-1].pagerank > by_deg[n // 2].pagerank


def test_time_weighted_avg_bounds_and_totals(spark, sf_dir):
    """TWA must sit inside the per-type min/max value envelope, and
    interval counts must total events-minus-users (each user
    contributes exactly n_events-1 intervals)."""
    from pyspark.sql import functions as F

    from big_data_lab_three_spark.queries import load_all
    from big_data_lab_three_spark.sources import table

    rows = load_all()["time_weighted_avg"].spark(spark, sf_dir).collect()
    ev = table(spark, sf_dir, "events")
    totals = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("u"),
    ).first()
    assert sum(r.n_intervals for r in rows) == totals.n - totals.u
    env = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        # intervals carry the CURRENT event's value, so the average of
        # any type's intervals stays inside the global value envelope
        lo = min(e.lo for e in env.values())
        hi = max(e.hi for e in env.values())
        assert lo - 1e-9 <= r.twa_value <= hi + 1e-9


def test_count_min_sketch_bounds_and_exact_merge(spark, sf_dir):
    """CMS contract on real data: estimates never under-count, respect
    the (e/w)·N error bound for every queried key, and per-shard
    sketches merge EXACTLY into the whole-corpus sketch."""
    import math

    from pyspark.sql import functions as F

    from big_data_lab_three_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )
    from big_data_lab_three_spark.sources import table

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k")
    )
    kw = dict(depth=4, width=1024, seed=7)
    sketch = cms_build(li, "k", **kw)
    sketch.persist()
    assert sketch.count() <= 4 * 1024

    truth = li.groupBy("k").agg(F.count(F.lit(1)).alias("true_n"))
    keys = truth.select("k")
    est = cms_estimate(sketch, keys, "k", **kw)
    joined = truth.join(est, "k")
    n_total = li.count()
    bound = math.e / 1024 * n_total
    bad = joined.where(
        (F.col("cms_count") < F.col("true_n"))
        | (F.col("cms_count") > F.col("true_n") + F.lit(bound))
    ).count()
    assert bad == 0, f"{bad} keys outside CMS bounds"

    # shard-and-merge equals whole-corpus build, counter for counter
    a = li.where(F.col("k") % 2 == 0)
    b = li.where(F.col("k") % 2 != 0)
    merged = cms_merge(cms_build(a, "k", **kw), cms_build(b, "k", **kw))
    diff = (
        merged.withColumnRenamed("c", "cm")
        .join(sketch, ["d", "w"], "full_outer")
        .where(
            F.coalesce("cm", F.lit(0)) != F.coalesce("c", F.lit(0))
        )
        .count()
    )
    assert diff == 0
    sketch.unpersist()


def test_hll_shard_union_matches_whole_corpus(spark, sf_dir):
    """Mergeable-sketch story #2 (built-in DataSketches HLL next to the
    relational CMS): per-shard hll_sketch_agg united via hll_union_agg
    must estimate the same cardinality as the whole-corpus sketch —
    the property that lets a 1000-executor job sketch per partition
    and reduce, and lets INCREMENTAL pipelines maintain stored
    sketches by union instead of re-scanning history."""
    from pyspark.sql import functions as F

    from big_data_lab_three_spark.sources import table

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k")
    )
    whole = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("k")).alias("n")
    ).first()
    shards = [li.where(F.col("k") % 3 == i) for i in range(3)]
    sketches = [
        s.agg(F.hll_sketch_agg("k").alias("s")) for s in shards
    ]
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionAll(s)
    merged = u.agg(
        F.hll_sketch_estimate(F.hll_union_agg("s")).alias("n")
    ).first()
    assert merged.n == whole.n  # identical sketch state, not just close
    exact = li.distinct().count()
    assert abs(merged.n - exact) / exact < 0.05
