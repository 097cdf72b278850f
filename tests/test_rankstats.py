"""Unit tests for the distributed exact-rank machinery
(operators/rankstats.py) — cross-checked against the single-task
window it replaces, on data small enough that the window is safe."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_lab_three_spark.operators.rankstats import (
    N_COL,
    RANK_COL,
    global_ranks,
    ntile_from_rank,
)


def _events_sample(spark, sf_dir, n=500):
    from big_data_lab_three_spark.sources import table

    return (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
        .limit(n)
    )


def test_global_rank_matches_window_rank(spark, sf_dir):
    df = _events_sample(spark, sf_dir)
    got = global_ranks(
        df, order_cols=("value", "event_id"), num_partitions=7
    ).select("event_id", RANK_COL)
    want = df.select(
        "event_id",
        F.row_number()
        .over(Window.orderBy("value", "event_id"))
        .alias(RANK_COL),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_grouped_rank_and_n_match_window(spark, sf_dir):
    df = _events_sample(spark, sf_dir)
    got = global_ranks(
        df,
        order_cols=("value", "event_id"),
        group_cols=("user_id",),
        num_partitions=5,
    ).select("event_id", RANK_COL, N_COL)
    w = Window.partitionBy("user_id")
    want = df.select(
        "event_id",
        F.row_number()
        .over(w.orderBy("value", "event_id"))
        .alias(RANK_COL),
        F.count(F.lit(1)).over(w).alias(N_COL),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_ntile_from_rank_matches_native_ntile(spark, sf_dir):
    # Exercises both uneven (n % B != 0) and tiny (n < B) regimes.
    for n, buckets in ((503, 10), (6, 10), (40, 4)):
        df = _events_sample(spark, sf_dir, n=n)
        ranked = global_ranks(
            df, order_cols=("value", "event_id"), num_partitions=3
        )
        got = ranked.select(
            "event_id",
            ntile_from_rank(F.col(RANK_COL), F.col(N_COL), buckets)
            .cast("int")
            .alias("b"),
        )
        want = df.select(
            "event_id",
            F.ntile(buckets)
            .over(Window.orderBy("value", "event_id"))
            .alias("b"),
        )
        assert got.exceptAll(want).count() == 0, (n, buckets)
        assert want.exceptAll(got).count() == 0, (n, buckets)
