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


def test_group_quantiles_matches_duckdb_on_arbitrary_data(spark):
    """Differential check on ARBITRARY inputs (the oracle suite only
    exercises the fixture tables): group_quantiles must equal DuckDB's
    quantile_cont bit-for-bit — same interpolation arithmetic — under
    the documented NULL contract (count(value_col); all-NULL groups
    dropped via HAVING count(v) > 0)."""
    import duckdb
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from big_data_lab_three_spark.operators.rankstats import (
        group_quantiles,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),
                st.one_of(
                    st.none(),
                    st.floats(
                        min_value=-1e6,
                        max_value=1e6,
                        allow_nan=False,
                        allow_infinity=False,
                    ),
                ),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def run(rows):
        df = spark.createDataFrame(rows, "g int, v double")
        got = {
            r.g: (r.p25, r.p50, r.p90, r.n)
            for r in group_quantiles(
                df, "v", ["g"], {"p25": 0.25, "p50": 0.5, "p90": 0.9},
                count_col="n",
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t (g INTEGER, v DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        expect = {
            g: (p25, p50, p90, n)
            for g, p25, p50, p90, n in con.execute(
                """
                SELECT g, quantile_cont(v, 0.25), quantile_cont(v, 0.5),
                       quantile_cont(v, 0.9), count(v)
                FROM t GROUP BY g HAVING count(v) > 0
                """
            ).fetchall()
        }
        assert got == expect  # bit-exact, including group membership

    run()
