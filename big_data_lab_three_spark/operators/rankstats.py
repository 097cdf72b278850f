"""Distributed exact order statistics — global/per-group row ranks
without a single-task window (SURVEY.md §2.7 scale-hardening).

The anti-pattern this module replaces: ``row_number()/ntile() OVER
(ORDER BY ...)`` with no (or a low-cardinality) PARTITION BY moves every
row through ONE window task — correct at test scale, a serialization
point at 100 TB.  The classic two-phase fix used here:

1. range-partition the rows on ``(group, order)`` keys — Spark's
   ``repartitionByRange`` builds ordered, disjoint key ranges, so
   partition *p* holds keys strictly below partition *p+1*'s and equal
   keys never straddle a boundary;
2. sort *within* each partition and read the local position off
   ``monotonically_increasing_id`` (consecutive from 0 inside a
   partition) — no window, no second exchange over the data;
3. aggregate one ``(group, pid) -> (count, min_id)`` row per partition
   — a tiny frame (``groups × partitions`` rows), cumulate it with a
   window *on that tiny frame only*, and broadcast-join the offsets
   back; ``rank = offset + (id - min_id) + 1``.

``global rank = partition offset + local rank`` is then exact, every
heavy stage is parallel, and the only single-task work touches the
offsets frame (∼32 rows).  The same machinery yields exact per-group
quantiles (filter ranks around ``(n-1)·p``) and exact equi-depth
histograms (closed-form ntile on the rank) — see
``queries/analytics.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Output column names added by :func:`global_ranks`.
RANK_COL = "_rank"
N_COL = "_n"


def global_ranks(
    df: DataFrame,
    order_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based rank of every row under ``ORDER BY order_cols``
    (per ``group_cols`` group if given), computed scalably.

    Adds ``_rank`` (1-based position within the group) and ``_n`` (group
    row count) to ``df``.  Rows with equal ``order_cols`` receive
    distinct arbitrary-but-valid consecutive ranks; pass a unique
    tiebreak column as the last ``order_cols`` entry when the caller
    needs deterministic assignment (e.g. ntile bucket membership).

    NULL order keys sort first (Spark default) — callers computing
    quantiles should filter NULLs beforehand.

    The returned frame is persisted: the offsets aggregate and the main
    frame both consume the ranked scan, and a recompute could re-sample
    range boundaries (different pids) between the two reads.
    """
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    keys = [*group_cols, *order_cols]
    # ONE data shuffle total.  The local position within each sorted
    # partition comes from ``monotonically_increasing_id`` — documented
    # consecutive-from-zero within a partition — re-based per
    # ``(group, partition)`` by the min id from the SAME tiny offsets
    # aggregate that carries the cumulative counts.  The naive
    # alternative (``row_number() OVER (PARTITION BY _pid)``) costs a
    # second full exchange (hashpartitioning on _pid) plus a second
    # sort of data that ``sortWithinPartitions`` already ordered.
    local = (
        df.repartitionByRange(p, *[F.col(c) for c in keys])
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    # Persist: offsets and the main read must see ONE materialization —
    # _pid/_mid are assignment-time values, and the two consumers must
    # agree on them.
    local.persist()
    # Tiny frame: one row per (group, physical partition).  The windows
    # below run on THIS frame only — groups × p rows, never the data.
    by_group = Window.partitionBy(*group_cols) if group_cols else (
        Window.partitionBy()
    )
    offsets = (
        local.groupBy(*group_cols, "_pid")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.min("_mid").alias("_min_mid"),
        )
        .select(
            *group_cols,
            "_pid",
            "_min_mid",
            F.coalesce(
                F.sum("_cnt").over(
                    by_group.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("_offset"),
            F.sum("_cnt").over(by_group).alias(N_COL),
        )
    )
    joined = local.join(
        F.broadcast(offsets), on=[*group_cols, "_pid"], how="inner"
    )
    return joined.withColumn(
        RANK_COL,
        F.col("_offset") + (F.col("_mid") - F.col("_min_mid")) + 1,
    ).drop("_pid", "_mid", "_min_mid", "_offset")


def ntile_from_rank(rank, n, buckets: int):
    """Closed-form SQL-standard ``ntile(buckets)`` from an exact rank.

    With ``n`` rows and ``B`` buckets, ``ntile`` gives the first
    ``n mod B`` buckets ``ceil(n/B)`` rows and the rest ``floor(n/B)``
    — this computes that assignment from ``(rank, n)`` columns with
    integer arithmetic only, letting the distributed
    :func:`global_ranks` replace the single-task ``ntile() OVER
    (ORDER BY ...)`` while agreeing with it row-for-row.
    """
    b = F.lit(buckets)
    small = F.floor(n.cast("long") / b)  # floor(n/B) rows in late buckets
    big = small + 1  # ceil(n/B) rows in the first (n mod B) buckets
    r = n.cast("long") % b
    boundary = r * big  # ranks 1..boundary live in the big buckets
    return F.when(
        rank <= boundary, F.floor((rank - 1) / big) + 1
    ).otherwise(r + F.floor((rank - 1 - boundary) / small) + 1)


def group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    probs: dict[str, float],
    count_col: str | None = None,
) -> DataFrame:
    """Exact per-group continuous quantiles as a TINY frame — one row
    per group, one column per entry of ``probs`` (name -> p), plus the
    group row count as ``count_col`` when requested.

    Ranks come from :func:`global_ranks` (one range-partition shuffle,
    memory bounded by partition, never by group); each quantile is then
    the standard interpolation between the two rows flanking
    ``h = (n-1)·p``, computed with DuckDB ``quantile_cont``'s exact
    double arithmetic — ``lo·(⌈h⌉-h) + hi·(h-⌊h⌋)``, ``lo`` alone when
    ``h`` is integral — so exact (unrounded) oracles can pin the result
    bit-for-bit (property-tested against DuckDB on arbitrary inputs in
    ``tests/test_rankstats.py``; the algebraically equal
    ``lo + frac·(hi-lo)`` differs by 1 ULP on real inputs).  This is
    the single shared implementation behind ``quantile_profile``,
    ``winsorize_stats``, ``anomaly_mad``.  The
    output frame has ``len(groups)`` rows — broadcast it back to the
    fact for clipping/flagging.

    NULL ``value_col`` rows are dropped first — ``quantile_cont`` /
    ``percentile`` ignore NULLs, but ``global_ranks`` sorts them FIRST,
    which would hand low-p quantiles a NULL flanking row and shift every
    other quantile; ``count_col`` therefore counts NON-NULL values
    (``count(value_col)`` semantics, not ``count(*)``).

    ORACLE CONTRACT for callers on NULLABLE columns: because of the
    drop above, (a) ``count_col`` must be pinned oracle-side as
    ``count(value_col)``, never ``count(*)``, and (b) a group whose
    values are ALL NULL produces NO output row here, whereas a SQL
    ``GROUP BY`` keeps it with NULL quantiles — pair this operator with
    a ``HAVING count(value_col) > 0`` (or an inner join back to the
    group list) on the oracle side.  The registered callers
    (``quantile_profile``, ``winsorize_stats``, ``anomaly_mad``,
    ``calibration_bins``) all run on NOT-NULL driver columns, where the
    two conventions coincide."""
    ranked = global_ranks(
        df.where(F.col(value_col).isNotNull()),
        order_cols=(value_col,),
        group_cols=tuple(group_cols),
    )
    rank, n, v = F.col(RANK_COL), F.col(N_COL), F.col(value_col)
    aggs = []
    outs: list[Column] = []
    for key, p in probs.items():
        h = (n - 1).cast("double") * F.lit(p)
        k = F.floor(h)
        aggs += [
            F.max(F.when(rank == k + 1, v)).alias(f"_{key}_lo"),
            F.max(F.when(rank == k + 2, v)).alias(f"_{key}_hi"),
            # DuckDB's Interpolator weights, each one FP subtraction:
            # RN-FRN and CRN-RN (NOT 1-frac, which can differ by an ULP)
            F.max(h - k).alias(f"_{key}_frac"),
            F.max((k + 1).cast("double") - h).alias(f"_{key}_lw"),
        ]
        lo = F.col(f"_{key}_lo")
        hi = F.coalesce(F.col(f"_{key}_hi"), F.col(f"_{key}_lo"))
        frac = F.col(f"_{key}_frac")
        outs.append(
            F.when(frac == 0, lo)
            .otherwise(lo * F.col(f"_{key}_lw") + hi * frac)
            .alias(key)
        )
    if count_col is not None:
        aggs.append(F.max(n).alias(count_col))  # N_COL is constant per group
        outs.append(F.col(count_col))
    return ranked.groupBy(*group_cols).agg(*aggs).select(*group_cols, *outs)
