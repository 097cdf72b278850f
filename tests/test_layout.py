"""Data-layout verification from the parquet footers themselves.

The Z-order claim is about FILE STATISTICS, not query results — so the
test opens the written files with pyarrow and measures how much of each
dimension's range every file spans.  A single-column sort gives narrow
spans in the sort column and full-width spans in the other; Z-ordering
must be narrow in BOTH, which is exactly what lets either-dimension
predicates skip most row groups at scale.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from big_data_lab_three_spark.sources import table
from big_data_lab_three_spark.sources.sinks import write_zordered


def _mean_span(path: str, col: str, lo: float, hi: float) -> float:
    """Mean fraction of [lo, hi] covered by each file's min/max stats."""
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        meta = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        assert fmin is not None, f"no stats for {col} in {f}"
        spans.append((float(fmax) - float(fmin)) / (hi - lo))
    assert spans
    return sum(spans) / len(spans)


def test_zorder_files_are_narrow_in_both_dimensions(spark, sf_dir, tmp_path):
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    row = o.selectExpr(
        "min(o_custkey) lo_a",
        "max(o_custkey) hi_a",
        "min(o_totalprice) lo_b",
        "max(o_totalprice) hi_b",
    ).first()

    zpath = str(tmp_path / "zordered")
    spath = str(tmp_path / "sorted_a")
    write_zordered(
        o, zpath, ("o_custkey", "o_totalprice"), num_files=8
    )
    (
        o.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    z_a = _mean_span(zpath, "o_custkey", row.lo_a, row.hi_a)
    z_b = _mean_span(zpath, "o_totalprice", row.lo_b, row.hi_b)
    s_b = _mean_span(spath, "o_totalprice", row.lo_b, row.hi_b)

    # Z-order: BOTH dims substantially narrower than full width; the
    # single-column layout leaves the second dim at ~full width.
    assert z_a < 0.8 and z_b < 0.8, (z_a, z_b)
    assert s_b > 0.9, s_b
    assert z_b < s_b * 0.8, (z_b, s_b)

    # and the data round-trips unchanged
    assert spark.read.parquet(zpath).count() == o.count()


def test_compaction_reduces_file_count_and_preserves_data(
    spark, sf_dir, tmp_path
):
    from big_data_lab_three_spark.sources.sinks import compact_small_files

    o = table(spark, sf_dir, "orders")
    path = str(tmp_path / "sprawl")
    o.repartition(64).write.parquet(path)  # simulate ingest sprawl
    before = len(glob.glob(f"{path}/part-*.parquet"))
    assert before >= 32
    checksum = o.selectExpr(
        "count(*) n", "round(sum(o_totalprice), 2) s"
    ).first()

    n = compact_small_files(spark, path, target_file_bytes=1 << 20)
    after = len(glob.glob(f"{path}/part-*.parquet"))
    assert after == n < before

    back = spark.read.parquet(path).selectExpr(
        "count(*) n", "round(sum(o_totalprice), 2) s"
    ).first()
    assert (back.n, back.s) == (checksum.n, checksum.s)


def test_zorder_skips_row_groups_for_second_dim_predicate(
    spark, sf_dir, tmp_path
):
    """The end-to-end payoff: for a selective predicate on the SECOND
    dimension, count the rows a min/max-pruning reader must actually
    scan (row groups whose stats intersect the range).  The z-ordered
    layout must scan a fraction of what the sorted-by-first-dim layout
    scans — this is the footer-level arithmetic parquet readers
    (Spark's included) use for row-group skipping."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    zpath = str(tmp_path / "z2")
    spath = str(tmp_path / "s2")
    # 32 files → deep enough Morton segments that each file's bounding
    # box is a small tile; 8 files would leave half-width boxes that a
    # central band always intersects
    write_zordered(o, zpath, ("o_custkey", "o_totalprice"), num_files=32)
    (
        o.repartitionByRange(32, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    b = o.selectExpr(
        "min(o_totalprice) lo", "max(o_totalprice) hi"
    ).first()
    # a ~10%-wide band in the middle of the price range
    q_lo = b.lo + (b.hi - b.lo) * 0.45
    q_hi = b.lo + (b.hi - b.lo) * 0.55

    def rows_scanned(path: str) -> int:
        total = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                g = meta.row_group(rg)
                for ci in range(meta.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema == "o_totalprice":
                        s = c.statistics
                        if s.min <= q_hi and s.max >= q_lo:
                            total += g.num_rows
        return total

    z, s = rows_scanned(zpath), rows_scanned(spath)
    assert s > 0
    assert z < s * 0.75, (z, s)
