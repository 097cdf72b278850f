"""IO query corpus: CSV round-trip (S2/P8) and the JSON record source
(S3) — the reference's file-based dataflow edges, exercised end-to-end.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.sources import read_json_records, table
from big_data_lab_three_spark.sources.sinks import write_csv


def _scratch(name: str) -> str:
    """Per-process STABLE scratch path for round-trip sinks.  A fresh
    ``mkdtemp`` per invocation leaks one table slice per run — bench
    repeats, verify gates, and A/B rounds each compound it.  A fixed
    per-process path + ``mode=overwrite`` bounds the footprint to one
    copy per sink per process; the PID suffix keeps concurrent
    bench/verify processes from clobbering each other's files
    mid-read."""
    d = os.path.join(tempfile.gettempdir(), f"spark_graft_io_{os.getpid()}")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


@register(
    "csv_roundtrip",
    ids="S1,S2,P8",
    oracle="""
SELECT count(*) AS n,
       count(*) AS n_row_ids,
       count(DISTINCT l_orderkey) AS n_orders,
       round(sum(l_extendedprice), 2) AS revenue,
       round(sum(l_quantity), 2) AS total_qty,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem
WHERE l_quantity < 5
""",
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+P8 — CSV sink with explicit row-id (the pandas ``index=True``
    analogue, reference ``src/preprocess.py:106-119``) then re-read and
    re-aggregated.  The oracle computes the same profile from the
    ORIGINAL table — passing proves the round-trip is lossless column
    by column (Spark's shortest-repr double formatting round-trips
    exactly): full-precision sums/extrema of every written column,
    the key cardinality, and — since the oracle's ``n_row_ids`` is
    ``count(*)`` — that the sink assigned every row a DISTINCT row id
    (``monotonically_increasing_id`` ids are partition-gapped, so
    distinctness, not density, is the contract)."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") < 5)
    out = _scratch("lineitem_csv")
    write_csv(li.select("l_orderkey", "l_quantity", "l_extendedprice"), out)
    back = (
        spark.read.option("header", True)
        .schema("row_id long, l_orderkey long, l_quantity double, l_extendedprice double")
        .csv(out)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("row_id").alias("n_row_ids"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "json_records",
    ids="S3",
    oracle="""
SELECT CAST(f1 AS DOUBLE) AS f1, CAST(f2 AS DOUBLE) AS f2
FROM (VALUES (1.5, 2.0), (3.0, NULL), (-0.25, 7.5)) AS t(f1, f2)
""",
)
def json_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — the reference's ``{"X": [...], "y": [...]}`` functional-test
    fixture (``src/predict.py:133-135``): one multi-line JSON document,
    flattened via explode + struct-star (no ``pd.json_normalize``, no
    Python loop)."""
    fixture = {
        "X": [
            {"f1": 1.5, "f2": 2.0},
            {"f1": 3.0, "f2": None},
            {"f1": -0.25, "f2": 7.5},
        ],
        "y": [{"State": 1}, {"State": 0}, {"State": 1}],
    }
    path = _scratch("fixture.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(fixture, f)
    return read_json_records(spark, path, record_path="X").select(
        F.col("f1").cast("double"), F.col("f2").cast("double")
    )


@register(
    "orc_roundtrip",
    ids="S1-family: columnar sink/source beyond parquet (ORC write→read→verify)",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       round(sum(l_extendedprice), 2) AS revenue,
       round(sum(l_discount), 4) AS total_discount,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem
WHERE l_quantity >= 45 AND l_discount > 0.05
""",
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip: write a lineitem slice to ORC (zlib, Spark's
    built-in columnar alternative to parquet), read it back WITH a
    further predicate, and re-aggregate.  The oracle computes the same
    profile from the ORIGINAL parquet — passing proves the ORC
    writer/reader pair is value-lossless for longs and doubles AND that
    the read-back predicate (``l_discount > 0.05``, applied only on the
    ORC side in Spark but in the oracle's WHERE) selects the identical
    row set, i.e. predicate evaluation agrees across the format
    boundary.  At scale ORC pushes that filter to stripe/row-group
    indexes exactly like parquet does — the scan-side contract the
    engine's pushdown guarantees rely on is format-portable."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    out = _scratch("lineitem_orc")
    li.select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    ).write.mode("overwrite").orc(out)
    back = spark.read.orc(out).where(F.col("l_discount") > 0.05)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.round(F.sum("l_discount"), 4).alias("total_discount"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "partitioned_prune_roundtrip",
    ids="S1-family: hive-partitioned parquet layout write→read with partition pruning (the 100 TB access-path contract)",
    oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
WHERE year(o_orderdate) IN (1994, 1995)
GROUP BY 1
ORDER BY o_year
""",
)
def partitioned_prune_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned layout round-trip: write orders partitioned by
    order YEAR (the canonical time-partitioned ingest layout), read the
    directory back, and aggregate ONLY two partitions.  The oracle
    recomputes from the original parquet, so passing proves the
    partition column round-trips losslessly through the directory
    encoding AND the pruned read selects exactly the original rows.

    This is the single most important layout decision at 100 TB: a
    year (or date) partition key turns every time-bounded query into a
    directory prune — the scan lists 2 of ~7 partitions and never opens
    the rest (the plan pin asserts ``PartitionFilters`` carries the
    year predicate, i.e. pruning happens at PLANNING time, not as a
    row-level filter).  Partition count stays bounded (years, not
    days·customers) — the classic over-partitioning trap (millions of
    tiny files) is the inverse failure mode, documented here as the
    reason the key is coarse."""
    o = table(spark, sf_dir, "orders")
    out = _scratch("orders_by_year")
    o.withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    ).write.mode("overwrite").partitionBy("o_year").parquet(out)
    back = spark.read.parquet(out).where(
        F.col("o_year").isin(1994, 1995)
    )
    return (
        back.groupBy(F.col("o_year").cast("int").alias("o_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("o_year")
    )
