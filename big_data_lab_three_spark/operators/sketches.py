"""Mergeable sketches as TINY DataFrames.

The registered sketch gates (`hll_distinct_check`, `gk_quantile_check`,
`freq_items_check`) exercise Spark's built-in sketch aggregates.  This
module adds the one classic mergeable sketch Spark's Python API does
not expose — the Count-Min Sketch (Cormode & Muthukrishnan 2005) — in
the engine's idiom: the sketch IS a relational table of
``depth × width`` counter rows, so building it is one partial-
aggregating rollup, merging shard sketches is ``unionAll`` +
``groupBy.sum`` (exact counter addition — the CMS merge operation),
and point queries are a broadcast join + ``min`` over depth rows.
No UDAF, no serialized binary state, everything codegen'd and
engine-portable (xxhash64 row hashing never leaves the Spark plan).

Guarantees (standard CMS, total stream size N, width w, depth d):
``true ≤ estimate`` always (counters only over-count), and
``estimate ≤ true + (e/w)·N`` with probability ``1 − e^−d`` per key.

At 100 TB: the rollup's exchange carries at most ``d·w`` rows per
task (map-side combine over the d·w counter key space), the sketch
table is KBs regardless of input size, and incremental maintenance is
"build the new batch's sketch, merge" — the same union+sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, depth: int, width: int, seed: int) -> Column:
    """Array of ``depth`` (d, w) hash positions for a key — one
    independent row hash per depth via seed offsets."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(key, F.lit(seed + d)), F.lit(width)).alias(
                    "w"
                ),
            )
            for d in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
) -> DataFrame:
    """Build a Count-Min Sketch of ``df[key_col]`` as a (d, w, c)
    DataFrame of at most ``depth·width`` rows: c = how many input rows
    hashed to counter (d, w).  One explode + one rollup; the counter
    key space bounds the exchange, not the input."""
    key = F.col(key_col).cast("string")
    return (
        df.select(F.explode(_positions(key, depth, width, seed)).alias("h"))
        .groupBy(F.col("h.d").alias("d"), F.col("h.w").alias("w"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width, seed):
    counter-wise addition — ``cms_merge(cms(A), cms(B))`` equals
    ``cms_build(A ∪ B)`` EXACTLY (not approximately), which is what
    makes per-shard sketching + reduce correct."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionAll(s)
    return out.groupBy("d", "w").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
    out_col: str = "cms_count",
) -> DataFrame:
    """Point-query ``keys[key_col]`` against the sketch: each key
    expands to its depth positions, joins the (broadcast — KBs) sketch
    table, and takes the MIN over depth counters; positions absent
    from the sketch count 0.  Returns ``keys`` + ``out_col``."""
    key = F.col(key_col).cast("string")
    expanded = keys.select(
        F.col(key_col),
        F.explode(_positions(key, depth, width, seed)).alias("h"),
    ).select(key_col, F.col("h.d").alias("d"), F.col("h.w").alias("w"))
    joined = expanded.join(F.broadcast(sketch), ["d", "w"], "left").select(
        key_col, F.coalesce("c", F.lit(0)).alias("_c")
    )
    return joined.groupBy(key_col).agg(F.min("_c").alias(out_col))
