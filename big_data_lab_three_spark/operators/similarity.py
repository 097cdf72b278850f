"""Similarity search over embedding columns (``array<float>``).

Brute-force exact top-k as the correctness baseline; a random-hyperplane
LSH bucketed variant as the scale path (candidate generation touches only
matching buckets instead of the full cross product).  Both are pure
DataFrame plans — the dot products run as JVM higher-order functions.

At 100 TB the brute-force plan is a broadcast of the (small) query set
against a partitioned corpus — linear scan per query batch, which is the
right baseline; the LSH variant turns it into a bucket-key join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from big_data_lab_three_spark.functions.vector import (
    cosine_similarity,
    dot,
)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, scan the corpus once,
    rank per query.  Self-matches (same id) are excluded.

    Returns (query_id, neighbor_id, cos_sim, rank) with deterministic
    ordering (sim DESC, neighbor id ASC).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("qvec"), F.col("cvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplane_keys(
    df: DataFrame,
    planes: list[list[float]],
    tables: int,
    vec_col: str,
    out: str = "key",
) -> DataFrame:
    """Multi-table random-hyperplane LSH keys: ``planes`` are split into
    ``tables`` groups; each group's sign bits form one bucket key
    (table_id, signature).  One output row per (vector, table) via a
    single explode.  ``planes`` are driver-supplied seeded constants
    baked into the plan as literals — deterministic across runs.

    Multi-table is what makes sign-LSH usable: a pair with per-bit
    agreement p collides in one b-bit table w.p. p^b, but in ≥1 of L
    tables w.p. 1-(1-p^b)^L — recall is tuned by L without fattening
    any single bucket.
    """
    per = len(planes) // tables
    entries = []
    for t in range(tables):
        sig = F.lit(0).cast("long")
        for i, p in enumerate(planes[t * per : (t + 1) * per]):
            plane = F.array(*[F.lit(float(x)) for x in p])
            bit = (dot(F.col(vec_col), plane) > 0).cast("long")
            sig = sig + bit * F.lit(1 << i)
        entries.append(
            F.struct(F.lit(t).alias("tbl"), sig.alias("sig"))
        )
    return df.withColumn(out, F.explode(F.array(*entries)))


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    tables: int = 8,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane buckets on both sides,
    join on (table, signature), dedup candidates, score, rank.

    At 100 TB the corpus side is partitioned by the bucket key and only
    colliding buckets are scored — candidate count per query is
    L × bucket-size instead of the corpus size."""
    qb = hyperplane_keys(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        ),
        planes, tables, vec_col="qvec",
    )
    cb = hyperplane_keys(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
        ),
        planes, tables, vec_col="cvec",
    )
    candidates = (
        cb.join(F.broadcast(qb), on="key")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qvec", "cvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("qvec"), F.col("cvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
