"""Similarity-search query corpus over the ``embeddings`` table."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_lab_three_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
    pq_topk,
)
from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.sources import table


@register(
    "similarity_topk",
    ids="similarity: brute-force cosine top-k (exact baseline)",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 100 = 0
), c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
), s AS (
  SELECT query_id, neighbor_id,
         list_cosine_similarity(qv, cv) AS cos
  FROM c, q
  WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim,
       CAST(rn AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM s
)
WHERE rn <= 5
""",
)
def similarity_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for a deterministic query sample: broadcast
    queries × one corpus scan × per-query window rank.  This is the ANN
    correctness baseline; at 100 TB the same plan is a broadcast join
    over a partitioned corpus — linear, no shuffle of the corpus."""
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0)
    return brute_force_topk(q, e, k=5).select(
        "query_id", "neighbor_id",
        F.round("cos_sim", 4).alias("cos_sim"), "rank",
    )


@register(
    "similarity_lsh",
    ids="similarity: random-hyperplane LSH bucketed ANN (scale path)",
    oracle=None,  # approximate by design; recall asserted in tests/
)
def similarity_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k: 32 seeded hyperplanes as 8 tables
    × 4 bits; candidates from any colliding table.  Rows-only check
    here; tests assert recall against the brute-force baseline."""
    rng = np.random.default_rng(7)
    planes = rng.standard_normal((32, 64)).tolist()
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0)
    return lsh_bucketed_topk(q, e, planes, tables=8, k=5).select(
        "query_id", "neighbor_id",
        F.round("cos_sim", 4).alias("cos_sim"), "rank",
    )


@register(
    "similarity_ivf",
    ids="similarity: IVF coarse-quantizer ANN (KMeans cells + nprobe, scale path)",
    oracle=None,  # approximate by design; recall asserted in tests/
)
def similarity_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: seeded KMeans coarse quantizer (16 cells),
    corpus assigned to 1 cell each (the inverted file), queries probe
    their 4 nearest cells, exact cosine rescore on candidates.  Rows-only
    check here; tests assert recall against the brute-force baseline."""
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0)
    return ivf_topk(q, e, nlist=16, nprobe=4, k=5).select(
        "query_id", "neighbor_id",
        F.round("cos_sim", 4).alias("cos_sim"), "rank",
    )


@register(
    "similarity_lsh_recall",
    ids="similarity: LSH ANN exact-duplicate retrieval (deterministic full oracle)",
    oracle="""
SELECT vec_id + 1000000 AS query_id,
       vec_id AS neighbor_id,
       CAST(1.0 AS DOUBLE) AS cos_sim,
       CAST(1 AS INTEGER) AS rank
FROM embeddings
WHERE vec_id % 10 = 0
ORDER BY query_id
""",
)
def similarity_lsh_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-checkable slice of hyperplane-LSH ANN: queries are
    EXACT re-keyed copies of every tenth corpus vector, and an
    identical vector shares every sign bit, so it collides with its
    original in EVERY table — recall 1 by construction, not by
    probability.  With duplicate-free corpus vectors (checked: the
    testdata has none), cosine 1.0 is the unique maximum, so the
    top-1 answer is fully deterministic and the whole pipeline —
    signature computation, multi-table bucket join, candidate dedup,
    Arrow-batched rescore, ranked window — gets a DuckDB value hash,
    complementing ``similarity_lsh``'s probabilistic rows-only check."""
    rng = np.random.default_rng(7)
    planes = rng.standard_normal((32, 64)).tolist()
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    return (
        lsh_bucketed_topk(q, e, planes, tables=8, k=1)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 4).alias("cos_sim"),
            "rank",
        )
        .orderBy("query_id")
    )


@register(
    "similarity_ivf_recall",
    ids="similarity: IVF ANN exact-duplicate retrieval (deterministic full oracle)",
    oracle="""
SELECT vec_id + 1000000 AS query_id,
       vec_id AS neighbor_id,
       CAST(1.0 AS DOUBLE) AS cos_sim,
       CAST(1 AS INTEGER) AS rank
FROM embeddings
WHERE vec_id % 10 = 0
ORDER BY query_id
""",
)
def similarity_ivf_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF twin of ``similarity_lsh_recall``: an identical vector maps
    to the same nearest centroid as its original (the seeded quantizer
    is deterministic), so the original's cell is always probed and
    exact-duplicate recall is 1 regardless of nprobe.  Pins the
    KMeans assignment, inverted-file probe, candidate rescore, and
    ranking with a full value hash."""
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    return (
        ivf_topk(q, e, nlist=16, nprobe=4, k=1)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 4).alias("cos_sim"),
            "rank",
        )
        .orderBy("query_id")
    )


@register(
    "array_funcs_census",
    ids="§2.6 array family: higher-order functions over embedding arrays (transform/aggregate/exists/filter)",
    oracle="""
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(len(embedding)) AS INTEGER) AS dim_min,
       CAST(max(len(embedding)) AS INTEGER) AS dim_max,
       round(avg(CAST(list_max(embedding) AS DOUBLE)), 4) AS mean_max_elem,
       round(avg(CAST(list_min(embedding) AS DOUBLE)), 4) AS mean_min_elem,
       round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS mean_first_elem,
       CAST(sum(CASE WHEN len(list_filter(embedding, x -> x > 1.5)) > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_spike,
       CAST(sum(len(list_filter(embedding, x -> x < 0)) ) AS BIGINT)
           AS n_negative_elems
FROM embeddings
GROUP BY label
ORDER BY label
""",
)
def array_funcs_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function census over the embedding column —
    the §2.6 family the reference never needs (pandas has no array
    column) but any vector-bearing corpus does: ``array_max/min``,
    element extraction, ``exists`` (any element above a spike
    threshold), and ``filter``+``size`` (per-vector negative-element
    count), rolled up per label.

    Every array op here evaluates INSIDE whole-stage codegen as a pure
    projection — no explode, no shuffle of unrolled elements (64×
    row-count rows at 100 TB); the only exchange is the ~|labels|-group
    rollup.  Comparisons use exact float predicates and extractions
    (element_at is Spark's 1-based twin of DuckDB's ``embedding[1]``),
    so only the averaged extrema carry the corpus float-rounding."""
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min(F.size(v)).alias("dim_min"),
            F.max(F.size(v)).alias("dim_max"),
            F.round(F.avg(F.array_max(v).cast("double")), 4).alias(
                "mean_max_elem"
            ),
            F.round(F.avg(F.array_min(v).cast("double")), 4).alias(
                "mean_min_elem"
            ),
            F.round(F.avg(F.element_at(v, 1).cast("double")), 4).alias(
                "mean_first_elem"
            ),
            F.sum(
                F.exists(v, lambda x: x > 1.5).cast("long")
            ).alias("n_with_spike"),
            F.sum(
                F.size(F.filter(v, lambda x: x < 0)).cast("long")
            ).alias("n_negative_elems"),
        )
        .orderBy("label")
    )


@register(
    "similarity_pq",
    ids="similarity: product-quantization ANN (8-byte codes, ADC scan) — probabilistic top-k",
)
def similarity_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN over the shared deterministic query sample (every 100th
    vector, the ``similarity_topk`` baseline's set) — rows-only here
    (candidate choice is approximate); accuracy evidence lives in
    ``similarity_pq_recall``'s full oracle and the pytest recall gate
    against the brute-force baseline."""
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0)
    return pq_topk(q, e, m=8, ksub=16, k=5).select(
        "query_id",
        "neighbor_id",
        F.round("cos_sim", 4).alias("cos_sim"),
        "rank",
    ).orderBy("query_id", "rank")


@register(
    "similarity_pq_recall",
    ids="similarity: PQ ANN exact-duplicate retrieval (deterministic full oracle)",
    oracle="""
SELECT vec_id + 1000000 AS query_id,
       vec_id AS neighbor_id,
       CAST(1.0 AS DOUBLE) AS cos_sim,
       CAST(1 AS INTEGER) AS rank
FROM embeddings
WHERE vec_id % 10 = 0
ORDER BY query_id
""",
)
def similarity_pq_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ twin of the LSH/IVF recall queries: an identical vector
    attains the per-subspace minimum of every ADC table term, so its
    approximate distance is the global lower bound — it survives every
    candidate cut deterministically (only same-code vectors can tie),
    and the exact rescore ranks it first.  Pins codebook training,
    encoding, the ADC scan, candidate cuts, and rescore under a full
    value hash."""
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    return (
        pq_topk(q, e, m=8, ksub=16, k=1)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 4).alias("cos_sim"),
            "rank",
        )
        .orderBy("query_id")
    )
