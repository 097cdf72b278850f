"""Late-round extension queries — binding the newest operator families
(Count-Min Sketch, portable k-fold CV, deterministic weighted sampling,
the vendored real-PNG codec, binaryFile media ingest) into the
oracle-checked registry.

REGISTRATION-ORDER CONTRACT: this module is imported LAST in
``queries.__init__._MODULES`` **on purpose** — its names must sort
after every never-driver-verified name from the older modules so that
registering them mid-round cannot displace a queued name out of the
driver's 50-query correctness prefix.  Keep it last; add
newer-than-extras modules after it.

The md5-derived arithmetic used here is bit-portable across engines:
Spark's ``conv(substr(md5(x), 1, 15), 16, 10)`` equals DuckDB's
``('0x' || substr(md5(x), 1, 15))::BIGINT`` exactly (60-bit value,
verified in tests/test_properties.py for the weighted-sample priority).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.sources import table

if TYPE_CHECKING:  # executor-side imports happen inside the stages
    import pandas as pd


@register(
    "cms_heavy_hitters",
    ids="sketches: Count-Min point queries + exact shard-merge audit",
    oracle="""
SELECT l_suppkey,
       CAST(count(*) AS BIGINT) AS exact_cnt,
       TRUE AS overcount_ok,
       TRUE AS merge_ok
FROM lineitem
GROUP BY l_suppkey
ORDER BY exact_cnt DESC, l_suppkey
LIMIT 10
""",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter suppliers with a Count-Min Sketch audit riding the
    exact answer: the output pins the exact top-10 counts (full value
    oracle) plus two deterministic CMS invariants per key —
    ``overcount_ok`` (a CMS NEVER under-counts: est ≥ true, the
    one-sided guarantee) and ``merge_ok`` (two half-corpus sketches,
    split on l_orderkey parity so both shards carry every hot key,
    merged by counter addition, estimate EXACTLY what the whole-corpus
    sketch does — the mergeability that makes per-shard sketching +
    reduce correct at 100 TB).

    Scale shape: each sketch build is one explode + map-side-combining
    rollup whose exchange carries ≤ depth·width counter rows per task
    (never the data); estimates broadcast the KB-sized sketch tables to
    a 10-row key frame.  xxhash64 positions never leave the Spark plan
    — the oracle pins the exact side and the invariant booleans, which
    hold under ANY hash."""
    from big_data_lab_three_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    top = (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("l_suppkey"))
        .limit(10)
    )
    whole = cms_build(li, "l_suppkey")
    even = cms_build(li.where(F.col("l_orderkey") % 2 == 0), "l_suppkey")
    odd = cms_build(li.where(F.col("l_orderkey") % 2 == 1), "l_suppkey")
    merged = cms_merge(even, odd)
    keys = top.select("l_suppkey")
    est_w = cms_estimate(whole, keys, "l_suppkey", out_col="est_w")
    est_m = cms_estimate(merged, keys, "l_suppkey", out_col="est_m")
    return (
        top.join(est_w, "l_suppkey")
        .join(est_m, "l_suppkey")
        .select(
            "l_suppkey",
            "exact_cnt",
            (F.col("est_w") >= F.col("exact_cnt")).alias("overcount_ok"),
            (F.col("est_m") == F.col("est_w")).alias("merge_ok"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("l_suppkey"))
    )


@register(
    "cv_fold_balance",
    ids="ml: engine-portable content-hash k-fold assignment census",
    oracle="""
SELECT fold,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(c_acctbal), 4) AS avg_bal,
       min(c_custkey) AS min_key,
       max(c_custkey) AS max_key
FROM (
    SELECT c_custkey, c_acctbal,
           CAST(CAST(('0x' || substr(
                    md5(CAST(c_custkey AS VARCHAR) || '|cv0'), 1, 15))
                AS BIGINT) % 5 AS INTEGER) AS fold
    FROM customer
)
GROUP BY fold
ORDER BY fold
""",
)
def cv_fold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold census of the PORTABLE content-hash k-fold assignment
    (``ml.cv.fold_assignments(portable=True)``): row count, mean
    account balance, and key extrema per fold.  The oracle RECOMPUTES
    fold membership from scratch via the md5 twin — the leakage-audit
    property the cv module promises ("any engine can recompute
    membership") demonstrated literally: DuckDB independently assigns
    every row and must land the identical 5-way partition.

    Scale shape: assignment is a codegen'd scan projection (md5 + mod,
    no shuffle, no assignment table); the census is one hash
    aggregation over 5 groups."""
    from big_data_lab_three_spark.ml.cv import fold_assignments

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    folded = fold_assignments(c, k=5, key_cols=["c_custkey"], portable=True)
    return (
        folded.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy("fold")
    )


@register(
    "weighted_sample_topk",
    ids="sampling: Efraimidis-Spirakis weighted without-replacement",
    oracle="""
SELECT doc_id, n_chars
FROM documents
WHERE n_chars > 0
ORDER BY ln((CAST(CAST(('0x' || substr(
                 md5(CAST(doc_id AS VARCHAR) || 'es1'), 1, 15))
             AS BIGINT) AS DOUBLE) + 1.0) / 1152921504606846976.0)
         / CAST(n_chars AS DOUBLE) DESC,
         doc_id
LIMIT 50
""",
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A 50-document weighted sample ∝ ``n_chars`` via the
    deterministic Efraimidis-Spirakis operator
    (``operators.relational.weighted_sample``) — the training-data-mix
    primitive ("sample documents proportional to quality/length").
    The md5-derived priorities are a pure function of the data, so the
    oracle re-derives the SAME sample independently: u from the first
    15 md5 hex digits (+1, /16^15 ∈ (0,1]), priority ln(u)/w, top-k.

    Scale shape: priority is one scan projection; top-k is
    TakeOrderedAndProject (per-partition heaps, then a k-row merge) —
    never a global sort or window over the corpus (plan-pinned)."""
    from big_data_lab_three_spark.operators.relational import weighted_sample

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(
        d, 50, weight_col="n_chars", key_cols=["doc_id"], seed="es1"
    )


#: Pixel-generation formulas (doc_id, pixel_index) -> 0..255, one per
#: query so their stats differ; each must stay expressible in ANSI SQL.
_PIXELS_STATS = (31, 7)  # png_pixel_stats: (id*31 + i*7) % 256
_PIXELS_INGEST = (17, 5)  # media_ingest_stats: (id*17 + i*5) % 256
_SIDE = 8  # 8x8 grayscale images, 64 samples each


def _png_payload(doc_id: int, mults: tuple[int, int]) -> bytes:
    """Deterministic 8×8 grayscale PNG for a doc id — pixel i is
    ``(doc_id·a + i·b) mod 256``, a formula the DuckDB oracle evaluates
    directly (PNG is lossless, so decode ∘ encode is the identity and
    pixel statistics are computable WITHOUT a SQL-side decoder)."""
    import numpy as np

    from big_data_lab_three_spark.multimodal.png import encode_png

    a, b = mults
    i = np.arange(_SIDE * _SIDE, dtype=np.int64)
    px = ((doc_id * a + i * b) % 256).astype(np.uint8).reshape(_SIDE, _SIDE)
    return encode_png(px)


def _media_frame_pngs(docs: DataFrame) -> DataFrame:
    """documents(doc_id) -> MEDIA_SCHEMA rows with real PNG payloads."""
    from big_data_lab_three_spark.multimodal.media import MEDIA_SCHEMA

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for b in batches:
            if len(b) == 0:
                continue
            payloads = [
                _png_payload(int(did), _PIXELS_STATS) for did in b["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["doc_id"].astype("int64"),
                    "media_type": "image",
                    "payload": payloads,
                    "meta": [
                        {
                            "codec": "image/png",
                            "width": _SIDE,
                            "height": _SIDE,
                            "sample_rate": None,
                            "duration_ms": None,
                            "n_bytes": len(p),
                        }
                        for p in payloads
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


@register(
    "png_pixel_stats",
    ids="multimodal: REAL PNG decode (vendored codec) with value oracle",
    oracle="""
SELECT CAST(doc_id % 4 AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_imgs,
       CAST(sum(n_px) AS BIGINT) AS total_samples,
       round(avg(m), 6) AS avg_level,
       round(min(m), 6) AS min_level,
       round(max(m), 6) AS max_level
FROM (
    SELECT d.doc_id,
           count(*) AS n_px,
           avg((d.doc_id * 31 + t.i * 7) % 256) AS m
    FROM documents d, range(64) t(i)
    GROUP BY d.doc_id
)
GROUP BY bucket
ORDER BY bucket
""",
)
def png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL image decode with a full value oracle: every
    document becomes an 8×8 grayscale PNG (pixel i =
    ``(doc_id·31 + i·7) mod 256``) encoded by the vendored pure-Python
    codec, shipped as a binary payload through the standard
    ``multimodal.decode_media`` Arrow stage (PNG parse → inflate →
    unfilter → grayscale samples — Pillow when importable, vendored
    codec otherwise, identical values either way since grayscale PNG is
    lossless), then bucket-aggregated.  The oracle evaluates the pixel
    formula directly in SQL — no decoder needed — so any corruption
    anywhere in encode, Arrow binary transfer, decode, or the stats
    arithmetic breaks the hash.

    Scale shape: two Arrow-batched ``mapInPandas`` stages (encode,
    decode) with no shuffle between them — blobs never shuffle; the
    only exchange carries (bucket, partial aggregates)."""
    from big_data_lab_three_spark.multimodal.decode import decode_media

    docs = table(spark, sf_dir, "documents", spread_ok=False)
    dec = decode_media(_media_frame_pngs(docs))
    return (
        dec.groupBy((F.col("media_id") % 4).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_imgs"),
            F.sum("n_samples").cast("bigint").alias("total_samples"),
            F.round(F.avg("mean_level"), 6).alias("avg_level"),
            F.round(F.min("mean_level"), 6).alias("min_level"),
            F.round(F.max("mean_level"), 6).alias("max_level"),
        )
        .orderBy("bucket")
    )


@register(
    "media_ingest_stats",
    ids="multimodal: binaryFile ingest -> real decode, value oracle",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_px) AS BIGINT) AS total_samples,
       round(avg(m), 6) AS avg_level,
       round(min(m), 6) AS min_level,
       round(max(m), 6) AS max_level
FROM (
    SELECT d.doc_id,
           count(*) AS n_px,
           avg((d.doc_id * 17 + t.i * 5) % 256) AS m
    FROM documents d, range(64) t(i)
    WHERE d.doc_id < 200
    GROUP BY d.doc_id
)
""",
)
def media_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest half of the multimodal pipeline, end to end with a
    value oracle: 200 deterministic PNG files (pixel i =
    ``(doc_id·17 + i·5) mod 256``) are written to a scratch directory
    by the EXECUTORS (``foreachPartition`` — the distributed shape;
    no driver-side file loop), ingested back through the ``binaryFile``
    source (``sources.read_media_dir``: one row per file, codec from
    extension), decoded by the real PNG path, and profiled.  The oracle
    recomputes the corpus profile from the pixel formula — count, total
    samples, and the exact min/mean/max of the per-image means — so a
    byte lost anywhere in encode → file → binaryFile → decode breaks
    the hash.

    The scratch dir is per-process AND per-SF (concurrent gates and
    multi-SF processes never cross-read); rewrites are idempotent —
    identical bytes — so re-listing a warm dir is safe."""
    import tempfile

    from big_data_lab_three_spark.multimodal.decode import decode_media
    from big_data_lab_three_spark.sources.readers import read_media_dir

    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_media_{os.getpid()}_{os.path.basename(sf_dir)}",
    )
    os.makedirs(out, exist_ok=True)

    def write_part(rows) -> None:
        for r in rows:
            payload = _png_payload(int(r.doc_id), _PIXELS_INGEST)
            path = os.path.join(out, f"doc_{int(r.doc_id):05d}.png")
            with open(path, "wb") as f:
                f.write(payload)

    docs = table(spark, sf_dir, "documents", spread_ok=False)
    docs.select("doc_id").where(F.col("doc_id") < 200).foreachPartition(
        write_part
    )
    dec = decode_media(read_media_dir(spark, out))
    return dec.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_samples").cast("bigint").alias("total_samples"),
        F.round(F.avg("mean_level"), 6).alias("avg_level"),
        F.round(F.min("mean_level"), 6).alias("min_level"),
        F.round(F.max("mean_level"), 6).alias("max_level"),
    )


@register(
    "dup_cluster_census",
    ids="dedup: exact-duplicate cluster-size census (linear oracle — the sf1-verifiable dedup shape)",
    oracle="""
SELECT sz,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_docs
FROM (
    SELECT CAST(count(*) AS BIGINT) AS sz
    FROM (
        SELECT text FROM documents
        UNION ALL
        SELECT text FROM documents WHERE doc_id % 7 = 0
    )
    GROUP BY md5(text)
)
GROUP BY sz
ORDER BY sz
""",
)
def dup_cluster_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size distribution — the first dedup
    report every corpus audit produces (how much of the corpus is
    copies, and in how large cliques).  A seeded replica of every 7th
    document guarantees multi-member clusters at every SF; natural
    duplicates (sf0.1 has 8) fold in identically on both engines.

    Unlike the near-dup family, BOTH sides of this check are linear —
    digest groupBy, then a size rollup — so it is the dedup query that
    runs the full value oracle at the sf1 tier (where the replicated
    texts make all-pairs ground truths quadratic; see EXPERIMENTS.md).

    Scale shape: the first exchange carries 16-byte digests (never
    text), partial-aggregated map-side; the second carries
    |distinct sizes| rows."""
    d = table(spark, sf_dir, "documents", spread_ok=False)
    seeded = d.select("text").unionByName(
        d.where(F.col("doc_id") % 7 == 0).select("text")
    )
    sizes = seeded.groupBy(
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("_d")
    ).agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy("sz")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").alias("n_docs"),
        )
        .orderBy("sz")
    )


_DIM = 64  # embeddings fixture dimension (pinned by array_funcs_census)
_CENTROID_ORACLE = """
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(sqrt({norm_terms}), 4) AS centroid_norm,
       round(({mean_terms}) / {dim}, 4) AS centroid_mean,
       round(greatest({avg_terms}), 4) AS centroid_max
FROM embeddings
GROUP BY label
ORDER BY label
""".format(
    norm_terms=" + ".join(
        f"pow(avg(embedding[{i}]), 2)" for i in range(1, _DIM + 1)
    ),
    mean_terms=" + ".join(
        f"avg(embedding[{i}])" for i in range(1, _DIM + 1)
    ),
    avg_terms=", ".join(
        f"avg(embedding[{i}])" for i in range(1, _DIM + 1)
    ),
    dim=float(_DIM),
)


@register(
    "label_centroids",
    ids="vector: per-label centroid aggregation without explode (class prototypes / drift monitoring)",
    oracle=_CENTROID_ORACLE,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids — the class-prototype /
    drift-monitoring aggregate (and k-means' update step): elementwise
    mean over every vector of a label, reported as centroid norm, mean
    component, and max component.

    Scale shape: the naive plan explodes 64× the row count and
    shuffles (label, dim) pairs; here each dimension is its own
    ``avg(element_at(v, i))`` inside ONE hash aggregate — 64 parallel
    aggregates, partial-combined map-side, pure codegen, no explode,
    one |labels|-group exchange.  The oracle spells the identical 64
    per-dimension averages in SQL, so the elementwise arithmetic is
    value-checked end to end (the derived norm/mean/max are rounded:
    per-dimension sums commute differently across engines)."""
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    avgs = [
        F.avg(F.element_at(v, i).cast("double")).alias(f"_a{i}")
        for i in range(1, _DIM + 1)
    ]
    acols = [F.col(f"_a{i}") for i in range(1, _DIM + 1)]
    norm = None
    mean = None
    for c in acols:
        norm = F.pow(c, 2) if norm is None else norm + F.pow(c, 2)
        mean = c if mean is None else mean + c
    agg = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"), *avgs)
    return agg.select(
        "label",
        "n_vecs",
        F.round(F.sqrt(norm), 4).alias("centroid_norm"),
        F.round(mean / F.lit(float(_DIM)), 4).alias("centroid_mean"),
        F.round(F.greatest(*acols), 4).alias("centroid_max"),
    ).orderBy("label")


@register(
    "group_weighted_sample",
    ids="sampling: per-stratum Efraimidis-Spirakis (fixed per-language budgets, weighted within)",
    oracle="""
SELECT lang, doc_id, n_chars
FROM (
    SELECT lang, doc_id, n_chars,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY ln((CAST(CAST(('0x' || substr(
                                md5(CAST(doc_id AS VARCHAR) || 'es1'),
                                1, 15)) AS BIGINT) AS DOUBLE) + 1.0)
                           / 1152921504606846976.0)
                        / CAST(n_chars AS DOUBLE) DESC,
                        doc_id
           ) AS rn
    FROM documents
    WHERE n_chars > 0
)
WHERE rn <= 5
ORDER BY lang, doc_id
""",
)
def group_weighted_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five documents PER LANGUAGE sampled ∝ ``n_chars`` — the
    stratified data-mix primitive (fixed per-stratum budgets, weighted
    selection within each stratum) via
    ``operators.relational.group_weighted_sample``.  The oracle
    re-derives the identical per-language samples from the md5
    priority formula with its own window.

    Scale shape: one exchange keyed on the strata for the
    ``row_number`` window; priorities are a scan projection (see the
    operator docstring for the few-huge-strata pre-prune idiom)."""
    from big_data_lab_three_spark.operators.relational import (
        group_weighted_sample,
    )

    d = table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    return group_weighted_sample(
        d, 5, weight_col="n_chars", key_cols=["doc_id"],
        group_cols=["lang"], seed="es1",
    ).orderBy("lang", "doc_id")
