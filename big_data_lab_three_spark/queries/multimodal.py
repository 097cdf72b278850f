"""Multimodal query corpus: binary-payload + metadata operators.

The media table derives deterministically from ``documents``
(``multimodal.media``), so DuckDB can recompute every answer — including
the ``mapInPandas`` stages, whose fake-decode arithmetic (byte stats,
histograms, frame schedules) is expressible over ``encode(text)`` blobs.
That gives full value-hash oracles for the Python-stage plumbing, not
just rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_lab_three_spark.multimodal import (
    decode_media,
    extract_features,
    frame_sample,
    media_table_from_documents,
    resize_images,
)
from big_data_lab_three_spark.queries import register

# DuckDB twin of media_table_from_documents (metadata subset).
_DUCK_MEDIA = """
  SELECT doc_id AS media_id,
         ['image','audio','video'][(doc_id % 3) + 1] AS media_type,
         encode(text) AS payload,
         octet_length(encode(text)) AS n_bytes,
         CASE doc_id % 3 WHEN 1 THEN (1 + doc_id % 10) * 1000
                         WHEN 2 THEN (1 + doc_id % 30) * 1000 END
           AS duration_ms
  FROM documents
"""


@register(
    "multimodal_meta_profile",
    ids="multimodal: binary payload + typed metadata profile",
    oracle=f"""
WITH media AS ({_DUCK_MEDIA})
SELECT media_type,
       count(*) AS n,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       round(avg(n_bytes), 4) AS avg_bytes,
       round(avg(duration_ms), 4) AS avg_duration_ms
FROM media
GROUP BY media_type
""",
)
def multimodal_meta_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-level profile of the media table: pure Spark relational
    ops over the typed sidecar — no payload bytes move, the scan prunes
    the binary column entirely (the 100 TB fast path: metadata queries
    never read media)."""
    m = media_table_from_documents(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.round(F.avg("meta.n_bytes"), 4).alias("avg_bytes"),
        F.round(F.avg("meta.duration_ms"), 4).alias("avg_duration_ms"),
    )


@register(
    "multimodal_codec_census",
    ids="multimodal: per-(modality, codec) metadata census incl. resolutions",
    oracle=f"""
WITH media AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][(doc_id % 3) + 1] AS media_type,
         'raw-text' AS codec,
         octet_length(encode(text)) AS n_bytes,
         CASE doc_id % 3 WHEN 0 THEN 64 WHEN 2 THEN 320 END AS width,
         CASE doc_id % 3 WHEN 0 THEN 32 + doc_id % 32
                         WHEN 2 THEN 240 END AS height,
         CASE doc_id % 3 WHEN 1 THEN (1 + doc_id % 10) * 1000
                         WHEN 2 THEN (1 + doc_id % 30) * 1000 END
           AS duration_ms
  FROM documents
)
SELECT media_type,
       codec,
       count(*) AS n,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(count(DISTINCT width * 100000 + height) AS BIGINT)
         AS n_resolutions,
       CAST(max(height) AS INTEGER) AS max_height,
       round(avg(duration_ms), 4) AS avg_duration_ms
FROM media
GROUP BY media_type, codec
ORDER BY media_type, codec
""",
)
def multimodal_codec_census_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(modality, codec) metadata census — the planning query an
    ingest pipeline runs before scheduling decode work: row and byte
    volumes per codec (which decoders are needed, how much compute),
    distinct resolutions (whether a resize stage can batch uniformly),
    and duration mass for time-based media.  Pure sidecar arithmetic:
    the scan prunes the payload column entirely, so at 100 TB this
    reads metadata-only column chunks, never media bytes."""
    m = media_table_from_documents(spark, sf_dir)
    return (
        m.groupBy("media_type", F.col("meta.codec").alias("codec"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.countDistinct(
                F.col("meta.width") * 100000 + F.col("meta.height")
            ).alias("n_resolutions"),
            F.max("meta.height").alias("max_height"),
            F.round(F.avg("meta.duration_ms"), 4).alias("avg_duration_ms"),
        )
        .orderBy("media_type", "codec")
    )


@register(
    "multimodal_decode_stats",
    ids="multimodal: mapInPandas decode (stub codec) → sample stats",
    oracle=f"""
WITH media AS ({_DUCK_MEDIA})
SELECT media_type,
       count(*) AS n,
       CAST(sum(n_bytes) AS BIGINT) AS total_samples
FROM media
GROUP BY media_type
""",
)
def multimodal_decode_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode stage (stub codec) then aggregate: proves
    binary columns survive the Spark→Arrow→pandas round trip with the
    same byte counts DuckDB sees in the blobs."""
    m = media_table_from_documents(spark, sf_dir)
    d = decode_media(m)
    return d.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_samples").alias("total_samples"),
    )


@register(
    "multimodal_frame_sample",
    ids="multimodal: video frame sampling (1→N mapInPandas fan-out)",
    oracle=f"""
WITH media AS ({_DUCK_MEDIA}),
vids AS (SELECT * FROM media WHERE media_type = 'video'),
frames AS (
  SELECT media_id,
         CAST(g.i AS INTEGER) AS frame_idx,
         CAST(g.i * 500 AS INTEGER) AS ts_ms,
         CAST(n_bytes // ((duration_ms + 499) // 500) AS INTEGER)
           AS frame_bytes
  FROM vids,
       LATERAL (SELECT unnest(generate_series(
                  0, CAST((duration_ms + 499) // 500 AS INTEGER) - 1)) AS i
               ) g
)
SELECT media_id, frame_idx, ts_ms, frame_bytes FROM frames
""",
)
def multimodal_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling every 500 ms over video rows — the 1→N row
    fan-out through mapInPandas, value-checked frame-by-frame against
    the oracle's generate_series schedule."""
    m = media_table_from_documents(spark, sf_dir)
    return frame_sample(m, every_ms=500)


@register(
    "multimodal_features",
    ids="multimodal: byte-histogram feature extraction (Pandas UDF stand-in)",
    oracle=f"""
WITH media AS ({_DUCK_MEDIA})
SELECT media_type,
       round(CAST(sum(octet_length(payload)) AS DOUBLE), 4) AS total_mass
FROM media
GROUP BY media_type
""",
)
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction sanity: the L1-normalized histogram sums to 1
    per row, so the summed feature mass per modality equals the row
    count... scaled by payload bytes when un-normalized.  We check the
    un-normalized mass (= total bytes) to pin the histogram contents,
    not just its shape."""
    m = media_table_from_documents(spark, sf_dir)
    f = extract_features(m, dim=16)
    # un-normalize: features were divided by payload length; recover
    # mass by joining n_bytes back (metadata-only join, broadcast-able).
    meta = m.select("media_id", "media_type", F.col("meta.n_bytes").alias("nb"))
    mass = F.aggregate(
        "features", F.lit(0.0), lambda acc, x: acc + x
    ) * F.col("nb")
    return (
        f.join(meta, "media_id")
        .groupBy("media_type")
        .agg(F.round(F.sum(mass), 4).alias("total_mass"))
    )


@register(
    "multimodal_resize",
    ids="multimodal: image resize stage (payload rewrite, meta update)",
    oracle=f"""
WITH media AS ({_DUCK_MEDIA})
SELECT count(*) AS n_images,
       count(*) * 2304 AS total_bytes,
       48 AS avg_width
FROM media WHERE media_type = 'image'
""",
)
def multimodal_resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize all images to 48×48: payloads re-sampled to 2304 bytes and
    metadata rewritten in the same mapInPandas pass; audio/video rows
    pass through untouched.  total_bytes pins the payload rewrite,
    avg_width the metadata rewrite."""
    m = media_table_from_documents(spark, sf_dir)
    r = resize_images(m, 48, 48)
    imgs = r.where(F.col("media_type") == "image")
    return imgs.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg("meta.width").cast("int").alias("avg_width"),
    )
