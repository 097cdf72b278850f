"""Media table construction: opaque binary payloads + typed metadata.

The synthetic corpus has no real media files, so the media table is
derived deterministically from ``documents`` — the payload is the
document text's UTF-8 bytes (any bytes are "media" to an opaque binary
column) and the metadata is arithmetic on ``doc_id``.  Determinism is
what lets the DuckDB oracle recompute every metadata-level answer; the
byte-level plumbing (binary type through shuffles, Arrow transfer into
Pandas stages) is exactly what real JPEG/WAV payloads would exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# One row per media object.  `payload` is the opaque blob; `meta` is the
# typed sidecar a real ingest would parse from container headers.
# Nullable fields only apply to some modalities (audio has no
# width/height, images no duration).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("codec", T.StringType(), False),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), False),
                ]
            ),
            False,
        ),
    ]
)

_TYPES = ["image", "audio", "video"]


def media_table_from_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic media table over ``documents``: modality cycles
    image/audio/video by ``doc_id % 3``; payload = UTF-8 text bytes;
    metadata derived from ``doc_id`` (image 64×(32+id%32), audio
    8kHz × (1+id%10)s, video 320×240 × (1+id%30)s).  The fake codec name
    ``raw-text`` marks payloads the stub decoder accepts."""
    from big_data_lab_three_spark.sources import table

    # spread_ok=False: this frame becomes binary payloads, and blobs
    # must never shuffle (SCALE.md) — the Arrow decode stages batch well
    # enough without redistribution.
    d = table(spark, sf_dir, "documents", spread_ok=False)
    mt = F.element_at(
        F.array(*[F.lit(t) for t in _TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    is_img = F.col("media_type") == "image"
    is_aud = F.col("media_type") == "audio"
    is_vid = F.col("media_type") == "video"
    payload = F.encode(F.col("text"), "UTF-8")
    return (
        d.select(
            F.col("doc_id").alias("media_id"),
            mt.alias("media_type"),
            payload.alias("payload"),
        )
        .withColumn(
            "meta",
            F.struct(
                F.lit("raw-text").alias("codec"),
                F.when(is_img, F.lit(64))
                .when(is_vid, F.lit(320))
                .cast("int")
                .alias("width"),
                F.when(is_img, (32 + F.col("media_id") % 32))
                .when(is_vid, F.lit(240))
                .cast("int")
                .alias("height"),
                F.when(is_aud, F.lit(8000)).cast("int").alias("sample_rate"),
                F.when(is_aud, (1 + F.col("media_id") % 10) * 1000)
                .when(is_vid, (1 + F.col("media_id") % 30) * 1000)
                .cast("int")
                .alias("duration_ms"),
                F.length("payload").cast("long").alias("n_bytes"),
            ),
        )
    )
