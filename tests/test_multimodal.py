"""Multimodal plumbing: binary payloads through Arrow batches, stubbed
codec gating, 1→N frame fan-out, mixed-modality passthrough."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_lab_three_spark.multimodal import (
    decode_media,
    extract_features,
    frame_sample,
    media_table_from_documents,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return media_table_from_documents(spark, sf_dir).cache()


def test_media_schema_and_modalities(media):
    assert dict(media.dtypes)["payload"] == "binary"
    types = {r.media_type for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_decode_stats_match_payload_bytes(media):
    d = decode_media(media)
    row = (
        d.join(media, "media_id")
        .where(F.col("n_samples") != F.length("payload"))
        .count()
    )
    assert row == 0
    levels = d.agg(F.min("mean_level"), F.max("mean_level")).first()
    assert 0.0 <= levels[0] <= levels[1] <= 255.0


def test_unknown_codec_raises_not_implemented(spark, media):
    weird = media.withColumn(
        "meta",
        F.col("meta").withField("codec", F.lit("h264")),
    )
    with pytest.raises(Exception, match="NotImplementedError|no decoder"):
        decode_media(weird).collect()


def test_features_are_normalized_histograms(media):
    f = extract_features(media, dim=16)
    first = f.first()
    assert len(first.features) == 16
    bad = f.where(
        F.abs(
            F.aggregate("features", F.lit(0.0), lambda a, x: a + x) - 1.0
        )
        > 1e-9
    ).count()
    assert bad == 0


def test_resize_rewrites_images_only(media):
    r = resize_images(media, 8, 4)
    imgs = r.where(F.col("media_type") == "image")
    others = r.where(F.col("media_type") != "image")
    assert imgs.where(F.length("payload") != 32).count() == 0
    assert imgs.where(
        (F.col("meta.width") != 8) | (F.col("meta.height") != 4)
    ).count() == 0
    # non-images byte-identical to input
    orig = media.where(F.col("media_type") != "image").select(
        "media_id", F.md5("payload").alias("h")
    )
    after = others.select("media_id", F.md5("payload").alias("h2"))
    assert orig.join(after, "media_id").where(
        F.col("h") != F.col("h2")
    ).count() == 0


def test_frame_sample_schedule(media):
    frames = frame_sample(media, every_ms=500)
    vids = media.where(F.col("media_type") == "video").select(
        "media_id", F.col("meta.duration_ms").alias("dur")
    )
    got = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("ts_ms").alias("last_ts")
    )
    j = vids.join(got, "media_id")
    assert j.where(
        F.col("n") != F.ceil(F.col("dur") / 500).cast("int")
    ).count() == 0
    assert j.where(F.col("last_ts") >= F.col("dur")).count() == 0


def test_available_decoders_always_has_fake():
    from big_data_lab_three_spark.multimodal import available_decoders

    reg = available_decoders()
    assert "raw-text" in reg
    arr = reg["raw-text"](b"\x00\x80\xff")
    assert list(arr) == [0, 128, 255]


_needs_pillow = pytest.mark.skipif(
    not __import__(
        "big_data_lab_three_spark.multimodal", fromlist=["pillow_available"]
    ).pillow_available(),
    reason="Pillow not installed in this container",
)


@_needs_pillow
def test_png_payload_decodes_to_pixels(spark):
    """Real-codec path: a generated PNG decodes to w*h grayscale pixels
    with the exact mean the source array has."""
    import io

    import numpy as np
    from PIL import Image

    from big_data_lab_three_spark.multimodal import MEDIA_SCHEMA

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    buf = io.BytesIO()
    Image.fromarray(px, mode="L").save(buf, format="PNG")
    rows = [
        (
            1,
            "image",
            bytearray(buf.getvalue()),
            ("image/png", 8, 8, None, None, len(buf.getvalue())),
        )
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = decode_media(df).first()
    assert got.n_samples == 64
    assert got.mean_level == pytest.approx(float(px.mean()))


@_needs_pillow
def test_png_resize_reencodes_at_target_resolution(spark):
    import io

    import numpy as np
    from PIL import Image

    from big_data_lab_three_spark.multimodal import MEDIA_SCHEMA

    px = np.zeros((16, 16), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px, mode="L").save(buf, format="PNG")
    rows = [
        (
            1,
            "image",
            bytearray(buf.getvalue()),
            ("image/png", 16, 16, None, None, len(buf.getvalue())),
        )
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_images(df, 4, 4).first()
    assert out.meta.width == 4 and out.meta.height == 4
    assert out.meta.codec == "image/png"
    with Image.open(io.BytesIO(bytes(out.payload))) as im:
        assert im.size == (4, 4)
