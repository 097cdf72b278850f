"""Arrow-batched media stages over ``mapInPandas``.

Each stage is a vectorized Pandas transform with an explicit output
``StructType`` — the shape a real decode pipeline has on a cluster:
binary payloads arrive per Arrow batch, numpy does the per-batch work,
and multi-row outputs (frame sampling) stream out without ever
materializing a whole partition.

Codec support is stubbed per the task brief: the only "codec" this
container can decode is ``raw-text`` (payload bytes are the content);
any other codec raises ``NotImplementedError`` loudly rather than
pretending.  Everything around the stub — schemas, batch iteration,
multi-row emission, partitioning — is real.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pandas only imported inside executors at runtime
    import pandas as pd

_FAKE_CODEC = "raw-text"


def _require_codec(codecs: "pd.Series") -> None:
    bad = set(codecs.unique()) - {_FAKE_CODEC}
    if bad:
        raise NotImplementedError(
            f"no decoder for codec(s) {sorted(bad)}: real image/audio "
            "codecs are not available in this container; only the "
            f"deterministic '{_FAKE_CODEC}' fake is supported"
        )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("mean_level", T.DoubleType(), False),
    ]
)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode payloads to sample statistics: (media_id, media_type,
    n_samples, mean byte level).  The fake decoder treats payload bytes
    as 8-bit samples; a real one would produce pixel/PCM arrays here
    with the identical batch structure."""

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import numpy as np
        import pandas as pd

        for b in batches:
            if len(b) == 0:
                continue
            _require_codec(b["codec"])
            raw = b["payload"]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "media_type": b["media_type"],
                    "n_samples": raw.map(len).astype("int32"),
                    "mean_level": raw.map(
                        lambda p: float(
                            np.frombuffer(p, dtype=np.uint8).mean()
                        )
                    ),
                }
            )

    flat = df.select(
        "media_id", "media_type", "payload", F.col("meta.codec").alias("codec")
    )
    return flat.mapInPandas(run, DECODED_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Per-media feature vector: `dim`-bucket byte histogram, L1
    normalized — the deterministic stand-in for an embedding model, with
    the batch shape (binary in, fixed-size float array out) of the real
    thing."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField(
                "features", T.ArrayType(T.DoubleType(), False), False
            ),
        ]
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import numpy as np
        import pandas as pd

        for b in batches:
            if len(b) == 0:
                continue
            _require_codec(b["codec"])
            feats = [
                (
                    np.bincount(
                        # int32 first: uint8 * dim would wrap at 256
                        np.frombuffer(p, dtype=np.uint8).astype(np.int32)
                        * dim
                        // 256,
                        minlength=dim,
                    ).astype("float64")
                    / max(len(p), 1)
                ).tolist()
                for p in b["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": b["media_id"], "features": feats}
            )

    flat = df.select(
        "media_id", "payload", F.col("meta.codec").alias("codec")
    )
    return flat.mapInPandas(run, schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image rows to ``width``×``height``: payload re-sampled to
    w·h bytes (tile/truncate — the fake for pixel interpolation), meta
    rewritten.  Non-image rows pass through untouched, so the stage is
    safe to run on a mixed-modality table."""
    schema = df.schema

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import numpy as np
        import pandas as pd

        target = width * height
        for b in batches:
            if len(b) == 0:
                continue
            img = b["media_type"] == "image"
            if img.any():
                _require_codec(pd.Series([m["codec"] for m in b.loc[img, "meta"]]))
            out = b.copy()
            out.loc[img, "payload"] = out.loc[img, "payload"].map(
                lambda p: bytes(
                    np.resize(np.frombuffer(p, dtype=np.uint8), target)
                )
            )
            out.loc[img, "meta"] = out.loc[img, "meta"].map(
                lambda m: {
                    **m,
                    "width": width,
                    "height": height,
                    "n_bytes": target,
                }
            )
            yield out

    return df.mapInPandas(run, schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame_bytes", T.IntegerType(), False),
    ]
)


def frame_sample(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Sample video frames every ``every_ms``: one output row per frame
    at t = 0, every_ms, … < duration_ms.  Demonstrates the 1→N row
    fan-out of a real frame extractor (which would attach pixel buffers
    where this emits per-frame byte offsets).  Non-video rows are
    filtered Spark-side so the scan prunes them before Python."""

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for b in batches:
            if len(b) == 0:
                continue
            _require_codec(b["codec"])
            rows = {
                "media_id": [],
                "frame_idx": [],
                "ts_ms": [],
                "frame_bytes": [],
            }
            for mid, dur, nb in zip(
                b["media_id"], b["duration_ms"], b["n_bytes"]
            ):
                n = int((int(dur) + every_ms - 1) // every_ms)
                per = int(nb) // max(n, 1)
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame_bytes"].append(per)
            yield pd.DataFrame(rows).astype(
                {
                    "media_id": "int64",
                    "frame_idx": "int32",
                    "ts_ms": "int32",
                    "frame_bytes": "int32",
                }
            )

    vids = df.where(F.col("media_type") == "video").select(
        "media_id",
        F.col("meta.codec").alias("codec"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    return vids.mapInPandas(run, FRAME_SCHEMA)
