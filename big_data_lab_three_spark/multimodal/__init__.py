"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The reference (Lammirea/big_data_lab_three) is tabular-only; this
package is the 100 TB-pipeline extension the task brief lists as
first-class: media rows = (id, media_type, payload binary, meta struct),
decode/feature-extract/resize/frame-sample as vectorized Pandas stages.

The container has no image/audio codecs, so DECODING is stubbed exactly
as the brief instructs: :func:`decode.decode_media` raises
``NotImplementedError`` unless given the deterministic fake codec, and
every other stage (schema, partitioning, batch shape, UDF signatures,
frame arithmetic) is real and tested.
"""

from big_data_lab_three_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    media_table_from_documents,
)
from big_data_lab_three_spark.multimodal.decode import (  # noqa: F401
    decode_media,
    extract_features,
    frame_sample,
    resize_images,
)
