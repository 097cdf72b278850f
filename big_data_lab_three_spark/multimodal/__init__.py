"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The reference (Lammirea/big_data_lab_three) is tabular-only; this
package is the 100 TB-pipeline extension the task brief lists as
first-class: media rows = (id, media_type, payload binary, meta struct),
decode/feature-extract/resize/frame-sample as vectorized Pandas stages.

Decoding goes through a codec REGISTRY (:func:`decode.available_decoders`):
the deterministic ``raw-text`` fake is always present (oracle-checked),
and PNG/JPEG decoders register themselves when Pillow is importable —
this container ships without Pillow, so here the real-image paths are
exercised only by the skip-marked tests, and any non-registered codec
raises ``NotImplementedError`` loudly.  Every other stage (schema,
partitioning, batch shape, UDF signatures, frame arithmetic) is real
and tested either way.
"""

from big_data_lab_three_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    media_table_from_documents,
)
from big_data_lab_three_spark.multimodal.decode import (  # noqa: F401
    available_decoders,
    decode_media,
    extract_features,
    frame_sample,
    resize_images,
)
