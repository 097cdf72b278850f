"""Numeric column conventions shared by the oracle-paired queries."""

from __future__ import annotations

from pyspark.sql import functions as F


def quantized_sum(col, quantum: int):
    """The registry's multi-cell double-sum convention: quantize each
    NON-NEGATIVE double term to ``1/quantum`` (``floor(x·q + 0.5)`` —
    half-up == half-away for x ≥ 0) and INTEGER-sum, so the total is
    immune to partial-sum ordering on either engine.  The oracle twin
    is ``sum(CAST(floor(x * q + 0.5) AS BIGINT))``."""
    return F.sum(F.floor(col * F.lit(quantum) + F.lit(0.5)))


def micro_quantize(col):
    """The registry's micro-unit quantization: ``floor(x·1e6 + 0.5)``
    as BIGINT — ONE implementation behind every score/log-prob column
    (review finding r13: hand-copies in nb_lang_confusion,
    quality_classifier_census, and tools/mllib_parity.py could drift
    independently).  Oracle twin:
    ``CAST(floor(x * 1000000 + 0.5) AS BIGINT)``."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def md5_mod(salt: str, col, mod: int):
    """Engine-portable seeded hash bucket: the first 15 hex chars of
    ``md5(salt || CAST(col AS STRING))`` as a BIGINT, mod ``mod`` —
    the registry's fold/marker/cohort selector.  ONE implementation
    (review finding r13); oracle twin:
    ``CAST(('0x' || substr(md5(salt || CAST(col AS VARCHAR)), 1, 15))
    AS BIGINT) % mod``."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .__mod__(mod)
    )
