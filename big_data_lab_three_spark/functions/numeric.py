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
