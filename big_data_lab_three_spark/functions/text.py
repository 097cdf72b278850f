"""Text expressions: tokenization, shingling, portable hashing.

Hashing note: fingerprints that must be reproducible across engines use
``md5`` (identical hex output in Spark, DuckDB, Python); throwaway
partition-local hashing (minhash permutations, simhash bits) uses
``xxhash64`` — Spark-native, fastest JVM path, engine-specific is fine
because those signatures never leave the Spark plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empty-token filtering (the BPE-ish
    regex variant is ``operators.text.token_count(bpe=True)``).

    ``array_remove`` rather than ``F.filter(..., x != '')``: identical
    semantics (drops every empty string; NULL in → NULL out), but
    array_remove is a codegen'd JVM expression while higher-order
    ``filter`` is CodegenFallback — measured 2× on a tokenize-everything
    pass."""
    return F.array_remove(F.split(text, r"\s+"), "")


def md5_hex(s: Column) -> Column:
    """Portable content hash — lowercase hex, identical in DuckDB."""
    return F.md5(F.encode(s, "UTF-8"))


def shingles(toks: Column, k: int = 3) -> Column:
    """k-gram shingles of a token array as space-joined strings; empty
    array when there are fewer than k tokens (callers decide the
    fallback).  Built from ``sequence`` + ``slice`` — no explode, so the
    per-document shingle set stays one row (cheap to minhash)."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
