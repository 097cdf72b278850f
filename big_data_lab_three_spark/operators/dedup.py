"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference's only dedup is full-row ``drop_duplicates`` (nb cells 5/7,
SURVEY.md U3).  This module adds the near-dup family a training-data
pipeline needs, each designed around its 100 TB shuffle profile:

- exact: hash-groupBy on a content digest — one shuffle of (digest, id),
  never of the documents themselves.
- MinHash+LSH: per-doc signature (projection, no shuffle) → band keys →
  self-join on band key (shuffle of small keys) → exact-Jaccard rescore
  of candidates only.  The candidate join is the only quadratic-risk
  step and LSH bounds it to colliding bands.
- SimHash: 64-bit signature, near-dup = small Hamming distance; bucket
  on bit-prefix to avoid the all-pairs join.
- embedding cosine: exact brute-force for small candidate sets; the LSH
  bucketed variant lives in ``operators.similarity``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_data_lab_three_spark.functions.text import shingles, tokens
from big_data_lab_three_spark.functions.vector import cosine_similarity


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup via content-digest groupBy: returns one row per
    distinct content with the smallest id kept and the duplicate count.

    Grouping on ``md5(text)`` instead of the raw text keeps shuffle rows
    at 16 bytes + id regardless of document size — the difference between
    shuffling 100 TB of text and ~2 TB of digests.
    """
    return (
        df.groupBy(F.md5(F.encode(F.col(text_col), "UTF-8")).alias("content_md5"))
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count(F.lit(1)).alias("copies"),
        )
    )


def minhash_signature(
    toks: Column, num_perms: int = 32, shingle_k: int = 3
) -> Column:
    """MinHash signature: for permutation i, min over shingles of
    ``xxhash64(shingle, seed=i)``.  One array column per doc — computed
    in a single projection, no explode, no shuffle."""
    sh = shingles(toks, shingle_k)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perms - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, i))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = 32,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard rescoring.

    Pipeline: signature (projection) → explode ``bands`` band-hash keys →
    self-join on (band, band_hash) → distinct candidate pairs → exact
    shingle-set Jaccard filter ≥ threshold.

    With r = num_perms/bands rows per band, a pair with Jaccard j
    collides in ≥1 band w.p. 1-(1-j^r)^bands — at the defaults (r=4,
    b=16) j=0.9 is caught w.p. >0.999999 and j=0.2 only ~2.5% (then
    discarded by the exact rescore), so the output equals the exact
    all-pairs answer for thresholds ≥ ~0.5 with near-certainty while the
    join only ever touches colliding buckets.
    """
    rows = num_perms // bands
    toks = tokens(F.col(text_col))
    sig = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(toks, shingle_k)).alias("sh"),
        minhash_signature(toks, num_perms, shingle_k).alias("sig"),
    ).where(F.size("sh") > 0)

    banded = sig.select(
        "id",
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",", F.slice("sig", b * rows + 1, rows)
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bk"),
    ).select("id", "sh", "bk.band", "bk.bucket")

    left = banded.alias("a")
    right = banded.alias("b")
    candidates = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        candidates.select(
            "id_a",
            "id_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (brute force).  Quadratic — the
    CORRECTNESS baseline for :func:`minhash_lsh_pairs`, only ever run on
    samples or within LSH candidate buckets at scale."""
    sets = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(tokens(F.col(text_col)), shingle_k)).alias(
            "sh"
        ),
    ).where(F.size("sh") > 0)
    a, b = sets.alias("a"), sets.alias("b")
    inter = F.size(F.array_intersect("a.sh", "b.sh"))
    union = F.size(F.array_union("a.sh", "b.sh"))
    return a.join(b, F.col("a.id") < F.col("b.id")).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        (inter.cast("double") / union).alias("jaccard"),
    )


def simhash64(toks: Column) -> Column:
    """64-bit SimHash of a token array: per bit, sum +1/-1 over token
    hashes, sign → bit.  Pure expression (no explode): for each bit
    position count tokens with that bit set; bit is 1 when count*2 > n.
    """
    n = F.size(toks)
    hashed = F.transform(toks, lambda t: F.xxhash64(t))
    sig = F.lit(0).cast("long")
    for bit in range(64):
        # Bit 63 of a signed long is the two's-complement sign bit.
        mask = (1 << bit) if bit < 63 else -(1 << 63)
        # NB: the lambda must take exactly one arg — PySpark passes the
        # element index to a second parameter, even a defaulted one.
        # F.filter builds the expression eagerly, so closing over the
        # loop's ``mask`` is safe.
        count_set = F.size(
            F.filter(hashed, lambda h: h.bitwiseAND(F.lit(mask)) != 0)
        )
        sig = sig + F.when(
            count_set * 2 > n, F.lit(mask).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sig


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (popcount of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs: bucket by the top ``prefix_bits`` of the
    signature, all-pairs within buckets, Hamming ≤ ``max_hamming``.

    Prefix bucketing is the standard single-table approximation (pairs
    differing inside the prefix are missed; production runs 4 rotated
    tables — the rotation count is a parameter, same plan).  Shuffle is
    on the 16-bit prefix, so bucket sizes stay tiny and the quadratic
    step is bounded.
    """
    sigs = df.select(
        F.col(id_col).alias("id"),
        # Shingle-level (not token-level) simhash: token sets collapse
        # when the corpus shares one vocabulary; shingles are
        # order-sensitive and spread unrelated docs to Hamming ≈ 32.
        simhash64(shingles(tokens(F.col(text_col)), 3)).alias("sig"),
    ).withColumn("prefix", F.shiftright("sig", 64 - prefix_bits))
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.prefix") == F.col("b.prefix"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sig"), F.col("b.sig")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force over the given
    frame — sample or LSH bucket at scale; see ``operators.similarity``
    for the bucketed variant)."""
    v = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    a, b = v.alias("a"), v.alias("b")
    cos = cosine_similarity(F.col("a.vec"), F.col("b.vec"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
