"""Focused pins for the r16 operator-internal optimizations."""

from pyspark.sql import functions as F

from big_data_lab_three_spark.operators.dedup import minhash_lsh_pairs
from big_data_lab_three_spark.sources import table

SF = "/root/testdata/sf0.001"


def test_candidate_filter_equals_post_filter(spark):
    """Pushing the pair predicate below the rescore (r16) must emit
    exactly the rows the post-hoc filter kept — the dedup_incremental
    cross-side gate's equivalence contract."""
    d = table(spark, SF, "documents").select("doc_id", "text")
    seeded = d.unionByName(
        d.select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
    )
    pred = (F.col("id_a") < 5_000_000) & (F.col("id_b") >= 5_000_000)
    pushed = minhash_lsh_pairs(
        seeded, num_perms=16, bands=8, candidate_filter=pred
    )
    post = minhash_lsh_pairs(seeded, num_perms=16, bands=8).where(pred)
    a = {(r["id_a"], r["id_b"]) for r in pushed.collect()}
    b = {(r["id_a"], r["id_b"]) for r in post.collect()}
    assert a == b and len(a) > 0


def test_signatures_from_distinct_sets_unchanged(spark):
    """minhash signatures derived from distinct shingle sets (r16) must
    keep every seeded exact-duplicate pair at Jaccard 1.0 — `min` is
    idempotent, so dedup pairs are unchanged by the one-pass rewrite."""
    d = table(spark, SF, "documents").select("doc_id", "text")
    dup = d.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    pairs = minhash_lsh_pairs(
        d.unionByName(dup), num_perms=16, bands=8, jaccard_threshold=0.99
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    want = {
        (r["doc_id"], r["doc_id"] + 1_000_000) for r in d.collect()
    }
    assert want <= got
