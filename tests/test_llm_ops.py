"""Ground-truth assertions for the approximate/rows-only LLM-pipeline
ops (the oracle-matched ones are covered by test_queries_oracle).

Each dedup query seeds its own duplicates, so the expected pair set is
known exactly — stronger than the driver's rows-only check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_lab_three_spark.operators.similarity import brute_force_topk
from big_data_lab_three_spark.queries import load_all

REG = load_all()


def test_simhash_finds_all_seeded_duplicates(spark, sf_dir):
    rows = REG["dedup_simhash"].spark(spark, sf_dir).collect()
    seeded = {(i, i + 1000000) for i in range(0, 500, 5)}
    found = {(r.id_a, r.id_b) for r in rows}
    assert seeded <= found
    assert all(r.hamming == 0 for r in rows if (r.id_a, r.id_b) in seeded)


def test_minhash_lsh_finds_all_seeded_near_dups(spark, sf_dir):
    rows = REG["dedup_minhash_lsh"].spark(spark, sf_dir).collect()
    seeded = {(i, i + 1000000) for i in range(0, 500, 5)}
    found = {(r.id_a, r.id_b) for r in rows}
    assert seeded <= found
    assert all(r.jaccard >= 0.7 for r in rows)


def test_lsh_similarity_recall_against_brute_force(spark, sf_dir):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in REG["similarity_topk"].spark(spark, sf_dir).collect()
    }
    approx_rows = REG["similarity_lsh"].spark(spark, sf_dir).collect()
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    # 6 hyperplanes / 64 buckets over 500 vecs: candidates are scarce, so
    # demand sane behavior, not exact recall: some overlap with the exact
    # top-k and correct per-query ranking invariants.
    assert len(approx) > 0
    recall = len(exact & approx) / len(exact)
    assert recall > 0.1
    for r in approx_rows:
        assert 1 <= r.rank <= 5
        assert -1.0001 <= r.cos_sim <= 1.0001


def test_brute_force_topk_self_query_is_exact(spark, sf_dir):
    from big_data_lab_three_spark.sources import table

    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0)
    top = brute_force_topk(q, e, k=3).collect()
    assert len(top) == 3
    sims = [r.cos_sim for r in top]
    assert sims == sorted(sims, reverse=True)
    assert all(r.neighbor_id != 0 for r in top)


def test_embedding_near_dup_threshold_separates(spark, sf_dir):
    rows = REG["dedup_embedding"].spark(spark, sf_dir).collect()
    # exactly the 100 seeded rescaled copies, cosine ≈ 1
    assert len(rows) == 100
    assert all(r.cos_sim > 0.999 for r in rows)


def test_ivf_similarity_recall_against_brute_force(spark, sf_dir):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in REG["similarity_topk"].spark(spark, sf_dir).collect()
    }
    approx_rows = REG["similarity_ivf"].spark(spark, sf_dir).collect()
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    # probing 4/16 cells: every query must produce candidates and a
    # meaningful fraction of the exact top-k must survive.
    recall = len(exact & approx) / len(exact)
    assert recall > 0.3, f"IVF recall {recall:.2f} too low"
    per_query = {}
    for r in approx_rows:
        assert 1 <= r.rank <= 5
        assert -1.0001 <= r.cos_sim <= 1.0001
        per_query.setdefault(r.query_id, []).append(r.rank)
    for ranks in per_query.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
