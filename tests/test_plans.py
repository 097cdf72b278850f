"""Plan-quality guardrails: pin the physical-plan properties the 100 TB
design depends on.  A refactor that silently loses pushdown, pruning, a
broadcast, or codegen fails here — before it costs a cluster-day.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_lab_three_spark.plans import (
    broadcast_join_count,
    codegen_stage_count,
    pushed_filters,
    scan_columns,
    shuffle_count,
)
from big_data_lab_three_spark.queries import load_all
from big_data_lab_three_spark.sources import table

REG = load_all()


def test_scan_project_prunes_to_selected_columns(spark, sf_dir):
    df = REG["scan_project"].spark(spark, sf_dir)
    scans = scan_columns(df, "lineitem")
    assert scans, "no lineitem scan found in plan"
    for cols in scans:
        assert len(cols) <= 4, f"scan reads {cols}, pruning failed"


def test_filter_predicate_reaches_parquet(spark, sf_dir):
    df = REG["filter_predicate"].spark(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_quantity" in pushed or "l_extendedprice" in pushed, (
        f"no pushed filter on scan: {pushed!r}"
    )


def test_topk_join_broadcasts_small_side(spark, sf_dir):
    df = REG["topk_sort"].spark(spark, sf_dir)
    assert broadcast_join_count(df) >= 1, (
        "customer⋈orders top-k should broadcast the dimension side"
    )


def test_pricing_summary_is_one_shuffle(spark, sf_dir):
    # scan → partial agg → exchange → final agg (+AQE-planned sort
    # exchange for the orderBy at most)
    df = REG["pricing_summary"].spark(spark, sf_dir)
    n = shuffle_count(df)
    assert 1 <= n <= 2, f"pricing_summary should shuffle once (+sort), saw {n}"


def test_relational_core_stays_in_codegen(spark, sf_dir):
    for name in ("pricing_summary", "value_counts", "binarize_label"):
        df = REG[name].spark(spark, sf_dir)
        assert codegen_stage_count(df) >= 1, (
            f"{name}: no whole-stage codegen span in plan"
        )


def test_exact_dedup_shuffles_digests_not_text(spark, sf_dir):
    """The exact-dedup groupBy must key on the md5 digest, never carry
    the document text through the exchange."""
    from big_data_lab_three_spark.operators.dedup import exact_dedup

    df = exact_dedup(table(spark, sf_dir, "documents").select("doc_id", "text"))
    plan_sections = scan_columns(df, "documents")
    assert plan_sections  # documents scanned
    # text is needed to compute the digest pre-shuffle, but the shuffle
    # itself must partition on the digest: assert the exchange key.
    from big_data_lab_three_spark.plans.inspect import exchange_inputs

    carried = exchange_inputs(df)
    assert carried, "no shuffle in exact_dedup plan"
    assert all("text" not in cols for cols in carried), (
        f"dedup shuffle carries raw text: {carried}"
    )


def test_broadcast_hint_survives_in_similarity(spark, sf_dir):
    from big_data_lab_three_spark.operators.similarity import brute_force_topk

    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0)
    df = brute_force_topk(q, e, k=3)
    assert broadcast_join_count(df) >= 1
