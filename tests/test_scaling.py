"""Scaling gate: the EXPERIMENTS.md sub-linearity evidence, automated.

Re-times a handful of data-bound and quadratic-risk queries at two
scale factors 100× apart and asserts the wall-time ratio stays far
below linear-in-SF.  The point is not a throughput number — local
timings are noisy — but a tripwire for the failure class that matters
at 100 TB: an operator whose intermediate (candidate pair table,
window partition, aggregation buffer) silently starts growing
superlinearly with input.  A quadratic candidate-set bug turns the
100× ratio into 10³–10⁴; the 30× ceiling leaves ample noise headroom
while still catching it.
"""

from __future__ import annotations

import time

import pytest

from big_data_lab_three_spark.queries import load_all

SMALL = "/root/testdata/sf0.001"
BIG = "/root/testdata/sf0.1"
# 100× the rows between SMALL and BIG.  Queries chosen per
# EXPERIMENTS.md: the most data-bound scan/agg shapes (a slope change
# is visible over their small fixed cost) plus the two quadratic-risk
# dedup pipelines (pair tables must stay bucket-bounded).
QUERIES = (
    "pricing_summary",
    "quantile_profile",
    "strip_conform",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # r4-late: three sketch builds + estimates over lineitem — the
    # counter-key-space exchange bound is the scaling claim to hold
    "cms_heavy_hitters",
    # r7: the heavier census witnesses — span explode + digest rollup,
    # planted-pair shingle join, and the ×(8·16) PQ encode expansion
    # must all stay linear in the corpus
    "repeated_span_census",
    "jaccard_pair_census",
    "pq_code_census",
    # r7: iterative CC on planted chains — rounds grow with log(chain
    # length), so the 100× data ratio must stay scheduler-bounded, not
    # edge-table-bounded
    "cc_chain_census",
    # r7-late: the basket-keyed pair generation must stay bounded by
    # basket size (the quadratic trap is pairing on the ITEM side),
    # and per-user LTTB selection must stay bounded per user while
    # users grow with the corpus
    "copurchase_topk",
    "lttb_downsample",
    # r7 session 3: the two heaviest new shapes — zorder's double
    # exact-rank pass over the fact must stay range-partition-bounded,
    # and the RFM triple-ntile must stay customer-frame-bounded
    "zorder_layout",
    "rfm_segments",
)
MAX_RATIO = 30.0


@pytest.mark.parametrize("name", QUERIES)
def test_runtime_stays_sublinear_in_sf(spark, name):
    q = load_all()[name]

    def timed(sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):  # min-of-2: shared-box noise suppression
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return best

    timed(SMALL)  # warm-up: codegen compile, Python worker spin-up
    t_small = timed(SMALL)
    t_big = timed(BIG)
    # floor the denominator: a sub-50ms small-sf timing is all jitter,
    # and dividing by it manufactures fake ratios
    ratio = t_big / max(t_small, 0.05)
    assert ratio < MAX_RATIO, (
        f"{name}: {t_small:.3f}s @ sf0.001 -> {t_big:.3f}s @ sf0.1 "
        f"(x{ratio:.0f} for 100x data) — superlinear growth, check for "
        "an unbounded candidate set / window partition / agg buffer"
    )


SF1 = "/root/repo/.scratch/sf1"


@pytest.mark.parametrize(
    "name",
    (
        "pricing_summary",
        "quantile_profile",
        "dedup_minhash_lsh",
        # r7: the two heaviest linear census witnesses ride the decade
        # gate too (the iterative CC censuses are excluded here — their
        # round count grows with log(chain length), so a fixed wall-time
        # ratio ceiling would flake; their sf1 evidence is the oracle
        # value gate instead)
        "repeated_span_census",
        "pq_code_census",
    ),
)
def test_runtime_stays_sublinear_one_more_decade(spark, name):
    """sf0.1 → sf1 (10× more data, ~6M lineitem rows): one extra decade
    on the most data-bound and quadratic-risk shapes.  The sf1 tier is
    locally generated (``tools/make_sf1.py`` — replicated sf0.1 with
    disjoint key offsets; magnitude-faithful, see its docstring), so
    this gate SKIPS cleanly when it hasn't been built rather than
    failing fresh checkouts."""
    import os

    if not os.path.exists(os.path.join(SF1, "lineitem.parquet")):
        pytest.skip("sf1 tier not generated (python tools/make_sf1.py)")
    q = load_all()[name]

    def timed(sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return best

    timed(BIG)  # warm-up
    # 10× data must cost well under 10×; 6 leaves noise headroom while
    # still catching quadratic candidate growth (which would be ~100×).
    # One full re-measure on failure: inside the 32-thread full suite
    # this box has produced one-off 6×+ readings from scheduler
    # contention alone (EXPERIMENTS.md r4 note); a real quadratic
    # blow-up reproduces, noise doesn't.
    for attempt in (1, 2):
        t_mid = timed(BIG)
        t_big = timed(SF1)
        ratio = t_big / max(t_mid, 0.05)
        if ratio < 6.0:
            break
    assert ratio < 6.0, (
        f"{name}: {t_mid:.3f}s @ sf0.1 -> {t_big:.3f}s @ sf1 "
        f"(x{ratio:.1f} for 10x data, twice) — superlinear growth"
    )


# ---------------------------------------------------------------------
# Centroid-count scale pins (r11 verdict item 5): the "more centroids
# bound the per-cell work" claim is a FORMULA + a FAIL-LOUD guard, not
# a docstring assertion.
# ---------------------------------------------------------------------


def test_cell_count_bounds_expected_cell_size():
    """For any corpus size, the adaptive centroid formulas keep the
    EXPECTED cell at/below the target until the hard cap, and stay
    AT the cap beyond it (ADVICE r12: an uncapped count makes the
    centroid broadcast and the n×k assignment grow with the corpus) —
    the property pair that keeps assignment linear with a bounded
    broadcast at every scale."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from big_data_lab_three_spark.operators.similarity import (
        _MAX_CELLS,
        adaptive_nlist,
    )
    from big_data_lab_three_spark.queries.corpus import (
        _CELL_MAX,
        _CELL_TARGET,
        _n_cells,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=1, max_value=10**13))
    def check(n):
        for cells, floor, target, cap in (
            (_n_cells(n), 8, _CELL_TARGET, _CELL_MAX),
            (adaptive_nlist(n), 16, 256, _MAX_CELLS),
        ):
            assert floor <= cells <= cap
            if n > cap * target:  # capped regime: count pinned at cap
                assert cells == cap
            elif n > floor * target:  # scaling regime: cell <= target
                assert math.ceil(n / cells) <= target
            else:  # floor regime: cell size still <= floor*target/floor
                assert n / cells <= target * floor

    check()
    # the driver tiers keep the historical k=8 (outputs unchanged);
    # the sf1 tier (20k embeddings) genuinely grows
    from big_data_lab_three_spark.queries.corpus import _n_cells as nc

    assert nc(500) == 8 and nc(2000) == 8 and nc(20000) == 79


def test_semdedup_cell_cap_fails_loud():
    """The grouped-map prune must ABORT on a cell past _CELL_CAP (the
    quadratic-blowup tripwire), not spill into an unbounded GEMM."""
    from big_data_lab_three_spark.queries.corpus import (
        _CELL_CAP,
        _check_cell_bound,
    )

    _check_cell_bound(0, _CELL_CAP)  # at the cap: fine
    with pytest.raises(ValueError, match="centroid count must scale"):
        _check_cell_bound(3, _CELL_CAP + 1)


def test_semdedup_cells_stay_bounded_at_big_tier(spark):
    """Integration pin at the biggest always-available tier: every
    SemDeDup cell holds <= _CELL_CAP vectors under the adaptive
    centroid count (the sf1 decade gate re-proves this at 10×)."""
    from big_data_lab_three_spark.queries.corpus import _CELL_CAP

    reg = load_all()
    rows = reg["semdedup_cell_census"].spark(spark, BIG).collect()
    assert rows and max(r["n_vecs"] for r in rows) <= _CELL_CAP
