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
