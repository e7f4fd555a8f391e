"""Empirical scaling-slope harness (VERDICT r6 #5).

The registry-wide plan lint proves candidate-bounded SHAPE (no cartesian
products, no unbounded self-joins); this file proves the empirical slope:
each candidate-bounded dedup/ANN query is timed at sf0.01 and sf0.1 (10×
the documents/embeddings rows) and the wall-time ratio must stay far below
quadratic. A quadratic candidate blowup would show a ~100× ratio; the
bound below is 15× — 10× data with generous headroom for fixed per-query
overhead and this VM's CPU-steal noise (min-of-3 per point, measured on
the same session back to back so a degradation window hits both sides).

The bound is deliberately loose: this is a tripwire for algorithmic
regressions (someone swaps the banding join for all-pairs), not a perf
benchmark — BENCH_r*.json owns those numbers.
"""

from __future__ import annotations

import time

import pytest

from aws_localstack_stream_processing_spark.plans import all_queries

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"

# queries whose cost must track collisions/candidates, not |corpus|²
SLOPE_QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "emb_ivfpq_search",
    "sim_ann_ivf",
]

MAX_RATIO = 15.0


def _min_of(fn, n: int = 3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


@pytest.mark.parametrize("name", SLOPE_QUERIES)
def test_wall_time_slope_subquadratic(spark, name):
    q = all_queries()[name].fn
    # warm both plans once (codegen + layout cache) outside the timing
    q(spark, SF_SMALL).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    q(spark, SF_BIG).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    def run(sf):
        def go():
            q(spark, sf).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        return go

    small = _min_of(run(SF_SMALL))
    big = _min_of(run(SF_BIG))
    ratio = big / max(small, 1e-9)
    assert ratio <= MAX_RATIO, (
        f"{name}: sf0.01={small:.3f}s sf0.1={big:.3f}s ratio={ratio:.1f}x "
        f"(bound {MAX_RATIO}x for 10x data — candidate generation has "
        f"likely gone superlinear)"
    )
