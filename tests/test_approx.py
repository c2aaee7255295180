"""Approximate aggregates: the scale path for exact-optional analytics.

No DuckDB oracle (sketch internals differ across engines by design);
correctness is bounded-error vs the exact answer, which is the actual
contract of these operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtimevotingdataengineer_spark.sources.tables import Tables


@pytest.fixture(scope="module")
def t(spark, sf_dir):
    return Tables(spark, sf_dir)


def test_approx_count_distinct_within_rsd(t):
    exact = t.events.select("user_id").distinct().count()
    approx = t.events.agg(
        F.approx_count_distinct("user_id", rsd=0.05).alias("a")
    ).collect()[0].a
    assert abs(approx - exact) / exact < 0.15


def test_approx_percentile_brackets_exact_median(t):
    approx = t.orders.agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("m")
    ).collect()[0].m
    lo, hi = t.orders.approxQuantile("o_totalprice", [0.4, 0.6], 0.01)
    assert lo <= approx <= hi


def test_random_projection_preserves_distances(t):
    """JL property: for the md5-seeded ±1 projection, E[proj_dist²] =
    RP_DIM · orig_dist² — so the per-pair ratio proj²/(RP_DIM·orig²)
    concentrates around 1. Assert the MEDIAN ratio over sampled pairs
    lands well inside [0.3, 3] (8 dims is coarse; the median is stable)."""
    import statistics

    from realtimevotingdataengineer_spark.operators.similarity import (
        RP_DIM,
        emb_random_projection,
    )

    orig = {
        r["vec_id"]: r["embedding"]
        for r in t.embeddings.filter(F.col("vec_id") < 30).collect()
    }
    proj = {
        r["vec_id"]: [r[f"p{j}"] for j in range(RP_DIM)]
        for r in emb_random_projection(t).filter(F.col("vec_id") < 30).collect()
    }
    ids = sorted(orig)
    ratios = []
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            d2 = sum((x - y) ** 2 for x, y in zip(orig[a], orig[b]))
            p2 = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
            if d2 > 0:
                ratios.append(p2 / (RP_DIM * d2))
    assert ratios
    assert 0.3 < statistics.median(ratios) < 3.0
