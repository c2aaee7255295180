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
