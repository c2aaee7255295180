"""Mutation tests for the oracle comparator: the correctness gate must
actually fail on wrong results (guards against a vacuous comparison)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from check_oracle import compare  # noqa: E402


def test_comparator_detects_value_drift(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    ok = compare("t", df, "SELECT * FROM (VALUES (1, 10.0), (2, 20.0)) t(k, v)")
    assert ok == "OK"
    bad = compare("t", df, "SELECT * FROM (VALUES (1, 10.0), (2, 20.000001)) t(k, v)")
    assert bad.startswith("VALUE"), bad


def test_comparator_detects_row_count(spark):
    df = spark.createDataFrame([(1,)], "k int")
    bad = compare("t", df, "SELECT * FROM (VALUES (1), (2)) t(k)")
    assert bad.startswith("ROWS"), bad


def test_comparator_detects_schema(spark):
    df = spark.createDataFrame([(1,)], "k int")
    bad = compare("t", df, "SELECT 1 AS other")
    assert bad.startswith("SCHEMA"), bad


def test_comparator_order_insensitive(spark):
    df = spark.createDataFrame([(2, "b"), (1, "a")], "k int, s string")
    ok = compare("t", df, "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) t(k, s)")
    assert ok == "OK"
