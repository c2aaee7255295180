"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query (votes-per-candidate tally, the
reference's core query per SURVEY.md §2.4) on /root/testdata/sf0.001.

`queries()` / `oracle_sql()` — every operator key registered in
realtimevotingdataengineer_spark.registry (SURVEY.md §2 parity surface +
the training-data-pipeline extensions), each with its DuckDB oracle twin
unless the op is not SQL-expressible (mapInPandas stages).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

import realtimevotingdataengineer_spark.operators  # noqa: F401  (registers all keys)
from realtimevotingdataengineer_spark.operators.relational import agg_votes_per_candidate
from realtimevotingdataengineer_spark.registry import ORACLES, QUERIES
from realtimevotingdataengineer_spark.sources.tables import Tables


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return agg_votes_per_candidate(Tables(spark, "/root/testdata/sf0.001"))


def _bind(fn):
    return lambda spark, sf_dir: fn(Tables(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {key: _bind(fn) for key, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each queries() key (where
    SQL-expressible; mapInPandas ops are rows-only checked).

    Rows-only keys with a hash-oracled twin: the two float-BLAS kernels
    deliberately have no SQL oracle (numpy vs DuckDB last-ulp float
    drift), but their RESULT SETS are value-checked every round through
    paired keys — ``sim_bruteforce_topk_arrow`` ↔ ``sim_topk_arrow_pairs``
    and ``sim_knn_graph_arrow`` ↔ ``sim_knn_graph_arrow_pairs`` (the
    pairs keys project the identical neighbor/edge sets and ARE
    DuckDB-hash-oracled). The mapping is machine-readable at
    ``realtimevotingdataengineer_spark.registry.PAIRED_ORACLE`` and
    printed by ``tools/registry_diff.py``."""
    return dict(ORACLES)
