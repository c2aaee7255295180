"""Dump the formatted physical plan of any queries() key.

Usage: python tools/explain_plan.py [sf_dir] key [key ...]

The evidence loop for the 100 TB posture: check PushedFilters /
ReadSchema on scans, BroadcastHashJoin vs SortMergeJoin, Exchange
count, WholeStageCodegen spans. tests/test_plans.py pins the properties
that must not regress; this tool is for eyeballing the rest.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import realtimevotingdataengineer_spark.operators  # noqa: F401,E402
from realtimevotingdataengineer_spark.registry import QUERIES  # noqa: E402
from realtimevotingdataengineer_spark.sources.tables import Tables  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
KEYS = [a for a in sys.argv[1:] if "/" not in a]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = Tables(spark, SF_DIR)
    for key in KEYS:
        print(f"\n{'=' * 70}\n{key}\n{'=' * 70}")
        QUERIES[key](t).explain("formatted")


if __name__ == "__main__":
    main()
