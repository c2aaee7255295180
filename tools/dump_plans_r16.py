"""Dump formatted physical plans to plans/r16/<key>_<suffix>.txt.

Usage: python tools/dump_plans_r16.py <before|after> key [key ...]

Bench-identical session configs (local[$SPARK_GRAFT_CPUS], AQE on,
4m split size) at sf0.1 so the dumped plan is the one the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import realtimevotingdataengineer_spark.operators  # noqa: F401,E402
from realtimevotingdataengineer_spark.plans import formatted_plan  # noqa: E402
from realtimevotingdataengineer_spark.registry import QUERIES  # noqa: E402
from realtimevotingdataengineer_spark.sources.tables import Tables  # noqa: E402

SUFFIX = sys.argv[1]
KEYS = sys.argv[2:]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = "/root/repo/plans/r16"


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("dump_plans_r16")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "131072")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    t = Tables(spark, SF_DIR)
    for key in KEYS:
        plan = formatted_plan(QUERIES[key](t))
        path = os.path.join(OUT_DIR, f"{key}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
