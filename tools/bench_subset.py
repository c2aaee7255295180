"""Bench-identical timing for a SUBSET of keys (round-16 A/B helper).

Usage: python tools/bench_subset.py [sf_dir] key [key ...]

Same session configs, warmup, best-of-2 construct+execute split and
noop sink as bench.py; prints one JSON line. Check os.getloadavg()
in-band before believing any number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import realtimevotingdataengineer_spark.operators  # noqa: F401,E402
from realtimevotingdataengineer_spark.registry import QUERIES  # noqa: E402
from realtimevotingdataengineer_spark.sources.tables import Tables  # noqa: E402

SF_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1 and "/" in sys.argv[1]
    else "/root/testdata/sf0.1"
)
KEYS = [a for a in sys.argv[1:] if "/" not in a]


def main() -> None:
    load_start = [round(x, 2) for x in os.getloadavg()]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("bench_subset")
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
    t = Tables(spark, SF_DIR)
    QUERIES["agg_count_rows"](t).write.mode("overwrite").format("noop").save()
    timings, construct, execute = {}, {}, {}
    for name in KEYS:
        best, parts = float("inf"), (0.0, 0.0)
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = QUERIES[name](t)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            if t2 - t0 < best:
                best, parts = t2 - t0, (t1 - t0, t2 - t1)
        timings[name] = round(best, 3)
        construct[name] = round(parts[0], 3)
        execute[name] = round(parts[1], 3)
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "queries": timings,
                "construct": construct,
                "execute": execute,
                "load_avg_start": load_start,
                "load_avg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
