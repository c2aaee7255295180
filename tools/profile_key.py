"""Per-key profiler for the optimization rounds: bench-identical session
(configs copied from bench.py, UI ENABLED for REST metrics), one key at a
time — construct/execute split like the bench, plus per-JOB wall times
and per-stage shuffle/spill/input so the time can be attributed to a
specific job (localCheckpoint, count, noop write) instead of guessed.

Usage: python tools/profile_key.py [sf_dir] key [key ...]
Env: SPARK_GRAFT_CPUS (default 32) — same dial as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

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


def rest(spark, path: str):
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4040/api/v1/applications/{app_id}{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("profile_key")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "131072")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "true")  # REST metrics (bench runs ui off)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = Tables(spark, SF_DIR)

    # same warmup as bench.py
    QUERIES["agg_count_rows"](t).write.mode("overwrite").format("noop").save()

    for name in KEYS:
        # warm rep first (bench takes best-of-2); profile the SECOND rep
        spark.catalog.clearCache()
        df = QUERIES[name](t)
        df.write.mode("overwrite").format("noop").save()
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001

        spark.catalog.clearCache()
        first_job = max((j["jobId"] for j in rest(spark, "/jobs")), default=-1) + 1
        first_stage = max(
            (s["stageId"] for s in rest(spark, "/stages")), default=-1
        ) + 1
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"{name}: construct")
        df = QUERIES[name](t)
        t1 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"{name}: execute")
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        spark.sparkContext.setJobDescription(None)

        print(f"\n=== {name} @ {SF_DIR}  construct={t1 - t0:.3f}s "
              f"execute={t2 - t1:.3f}s total={t2 - t0:.3f}s (warm rep)")
        jobs = [j for j in rest(spark, "/jobs") if j["jobId"] >= first_job]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"{'job':>4} {'sec':>7} {'stages':>6} {'tasks':>6}  description")
        for j in jobs:
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                dur = (
                    datetime.strptime(j["completionTime"], fmt)
                    - datetime.strptime(j["submissionTime"], fmt)
                ).total_seconds()
            except Exception:
                dur = float("nan")
            desc = (j.get("description") or j.get("name", ""))[:90]
            print(
                f"{j['jobId']:>4} {dur:>7.3f} {len(j.get('stageIds', [])):>6} "
                f"{j.get('numTasks', 0):>6}  {desc}"
            )
        stages = [
            s
            for s in rest(spark, "/stages?status=complete")
            if s["stageId"] >= first_stage
        ]
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"{'stage':>5} {'runtime_s':>9} {'tasks':>5} {'in_mb':>7} "
              f"{'sh_r_mb':>8} {'sh_w_mb':>8}  name")
        for s in stages[:12]:
            print(
                f"{s['stageId']:>5} {s.get('executorRunTime', 0) / 1e3:>9.2f} "
                f"{s.get('numTasks', 0):>5} {s.get('inputBytes', 0) / 2**20:>7.1f} "
                f"{s.get('shuffleReadBytes', 0) / 2**20:>8.2f} "
                f"{s.get('shuffleWriteBytes', 0) / 2**20:>8.2f}  "
                f"{s.get('name', '')[:60]}"
            )
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001


if __name__ == "__main__":
    main()
