"""Profile WHERE the grown-index SRP gate spends its wall (round-13
follow-up to tools/stream_srp_zipf_probe_r13_grown.log: a 200k Zipf
batch against a 2M-row index ran 712s — 13× slower per vector than
the fresh-index probe — with ALL 128 base (band, bv) buckets over cap
and 1.6M index rows routed through sub-band widening).

Zero product changes: the gate runs as shipped; afterwards the Spark
REST API's completed-stage list is bucketed by dominant operation (the
stage's name/details carry the call site) and dumped sorted by task
time, so the next round's fix targets the measured hot phase instead
of a guess — candidates are (a) the per-batch index groupBy for probe
stats, (b) the index-side rot projection + widened join, (c) the exact
cosine verify, (d) the admit/append tail.

Usage: python tools/profile_srp_gate_grown.py [index_rows] [batch_rows] [head]
       (default 1000000 100000 2000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from realtimevotingdataengineer_spark.streaming import corpus  # noqa: E402

IDX_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BATCH_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
HEAD = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
CONTENT_STRIDE = 100_000_000
INDEX_BASE = 10_000_000_000


def rest(spark, path: str):
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4040/api/v1/applications/{app_id}{path}"
    with urllib.request.urlopen(url, timeout=20) as r:
        return json.load(r)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.ui.retainedJobs", "5000")
        .config(
            "spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "16g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (
            F.pmod(
                F.hash(F.concat_ws(":", i, F.col("content"))), F.lit(1000)
            ).cast("double")
            / 100.0
            - 5.0
        ),
    )
    work = tempfile.mkdtemp(prefix="srp_gate_prof_")
    idx = f"{work}/idx"
    base = (
        spark.range(IDX_ROWS)
        .select(
            (F.col("id") + INDEX_BASE).alias("vec_id"),
            (F.col("id") + INDEX_BASE).alias("content"),
            emb.alias("embedding"),
        )
        .drop("content")
    )
    t0 = time.perf_counter()
    corpus.build_srp_stream_index(base, idx)
    build_s = time.perf_counter() - t0

    head_rows = spark.range(HEAD).select(
        F.col("id").alias("content"),
        F.explode(
            F.sequence(
                F.lit(0), F.expr(f"CAST(ceil({HEAD} / (id + 1)) AS INT)")
            )
        ).alias("c"),
    )
    n_head = head_rows.count()
    tail = spark.range(BATCH_ROWS - n_head).select(
        (F.col("id") + HEAD).alias("content"), F.lit(0).alias("c")
    )
    batch = (
        head_rows.unionByName(tail)
        .select(
            (
                F.col("content")
                + F.col("c").cast("bigint") * F.lit(CONTENT_STRIDE).cast("bigint")
            ).alias("vec_id"),
            "content",
            emb.alias("embedding"),
        )
        .drop("content")
    )
    stage_floor = max((s["stageId"] for s in rest(spark, "/stages")), default=-1)
    t1 = time.perf_counter()
    corpus._srp_gate_batch(batch, idx, f"{work}/surv")
    gate_s = time.perf_counter() - t1

    stages = [
        s
        for s in rest(spark, "/stages?status=complete")
        if s["stageId"] > stage_floor
    ]
    rows = sorted(
        (
            {
                "stage": s["stageId"],
                "task_time_s": round(s.get("executorRunTime", 0) / 1000.0, 1),
                "tasks": s.get("numCompleteTasks"),
                "input_mb": round(s.get("inputBytes", 0) / 2**20, 1),
                "shuffle_read_mb": round(
                    s.get("shuffleReadBytes", 0) / 2**20, 1
                ),
                "name": (s.get("name") or "")[:90],
            }
            for s in stages
        ),
        key=lambda r: -r["task_time_s"],
    )
    total_task_s = sum(r["task_time_s"] for r in rows)
    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "srp_gate_grown_profile",
                "index_rows": IDX_ROWS,
                "batch_rows": BATCH_ROWS,
                "head": HEAD,
                "index_build_s": round(build_s, 1),
                "gate_wall_s": round(gate_s, 1),
                "stage_task_time_total_s": round(total_task_s, 1),
                "widen": dict(corpus.SRP_WIDEN_LAST),
                "load_avg": list(os.getloadavg()),
                "top_stages": rows[:20],
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
