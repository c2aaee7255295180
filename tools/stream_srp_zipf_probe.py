"""Zipf-batch probe of the SRP streaming gate (round-12 backlog (b)):
one micro-batch whose duplicate structure is rank-decaying — a handful
of contents carry hundreds-to-thousands of identical copies while the
tail is unique — driven through `_srp_gate_batch` with the shipped
defaults.

Why this case matters: the round-12 clique-cap auto-dial keys off the
batch's MEAN dup factor (rows / distinct signatures). A head-heavy
Zipf batch keeps the mean LOW (the unique tail dominates), so the dial
must NOT fire — the hot clique instead has to be carried by the next
layer of the defense, the per-bucket cap's chain-augmented star
fallback (identical vectors are exact under stars). The probe records
which layers engaged (SRP_WIDEN_LAST incl. the autodial marker), wall
time, survivor count vs distinct contents, and driver RSS — the
uniform-dup sweeps (tools/stream_srp_admit_sweep.py) cannot produce
this shape.

Batch construction is executor-side (content ids exploded to copies,
hash-derived 64-dim vectors per content); the driver never holds the
batch.

Usage: python tools/stream_srp_zipf_probe.py [n_total] [head ...]
       (default: 500000 vectors, head runs at 2000 and 20000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from realtimevotingdataengineer_spark.streaming import corpus  # noqa: E402

N_TOTAL = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
HEADS = [int(a) for a in sys.argv[2:]] or [2000, 20000]
EMB_DIM = 64
CONTENT_STRIDE = 100_000_000


def vm_rss_mb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "8g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
        lambda i: (
            F.pmod(
                F.hash(F.concat_ws(":", i, F.col("content"))),
                F.lit(1000),
            ).cast("double")
            / 100.0
            - 5.0
        ),
    )
    results = []
    for head in HEADS:
        # head content r (rank r+1) gets ceil(head/(r+1)) EXTRA copies;
        # tail contents are unique, padding the batch to N_TOTAL
        head_rows = (
            spark.range(head)
            .select(
                F.col("id").alias("content"),
                F.explode(
                    F.sequence(
                        F.lit(0),
                        F.expr(f"CAST(ceil({head} / (id + 1)) AS INT)"),
                    )
                ).alias("c"),
            )
        )
        n_head = head_rows.count()
        tail = spark.range(N_TOTAL - n_head).select(
            (F.col("id") + head).alias("content"), F.lit(0).alias("c")
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
        n_distinct = N_TOTAL - n_head + head
        work = tempfile.mkdtemp(prefix="srp_zipf_")
        idx, surv = f"{work}/idx", f"{work}/surv"
        corpus.build_srp_stream_index(
            spark.createDataFrame([], "vec_id bigint, embedding array<double>"),
            idx,
        )
        corpus.SRP_WIDEN_LAST.clear()
        rss0 = vm_rss_mb()
        t0 = time.perf_counter()
        corpus._srp_gate_batch(batch, idx, surv)
        dt = time.perf_counter() - t0
        rss1 = vm_rss_mb()
        n_surv = spark.read.parquet(surv).count()
        shutil.rmtree(work, ignore_errors=True)
        results.append(
            {
                "n_total": N_TOTAL,
                "head": head,
                "max_group": head + 1,
                "distinct_contents": n_distinct,
                "mean_dup": round(N_TOTAL / n_distinct, 3),
                "autodial_fired": "autodial" in corpus.SRP_WIDEN_LAST,
                "widen": dict(corpus.SRP_WIDEN_LAST),
                "secs": round(dt, 1),
                "survivors": n_surv,
                "driver_rss_mb_before": round(rss0, 1),
                "driver_rss_mb_after": round(rss1, 1),
            }
        )
        print(json.dumps(results[-1]), flush=True)
    print(
        json.dumps(
            {
                "metric": "srp_zipf_gate_probe",
                "load_avg": list(os.getloadavg()),
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
