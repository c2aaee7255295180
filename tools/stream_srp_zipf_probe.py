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

Round 13 (--index-mult M, verdict ask #4 / round-12 backlog #2): the
same Zipf batch against a GROWN index — the production posture is a
head-heavy batch probing a MULTI-EPOCH index where the band join and
any widened buckets scale with INDEX size, not batch size. With M > 0
the probe first direct-builds the index from M × n_total unique
background vectors (build_srp_stream_index — one Arrow-kernel pass;
content ids offset past the batch's range so nothing collides), runs
one small warm-up batch through the gate so per-bucket widening state
exists, then measures the Zipf batch. Recorded extras: index rows,
index build time, and the same widen/RSS/wall fields.

Usage: python tools/stream_srp_zipf_probe.py [n_total] [head ...] [--index-mult M]
       (default: 500000 vectors, head runs at 2000 and 20000, M=0)
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

_args = [a for a in sys.argv[1:] if not a.startswith("--")]
INDEX_MULT = 0
if "--index-mult" in sys.argv:
    INDEX_MULT = int(sys.argv[sys.argv.index("--index-mult") + 1])
    _args = [a for a in _args if a != str(INDEX_MULT)]
N_TOTAL = int(_args[0]) if _args else 500_000
HEADS = [int(a) for a in _args[1:]] or [2000, 20000]
EMB_DIM = 64
CONTENT_STRIDE = 100_000_000
#: grown-index background contents start far past any batch content id
INDEX_BASE = 10_000_000_000


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
        idx_rows, idx_build_s, warmup_s = 0, 0.0, 0.0
        if INDEX_MULT > 0:
            # multi-epoch posture: the index holds INDEX_MULT batches'
            # worth of unique background vectors BEFORE this batch
            base = spark.range(INDEX_MULT * N_TOTAL).select(
                (F.col("id") + INDEX_BASE).alias("vec_id"),
                (F.col("id") + INDEX_BASE).alias("content"),
                emb.alias("embedding"),
            ).drop("content")
            tb = time.perf_counter()
            corpus.build_srp_stream_index(base, idx)
            idx_build_s = time.perf_counter() - tb
            idx_rows = INDEX_MULT * N_TOTAL
            # one small warm-up batch so per-bucket widening state is
            # real before the measured run
            warm = spark.range(1000).select(
                (F.col("id") + INDEX_BASE - 10_000).alias("vec_id"),
                (F.col("id") + INDEX_BASE - 10_000).alias("content"),
                emb.alias("embedding"),
            ).drop("content")
            tw = time.perf_counter()
            corpus._srp_gate_batch(warm, idx, f"{work}/warm_surv")
            warmup_s = time.perf_counter() - tw
        else:
            corpus.build_srp_stream_index(
                spark.createDataFrame(
                    [], "vec_id bigint, embedding array<double>"
                ),
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
                "index_rows": idx_rows,
                "index_build_s": round(idx_build_s, 1),
                "warmup_gate_s": round(warmup_s, 1),
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
