"""Sustained streaming EMBEDDING near-dup gate throughput: rate source →
synthetic 64-dim vectors (value % VEC_SPACE re-crawls the same vector,
cosine 1.0 ≥ θ once warm) → the online SRP gate of streaming/corpus.py
(foreachBatch vs a persisted band index) → parquet survivors.

The vector twin of tools/stream_minhash_throughput.py — measures docs/s
through the FULL gate: Arrow signature kernel, band probe against the
growing index, exact pinned-cosine verify, greedy admit, survivor +
band + vector append. Index band rows must land at SRP_BANDS × admitted
survivors.

This fixture is the gate's documented WORST case: uniform synthetic
vectors saturate every 4-bit band bucket (16 buckets/band), so before
round 10's sub-banding the within-batch self-join was quadratic in
micro-batch size (measured 112-158 vecs/s). With the caps the verify
volume is bounded per bucket and throughput amortizes with batch size
again; pass tightened caps (e.g. 16 256) to measure the degenerate-mode
dial documented in stream_dedup_srp.

Usage: python tools/stream_srp_throughput.py [vecs_per_sec] [seconds]
       [trigger] [clique_cap] [probe_cap]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from realtimevotingdataengineer_spark.operators.dedup import SRP_BANDS  # noqa: E402
from realtimevotingdataengineer_spark.streaming import corpus  # noqa: E402

RATE = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
SECONDS = int(sys.argv[2]) if len(sys.argv) > 2 else 60
TRIGGER = sys.argv[3] if len(sys.argv) > 3 else "5 seconds"
CLIQUE_CAP = int(sys.argv[4]) if len(sys.argv) > 4 else corpus.SRP_CLIQUE_CAP
PROBE_CAP = int(sys.argv[5]) if len(sys.argv) > 5 else corpus.SRP_PROBE_CAP
VEC_SPACE = 20_000
EMB_DIM = 64


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        # see stream_minhash_throughput.py: stop() mid-batch needs the
        # big stack for Spark's interrupt-classifier regex
        .config("spark.driver.extraJavaOptions", "-Xss64m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="srp_gate_")
    idx, surv, ckpt = f"{work}/idx", f"{work}/surv", f"{work}/ckpt"
    corpus.build_srp_stream_index(
        spark.createDataFrame([], "vec_id bigint, embedding array<double>"), idx
    )
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(RATE))
        .option("numPartitions", "8")
        .load()
    )
    # deterministic synthetic 64-dim vector per content id (one
    # transform lambda — O(1) plan text in EMB_DIM)
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
        lambda i: (
            F.pmod(F.hash(F.concat_ws(":", i, (F.col("value") % VEC_SPACE))), F.lit(1000))
            .cast("double")
            / 100.0
            - 5.0
        ),
    )
    vecs = rate.select(F.col("value").alias("vec_id"), emb.alias("embedding"))
    q = corpus.stream_dedup_srp(
        vecs,
        idx,
        surv,
        ckpt,
        processing_time=TRIGGER,
        clique_cap=CLIQUE_CAP,
        probe_cap=PROBE_CAP,
    )
    deadline = time.time() + SECONDS
    while time.time() < deadline:
        time.sleep(1)
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    steady = [
        p for p in progress if p.get("numInputRows", 0) > 0 and p.get("batchId", 0) > 0
    ]
    rows = sum(p["numInputRows"] for p in steady)
    secs = sum(p["durationMs"]["triggerExecution"] for p in steady) / 1000.0
    n_surv = spark.read.parquet(surv).count()
    n_bands = spark.read.parquet(f"{idx}/bands").count()
    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "stream_srp_vecs_per_sec",
                "value": round(rows / secs, 1) if secs > 0 else 0.0,
                "unit": "vecs/sec",
                "target_rate": RATE,
                "batches": len(steady),
                "seconds": SECONDS,
                "trigger": TRIGGER,
                "clique_cap": CLIQUE_CAP,
                "probe_cap": PROBE_CAP,
                "vecs_processed": rows,
                "survivors": n_surv,
                "index_band_rows": n_bands,
                "bands_per_survivor": SRP_BANDS,
                # round 11: last-batch widen observability — nonzero
                # buckets means the run was in the documented sub-banding
                # approximation regime (see corpus.SRP_CLIQUE_CAP)
                "widen_last_batch": dict(corpus.SRP_WIDEN_LAST),
            }
        )
    )


if __name__ == "__main__":
    main()
