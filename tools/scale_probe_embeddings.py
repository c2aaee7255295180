"""Embedding-dedup depth probe (round-11 verdict ask #1's measurement
leg): run `dedup_embedding_bucketed` / `dedup_embedding_clusters` on
synthetic embedding corpora at 1x/3x/10x the sf0.1 vector count and
record how CANDIDATE-PAIR volume and wall time grow, plus shuffle /
spill / peak-memory from the Spark REST API.

What it proves: with the round-12 corpus-derived codebook
(similarity.codebook_rung, k = smallest power of 2 >= ceil(sqrt(n))),
candidate volume is ~ p^2 * n^2 / k ~ n^1.5 — sub-quadratic — where the
retired fixed 8-centroid codebook was Theta(n^2/8). The probe records
the measured exponent so the claim is a number, not a plan shape.

Corpus design: REPLICATING real vectors would conflate the probe with
the pair-dump output contract (k verbatim copies emit k^2/2 output
pairs per group — the quadratic-OUTPUT effect NOTES.md says to read
via the linear-output clusters twin). Instead the probe generates
deterministic hash-derived uniform vectors (near-orthogonal in 64-dim,
so theta=0.4 survivors are rare): output stays tiny and the measured
growth isolates the PLAN — assign, bucket self-join, verify.
Results are not oracle-checked here (the sweep does that at the oracle
SFs); this tool measures execution behavior only.

Usage: python tools/scale_probe_embeddings.py [factor ...]  (default 1 3 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scale_probe_10x import rest, stage_metrics  # noqa: E402

FACTORS = [int(a) for a in sys.argv[1:]] or [1, 3, 10]
BASE_N = 2000  # sf0.1 embeddings row count
SRC = "/root/testdata/sf0.1"
EMB_DIM = 64
#: Round 14: key list overridable (SCALE_PROBE_KEYS, comma-separated)
#: so a key that dies at a probe sizing doesn't block the other's
#: measurement — the first r14 30x attempt lost the completed bucketed
#: numbers when the clusters key OOM'd before the factor's print.
KEYS = os.environ.get(
    "SCALE_PROBE_KEYS", "dedup_embedding_bucketed,dedup_embedding_clusters"
).split(",")


def build_corpus(spark, n: int, work: str) -> None:
    marker = f"{work}/embeddings.parquet/_SUCCESS"
    if not os.path.exists(marker):
        os.makedirs(work, exist_ok=True)
        # deterministic pseudo-random unit-scale coordinates: hash of
        # (vec_id, dim) -> [-1, 1). xxhash64 is seed-stable across runs.
        coord = (
            "transform(sequence(0, %d), j -> "
            "(pmod(xxhash64(concat(cast(id as string), '_', cast(j as string))), 2000)"
            " - 1000) / 1000.0)" % (EMB_DIM - 1)
        )
        (
            spark.range(0, n)
            .select(
                F.col("id").alias("vec_id"),
                F.expr(coord).cast("array<float>").alias("embedding"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{work}/embeddings.parquet")
        )
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        dst = f"{t}.parquet"
        if not os.path.lexists(f"{work}/{dst}"):
            os.symlink(f"{SRC}/{dst}", f"{work}/{dst}")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "true")
        # 16g covers 1x-10x; the 30x point (~112M candidate pairs at the
        # shared k=256 rung) needs more execution memory on a single
        # JVM — override via SPARK_GRAFT_DRIVER_MEM (a real cluster has
        # this memory as a matter of course; the probe box has 128 GiB)
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import realtimevotingdataengineer_spark.operators  # noqa: F401
    from realtimevotingdataengineer_spark.operators.similarity import (
        codebook_rung,
        ivf_assign_fixed,
        probe_rung,
    )
    from realtimevotingdataengineer_spark.registry import QUERIES
    from realtimevotingdataengineer_spark.sources.tables import Tables

    all_results = {}
    for f in FACTORS:
        n = BASE_N * f
        work = f"/tmp/scale_probe_emb_{f}x"
        build_corpus(spark, n, work)
        t = Tables(spark, work)
        k = codebook_rung(n)
        res = {"n": n, "k": k, "brute_pairs": n * (n - 1) // 2}
        # candidate volume: the bucket self-join the verify stage pays.
        # SCALE_PROBE_SKIP_CAND=1 skips it so an isolation run (round-15
        # verdict ask #1: clusters-only in a fresh JVM) measures ONLY
        # the key under test — the distinct-count here is itself a
        # heap-heavy job that would confound an OOM adjudication.
        if not os.environ.get("SCALE_PROBE_SKIP_CAND"):
            assign = ivf_assign_fixed(t.embeddings, probe_rung(n), k).localCheckpoint(
                eager=True
            )
            aa, ab = assign.alias("aa"), assign.alias("ab")
            cand = (
                aa.join(
                    ab,
                    (F.col("aa.cent_id") == F.col("ab.cent_id"))
                    & (F.col("aa.vec_id") < F.col("ab.vec_id")),
                )
                .select(F.col("aa.vec_id"), F.col("ab.vec_id"))
                .distinct()
                .count()
            )
            res["cand_pairs"] = cand
            res["cand_fraction"] = round(cand / (n * (n - 1) / 2), 4)
        for key in KEYS:
            next_stage = (
                max((s["stageId"] for s in rest(spark, "/stages")), default=-1) + 1
            )
            t0 = time.perf_counter()
            try:
                df = QUERIES[key](t)
                df.write.mode("overwrite").format("noop").save()
                m = stage_metrics(spark, next_stage)
                m.update(
                    execute_s=round(time.perf_counter() - t0, 1),
                    out_rows=df.count(),
                )
            except Exception as ex:  # record the death, keep the rest
                m = {
                    "error": repr(ex)[:300],
                    "execute_s": round(time.perf_counter() - t0, 1),
                }
            res[key] = m
            print(json.dumps({f"{f}x_{key}": m}), flush=True)
        all_results[f"{f}x"] = res
        print(json.dumps({f"{f}x": res}), flush=True)
    print(
        json.dumps(
            {
                "metric": "scale_probe_embeddings",
                "factors": FACTORS,
                "load_avg": list(os.getloadavg()),
                "results": all_results,
            }
        )
    )


if __name__ == "__main__":
    main()
