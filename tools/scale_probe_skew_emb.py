"""Zipf-skewed EMBEDDING depth probe (round-12: the hot-centroid leg of
the skew evidence — tools/scale_probe_skew.py covers the minhash/pack
paths, this covers the IVF-bucketed embedding-dedup paths).

Corpus: the 2,000 real sf0.1 vectors, padded with hash-derived uniform
vectors to BASE_N (so the corpus-derived codebook rung is realistic),
plus rank-decaying VERBATIM copies of the top-ranked real vectors
(copies(rank) = ceil(HEAD/rank)) — the top vector alone carries HEAD
identical copies. Identical vectors share all DEDUP_N_PROBE centroid
assignments, so the hot group lands intact in a handful of IVF buckets:
the bucket-local pair join sees a single bucket whose pair volume is
C(HEAD,2)-shaped while the long tail stays near-empty — exactly the
skew uniform replication (scale_probe_embeddings.py) cannot produce.

What to read: `task_skew` of the heaviest stage for each key. The pair
VOLUME from the hot bucket is quadratic-OUTPUT by contract (every
identical pair is a real duplicate pair — read `dedup_embedding_
clusters`, the linear-output twin, next to the pair dump as always);
the engine question is whether the hot bucket serializes onto one task
(max/median >> 1 in the verify stage) or whether the row-count
repartition before the cosine stage (PAIRS_PER_PARTITION) spreads it.

A second mode (round-12 backlog (a)) makes the hot group NEAR-dup
instead of identical: each copy is base + eps*u with a hash-derived
direction and a copy-indexed eps spread so pairwise cosines straddle
the theta=0.4 verify boundary. Near-dup copies no longer share all
centroid assignments (the hot group SPLITS across buckets) and every
surviving pair pays the exact-cosine verify at the boundary — the
failure shape identical replication cannot produce.

Usage: python tools/scale_probe_skew_emb.py [head_copies] [identical|neardup]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scale_probe_10x import rest, stage_metrics  # noqa: E402
from scale_probe_skew import heaviest_stage_skew  # noqa: E402

HEAD = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
MODE = sys.argv[2] if len(sys.argv) > 2 else "identical"
assert MODE in ("identical", "neardup"), MODE
SRC = "/root/testdata/sf0.1"
WORK = f"/tmp/scale_probe_skew_emb_{HEAD}_{MODE}"
BASE_N = 20_000  # real 2k + synthetic tail, before head copies
EMB_DIM = 64
COPY_STRIDE = 1_000_000  # copy ids: vec_id + c * COPY_STRIDE
KEYS = ["dedup_embedding_bucketed", "dedup_embedding_clusters"]


def build_corpus(spark) -> dict:
    marker = f"{WORK}/embeddings.parquet/_SUCCESS"
    if not os.path.exists(marker):
        shutil.rmtree(WORK, ignore_errors=True)
        os.makedirs(WORK, exist_ok=True)
        real = spark.read.parquet(f"{SRC}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n_real = real.count()
        # synthetic near-orthogonal tail (same generator as
        # scale_probe_embeddings.py): pads the corpus so codebook_rung
        # lands at a realistic k without adding near-dup pairs
        coord = (
            "transform(sequence(0, %d), j -> "
            "(pmod(xxhash64(concat(cast(id as string), '_', cast(j as string))), 2000)"
            " - 1000) / 1000.0)" % (EMB_DIM - 1)
        )
        tail = spark.range(n_real, BASE_N).select(
            F.col("id").alias("vec_id"),
            F.expr(coord).cast("array<float>").alias("embedding"),
        )
        # rank-decaying verbatim copies of the top-ranked real vectors:
        # rank r (= vec_id + 1) gets ceil(HEAD / r) identical copies
        copies = F.expr(
            f"CASE WHEN vec_id < {HEAD} THEN "
            f"CAST(ceil({HEAD} / (vec_id + 1)) AS INT) ELSE 0 END"
        )
        exploded = (
            real.withColumn("n_copies", copies)
            .filter(F.col("n_copies") > 0)
            .withColumn("c", F.explode(F.sequence(F.lit(1), F.col("n_copies"))))
        )
        if MODE == "neardup":
            # copy c of vector v: v + eps_c * u_c, u hash-derived per
            # (vec_id, copy, dim), eps spread over [0.2, 1.1] by copy
            # index — pairwise copy-copy and copy-base cosines then
            # straddle the theta=0.4 verify boundary instead of all
            # sitting at 1.0
            pert = (
                "transform(embedding, (x, j) -> CAST(x + "
                "(0.2 + 0.9 * (CAST(c AS DOUBLE) / n_copies)) * "
                "((pmod(xxhash64(concat(cast(vec_id as string), '_', "
                "cast(c as string), '_', cast(j as string))), 2000) - 1000)"
                " / 1000.0) AS FLOAT))"
            )
            emb_col = F.expr(pert)
        else:
            emb_col = F.col("embedding")
        extra = exploded.select(
            (F.col("vec_id") + F.col("c") * COPY_STRIDE).alias("vec_id"),
            emb_col.alias("embedding"),
        )
        real.unionByName(tail).unionByName(extra).repartition(
            32
        ).write.mode("overwrite").parquet(f"{WORK}/embeddings.parquet")
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        dst = f"{WORK}/{t}.parquet"
        if not os.path.lexists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    emb = spark.read.parquet(f"{WORK}/embeddings.parquet")
    top = (
        emb.groupBy(F.col("vec_id") % COPY_STRIDE)
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    return {"n": emb.count(), "max_group": top}


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "true")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    shape = build_corpus(spark)

    import realtimevotingdataengineer_spark.operators  # noqa: F401
    from realtimevotingdataengineer_spark.registry import QUERIES
    from realtimevotingdataengineer_spark.sources.tables import Tables

    t = Tables(spark, WORK)
    results = {}
    for key in KEYS:
        next_stage = (
            max((s["stageId"] for s in rest(spark, "/stages")), default=-1) + 1
        )
        t0 = time.perf_counter()
        df = QUERIES[key](t)
        df.write.mode("overwrite").format("noop").save()
        m = stage_metrics(spark, next_stage)
        m.update(
            execute_s=round(time.perf_counter() - t0, 1),
            out_rows=df.count(),
            task_skew=heaviest_stage_skew(spark, next_stage),
        )
        results[key] = m
        print(json.dumps({key: m}), flush=True)
    print(
        json.dumps(
            {
                "metric": "scale_probe_skew_emb",
                "mode": MODE,
                "head_copies": HEAD,
                **shape,
                "load_avg": list(os.getloadavg()),
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
