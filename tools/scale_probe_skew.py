"""Skewed-replication depth probe (round-11 verdict ask #6, adapted:
TESTDATA.md tops out at sf0.1 — no sf1 exists — so natural-skew
evidence comes from a ZIPF-skewed synthetic replication instead of the
uniform k× copies of tools/scale_probe_10x.py, whose group sizes are
deliberately flat).

Corpus: every sf0.1 document appears once verbatim; the top-ranked
documents additionally get rank-decaying near-dup copies
(copies(rank) = ceil(HEAD / rank), suffix-tokenized like the 10x probe)
— a handful of documents carry hundreds of copies while the long tail
has none, the shape a recrawl of a popular-page-heavy corpus actually
produces. That skews (a) the minhash band-bucket sizes (hot buckets =
hot shingle sets) and (b) the shuffle partition sizes the banded join
and the pack/shard writer see — exactly what uniform replication
cannot stress. The probe records wall time, shuffle volume, spill,
peak execution memory, and the max/mean task-time skew of the heaviest
stage from the Spark REST API.

Keys: `dedup_minhash_lsh` end-to-end (quadratic-OUTPUT on dup groups —
read next to `dedup_clusters`, its linear-output twin, per the NOTES
pairing rule) and `corpus_pack_sequences_sharded`.

Usage: python tools/scale_probe_skew.py [head_copies]   (default 400)
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

HEAD = int(sys.argv[1]) if len(sys.argv) > 1 else 400
SRC = "/root/testdata/sf0.1"
WORK = f"/tmp/scale_probe_skew_{HEAD}"
KEYS = ["dedup_minhash_lsh", "dedup_clusters", "corpus_pack_sequences_sharded"]


def build_corpus(spark) -> int:
    marker = f"{WORK}/documents.parquet/_SUCCESS"
    if not os.path.exists(marker):
        shutil.rmtree(WORK, ignore_errors=True)
        os.makedirs(WORK, exist_ok=True)
        docs = spark.read.parquet(f"{SRC}/documents.parquet")
        mx = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        # rank by doc_id (deterministic); copies(rank) = ceil(HEAD/rank),
        # capped at rank HEAD (beyond it the ceil is 1 extra copy — stop
        # at 0 instead so the tail is copy-free)
        copies = F.expr(
            f"CASE WHEN doc_id < {HEAD} THEN CAST(ceil({HEAD} / (doc_id + 1)) AS INT) "
            "ELSE 0 END"
        )
        extra = (
            docs.withColumn("n_copies", copies)
            .filter(F.col("n_copies") > 0)
            .withColumn("c", F.explode(F.sequence(F.lit(1), F.col("n_copies"))))
            .select(
                (F.col("doc_id") + F.col("c") * mx).alias("doc_id"),
                F.concat(
                    "text", F.format_string(" replicant%d", F.col("c"))
                ).alias("text"),
                *[
                    c
                    for c in docs.columns
                    if c not in ("doc_id", "text")
                ],
            )
        )
        docs.unionByName(extra).repartition(32).write.mode("overwrite").parquet(
            f"{WORK}/documents.parquet"
        )
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        dst = f"{WORK}/{t}.parquet"
        if not os.path.lexists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    return HEAD


def heaviest_stage_skew(spark, after_stage: int) -> dict:
    """Max/mean task-duration ratio of the longest completed stage —
    the number uniform replication keeps near 1 and skew pushes up."""
    worst = {"stage": None, "max_over_mean": 0.0, "stage_secs": 0.0}
    for st in rest(spark, "/stages?status=complete"):
        if st["stageId"] < after_stage or st.get("numCompleteTasks", 0) < 2:
            continue
        secs = st.get("executorRunTime", 0) / 1000.0
        if secs <= worst["stage_secs"]:
            continue
        try:
            dist = rest(
                spark,
                f"/stages/{st['stageId']}/{st['attemptId']}/taskSummary"
                "?quantiles=0.0,0.5,1.0",
            )
            dur = dist.get("duration", [0, 0, 0])
            mx, med = dur[2], max(dur[1], 1e-9)
            worst = {
                "stage": st["stageId"],
                "max_over_mean": round(mx / med, 2),
                "stage_secs": round(secs, 1),
            }
        except Exception:
            pass
    return worst


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_corpus(spark)

    import realtimevotingdataengineer_spark.operators  # noqa: F401
    from realtimevotingdataengineer_spark.registry import QUERIES
    from realtimevotingdataengineer_spark.sources.tables import Tables

    t = Tables(spark, WORK)
    docs = spark.read.parquet(f"{WORK}/documents.parquet")
    n_docs = docs.count()
    src_mx = (
        spark.read.parquet(f"{SRC}/documents.parquet")
        .agg(F.max("doc_id"))
        .collect()[0][0]
        + 1
    )
    top = (
        docs.groupBy(F.col("doc_id") % src_mx)  # fold copies onto base id
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
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
                "metric": "scale_probe_skew",
                "head_copies": HEAD,
                "docs": n_docs,
                "max_group": top,
                "load_avg": list(os.getloadavg()),
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
