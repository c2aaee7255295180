"""Planted-pair crossover probe: IVF-bucketed vs SRP embedding dedup
as the corpus grows (round-12 depth — turns the repo's asserted "SRP is
the very-large-n near-dup path" claim into measured recall AND
candidate-volume curves).

Corpus per n: a hash-derived near-orthogonal background of n vectors
(the scale_probe_embeddings generator) plus M planted near-dup pairs —
copy i perturbs base vector i by a rank-increasing epsilon, giving
exact cosines spread over ~(0.45, 0.98). Ground truth = the planted
pairs whose EXACT cosine lands in [0.45, 0.95] (computed in numpy on
the driver, M rows; pairs outside the window are dropped so neither
engine path is graded on theta-boundary coin flips).

Per (n, key) the probe records:
- recall on planted pairs, overall and BY COSINE BAND (SRP's collision
  probability is angle-driven; IVF's border loss is angle-blind — the
  by-band curve is where the two paths genuinely differ),
- candidate-pair volume (the bucket/band join before verify) and its
  fraction of brute n(n-1)/2 — the scale story: IVF at the derived
  k≈sqrt(n) codebook is ~n^1.5, while SRP at a FIXED 4-bit band
  width keeps a constant background collision fraction (~0.40 of all
  pairs at theta=90-degree backgrounds: 1-(1-2^-4)^8), i.e. Theta(n^2)
  — n-independent per-pair recall does NOT make it the large-n path
  unless band width grows ~log n. (The first run of this probe
  established exactly that; srp_width_rung shipped in response — past
  SRP_WIDE_MIN_N vectors the key runs 8-bit x 32-band signatures, and
  this probe's 20k point measures THAT arm on reruns.)
- wall time.

Usage: python tools/scale_probe_srp_vs_ivf.py [n ...]  (default 2000 6000 20000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SIZES = [int(a) for a in sys.argv[1:]] or [2000, 6000, 20000]
M_PLANT = 500
PLANT_STRIDE = 10_000_000
EMB_DIM = 64
COS_LO, COS_HI = 0.45, 0.95
KEYS = ["dedup_embedding_bucketed", "dedup_embedding_srp"]


def hash_vec(tag: str, dim: int) -> np.ndarray:
    """Deterministic pseudo-uniform coords in [-1, 1) from md5(tag_j) —
    driver-side twin of the probe corpus generator (exact parity with
    the Spark expression is not needed: the corpus is written from
    these numpy arrays, so engine and ground truth read identical
    bytes)."""
    import hashlib

    out = np.empty(dim)
    for j in range(dim):
        h = int.from_bytes(
            hashlib.md5(f"{tag}_{j}".encode()).digest()[:8], "big"
        )
        out[j] = (h % 2000 - 1000) / 1000.0
    return out


def build_corpus(spark, n: int, work: str) -> list:
    """Write embeddings.parquet (background + planted copies); return
    the ground-truth planted pairs [(id_a, id_b, cosine), ...] with
    exact cosine inside [COS_LO, COS_HI]."""
    rng_rows = []
    base = {}
    for i in range(n):
        v = hash_vec(f"bg{i}", EMB_DIM)
        base[i] = v
        rng_rows.append((i, [float(x) for x in np.float32(v)]))
    truth = []
    for i in range(M_PLANT):
        v = base[i]
        u = hash_vec(f"pert{i}", EMB_DIM)
        # rank-increasing perturbation: eps from 0.05 (cos ~0.99) to
        # ~1.6 (cos ~0.4) — the exact cosine is computed below and
        # out-of-window pairs dropped, so the spread only needs to
        # cover the window
        eps = 0.05 + 1.55 * (i / M_PLANT)
        w = v + eps * u
        a32 = np.float32(v).astype(np.float64)
        b32 = np.float32(w).astype(np.float64)
        c = float(a32 @ b32 / (np.linalg.norm(a32) * np.linalg.norm(b32)))
        rng_rows.append((i + PLANT_STRIDE, [float(x) for x in np.float32(w)]))
        if COS_LO <= c <= COS_HI:
            truth.append((i, i + PLANT_STRIDE, c))
    marker = f"{work}/embeddings.parquet/_SUCCESS"
    if not os.path.exists(marker):
        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(work, exist_ok=True)
        spark.createDataFrame(
            rng_rows, "vec_id long, embedding array<float>"
        ).repartition(32).write.mode("overwrite").parquet(
            f"{work}/embeddings.parquet"
        )
        src = "/root/testdata/sf0.1"
        for t in (
            "region nation customer supplier part orders lineitem events documents"
        ).split():
            os.symlink(f"{src}/{t}.parquet", f"{work}/{t}.parquet")
    return truth


def cand_volume(spark, t, key: str) -> int:
    """Candidate pairs the verify stage pays, per path."""
    from realtimevotingdataengineer_spark.operators.dedup import srp_width_rung
    from realtimevotingdataengineer_spark.operators.similarity import (
        codebook_rung,
        ivf_assign_fixed,
        probe_rung,
        srp_band_signatures,
    )

    if key == "dedup_embedding_bucketed":
        nn = t.embeddings.count()
        assign = ivf_assign_fixed(
            t.embeddings, probe_rung(nn), codebook_rung(nn)
        ).localCheckpoint(eager=True)
        aa, ab = assign.alias("aa"), assign.alias("ab")
        return (
            aa.join(
                ab,
                (F.col("aa.cent_id") == F.col("ab.cent_id"))
                & (F.col("aa.vec_id") < F.col("ab.vec_id")),
            )
            .select("aa.vec_id", "ab.vec_id")
            .distinct()
            .count()
        )
    bb, nb = srp_width_rung(t.embeddings.count())
    sigs = srp_band_signatures(
        t.embeddings, "vec_id", "embedding", bb, nb
    ).localCheckpoint(eager=True)
    bands = sigs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("band"), F.col(f"bv{j}").alias("bv"))
                    for j in range(nb)
                ]
            )
        ).alias("s"),
    ).select("vec_id", "s.band", "s.bv")
    ba, bb = bands.alias("ba"), bands.alias("bb")
    return (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.bv") == F.col("bb.bv"))
            & (F.col("ba.vec_id") < F.col("bb.vec_id")),
        )
        .select("ba.vec_id", "bb.vec_id")
        .distinct()
        .count()
    )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import realtimevotingdataengineer_spark.operators  # noqa: F401
    from realtimevotingdataengineer_spark.registry import QUERIES
    from realtimevotingdataengineer_spark.sources.tables import Tables

    all_results = {}
    for n in SIZES:
        work = f"/tmp/probe_srp_ivf_{n}"
        truth = build_corpus(spark, n, work)
        tdf = spark.createDataFrame(
            truth, "vec_a long, vec_b long, cos double"
        ).localCheckpoint(eager=True)
        t = Tables(spark, work)
        res = {"n": n + M_PLANT, "planted": len(truth)}
        for key in KEYS:
            cand = cand_volume(spark, t, key)
            t0 = time.perf_counter()
            out = QUERIES[key](t).select("vec_a", "vec_b").localCheckpoint(eager=True)
            dt = time.perf_counter() - t0
            hit = tdf.join(out, ["vec_a", "vec_b"], "left_semi")
            by_band = {
                f"{0.45 + 0.1 * r.b:.2f}": [r.hits, r.total]
                for r in tdf.withColumn(
                    "b", F.floor((F.col("cos") - 0.45) / 0.1).cast("int")
                )
                .join(
                    hit.withColumn("h", F.lit(1)).select("vec_a", "h"),
                    "vec_a",
                    "left",
                )
                .groupBy("b")
                .agg(
                    F.sum(F.coalesce("h", F.lit(0))).alias("hits"),
                    F.count(F.lit(1)).alias("total"),
                )
                .collect()
            }
            n_hit = hit.count()
            tot = n + M_PLANT
            res[key] = {
                "recall": round(n_hit / max(1, len(truth)), 3),
                "recall_by_cos": dict(sorted(by_band.items())),
                "cand_pairs": cand,
                "cand_fraction": round(cand / (tot * (tot - 1) / 2), 4),
                "execute_s": round(dt, 1),
            }
        all_results[str(n)] = res
        print(json.dumps({str(n): res}), flush=True)
    print(
        json.dumps(
            {
                "metric": "scale_probe_srp_vs_ivf",
                "sizes": SIZES,
                "planted": M_PLANT,
                "load_avg": list(os.getloadavg()),
                "results": all_results,
            }
        )
    )


if __name__ == "__main__":
    main()
