"""Point-query SRP retrieval recall@k probe (round-13, verdict ask #1).

The round-12 audit measured the sim_*_srp POINT-QUERY keys' fixed
4-bit x 8-band layout admitting a flat ~40% of the corpus as
candidates per query at every n. Before re-signing those keys with
srp_width_rung's wide 8-bit x 32-band arm, this probe measures the
thing the rung could break: RECALL@K against exact brute-force top-k.
The verdict's caveat is specific — in a near-orthogonal corpus the
true top-k neighbors of a query sit near cos ~0.5 (best-of-n of
random cosines ~ sqrt(2 ln n / d) ~ 0.55 at n=20k, d=64), exactly the
angle band where the wide arm's per-band collision p^8 is weakest.

Two regimes per corpus size:
- background: queries are corpus vectors; ground truth = their exact
  top-K among the other background vectors (cos ~0.45-0.55 — the
  worst case and the honest one).
- planted: each query additionally gets K planted neighbors at exact
  cosines spread over (0.55, 0.95) (a retrieval corpus where relevant
  docs actually resemble the query); ground truth recomputed exactly
  over the union, so planted neighbors only enter it when they beat
  the background.

Per (regime, layout in {narrow 4x8, wide 8x32} x {single, multiprobe}):
recall@K vs exact, mean per-query candidate fraction, and wall time of
the full engine path (the REAL _srp_scored core over Arrow-kernel
signatures, N_QUERIES monkeypatched up for statistical width).

Usage: python tools/probe_srp_pointquery_recall.py [n ...] (default 20000)
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SIZES = [int(a) for a in sys.argv[1:]] or [20000]
N_Q = int(os.environ.get("SRP_PROBE_NQ", "100"))  # keys use N_QUERIES=5
K = 10  # TOP_K
EMB_DIM = 64
PLANT_STRIDE = 10_000_000

#: Round 14: the probed layouts are selectable so the same tool
#: measures a CANDIDATE rung before it ships (the r13 discipline —
#: recall measured BEFORE srp_width_rung switches). Default preserves
#: the r13 pair; pass e.g.
#:   SRP_PROBE_LAYOUTS=narrow_4x8,wide_8x32,xwide_12x128
#: to measure the three-rung ladder side by side.
ALL_LAYOUTS = {
    "narrow_4x8": (4, 8),
    "wide_8x32": (8, 32),
    "xwide_12x128": (12, 128),
}
LAYOUTS = {
    k: ALL_LAYOUTS[k]
    for k in os.environ.get(
        "SRP_PROBE_LAYOUTS", "narrow_4x8,wide_8x32"
    ).split(",")
}

#: Above this corpus size the per-coordinate md5 walk (70M+ hash calls
#: at n=1.1M) dominates setup, so the background switches to a seeded
#: numpy uniform(-1, 1) — the SAME iid-symmetric coordinate law
#: hash_vec draws from ((h % 2000 - 1000)/1000), so the cosine
#: geometry (near-orthogonal background, best-of-n ~ sqrt(2 ln n / d))
#: is unchanged; planted neighbors keep the md5 path (1k vectors).
FAST_BG_MIN_N = 100_000


def hash_vec(tag: str, dim: int) -> np.ndarray:
    out = np.empty(dim)
    for j in range(dim):
        h = int.from_bytes(hashlib.md5(f"{tag}_{j}".encode()).digest()[:8], "big")
        out[j] = (h % 2000 - 1000) / 1000.0
    return out


def build_corpus(n: int, planted: bool):
    """(ids, vecs float32) — background 0..n-1 plus, when planted, K
    neighbors per query at target cosines spread over (0.55, 0.95)."""
    if n >= FAST_BG_MIN_N:
        rng = np.random.default_rng(20260816)
        V = rng.uniform(-1.0, 1.0, size=(n, EMB_DIM))
    else:
        V = np.stack([hash_vec(f"bg{i}", EMB_DIM) for i in range(n)])
    ids = list(range(n))
    rows = [V]
    if planted:
        extra = []
        for q in range(N_Q):
            v = V[q]
            vn = v / np.linalg.norm(v)
            for r in range(K):
                u = hash_vec(f"pq{q}_{r}", EMB_DIM)
                u = u - (u @ vn) * vn
                u /= np.linalg.norm(u)
                c = 0.55 + 0.40 * (r + 0.5) / K
                w = c * vn + np.sqrt(1 - c * c) * u
                w *= np.linalg.norm(v)  # keep magnitudes in-family
                extra.append(w)
                ids.append(PLANT_STRIDE + q * K + r)
        rows.append(np.stack(extra))
    return np.array(ids, dtype=np.int64), np.vstack(rows).astype(np.float32)


def exact_topk(ids: np.ndarray, V32: np.ndarray) -> dict[int, set]:
    """Exact top-K neighbor ids per query (query = first N_Q rows),
    float64 math over the float32-stored coords — same bytes the
    engine reads back from parquet."""
    V = V32.astype(np.float64)
    nrm = np.linalg.norm(V, axis=1)
    Q = V[:N_Q] / nrm[:N_Q, None]
    C = V / nrm[:, None]
    S = Q @ C.T
    truth = {}
    for q in range(N_Q):
        s = S[q].copy()
        s[q] = -np.inf
        top = np.argpartition(-s, K)[:K]
        top = top[np.argsort(-s[top])]
        truth[int(ids[q])] = {int(ids[j]) for j in top}
    return truth


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from realtimevotingdataengineer_spark.operators import dedup, similarity
    from realtimevotingdataengineer_spark.operators.dedup import (
        _srp_scored,
        _srp_search_from_sigs,
    )
    from realtimevotingdataengineer_spark.operators.similarity import (
        srp_band_signatures,
    )
    from realtimevotingdataengineer_spark.sources.tables import Tables

    similarity.N_QUERIES = N_Q  # widen the query set for statistics

    all_results = {}
    for n in SIZES:
        for regime in ("background", "planted"):
            ids, V32 = build_corpus(n, planted=(regime == "planted"))
            truth = exact_topk(ids, V32)
            work = f"/tmp/probe_srp_pq_{n}_{regime}"
            marker = f"{work}/embeddings.parquet/_SUCCESS"
            if not os.path.exists(marker):
                shutil.rmtree(work, ignore_errors=True)
                os.makedirs(work, exist_ok=True)
                if len(ids) >= FAST_BG_MIN_N:
                    # pyarrow direct write (the driver-side python list
                    # path is 70M float boxes at n=1.1M); 32 files so
                    # the scan parallelizes like the repartition did
                    import pyarrow as pa
                    import pyarrow.parquet as pq

                    d = f"{work}/embeddings.parquet"
                    os.makedirs(d, exist_ok=True)
                    nrows = len(ids)
                    step = (nrows + 31) // 32
                    for p in range(32):
                        lo, hi = p * step, min((p + 1) * step, nrows)
                        if lo >= hi:
                            break
                        vals = pa.array(
                            V32[lo:hi].reshape(-1), type=pa.float32()
                        )
                        offs = pa.array(
                            np.arange(0, (hi - lo + 1) * EMB_DIM, EMB_DIM),
                            type=pa.int32(),
                        )
                        tbl = pa.table(
                            {
                                "vec_id": pa.array(ids[lo:hi], type=pa.int64()),
                                "embedding": pa.ListArray.from_arrays(offs, vals),
                            }
                        )
                        pq.write_table(tbl, f"{d}/part-{p:05d}.parquet")
                    open(f"{d}/_SUCCESS", "w").close()
                else:
                    spark.createDataFrame(
                        [(int(i), [float(x) for x in v]) for i, v in zip(ids, V32)],
                        "vec_id long, embedding array<float>",
                    ).repartition(32).write.mode("overwrite").parquet(
                        f"{work}/embeddings.parquet"
                    )
                for tb in (
                    "region nation customer supplier part orders lineitem "
                    "events documents"
                ).split():
                    os.symlink(
                        f"/root/testdata/sf0.1/{tb}.parquet", f"{work}/{tb}.parquet"
                    )
            t = Tables(spark, work)
            res = {"n_total": len(ids)}
            for label, (bb, nb) in LAYOUTS.items():
                sigs = srp_band_signatures(
                    t.embeddings, "vec_id", "embedding", bb, nb
                ).localCheckpoint(eager=True)
                for mp, probe_bits in (("single", 0), ("multiprobe", bb)):
                    # candidate volume per query (pre-verify)
                    cands = (
                        _srp_scored(t, sigs, probe_bits)
                        .groupBy("query_id")
                        .count()
                        .collect()
                    )
                    cand_frac = float(
                        np.mean([r["count"] for r in cands]) / (len(ids) - 1)
                    ) if cands else 0.0
                    t0 = time.perf_counter()
                    out = (
                        _srp_search_from_sigs(t, sigs, probe_bits=probe_bits, k=K)
                        .groupBy("query_id")
                        .agg(F.collect_set("neighbor_id").alias("nb"))
                        .collect()
                    )
                    dt = time.perf_counter() - t0
                    got = {r["query_id"]: set(r["nb"]) for r in out}
                    rec = float(
                        np.mean(
                            [
                                len(got.get(q, set()) & tv) / K
                                for q, tv in truth.items()
                            ]
                        )
                    )
                    res[f"{label}_{mp}"] = {
                        "recall_at_k": round(rec, 3),
                        "cand_fraction_per_query": round(cand_frac, 4),
                        "search_s": round(dt, 1),
                    }
                    print(
                        f"[n={n} {regime}] {label} {mp}: recall@{K}="
                        f"{rec:.3f} cand_frac={cand_frac:.4f} {dt:.1f}s",
                        flush=True,
                    )
            all_results[f"{n}_{regime}"] = res
    print(json.dumps(all_results, indent=1))


if __name__ == "__main__":
    main()
