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
#: Round 14 (verdict ask #3): --geometry subspace builds a SELECTIVE
#: corpus instead of the saturating iid one. At θ=0.4, d=64 a grown
#: iid index saturates INTRINSICALLY (best-of-2M background cosine
#: ≈ sqrt(2·ln 2M / 64) ≈ 0.67 > θ, so ~98.5% of batch vectors are
#: true crossers — the r13 caveat). The selective regime is built by
#: CONSTRUCTION instead: index vectors live in dims 0-31, batch
#: background in dims 32-63 (cross-cosine exactly 0 at ANY index
#: size), plus 2% planted near-copies of index vectors (cos ≈ 0.995 —
#: certain-yes material) and 0.5% mixes at cos ≈ 0.40 ± 0.04
#: straddling θ (margin material). SRP signatures still collide at
#: the cos-0 rate (projections mix all dims), so the verify stage
#: sees abundant candidates of which almost none are matches — the
#: regime the pre-screen's certain/margin split was never measured
#: in. Run with SRP_PRESCREEN_DEBUG=1 to record the split
#: (corpus.SRP_PRESCREEN_LAST); the probe runs prescreen on AND off
#: and asserts survivor equality.
GEOMETRY = "iid"
if "--geometry" in sys.argv:
    GEOMETRY = sys.argv[sys.argv.index("--geometry") + 1]
    _args = [a for a in _args if a != GEOMETRY]
PLANT_DUP_FRAC = 0.02
PLANT_MARGIN_FRAC = 0.005
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


def _coord(tag: str, content, i):
    """Deterministic uniform(-5, 5) coordinate keyed on (tag, content,
    dim) — same family the iid probe uses, namespaced per role."""
    return (
        F.pmod(
            F.hash(F.concat_ws(":", F.lit(tag), i, content)), F.lit(1000)
        ).cast("double")
        / 100.0
        - 5.0
    )


def _half_vec(tag: str, content, lo: int, hi: int):
    """64-dim vector with hash-derived coords on dims [lo, hi) and
    exact zeros elsewhere — the subspace-geometry building block."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
        lambda i: F.when(
            (i >= F.lit(lo)) & (i < F.lit(hi)), _coord(tag, content, i)
        ).otherwise(F.lit(0.0)),
    )


def run_subspace(spark) -> None:
    """Selective-regime grown-index measurement (round-14 verdict ask
    #3): index in dims 0-31, batch background in dims 32-63, planted
    dups + θ-straddling margin mixes as the only true structure. Runs
    the gate prescreen ON and OFF over identical copies of the
    warm-started index, records wall / widen / RSS / the
    SRP_PRESCREEN_LAST split, and asserts survivor equality."""
    assert INDEX_MULT > 0, "--geometry subspace requires --index-mult"
    idx_rows = INDEX_MULT * N_TOTAL
    n_plant = int(N_TOTAL * PLANT_DUP_FRAC)
    n_margin = int(N_TOTAL * PLANT_MARGIN_FRAC)

    c = F.col("content")
    base_c = F.lit(INDEX_BASE) + F.pmod(c, F.lit(idx_rows))
    idx_vec_of_base = _half_vec("idx", base_c, 0, 32)
    bg = spark.range(N_TOTAL - n_plant - n_margin).select(
        F.col("id").alias("content")
    ).select(
        F.col("content").alias("vec_id"),
        _half_vec("bg", c, 32, 64).alias("embedding"),
    )
    # planted near-dups: an index vector plus 10% same-subspace noise
    # (cos ≈ 1/sqrt(1.01) ≈ 0.995 — certain-yes material)
    plant = spark.range(n_plant).select(
        (F.col("id") + (N_TOTAL - n_plant - n_margin)).alias("content")
    ).select(
        F.col("content").alias("vec_id"),
        F.zip_with(
            idx_vec_of_base,
            _half_vec("pnoise", c, 0, 32),
            lambda a, b: a + F.lit(0.1) * b,
        ).alias("embedding"),
    )
    # margin mixes: w = 0.4·u + 0.9165·v with |u| ≈ |v| in law, so
    # cos(w, u) ≈ 0.4/sqrt(0.16 + 0.84·(|v|/|u|)²) ≈ 0.40 ± ~0.04 —
    # straddles θ, populating both margin outcomes
    margin = spark.range(n_margin).select(
        (F.col("id") + (N_TOTAL - n_margin)).alias("content")
    ).select(
        F.col("content").alias("vec_id"),
        F.zip_with(
            idx_vec_of_base,
            _half_vec("bg", c, 32, 64),
            lambda a, b: F.lit(0.4) * a + F.lit(0.9165) * b,
        ).alias("embedding"),
    )
    batch = bg.unionByName(plant).unionByName(margin)

    work = tempfile.mkdtemp(prefix="srp_subspace_")
    idx0 = f"{work}/idx0"
    base = spark.range(idx_rows).select(
        (F.col("id") + INDEX_BASE).alias("content")
    ).select(
        F.col("content").alias("vec_id"),
        _half_vec("idx", c, 0, 32).alias("embedding"),
    )
    tb = time.perf_counter()
    corpus.build_srp_stream_index(base, idx0)
    idx_build_s = time.perf_counter() - tb
    warm = spark.range(1000).select(
        (F.col("id") + INDEX_BASE - 10_000).alias("content")
    ).select(
        F.col("content").alias("vec_id"),
        _half_vec("bg", c, 32, 64).alias("embedding"),
    )
    tw = time.perf_counter()
    corpus._srp_gate_batch(warm, idx0, f"{work}/warm_surv")
    warmup_s = time.perf_counter() - tw

    results = {
        "geometry": "subspace",
        "n_total": N_TOTAL,
        "index_rows": idx_rows,
        "planted_dups": n_plant,
        "margin_mixes": n_margin,
        "index_build_s": round(idx_build_s, 1),
        "warmup_gate_s": round(warmup_s, 1),
    }
    # three arms: split-accounting (prescreen + debug counters — its
    # timing is CONTAMINATED by the extra count actions over the lazy
    # pair relation, recorded only for the split numbers), clean
    # prescreen (the honest timing arm), exact. Survivors must match
    # across all three.
    survs = {}
    arms = [
        ("split", True, True),
        ("prescreen", True, False),
        ("exact", False, False),
    ]
    for name, mode, debug in arms:
        arm = f"{work}/idx_{name}"
        shutil.copytree(idx0, arm)
        sp = f"{work}/surv_{name}"
        if debug:
            os.environ["SRP_PRESCREEN_DEBUG"] = "1"
        else:
            os.environ.pop("SRP_PRESCREEN_DEBUG", None)
        corpus.SRP_WIDEN_LAST.clear()
        corpus.SRP_PRESCREEN_LAST.clear()
        rss0 = vm_rss_mb()
        t0 = time.perf_counter()
        corpus._srp_gate_batch(batch, arm, sp, prescreen=mode)
        dt = time.perf_counter() - t0
        rss1 = vm_rss_mb()
        survs[name] = sorted(
            r.vec_id
            for r in spark.read.parquet(sp).select("vec_id").distinct().collect()
        )
        results[f"arm_{name}"] = {
            "secs": round(dt, 1),
            "timing_contaminated_by_debug_counts": debug,
            "survivors": len(survs[name]),
            "widen": dict(corpus.SRP_WIDEN_LAST),
            "prescreen_split": dict(corpus.SRP_PRESCREEN_LAST),
            "driver_rss_mb_before": round(rss0, 1),
            "driver_rss_mb_after": round(rss1, 1),
        }
        print(json.dumps({f"arm_{name}": results[f"arm_{name}"]}), flush=True)
    results["survivors_identical"] = (
        survs["split"] == survs["prescreen"] == survs["exact"]
    )
    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "srp_subspace_gate_probe",
                "load_avg": list(os.getloadavg()),
                "results": results,
            }
        )
    )


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
    if GEOMETRY == "subspace":
        run_subspace(spark)
        return
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
