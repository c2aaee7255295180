"""Query-directed SRP multiprobe recall-vs-fraction ladder (round-15
verdict ask #2's MEASUREMENT leg — run BEFORE any engine switch, the
r13/r14 house discipline).

Today's multiprobe probes EVERY Hamming-1 band perturbation: at the
xwide rung that is 12 flips x 128 bands = 1536 probe buckets per query
and admits a measured 0.368 of the corpus per query at n=1.2M
(tools/probe_srp_pointquery_recall_r14_n1200k.log) — a scan fraction at
100 TB, and sim_mmr_rerank_srp consumes that pool. Query-directed
probing (Lv et al. 2007, "Multi-Probe LSH", VLDB — the q(T) schedule)
ranks candidate flips by HYPERPLANE MARGIN |p_j| (the query's projection
onto hyperplane j, already computed for the signature): a near-neighbor
lands in the flipped bucket of hyperplane j with probability rising as
the query's margin on j falls, so probing the T lowest-|margin| flips
buys most of full multiprobe's recall at a fraction of its bucket
lookups.

This tool measures recall@10 and per-query candidate fraction as a
function of T on the SAME corpus geometry the r13/r14 rung probes used
(background + planted regimes), in pure numpy but with the EXACT
signature semantics: the +-1 signs are the pinned md5 chains
(similarity._rp_sign) and the projection fold is the same
left-associated index-order accumulation the Arrow kernel runs, so the
measured probe sets are the ones the engine would produce bit for bit.

T is swept per rung; T >= n_bits degenerates to today's all-flips
multiprobe (every bit flipped once), which anchors the ladder's top.

Usage: python tools/probe_srp_directed_multiprobe.py [n ...]
       (default 20000 — wide rung; pass 1200000 for the xwide regime)
Env:   SRP_PROBE_NQ (default 100), SRP_DIRECTED_TS (csv of T values)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from probe_srp_pointquery_recall import (  # noqa: E402
    EMB_DIM,
    K,
    N_Q,
    build_corpus,
)

from realtimevotingdataengineer_spark.operators.dedup import (  # noqa: E402
    srp_width_rung,
)
from realtimevotingdataengineer_spark.operators.similarity import (  # noqa: E402
    _rp_sign,
)

SIZES = [int(a) for a in sys.argv[1:]] or [20000]


def signatures_and_margins(
    V32: np.ndarray, band_bits: int, n_bands: int
) -> tuple[np.ndarray, np.ndarray]:
    """(bv[n, n_bands] int64, proj[n, n_bits] float64) with the kernel's
    exact fold: float32 coords widened to float64, acc = +-V[:,0] then
    +-V[:,i] in index order (srp_band_signatures's loop verbatim)."""
    n_bits = band_bits * n_bands
    # dim-major contiguous layout: VT[i] is coordinate i across all
    # rows as one contiguous 8n-byte read, vs the strided V[:, i]
    # column gather that made the fold cache-line-bound (~10x slower
    # at n=1.2M). The accumulation below is the SAME left-associated
    # elementwise add sequence — identical bits, different layout.
    VT = np.ascontiguousarray(V32.T.astype(np.float64))
    n = VT.shape[1]
    # margins are consumed only for the N_Q query rows — storing the
    # full n x n_bits proj matrix would be ~15 GB at n=1.2M
    proj_q = np.empty((N_Q, n_bits))
    bv = np.zeros((n, n_bands), dtype=np.int64)
    for j in range(n_bits):
        sj = [_rp_sign(j, i) for i in range(1, EMB_DIM + 1)]
        acc = VT[0].copy() if sj[0] > 0 else -VT[0]
        for i in range(1, EMB_DIM):
            if sj[i] > 0:
                acc += VT[i]
            else:
                acc -= VT[i]
        proj_q[:, j] = acc[:N_Q]
        bv[:, j // band_bits] |= (acc >= 0).astype(np.int64) << (j % band_bits)
    return bv, proj_q


def bucket_index(bv: np.ndarray, band_bits: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CSR over (band << band_bits | bv) keys -> sorted vec row ids."""
    n, n_bands = bv.shape
    keys = (
        (np.arange(n_bands, dtype=np.int64)[None, :] << band_bits) | bv
    ).reshape(-1)
    rows = np.repeat(np.arange(n, dtype=np.int64), n_bands)
    order = np.argsort(keys, kind="stable")
    skeys, srows = keys[order], rows[order]
    uniq, starts = np.unique(skeys, return_index=True)
    return uniq, starts, srows


def probe_candidates(
    q: int,
    bv: np.ndarray,
    proj: np.ndarray,
    band_bits: int,
    T: int,
    uniq: np.ndarray,
    starts: np.ndarray,
    srows: np.ndarray,
) -> np.ndarray:
    """Row indices colliding with query row q under own-buckets + the T
    lowest-|margin| directed flips (tie-break: lower j first, matching
    the engine's deterministic (abs(p), j) order)."""
    n_bands = bv.shape[1]
    n_bits = band_bits * n_bands
    own = (np.arange(n_bands, dtype=np.int64) << band_bits) | bv[q]
    keys = [own]
    if T > 0:
        m = np.abs(proj[q])
        # stable argsort on (|margin|, j): argsort is already j-stable
        flips = np.argsort(m, kind="stable")[: min(T, n_bits)]
        bands = flips // band_bits
        bits = flips % band_bits
        fbv = bv[q, bands] ^ (np.int64(1) << bits.astype(np.int64))
        keys.append((bands.astype(np.int64) << band_bits) | fbv)
    allk = np.concatenate(keys)
    pos = np.searchsorted(uniq, allk)
    out = []
    nb = len(uniq)
    ends = np.append(starts[1:], len(srows))
    for p, kk in zip(pos, allk):
        if p < nb and uniq[p] == kk:
            out.append(srows[starts[p] : ends[p]])
    cand = np.unique(np.concatenate(out)) if out else np.empty(0, dtype=np.int64)
    return cand[cand != q]


def main() -> None:
    results = {}
    for n in SIZES:
        bb, nb = srp_width_rung(n)
        n_bits = bb * nb
        default_ts = "0,16,32,64,96,128,192,256,%d" % n_bits
        TS = [
            int(x)
            for x in os.environ.get("SRP_DIRECTED_TS", default_ts).split(",")
        ]
        for regime in ("background", "planted"):
            ids, V32 = build_corpus(n, planted=(regime == "planted"))
            t0 = time.perf_counter()
            bv, proj = signatures_and_margins(V32, bb, nb)
            uniq, starts, srows = bucket_index(bv, bb)
            # exact cosine rows for the query block (ground truth + re-rank)
            V = V32.astype(np.float64)
            nrm = np.linalg.norm(V, axis=1)
            S = (V[:N_Q] / nrm[:N_Q, None]) @ (V / nrm[:, None]).T
            print(
                f"[n={n} {regime}] setup {time.perf_counter() - t0:.0f}s "
                f"rung={bb}x{nb} n_total={len(ids)}",
                flush=True,
            )
            truth = {}
            for q in range(N_Q):
                s = S[q].copy()
                s[q] = -np.inf
                top = np.argpartition(-s, K)[:K]
                truth[q] = set(top[np.argsort(-s[top])].tolist())
            res = {}
            for T in TS:
                fracs, recs = [], []
                for q in range(N_Q):
                    cand = probe_candidates(
                        q, bv, proj, bb, T, uniq, starts, srows
                    )
                    fracs.append(len(cand) / (len(ids) - 1))
                    if len(cand):
                        s = S[q][cand]
                        kk = min(K, len(cand))
                        top = cand[np.argpartition(-s, kk - 1)[:kk]]
                        hits = len(set(top.tolist()) & truth[q])
                    else:
                        hits = 0
                    recs.append(hits / K)
                res[f"T{T}"] = {
                    "recall_at_k": round(float(np.mean(recs)), 3),
                    "cand_fraction_per_query": round(float(np.mean(fracs)), 4),
                }
                print(
                    f"[n={n} {regime}] T={T}: recall@{K}="
                    f"{res[f'T{T}']['recall_at_k']:.3f} "
                    f"cand_frac={res[f'T{T}']['cand_fraction_per_query']:.4f}",
                    flush=True,
                )
            results[f"{n}_{regime}"] = {"rung": f"{bb}x{nb}", **res}
    print(
        json.dumps(
            {
                "metric": "srp_directed_multiprobe_ladder",
                "n_queries": N_Q,
                "load_avg": list(os.getloadavg()),
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
