"""Mid-plateau codebook rung dial probe (round-15 verdict ask #3's
measurement leg — run BEFORE any rung-schedule change).

codebook_rung pins k to powers of two (integer CASE-ladder exactness:
ceil(sqrt(n)) <= 2^m iff n <= 4^m), so the candidate fraction of the
embedding-dedup self-join is CONSTANT inside each plateau and halves at
boundaries — the r14 30x window read exponent 2.04 inside the k=256
plateau (envelope 1.64 only because boundaries halve the fraction). A
mid rung k = 3*2^(m-1) keeps the integer discipline
(ceil(sqrt(n)) <= 3*2^(m-1) iff n <= 9*4^(m-1) — still a pure BIGINT
threshold) and shortens plateaus from 4x span to 2.25x/1.78x, capping
the worst-case plateau-end fraction at ~2/3 of today's.

What must be measured first (the probe_rung lesson): recall. The mid
rung runs p = floor(log2 k) = m probes over k = 3*2^(m-1) cells — a
lower probe-to-cell ratio than either power-of-2 neighbor — so planted
near-dup recall at the mid rung's own regime is the ship/no-ship
number.

Per (n, dial in {current rung, mid rung}): planted-pair recall overall
and by cosine band (methodology of tools/scale_probe_srp_vs_ivf.py:
hash-derived near-orthogonal background + M planted pairs at exact
cosines spread over (0.45, 0.98), ground truth = pairs landing in
[0.45, 0.95]), plus the RAW bucket-join volume sum_c C(sz_c, 2) and its
fraction of brute n(n-1)/2 (the shuffle/verify load the self-join pays
BEFORE the distinct — an upper bound on distinct candidate pairs,
consistent across dials).

Pure numpy (assignment = top-p pinned-cosine to the first-k-vectors
codebook, exactly ivf_assign_fixed's semantics; bitwise parity is not
needed here — ship/no-ship reads relative recall between dials).

Usage: python tools/probe_ivf_midrung_dials.py [n ...]
       (default 70000 100000 140000 — the k=384 mid rung's own regime)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from scale_probe_srp_vs_ivf import hash_vec  # noqa: E402

from realtimevotingdataengineer_spark.operators.similarity import (  # noqa: E402
    codebook_rung,
    probe_rung,
)

SIZES = [int(a) for a in sys.argv[1:]] or [70000, 100000, 140000]
M_PLANT = 500
PLANT_STRIDE = 10_000_000
EMB_DIM = 64
COS_LO, COS_HI = 0.45, 0.95
#: Past this n the background switches to seeded numpy uniform — same
#: coordinate law as hash_vec, 100x faster (the FAST_BG_MIN_N lesson).
FAST_BG_MIN_N = 100_000


def midrung(n: int) -> tuple[int, int]:
    """(k, p) on the mid-rung schedule: smallest of {2^m, 3*2^(m-1)}
    >= ceil(sqrt(n)); p = floor(log2 k). Pure integers."""
    m = 3
    while m < 15 and 4**m < n:
        m += 1
    # the octave (2^(m-1), 2^m] contains one mid candidate 3*2^(m-2);
    # ceil(sqrt(n)) <= 3*2^(m-2)  iff  n <= 9*4^(m-2)
    if m > 3 and n <= 9 * 4 ** (m - 2):
        k = 3 * 2 ** (m - 2)
    else:
        k = 2**m
    return k, k.bit_length() - 1


def build(n: int) -> tuple[np.ndarray, list[tuple[int, int, float]]]:
    """(vectors float32 [n + 2*M], planted (ia, ib, exact_cos))."""
    if n >= FAST_BG_MIN_N:
        rng = np.random.default_rng(20260816)
        V = rng.uniform(-1.0, 1.0, size=(n, EMB_DIM))
    else:
        V = np.stack([hash_vec(f"bg{i}", EMB_DIM) for i in range(n)])
    extra, planted = [], []
    for r in range(M_PLANT):
        # anchor = background row r+1024 (past any codebook prefix so a
        # planted pair never straddles a centroid), partner = planted
        # perturbation appended at the tail
        a = V[r + 1024]
        an = a / np.linalg.norm(a)
        u = hash_vec(f"pp{r}", EMB_DIM)
        u = u - (u @ an) * an
        u /= np.linalg.norm(u)
        c = 0.45 + 0.53 * (r + 0.5) / M_PLANT
        w = (c * an + np.sqrt(1 - c * c) * u) * np.linalg.norm(a)
        extra.append(w)
        planted.append((r + 1024, len(V) + r))
    allv = np.vstack([V, np.stack(extra)]).astype(np.float32)
    out = []
    A = allv.astype(np.float64)
    for ia, ib in planted:
        va, vb = A[ia], A[ib]
        cos = (va @ vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
        if COS_LO <= cos <= COS_HI:
            out.append((ia, ib, float(cos)))
    return allv, out


def assign_topp(V32: np.ndarray, k: int, p: int) -> np.ndarray:
    """[n, p] int32 cell ids: top-p pinned cosine to the first-k rows
    (the fixed codebook), ties by cent_id ascending."""
    V = V32.astype(np.float64)
    nrm = np.linalg.norm(V, axis=1)
    C = V[:k] / nrm[:k, None]
    out = np.empty((len(V), p), dtype=np.int32)
    step = 65536
    for lo in range(0, len(V), step):
        hi = min(lo + step, len(V))
        S = (V[lo:hi] / nrm[lo:hi, None]) @ C.T
        # argsort desc with index-ascending tie-break: stable on -S
        idx = np.argsort(-S, axis=1, kind="stable")[:, :p]
        out[lo:hi] = idx
    return out


def main() -> None:
    results = {}
    for n in SIZES:
        V32, planted = build(n)
        total = len(V32)
        dials = {
            "current": (codebook_rung(n), probe_rung(n)),
            "mid": midrung(n),
        }
        res = {"n": n, "planted_in_window": len(planted)}
        for name, (k, p) in dials.items():
            t0 = time.perf_counter()
            cells = assign_topp(V32, k, p)
            # raw join volume: vectors appear once per assigned cell
            cnt = np.bincount(cells.reshape(-1), minlength=k).astype(np.int64)
            raw = int((cnt * (cnt - 1) // 2).sum())
            brute = total * (total - 1) // 2
            # planted recall: pair shares >= 1 cell
            hits, by_band = 0, {}
            for ia, ib, cos in planted:
                ok = bool(set(cells[ia]) & set(cells[ib]))
                hits += ok
                band = f"{0.05 * int(cos / 0.05):.2f}"
                h, tt = by_band.get(band, (0, 0))
                by_band[band] = (h + ok, tt + 1)
            res[name] = {
                "k": k,
                "p": p,
                "recall_planted": round(hits / max(len(planted), 1), 3),
                "raw_join_pairs": raw,
                "raw_fraction": round(raw / brute, 4),
                "assign_s": round(time.perf_counter() - t0, 1),
                "recall_by_cos_band": {
                    b: round(h / tt, 3)
                    for b, (h, tt) in sorted(by_band.items())
                },
            }
            print(
                f"[n={n}] {name} k={k} p={p}: recall="
                f"{res[name]['recall_planted']:.3f} "
                f"raw_frac={res[name]['raw_fraction']:.4f}",
                flush=True,
            )
        results[str(n)] = res
    print(
        json.dumps(
            {
                "metric": "ivf_midrung_dials",
                "m_plant": M_PLANT,
                "load_avg": list(os.getloadavg()),
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
