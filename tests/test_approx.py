"""Approximate aggregates: the scale path for exact-optional analytics.

No DuckDB oracle (sketch internals differ across engines by design);
correctness is bounded-error vs the exact answer, which is the actual
contract of these operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtimevotingdataengineer_spark.sources.tables import Tables


@pytest.fixture(scope="module")
def t(spark, sf_dir):
    return Tables(spark, sf_dir)


def test_approx_count_distinct_within_rsd(t):
    exact = t.events.select("user_id").distinct().count()
    approx = t.events.agg(
        F.approx_count_distinct("user_id", rsd=0.05).alias("a")
    ).collect()[0].a
    assert abs(approx - exact) / exact < 0.15


def test_approx_percentile_brackets_exact_median(t):
    approx = t.orders.agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("m")
    ).collect()[0].m
    lo, hi = t.orders.approxQuantile("o_totalprice", [0.4, 0.6], 0.01)
    assert lo <= approx <= hi


def test_random_projection_preserves_distances(t):
    """JL property: for the md5-seeded ±1 projection, E[proj_dist²] =
    RP_DIM · orig_dist² — so the per-pair ratio proj²/(RP_DIM·orig²)
    concentrates around 1. Assert the MEDIAN ratio over sampled pairs
    lands well inside [0.3, 3] (8 dims is coarse; the median is stable)."""
    import statistics

    from realtimevotingdataengineer_spark.operators.similarity import (
        RP_DIM,
        emb_random_projection,
    )

    orig = {
        r["vec_id"]: r["embedding"]
        for r in t.embeddings.filter(F.col("vec_id") < 30).collect()
    }
    proj = {
        r["vec_id"]: [r[f"p{j}"] for j in range(RP_DIM)]
        for r in emb_random_projection(t).filter(F.col("vec_id") < 30).collect()
    }
    ids = sorted(orig)
    ratios = []
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            d2 = sum((x - y) ** 2 for x, y in zip(orig[a], orig[b]))
            p2 = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
            if d2 > 0:
                ratios.append(p2 / (RP_DIM * d2))
    assert ratios
    assert 0.3 < statistics.median(ratios) < 3.0


def test_simhash_hamming_banding_is_exact_for_small_radius(t):
    """Pigeonhole guarantee: the banded candidate join recovers EVERY
    pair within hamming distance SIMHAM_MAX (recall 1.0), and the
    popcount filter makes precision 1.0 — so the operator equals the
    brute-force all-pairs scan over the signatures exactly."""
    from realtimevotingdataengineer_spark.operators.dedup import (
        SIMHAM_MAX,
        dedup_simhash,
        dedup_simhash_hamming,
    )

    sh = {r.doc_id: r.simhash for r in dedup_simhash(t).collect()}
    ids = sorted(sh)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sh[a] ^ sh[b]).count("1") <= SIMHAM_MAX
    }
    got = {(r.doc_a, r.doc_b) for r in dedup_simhash_hamming(t).collect()}
    assert got == brute


def test_simhash64_banding_is_exact_for_small_radius(t):
    """The generalized pigeonhole claim (radius <= bands-1) for the
    64-bit/16-bit-band scale variant: banded recall 1.0 + popcount
    precision 1.0 == brute force over the 64-bit signatures."""
    from realtimevotingdataengineer_spark.operators.dedup import (
        SIMHAM64_MAX,
        dedup_simhash64_hamming,
        simhash64_signatures,
    )

    sig = {r.doc_id: (r.lo, r.hi) for r in simhash64_signatures(t).collect()}
    ids = sorted(sig)
    for lo, hi in sig.values():  # two clean 32-bit words, sign bit unused
        assert 0 <= lo < 2**32 and 0 <= hi < 2**32

    def ham(a, b):
        return bin(sig[a][0] ^ sig[b][0]).count("1") + bin(
            sig[a][1] ^ sig[b][1]
        ).count("1")

    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(a, b) <= SIMHAM64_MAX
    }
    got = {(r.doc_a, r.doc_b) for r in dedup_simhash64_hamming(t).collect()}
    assert got == brute


def test_knn_graph_bucket_local_with_full_fanout(t):
    """Every edge stays within one IVF bucket, fanout never exceeds
    KNN_K, and any vector whose bucket has more than KNN_K members gets
    exactly KNN_K neighbors."""
    from collections import Counter

    from realtimevotingdataengineer_spark.operators.similarity import (
        KNN_K,
        derived_n_cent,
        ivf_assign_fixed,
        sim_knn_graph,
    )

    rows = sim_knn_graph(t).collect()
    fanout = Counter(r.src_id for r in rows)
    assert max(fanout.values()) <= KNN_K
    assign = {
        r.vec_id: r.cent_id
        for r in ivf_assign_fixed(
            t.embeddings, 1, derived_n_cent(t.embeddings)
        ).collect()
    }
    for r in rows:
        assert assign[r.src_id] == assign[r.dst_id]
    bucket_size = Counter(assign.values())
    for vid, cent in assign.items():
        if bucket_size[cent] > KNN_K:
            assert fanout[vid] == KNN_K, vid


def test_hll_calibration_key_all_within_envelope(t):
    from realtimevotingdataengineer_spark.operators.events_analytics import (
        agg_approx_distinct,
    )

    rows = agg_approx_distinct(t).collect()
    assert rows and all(r.approx_ok for r in rows)


def test_gk_percentile_calibration_key_rank_window(t):
    from realtimevotingdataengineer_spark.operators.events_analytics import (
        agg_approx_percentile,
    )

    rows = agg_approx_percentile(t).collect()
    assert rows and all(r.approx_ok for r in rows)


def test_pagerank_teleport_floor_and_coverage(t):
    """Every corpus vector gets a rank; the teleport term is a hard
    floor; vectors with no in-edges sit exactly on it."""
    from realtimevotingdataengineer_spark.operators.graph import (
        PR_BASE,
        graph_pagerank_knn,
    )
    from realtimevotingdataengineer_spark.operators.similarity import sim_knn_graph

    ranks = {r.vec_id: r.pagerank for r in graph_pagerank_knn(t).collect()}
    assert len(ranks) == t.embeddings.count()
    assert min(ranks.values()) >= PR_BASE - 1e-12
    dsts = {r.dst_id for r in sim_knn_graph(t).collect()}
    for vid, r in ranks.items():
        if vid not in dsts:
            assert r == PR_BASE, vid


def test_transition_matrix_rows_normalize(t):
    """Per-source transition probabilities must sum to exactly 1 (the
    row counts divide their own total)."""
    from collections import defaultdict

    from realtimevotingdataengineer_spark.operators.events_analytics import (
        events_transition_matrix,
    )

    rows = events_transition_matrix(t).collect()
    assert rows
    by_from = defaultdict(float)
    for r in rows:
        by_from[r.from_type] += r.prob
    for k, s in by_from.items():
        assert abs(s - 1.0) < 1e-9, (k, s)


def test_clustering_coeff_bounds_and_triangle_symmetry(t):
    """Coefficients live in [0, 1]; total triangle incidences divide by
    3 (each triangle is counted once per corner)."""
    from realtimevotingdataengineer_spark.operators.graph import (
        graph_clustering_coeff,
    )

    rows = graph_clustering_coeff(t).collect()
    assert rows
    assert all(0.0 <= r.clustering_coeff <= 1.0 for r in rows)
    assert sum(r.n_triangles for r in rows) % 3 == 0


def test_collapsed_hamming_constant_corpus_is_linear_join(spark):
    """The DISTINCT-HASH collapse contract on the degenerate
    boilerplate corpus (every doc the SAME signature — the regime
    AQE's median-relative skew split cannot rescue because every
    bucket is equally huge): the banded join sees ONE distinct hash
    and emits ZERO hash pairs, while the expansion still delivers the
    exact C(n,2) doc-pair contract at hamming 0. Plus a mixed case:
    two hash groups one bit apart must yield all cross pairs at
    hamming 1 and all within pairs at hamming 0 — bit-identical to
    banding the raw docs."""
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.operators.dedup import (
        _banded_hamming_pairs,
    )

    n = 1000
    sh = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(12345).cast("bigint").alias("simhash")
    )
    bands = [
        F.shiftright("simhash", 8 * i).bitwiseAND(F.lit(255)) for i in range(4)
    ]
    out = _banded_hamming_pairs(sh, ["simhash"], bands, 3)
    assert out.count() == n * (n - 1) // 2
    assert out.filter(F.col("hamming") != 0).count() == 0

    mixed = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 6, F.lit(12345))
        .otherwise(F.lit(12345 ^ 1))
        .cast("bigint")
        .alias("simhash"),
    )
    want = set()
    hv = {i: 12345 if i < 6 else 12345 ^ 1 for i in range(10)}
    for a in range(10):
        for b in range(a + 1, 10):
            want.add((a, b, bin(hv[a] ^ hv[b]).count("1")))
    # both branches — forced collapsed, forced raw, and the adaptive
    # default (2 distinct hashes / 10 docs trips the ratio) — must be
    # bit-identical
    for forced in (True, False, None):
        got = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in _banded_hamming_pairs(
                mixed, ["simhash"], bands, 3, collapse=forced
            ).collect()
        }
        assert got == want, forced
