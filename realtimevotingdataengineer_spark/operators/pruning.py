"""Embedding-space corpus pruning and nearest-centroid classification.

The data-pruning half of the LLM-pipeline family (the dedup half lives in
:mod:`.dedup`): per-label class centroids, prototypicality pruning in the
style of SSL-prototype / SemDeDup curation (Sorscher et al. 2022,
arXiv:2206.14486; Abbas et al. 2023, arXiv:2303.09540), and a
nearest-class-mean classifier with a confusion-matrix output. The
``embeddings`` table carries a ``label`` column (cluster id), which is
exactly the input these operators need.

Exactness: a cross-row mean of doubles is order-dependent, so a naive
``avg()`` would differ between engines and between partitionings. Every
centroid component here is an ORDERED left fold — Spark folds
``array_sort(collect_list(struct(vec_id, val)))`` with ``F.aggregate``;
the DuckDB oracle folds ``list(val ORDER BY vec_id)`` with
``list_reduce`` — the identical IEEE operation sequence, verified
bitwise (see tests). Downstream cosines reuse the repo's pinned
dot/norm chains, so all three operators have EXACT oracles despite
being float-heavy.

Scale posture (100 TB): the centroid build is one explode + one shuffle
producing a k×dim table — a build-time artifact like the IVF codebook
(persist it next to the index; refresh with the corpus). The ordered
fold deliberately trades map-side partial aggregation for bitwise
reproducibility; at petabyte row counts you would switch the sum to
double partials (tolerance-checked) or fixed-point accumulators —
the operator boundary doesn't change. Scoring/classification broadcast
the k-row centroid table: zero extra shuffle over the corpus scan. The
prune ranking partitions by label (k partitions); at extreme scale the
same cut is computed shuffle-free from a per-label cosine threshold
(approx-quantile) instead of a global rank — noted on the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import dot_expr, dot_sql, norm_expr, norm_sql, spread
from ..registry import register
from ..sources.tables import Tables
from .similarity import EMB_DIM

#: Fraction of each label's most-prototypical (closest-to-centroid)
#: vectors flagged for pruning — the SemDeDup-style redundancy cut.
PRUNE_FRAC = 0.25

_CENT_CTE = (
    "WITH v AS (SELECT vec_id, label, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
    "dims AS (SELECT vec_id, label, CAST(r.range AS INT) AS pos, "
    f"v[CAST(r.range AS INT) + 1] AS val FROM v CROSS JOIN range({EMB_DIM}) r), "
    # ordered left fold == Spark's F.aggregate over the vec_id-sorted list
    "centd AS (SELECT label, pos, "
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list(val ORDER BY vec_id)), "
    "(acc, x) -> acc + x) / count(*) AS c FROM dims GROUP BY label, pos), "
    "cent AS (SELECT label, list(c ORDER BY pos) AS cv FROM centd GROUP BY label) "
)

_COS_CENT = (
    f"({dot_sql('a.v', 'c.cv', EMB_DIM)}) / "
    f"(({norm_sql('a.v', EMB_DIM)}) * ({norm_sql('c.cv', EMB_DIM)}))"
)


def centroid_rows(emb: DataFrame) -> DataFrame:
    """(label, pos, c): per-label per-dimension mean as an ordered fold.

    The fold runs over the vec_id-sorted value list, so the result is
    bitwise-identical under any partitioning (and to the DuckDB twin).
    """
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("vec_id", "val"))),
        lambda s: s.getField("val"),
    )
    return dims.groupBy("label", "pos").agg(
        (
            F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x)
            / F.count(F.lit(1))
        ).alias("c")
    )


def label_centroids(emb: DataFrame) -> DataFrame:
    """(label, cv array<double>): the class-centroid codebook — k rows,
    broadcastable everywhere it is consumed."""
    return (
        centroid_rows(emb)
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("label", F.transform("pc", lambda s: s.getField("c")).alias("cv"))
    )


@register(
    "emb_label_centroids",
    _CENT_CTE
    + "SELECT label, pos, c AS centroid FROM centd ORDER BY label, pos",
)
def emb_label_centroids(t: Tables) -> DataFrame:
    """Per-label mean embedding, one row per (label, dimension) — the
    class-prototype table behind pruning and classification. Emitted as
    scalar rows (k×dim of them) rather than array cells, per the repo's
    comparison-layer rule."""
    return (
        centroid_rows(t.embeddings)
        .select("label", "pos", F.col("c").alias("centroid"))
        .orderBy("label", "pos")
    )


@register(
    "corpus_prune_semdedup",
    _CENT_CTE
    + ", scored AS (SELECT a.vec_id, a.label, "
    f"{_COS_CENT} AS cos_centroid "
    "FROM v a JOIN cent c ON a.label = c.label), "
    "ranked AS (SELECT vec_id, label, cos_centroid, "
    "row_number() OVER (PARTITION BY label ORDER BY cos_centroid DESC, vec_id) AS rn, "
    "count(*) OVER (PARTITION BY label) AS n FROM scored) "
    f"SELECT vec_id, label, cos_centroid, rn > floor({PRUNE_FRAC} * n) AS keep "
    "FROM ranked ORDER BY vec_id",
)
def corpus_prune_semdedup(t: Tables) -> DataFrame:
    """Prototypicality pruning: within each label, flag the PRUNE_FRAC
    most-prototypical vectors (highest cosine to their own class
    centroid) as redundant — keep the hard/diverse remainder. This is
    the cluster-then-prune recipe of SemDeDup/SSL-prototypes with the
    clustering supplied by the ``label`` column.

    Plan: k-row centroid table broadcast against one corpus scan; the
    only corpus-sized shuffle is the per-label rank window. At extreme
    scale, replace the rank with a per-label cosine THRESHOLD
    (approx-quantile over a sample) and this becomes a pure broadcast
    filter — same keep semantics, zero shuffle."""
    v = t.embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = label_centroids(t.embeddings)
    scored = (
        spread(v, "vec_id")
        .alias("a")
        .join(F.broadcast(cent.alias("c")), "label")
        .select(
            "vec_id",
            "label",
            (
                dot_expr("v", "cv", EMB_DIM)
                / (norm_expr("v", EMB_DIM) * norm_expr("cv", EMB_DIM))
            ).alias("cos_centroid"),
        )
    )
    w = Window.partitionBy("label")
    rn = F.row_number().over(w.orderBy(F.desc("cos_centroid"), F.asc("vec_id")))
    n = F.count(F.lit(1)).over(w)
    return (
        scored.withColumn("rn", rn)
        .withColumn("n", n)
        .select(
            "vec_id",
            "label",
            "cos_centroid",
            (F.col("rn") > F.floor(F.lit(PRUNE_FRAC) * F.col("n"))).alias("keep"),
        )
        .orderBy("vec_id")
    )


@register(
    "sim_centroid_classify",
    _CENT_CTE
    + ", scored AS (SELECT a.vec_id, a.label, c.label AS pred_label, "
    f"{_COS_CENT} AS cos FROM v a CROSS JOIN cent c), "
    "pred AS (SELECT vec_id, label, pred_label FROM ("
    "SELECT vec_id, label, pred_label, row_number() OVER ("
    "PARTITION BY vec_id ORDER BY cos DESC, pred_label) AS rn FROM scored) "
    "WHERE rn = 1) "
    "SELECT label, pred_label, count(*) AS n FROM pred "
    "GROUP BY label, pred_label ORDER BY label, pred_label",
)
def sim_centroid_classify(t: Tables) -> DataFrame:
    """Nearest-class-mean classifier over the label centroids, reduced
    to a confusion matrix (true label × predicted label × count). The
    quality-screening workhorse for labeled/clustered corpora — e.g.
    routing new documents to the pretraining mix bucket whose centroid
    they are closest to. Centroids broadcast (k rows); argmax is a
    per-vector window; the confusion reduction shuffles k² rows."""
    v = t.embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = label_centroids(t.embeddings).withColumnRenamed("label", "pred_label")
    scored = (
        spread(v, "vec_id")
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "label",
            "pred_label",
            (
                dot_expr("v", "cv", EMB_DIM)
                / (norm_expr("v", EMB_DIM) * norm_expr("cv", EMB_DIM))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("pred_label"))
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("label", "pred_label")
    )
    return (
        pred.groupBy("label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "pred_label")
    )


#: Power-iteration rounds for the top principal component (unrolled in
#: both engines, like kmeans_fit / PageRank).
PI_ITERS = 2


def _pi_fold(expr_list: str) -> str:
    """DuckDB left fold 0.0 + x1 + x2 ... — the IEEE twin of Spark's
    ``F.aggregate(..., 0.0, +)``."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {expr_list}), "
        "(acc, x) -> acc + x)"
    )


def _pi_round_sql(k: int, prev: str, cent: str = "cent", pfx: str = "") -> str:
    return (
        f"{pfx}s{k} AS (SELECT vec_id, c, "
        + _pi_fold(f"list_transform(range(1, {EMB_DIM + 1}), j -> c[j] * vk[j])")
        + f" AS s FROM {cent} CROSS JOIN {prev}), "
        f"{pfx}d{k} AS (SELECT vec_id, CAST(r.range AS INT) AS pos, "
        f"c[CAST(r.range AS INT) + 1] * s AS t FROM {pfx}s{k} CROSS JOIN range({EMB_DIM}) r), "
        f"{pfx}u{k} AS (SELECT pos, " + _pi_fold("list(t ORDER BY vec_id)")
        + f" AS u FROM {pfx}d{k} GROUP BY pos), "
        f"{pfx}n{k} AS (SELECT sqrt(" + _pi_fold("list_transform(uarr, x -> x * x)")
        + f") AS lam, uarr FROM (SELECT list(u ORDER BY pos) AS uarr FROM {pfx}u{k})), "
        f"{pfx}v{k} AS (SELECT list_transform(uarr, x -> x / lam) AS vk, lam FROM {pfx}n{k})"
    )


_PI_PREFIX = (
    "WITH v AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
    f"dims AS (SELECT vec_id, CAST(r.range AS INT) AS pos, "
    f"v[CAST(r.range AS INT) + 1] AS val FROM v CROSS JOIN range({EMB_DIM}) r), "
    "mn AS (SELECT pos, " + _pi_fold("list(val ORDER BY vec_id)")
    + " / count(*) AS m FROM dims GROUP BY pos), "
    "marr AS (SELECT list(m ORDER BY pos) AS m FROM mn), "
    f"cent AS (SELECT vec_id, list_transform(range(1, {EMB_DIM + 1}), "
    "j -> v[j] - m[j]) AS c FROM v CROSS JOIN marr), "
    "v0 AS (SELECT list_prepend(CAST(1 AS DOUBLE), "
    f"list_transform(range(1, {EMB_DIM}), j -> CAST(0 AS DOUBLE))) AS vk), "
)

_PI_SQL = (
    _PI_PREFIX
    + ", ".join(_pi_round_sql(k, f"v{k - 1}") for k in range(1, PI_ITERS + 1))
    + f" SELECT CAST(r.range AS BIGINT) AS pos, "
    f"vk[CAST(r.range AS INT) + 1] AS loading, lam AS eigenvalue "
    f"FROM v{PI_ITERS} CROSS JOIN range({EMB_DIM}) r ORDER BY pos"
)

_PI2_SQL = (
    _PI_PREFIX
    + ", ".join(_pi_round_sql(k, f"v{k - 1}") for k in range(1, PI_ITERS + 1))
    + ", proj AS (SELECT vec_id, c, vk, "
    + _pi_fold(f"list_transform(range(1, {EMB_DIM + 1}), j -> c[j] * vk[j])")
    + f" AS pr FROM cent CROSS JOIN v{PI_ITERS}), "
    f"cent2 AS (SELECT vec_id, list_transform(range(1, {EMB_DIM + 1}), "
    "j -> c[j] - pr * vk[j]) AS c FROM proj), "
    + ", ".join(
        _pi_round_sql(k, "v0" if k == 1 else f"bv{k - 1}", cent="cent2", pfx="b")
        for k in range(1, PI_ITERS + 1)
    )
    + f" SELECT CAST(1 AS BIGINT) AS component, CAST(r.range AS BIGINT) AS pos, "
    f"vk[CAST(r.range AS INT) + 1] AS loading, lam AS eigenvalue "
    f"FROM v{PI_ITERS} CROSS JOIN range({EMB_DIM}) r "
    "UNION ALL "
    f"SELECT CAST(2 AS BIGINT), CAST(r.range AS BIGINT), "
    f"vk[CAST(r.range AS INT) + 1], lam "
    f"FROM bv{PI_ITERS} CROSS JOIN range({EMB_DIM}) r "
    "ORDER BY component, pos"
)


@register("emb_top_component", _PI_SQL)
def emb_top_component(t: Tables) -> DataFrame:
    """Top principal component of the (centered) embedding matrix by
    PI_ITERS unrolled POWER-ITERATION rounds — the spectral member of
    the iterative family (kmeans fits centroids, PageRank fits ranks,
    this fits the dominant eigenvector): per round v ← normalize(XᵀXv),
    computed as two linear passes (s = Xv per row, u = Xᵀs per
    dimension) so the d×d covariance is never materialized — the
    standard trick that makes PCA feasible when d² won't fit but two
    matrix-vector passes will. Every cross-row accumulation is an
    ordered fold (rows by vec_id, dims by pos) and elementwise steps
    are zip_with twins, so the eigenvector AND the eigenvalue estimate
    (||XᵀXv||, unnormalized by n) are bitwise-oracled despite ~260k
    float accumulations. Init v0 = e_0 — deterministic, generic for
    this fixture.

    Scale shape per round: one broadcast of the 64-vector, one narrow
    per-row dot, one (pos)-keyed fold shuffle of n·d terms — linear in
    the corpus; at petabyte rows switch the folds to double partials
    and drop the oracle, not the operator (the module-head rule)."""
    vk = _power_top(_centered_embeddings(t))
    return (
        vk.select(F.posexplode("vk").alias("pos", "loading"), "lam")
        .select(
            F.col("pos").cast("bigint").alias("pos"),
            "loading",
            F.col("lam").alias("eigenvalue"),
        )
        .orderBy("pos")
    )


def _centered_embeddings(t: Tables) -> DataFrame:
    """Mean-centered embedding rows (vec_id, c), ordered-fold means,
    eager-checkpointed — the shared input of the power-iteration keys."""
    v = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dims = v.select("vec_id", F.posexplode("v").alias("pos", "val"))
    ordered_rows = F.transform(
        F.array_sort(F.collect_list(F.struct("vec_id", "val"))),
        lambda s: s.getField("val"),
    )
    mn = dims.groupBy("pos").agg(
        (
            F.aggregate(ordered_rows, F.lit(0.0), lambda acc, x: acc + x)
            / F.count(F.lit(1))
        ).alias("m")
    )
    marr = mn.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s.getField("m"),
        ).alias("m")
    )
    cent = v.crossJoin(F.broadcast(marr)).select(
        "vec_id", F.zip_with("v", "m", lambda a, b: a - b).alias("c")
    )
    return cent.localCheckpoint(eager=True)  # reused by every round


def _power_top(cent: DataFrame) -> DataFrame:
    """PI_ITERS power-iteration rounds over (vec_id, c): returns the
    1-row (vk, lam) frame. Every accumulation is an ordered fold."""
    vk = cent.sparkSession.range(1).select(
        F.array(
            F.lit(1.0), *[F.lit(0.0) for _ in range(EMB_DIM - 1)]
        ).alias("vk"),
        F.lit(0.0).alias("lam"),
    )
    for _ in range(PI_ITERS):
        s = cent.crossJoin(F.broadcast(vk.select("vk"))).select(
            "vec_id",
            "c",
            F.aggregate(
                F.zip_with("c", "vk", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s"),
        )
        d = s.select("vec_id", F.posexplode("c").alias("pos", "cv")).join(
            s.select("vec_id", "s"), "vec_id"
        ).select("vec_id", "pos", (F.col("cv") * F.col("s")).alias("t"))
        ordered_t = F.transform(
            F.array_sort(F.collect_list(F.struct("vec_id", "t"))),
            lambda st: st.getField("t"),
        )
        u = d.groupBy("pos").agg(
            F.aggregate(ordered_t, F.lit(0.0), lambda acc, x: acc + x).alias("u")
        )
        uarr = u.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "u"))),
                lambda st: st.getField("u"),
            ).alias("uarr")
        )
        lam = F.sqrt(
            F.aggregate(
                F.transform("uarr", lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        vk = uarr.select(
            F.transform("uarr", lambda x: x / lam).alias("vk"), lam.alias("lam")
        ).localCheckpoint(eager=True)
    return vk


@register("emb_top2_components", _PI2_SQL)
def emb_top2_components(t: Tables) -> DataFrame:
    """Top TWO principal components by power iteration + Hotelling
    DEFLATION — the step that turns the single-eigenvector operator
    into a PCA: after v1 converges, every centered row is projected out
    (c ← c − (c·v1)·v1) and the identical unrolled iteration runs on
    the deflated matrix, whose dominant eigenvector is the ORIGINAL
    second component. Both components + eigenvalue estimates in one
    result, orthogonality pytest-asserted (|v1·v2| ≤ 1e-12 at the
    iteration budget).

    Exactness: deflation is one more ordered-fold dot (c·v1) and a
    zip_with subtraction per row — the same pinned shapes as the
    iteration itself, so both components are bitwise-oracled end to
    end. Scale: deflation is a narrow map over one broadcast 64-vector
    (no extra shuffle); the d-th component costs exactly d-1 deflation
    passes plus the same two linear passes per round — never a d×d
    covariance."""
    cent = _centered_embeddings(t)
    v1 = _power_top(cent)
    pr = F.aggregate(
        F.zip_with("c", "vk", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    proj = cent.crossJoin(F.broadcast(v1.select("vk"))).select(
        "vec_id", "c", "vk", pr.alias("pr")
    )
    cent2 = proj.select(
        "vec_id",
        F.zip_with("c", "vk", lambda a, b: a - F.col("pr") * b).alias("c"),
    ).localCheckpoint(eager=True)
    v2 = _power_top(cent2)

    def rows(vk: DataFrame, comp: int) -> DataFrame:
        return vk.select(F.posexplode("vk").alias("pos", "loading"), "lam").select(
            F.lit(comp).cast("bigint").alias("component"),
            F.col("pos").cast("bigint").alias("pos"),
            "loading",
            F.col("lam").alias("eigenvalue"),
        )

    return rows(v1, 1).unionAll(rows(v2, 2)).orderBy("component", "pos")
