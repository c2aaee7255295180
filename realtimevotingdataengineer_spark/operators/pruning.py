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
