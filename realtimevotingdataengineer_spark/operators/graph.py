"""Graph analytics over the embedding k-NN graph.

The corpus-curation stack already builds two graph structures: the
near-dup pair graph (dedup_clusters runs pointer-jumping connected
components over it) and the k-NN adjacency (sim_knn_graph). This module
adds the iterative-algorithm family on top: PageRank (the centrality
score used to pick representative documents from a semantic-similarity
graph) and synchronous label propagation (community detection) over the
k-NN edges.

Scale design: each iteration is one join (edges ⨝ ranks, both keyed by
src_id — co-partitionable across iterations) plus one aggregation keyed
by dst_id. Iteration count is fixed and small; at 100 TB each iteration
would checkpoint its rank table and the edges relation would be a
bucketed materialized table so no iteration re-shuffles it.

Float exactness: per-destination contribution sums are ORDERED left
folds over the src_id-sorted contribution list (the pruning-family
trick) — partition-invariant AND bitwise-equal to the DuckDB oracle's
``list_reduce(list_prepend(0.0, list(c ORDER BY src_id)))``. At
petabyte in-degrees switch to double partials and drop the oracle, not
the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import Tables
from .similarity import _KNN_EDGES_CTES, sim_knn_graph

#: Damping factor and teleport base, written as separate literals in
#: BOTH engines (never derive one from the other: 1 - 0.85 is
#: 0.15000000000000002 in binary double, not 0.15).
PR_DAMP = 0.85
PR_BASE = 0.15
#: Unrolled iteration count (the oracle unrolls the same two rounds).
PR_ITERS = 2


def _iter_sql(i: int, prev: str) -> str:
    """One PageRank round as three CTEs: contributions, ordered-fold
    sums, new ranks (left join keeps rank mass on in-degree-0 nodes)."""
    return (
        f"c{i} AS (SELECT e.dst_id, e.src_id, r.r / d.deg AS c "
        f"FROM knn e JOIN deg d ON e.src_id = d.src_id "
        f"JOIN {prev} r ON r.vec_id = e.src_id), "
        f"s{i} AS (SELECT dst_id, "
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), list(c ORDER BY src_id)), "
        f"(acc, x) -> acc + x) AS s FROM c{i} GROUP BY dst_id), "
        f"r{i} AS (SELECT n.vec_id, {PR_BASE} + {PR_DAMP} * coalesce(s.s, CAST(0 AS DOUBLE)) AS r "
        f"FROM nodes n LEFT JOIN s{i} s ON s.dst_id = n.vec_id)"
    )


_PAGERANK_SQL = (
    _KNN_EDGES_CTES + ", "
    "deg AS (SELECT src_id, count(*) AS deg FROM knn GROUP BY src_id), "
    "nodes AS (SELECT vec_id FROM embeddings), "
    "r0 AS (SELECT vec_id, CAST(1 AS DOUBLE) AS r FROM nodes), "
    + ", ".join(_iter_sql(i, f"r{i - 1}") for i in range(1, PR_ITERS + 1))
    + f" SELECT vec_id, r AS pagerank FROM r{PR_ITERS} ORDER BY vec_id"
)


@register("graph_pagerank_knn", _PAGERANK_SQL)
def graph_pagerank_knn(t: Tables) -> DataFrame:
    """PageRank (damping 0.85, PR_ITERS unrolled rounds, uniform init
    r=1) over the bucket-local k-NN graph — the centrality score that
    ranks each document's prototypicality inside its semantic
    neighborhood, consumed by representative-sampling / pruning
    pipelines downstream of sim_knn_graph.

    Per round: one edges⨝deg⨝ranks join keyed on src_id, one
    ordered-fold aggregation keyed on dst_id, one left join back to the
    node set so in-degree-0 nodes keep the teleport mass. The edge
    relation is localCheckpointed once and reused by every round.

    Semantics note (deliberate deviations from canonical PageRank, for
    downstream consumers): the teleport term is the un-normalized 0.15
    (not (1-d)/N), init is r=1 (not 1/N), and rank mass flowing into
    dangling nodes is dropped rather than redistributed — so ranks are
    a relative prototypicality ORDERING, not a probability
    distribution; sum(rank) != N."""
    edges = sim_knn_graph(t).select("src_id", "dst_id").localCheckpoint(eager=True)
    deg = edges.groupBy("src_id").agg(F.count(F.lit(1)).alias("deg"))
    nodes = t.embeddings.select("vec_id")
    rank = nodes.select("vec_id", F.lit(1.0).cast("double").alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(deg, "src_id")
            .join(rank.withColumnRenamed("vec_id", "src_id"), "src_id")
            .select("dst_id", "src_id", (F.col("r") / F.col("deg")).alias("c"))
        )
        ordered = F.transform(
            F.array_sort(F.collect_list(F.struct("src_id", "c"))),
            lambda s: s.getField("c"),
        )
        summed = contrib.groupBy("dst_id").agg(
            F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x).alias("s")
        )
        rank = (
            nodes.join(summed, nodes.vec_id == summed.dst_id, "left")
            .select(
                "vec_id",
                (
                    F.lit(PR_BASE) + F.lit(PR_DAMP) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("r"),
            )
            # eager: round i+1's contributions join THIS round's ranks —
            # without materialization each round re-expands the whole
            # prior-round subtree (the sim_mmr_rerank disease; plan
            # budget pinned by tests/test_plans.py).
            .localCheckpoint(eager=True)
        )
    return rank.select("vec_id", F.col("r").alias("pagerank")).orderBy("vec_id")


#: Label-propagation rounds (unrolled in both engines, like PageRank).
LPA_ITERS = 2


def _lpa_iter_sql(i: int, prev: str) -> str:
    """One LPA round: neighbor-label histogram, then argmax with the
    deterministic (count DESC, label ASC) tie-break, isolated nodes
    keeping their previous label."""
    return (
        f"n{i} AS (SELECT u.a AS vec_id, l.label, count(*) AS c "
        f"FROM und u JOIN {prev} l ON l.vec_id = u.b GROUP BY u.a, l.label), "
        f"p{i} AS (SELECT vec_id, label FROM ("
        "SELECT vec_id, label, row_number() OVER ("
        f"PARTITION BY vec_id ORDER BY c DESC, label) AS rn FROM n{i}) WHERE rn = 1), "
        f"l{i} AS (SELECT e.vec_id, coalesce(p.label, prev.label) AS label "
        f"FROM embeddings e LEFT JOIN p{i} p ON p.vec_id = e.vec_id "
        f"JOIN {prev} prev ON prev.vec_id = e.vec_id)"
    )


_LPA_SQL = (
    _KNN_EDGES_CTES + ", "
    "und AS MATERIALIZED (SELECT src_id AS a, dst_id AS b FROM knn "
    "UNION SELECT dst_id, src_id FROM knn), "
    "l0 AS (SELECT vec_id, vec_id AS label FROM embeddings), "
    + ", ".join(_lpa_iter_sql(i, f"l{i - 1}") for i in range(1, LPA_ITERS + 1))
    + f" SELECT vec_id, label FROM l{LPA_ITERS} ORDER BY vec_id"
)


@register("graph_label_propagation", _LPA_SQL)
def graph_label_propagation(t: Tables) -> DataFrame:
    """Community detection by synchronous label propagation over the
    SYMMETRIZED k-NN graph (LPA_ITERS unrolled rounds, labels init to
    vec_id): each round every node adopts the most frequent label among
    its neighbors, ties broken toward the smallest label so the result
    is a pure function of the graph — no randomness, no rank-order
    dependence (all-integer arithmetic, exact oracle).

    Scale shape per round: one edges⨝labels join keyed on the neighbor
    id, one (node, label) count aggregation, one argmax window per node
    — the same co-partitionable join/agg pair as PageRank, with the
    histogram shuffle bounded by fanout·n. The pointer-jumping connected
    components in dedup_clusters finds exact components; LPA finds
    denser-than-neighborhood communities on the same adjacency."""
    edges = sim_knn_graph(t).select("src_id", "dst_id").localCheckpoint(eager=True)
    und = (
        edges.select(F.col("src_id").alias("a"), F.col("dst_id").alias("b"))
        .union(edges.select(F.col("dst_id").alias("a"), F.col("src_id").alias("b")))
        .distinct()
    )
    nodes = t.embeddings.select("vec_id")
    labels = nodes.select("vec_id", F.col("vec_id").alias("label"))
    for _ in range(LPA_ITERS):
        hist = (
            und.join(labels.select(F.col("vec_id").alias("b"), "label"), "b")
            .groupBy(F.col("a").alias("vec_id"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("c"), F.asc("label"))
        top = (
            hist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(top, "vec_id", "left")
            .select("vec_id", F.coalesce("new_label", "label").alias("label"))
            # eager: each round reads the prior round's labels — keep the
            # per-round plan flat instead of depth-compounding.
            .localCheckpoint(eager=True)
        )
    return labels.orderBy("vec_id")


_CLUSTERING_SQL = (
    _KNN_EDGES_CTES + ", "
    "und AS MATERIALIZED (SELECT src_id AS a, dst_id AS b FROM knn "
    "UNION SELECT dst_id, src_id FROM knn), "
    "canon AS MATERIALIZED (SELECT a, b FROM und WHERE a < b), "
    "deg AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY a), "
    "wedge AS (SELECT u1.a AS v, u1.b AS x, u2.b AS y "
    "FROM und u1 JOIN und u2 ON u2.a = u1.a AND u1.b < u2.b), "
    "tri AS (SELECT w.v, CAST(count(*) AS BIGINT) AS n_tri FROM wedge w "
    "JOIN canon c ON c.a = w.x AND c.b = w.y GROUP BY w.v) "
    "SELECT d.v AS vec_id, d.deg, CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_triangles, "
    "CASE WHEN d.deg >= 2 THEN 2.0 * CAST(coalesce(t.n_tri, 0) AS BIGINT) "
    "/ (d.deg * (d.deg - 1)) ELSE 0.0 END AS clustering_coeff "
    "FROM deg d LEFT JOIN tri t ON t.v = d.v ORDER BY vec_id"
)


@register("graph_clustering_coeff", _CLUSTERING_SQL)
def graph_clustering_coeff(t: Tables) -> DataFrame:
    """Local clustering coefficient per node of the symmetrized k-NN
    graph — triangles over wedges, the standard cohesion score that
    separates vectors inside tight semantic clusters (coeff → 1) from
    hub-like or boundary vectors (coeff → 0).

    Triangle counting is the classic wedge-join: und ⨝ und generates
    each node's neighbor pairs (Σ deg²/2 wedges — bounded here because
    kNN fanout is a constant ≤ 2·KNN_K), then one join against the
    canonical a<b edge set closes them. All-integer counts; the
    coefficient is one double division — exact oracle."""
    edges = sim_knn_graph(t).select("src_id", "dst_id").localCheckpoint(eager=True)
    und = (
        edges.select(F.col("src_id").alias("a"), F.col("dst_id").alias("b"))
        .union(edges.select(F.col("dst_id").alias("a"), F.col("src_id").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)  # reused: canon, deg, both wedge sides
    )
    canon = und.filter(F.col("a") < F.col("b")).select(
        F.col("a").alias("x"), F.col("b").alias("y")
    )
    deg = und.groupBy(F.col("a").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    u1, u2 = und.alias("u1"), und.alias("u2")
    wedge = u1.join(
        u2, (F.col("u2.a") == F.col("u1.a")) & (F.col("u1.b") < F.col("u2.b"))
    ).select(F.col("u1.a").alias("v"), F.col("u1.b").alias("x"), F.col("u2.b").alias("y"))
    tri = wedge.join(canon, ["x", "y"]).groupBy("v").agg(F.count(F.lit(1)).alias("n_tri"))
    n_tri = F.coalesce(F.col("n_tri"), F.lit(0).cast("bigint"))
    coeff = F.when(
        F.col("deg") >= 2,
        F.lit(2.0) * n_tri / (F.col("deg") * (F.col("deg") - 1)),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(tri, "v", "left")
        .select(
            F.col("v").alias("vec_id"),
            "deg",
            n_tri.alias("n_triangles"),
            coeff.alias("clustering_coeff"),
        )
        .orderBy("vec_id")
    )


#: BFS frontier rounds (unrolled; distances beyond this are NULL).
BFS_ITERS = 3
# The BFS seed is DERIVED as min(vec_id) in both engines (a scalar
# subquery in the oracle, a 1-row broadcast in Spark) rather than a
# hard-coded id: a fixture id-range drift would otherwise move both
# engines to the same wrong seed and the oracle couldn't see it
# (round-4 ADVICE).


def _bfs_iter_sql(i: int) -> str:
    """One BFS relaxation round, MATERIALIZED: dist[v] = min(dist[v],
    min over in-neighbors (dist[u] + 1)) — synchronous Bellman-Ford on
    unit weights. Each round reads the prior one TWICE, so a plain CTE
    chain inlines 2^rounds-fold in DuckDB (measured: 15.7s → 1.1s at
    sf0.01 for 3 rounds once pinned; the round-7 BPE lesson)."""
    return (
        f"d{i} AS MATERIALIZED (SELECT n.vec_id, least(coalesce(p.dist, {10**9}), "
        f"coalesce(m.reach, {10**9})) AS dist "
        f"FROM nodes n LEFT JOIN d{i - 1} p ON p.vec_id = n.vec_id "
        "LEFT JOIN (SELECT u.b AS vec_id, min(pd.dist) + 1 AS reach "
        f"FROM und u JOIN d{i - 1} pd ON pd.vec_id = u.a "
        f"WHERE pd.dist < {10**9} GROUP BY u.b) m ON m.vec_id = n.vec_id)"
    )


_BFS_SQL = (
    _KNN_EDGES_CTES + ", "
    "und AS MATERIALIZED (SELECT src_id AS a, dst_id AS b FROM knn "
    "UNION SELECT dst_id, src_id FROM knn), "
    "nodes AS MATERIALIZED (SELECT vec_id FROM embeddings), "
    "d0 AS MATERIALIZED (SELECT vec_id, "
    "CASE WHEN vec_id = (SELECT min(vec_id) FROM embeddings) "
    f"THEN 0 ELSE {10**9} END AS dist FROM nodes), "
    + ", ".join(_bfs_iter_sql(i) for i in range(1, BFS_ITERS + 1))
    + " SELECT vec_id, CAST(dist AS BIGINT) AS dist "
    f"FROM d{BFS_ITERS} WHERE dist < {10**9} ORDER BY vec_id"
)


@register("graph_bfs_distance", _BFS_SQL)
def graph_bfs_distance(t: Tables) -> DataFrame:
    """Unweighted shortest-path distances from the seed vector over the
    symmetrized k-NN graph, BFS_ITERS synchronous relaxation rounds
    (Bellman-Ford on unit weights — the Pregel iteration shape): each
    round every node takes the min of its current distance and
    1 + min(neighbor distances). Nodes still unreached after the last
    round are omitted. All-integer, exact oracle.

    Scale shape per round: one edges⨝distances join + one min-agg keyed
    by the neighbor — the identical co-partitionable pair as
    PageRank/LPA; each round's dist is eagerly checkpointed so the plan
    stays flat per round (without it the plan doubles per iteration —
    the prior dist is read twice). See graph_bfs_distance_deep for the
    frontier-sparse formulation at real iteration depths."""
    INF = 10**9
    edges = sim_knn_graph(t).select("src_id", "dst_id").localCheckpoint(eager=True)
    und = (
        edges.select(F.col("src_id").alias("a"), F.col("dst_id").alias("b"))
        .union(edges.select(F.col("dst_id").alias("a"), F.col("src_id").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round
    )
    nodes = t.embeddings.select("vec_id")
    seed = t.embeddings.agg(F.min("vec_id").alias("seed"))
    dist = nodes.crossJoin(F.broadcast(seed)).select(
        "vec_id",
        F.when(F.col("vec_id") == F.col("seed"), F.lit(0))
        .otherwise(F.lit(INF))
        .alias("dist"),
    )
    for _ in range(BFS_ITERS):
        reach = (
            und.join(
                dist.select(F.col("vec_id").alias("a"), F.col("dist").alias("pd")), "a"
            )
            .filter(F.col("pd") < INF)
            .groupBy(F.col("b").alias("vec_id"))
            .agg((F.min("pd") + F.lit(1)).alias("reach"))
        )
        dist = (
            nodes.join(dist, "vec_id", "left")
            .join(reach, "vec_id", "left")
            .select(
                "vec_id",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(INF)),
                    F.coalesce(F.col("reach"), F.lit(INF)),
                ).alias("dist"),
            )
            # eager: each round reads the prior dist TWICE (reach + the
            # outer join), so the un-materialized plan DOUBLES per round
            # (measured round 8: 30 scans / 26 exchanges / 13 SMJ at
            # just BFS_ITERS=3). Checkpointing makes depth linear-cost.
            .localCheckpoint(eager=True)
        )
    return (
        dist.filter(F.col("dist") < INF)
        .select("vec_id", F.col("dist").cast("bigint").alias("dist"))
        .orderBy("vec_id")
    )


#: Deep-BFS frontier rounds — a realistic convergence depth, runnable
#: only because the per-round state is checkpointed and the per-round
#: join is |frontier|-sized (the textbook Pregel optimization).
DEEP_BFS_ITERS = 8


# The deep oracle stays DENSE Bellman-Ford (same per-round SQL as the
# 3-round key, 8 rounds) — equality with the sparse frontier engine
# formulation IS the check that the frontier rewrite preserves BFS
# semantics.
_BFS_DEEP_SQL = (
    _KNN_EDGES_CTES + ", "
    "und AS MATERIALIZED (SELECT src_id AS a, dst_id AS b FROM knn "
    "UNION SELECT dst_id, src_id FROM knn), "
    "nodes AS MATERIALIZED (SELECT vec_id FROM embeddings), "
    "d0 AS MATERIALIZED (SELECT vec_id, "
    "CASE WHEN vec_id = (SELECT min(vec_id) FROM embeddings) "
    f"THEN 0 ELSE {10**9} END AS dist FROM nodes), "
    + ", ".join(_bfs_iter_sql(i) for i in range(1, DEEP_BFS_ITERS + 1))
    + " SELECT vec_id, CAST(dist AS BIGINT) AS dist "
    f"FROM d{DEEP_BFS_ITERS} WHERE dist < {10**9} ORDER BY vec_id"
)


@register("graph_bfs_distance_deep", _BFS_DEEP_SQL)
def graph_bfs_distance_deep(t: Tables) -> DataFrame:
    """Frontier-sparse BFS to DEEP_BFS_ITERS hops from the min-vec_id
    seed over the symmetrized k-NN graph — the at-depth formulation of
    graph_bfs_distance. Instead of carrying a dense |nodes|-sized dist
    relation through every round (fine at 3 hops, wasteful at 8+), the
    state is the SPARSE reached set plus the current frontier: each
    round joins edges against only the nodes discovered last round, so
    per-round shuffle volume is |frontier|·fanout, not |nodes|·fanout,
    and rounds past the graph's diameter are (empty-frontier) no-ops.

    Plan hygiene at depth: the frontier is eagerly checkpointed per
    round, and the reached set is the flat UNION of those checkpointed
    frontiers (round 15: re-checkpointing the union each round was one
    redundant job per round — every branch is already an ExistingRDD
    scan), so plan size is linear-in-depth-but-tiny per round and total
    work is linear in depth — the property the dense 3-round key's
    budget test pins. The early-exit probe is a CollectMetrics
    observation completed by the frontier's own checkpoint job
    (round 16) — no probe job at all.

    The oracle is the DENSE Bellman-Ford unrolled 8 rounds (CTEs
    materialized — DuckDB would otherwise inline the
    read-twice-per-round chain 2^8-fold): dense relaxation and sparse
    frontier expansion provably compute the same level sets on unit
    weights, and the hash check enforces exactly that equivalence."""
    edges = sim_knn_graph(t).select("src_id", "dst_id").localCheckpoint(eager=True)
    und = (
        edges.select(F.col("src_id").alias("a"), F.col("dst_id").alias("b"))
        .union(edges.select(F.col("dst_id").alias("a"), F.col("src_id").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round
    )
    # Sparse seed: the 1-row min-vec_id aggregate (derived, not
    # hard-coded — the round-4 oracle-blindness rule).
    reached = (
        t.embeddings.agg(F.min("vec_id").alias("vec_id"))
        .select("vec_id", F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = reached
    frontier_empty = frontier.isEmpty()
    for i in range(1, DEEP_BFS_ITERS + 1):
        if frontier_empty:  # past the diameter: remaining rounds no-op
            break
        # |frontier|-sized probe side; und is the big fixed side. The
        # neighbor set is distinct'd BEFORE the anti-join so the
        # anti-join probe is ≤|new frontier| rows, not frontier·fanout.
        neigh = (
            und.join(frontier.select(F.col("vec_id").alias("a")), "a")
            .select(F.col("b").alias("vec_id"))
            .distinct()
        )
        # round 16: the empty-frontier probe rides inside the checkpoint
        # job as a CollectMetrics observation (one job per round, no
        # separate isEmpty job over the materialized frontier)
        from pyspark.sql import Observation

        obs = Observation()
        frontier = (
            neigh.join(reached, "vec_id", "left_anti")
            .select("vec_id", F.lit(i).alias("dist"))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        frontier_empty = obs.get["n"] == 0
        # round 15: reached is a UNION of the per-round checkpointed
        # frontiers — already a flat, constant-depth plan (each branch
        # is an ExistingRDD scan), so re-checkpointing the union each
        # round bought nothing and cost one extra job + materialization
        # per round (8 of the ~20 construct jobs of this key at sf0.1).
        # The anti-join probe side stays ≤|reached| rows either way.
        reached = reached.unionByName(frontier)
    return (
        reached.select("vec_id", F.col("dist").cast("bigint").alias("dist"))
        .orderBy("vec_id")
    )


#: Link-prediction report size.
LINKPRED_TOP = 20

_LINKPRED_SQL = (
    _KNN_EDGES_CTES + ", "
    "und AS MATERIALIZED (SELECT src_id AS a, dst_id AS b FROM knn "
    "UNION SELECT dst_id, src_id FROM knn), "
    "canon AS MATERIALIZED (SELECT a, b FROM und WHERE a < b), "
    "deg AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY a), "
    "common AS (SELECT u1.b AS x, u2.b AS y, CAST(count(*) AS BIGINT) AS n_common "
    "FROM und u1 JOIN und u2 ON u2.a = u1.a AND u1.b < u2.b GROUP BY u1.b, u2.b), "
    "cand AS (SELECT x, y, n_common FROM common WHERE NOT EXISTS "
    "(SELECT 1 FROM canon c WHERE c.a = x AND c.b = y)), "
    "scored AS (SELECT x AS vec_a, y AS vec_b, n_common, "
    "CAST(n_common AS DOUBLE) / (dx.deg + dy.deg - n_common) AS jaccard "
    "FROM cand JOIN deg dx ON dx.v = x JOIN deg dy ON dy.v = y) "
    "SELECT vec_a, vec_b, n_common, jaccard FROM scored "
    f"ORDER BY jaccard DESC, vec_a, vec_b LIMIT {LINKPRED_TOP}"
)


@register("graph_link_prediction", _LINKPRED_SQL)
def graph_link_prediction(t: Tables) -> DataFrame:
    """Common-neighbor link prediction over the symmetrized k-NN graph:
    the top non-adjacent pairs by neighbor-set Jaccard
    (|N(a)∩N(b)| / |N(a)∪N(b)|) — the classic graph-completion score
    (two docs whose neighborhoods already overlap are near-dup/related
    candidates the kNN fanout missed). Candidate pairs come from the
    SAME wedge join triangle counting uses (u ⨝ u on the shared center,
    volume Σ deg² bounded by the constant kNN fanout), minus existing
    edges via anti-join; scores are one double division of exact
    integer counts; the report is a TakeOrdered top-20 with id
    tie-breaks."""
    edges = sim_knn_graph(t).select("src_id", "dst_id").localCheckpoint(eager=True)
    und = (
        edges.select(F.col("src_id").alias("a"), F.col("dst_id").alias("b"))
        .union(edges.select(F.col("dst_id").alias("a"), F.col("src_id").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)  # reused: deg, both wedge sides, anti-join
    )
    canon = und.filter(F.col("a") < F.col("b"))
    deg = und.groupBy(F.col("a").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    u1, u2 = und.alias("u1"), und.alias("u2")
    common = (
        u1.join(
            u2,
            (F.col("u2.a") == F.col("u1.a")) & (F.col("u1.b") < F.col("u2.b")),
        )
        .groupBy(F.col("u1.b").alias("x"), F.col("u2.b").alias("y"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cand = common.join(
        canon,
        (F.col("x") == F.col("a")) & (F.col("y") == F.col("b")),
        "left_anti",
    )
    dx = deg.select(F.col("v").alias("x"), F.col("deg").alias("deg_x"))
    dy = deg.select(F.col("v").alias("y"), F.col("deg").alias("deg_y"))
    jac = F.col("n_common").cast("double") / (
        F.col("deg_x") + F.col("deg_y") - F.col("n_common")
    )
    return (
        # deg is |nodes|-proportional — no forced broadcast hint (the
        # round-6 scale-safety rule): the threshold auto-broadcasts it
        # at test SF and the join degrades to a node-id shuffle at scale.
        cand.join(dx, "x")
        .join(dy, "y")
        .select(
            F.col("x").alias("vec_a"),
            F.col("y").alias("vec_b"),
            "n_common",
            jac.alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "vec_a", "vec_b")
        .limit(LINKPRED_TOP)
    )
