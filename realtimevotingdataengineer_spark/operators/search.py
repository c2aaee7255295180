"""Keyword search over the ``documents`` table: BM25 ranking on an
inverted-index formulation, plus fuzzy (edit-distance) dedup.

The 100 TB shape: the (doc, term, tf) inverted index is THE search
structure — built once as a term-partitioned table, it turns a keyword
query into a broadcast probe of the handful of posting lists it names,
never a corpus scan. Corpus stats are 1 broadcast row; document
frequency is never materialized vocabulary-wide — BM25 computes df only
for the bounded query-term set (semi-join before the aggregation), and
TF-IDF derives it as a term-partitioned window count on the posting
list (|vocab| grows unboundedly with corpus size under Heaps' law, so a
full-vocabulary broadcast is a 100 TB job-killer). The only
corpus-sized shuffle is the one groupBy that builds the index.

Exactness: BM25 is a float statistic, oracled bitwise via the repo's
pinning discipline — integer tf/df/dl everywhere, the idf's `ln` (the
one libm-dependent op: JVM Math.log and DuckDB's libm log differ in the
last ulp on ~8% of inputs, measured) pinned through DECIMAL(18,9), all
remaining ops IEEE-exact mult/div in identical association order, and
the per-(query, doc) term-score sum as an ORDERED left fold (Spark
F.aggregate over the term-sorted list ≡ DuckDB list_reduce — the
operators/pruning.py idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import (
    TOKENS_SQL,
    counts_to_vector,
    local_rows_df,
    normalize_text,
    spread,
    tokens,
)
from ..registry import register
from ..sources.tables import Tables

_TOKENS_SQL = TOKENS_SQL

#: BM25 parameters (Robertson/Spärck Jones defaults).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10

#: Keyword queries over the synthetic vocabulary: one rare-term probe
#: ("dup" — the near-dup marker token), three common-term mixes.
BM25_QUERIES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("q_dup_merge", ("dup", "merge")),
    ("q_join_key", ("hash", "join", "key")),
    ("q_scan_filter", ("fast", "filter", "scan")),
    ("q_stream_window", ("spark", "stream", "window")),
)


def _qt_values_sql() -> str:
    rows = ", ".join(
        f"('{qid}', '{term}')" for qid, terms in BM25_QUERIES for term in terms
    )
    return f"(VALUES {rows}) AS q(query_id, term)"


#: idf pinned through DECIMAL(18,9): ln() is the single libm-dependent
#: op; both engines round the (possibly 1-ulp-apart) double to the same
#: 9-decimal value. Deterministic inputs => deterministic gate.
_IDF_SQL = (
    "CAST(CAST(ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5) "
    "/ (CAST(d.df AS DOUBLE) + 0.5)) AS DECIMAL(18,9)) AS DOUBLE)"
)

_BM25_CTES = (
    f"tk AS (SELECT doc_id, {_TOKENS_SQL} AS tk FROM documents), "
    "dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, tk FROM tk), "
    "stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl), "
    "terms AS (SELECT doc_id, dl, u.term AS term, CAST(count(*) AS BIGINT) AS tf "
    "FROM dl, LATERAL unnest(tk) AS u(term) GROUP BY doc_id, dl, u.term), "
    "dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM terms GROUP BY term), "
    f"qt AS (SELECT * FROM {_qt_values_sql()}), "
    "scored AS (SELECT q.query_id, trm.doc_id, trm.term, "
    f"{_IDF_SQL} * (CAST(trm.tf AS DOUBLE) * {BM25_K1 + 1.0}) / "
    f"(CAST(trm.tf AS DOUBLE) + {BM25_K1} * ({1.0 - BM25_B} + "
    f"{BM25_B} * CAST(trm.dl AS DOUBLE) / "
    "(CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))) AS sc "
    "FROM qt q JOIN terms trm ON trm.term = q.term "
    "JOIN dfreq d ON d.term = trm.term CROSS JOIN stats s), "
    "agg AS (SELECT query_id, doc_id, "
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list(sc ORDER BY term)), "
    "(acc, x) -> acc + x) AS score, CAST(count(*) AS BIGINT) AS n_terms_hit "
    "FROM scored GROUP BY query_id, doc_id), "
    "rk AS (SELECT query_id, doc_id, score, n_terms_hit, "
    "row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk "
    "FROM agg)"
)

_BM25_SQL = (
    "WITH " + _BM25_CTES
    + " SELECT query_id, CAST(rnk AS INT) AS rank, doc_id, score, n_terms_hit "
    f"FROM rk WHERE rnk <= {BM25_TOP_K} ORDER BY query_id, rank"
)


def doc_lengths(t: Tables) -> DataFrame:
    """(doc_id, dl, tk): tokenized documents with whitespace-token length."""
    tk = t.documents.select("doc_id", tokens("text").alias("tk"))
    return tk.select("doc_id", F.size("tk").cast("long").alias("dl"), "tk")


def inverted_index(dl: DataFrame) -> DataFrame:
    """(doc_id, dl, term, tf): the posting-list table. At 100 TB this is
    a maintained term-bucketed table (the one corpus-sized shuffle);
    every query below is a broadcast probe of it."""
    return (
        dl.select("doc_id", "dl", F.explode("tk").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


@register("search_bm25_topk", _BM25_SQL)
def search_bm25_topk(t: Tables) -> DataFrame:
    return bm25_topk_from(t, doc_lengths(t))


def bm25_topk_from(t: Tables, dl: DataFrame) -> DataFrame:
    """BM25 top-10 per keyword query (k1=1.2, b=0.75): classic
    idf · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), summed over the query's
    matched terms as an ordered fold, ranked per query with doc_id
    tie-break.

    Plan: query terms (a handful of rows) broadcast against the posting
    lists; document frequencies are computed ONLY for the bounded query
    term set (postings semi-joined to the query terms BEFORE the df
    aggregation), so the df relation broadcast is <= |query terms| rows
    at any corpus size — never the |vocab|-row table, which grows
    unboundedly under Heaps' law at 100 TB. Corpus stats are a broadcast
    single row; one (query, doc) aggregation over the matched postings
    only — candidate set is the union of the named posting lists, never
    the corpus.

    ``bm25_topk_from`` is the parameterized core: the registered key
    tokenizes for itself; the fusion/eval keys hand in a CHECKPOINTED
    tokenized relation shared with their dense side, so the corpus is
    tokenized once per fused query instead of once per subsystem —
    same program either way, which is what keeps the fused sides
    hash-identical to this standalone key."""
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    return bm25_from_postings(t, inverted_index(dl), stats)


def bm25_from_postings(t: Tables, terms: DataFrame, stats: DataFrame) -> DataFrame:
    """Postings-level BM25 core: everything below the index — shared by
    the in-memory key and the persisted-index search (build-once /
    search-many), so the two paths are the same program by
    construction."""
    # round 16: literal JVM relation — the createDataFrame form was a
    # pickled-Python RDD re-evaluated (32 Python-worker tasks) by each
    # of this plan's three broadcast builds (see functions.local_rows_df)
    qt = local_rows_df(
        t.spark,
        [(qid, term) for qid, qterms in BM25_QUERIES for term in qterms],
        "query_id string, term string",
    )
    # df over query-term postings only: identical values for the terms
    # that are ever consumed, and the broadcast side is query-bounded.
    dfreq = (
        terms.join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = (
        F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
            / (F.col("df").cast("double") + 0.5)
        )
        .cast("decimal(18,9)")
        .cast("double")
    )
    denom = F.col("tf").cast("double") + BM25_K1 * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B)
        * F.col("dl").cast("double")
        / (F.col("sum_dl").cast("double") / F.col("n_docs").cast("double"))
    )
    scored = (
        F.broadcast(qt)
        .join(terms, "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            "term",
            (idf * (F.col("tf").cast("double") * (BM25_K1 + 1.0)) / denom).alias("sc"),
        )
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("term", "sc"))),
        lambda s: s.getField("sc"),
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x).alias("score"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("query_id", "rank", "doc_id", "score", "n_terms_hit")
        .orderBy("query_id", "rank")
    )


#: Keywords emitted per document.
KW_TOP_K = 5

#: sklearn-style smoothed idf, ln pinned through DECIMAL(18,9) (the
#: _IDF_SQL trick: both engines round the possibly-1-ulp-apart double
#: to the same 9-decimal value).
_KW_IDF_SQL = (
    "CAST(CAST(ln((1.0 + CAST(s.n_docs AS DOUBLE)) / "
    "(1.0 + CAST(d.df AS DOUBLE))) AS DECIMAL(18,9)) AS DOUBLE) + 1.0"
)

_KW_SQL = (
    f"WITH tk AS (SELECT doc_id, {_TOKENS_SQL} AS tk FROM documents), "
    "dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, tk FROM tk), "
    "stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM dl), "
    "terms AS (SELECT doc_id, dl, u.term AS term, CAST(count(*) AS BIGINT) AS tf "
    "FROM dl, LATERAL unnest(tk) AS u(term) GROUP BY doc_id, dl, u.term), "
    "dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM terms GROUP BY term), "
    "scored AS (SELECT trm.doc_id, trm.term, trm.tf, "
    f"CAST(trm.tf AS DOUBLE) * ({_KW_IDF_SQL}) AS score "
    "FROM terms trm JOIN dfreq d ON d.term = trm.term CROSS JOIN stats s), "
    "rk AS (SELECT doc_id, term, tf, score, row_number() OVER ("
    "PARTITION BY doc_id ORDER BY score DESC, term) AS rnk FROM scored) "
    "SELECT doc_id, CAST(rnk AS INT) AS rank, term, tf, score "
    f"FROM rk WHERE rnk <= {KW_TOP_K} ORDER BY doc_id, rank"
)


@register("text_keywords_tfidf", _KW_SQL)
def text_keywords_tfidf(t: Tables) -> DataFrame:
    """TF-IDF keyword extraction: each document's KW_TOP_K most
    distinctive terms by tf · (ln((1+N)/(1+df)) + 1) — the sklearn
    smoothed idf — with ties broken lexically. Reuses the BM25 posting
    list. Unlike BM25, EVERY document needs EVERY term's df here, so
    there is no bounded set to pre-filter to; df therefore comes from a
    term-partitioned window COUNT over the posting list itself — one
    shuffle on term, no join, and no |vocab|-row relation ever
    materialized or broadcast (at 100 TB the index is term-bucketed, so
    that window is exchange-free). Only the 1-row corpus-size scalar
    broadcasts.

    ln is pinned through DECIMAL(18,9) (the _IDF_SQL trick), making a
    transcendental-bearing score exactly oracle-checkable."""
    dl = doc_lengths(t)
    terms = inverted_index(dl)
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = (
        F.log(
            (F.lit(1.0) + F.col("n_docs").cast("double"))
            / (F.lit(1.0) + F.col("df").cast("double"))
        )
        .cast("decimal(18,9)")
        .cast("double")
        + F.lit(1.0)
    )
    scored = (
        terms.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", "tf", (F.col("tf").cast("double") * idf).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KW_TOP_K)
        .select("doc_id", F.col("rnk").cast("int").alias("rank"), "term", "tf", "score")
        .orderBy("doc_id", "rank")
    )


#: Reciprocal-rank-fusion constant (Cormack/Clarke/Buettcher's 60) and
#: fused report size.
RRF_K = 60
RRF_TOP_K = 10


def _retrieval_ctes() -> str:
    """Shared oracle CTE chain for the fusion/eval keys: the BM25 chain
    (shared with _BM25_SQL, so the sparse side cannot drift) + the
    hashed-TF dense side over the SAME queries, ending in
    hsp(query_id, doc_id, r_sparse) and hdk(query_id, doc_id, r_dense).
    All float work is the pinned cosine chain (IEEE sqrt is correctly
    rounded, unlike ln)."""
    from ..functions import dot_sql, norm_sql
    from .text import HTF_DIM

    qdims = ", ".join(
        f"CAST(sum(CASE WHEN dim = {j} THEN c ELSE 0 END) AS DOUBLE)"
        for j in range(HTF_DIM)
    )
    cos = (
        f"({dot_sql('q.v', 'c.v', HTF_DIM)}) / "
        f"(({norm_sql('q.v', HTF_DIM)}) * ({norm_sql('c.v', HTF_DIM)}))"
    )
    return (
        "WITH " + _BM25_CTES + ", "
        "hq AS (SELECT query_id, "
        f"CAST('0x' || substr(md5(term), 1, 4) AS BIGINT) % {HTF_DIM} AS dim, "
        "CAST(count(*) AS BIGINT) AS c FROM qt GROUP BY query_id, dim), "
        f"hqv AS (SELECT query_id, [{qdims}] AS v FROM hq GROUP BY query_id), "
        "hd AS (SELECT doc_id, "
        f"CAST('0x' || substr(md5(u.tok), 1, 4) AS BIGINT) % {HTF_DIM} AS dim, "
        "CAST(count(*) AS BIGINT) AS c FROM tk, LATERAL unnest(tk.tk) AS u(tok) "
        "GROUP BY doc_id, dim), "
        f"hdv AS (SELECT doc_id, [{qdims}] AS v FROM hd GROUP BY doc_id), "
        f"hsc AS (SELECT q.query_id, c.doc_id, {cos} AS cosine FROM hqv q, hdv c), "
        "hdk AS (SELECT query_id, doc_id, CAST(rn AS INT) AS r_dense FROM ("
        "SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY cosine DESC, doc_id) AS rn FROM hsc) "
        f"WHERE rn <= {RRF_TOP_K}), "
        "hsp AS (SELECT query_id, doc_id, CAST(rnk AS INT) AS r_sparse FROM rk "
        f"WHERE rnk <= {RRF_TOP_K})"
    )


def _hybrid_rrf_sql() -> str:
    return (
        _retrieval_ctes() + ", "
        "fused AS (SELECT query_id, doc_id, r_sparse, r_dense, "
        f"coalesce(CAST(1 AS DOUBLE) / CAST({RRF_K} + r_sparse AS DOUBLE), "
        "CAST(0 AS DOUBLE)) + "
        f"coalesce(CAST(1 AS DOUBLE) / CAST({RRF_K} + r_dense AS DOUBLE), "
        "CAST(0 AS DOUBLE)) AS rrf_score "
        "FROM hsp FULL JOIN hdk USING (query_id, doc_id)) "
        "SELECT query_id, CAST(rn AS INT) AS rank, doc_id, rrf_score, "
        "r_sparse, r_dense FROM (SELECT *, row_number() OVER ("
        "PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rn FROM fused) "
        f"WHERE rn <= {RRF_TOP_K} ORDER BY query_id, rank"
    )


@register("pipeline_hybrid_rrf", _hybrid_rrf_sql())
def pipeline_hybrid_rrf(t: Tables) -> DataFrame:
    """HYBRID retrieval — the sparse+dense fusion every production RAG
    stack runs: BM25 top-10 (search_bm25_topk, reused verbatim so the
    two keys cannot diverge) and hashed-TF cosine top-10 over the SAME
    keyword queries (the query vector is the keywords pushed through
    the identical md5 dimension hash — no model, the text_hashing_tf
    bridge), fused by Reciprocal Rank Fusion:
    score(d) = Σ_systems 1/(60 + rank_s(d)), absent ranks contribute 0.
    RRF needs no score calibration between systems — only ranks — which
    is exactly why it is the default fusion everywhere.

    Exactness: integer ranks → each reciprocal is one IEEE double
    division, summed in a fixed 2-term order; the dense cosine is the
    pinned chain (sqrt is correctly rounded by IEEE-754, so it is
    portable, unlike ln). Plan: the sparse side is the bounded
    query-term probe of the posting lists; the dense side broadcasts 4
    query vectors against one corpus-vector scan (the SRP-bucketed keys
    are the documented 100 TB drop-in); fusion is a full outer join of
    two ≤(|queries|·10)-row rank lists — metadata-sized."""
    # one tokenization, spread to cluster parallelism before the
    # checkpoint (round 16): the raw checkpoint inherited the scan's
    # 5 splits, so every map pass over it — the posting-list partial
    # agg, the hashed-dim partial agg — ran 5-way on a 32-core session
    # (§2.5; spread stands aside when the source is already split)
    dl = spread(doc_lengths(t), "doc_id").localCheckpoint(eager=True)
    sparse = bm25_topk_from(t, dl).select(
        "query_id", "doc_id", F.col("rank").alias("r_sparse")
    )
    dense = dense_keyword_topk(t, dl)
    rrf = F.coalesce(
        F.lit(1.0).cast("double") / (F.lit(RRF_K) + F.col("r_sparse")).cast("double"),
        F.lit(0.0),
    ) + F.coalesce(
        F.lit(1.0).cast("double") / (F.lit(RRF_K) + F.col("r_dense")).cast("double"),
        F.lit(0.0),
    )
    fused = sparse.join(dense, ["query_id", "doc_id"], "full").select(
        "query_id", "doc_id", "r_sparse", "r_dense", rrf.alias("rrf_score")
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("int"))
        .filter(F.col("rank") <= RRF_TOP_K)
        .select("query_id", "rank", "doc_id", "rrf_score", "r_sparse", "r_dense")
        .orderBy("query_id", "rank")
    )


def dense_keyword_topk(t: Tables, dl: DataFrame | None = None) -> DataFrame:
    """(query_id, doc_id, r_dense): hashed-TF cosine top-RRF_TOP_K per
    BM25 keyword query — the dense half shared by pipeline_hybrid_rrf
    and search_rank_agreement_ndcg (one definition, cannot drift). The
    query vector is the keywords pushed through text_hashing_tf's md5
    dimension hash; 4 query vectors broadcast against one corpus-vector
    scan, pinned-chain cosine, row_number top-k."""
    from ..functions import dot_expr, norm_expr
    from .text import HTF_DIM, hashing_tf_vectors

    qt = local_rows_df(
        t.spark,
        [(qid, term) for qid, qterms in BM25_QUERIES for term in qterms],
        "query_id string, term string",
    )
    qdims = (
        qt.select(
            "query_id",
            F.pmod(
                F.conv(F.substring(F.md5("term"), 1, 4), 16, 10).cast("bigint"),
                F.lit(HTF_DIM),
            ).alias("dim"),
        )
        .groupBy("query_id", "dim")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # round 15: map-aggregate pivot — see functions.counts_to_vector
    qv = (
        counts_to_vector(qdims, ["query_id"], HTF_DIM, "double", "v", wide=False)
        .withColumn("nrm", norm_expr("v", HTF_DIM))
        .alias("q")
    )
    from .text import hashing_tf_vectors_from

    toks = (
        (dl if dl is not None else doc_lengths(t))
        .select("doc_id", F.explode("tk").alias("tok"))
    )
    cv = (
        hashing_tf_vectors_from(toks)
        .select("doc_id", F.col("vec").cast("array<double>").alias("v"))
        .withColumn("nrm", norm_expr("v", HTF_DIM))
        .alias("c")
    )
    cos = dot_expr("q.v", "c.v", HTF_DIM) / (F.col("q.nrm") * F.col("c.nrm"))
    wd = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    return (
        F.broadcast(qv)
        .crossJoin(cv)
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col("c.doc_id").alias("doc_id"),
            cos.alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= RRF_TOP_K)
        .select("query_id", "doc_id", F.col("rn").cast("int").alias("r_dense"))
    )


def _log2_pin_sql(expr: str) -> str:
    """log2 pinned through DECIMAL(18,9) — same discipline as _IDF_SQL
    (log2 is libm-dependent like ln; sqrt is not)."""
    return f"CAST(CAST(log2(CAST({expr} AS DOUBLE)) AS DECIMAL(18,9)) AS DOUBLE)"


def _idcg_sql() -> str:
    """Ideal DCG for RRF_TOP_K graded ranks (rel = K+1-r), as an
    unrolled left-associated chain — byte-identical expression text in
    both engines."""
    return " + ".join(
        f"CAST({RRF_TOP_K + 1 - r} AS DOUBLE) / {_log2_pin_sql(r + 1)}"
        for r in range(1, RRF_TOP_K + 1)
    )


def _ndcg_sql() -> str:
    return (
        _retrieval_ctes() + ", "
        "rel AS (SELECT query_id, doc_id, "
        f"CAST({RRF_TOP_K + 1} - r_dense AS DOUBLE) AS rel FROM hdk), "
        "gains AS (SELECT s.query_id, s.r_sparse, "
        "coalesce(rel.rel, CAST(0 AS DOUBLE)) / "
        f"{_log2_pin_sql('s.r_sparse + 1')} AS g "
        "FROM hsp s LEFT JOIN rel ON rel.query_id = s.query_id "
        "AND rel.doc_id = s.doc_id), "
        "dcg AS (SELECT query_id, "
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), list(g ORDER BY r_sparse)), "
        "(acc, x) -> acc + x) AS dcg, CAST(count(*) AS BIGINT) AS n_ranked "
        "FROM gains GROUP BY query_id) "
        f"SELECT query_id, n_ranked, dcg, dcg / ({_idcg_sql()}) AS ndcg "
        "FROM dcg ORDER BY query_id"
    )


@register("search_rank_agreement_ndcg", _ndcg_sql())
def search_rank_agreement_ndcg(t: Tables) -> DataFrame:
    """Rank agreement between the two retrieval systems as nDCG — the
    standard eval statistic, computed with the dense top-10 as graded
    ground truth (rel(d) = 11 - r_dense) and the BM25 ordering as the
    run under evaluation: DCG = Σ_r rel(d_r)/log2(r+1) over BM25's
    ranks as an ORDERED fold, normalized by the ideal DCG of a perfect
    ordering. ndcg ≈ 1 ⇒ sparse and dense agree on both membership and
    order; low ndcg flags queries where hybrid fusion actually changes
    the outcome (the diagnostic retrieval teams read next to
    pipeline_hybrid_rrf's fused list).

    Exactness: integer ranks and relevance grades; log2 (libm) pinned
    through DECIMAL(18,9) exactly like BM25's ln; the per-query gain
    sum is an ordered fold; IDCG is the same unrolled pinned chain in
    both engines. Plan: both rank lists are the bounded retrieval
    outputs (≤ |queries|·10 rows) — the eval join is metadata-sized;
    corpus cost is exactly the two retrieval passes it evaluates."""
    # one tokenization, spread to cluster parallelism before the
    # checkpoint (round 16): the raw checkpoint inherited the scan's
    # 5 splits, so every map pass over it — the posting-list partial
    # agg, the hashed-dim partial agg — ran 5-way on a 32-core session
    # (§2.5; spread stands aside when the source is already split)
    dl = spread(doc_lengths(t), "doc_id").localCheckpoint(eager=True)
    sparse = bm25_topk_from(t, dl).select(
        "query_id", "doc_id", F.col("rank").alias("r_sparse")
    )
    dense = dense_keyword_topk(t, dl)
    rel = dense.select(
        "query_id",
        "doc_id",
        (F.lit(RRF_TOP_K + 1) - F.col("r_dense")).cast("double").alias("rel"),
    )
    gains = sparse.join(rel, ["query_id", "doc_id"], "left").select(
        "query_id",
        "r_sparse",
        (
            F.coalesce(F.col("rel"), F.lit(0.0))
            / F.expr(_log2_pin_sql("r_sparse + 1"))
        ).alias("g"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("r_sparse", "g"))),
        lambda s: s.getField("g"),
    )
    dcg = gains.groupBy("query_id").agg(
        F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x).alias("dcg"),
        F.count(F.lit(1)).alias("n_ranked"),
    )
    return dcg.select(
        "query_id",
        "n_ranked",
        "dcg",
        (F.col("dcg") / F.expr(_idcg_sql())).alias("ndcg"),
    ).orderBy("query_id")


def build_text_index(t: Tables, path: str) -> None:
    """Persist the keyword-search index: the (doc_id, dl, term, tf)
    posting table + the 1-row corpus stats. Build-once / search-many —
    at 100 TB the posting table is a maintained, TERM-BUCKETED corpus
    artifact refreshed per crawl delta (the one corpus-sized shuffle,
    paid at build time); every query is then a bounded probe of it,
    never a corpus scan. (Written as plain parquet locally; bucketBy
    the term column when writing to a real catalog.)"""
    dl = doc_lengths(t)
    inverted_index(dl).write.mode("overwrite").parquet(f"{path}/postings")
    dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    ).write.mode("overwrite").parquet(f"{path}/stats")


def search_bm25_index(t: Tables, path: str) -> DataFrame:
    """search_bm25_topk against the PERSISTED index — byte-equal to the
    in-memory path (asserted in tests). The posting frame is eagerly
    checkpointed: bm25_from_postings consumes it twice (the df
    semi-join + the scoring join), and without materialization the
    index parquet would be scanned twice per query (the search_srp_index
    discipline)."""
    terms = t.spark.read.parquet(f"{path}/postings").localCheckpoint(eager=True)
    stats = t.spark.read.parquet(f"{path}/stats")
    return bm25_from_postings(t, terms, stats)
