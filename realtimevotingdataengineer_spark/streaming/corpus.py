"""Streaming corpus ingestion: the online halves of the batch curation
families — exact content dedup (stream_dedup_exact), MinHash-LSH
near-dup (stream_dedup_minhash), embedding near-dup (stream_dedup_srp)
and order-invariant fixed-k sampling (stream_sample_bottomk).

A 100 TB/day crawl ingest cannot afford a nightly batch pass over the
accumulated corpus; the gates have to run IN the ingest stream, with
state bounded by signature/winner cardinality (never corpus bytes —
state stores md5 keys, band rows or k winners, never the text). The
near-dup gates keep a PERSISTED index that survivors' signatures join,
so later arrivals dedup against everything admitted so far —
first-arrival-wins across the whole stream, and the batch keys' exact
verify rules are imported, not re-implemented, so 'near-dup' means one
thing repo-wide. This module keeps the same source-agnostic contract as
streaming/pipeline.py: the functions accept any streaming (or batch)
DataFrame, so tests drive them from a file-backed stream and production
points them at the Kafka/landing-zone source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import normalize_text


def with_content_signature(docs: DataFrame) -> DataFrame:
    """Append ``sig``: md5 of the whitespace-normalized text — the
    identical canonical form operators/dedup.py::dedup_exact groups by,
    so the streaming filter and the batch pass agree doc-for-doc."""
    return docs.withColumn("sig", F.md5(normalize_text(F.col("text"))))


def stream_dedup_exact(
    docs: DataFrame, watermark_col: str | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """First-arrival-wins exact content dedup on a document stream:
    one survivor per normalized-content signature. With an event-time
    column the watermark branch uses dropDuplicatesWithinWatermark, so
    state rows ARE evicted once the watermark passes them — plain
    ``dropDuplicates(['sig'])`` under a watermark would keep state
    forever, because Spark only GCs dedup state when the event-time
    column is part of the dedup key subset (the round-8 ADVICE catch).
    The semantic trade is explicit: duplicates are only suppressed when
    they arrive within the watermark delay of each other (re-crawls of
    an unchanged page cluster in time); without an event-time column,
    suppression is exact forever and state grows with DISTINCT content
    (md5 keys only — 16 bytes a document, the trade a backfill replay
    accepts).

    Batch-equivalence contract (pytest): the survivor SIGNATURE SET is
    exactly dedup_exact's group set — streaming picks first-arrival
    where batch picks min doc_id, so the chosen representative may
    differ, never the groups. The watermark branch additionally has a
    state-eviction pytest: a duplicate arriving AFTER the watermark has
    passed its first occurrence survives (proof the state row was
    dropped, i.e. state is time-bounded, not distinct-content-bounded)."""
    sig = with_content_signature(docs)
    if watermark_col is not None:
        return sig.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(
            ["sig"]
        )
    return sig.dropDuplicates(["sig"])


def _greedy_admit(ids, flagged, in_pairs) -> set:
    """First-arrival-wins over one micro-batch: walk ids ASCENDING,
    admit unless the id near-dups the persisted index (``flagged``) or
    an already-admitted id of the same batch (``in_pairs``, a < b).
    Shared by every streaming near-dup gate so 'who survives' is one
    rule. All inputs are batch-bounded by construction."""
    nbrs: dict = {}
    for a, b in in_pairs:
        nbrs.setdefault(b, set()).add(a)
    kept: set = set()
    for i in sorted(ids):
        if i in flagged or (nbrs.get(i, set()) & kept):
            continue
        kept.add(i)
    return kept


def build_minhash_index(docs: DataFrame, path: str) -> None:
    """Persist the near-dup signature index for a (base) corpus:
    ``{path}/bands`` — the (doc_id, band, bv) LSH rows the candidate
    join probes — and ``{path}/shingles`` — the (doc_id, sh) trigram
    sets the exact-Jaccard verify reads. Build-once / stream-forever:
    at 100 TB the index is a maintained corpus artifact (signature
    bytes, never text), refreshed by the gate itself as survivors are
    admitted — the same artifact-lifecycle posture as the SRP/IVF
    vector indexes (operators/dedup.py::build_srp_index)."""
    from ..operators.dedup import minhash_bands, minhash_doc_signatures

    per_doc = minhash_doc_signatures(docs).localCheckpoint(eager=True)
    sig = per_doc.select("doc_id", F.posexplode("mh").alias("i", "mh"))
    minhash_bands(sig).write.mode("overwrite").parquet(f"{path}/bands")
    per_doc.select("doc_id", "sh").write.mode("overwrite").parquet(f"{path}/shingles")


def _minhash_gate_batch(
    batch: DataFrame, index_path: str, survivors_path: str
) -> None:
    """One micro-batch through the online near-dup gate (the foreachBatch
    body of stream_dedup_minhash):

    1. the Arrow kernel computes the batch's shingles + signatures
       (identical bitwise contract as every batch MinHash key);
    2. candidates vs the PERSISTED index: index bands ⨝ broadcast(batch
       bands) — the batch side is the small side by construction, so
       the corpus-sized index is never shuffled, only scanned;
    3. candidates within the batch: the usual a<b band self-join
       (batch-sized, trivially small);
    4. both candidate sets are verified with the shared exact-Jaccard
       rule (minhash_verified_pairs — 'near-dup' means one thing
       repo-wide), then a driver-side greedy over the batch's ids in
       ascending order keeps a doc unless it near-dups the index or an
       already-kept doc of the same batch. The collected relations are
       batch-bounded (flag set ≤ |batch|, pair list ≤ |batch| choose 2
       post-LSH), never corpus-bounded;
    5. survivors' rows are appended to the survivor sink and their
       bands + shingles appended to the index, so later batches (and
       restarts) dedup against them — first-arrival-wins across the
       whole stream.

    State growth is survivor-signature-bounded: a duplicate-heavy crawl
    appends nothing for the duplicates. Exactly-once caveat: parquet
    appends from foreachBatch are at-least-once under retries; a
    production deployment keys the appends by (batch_id, doc_id) and
    dedups on read, or lands them in a transactional table format."""
    from ..operators.dedup import (
        minhash_bands,
        minhash_doc_signatures,
        minhash_verified_pairs,
    )

    spark = batch.sparkSession
    per_doc = minhash_doc_signatures(batch).localCheckpoint(eager=True)
    if per_doc.isEmpty():
        return
    sig = per_doc.select("doc_id", F.posexplode("mh").alias("i", "mh"))
    new_bands = minhash_bands(sig).localCheckpoint(eager=True)
    new_sh = per_doc.select("doc_id", "sh")
    idx_bands = spark.read.parquet(f"{index_path}/bands")
    idx_sh = spark.read.parquet(f"{index_path}/shingles")
    nb = new_bands.select(
        F.col("doc_id").alias("doc_new"), "band", "bv"
    )
    cand_idx = (
        idx_bands.join(
            F.broadcast(nb),
            (idx_bands.band == nb.band) & (idx_bands.bv == nb.bv),
        )
        .select("doc_new", F.col("doc_id").alias("doc_base"))
        .distinct()
    )
    # verify vs index: batch shingles on side a, index shingles side b
    flagged = {
        r.doc_new
        for r in minhash_verified_pairs(
            cand_idx, new_sh, "doc_new", "doc_base", sh_b=idx_sh
        )
        .select("doc_new")
        .distinct()
        .collect()
    }
    ba, bb = new_bands.alias("ba"), new_bands.alias("bb")
    cand_in = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.bv") == F.col("bb.bv"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b"))
        .distinct()
    )
    in_pairs = [
        (r.doc_a, r.doc_b)
        for r in minhash_verified_pairs(cand_in, new_sh).collect()
    ]
    kept = _greedy_admit(
        (r.doc_id for r in per_doc.select("doc_id").collect()), flagged, in_pairs
    )
    if not kept:
        return
    surv_ids = spark.createDataFrame(
        [(i,) for i in sorted(kept)], "doc_id bigint"
    )
    surv = batch.join(F.broadcast(surv_ids), "doc_id")
    surv.write.mode("append").parquet(survivors_path)
    new_bands.join(F.broadcast(surv_ids), "doc_id").write.mode("append").parquet(
        f"{index_path}/bands"
    )
    new_sh.join(F.broadcast(surv_ids), "doc_id").write.mode("append").parquet(
        f"{index_path}/shingles"
    )


def stream_dedup_minhash(
    docs: DataFrame,
    index_path: str,
    survivors_path: str,
    checkpoint_path: str,
    processing_time: str | None = None,
):
    """ONLINE near-dup gate on a document stream — the streaming half of
    the batch MinHash-LSH family, and the piece a 100 TB/day crawl
    ingest actually runs: every micro-batch is deduped against a
    persisted signature index (seeded by build_minhash_index over the
    existing corpus) AND within itself, survivors flow to the sink and
    their signatures join the index so later arrivals dedup against
    them. First-arrival-wins at θ = LSH_THETA, same kernel, banding and
    exact-Jaccard verify as the batch keys — pytest proves the streamed
    survivor set equals the batch incremental/LSH pass's greedy
    survivor set on the same docs.

    Returns the started StreamingQuery (foreachBatch; call
    processAllAvailable()/stop() or awaitTermination()). Pass
    ``processing_time`` (e.g. '5 seconds') to batch arrivals up — the
    gate pays a fixed per-batch cost (index probe + greedy + appends),
    so larger micro-batches amortize it."""
    w = docs.writeStream.outputMode("append").option(
        "checkpointLocation", checkpoint_path
    )
    if processing_time is not None:
        w = w.trigger(processingTime=processing_time)
    return w.foreachBatch(
        lambda b, _id: _minhash_gate_batch(b, index_path, survivors_path)
    ).start()


def build_srp_stream_index(vecs: DataFrame, path: str) -> None:
    """Persist the EMBEDDING near-dup index for a base corpus:
    ``{path}/bands`` — (vec_id, band, bv) random-hyperplane LSH rows —
    and ``{path}/vectors`` — (vec_id, embedding) for the exact-cosine
    verify. The vector-stream twin of build_minhash_index; same
    build-once / stream-forever artifact lifecycle."""
    from ..operators.dedup import SRP_BAND_BITS, SRP_BANDS
    from ..operators.similarity import srp_band_signatures

    sigs = srp_band_signatures(
        vecs, "vec_id", "embedding", SRP_BAND_BITS, SRP_BANDS
    ).localCheckpoint(eager=True)
    bands = sigs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("band"), F.col(f"bv{j}").alias("bv"))
                    for j in range(SRP_BANDS)
                ]
            )
        ).alias("b"),
    ).select("vec_id", F.col("b.band").alias("band"), F.col("b.bv").alias("bv"))
    bands.write.mode("overwrite").parquet(f"{path}/bands")
    vecs.select("vec_id", "embedding").write.mode("overwrite").parquet(
        f"{path}/vectors"
    )


def _srp_gate_batch(batch: DataFrame, index_path: str, survivors_path: str) -> None:
    """One micro-batch through the online EMBEDDING near-dup gate —
    the vector twin of _minhash_gate_batch, same five steps with the
    MinHash pieces swapped for SRP: (1) the Arrow kernel computes the
    batch's 32-bit sign signatures, (2) candidates vs the persisted
    band index (index ⨝ broadcast(batch bands) — the corpus-sized side
    is scanned, never shuffled), (3) within-batch band self-join,
    (4) exact order-pinned cosine ≥ COSINE_THETA verifies both
    candidate sets (the repo's ONE embedding dup rule), the shared
    greedy admits first arrivals, (5) survivors' rows + bands +
    vectors are appended so later batches dedup against them. Same
    at-least-once append caveat as the MinHash gate."""
    from ..functions import dot_expr, norm_expr
    from ..operators.dedup import SRP_BAND_BITS, SRP_BANDS, COSINE_THETA
    from ..operators.similarity import EMB_DIM, srp_band_signatures

    spark = batch.sparkSession
    vecs = batch.select("vec_id", "embedding").localCheckpoint(eager=True)
    if vecs.isEmpty():
        return
    sigs = srp_band_signatures(
        vecs, "vec_id", "embedding", SRP_BAND_BITS, SRP_BANDS
    ).localCheckpoint(eager=True)
    new_bands = sigs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("band"), F.col(f"bv{j}").alias("bv"))
                    for j in range(SRP_BANDS)
                ]
            )
        ).alias("b"),
    ).select(
        "vec_id", F.col("b.band").alias("band"), F.col("b.bv").alias("bv")
    ).localCheckpoint(eager=True)
    idx_bands = spark.read.parquet(f"{index_path}/bands")
    idx_vecs = spark.read.parquet(f"{index_path}/vectors")
    nb = new_bands.select(F.col("vec_id").alias("vec_new"), "band", "bv")
    cand_idx = (
        idx_bands.join(
            F.broadcast(nb),
            (idx_bands.band == nb.band) & (idx_bands.bv == nb.bv),
        )
        .select("vec_new", F.col("vec_id").alias("vec_base"))
        .distinct()
    )
    va = vecs.select(
        F.col("vec_id").alias("vec_new"), F.col("embedding").alias("ea")
    ).withColumn("na", norm_expr("ea", EMB_DIM))
    vb = idx_vecs.select(
        F.col("vec_id").alias("vec_base"), F.col("embedding").alias("eb")
    ).withColumn("nb", norm_expr("eb", EMB_DIM))
    cos_idx = dot_expr("ea", "eb", EMB_DIM) / (F.col("na") * F.col("nb"))
    flagged = {
        r.vec_new
        for r in cand_idx.join(F.broadcast(va), "vec_new")
        .join(vb, "vec_base")
        .select("vec_new", cos_idx.alias("cosine"))
        .filter(F.col("cosine") >= COSINE_THETA)
        .select("vec_new")
        .distinct()
        .collect()
    }
    ba, bb = new_bands.alias("ba"), new_bands.alias("bb")
    cand_in = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.bv") == F.col("bb.bv"))
            & (F.col("ba.vec_id") < F.col("bb.vec_id")),
        )
        .select(F.col("ba.vec_id").alias("vec_a"), F.col("bb.vec_id").alias("vec_b"))
        .distinct()
    )
    wa = vecs.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    ).withColumn("na", norm_expr("ea", EMB_DIM))
    wb = vecs.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    ).withColumn("nb", norm_expr("eb", EMB_DIM))
    cos_in = dot_expr("ea", "eb", EMB_DIM) / (F.col("na") * F.col("nb"))
    in_pairs = [
        (r.vec_a, r.vec_b)
        for r in cand_in.join(wa, "vec_a")
        .join(wb, "vec_b")
        .select("vec_a", "vec_b", cos_in.alias("cosine"))
        .filter(F.col("cosine") >= COSINE_THETA)
        .collect()
    ]
    kept = _greedy_admit(
        (r.vec_id for r in vecs.select("vec_id").collect()), flagged, in_pairs
    )
    if not kept:
        return
    surv_ids = spark.createDataFrame([(i,) for i in sorted(kept)], "vec_id bigint")
    batch.join(F.broadcast(surv_ids), "vec_id").write.mode("append").parquet(
        survivors_path
    )
    new_bands.join(F.broadcast(surv_ids), "vec_id").write.mode("append").parquet(
        f"{index_path}/bands"
    )
    vecs.join(F.broadcast(surv_ids), "vec_id").write.mode("append").parquet(
        f"{index_path}/vectors"
    )


def stream_dedup_srp(
    vecs: DataFrame,
    index_path: str,
    survivors_path: str,
    checkpoint_path: str,
    processing_time: str | None = None,
):
    """ONLINE embedding near-dup gate on a vector stream — the
    streaming half of the dedup_embedding_srp family, completing the
    gate pair (text → stream_dedup_minhash, vectors → this): every
    micro-batch is deduped against a persisted SRP band index AND
    within itself at the repo's COSINE_THETA with the exact pinned
    cosine, survivors flow to the sink and their bands + vectors join
    the index. First-arrival-wins across the whole stream; same
    banding, signatures and verify as the batch keys, so the pytest
    equality against the batch pair list is semantic, not
    approximate."""
    w = vecs.writeStream.outputMode("append").option(
        "checkpointLocation", checkpoint_path
    )
    if processing_time is not None:
        w = w.trigger(processingTime=processing_time)
    return w.foreachBatch(
        lambda b, _id: _srp_gate_batch(b, index_path, survivors_path)
    ).start()


class StreamingTables:
    """Tables-shaped shim binding ``documents`` to a STREAMING
    DataFrame, so the registered batch operators — pure
    DataFrame→DataFrame functions — run UNCHANGED on the ingest stream.
    Every stateless operator (quality scoring, language ID, Gopher
    gates, token stats, fingerprints) is streaming-compatible by
    construction; pytest proves batch ≡ stream row-for-row. Operators
    with a terminal orderBy or corpus-level aggregation are the ones
    that genuinely need the batch pass (or a watermarked streaming
    twin) — the shim makes that boundary explicit instead of implied."""

    def __init__(self, spark, documents: DataFrame):
        self.spark = spark
        self.documents = documents


def stream_sample_bottomk(
    docs: DataFrame,
    state_path: str,
    checkpoint_path: str,
    k: int | None = None,
):
    """STREAMING fixed-k stratified sampling — the online twin of
    operators/corpus.py::sample_fixed_k_stratified, same "fk:" salted
    md5, same per-source bottom-k rule. Bottom-k of a deterministic
    hash is a commutative, idempotent monoid (merge = union → re-rank
    → cut), so the maintained sample is ORDER-INVARIANT: however the
    stream interleaves arrivals, the final state equals the batch key
    run over the union of everything seen — the reproducible-eval-set
    property a 100 TB crawl needs from an online sampler (a classic
    reservoir is RNG-order-dependent; this is not).

    State = the current winners only: ≤ k × |strata| rows of
    (source, doc_id, h), overwritten each micro-batch — never
    corpus-bounded. The merged frame is eagerly localCheckpointed
    before the overwrite so the job never reads the parquet it is
    replacing. Returns the started StreamingQuery; the state parquet
    at ``state_path`` IS the sample (rank recomputable from h)."""
    from ..operators.corpus import SAMPLE_FIXED_K

    if k is None:
        k = SAMPLE_FIXED_K

    def merge_batch(batch: DataFrame, _batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch.sparkSession
        new = batch.select(
            "source",
            "doc_id",
            F.md5(
                F.concat_ws(
                    ":", F.lit("fk"), F.col("doc_id").cast("string"), F.col("source")
                )
            ).alias("h"),
        )
        try:
            prev = spark.read.parquet(state_path).select("source", "doc_id", "h")
            merged = prev.unionByName(new)
        except Exception:  # first batch: no state yet
            merged = new
        rk = F.row_number().over(
            Window.partitionBy("source").orderBy(F.col("h"), F.col("doc_id"))
        )
        out = (
            merged.withColumn("rk", rk)
            .filter(F.col("rk") <= k)
            .localCheckpoint(eager=True)  # materialize BEFORE overwriting the input files
        )
        out.write.mode("overwrite").parquet(state_path)

    return (
        docs.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(merge_batch)
        .start()
    )
