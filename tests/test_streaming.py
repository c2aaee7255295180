"""Structured Streaming tests — broker-less (file source + memory sink),
mirroring the Kafka-shaped pipeline of spark-streaming.py:66-74 with the
dedup/watermark/tally closure the tutorial never reached.

Fixture (FIXTURES.md A4): JSONL vote events including duplicate voters,
late events, and a malformed line.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from realtimevotingdataengineer_spark.sources import generator
from realtimevotingdataengineer_spark.streaming import pipeline, sinks


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("vote_events")
    rows = generator.vote_events_raw(spark, 100).collect()
    lines = [r.value for r in rows]
    lines.insert(5, "{not valid json")  # malformed record → dropped on parse
    (path / "part-0.jsonl").write_text("\n".join(lines))
    return str(path), rows


def _run_stream(spark, df, name, mode="update"):
    q = sinks.write_memory(df, name, mode)
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_parse_drops_malformed(spark, event_dir):
    path, rows = event_dir
    raw = pipeline.read_text_stream(spark, path)
    parsed = pipeline.parse_vote_events(raw)
    out = _run_stream(spark, parsed, "parsed_events", "append")
    # all valid events parsed; the malformed line vanished
    assert out.count() == len(rows)
    assert out.schema["voting_time"].dataType.typeName() == "timestamp"
    assert out.schema["address"].dataType.typeName() == "struct"


def test_streaming_dedup_one_vote(spark, event_dir):
    path, _ = event_dir
    raw = pipeline.read_text_stream(spark, path)
    events = pipeline.parse_vote_events(raw)
    deduped = pipeline.dedup_one_vote(events)
    out = _run_stream(spark, deduped, "deduped_votes", "append")
    # one row per distinct voter despite duplicate + late events
    assert out.count() == out.select("voter_id").distinct().count() == 100


def test_streaming_dedup_within_watermark(spark, event_dir):
    """dropDuplicatesWithinWatermark: retries (same voter, nearby
    timestamps) collapse to one vote."""
    path, _ = event_dir
    raw = pipeline.read_text_stream(spark, path)
    events = pipeline.parse_vote_events(raw)
    deduped = pipeline.dedup_one_vote_within(events)
    out = _run_stream(spark, deduped, "deduped_within", "append")
    assert out.count() == out.select("voter_id").distinct().count() == 100


def test_streaming_tally_matches_batch(spark, event_dir):
    path, _ = event_dir
    raw = pipeline.read_text_stream(spark, path)
    events = pipeline.parse_vote_events(raw)
    tally = pipeline.tally_per_candidate(pipeline.dedup_one_vote(events))
    out = _run_stream(spark, tally, "cand_tally", "update")
    # memory sink in update mode keeps the latest row per key
    got = {
        r.candidate_id: r.total_votes
        for r in out.groupBy("candidate_id").agg(F.max("total_votes").alias("total_votes"))
        .withColumnRenamed("total_votes", "total_votes")
        .collect()
    }
    # batch twin on the same fixture: first event per voter then tally
    batch = generator.vote_events_raw(spark, 100)
    parsed = (
        batch.select(F.from_json("value", pipeline.VOTE_EVENT_SCHEMA).alias("d"))
        .select("d.*")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("voter_id").orderBy(F.asc("voting_time"), F.asc("candidate_id"))
    first = parsed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    want = {
        r.candidate_id: r.t
        for r in first.groupBy("candidate_id").agg(F.sum("vote").alias("t")).collect()
    }
    assert sum(got.values()) == 100
    assert got == want


def test_windowed_tally_covers_event_range(spark, event_dir):
    path, _ = event_dir
    raw = pipeline.read_text_stream(spark, path)
    events = pipeline.parse_vote_events(raw)
    wt = pipeline.windowed_tally(events)
    out = _run_stream(spark, wt, "windowed_tally", "append")
    rows = out.collect()
    assert rows, "append-mode windowed agg should emit finalized windows"
    # windows are 1-minute tumbling and votes within them are positive
    for r in rows:
        assert (r.win.end - r.win.start).total_seconds() == 60
        assert r.votes >= 1


def test_streaming_turnout_by_state(spark, event_dir):
    """Turnout per address.state over the deduped stream: nested-struct
    access + dedup + count, summing to the distinct-voter total."""
    path, _ = event_dir
    raw = pipeline.read_text_stream(spark, path)
    events = pipeline.parse_vote_events(raw)
    turnout = pipeline.turnout_by_state(events)
    out = _run_stream(spark, turnout, "state_turnout", "update")
    latest = out.groupBy("state").agg(F.max("turnout").alias("t"))
    rows = latest.collect()
    assert sum(r.t for r in rows) == 100  # one vote per distinct voter
    assert all(r.state for r in rows)  # struct field extracted, non-null


def test_complete_mode_leaderboard(spark, event_dir):
    """Complete-mode sorted tally — the live dashboard view. Sorting a
    streaming agg is only legal in complete mode (3-group cardinality
    makes it cheap); the memory table then holds the ranked leaderboard."""
    path, _ = event_dir
    raw = pipeline.read_text_stream(spark, path)
    events = pipeline.parse_vote_events(raw)
    board = pipeline.tally_per_candidate(events).orderBy(
        F.desc("total_votes"), F.asc("candidate_name")
    )
    q = sinks.write_memory(board, "leaderboard", "complete")
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM leaderboard").collect()
    # ≥3 groups: the 3 candidates, plus fixture-injected inconsistent
    # duplicate rows (candidate_id rewritten, name kept) form extra keys
    assert len(rows) >= 3
    votes = [r.total_votes for r in rows]
    assert votes == sorted(votes, reverse=True)
    # every event counted (no dedup in this view)
    assert sum(votes) == 114  # 100 base + 10 duplicate votes + 4 late replays


def test_foreachbatch_leading_candidate(spark, event_dir, tmp_path):
    path, _ = event_dir
    raw = pipeline.read_text_stream(spark, path)
    events = pipeline.parse_vote_events(raw)
    tally = pipeline.tally_per_candidate(events)
    q = sinks.write_parquet_batches(
        tally,
        str(tmp_path / "winners"),
        str(tmp_path / "ckpt"),
        transform=pipeline.leading_candidate_batch,
    )
    q.processAllAvailable()
    q.stop()
    winners = spark.read.parquet(str(tmp_path / "winners")).collect()
    assert len(winners) >= 1
    assert all(w.total_votes >= 1 for w in winners)


def test_streaming_session_window_native(spark, event_dir):
    """Native session_window sessionization: every parsed event lands in
    exactly one session of its voter, session bounds are ordered, and
    multi-vote voters (the every-10th duplicates) produce sessions
    spanning their 30s-apart votes (gap 5m merges them)."""
    path, _ = event_dir
    raw = pipeline.read_text_stream(spark, path)
    events = pipeline.parse_vote_events(raw)
    sess = pipeline.session_activity(events)
    # session-window aggs reject update mode; complete emits all sessions
    out = _run_stream(spark, sess, "sess_native", "complete")
    rows = out.collect()
    assert rows, "no sessions emitted"
    # parsed events (malformed line dropped) must all be accounted for
    n_parsed = _run_stream(
        spark, pipeline.parse_vote_events(pipeline.read_text_stream(spark, path)),
        "sess_parsed", "append",
    ).count()
    assert sum(r["n_events"] for r in rows) == n_parsed
    for r in rows:
        assert r["session"]["start"] <= r["session"]["end"]
    # duplicate voters vote twice 30s apart -> one merged session with 2+ events
    multi = [r for r in rows if r["n_events"] >= 2]
    assert multi, "expected at least one merged multi-event session"


def test_stream_static_enrich(spark, event_dir):
    """Stream-static broadcast enrich: candidate fields re-attached from
    the static dim match what the (denormalized) events carried."""
    path, _ = event_dir
    raw = pipeline.read_text_stream(spark, path)
    events = pipeline.parse_vote_events(raw)
    static = generator.candidates(spark)
    enriched = pipeline.enrich_with_candidates(events, static)
    out = _run_stream(spark, enriched, "enriched_votes", "append")
    assert out.count() > 0
    # names re-attached from the dim must agree with the dim itself
    dim = {r["candidate_id"]: r["candidate_name"] for r in static.collect()}
    for r in out.select("candidate_id", "candidate_name").distinct().collect():
        assert dim[r["candidate_id"]] == r["candidate_name"]


def test_backpressure_bounded_batches(spark, tmp_path):
    """Admission control (maxFilesPerTrigger=1) must drain a 5-file
    backlog in ≥5 micro-batches — never one catch-up batch — and the
    final tally must equal the unthrottled pipeline's."""
    rows = generator.vote_events_raw(spark, 100).collect()
    per = len(rows) // 5
    for i in range(5):
        chunk = rows[i * per : (i + 1) * per] if i < 4 else rows[4 * per :]
        (tmp_path / f"part-{i}.jsonl").write_text(
            "\n".join(r.value for r in chunk)
        )
    raw = pipeline.read_text_stream(spark, str(tmp_path), max_files_per_trigger=1)
    tally = pipeline.tally_per_candidate(
        pipeline.dedup_one_vote(pipeline.parse_vote_events(raw))
    )
    q = sinks.write_memory(tally, "bp_tally", "update")
    q.processAllAvailable()
    progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    q.stop()
    assert len(progress) >= 5, f"backlog drained in {len(progress)} batches"
    assert max(p["numInputRows"] for p in progress) <= per + len(rows) % 5
    out = spark.sql(
        "SELECT sum(v) FROM (SELECT max(total_votes) AS v FROM bp_tally "
        "GROUP BY candidate_id, candidate_name, party_affiliation)"
    ).collect()[0][0]
    assert out == 100


def test_stream_dedup_exact_matches_batch_groups(spark, sf_dir, tmp_path):
    """streaming/corpus.py::stream_dedup_exact — the online content
    filter must agree with the batch dedup pass at the GROUP level: one
    survivor per normalized-content signature, survivor signature set
    identical to the batch groups (representatives may differ:
    first-arrival vs min doc_id — asserted only set-wise on sig)."""
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.sources.tables import load_table
    from realtimevotingdataengineer_spark.streaming import corpus, sinks

    docs = load_table(spark, sf_dir, "documents")
    stream_dir = str(tmp_path / "docs_stream")
    docs.select("doc_id", "text").write.parquet(stream_dir)
    sdocs = (
        spark.readStream.schema("doc_id bigint, text string")
        .parquet(stream_dir)
    )
    surv = corpus.stream_dedup_exact(sdocs)
    q = sinks.write_memory(surv.select("doc_id", "sig"), "doc_dedup", "append")
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM doc_dedup").collect()
    want_sigs = {
        r.sig
        for r in corpus.with_content_signature(docs).select("sig").distinct().collect()
    }
    assert len(got) == len(want_sigs)          # one survivor per group
    assert {r.sig for r in got} == want_sigs   # exactly the batch groups


def test_batch_operators_run_unchanged_on_stream(spark, sf_dir, tmp_path):
    """The registered STATELESS text operators must run UNCHANGED on a
    streaming documents source via the StreamingTables shim, producing
    exactly the batch result set — the operator-reuse contract that
    makes the quality/language gates deployable in the ingest stream
    without a second implementation."""
    from realtimevotingdataengineer_spark.operators.text import (
        text_lang_id,
        text_quality_score,
    )
    from realtimevotingdataengineer_spark.sources.tables import load_table
    from realtimevotingdataengineer_spark.streaming import corpus, sinks

    docs = load_table(spark, sf_dir, "documents")
    stream_dir = str(tmp_path / "docs_stream_ops")
    docs.write.parquet(stream_dir)
    sdocs = spark.readStream.schema(docs.schema).parquet(stream_dir)
    st = corpus.StreamingTables(spark, sdocs)
    for i, (op, key_cols) in enumerate(
        [(text_quality_score, ("doc_id",)), (text_lang_id, ("doc_id",))]
    ):
        out = op(st)
        assert out.isStreaming
        name = f"stream_op_{i}"
        q = sinks.write_memory(out, name, "append")
        q.processAllAvailable()
        q.stop()
        got = {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}
        want = {tuple(r) for r in op(corpus.StreamingTables(spark, docs)).collect()}
        assert got == want, op.__name__


def test_stream_dedup_exact_watermark_evicts_state(spark, tmp_path):
    """stream_dedup_exact's watermark branch must be TIME-bounded, not
    distinct-content-bounded: a duplicate inside the watermark delay is
    suppressed, but once the watermark passes a signature's first
    occurrence its state row is evicted, so a far-later re-crawl of the
    SAME content is re-emitted. This is exactly the behavior plain
    dropDuplicates(['sig']) under a watermark does NOT have (it never
    GCs state when the event-time column isn't in the key subset — the
    round-8 ADVICE catch this test pins)."""
    import datetime as dt

    from realtimevotingdataengineer_spark.streaming import corpus, sinks

    stream_dir = tmp_path / "docs_wm_stream"
    stream_dir.mkdir()
    schema = "doc_id bigint, text string, ts timestamp"

    def emit(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(stream_dir / name)
        )

    T0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    sdocs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir) + "/*")
    )
    surv = corpus.stream_dedup_exact(sdocs, watermark_col="ts", watermark="10 minutes")
    # batch 1: first occurrence + an in-delay duplicate → one survivor
    emit("b1", [(1, "same text", T0), (2, "same text", T0 + dt.timedelta(minutes=1))])
    q = sinks.write_memory(surv.select("doc_id", "sig"), "doc_dedup_wm", "append")
    q.processAllAvailable()
    # batch 2: unrelated late doc advances the watermark to 11:50,
    # far past the sig's eviction point (10:00 + 10 min)
    emit("b2", [(3, "other text", T0 + dt.timedelta(hours=2))])
    q.processAllAvailable()
    # batch 3: the same content again — state evicted, so it SURVIVES
    emit("b3", [(4, "same text", T0 + dt.timedelta(hours=2))])
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT doc_id, sig FROM doc_dedup_wm").collect()
    assert {r.doc_id for r in got} == {1, 3, 4}
    sig_counts = {}
    for r in got:
        sig_counts[r.sig] = sig_counts.get(r.sig, 0) + 1
    # the duplicated content's signature appears twice: pre- and
    # post-eviction — the proof state is time-bounded
    assert sorted(sig_counts.values()) == [1, 2]


def test_stream_dedup_minhash_matches_batch_greedy(spark, sf_dir, tmp_path):
    """The ONLINE MinHash gate must equal the batch pass on the same
    docs: seed the signature index with the first 80% of the id range
    (dedup_incremental_minhash's own split), stream the remaining 20%
    in id order, and compare the streamed survivor set against the
    greedy first-arrival-wins filter computed from the BATCH keys'
    verified pair lists (delta-vs-base from dedup_incremental_minhash,
    delta-vs-delta from dedup_minhash_lsh). Same kernel, banding, and
    exact-Jaccard verify on both sides — so any divergence is a wiring
    bug, not a semantics choice. The delta is split so the fixture's
    within-delta near-dup pair lands in ONE batch, exercising the
    within-batch self-join path alongside the index path."""
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.registry import QUERIES
    from realtimevotingdataengineer_spark.sources.tables import Tables, load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    t = Tables(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    cut = (mx + 1) * 4 // 5
    base = docs.filter(F.col("doc_id") < cut)
    delta_ids = sorted(
        r.doc_id for r in docs.filter(F.col("doc_id") >= cut).collect()
    )
    idx = str(tmp_path / "mh_index")
    corpus.build_minhash_index(base, idx)

    stream_dir = tmp_path / "delta_stream"
    stream_dir.mkdir()
    surv_path = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "ckpt")
    sdocs = (
        spark.readStream.schema("doc_id bigint, text string")
        .parquet(str(stream_dir) + "/*")
    )
    q = corpus.stream_dedup_minhash(sdocs, idx, surv_path, ckpt)
    split = cut + (mx + 1 - cut) * 7 // 10  # keeps the (474,498)-style pair together
    for name, lo, hi in [("b1", cut, split), ("b2", split, mx + 1)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.parquet(str(stream_dir / name))
        q.processAllAvailable()
    q.stop()
    streamed = {r.doc_id for r in spark.read.parquet(surv_path).collect()}

    base_pairs = {
        r.doc_new for r in QUERIES["dedup_incremental_minhash"](t).collect()
    }
    delta_pairs = [
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"](t).collect()
        if r.doc_a >= cut and r.doc_b >= cut
    ]
    kept: set = set()
    for d in delta_ids:
        if d in base_pairs or any(b == d and a in kept for a, b in delta_pairs):
            continue
        kept.add(d)
    assert streamed == kept
    assert len(kept) < len(delta_ids)  # the gate actually dropped docs


def test_greedy_admit_frames_equals_driver_walk(spark):
    """_greedy_admit_frames must compute EXACTLY _greedy_admit's set —
    the lexicographically-first maximal independent set minus flagged —
    on shapes that stress every code path: cliques and stars (one
    round), an alternating CHAIN a~b~c~d (the multi-round dependency
    case: a,c survive because b drops), flagged roots (a flagged
    minimum must NOT block its neighbors), and seeded random graphs."""
    import random

    from realtimevotingdataengineer_spark.streaming import corpus

    cases = [
        # (ids, flagged, pairs)
        (range(4), set(), [(0, 1), (1, 2), (2, 3)]),  # chain: keep {0, 2}
        (range(5), set(), [(0, i) for i in range(1, 5)]),  # star: keep {0}
        (range(4), {0}, [(0, 1), (1, 2)]),  # flagged root: keep {1, 3}
        (range(6), {2, 3}, [(0, 1), (2, 4), (3, 5), (4, 5)]),
    ]
    rng = random.Random(7)
    for _ in range(4):
        n = 40
        ids = range(n)
        flagged = {i for i in ids if rng.random() < 0.15}
        pairs = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(10, 120))
            }
        )
        cases.append((ids, flagged, pairs))
    for ids, flagged, pairs in cases:
        want = corpus._greedy_admit(ids, flagged, pairs)
        ids_df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
        fl_df = spark.createDataFrame(
            [(i,) for i in sorted(flagged)], "doc_id bigint"
        )
        pr_df = spark.createDataFrame(
            [(a, b) for a, b in pairs] or [(None, None)],
            "a bigint, b bigint",
        )
        if not pairs:
            pr_df = pr_df.filter("a IS NOT NULL")
        got = {
            r.doc_id
            for r in corpus._greedy_admit_frames(ids_df, fl_df, pr_df).collect()
        }
        assert got == want, (sorted(flagged), pairs)
    # sanity on the chain case specifically (multi-round dependency)
    assert corpus._greedy_admit(range(4), set(), [(0, 1), (1, 2), (2, 3)]) == {0, 2}


def test_greedy_admit_frames_deep_chain_falls_back_not_raises(
    spark, monkeypatch
):
    """Round-11 regression (round-10 advice): a conflict chain deeper
    than GREEDY_DEPTH_MAX must FINISH (driver-walk fallback over the
    undecided leftover), not raise — under exactly-once replay a
    deterministic raise is a permanent poison batch. Bound patched low
    so the fallback path actually runs; result must still equal the
    pure driver walk (evens survive an alternating chain)."""
    from realtimevotingdataengineer_spark.streaming import corpus

    monkeypatch.setattr(corpus, "GREEDY_DEPTH_MAX", 3)
    n = 24
    pairs = [(i, i + 1) for i in range(n - 1)]  # depth ~ n/2 >> 3
    want = corpus._greedy_admit(range(n), {0}, pairs)
    ids_df = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")
    fl_df = spark.createDataFrame([(0,)], "doc_id bigint")
    pr_df = spark.createDataFrame(pairs, "a bigint, b bigint")
    got = {
        r.doc_id
        for r in corpus._greedy_admit_frames(ids_df, fl_df, pr_df).collect()
    }
    assert got == want


def test_minhash_gate_distributed_admit_equals_driver(spark, sf_dir, tmp_path):
    """The executor-side admit is a drop-in: run the SAME two
    micro-batches through _minhash_gate_batch twice — driver walk vs
    distributed_admit — against separate index/sink dirs and require
    identical survivor sets (and that docs were actually dropped, so
    the admit logic was exercised, not bypassed)."""
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.sources.tables import load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    cut = (mx + 1) * 4 // 5
    base = docs.filter(F.col("doc_id") < cut)
    b1 = docs.filter(F.col("doc_id") >= cut).localCheckpoint(eager=True)
    survs = {}
    for mode, dist in [("driver", False), ("dist", True)]:
        idx = str(tmp_path / f"idx_{mode}")
        surv = str(tmp_path / f"surv_{mode}")
        corpus.build_minhash_index(base, idx)
        corpus._minhash_gate_batch(b1, idx, surv, distributed_admit=dist)
        survs[mode] = {r.doc_id for r in spark.read.parquet(surv).collect()}
    assert survs["driver"] == survs["dist"]
    assert 0 < len(survs["dist"]) < b1.count()


def test_stream_dedup_minhash_cross_batch_survivor_indexed(spark, tmp_path):
    """Survivor signatures must join the index BETWEEN batches: a doc
    whose only near-dup is a SURVIVOR from an earlier micro-batch (not
    in the seeded base index) must still be dropped — the
    first-arrival-wins contract across the whole stream, which only
    holds if the gate appends survivor bands+shingles before the next
    batch runs."""
    from realtimevotingdataengineer_spark.streaming import corpus

    uniq1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    uniq2 = "completely different content about distributed query engines and shuffles"
    idx = str(tmp_path / "idx")
    # empty base corpus — everything interesting arrives on the stream
    corpus.build_minhash_index(
        spark.createDataFrame([], "doc_id bigint, text string"), idx
    )
    stream_dir = tmp_path / "s"
    stream_dir.mkdir()
    surv_path = str(tmp_path / "sv")
    sdocs = (
        spark.readStream.schema("doc_id bigint, text string")
        .parquet(str(stream_dir) + "/*")
    )
    q = corpus.stream_dedup_minhash(sdocs, idx, surv_path, str(tmp_path / "ck"))
    batches = [
        ("b1", [(1, uniq1), (2, uniq1)]),       # within-batch dup: keep 1, drop 2
        ("b2", [(3, uniq1), (4, uniq2)]),       # 3 dups batch-1 SURVIVOR 1; 4 fresh
    ]
    for name, rows in batches:
        spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
            1
        ).write.parquet(str(stream_dir / name))
        q.processAllAvailable()
    q.stop()
    assert {r.doc_id for r in spark.read.parquet(surv_path).collect()} == {1, 4}


def test_stream_sample_bottomk_equals_batch_any_order(spark, sf_dir, tmp_path):
    """The streamed fixed-k sample must equal the BATCH key's output on
    the same docs regardless of arrival order — bottom-k of a salted
    hash is a commutative monoid, so two different 3-batch interleavings
    (id-ordered vs reversed) must both land on exactly
    sample_fixed_k_stratified's (source, doc_id) set."""
    from pyspark.sql import functions as F

    import realtimevotingdataengineer_spark.operators  # noqa: F401 (registers keys)
    from realtimevotingdataengineer_spark.registry import QUERIES
    from realtimevotingdataengineer_spark.sources.tables import Tables, load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    t = Tables(spark, sf_dir)
    want = {
        (r.source, r.doc_id)
        for r in QUERIES["sample_fixed_k_stratified"](t).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    cuts = [0, (mx + 1) // 3, 2 * (mx + 1) // 3, mx + 1]

    for order, tag in [(range(3), "fwd"), (reversed(range(3)), "rev")]:
        stream_dir = tmp_path / f"in_{tag}"
        stream_dir.mkdir()
        state = str(tmp_path / f"state_{tag}")
        sdocs = spark.readStream.schema("doc_id bigint, source string").parquet(
            str(stream_dir) + "/*"
        )
        q = corpus.stream_sample_bottomk(
            sdocs, state, str(tmp_path / f"ck_{tag}")
        )
        for n, i in enumerate(order):
            docs.filter(
                (F.col("doc_id") >= cuts[i]) & (F.col("doc_id") < cuts[i + 1])
            ).coalesce(1).write.parquet(str(stream_dir / f"b{n}"))
            q.processAllAvailable()
        q.stop()
        got = {
            (r.source, r.doc_id)
            for r in corpus.read_bottomk_sample(spark, state).collect()
        }
        assert got == want, tag


def test_stream_dedup_srp_matches_batch_greedy(spark, sf_dir, tmp_path):
    """The ONLINE embedding near-dup gate must equal the batch pass:
    seed the SRP index with the first 80% of the vec_id range, stream
    the remaining 20% in two batches (split so the fixture's
    within-delta pair lands in ONE batch, exercising the self-join path
    next to the index path), and compare the streamed survivor set
    against the shared greedy applied to dedup_embedding_srp's verified
    pair list. Same bands, signatures, cosine and threshold on both
    sides — divergence is a wiring bug, not a semantics choice."""
    from pyspark.sql import functions as F

    import realtimevotingdataengineer_spark.operators  # noqa: F401
    from realtimevotingdataengineer_spark.registry import QUERIES
    from realtimevotingdataengineer_spark.sources.tables import Tables, load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    t = Tables(spark, sf_dir)
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mx = vecs.agg(F.max("vec_id")).collect()[0][0]
    cut = (mx + 1) * 4 // 5
    base = vecs.filter(F.col("vec_id") < cut)
    delta_ids = sorted(
        r.vec_id for r in vecs.filter(F.col("vec_id") >= cut).collect()
    )
    idx = str(tmp_path / "srp_index")
    corpus.build_srp_stream_index(base, idx)

    stream_dir = tmp_path / "delta_stream"
    stream_dir.mkdir()
    surv_path = str(tmp_path / "survivors")
    svecs = spark.readStream.schema(
        vecs.schema
    ).parquet(str(stream_dir) + "/*")
    q = corpus.stream_dedup_srp(svecs, idx, surv_path, str(tmp_path / "ckpt"))
    split = cut + (mx + 1 - cut) // 10  # keeps the within-delta pair together
    for name, lo, hi in [("b1", cut, split), ("b2", split, mx + 1)]:
        vecs.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.parquet(str(stream_dir / name))
        q.processAllAvailable()
    q.stop()
    streamed = {r.vec_id for r in spark.read.parquet(surv_path).collect()}

    pairs = [
        (r.vec_a, r.vec_b) for r in QUERIES["dedup_embedding_srp"](t).collect()
    ]
    flagged = {b for a, b in pairs if a < cut <= b}
    delta_pairs = [(a, b) for a, b in pairs if a >= cut]
    want = corpus._greedy_admit(delta_ids, flagged, delta_pairs)
    assert streamed == want
    assert len(want) < len(delta_ids)  # the gate actually dropped vectors


def test_stream_gates_survive_restart(spark, sf_dir, tmp_path):
    """Recovery evidence: stop the query between micro-batches and start
    a NEW query on the same checkpoint + state paths. Both stateful
    streaming surfaces must come back exactly: (a) stream_sample_bottomk
    resumes from its winners parquet and still equals the batch key;
    (b) stream_dedup_minhash resumes against the survivor-extended index
    and still equals the single-run greedy — the restart inserts no
    duplicates and drops no survivors (checkpoint offsets skip the
    processed batch; state lives in the index/state parquet, not the
    dead query)."""
    from pyspark.sql import functions as F

    import realtimevotingdataengineer_spark.operators  # noqa: F401
    from realtimevotingdataengineer_spark.registry import QUERIES
    from realtimevotingdataengineer_spark.sources.tables import Tables, load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    t = Tables(spark, sf_dir)

    # (a) bottom-k sampler across a restart
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    state, ck = str(tmp_path / "state"), str(tmp_path / "ck")
    sdocs = spark.readStream.schema("doc_id bigint, source string").parquet(
        str(stream_dir) + "/*"
    )
    q = corpus.stream_sample_bottomk(sdocs, state, ck)
    docs.filter(F.col("doc_id") < (mx + 1) // 2).coalesce(1).write.parquet(
        str(stream_dir / "b0")
    )
    q.processAllAvailable()
    q.stop()
    # NEW query, same checkpoint: batch b0 must not replay
    sdocs2 = spark.readStream.schema("doc_id bigint, source string").parquet(
        str(stream_dir) + "/*"
    )
    q2 = corpus.stream_sample_bottomk(sdocs2, state, ck)
    docs.filter(F.col("doc_id") >= (mx + 1) // 2).coalesce(1).write.parquet(
        str(stream_dir / "b1")
    )
    q2.processAllAvailable()
    q2.stop()
    got = {
        (r.source, r.doc_id)
        for r in corpus.read_bottomk_sample(spark, state).collect()
    }
    want = {
        (r.source, r.doc_id)
        for r in QUERIES["sample_fixed_k_stratified"](t).collect()
    }
    assert got == want

    # (b) minhash near-dup gate across a restart
    dtexts = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cut = (mx + 1) * 4 // 5
    idx = str(tmp_path / "mh_idx")
    corpus.build_minhash_index(dtexts.filter(F.col("doc_id") < cut), idx)
    sdir2 = tmp_path / "in2"
    sdir2.mkdir()
    surv, ck2 = str(tmp_path / "surv"), str(tmp_path / "ck2")
    split = cut + (mx + 1 - cut) * 7 // 10
    mk = lambda: spark.readStream.schema("doc_id bigint, text string").parquet(  # noqa: E731
        str(sdir2) + "/*"
    )
    q3 = corpus.stream_dedup_minhash(mk(), idx, surv, ck2)
    dtexts.filter(
        (F.col("doc_id") >= cut) & (F.col("doc_id") < split)
    ).coalesce(1).write.parquet(str(sdir2 / "b0"))
    q3.processAllAvailable()
    q3.stop()
    q4 = corpus.stream_dedup_minhash(mk(), idx, surv, ck2)
    dtexts.filter(F.col("doc_id") >= split).coalesce(1).write.parquet(
        str(sdir2 / "b1")
    )
    q4.processAllAvailable()
    q4.stop()
    streamed = sorted(r.doc_id for r in spark.read.parquet(surv).collect())
    assert len(streamed) == len(set(streamed))  # no duplicate appends
    base_flagged = {
        r.doc_new for r in QUERIES["dedup_incremental_minhash"](t).collect()
    }
    delta_pairs = [
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"](t).collect()
        if r.doc_a >= cut
    ]
    delta_ids = sorted(
        r.doc_id for r in dtexts.filter(F.col("doc_id") >= cut).collect()
    )
    want_surv = corpus._greedy_admit(delta_ids, base_flagged, delta_pairs)
    assert set(streamed) == want_surv


def test_stream_dedup_srp_tight_caps_exact_on_degenerate(spark, sf_dir, tmp_path):
    """The DEGENERATE-MODE dial: stream_dedup_srp with tightened caps
    (clique_cap=16, probe_cap=256 — the tools/stream_srp_throughput.py
    worst-case setting) must stay EXACT on the regime the dial exists
    for — identical-vector floods, where sub-banding cannot split the
    bucket and the star fallback carries the whole contract. 90 copies
    of one embedding and 10 of its negation (bitwise-complement
    signature, cosine −1 — never a candidate across groups), split
    mid-group across two micro-batches so group A exercises BOTH the
    within-batch star path (batch 1) and the index-probe path
    (batch 2). Exactly the two first arrivals may survive."""
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.sources.tables import load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    one = (
        load_table(spark, sf_dir, "embeddings")
        .select("embedding")
        .limit(1)
        .collect()[0]
        .embedding
    )
    neg = [-float(x) for x in one]
    rows = [(i, [float(x) for x in one]) for i in range(90)] + [
        (i, neg) for i in range(90, 100)
    ]
    all_vecs = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    idx = str(tmp_path / "tight_idx")
    corpus.build_srp_stream_index(
        spark.createDataFrame([], "vec_id bigint, embedding array<double>"), idx
    )
    stream_dir = tmp_path / "tight_stream"
    stream_dir.mkdir()
    surv_path = str(tmp_path / "tight_surv")
    svecs = spark.readStream.schema(all_vecs.schema).parquet(str(stream_dir) + "/*")
    q = corpus.stream_dedup_srp(
        svecs,
        idx,
        surv_path,
        str(tmp_path / "tight_ckpt"),
        clique_cap=16,
        probe_cap=256,
    )
    for name, lo, hi in [("b1", 0, 50), ("b2", 50, 100)]:
        all_vecs.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.parquet(str(stream_dir / name))
        q.processAllAvailable()
    q.stop()
    streamed = {r.vec_id for r in spark.read.parquet(surv_path).collect()}
    assert streamed == {0, 90}


def test_srp_capped_self_pairs_equals_uncapped_under_cap(spark, sf_dir):
    """Sub-banding must be a NO-OP when every band bucket fits the cap:
    _capped_self_pairs at the default cap over the fixture's signatures
    (max bucket well under SRP_CLIQUE_CAP) returns exactly the naive
    (band, bv) self-join's pair set — the equality-to-batch contract of
    stream_dedup_srp rests on this."""
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.operators.dedup import (
        SRP_BAND_BITS,
        SRP_BANDS,
    )
    from realtimevotingdataengineer_spark.operators.similarity import (
        srp_band_signatures,
    )
    from realtimevotingdataengineer_spark.sources.tables import load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sigs = srp_band_signatures(
        vecs, "vec_id", "embedding", SRP_BAND_BITS, SRP_BANDS
    ).localCheckpoint(eager=True)
    bands = corpus._srp_sig_bands(sigs).localCheckpoint(eager=True)
    naive = {
        (r.ia, r.ib)
        for r in bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib"))
        .distinct()
        .collect()
    }
    capped = {
        (r.ia, r.ib)
        for r in corpus._capped_self_pairs(
            bands, "vec_id", corpus.SRP_CLIQUE_CAP
        ).collect()
    }
    assert capped == naive and len(naive) > 0


def test_srp_capped_self_pairs_star_fallback_bounded(spark, sf_dir):
    """The degenerate regime the round-9 weak named: a batch whose
    signatures are IDENTICAL (all-constant corpus) cannot be split by
    any number of extra nibbles — the capped stage must fall back to
    CHAIN-AUGMENTED STAR pairs (min id vs each member plus each member
    vs its id-order successor — round 12), emitting 2n-3 candidates
    instead of the O(n^2) clique, and the gate's greedy must still
    reject every copy but the first."""
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.operators.dedup import (
        SRP_BAND_BITS,
        SRP_BANDS,
    )
    from realtimevotingdataengineer_spark.operators.similarity import (
        srp_band_signatures,
    )
    from realtimevotingdataengineer_spark.sources.tables import load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    one = (
        load_table(spark, sf_dir, "embeddings")
        .select("embedding")
        .limit(1)
        .collect()[0]
        .embedding
    )
    n = 200
    dup = spark.createDataFrame(
        [(i, one) for i in range(n)], "vec_id bigint, embedding array<float>"
    )
    sigs = srp_band_signatures(
        dup, "vec_id", "embedding", SRP_BAND_BITS, SRP_BANDS
    ).localCheckpoint(eager=True)
    bands = corpus._srp_sig_bands(sigs).localCheckpoint(eager=True)
    pairs = corpus._capped_self_pairs(bands, "vec_id", corpus.SRP_CLIQUE_CAP)
    got = {(r.ia, r.ib) for r in pairs.collect()}
    # chain-augmented star, not clique: 2n-3 pairs — the root star plus
    # the id-order successor chain — still linear in the group
    want = {(0, i) for i in range(1, n)} | {(i, i + 1) for i in range(1, n - 1)}
    assert got == want
    kept = corpus._greedy_admit(range(n), set(), sorted(got))
    assert kept == {0}


def test_srp_capped_probe_no_op_under_cap_and_subset_when_tight(spark, sf_dir):
    """Probe-side sub-banding: at the default product cap the fixture's
    buckets are all under cap, so the capped probe equals the naive
    (band, bv) index-probe join. At a deliberately tiny cap the refined
    join may only LOSE low-angle candidates (subset), and must keep
    every identical-signature pair — identical signatures collide at
    every nibble width, which is what makes exact re-crawls immune to
    the recall trade."""
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.operators.dedup import (
        SRP_BAND_BITS,
        SRP_BANDS,
    )
    from realtimevotingdataengineer_spark.operators.similarity import (
        srp_band_signatures,
    )
    from realtimevotingdataengineer_spark.sources.tables import load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mx = vecs.agg(F.max("vec_id")).collect()[0][0]
    cut = (mx + 1) * 4 // 5
    base, delta = vecs.filter(F.col("vec_id") < cut), vecs.filter(
        F.col("vec_id") >= cut
    )
    mk = lambda df: corpus._srp_sig_bands(  # noqa: E731
        srp_band_signatures(
            df, "vec_id", "embedding", SRP_BAND_BITS, SRP_BANDS
        ).localCheckpoint(eager=True)
    ).localCheckpoint(eager=True)
    ib, bb = mk(base), mk(delta)
    naive = {
        (r.vec_new, r.vec_base)
        for r in ib.alias("i")
        .join(
            bb.alias("b"),
            (F.col("i.band") == F.col("b.band")) & (F.col("i.bv") == F.col("b.bv")),
        )
        .select(
            F.col("b.vec_id").alias("vec_new"), F.col("i.vec_id").alias("vec_base")
        )
        .distinct()
        .collect()
    }
    at_default = {
        (r.vec_new, r.vec_base)
        for r in corpus._capped_probe_pairs(ib, bb, corpus.SRP_PROBE_CAP).collect()
    }
    assert at_default == naive and len(naive) > 0
    tight = {
        (r.vec_new, r.vec_base)
        for r in corpus._capped_probe_pairs(ib, bb, 1).collect()
    }
    assert tight <= naive
    same_sig = {
        (r.vec_new, r.vec_base)
        for r in ib.select("vec_id", "sig")
        .distinct()
        .alias("i")
        .join(bb.select("vec_id", "sig").distinct().alias("b"), "sig")
        .select(
            F.col("b.vec_id").alias("vec_new"), F.col("i.vec_id").alias("vec_base")
        )
        .collect()
    }
    assert same_sig <= tight


def test_srp_gate_replay_self_healing(spark, sf_dir, tmp_path):
    """foreachBatch replays the last micro-batch after a crash between
    the state appends and the checkpoint commit. The gate must converge
    under replay: running the SAME batch body twice (the worst replay —
    every append already landed) re-admits via the self-exclusion rule
    instead of self-flagging, so the DISTINCT survivor set is unchanged
    (sink is at-least-once by row, exactly-once by vec_id) and a
    subsequent near-duplicate batch is still rejected against the
    index — no permanent loss, no permanent wrongful admission."""
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.sources.tables import load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mx = vecs.agg(F.max("vec_id")).collect()[0][0]
    cut = (mx + 1) * 4 // 5
    idx, surv = str(tmp_path / "idx"), str(tmp_path / "surv")
    corpus.build_srp_stream_index(vecs.filter(F.col("vec_id") < cut), idx)
    batch = vecs.filter(F.col("vec_id") >= cut)
    corpus._srp_gate_batch(batch, idx, surv)
    first = sorted(
        r.vec_id for r in spark.read.parquet(surv).select("vec_id").distinct().collect()
    )
    assert first  # the batch admitted something
    corpus._srp_gate_batch(batch, idx, surv)  # full replay
    replayed = sorted(
        r.vec_id for r in spark.read.parquet(surv).select("vec_id").distinct().collect()
    )
    assert replayed == first
    # a re-crawl of an admitted vector (new id, same embedding) is
    # rejected against the index the replay left behind
    re_crawl = (
        batch.join(
            spark.createDataFrame([(i,) for i in first], "vec_id bigint"), "vec_id"
        )
        .withColumn("vec_id", F.col("vec_id") + (mx + 1))
        .localCheckpoint(eager=True)
    )
    corpus._srp_gate_batch(re_crawl, idx, surv)
    after = {r.vec_id for r in spark.read.parquet(surv).select("vec_id").collect()}
    assert after == set(first)


def test_stream_sample_bottomk_duplicate_redelivery(spark, sf_dir, tmp_path):
    """At-least-once redelivery: the SAME rows arriving again in a later
    micro-batch (source-level duplicate delivery, or a replayed batch
    whose state write already landed) must leave the sample unchanged —
    the merge is a SET union on (source, doc_id), so a winner cannot
    occupy two ranks and evict a legitimate k-th member. Also pins the
    versioned-state contract: exactly one committed version dir remains
    after pruning, and the sample has no duplicate rows."""
    import os

    from pyspark.sql import functions as F

    import realtimevotingdataengineer_spark.operators  # noqa: F401
    from realtimevotingdataengineer_spark.registry import QUERIES
    from realtimevotingdataengineer_spark.sources.tables import Tables, load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    t = Tables(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    state = str(tmp_path / "state")
    sdocs = spark.readStream.schema("doc_id bigint, source string").parquet(
        str(stream_dir) + "/*"
    )
    q = corpus.stream_sample_bottomk(sdocs, state, str(tmp_path / "ck"))
    for name in ("b0", "b1_same_rows_again"):
        docs.coalesce(1).write.parquet(str(stream_dir / name))
        q.processAllAvailable()
    q.stop()
    got = [
        (r.source, r.doc_id)
        for r in corpus.read_bottomk_sample(spark, state).collect()
    ]
    want = {
        (r.source, r.doc_id)
        for r in QUERIES["sample_fixed_k_stratified"](t).collect()
    }
    assert len(got) == len(set(got))  # no duplicate winners
    assert set(got) == want
    versions = [d for d in os.listdir(state) if d.startswith("v")]
    assert len(versions) == 1  # older versions pruned after commit


def test_srp_caps_none_bit_identical_and_widen_metric(spark, sf_dir):
    """Round-11: (a) ``cap=None`` must be the raw (band, bv) join on
    BOTH the self and probe sides even on a degenerate corpus the caps
    would rewrite (full clique / full probe, not star / sub-banded);
    (b) the widen metric (SRP_WIDEN_LAST + WARNING log) must record
    over-cap rewrites and record zeros when nothing widens — the
    round-10 advice: recall loss observable, never silent."""
    import logging

    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.operators.dedup import (
        SRP_BAND_BITS,
        SRP_BANDS,
    )
    from realtimevotingdataengineer_spark.operators.similarity import (
        srp_band_signatures,
    )
    from realtimevotingdataengineer_spark.sources.tables import load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    one = (
        load_table(spark, sf_dir, "embeddings")
        .select("embedding")
        .limit(1)
        .collect()[0]
        .embedding
    )
    n = 120
    dup = spark.createDataFrame(
        [(i, one) for i in range(n)], "vec_id bigint, embedding array<float>"
    )
    mk = lambda df: corpus._srp_sig_bands(  # noqa: E731
        srp_band_signatures(
            df, "vec_id", "embedding", SRP_BAND_BITS, SRP_BANDS
        ).localCheckpoint(eager=True)
    ).localCheckpoint(eager=True)
    bands = mk(dup)
    # (a) self side: None == full clique (n choose 2), not the star
    got = {
        (r.ia, r.ib)
        for r in corpus._capped_self_pairs(bands, "vec_id", None).collect()
    }
    assert got == {(a, b) for a in range(n) for b in range(a + 1, n)}
    # probe side: None == every (new, base) combination (identical sigs)
    base = mk(
        spark.createDataFrame(
            [(1000 + i, one) for i in range(5)],
            "vec_id bigint, embedding array<float>",
        )
    )
    gotp = {
        (r.vec_new, r.vec_base)
        for r in corpus._capped_probe_pairs(base, bands, None).collect()
    }
    assert gotp == {(a, 1000 + b) for a in range(n) for b in range(5)}
    # (b) the capped run on the same degenerate corpus must record the
    # widen and log it; an under-cap run must record zeros
    logger = logging.getLogger("realtimevotingdataengineer_spark.streaming.corpus")
    records: list = []

    class _Cap(logging.Handler):
        def emit(self, rec):
            records.append(rec.getMessage())

    h = _Cap(level=logging.WARNING)
    logger.addHandler(h)
    try:
        corpus.SRP_WIDEN_LAST.clear()
        corpus._capped_self_pairs(bands, "vec_id", corpus.SRP_CLIQUE_CAP).count()
        assert corpus.SRP_WIDEN_LAST["self"]["buckets"] > 0
        assert corpus.SRP_WIDEN_LAST["self"]["rows"] >= n
        assert any("widened" in m for m in records)
        small = mk(
            spark.createDataFrame(
                [(0, one)], "vec_id bigint, embedding array<float>"
            )
        )
        corpus._capped_self_pairs(small, "vec_id", corpus.SRP_CLIQUE_CAP).count()
        assert corpus.SRP_WIDEN_LAST["self"] == {"buckets": 0, "rows": 0}
    finally:
        logger.removeHandler(h)


def test_bottomk_legacy_flat_state_migrates_to_v0(spark, sf_dir, tmp_path):
    """Round-10 advice: a pre-versioning FLAT state layout (parquet
    part files directly under state_path) must migrate to v0 and keep
    accumulating — not silently restart the sample from empty. A
    crashed legacy write (no _SUCCESS) must raise, not migrate."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.sources.tables import load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    half = (mx + 1) // 2
    state = str(tmp_path / "state")
    # legacy writer: the pre-versioning layout was a plain overwrite
    # parquet dir of (source, doc_id, h)
    legacy = docs.filter(F.col("doc_id") < half).select(
        "source",
        "doc_id",
        F.md5(
            F.concat_ws(":", F.lit("fk"), F.col("doc_id").cast("string"), "source")
        ).alias("h"),
    )
    legacy.write.parquet(state)
    legacy_set = {(r.source, r.doc_id) for r in legacy.collect()}

    # read path migrates and serves the legacy winners (k-cut applies)
    got = {
        (r.source, r.doc_id)
        for r in corpus.read_bottomk_sample(spark, state).collect()
    }
    assert got <= legacy_set and got
    assert os.path.isdir(os.path.join(state, "v0"))

    # and a subsequent stream batch MERGES onto it (no restart): run the
    # second half through the stream and compare with the batch sample
    # over the full corpus
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    sdocs = spark.readStream.schema("doc_id bigint, source string").parquet(
        str(stream_dir) + "/*"
    )
    q = corpus.stream_sample_bottomk(sdocs, state, str(tmp_path / "ck"))
    docs.filter(F.col("doc_id") >= half).coalesce(1).write.parquet(
        str(stream_dir / "b0")
    )
    q.processAllAvailable()
    q.stop()
    import realtimevotingdataengineer_spark.operators  # noqa: F401
    from realtimevotingdataengineer_spark.registry import QUERIES
    from realtimevotingdataengineer_spark.sources.tables import Tables

    want = {
        (r.source, r.doc_id)
        for r in QUERIES["sample_fixed_k_stratified"](Tables(spark, sf_dir)).collect()
    }
    merged = {
        (r.source, r.doc_id)
        for r in corpus.read_bottomk_sample(spark, state).collect()
    }
    assert merged == want

    # crashed legacy write: flat files, no _SUCCESS -> explicit error
    state2 = str(tmp_path / "state2")
    legacy.write.parquet(state2)
    os.remove(os.path.join(state2, "_SUCCESS"))
    with pytest.raises(RuntimeError, match="_SUCCESS"):
        corpus.read_bottomk_sample(spark, state2)


def test_srp_gate_legacy_index_without_sig_column(spark, sf_dir, tmp_path):
    """Round-10 advice: an SRP band index written BEFORE the 'sig'
    column existed must not fail at probe time — the gate reconstructs
    the packed signature from the index's own band rows (distinct-first,
    so replay-duplicated rows don't double-count) and produces the SAME
    survivors as with the modern index.

    Round-11 advice: the gate APPENDS sig-carrying band files, so after
    one batch a legacy dir is MIXED-schema — a later batch must still
    see the legacy rows (sig repaired row-level via coalesce, not
    column-presence-gated), or duplicates vs the old corpus are
    silently admitted. The two-batch leg pins that: batch 2 runs
    against the migrated-then-appended index."""
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.sources.tables import load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mx = vecs.agg(F.max("vec_id")).collect()[0][0]
    cut = (mx + 1) * 3 // 5
    cut2 = (mx + 1) * 4 // 5
    base = vecs.filter(F.col("vec_id") < cut)
    batch1 = vecs.filter((F.col("vec_id") >= cut) & (F.col("vec_id") < cut2))
    batch2 = vecs.filter(F.col("vec_id") >= cut2)

    def run(idx_name, legacy):
        idx = str(tmp_path / idx_name)
        corpus.build_srp_stream_index(base, idx)
        if legacy:
            bands = spark.read.parquet(f"{idx}/bands")
            # simulate the old layout: no sig, plus one duplicated row
            old = bands.drop("sig")
            dup_rows = old.limit(3)
            old.union(dup_rows).write.mode("overwrite").parquet(
                str(tmp_path / f"{idx_name}_flat")
            )
            spark.read.parquet(str(tmp_path / f"{idx_name}_flat")).write.mode(
                "overwrite"
            ).parquet(f"{idx}/bands")
        surv = str(tmp_path / f"{idx_name}_surv")
        # batch 1 appends sig-carrying files → the legacy dir is now
        # mixed-schema; batch 2 must still probe the legacy rows
        corpus._srp_gate_batch(batch1, idx, surv)
        corpus._srp_gate_batch(batch2, idx, surv)
        return {r.vec_id for r in spark.read.parquet(surv).collect()}

    assert run("idx_modern", False) == run("idx_legacy", True)


def test_bottomk_migration_crash_resume_commits_success_last(
    spark, sf_dir, tmp_path
):
    """Round-11 advice: the legacy→v0 migration must move data part
    files FIRST and the _SUCCESS marker LAST, so a crash mid-migration
    leaves v0 UNCOMMITTED (invisible to _latest_state_version) and the
    re-run finishes the move — never a committed v0 over partial data.
    Simulates the worst crash points by hand-arranging the dir."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.sources.tables import load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    legacy = docs.select(
        "source",
        "doc_id",
        F.md5(
            F.concat_ws(":", F.lit("fk"), F.col("doc_id").cast("string"), "source")
        ).alias("h"),
    ).repartition(4)
    legacy_set = {(r.source, r.doc_id) for r in legacy.collect()}

    def crash_state(name, move_parts, move_success):
        state = str(tmp_path / name)
        legacy.write.parquet(state)
        parts = sorted(
            f for f in os.listdir(state) if f.startswith("part-")
        )
        os.makedirs(os.path.join(state, "v0"), exist_ok=True)
        for f in parts[:move_parts]:
            shutil.move(os.path.join(state, f), os.path.join(state, "v0", f))
        if move_success:
            shutil.move(
                os.path.join(state, "_SUCCESS"),
                os.path.join(state, "v0", "_SUCCESS"),
            )
        return state

    # crash mid-parts: v0 has some parts, no _SUCCESS anywhere in v0
    st = crash_state("mid", move_parts=2, move_success=False)
    assert corpus._latest_state_version(spark, st) is None  # uncommitted
    got = {
        (r.source, r.doc_id)
        for r in corpus.read_bottomk_sample(spark, st).collect()
    }
    assert got and got <= legacy_set
    assert os.path.exists(os.path.join(st, "v0", "_SUCCESS"))
    assert corpus._latest_state_version(spark, st) == 0

    # crash after the last part, before the marker: only _SUCCESS flat
    st2 = crash_state("tail", move_parts=4, move_success=False)
    got2 = {
        (r.source, r.doc_id)
        for r in corpus.read_bottomk_sample(spark, st2).collect()
    }
    assert got2 == got
    assert corpus._latest_state_version(spark, st2) == 0


def test_minhash_gate_adaptive_admit_switches_on_batch_size(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Round-10 verdict ask #1: with distributed_admit=None the gate
    must pick the admit branch from the MEASURED batch size against
    ADMIT_DRIVER_MAX — driver walk below, executor-side above — and
    both runs must produce the identical survivor set (the property the
    switch rests on). The distributed branch is proven taken by
    patching the threshold below the batch size and spying the call."""
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.sources.tables import load_table
    from realtimevotingdataengineer_spark.streaming import corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    cut = (mx + 1) * 4 // 5
    base = docs.filter(F.col("doc_id") < cut)
    batch = docs.filter(F.col("doc_id") >= cut)
    calls: list = []
    real = corpus._greedy_admit_frames

    def spy(ids, flagged, pairs):
        calls.append(1)
        return real(ids, flagged, pairs)

    monkeypatch.setattr(corpus, "_greedy_admit_frames", spy)

    def run(name, threshold):
        monkeypatch.setattr(corpus, "ADMIT_DRIVER_MAX", threshold)
        idx = str(tmp_path / f"{name}_idx")
        corpus.build_minhash_index(base, idx)
        surv = str(tmp_path / f"{name}_surv")
        corpus._minhash_gate_batch(batch, idx, surv)  # adaptive default
        return {r.doc_id for r in spark.read.parquet(surv).collect()}

    walk = run("walk", 10**9)  # far above batch size -> driver walk
    assert calls == []
    dist = run("dist", 1)  # far below -> distributed branch
    assert calls == [1]
    assert walk == dist and walk


def test_srp_gate_prescreen_lossless(spark, sf_dir, tmp_path):
    """Round 13: the int8 bound pre-screen on the batch×index verify
    must be LOSSLESS — the gate's survivor set with prescreen on must
    equal the exact-join branch's bit for bit, on a corpus built to be
    adversarial for a bound screen: planted batch↔index pairs at exact
    cosines straddling θ by ±1e-6 / ±1e-3 / ±0.02 (deep inside any
    honest margin), plus certain-dup (0.9) and certain-non-dup (0.1)
    pairs that exercise both bound-decided branches. (Zero-norm
    vectors are outside the gate's contract either way: under Spark
    4's ANSI default the exact cosine's 0/0 throws in BOTH branches
    identically, so there is nothing to compare.)"""
    import numpy as np

    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.operators.dedup import COSINE_THETA
    from realtimevotingdataengineer_spark.streaming import corpus

    rng = np.random.default_rng(7)
    dim = 64

    def planted(base, c):
        vn = base / np.linalg.norm(base)
        u = rng.standard_normal(dim)
        u -= (u @ vn) * vn
        u /= np.linalg.norm(u)
        return (c * vn + np.sqrt(1 - c * c) * u) * np.linalg.norm(base)

    idx_rows, bat_rows = [], []
    offsets = [-2e-2, -1e-3, -1e-6, 1e-6, 1e-3, 2e-2]
    targets = [COSINE_THETA + o for o in offsets] + [0.9, 0.1]
    for i, c in enumerate(targets):
        base = rng.standard_normal(dim) * rng.uniform(0.5, 2.0)
        idx_rows.append((1000 + i, [float(x) for x in base]))
        bat_rows.append((i, [float(x) for x in planted(base, c)]))
    # background vectors on both sides (no zero vectors: zero-norm is
    # outside the gate's contract in BOTH arms — see
    # test_ansi_double_div_by_zero_throws for the measured behavior the
    # gate docstrings rely on)
    for j in range(40):
        idx_rows.append((2000 + j, [float(x) for x in rng.standard_normal(dim)]))
        bat_rows.append((100 + j, [float(x) for x in rng.standard_normal(dim)]))
    idx_df = spark.createDataFrame(idx_rows, "vec_id bigint, embedding array<double>")
    survs = {}
    for mode in (True, False):
        ip = str(tmp_path / f"idx_{mode}")
        sp = str(tmp_path / f"surv_{mode}")
        corpus.build_srp_stream_index(idx_df, ip)
        batch = spark.createDataFrame(
            bat_rows, "vec_id bigint, embedding array<double>"
        )
        corpus._srp_gate_batch(batch, ip, sp, prescreen=mode)
        survs[mode] = sorted(
            r.vec_id
            for r in spark.read.parquet(sp).select("vec_id").distinct().collect()
        )
    assert survs[True] == survs[False]
    # vacuity guards: the corpus must exercise both outcomes
    assert survs[True], "nothing admitted — test corpus degenerate"
    assert len(survs[True]) < len(bat_rows), "nothing flagged — no dups hit"


def test_ansi_double_div_by_zero_throws(spark):
    """Pins the MEASURED Spark 4.1.2 ANSI contract the SRP-gate
    docstrings rely on: DOUBLE division by zero THROWS (DIVIDE_BY_ZERO)
    — it does NOT follow IEEE to ±Inf/NaN. Round-13 advice claimed the
    IEEE behavior (0/0 → NaN, silently flagged via NaN >= θ); tested
    round 14 on this build, both 1.0/0.0 and 0.0/0.0 throw at runtime
    (non-constant operands, so no constant-folding shortcut). Hence a
    zero-norm vector makes the exact cosine THROW in both the prescreen
    and the exact gate arm identically — 'zero-norm is outside the
    contract' stays the accurate description. If a Spark upgrade flips
    this test, re-audit _prescreened_flags' zero-norm routing: under
    IEEE semantics zero vectors would be silently NaN-flagged instead
    (NaN >= θ is true under Spark's NaN ordering — also measured)."""
    import pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0.0, 0.0), (1.0, 0.0)], "a double, b double")
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        df.select((F.col("a") / F.col("b")).alias("c")).collect()
    nan = spark.createDataFrame(
        [(float("nan"),)], "c double"
    ).select((F.col("c") >= F.lit(0.4)).alias("x"))
    assert nan.collect()[0].x is True
