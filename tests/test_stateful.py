"""applyInPandasWithState: custom per-voter attempt tracking, across
multiple micro-batches (state must persist between batches)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtimevotingdataengineer_spark.sources import generator
from realtimevotingdataengineer_spark.streaming import pipeline, sinks
from realtimevotingdataengineer_spark.streaming.stateful import track_vote_attempts


@pytest.fixture(scope="module")
def two_batch_dir(spark, tmp_path_factory):
    """Two files processed as two micro-batches (maxFilesPerTrigger=1):
    batch 1 = everyone's first vote; batch 2 = repeat votes from every
    5th voter."""
    path = tmp_path_factory.mktemp("attempts")
    base = generator.votes(spark, 50)
    first = base.select(
        F.col("voter_id").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in base.columns])).alias("value"),
    )
    (path / "batch1.jsonl").write_text("\n".join(r.value for r in first.collect()))
    repeats = base.filter(
        F.pmod(F.expr("CAST(substring(voter_id, 7) AS BIGINT)"), F.lit(5)) == 0
    )
    rep = repeats.select(F.to_json(F.struct(*[F.col(c) for c in repeats.columns])).alias("value"))
    (path / "batch2.jsonl").write_text("\n".join(r.value for r in rep.collect()))
    return str(path)


def test_attempts_accumulate_across_batches(spark, two_batch_dir):
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(two_batch_dir)
    )
    events = pipeline.parse_vote_events(raw)
    audited = track_vote_attempts(events)
    q = sinks.write_memory(audited, "attempts", "update", available_now=True)
    assert q.awaitTermination(300), "stateful query did not finish in time"
    out = spark.sql(
        "SELECT voter_id, max(attempts) AS attempts, max(is_duplicate) AS dup "
        "FROM attempts GROUP BY voter_id"
    ).collect()
    by_voter = {r.voter_id: (r.attempts, r.dup) for r in out}
    assert len(by_voter) == 50
    for voter_id, (attempts, dup) in by_voter.items():
        idx = int(voter_id.split("-")[1])
        if idx % 5 == 0:
            assert (attempts, dup) == (2, "yes"), voter_id
        else:
            assert (attempts, dup) == (1, "no"), voter_id


def test_transform_with_state_running_tally(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 typed-state API): the running
    per-candidate tally equals the batch truth after draining the
    backlog. Runs on the RocksDB state store (required by the API)."""
    import json as _json

    import pytest as _pytest

    from realtimevotingdataengineer_spark.streaming import sinks
    from realtimevotingdataengineer_spark.streaming.stateful import running_tally_tws

    if running_tally_tws is None:
        _pytest.skip(
            "transformWithStateInPandas unavailable: needs Spark 4 + protobuf "
            "(not shipped in this container; no installs allowed)"
        )

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"voter_id": f"v{i}", "candidate_id": f"cand-{i % 3}", "vote": 1}
        for i in range(60)
    ]
    half = len(rows) // 2
    (src / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in rows[:half]))
    (src / "b2.jsonl").write_text("\n".join(_json.dumps(r) for r in rows[half:]))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema("voter_id string, candidate_id string, vote long")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        tally = running_tally_tws(stream)
        q = sinks.write_memory(tally, "tws_tally", "update")
        q.processAllAvailable()
        q.stop()
        got = {
            r["candidate_id"]: r["total_votes"]
            for r in spark.sql(
                "SELECT candidate_id, max(total_votes) AS total_votes "
                "FROM tws_tally GROUP BY candidate_id"
            ).collect()
        }
        assert got == {"cand-0": 20, "cand-1": 20, "cand-2": 20}
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
