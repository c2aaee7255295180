"""Stream-stream join: votes ⨝ registrations with event-time interval."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from realtimevotingdataengineer_spark.streaming import pipeline, sinks


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    votes_dir = tmp_path_factory.mktemp("votes_stream")
    regs_dir = tmp_path_factory.mktemp("regs_stream")
    # registrations at 09:00; votes: in-window (+10m), out-of-window
    # (+45m > 30m horizon), and before-registration (-5m)
    regs = [
        {"voter_id": f"voter-{i}", "registered_at": "2024-05-01 09:00:00"}
        for i in range(6)
    ]
    votes = []
    for i, offset in enumerate(["09:10:00", "09:10:00", "09:45:00", "08:55:00", "09:29:59", "09:30:00"]):
        votes.append(
            {
                "voter_id": f"voter-{i}",
                "voting_time": f"2024-05-01 {offset}",
                "candidate_id": f"cand-{i % 3}",
                "vote": 1,
            }
        )
    (votes_dir / "v.jsonl").write_text("\n".join(json.dumps(v) for v in votes))
    (regs_dir / "r.jsonl").write_text("\n".join(json.dumps(r) for r in regs))
    return str(votes_dir), str(regs_dir)


def test_stream_stream_interval_join(spark, dirs):
    votes_dir, regs_dir = dirs
    votes = (
        spark.readStream.schema("voter_id string, voting_time string, candidate_id string, vote int")
        .json(votes_dir)
    )
    regs = (
        spark.readStream.schema("voter_id string, registered_at timestamp")
        .json(regs_dir)
    )
    joined = pipeline.join_votes_with_registrations(votes, regs)
    q = sinks.write_memory(joined, "vote_reg", "append")
    q.processAllAvailable()
    q.stop()
    got = {r.voter_id for r in spark.sql("SELECT * FROM vote_reg").collect()}
    # in-window: voters 0, 1 (+10m), 4 (+29:59), 5 (+30:00 == horizon, inclusive)
    # excluded: voter 2 (+45m, past horizon), voter 3 (voted before registering)
    assert got == {"voter-0", "voter-1", "voter-4", "voter-5"}
