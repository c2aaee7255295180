"""foreachBatch upsert sink: latest-per-key across micro-batches."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from realtimevotingdataengineer_spark.streaming import sinks


def test_upsert_latest_wins(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: v0..v4 vote cand-0; batch 2: v0, v2 change to cand-9
    b1 = [
        {"voter_id": f"v{i}", "candidate_id": "cand-0", "voting_time": "2024-05-01 09:00:00"}
        for i in range(5)
    ]
    b2 = [
        {"voter_id": v, "candidate_id": "cand-9", "voting_time": "2024-05-01 09:30:00"}
        for v in ("v0", "v2")
    ]
    (src / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in b1))
    (src / "b2.jsonl").write_text("\n".join(json.dumps(r) for r in b2))
    stream = (
        spark.readStream.schema(
            "voter_id string, candidate_id string, voting_time timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = sinks.upsert_parquet_batches(
        stream,
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        key="voter_id",
        version_col="voting_time",
    )
    q.processAllAvailable()
    q.stop()
    final = spark.read.parquet(str(tmp_path / "table"))
    assert final.count() == 5  # still one row per voter
    got = {r.voter_id: r.candidate_id for r in final.collect()}
    assert got == {
        "v0": "cand-9",
        "v1": "cand-0",
        "v2": "cand-9",
        "v3": "cand-0",
        "v4": "cand-0",
    }
