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


def test_idempotent_parquet_batches_survives_replay(spark, tmp_path):
    """idempotent=True: re-running from a wiped checkpoint replays the
    same batch ids; dynamic partition overwrite on batch_id must leave
    the table duplicate-free (append mode would double every row)."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        "\n".join(json.dumps({"voter_id": f"v{i}", "n": i}) for i in range(10))
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema("voter_id string, n long").json(str(src))
        q = sinks.write_parquet_batches(stream, out, ckpt, idempotent=True)
        q.processAllAvailable()
        q.stop()

    run_once()
    shutil.rmtree(ckpt)  # lose the checkpoint -> batch id 0 replays
    run_once()
    back = spark.read.parquet(out)
    assert back.count() == 10
    assert {r["voter_id"] for r in back.collect()} == {f"v{i}" for i in range(10)}
    assert "batch_id" in back.columns


def test_upsert_raises_on_corrupt_table(spark, tmp_path):
    """A corrupt existing table must FAIL the micro-batch, not silently
    rebuild the table from the incoming batch alone."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(json.dumps({"voter_id": "v0", "ts": 1}))
    table = tmp_path / "table"
    table.mkdir()
    # a parquet "file" with a valid magic-length but garbage content
    (table / "part-00000.parquet").write_bytes(b"PAR1garbagegarbage")
    q = sinks.upsert_parquet_batches(
        spark.readStream.schema("voter_id string, ts long").json(str(src)),
        str(table),
        str(tmp_path / "ckpt2"),
        key="voter_id",
        version_col="ts",
    )
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with _pytest.raises(StreamingQueryException):
        q.processAllAvailable()
    q.stop()
    # the corrupt file must still be there -- NOT replaced by the batch
    assert (table / "part-00000.parquet").read_bytes().startswith(b"PAR1garbage")


def test_scd2_keeps_full_history(spark, tmp_path):
    """SCD2 sink: every version retained, valid_from/valid_to chain
    correctly, exactly one current row per key, redelivery of an
    identical version does not fork history."""
    src = tmp_path / "src"
    src.mkdir()
    b1 = [
        {"voter_id": "v0", "candidate_id": "cand-0", "voting_time": "2024-05-01 09:00:00"},
        {"voter_id": "v1", "candidate_id": "cand-1", "voting_time": "2024-05-01 09:00:00"},
    ]
    b2 = [
        {"voter_id": "v0", "candidate_id": "cand-9", "voting_time": "2024-05-01 09:30:00"},
        # exact redelivery of v1's first version:
        {"voter_id": "v1", "candidate_id": "cand-1", "voting_time": "2024-05-01 09:00:00"},
    ]
    b3 = [
        {"voter_id": "v0", "candidate_id": "cand-5", "voting_time": "2024-05-01 10:00:00"},
    ]
    for i, b in enumerate((b1, b2, b3)):
        (src / f"b{i}.jsonl").write_text("\n".join(json.dumps(r) for r in b))
    stream = (
        spark.readStream.schema(
            "voter_id string, candidate_id string, voting_time timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = sinks.scd2_parquet_batches(
        stream,
        str(tmp_path / "hist"),
        str(tmp_path / "ckpt_scd2"),
        key="voter_id",
        version_col="voting_time",
    )
    q.processAllAvailable()
    q.stop()
    hist = spark.read.parquet(str(tmp_path / "hist"))
    v0 = sorted(
        hist.filter(F.col("voter_id") == "v0").collect(),
        key=lambda r: r["valid_from"],
    )
    assert [r["candidate_id"] for r in v0] == ["cand-0", "cand-9", "cand-5"]
    # chain: each valid_to equals the next valid_from; only last is open
    assert v0[0]["valid_to"] == v0[1]["valid_from"]
    assert v0[1]["valid_to"] == v0[2]["valid_from"]
    assert v0[2]["valid_to"] is None and v0[2]["is_current"]
    assert [r["is_current"] for r in v0] == [False, False, True]
    v1 = hist.filter(F.col("voter_id") == "v1").collect()
    assert len(v1) == 1 and v1[0]["is_current"]  # redelivery collapsed


def test_recover_swap_restores_mid_crash_state(spark, tmp_path):
    """Simulated crash between the two swap moves: table path absent,
    newest __old_ backup holds the only full copy. Recovery must
    restore it — NOT treat the sink as a fresh table."""
    import shutil
    import time as _time

    table = str(tmp_path / "table")
    spark.range(5).withColumnRenamed("id", "voter_id").write.parquet(table)
    # crash state: table moved aside, staging half-written, plus an
    # older stale backup from an earlier completed swap
    shutil.copytree(table, f"{table}__old_stale")
    _time.sleep(0.05)  # mtime-distinguishable
    shutil.move(table, f"{table}__old_fresh")
    (tmp_path / "table__staging").mkdir()
    (tmp_path / "table__staging" / "junk").write_text("partial")

    current = sinks._read_current(spark, table)
    assert current is not None and current.count() == 5
    import os

    assert not os.path.exists(f"{table}__staging")
    assert not os.path.exists(f"{table}__old_stale")
    assert not os.path.exists(f"{table}__old_fresh")


def test_scd2_sink_equals_batch_rebuild(spark, tmp_path):
    """The streaming SCD2 sink and the batch scd2_user_state_history
    rebuild must produce the SAME dimension history from the same
    change stream — the incremental-table vs nightly-rebuild equality
    a lakehouse SCD2 pipeline depends on. The change stream is each
    user's state transitions (derived from the driver events); it is
    split across two file batches mid-history, so the sink accumulates
    incrementally while the batch key sees everything at once."""
    import json as _json

    import realtimevotingdataengineer_spark.operators  # noqa: F401
    from realtimevotingdataengineer_spark.registry import QUERIES
    from realtimevotingdataengineer_spark.sources.tables import Tables

    t = Tables(spark, "/root/testdata/sf0.001")
    batch = QUERIES["scd2_user_state_history"](t).collect()
    # the change stream: one row per (user, run) at its valid_from
    changes = sorted(
        ({"user_id": r.user_id, "state": r.state, "vf": r.valid_from} for r in batch),
        key=lambda c: (c["vf"], c["user_id"]),
    )
    src = tmp_path / "src"
    src.mkdir()
    half = len(changes) // 2
    for i, chunk in enumerate((changes[:half], changes[half:])):
        (src / f"b{i}.jsonl").write_text(
            "\n".join(_json.dumps(c) for c in chunk)
        )
    stream = (
        spark.readStream.schema("user_id long, state string, vf string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = sinks.scd2_parquet_batches(
        stream,
        str(tmp_path / "hist"),
        str(tmp_path / "ckpt"),
        key="user_id",
        version_col="vf",
    )
    q.processAllAvailable()
    q.stop()
    hist = {
        (r.user_id, r.valid_from): (r.state, r.valid_to, r.is_current)
        for r in spark.read.parquet(str(tmp_path / "hist")).collect()
    }
    expected = {
        (r.user_id, r.valid_from): (r.state, r.valid_to, r.is_current) for r in batch
    }
    assert hist == expected
