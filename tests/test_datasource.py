"""Custom Python DataSource (PySpark 4 API): the reference's HTTP voter
generator as a registered, partition-parallel `format("voters")` source."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtimevotingdataengineer_spark.sources.voter_datasource import (
    register_voter_source,
)


def test_voter_source_reads_partitioned(spark):
    register_voter_source(spark)
    df = spark.read.format("voters").option("n", "500").load()
    assert df.count() == 500
    assert df.select("voter_id").distinct().count() == 500
    assert df.rdd.getNumPartitions() == 8
    ages = df.agg(F.min("registered_age"), F.max("registered_age")).first()
    assert 18 <= ages[0] and ages[1] <= 87


def test_voter_source_partition_invariant(spark):
    """Record i is a pure function of (seed, i): the same voters come
    back under any partitioning — the reference's seeded-generator
    intent (main.py:12) made cluster-stable."""
    register_voter_source(spark)
    one = spark.read.format("voters").option("n", "200").option("numPartitions", "1")
    many = spark.read.format("voters").option("n", "200").option("numPartitions", "7")
    a = {tuple(r) for r in one.load().collect()}
    b = {tuple(r) for r in many.load().collect()}
    assert a == b and len(a) == 200


def test_voter_source_feeds_tally(spark):
    """The source slots into the analytic pipeline: turnout by state
    over generated voters (scan → agg, no driver-side generation)."""
    register_voter_source(spark)
    df = spark.read.format("voters").option("n", "300").load()
    by_state = df.groupBy("address_state").agg(F.count(F.lit(1)).alias("n"))
    rows = by_state.collect()
    assert sum(r["n"] for r in rows) == 300
    assert len(rows) == 5


def test_voter_source_streams(spark, tmp_path):
    """The same registered source streams: micro-batches advance the
    index offset; the drained stream equals the batch read of the same
    range (pure-function records => replay-safe offsets)."""
    from realtimevotingdataengineer_spark.streaming import sinks

    register_voter_source(spark)
    stream = (
        spark.readStream.format("voters")
        .option("n", "250")
        .option("rowsPerBatch", "100")
        .load()
    )
    q = sinks.write_memory(stream, "voter_stream", "append")
    q.processAllAvailable()
    q.stop()
    streamed = {tuple(r) for r in spark.sql("SELECT * FROM voter_stream").collect()}
    batch = {
        tuple(r)
        for r in spark.read.format("voters").option("n", "250").load().collect()
    }
    assert streamed == batch and len(streamed) == 250


def test_voter_stream_drives_full_reference_loop(spark):
    """The whole reference loop, fixture-free: custom streaming voters
    source → deterministic candidate assignment (voting.py:99's random
    pick, made key-stable) → stream-static enrich from the candidates
    dim → stateful tally. Totals conserve voters and split across all
    three candidates."""
    from pyspark.sql import functions as F

    from realtimevotingdataengineer_spark.sources import generator
    from realtimevotingdataengineer_spark.streaming import pipeline, sinks

    register_voter_source(spark)
    voters = (
        spark.readStream.format("voters")
        .option("n", "300")
        .option("rowsPerBatch", "120")
        .load()
    )
    n_cand = generator.candidates(spark).count()
    votes = voters.select(
        "voter_id",
        F.concat(
            F.lit("cand-"),
            (F.conv(F.substring(F.md5("voter_id"), 1, 6), 16, 10) % n_cand).cast(
                "string"
            ),
        ).alias("candidate_id"),
        F.lit(1).alias("vote"),
    )
    enriched = pipeline.enrich_with_candidates(votes, generator.candidates(spark))
    tally = pipeline.tally_per_candidate(enriched)
    q = sinks.write_memory(tally, "ds_loop_tally", "update")
    q.processAllAvailable()
    q.stop()
    got = {
        r["candidate_id"]: r["total_votes"]
        for r in spark.sql(
            "SELECT candidate_id, max(total_votes) AS total_votes "
            "FROM ds_loop_tally GROUP BY candidate_id"
        ).collect()
    }
    assert sum(got.values()) == 300
    assert len(got) == n_cand
    assert all(v > 0 for v in got.values())
