"""Voting-domain golden tests (SURVEY.md §5.5): regenerate the reference's
seed state deterministically and assert exact tally semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtimevotingdataengineer_spark.functions import PARTIES
from realtimevotingdataengineer_spark.sources import generator
from realtimevotingdataengineer_spark.streaming import pipeline


def test_candidates_shape(spark):
    c = generator.candidates(spark).collect()
    assert len(c) == 3
    # one candidate per party, round-robin (main.py:80)
    assert sorted(r.party_affiliation for r in c) == sorted(PARTIES)
    assert all(r.candidate_id.startswith("cand-") for r in c)


def test_generator_deterministic(spark):
    a = generator.votes(spark, 100).orderBy("voter_id").collect()
    b = generator.votes(spark, 100).orderBy("voter_id").collect()
    assert a == b


def test_votes_one_per_voter_sum_matches(spark):
    v = generator.votes(spark, 500)
    assert v.count() == 500
    assert v.select("voter_id").distinct().count() == 500
    # per-candidate totals sum to the voter count (vote = 1 each)
    tally = v.groupBy("candidate_id").agg(F.sum("vote").alias("t")).collect()
    assert sum(r.t for r in tally) == 500
    assert len(tally) == 3  # every candidate gets some votes at n=500


def test_party_totals_equal_candidate_totals(spark):
    """1 candidate per party (Note...txt:17) ⇒ identical tallies."""
    v = generator.votes(spark, 300)
    per_cand = {
        r.party_affiliation: r.t
        for r in v.groupBy("candidate_id", "party_affiliation")
        .agg(F.sum("vote").alias("t"))
        .collect()
    }
    per_party = {
        r.party_affiliation: r.t
        for r in v.groupBy("party_affiliation").agg(F.sum("vote").alias("t")).collect()
    }
    assert per_cand == per_party


def test_leading_candidate_deterministic(spark):
    v = generator.votes(spark, 300)
    tally = pipeline.tally_per_candidate(v)
    winner1 = pipeline.leading_candidate_batch(tally).collect()
    winner2 = pipeline.leading_candidate_batch(tally).collect()
    assert winner1 == winner2 and len(winner1) == 1
    # winner is the argmax of the tally
    totals = {r.candidate_name: r.total_votes for r in tally.collect()}
    assert winner1[0].total_votes == max(totals.values())


def test_nested_address_flatten_roundtrip(spark):
    """address struct ↔ address_* columns (main.py:127-129)."""
    v = generator.voters(spark, 50)
    flat = v.select(
        "voter_id",
        F.col("address.street").alias("address_street"),
        F.col("address.state").alias("address_state"),
    )
    rebuilt = flat.select(
        "voter_id",
        F.struct(
            F.col("address_street").alias("street"),
            F.col("address_state").alias("state"),
        ).alias("address"),
    )
    orig = {r.voter_id: (r.address.street, r.address.state) for r in v.collect()}
    back = {r.voter_id: (r.address.street, r.address.state) for r in rebuilt.collect()}
    assert orig == back


def test_turnout_by_state_sums_to_voters(spark):
    v = generator.votes(spark, 400)
    turnout = v.groupBy(F.col("address.state").alias("state")).agg(
        F.count_distinct("voter_id").alias("turnout")
    )
    rows = turnout.collect()
    assert sum(r.turnout for r in rows) == 400
    assert len(rows) == len(generator.STATES)
