"""Deterministic voting-domain generator (reference-parity seed source).

Replaces the reference's HTTP record source (randomuser.me GETs at
main.py:68-116) with partition-parallel column expressions: the identity
``spark.range(n)`` plus deterministic derivations. No Python `random` in
tasks — the reference seeds its RNG (main.py:12); we derive every
"random" choice from a seeded xxhash64/pmod of the row id so results are
stable across partitionings, retries and cluster sizes.

Semantics replicated:
- 3 candidates, parties round-robin ``PARTIES[i % 3]`` (main.py:8,80,181)
- 1000 voters with full name concat (main.py:79,97), nested address
  struct (main.py:102-108), registered_age 18-90 (FIXTURES.md A2)
- votes: each voter votes exactly once for a seeded-uniform candidate
  (voting.py:99), vote = 1 (voting.py:102), voting_time spread over a
  10-minute window as 'yyyy-MM-dd HH:mm:ss' strings (voting.py:101)
- a raw *event stream* variant with duplicate votes and late arrivals to
  exercise the dedup/watermark path (voting.py:112-126 semantics)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import PARTIES, round_robin

SEED = 21  # reference seeds random with 21 at main.py:12

STATES = [
    "Alabama",
    "Colorado",
    "Georgia",
    "Kansas",
    "Montana",
    "Nevada",
    "Ohio",
    "Texas",
    "Utah",
    "Vermont",
]

FIRST = ["Alex", "Blair", "Casey", "Drew", "Emery", "Flynn", "Gray", "Haven"]
LAST = ["Stone", "Rivers", "Fields", "Woods", "Brooks", "Hayes", "Lane", "Cole"]


def _pick(col, choices: list[str], salt: str):
    """Deterministic uniform pick from a list, seeded per column value."""
    idx = F.pmod(F.xxhash64(col, F.lit(salt), F.lit(SEED)), F.lit(len(choices)))
    return F.element_at(F.array(*[F.lit(c) for c in choices]), (idx + 1).cast("int"))


def candidates(spark: SparkSession) -> DataFrame:
    """3-row candidates dimension (main.py:179-194)."""
    i = F.col("id")
    return spark.range(3).select(
        F.concat(F.lit("cand-"), i.cast("string")).alias("candidate_id"),
        F.concat_ws(
            " ", _pick(i, FIRST, "cf"), _pick(i, LAST, "cl")
        ).alias("candidate_name"),
        round_robin(i, PARTIES).alias("party_affiliation"),
        F.lit("A brief bio of the candidate.").alias("biography"),
        F.lit("Key campaign promises here.").alias("campaign_platform"),
        F.concat(F.lit("https://example.invalid/photo/"), i.cast("string")).alias("photo_url"),
    )


def voters(spark: SparkSession, n: int = 1000) -> DataFrame:
    """n-row voters dimension, nested-address (event) form (main.py:95-114)."""
    i = F.col("id")
    age = (F.pmod(F.xxhash64(i, F.lit("age"), F.lit(SEED)), F.lit(73)) + 18).cast("int")
    birth_year = (F.lit(2024) - age).cast("string")
    return spark.range(n).select(
        F.concat(F.lit("voter-"), i.cast("string")).alias("voter_id"),
        F.concat_ws(" ", _pick(i, FIRST, "vf"), _pick(i, LAST, "vl")).alias("voter_name"),
        F.concat(birth_year, F.lit("-06-15T00:00:00.000Z")).alias("date_of_birth"),
        _pick(i, ["male", "female"], "g").alias("gender"),
        F.lit("US").alias("nationality"),
        F.concat(F.lit("reg-"), F.lpad(i.cast("string"), 6, "0")).alias("registration_number"),
        F.struct(
            F.concat(
                (F.pmod(F.xxhash64(i, F.lit("st"), F.lit(SEED)), F.lit(9000)) + 100).cast("string"),
                F.lit(" Main St"),
            ).alias("street"),
            F.concat(F.lit("City"), F.pmod(i, F.lit(50)).cast("string")).alias("city"),
            _pick(i, STATES, "state").alias("state"),
            F.lit("United States").alias("country"),
            F.lpad(F.pmod(F.xxhash64(i, F.lit("zip"), F.lit(SEED)), F.lit(100000)).cast("string"), 5, "0").alias("postcode"),
        ).alias("address"),
        F.concat(F.lit("voter"), i.cast("string"), F.lit("@example.invalid")).alias("email"),
        F.lit("555-0100").alias("phone_number"),
        F.lit("555-0199").alias("cell_number"),
        F.concat(F.lit("https://example.invalid/pic/"), i.cast("string")).alias("picture"),
        age.alias("registered_age"),
    )


def votes(spark: SparkSession, n_voters: int = 1000) -> DataFrame:
    """One enriched vote event per voter: the dict-union
    voter ∪ chosen_candidate ∪ {voting_time, vote:1} (voting.py:99-103),
    realized as a broadcast join against the 3-row candidates dim with a
    seeded-uniform pick — no Python randomness, no shuffle of the fact
    side."""
    v = voters(spark, n_voters)
    c = candidates(spark)
    pick = F.pmod(F.xxhash64(F.col("voter_id"), F.lit("pick"), F.lit(SEED)), F.lit(3))
    enriched = (
        v.withColumn("pick", pick)
        .join(
            F.broadcast(c),
            F.col("pick") == F.expr("CAST(substring(candidate_id, 6) AS BIGINT)"),
        )
        .drop("pick")
    )
    offset_sec = F.pmod(F.xxhash64(F.col("voter_id"), F.lit("t"), F.lit(SEED)), F.lit(600))
    voting_time = F.date_format(
        F.to_timestamp(F.lit("2024-05-01 09:00:00")) + F.make_dt_interval(secs=offset_sec),
        "yyyy-MM-dd HH:mm:ss",
    )
    return enriched.select(
        "voter_id",
        voting_time.alias("voting_time"),
        "voter_name",
        "party_affiliation",
        "biography",
        "campaign_platform",
        "photo_url",
        "candidate_id",
        "candidate_name",
        "date_of_birth",
        "gender",
        "nationality",
        "registration_number",
        "address",
        "email",
        "phone_number",
        "cell_number",
        "picture",
        "registered_age",
        F.lit(1).alias("vote"),
    )


def vote_events_raw(spark: SparkSession, n_voters: int = 200) -> DataFrame:
    """Kafka-shaped raw stream fixture: key/value string pairs with
    deliberate duplicates (every 10th voter votes twice — the UNIQUE
    violation path, voting.py:120-126) and late events (every 25th event
    timestamped 5 minutes earlier), for dedup/watermark tests."""
    base = votes(spark, n_voters)
    dups = base.filter(F.pmod(F.expr("CAST(substring(voter_id, 7) AS BIGINT)"), F.lit(10)) == 0)
    dups = dups.withColumn(
        "candidate_id", F.concat(F.lit("cand-"), F.lit(0).cast("string"))
    ).withColumn(
        "voting_time",
        F.date_format(
            F.to_timestamp(F.col("voting_time")) + F.make_dt_interval(secs=F.lit(30)),
            "yyyy-MM-dd HH:mm:ss",
        ),
    )
    late = base.filter(F.pmod(F.expr("CAST(substring(voter_id, 7) AS BIGINT)"), F.lit(25)) == 0)
    late = late.withColumn(
        "voting_time",
        F.date_format(
            F.to_timestamp(F.col("voting_time")) - F.make_dt_interval(mins=F.lit(5)),
            "yyyy-MM-dd HH:mm:ss",
        ),
    )
    all_events = base.unionByName(dups).unionByName(late)
    return all_events.select(
        F.col("voter_id").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in all_events.columns])).alias("value"),
    )
