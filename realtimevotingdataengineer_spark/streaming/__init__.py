from .pipeline import (
    dedup_one_vote,
    leading_candidate_batch,
    parse_vote_events,
    read_kafka_votes,
    read_text_stream,
    tally_per_candidate,
    tally_per_party,
    windowed_tally,
    with_event_time,
)
from .sinks import write_kafka_agg, write_memory, write_parquet_batches

__all__ = [
    "dedup_one_vote",
    "leading_candidate_batch",
    "parse_vote_events",
    "read_kafka_votes",
    "read_text_stream",
    "tally_per_candidate",
    "tally_per_party",
    "windowed_tally",
    "with_event_time",
    "write_kafka_agg",
    "write_memory",
    "write_parquet_batches",
]
