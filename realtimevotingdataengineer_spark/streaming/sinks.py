"""Streaming sink adapters (SURVEY.md §2.1 sink rows).

- Kafka keyed-JSON sink: the corrected form of the reference's producer
  (sink_kafka_keyed_json, main.py:214-227 / voting.py:128-134 — whose
  `produceur = (conf)` bug meant votes never reached Kafka, bug 2).
- foreachBatch adapter: exactly-once-ish batch writes to parquet/JDBC —
  the insert-then-produce transactional ordering of voting.py:120-126
  maps to checkpointed micro-batches.
- memory sink: test harness (no broker in CI).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def write_kafka_agg(
    tally: DataFrame,
    checkpoint: str,
    servers: str = "localhost:9092",
    topic: str = "voting_results",
) -> StreamingQuery:
    """Re-emit aggregated tallies to a downstream topic for the live
    dashboard (sink_kafka_agg, Note...txt:34-36): key = candidate_id,
    value = JSON of the whole row, outputMode update."""
    payload = tally.select(
        F.col("candidate_id").cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in tally.columns])).alias("value"),
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def write_parquet_batches(
    df: DataFrame,
    path: str,
    checkpoint: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    mode: str = "append",
) -> StreamingQuery:
    """foreachBatch parquet sink: applies an optional per-batch transform
    (e.g. leading_candidate_batch — batch-only ops like sort/limit are
    legal here) then writes the micro-batch. Checkpointing makes the
    pipeline restartable with at-least-once output (idempotent overwrite
    per batch id gives effectively-once for deterministic transforms)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        out = transform(batch) if transform is not None else batch
        out.write.mode(mode).parquet(path)

    return (
        df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def upsert_parquet_batches(
    df: DataFrame,
    path: str,
    checkpoint: str,
    key: str,
    version_col: str,
) -> StreamingQuery:
    """foreachBatch upsert: latest row per key wins (ties by batch
    recency). The reference's INSERT ... UNIQUE(voter_id) conflict
    semantics (main.py:55, voting.py:112-126) expressed as a merge: each
    micro-batch is unioned with the current table and deduplicated by
    (key, max version). Plain parquet stand-in for a MERGE-capable table
    format — on a cluster this is Delta/Iceberg MERGE INTO; the
    per-batch logic is identical."""
    from pyspark.sql import Window as W

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        try:
            current = spark.read.parquet(path)
        except Exception:
            current = None
        # incoming batch wins version ties ("batch recency"): an
        # at-least-once redelivery with an identical version must not
        # nondeterministically resurrect the stored row
        tagged_batch = batch.withColumn("_is_new", F.lit(1))
        if current is None:
            merged = tagged_batch
        else:
            merged = current.withColumn("_is_new", F.lit(0)).unionByName(tagged_batch)
        w = W.partitionBy(key).orderBy(F.desc(version_col), F.desc("_is_new"))
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_is_new")
        )
        # write to a staging dir then swap — plain parquet cannot
        # read+overwrite the same path in one job
        staging = f"{path}__staging"
        latest.write.mode("overwrite").parquet(staging)
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        shutil.move(staging, path)

    return (
        df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def write_memory(
    df: DataFrame, name: str, output_mode: str = "update", available_now: bool = False
) -> StreamingQuery:
    """In-memory table sink for tests: query results with
    ``spark.sql(f"SELECT * FROM {name}")`` after processAllAvailable().

    ``available_now=True`` runs an AvailableNow trigger that processes
    the backlog and terminates — required for stateful operators with
    processing-time timeouts, whose wake-up batches otherwise keep
    ``processAllAvailable()`` from ever settling."""
    writer = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
