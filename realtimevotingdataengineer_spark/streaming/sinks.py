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
    idempotent: bool = False,
) -> StreamingQuery:
    """foreachBatch parquet sink: applies an optional per-batch transform
    (e.g. leading_candidate_batch — batch-only ops like sort/limit are
    legal here) then writes the micro-batch.

    Delivery semantics: with the default ``mode="append"`` the output is
    **at-least-once** — a restart after a written-but-uncheckpointed batch
    replays it and appends duplicate rows. Pass ``idempotent=True`` for
    effectively-once: each micro-batch lands in its own
    ``batch_id=<id>`` partition via dynamic partition overwrite, so a
    replayed batch overwrites its own partition instead of duplicating
    (readers see ``batch_id`` as an extra partition column)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        out = transform(batch) if transform is not None else batch
        if idempotent:
            (
                out.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(path)
            )
        else:
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
    per-batch logic is identical.

    Durability: the swap is a local-filesystem directory shuffle, not an
    atomic commit — the previous table version is kept aside during the
    swap and restored if the swap fails, but a hard crash between the two
    moves can still leave the table at the *previous* version (never a
    torn mix). A transactional table format is the real fix at scale."""
    import shutil
    import uuid

    from pyspark.errors import AnalysisException
    from pyspark.sql import Window as W

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        try:
            current = spark.read.parquet(path)
        except AnalysisException as exc:
            # only "table does not exist yet" means start fresh; any other
            # analysis/read error (corrupt footer, permissions) must NOT
            # silently rebuild the table from this micro-batch alone
            if "PATH_NOT_FOUND" not in str(exc):
                raise
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
        # read+overwrite the same path in one job. Move the old table
        # aside (not rmtree-first) so a failed swap can restore it.
        staging = f"{path}__staging"
        latest.write.mode("overwrite").parquet(staging)
        backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
        had_previous = False
        try:
            shutil.move(path, backup)
            had_previous = True
        except FileNotFoundError:
            pass
        try:
            shutil.move(staging, path)
        except Exception:
            if had_previous:
                shutil.move(backup, path)
            raise
        if had_previous:
            shutil.rmtree(backup, ignore_errors=True)

    return (
        df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def scd2_parquet_batches(
    df: DataFrame,
    path: str,
    checkpoint: str,
    key: str,
    version_col: str,
) -> StreamingQuery:
    """foreachBatch SCD-type-2 sink: full change history per key. Each
    row is stored with (valid_from = its version, valid_to = next
    version of the same key or NULL, is_current). Where
    upsert_parquet_batches keeps only the latest row, this keeps every
    version — the dimension-history pattern of a warehouse load.

    Same durability posture as upsert_parquet_batches (staged rewrite +
    move-aside swap; a transactional format is the scale answer), and
    the same corrupt-table guard: only PATH_NOT_FOUND means 'new
    table'. At-least-once replays of an identical (key, version) row
    collapse via the distinct() — redelivery does not fork history."""
    import shutil
    import uuid

    from pyspark.errors import AnalysisException
    from pyspark.sql import Window as W

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        incoming = batch.select(*batch.columns).withColumn(
            "valid_from", F.col(version_col)
        )
        try:
            current = spark.read.parquet(path).drop("valid_to", "is_current")
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" not in str(exc):
                raise
            current = None
        merged = (
            incoming if current is None else current.unionByName(incoming)
        ).distinct()
        w = W.partitionBy(key).orderBy(F.asc("valid_from"))
        history = merged.select(
            "*",
            F.lead("valid_from").over(w).alias("valid_to"),
        ).withColumn("is_current", F.col("valid_to").isNull())
        staging = f"{path}__staging"
        history.write.mode("overwrite").parquet(staging)
        backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
        had_previous = False
        try:
            shutil.move(path, backup)
            had_previous = True
        except FileNotFoundError:
            pass
        try:
            shutil.move(staging, path)
        except Exception:
            if had_previous:
                shutil.move(backup, path)
            raise
        if had_previous:
            shutil.rmtree(backup, ignore_errors=True)

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
