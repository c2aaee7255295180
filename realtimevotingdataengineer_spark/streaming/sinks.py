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


def _recover_swap(path: str) -> None:
    """Crash recovery for the staged-swap protocol: a previous run may
    have died between moving the table aside (``path__old_<uuid>``) and
    moving staging in — in that state the table path is absent and the
    only full copy is the newest backup. Restore it BEFORE any read, so
    a restart never mistakes a mid-swap crash for 'table does not exist
    yet' and silently rebuilds from one micro-batch. Stale staging
    output is deleted (its batch replays from the checkpoint); stale
    backups left by a crash after a completed swap are pruned."""
    import glob
    import os
    import shutil

    shutil.rmtree(f"{path}__staging", ignore_errors=True)

    def order_key(p: str) -> str:
        # backups are named path__old_<epoch_ns zero-padded>[_rand]: the
        # embedded timestamp is a stable total order immune to filesystem
        # mtime granularity/clock skew; legacy uuid-named backups fall
        # back to mtime rendered in the same 20-digit form
        tail = p.rsplit("__old_", 1)[1].split("_", 1)[0]
        if tail.isdigit() and len(tail) == 20:
            return tail
        return f"{int(os.path.getmtime(p) * 1e9):020d}"

    backups = sorted(glob.glob(f"{path}__old_*"), key=order_key)
    if backups and not os.path.exists(path):
        shutil.move(backups[-1], path)
        backups = backups[:-1]
    for stale in backups:
        shutil.rmtree(stale, ignore_errors=True)


def _read_current(spark, path: str) -> DataFrame | None:
    """Read the sink's current table, running crash recovery first.
    Returns None only for a genuinely absent table; any other read
    error (corrupt footer, permissions) propagates — it must NOT be
    treated as 'start fresh'."""
    from pyspark.errors import AnalysisException

    _recover_swap(path)
    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" not in str(exc):
            raise
        return None


def _swap_in(latest: DataFrame, path: str) -> None:
    """Stage-then-swap a rewritten table into ``path``. Not atomic (a
    plain filesystem has no directory rename transaction) but crash-safe
    in combination with _recover_swap: at every instant either ``path``
    or exactly one ``path__old_*`` backup holds a complete previous
    version, never a torn mix. A transactional table format
    (Delta/Iceberg) is the real fix at scale."""
    import shutil
    import time
    import uuid

    staging = f"{path}__staging"
    latest.write.mode("overwrite").parquet(staging)
    # zero-padded epoch_ns: lexical order == creation order, so recovery
    # picks the newest backup without trusting directory mtimes
    backup = f"{path}__old_{time.time_ns():020d}_{uuid.uuid4().hex[:4]}"
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
    per-batch logic is identical. Durability: see _swap_in/_recover_swap
    (mid-swap crashes restore the previous version on restart)."""
    from pyspark.sql import Window as W

    def handle(batch: DataFrame, batch_id: int) -> None:
        current = _read_current(batch.sparkSession, path)
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
        _swap_in(latest, path)

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

    Same durability posture as upsert_parquet_batches (_swap_in +
    _recover_swap: mid-swap crashes restore the previous version on
    restart), and the same corrupt-table guard: only PATH_NOT_FOUND
    means 'new table'. At-least-once replays of an identical (key,
    version) row collapse via the distinct() — redelivery does not fork
    history."""
    from pyspark.sql import Window as W

    def handle(batch: DataFrame, batch_id: int) -> None:
        incoming = batch.select(*batch.columns).withColumn(
            "valid_from", F.col(version_col)
        )
        current = _read_current(batch.sparkSession, path)
        if current is not None:
            current = current.drop("valid_to", "is_current")
        merged = (
            incoming if current is None else current.unionByName(incoming)
        ).distinct()
        w = W.partitionBy(key).orderBy(F.asc("valid_from"))
        history = merged.select(
            "*",
            F.lead("valid_from").over(w).alias("valid_to"),
        ).withColumn("is_current", F.col("valid_to").isNull())
        _swap_in(history, path)

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
