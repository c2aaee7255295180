"""JDBC source/sink adapters — the reference's Postgres path.

The reference stores its system of record in Postgres (DDL main.py:15-64,
row INSERTs main.py:121-132 / voting.py:112-116) and wires the Postgres
JDBC driver into Spark (spark-streaming.py:23). These adapters are the
Spark-native equivalents:

- ``read_jdbc``   ← scan_table_full (main.py:170-175)
- ``write_jdbc``  ← sink_insert_row, set-at-a-time instead of row-at-a-time
- ``write_jdbc_batches`` ← the intended streaming→Postgres leg
  (foreachBatch + JDBC append; the insert-then-produce transactional
  ordering of voting.py:120-126 maps to per-micro-batch transactions)

Tests run against Spark's bundled embedded Derby (no server needed);
production swaps the URL/driver for Postgres — the API is identical.

Scale notes: ``numPartitions``/``partitionColumn`` shard a JDBC scan into
range-parallel reads; writes go through executor-side batched INSERTs
(``batchsize``). A relational store is the system-of-record edge of the
pipeline, not the analytics path — facts land in parquet/Delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

#: Embedded Derby's public JDBC driver class (the bundled test double
#: for the reference's org.postgresql.Driver).
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(path: str) -> str:
    """Embedded-Derby URL for tests: one directory per database."""
    return f"jdbc:derby:{path};create=true"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    batchsize: int = 1000,
) -> None:
    """Set-at-a-time JDBC write (vs the reference's per-row INSERT +
    commit loop, main.py:205-227): each partition opens one connection
    and streams batched INSERTs."""
    w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        w = w.option("driver", driver)
    w.option("batchsize", str(batchsize)).mode(mode).save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 1,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """JDBC scan. With ``partition_column`` + bounds the scan becomes
    ``num_partitions`` range-parallel queries — the distributed form of
    scan_table_full."""
    if partition_column is not None and (lower_bound is None or upper_bound is None):
        raise ValueError(
            "read_jdbc: partition_column requires both lower_bound and "
            "upper_bound (str(None) would reach the JDBC source as the "
            "literal string 'None')"
        )
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return r.load()


def write_jdbc_batches(
    df: DataFrame,
    url: str,
    table: str,
    checkpoint: str,
    driver: str | None = None,
) -> StreamingQuery:
    """Streaming → relational store: foreachBatch JDBC append. Each
    micro-batch is one set-based transaction per partition — the Spark
    rendering of the reference's insert-then-produce ordering
    (voting.py:120-126). At-least-once into the table (checkpoint replay
    re-appends an uncommitted batch); pair with a key constraint or a
    MERGE-capable store for exactly-once, as the reference's
    UNIQUE(voter_id) does."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        write_jdbc(batch, url, table, mode="append", driver=driver)

    return (
        df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
