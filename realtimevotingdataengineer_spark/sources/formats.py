"""Batch format adapters beyond parquet: CSV / JSON / JSONL.

The reference's interchange format is JSON text on Kafka (main.py:217)
and row INSERTs into Postgres (sink_insert_row, main.py:121-132). A
complete engine reads and writes the common batch formats with explicit
schemas (never inference in production paths — SURVEY §1.4).

Scale notes: JSON/CSV are row formats — fine as ingress, wrong as the
system of record. `to_parquet_partitioned` is the canonical landing
pattern: date-partitioned parquet so every later scan partition-prunes
(see tests/test_formats.py for the plan-level proof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """JSON-lines with an explicit schema (no sampling pass, no surprise
    type widening — schema inference is a correctness bug at 100 TB)."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def to_parquet_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", parts: tuple[str, ...] = ("event_date",)
) -> None:
    """Land a fact stream as date-partitioned parquet — the layout that
    makes partition pruning (and at 100 TB, life) possible. The partition
    column derives from event time; writers co-locate a day per
    directory, readers with a date predicate never open other days."""
    out = df.withColumn("event_date", F.to_date(F.col(ts_col)))
    out.write.mode("overwrite").partitionBy(*parts).parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet
    (PushedFilters / ReadSchema appear in the plan identically); the
    format choice is a storage-team decision, not an engine constraint."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)
