"""Batch table sources: the driver's parquet star schema.

Reference analog: ``scan_table_full`` (main.py:170-175) — a full relational
scan. Here every scan is a parquet ``spark.read`` so Catalyst gets
predicate pushdown + column pruning for free (check ``PushedFilters`` /
``ReadSchema`` in ``.explain("formatted")``).

Scale note (100 TB): facts (lineitem/orders/events) would be
date-partitioned parquet/Delta in production; the loader keeps the access
path behind one function so partition-pruned reads slot in without
touching operator code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import configure_for_queries

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects outright. Read it as raw int64 nanos and truncate to
        # microseconds JVM-side — the same ns→µs truncation DuckDB
        # applies, so oracle comparisons agree exactly.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        # The conf is only needed while the relation is resolved (the
        # reader captures it at read time), so restore the previous value
        # afterwards rather than mutating the externally-owned session's
        # behavior for every later parquet read.
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.select(
                *[
                    F.timestamp_micros(F.expr("ts div 1000")).alias("ts")
                    if c == "ts"
                    else F.col(c)
                    for c in df.columns
                ]
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


class Tables:
    """Lazy handle bundle for one scale-factor directory.

    Each attribute is a plain DataFrame, so operators stay pure
    DataFrame→DataFrame functions and the binding to a scale factor
    happens in exactly one place.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = configure_for_queries(spark)
        self.sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            df = load_table(self.spark, self.sf_dir, name)
            setattr(self, name, df)  # cache: parquet scans are cheap to re-plan but this keeps plans stable
            return df
        raise AttributeError(name)
