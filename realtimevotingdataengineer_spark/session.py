"""SparkSession construction and per-session engine configuration.

The reference pins its Spark session at spark-streaming.py:14-29 (app name
``RealtimeVotingEngineering``, AQE disabled for the streaming job). Our
policy (SURVEY.md §4): AQE ON for batch, OFF for streaming queries (Spark
ignores/partially supports it there anyway), session timezone pinned to
UTC because event timestamps travel as UTC strings (voting.py:101).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

APP_NAME = "realtimevotingdataengineer-spark"

#: Batch-session defaults. At 100 TB these are cluster-level knobs; the
#: values here are sized for local[32] test runs but the *shape* of the
#: config (AQE + skew join handling + sane shuffle parallelism) is what
#: carries to a 1000-executor deployment.
BATCH_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # Arrow for any pandas_udf / mapInPandas path (the only sanctioned
    # Python-side execution route — never row-at-a-time UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def get_spark(master: str | None = None, extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession with batch defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(APP_NAME).master(master or f"local[{cpus}]")
    for k, v in {**BATCH_CONF, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def configure_for_queries(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-owned session.

    The verify driver owns its own SparkSession; timestamp semantics must
    still be UTC (events carry UTC instants) and AQE should be on for
    batch plans. Only runtime-mutable confs are touched.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass  # static conf on some builds; harmless
    return spark
