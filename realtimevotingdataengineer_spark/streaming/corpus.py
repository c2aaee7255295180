"""Streaming corpus ingestion: content-level dedup on the document
stream — the online half of operators/dedup.py's batch families.

A 100 TB/day crawl ingest cannot afford a nightly batch dedup pass over
the accumulated corpus; the content-signature filter has to run IN the
ingest stream, with state bounded by the signature cardinality (not
corpus bytes — state stores the md5, never the text). This module keeps
the same source-agnostic contract as streaming/pipeline.py: the
functions accept any streaming (or batch) DataFrame with a ``text``
column, so tests drive them from a file-backed stream and production
points them at the Kafka/landing-zone source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import normalize_text


def with_content_signature(docs: DataFrame) -> DataFrame:
    """Append ``sig``: md5 of the whitespace-normalized text — the
    identical canonical form operators/dedup.py::dedup_exact groups by,
    so the streaming filter and the batch pass agree doc-for-doc."""
    return docs.withColumn("sig", F.md5(normalize_text(F.col("text"))))


def stream_dedup_exact(
    docs: DataFrame, watermark_col: str | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """First-arrival-wins exact content dedup on a document stream:
    one survivor per normalized-content signature. With an event-time
    column, state is GC'd past the watermark (duplicates are assumed to
    arrive close together — re-crawls of an unchanged page); without
    one, state grows with DISTINCT content (md5 keys only — 16 bytes a
    document, the trade a backfill replay accepts).

    Batch-equivalence contract (pytest): the survivor SIGNATURE SET is
    exactly dedup_exact's group set — streaming picks first-arrival
    where batch picks min doc_id, so the chosen representative may
    differ, never the groups."""
    sig = with_content_signature(docs)
    if watermark_col is not None:
        return sig.withWatermark(watermark_col, watermark).dropDuplicates(["sig"])
    return sig.dropDuplicates(["sig"])


class StreamingTables:
    """Tables-shaped shim binding ``documents`` to a STREAMING
    DataFrame, so the registered batch operators — pure
    DataFrame→DataFrame functions — run UNCHANGED on the ingest stream.
    Every stateless operator (quality scoring, language ID, Gopher
    gates, token stats, fingerprints) is streaming-compatible by
    construction; pytest proves batch ≡ stream row-for-row. Operators
    with a terminal orderBy or corpus-level aggregation are the ones
    that genuinely need the batch pass (or a watermarked streaming
    twin) — the shim makes that boundary explicit instead of implied."""

    def __init__(self, spark, documents: DataFrame):
        self.spark = spark
        self.documents = documents
