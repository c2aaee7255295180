"""Operator registry: one place where every SURVEY.md §2 key is wired to
(a) a Spark DataFrame builder and (b) its ANSI-SQL oracle twin.

``__spark_entry__.queries()/oracle_sql()`` are thin views over this.
Operators registered with ``sql=None`` get the driver's weaker rows-only
check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from .sources.tables import Tables

QueryFn = Callable[[Tables], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(key: str, sql: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate operator key {key!r}")
        QUERIES[key] = fn
        if sql is not None:
            ORACLES[key] = sql
        return fn

    return deco
