"""Physical-plan auditing (the '.explain and iterate' discipline).

The engine's performance contract is structural, not incidental: filters
reach the parquet scan, small dims broadcast, scans prune columns,
shuffles appear only where the semantics demand one. These helpers turn
those properties into assertions (tests/test_plans.py) so a regression
in plan shape fails CI long before it shows up as a 100 TB incident.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a parquet scan advertises a pushed filter containing
    `fragment` (e.g. a column name) in PushedFilters."""
    plan = formatted_plan(df)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if fragment in m.group(1):
            return True
    return False


def _split_top_level(fields: str) -> list[str]:
    """Split a struct field list on commas at bracket depth 0 only —
    nested struct types (`address:struct<street:string,...>`) must not
    be torn apart."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(fields):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(fields[start:i])
            start = i + 1
    parts.append(fields[start:])
    return [p for p in parts if p.strip()]


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """The column sets each parquet scan actually reads (ReadSchema) —
    the observable form of column pruning."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<(.*)>$", plan, re.M):
        cols = {c.split(":")[0].strip() for c in _split_top_level(m.group(1))}
        out.append(cols)
    return out


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the plan (broadcast
    exchanges excluded — they move dims, not facts)."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
