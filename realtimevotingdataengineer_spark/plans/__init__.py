from .audit import (
    broadcast_join_count,
    formatted_plan,
    has_pushed_filter,
    read_schema_columns,
    shuffle_count,
)

__all__ = [
    "broadcast_join_count",
    "formatted_plan",
    "has_pushed_filter",
    "read_schema_columns",
    "shuffle_count",
]
