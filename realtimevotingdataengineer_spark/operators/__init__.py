"""Operator modules. Importing this package registers every operator key
(SURVEY.md §2 + extensions) into :mod:`..registry`."""

from . import (  # noqa: F401
    corpus,
    dedup,
    events_analytics,
    graph,
    multimodal,
    pruning,
    relational,
    search,
    similarity,
    text,
    tpch,
    tpch_full,
)
