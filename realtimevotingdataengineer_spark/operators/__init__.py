"""Operator modules. Importing this package registers every operator key
(SURVEY.md §2 + extensions) into :mod:`..registry`."""

from . import corpus, dedup, multimodal, relational, similarity, text, tpch, tpch_full  # noqa: F401
