"""Logical query plan: AST + parser for the exposed query language."""

from toshokan_spark.plans.ast import (
    All,
    BoolQuery,
    Cmp,
    Node,
    ParseError,
    Phrase,
    RangeQ,
    Term,
    parse_query,
)

__all__ = [
    "All",
    "BoolQuery",
    "Cmp",
    "Node",
    "ParseError",
    "Phrase",
    "RangeQ",
    "Term",
    "parse_query",
]
