"""Query/pipeline builders and the driver-facing query registry."""

from .queries import QUERIES, QueryDef, build_queries, build_oracles

__all__ = ["QUERIES", "QueryDef", "build_queries", "build_oracles"]
