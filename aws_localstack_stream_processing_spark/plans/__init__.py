from .registry import QUERIES, all_queries, query  # noqa: F401
