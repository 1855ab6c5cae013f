from .registry import QUERIES, Query  # noqa: F401
