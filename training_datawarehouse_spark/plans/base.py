"""Shared plan types."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """A named engine query plus its DuckDB differential oracle.

    ``oracle`` is the equivalent ANSI SQL DuckDB runs on the same
    parquet tables; ``None`` → the driver records a weaker rows-only
    check (used for genuinely non-SQL-expressible ops).
    """

    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    note: str = ""
