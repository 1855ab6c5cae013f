"""Skew-mitigation utilities: key salting for aggregations and joins.

AQE's skew-join splitting (on in `session.py`) handles most runtime
skew; these helpers are for the cases AQE cannot fix:

- ``salted_agg``: a groupBy where one key holds a huge share of rows
  (power-law user/event keys at 100 TB). Two-level: aggregate on
  (key, salt) first — map-side combine now spreads the hot key over
  ``n_salts`` reducers — then merge the per-salt partials. Any
  algebraic aggregate decomposes this way (same partial/final split as
  ``cube_lattice_two_level``).
- ``salted_broadcast_left``: fact ⋈ skewed-small-dim where the dim is
  broadcastable — broadcasting sidesteps shuffle skew entirely; the
  helper exists to make the intent explicit at call sites.

Salting trades one extra (cheap, |keys|·n_salts-row) shuffle for
eliminating the straggler task; it is NOT free and should only wrap
aggregations with measured hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    n_salts: int,
    col_name: str = "__salt",
    cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic row-level salt in [0, n_salts): a content hash of a
    stable column set (retry-stable, unlike monotonic ids). Pass
    ``cols`` to hash a small distinguishing subset — on wide rows,
    hashing every column costs real CPU per row for no extra spread."""
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(*(cols or df.columns)), F.lit(n_salts)).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: list[Column],
    finals: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-level aggregation that spreads hot keys over ``n_salts``
    reducers.

    ``partials`` aggregate at (keys, salt) grain; ``finals`` merge the
    per-salt partial columns at (keys) grain. Example::

        salted_agg(df, ["user_id"],
                   partials=[F.count(F.lit(1)).alias("n_p"),
                             F.sum("value").alias("v_p")],
                   finals=[F.sum("n_p").alias("n"),
                           F.sum("v_p").alias("value")])
    """
    salted = with_salt(df, n_salts)
    stage1 = salted.groupBy(*keys, "__salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_broadcast_left(fact: DataFrame, dim: DataFrame, on: list[str] | str) -> DataFrame:
    """Skew-proof fact⋈dim: broadcast the dim so the fact side never
    shuffles — shuffle skew cannot exist without a shuffle."""
    return fact.join(F.broadcast(dim), on)
