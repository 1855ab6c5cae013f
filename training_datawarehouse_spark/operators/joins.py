"""Join operators Spark lacks as built-ins: as-of (nearest-prior) join.

An as-of join attaches, to each left row, the most recent right row at
or before the left row's timestamp, per key — the canonical shape for
"state as of event time" in training-data pipelines (sensor readings,
price marks, feature snapshots).

Spark has no ASOF JOIN; the naive formulation (range join + per-key
max) explodes quadratically. Implementation here is the scalable
union-and-carry shape:

1. tag left/right rows, align schemas, union;
2. ONE shuffle: window per key ordered by (ts, tag) with right rows
   sorting before left at equal ts (>= semantics);
3. ``last(value, ignorenulls=True)`` over the unbounded-preceding frame
   carries each right payload forward;
4. keep only left rows.

Cost: one shuffle + one in-partition sort of |left|+|right| slim rows —
the same budget as a regular sort-merge join, with no row explosion on
dense right sides. Matches DuckDB's ``ASOF LEFT JOIN`` semantics
(backward, inclusive), which is the differential oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward-inclusive as-of join (left ts >= right ts), per key.

    Returns every left row plus ``<value_col><suffix>`` columns from
    the matched right row (null when no prior right row exists).
    Ties on (key, ts) between right rows resolve to the last in the
    union sort — make right (key, ts) unique upstream when exact tie
    determinism matters.
    """
    keys = list(keys)
    out_cols = list(left.columns)

    carried = [f"{c}{suffix}" for c in value_cols]
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(cc) for c, cc in zip(value_cols, carried)],
    ).withColumn("__is_left", F.lit(0))
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))

    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for cc in carried:
        u = u.withColumn(cc, F.last(cc, ignorenulls=True).over(w))
    return u.filter(F.col("__is_left") == 1).select(*out_cols, *carried)
