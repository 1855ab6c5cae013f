"""The 3-dimensional aggregation lattice (OP-AGG-1, SURVEY §2.3.1).

The reference materializes one SQLite table per cell of
``CUBE(activity, activity_type, equipment)`` — 8 grouping sets — with
absent dimensions labelled ``'All'`` (reference
``populate_from_json.py:345-358,363-372``). We compute the identical 8
sets in ONE DataFrame with grain ``(dims..., measures...)``.

The subtle part (reference :391-392): rows whose equipment is
``'Not Set'`` or ``''`` are excluded **only from grouping sets that
include the equipment dimension**; sets without equipment still count
them. Expressed as two GROUPING SETS passes over a conditionally
filtered source, unioned:

    half A: GROUPING SETS {(), (a), (t), (a,t)}          — all rows
    half B: GROUPING SETS {(e), (a,e), (t,e), (a,t,e)}   — filtered rows

Each half is one Expand + partial (map-side) agg + one shuffle; both
halves read the same scan. Equipment names are space-stripped *after*
the Not-Set check (reference :372).

Scale: Expand multiplies rows 4× before the partial aggregate, but
map-side combine collapses them to |distinct cells| per task — cell
cardinality is the product of three low-cardinality dims, so the
shuffle is negligible at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import strip_spaces

NOT_SET = ("Not Set", "")


def _label(c: str) -> Column:
    """'All' roll-up label for a non-grouped dimension (reference :363-372).

    Uses ``grouping()`` — must be evaluated inside the Aggregate (i.e.
    passed to ``.agg``), Catalyst rejects it in a downstream Project.
    """
    return F.when(F.grouping(c) == 1, F.lit("All")).otherwise(F.col(c))


def cube_lattice(
    df: DataFrame,
    measures: list[Column],
    activity: str = "activity",
    activity_type: str = "activity_type",
    equipment: str = "equipment",
    extra_keys: list[str] | None = None,
    not_set: tuple[str, ...] = NOT_SET,
) -> DataFrame:
    """Aggregate ``df`` over the full 8-set lattice.

    ``measures`` are reusable unresolved aggregate expressions (built by
    ``specs.agg_exprs`` or ad hoc). ``extra_keys`` (e.g. ``date``) are
    grouped in every set — the reference lattice is per-day.
    """
    extra = extra_keys or []
    a, t, e = activity, activity_type, equipment

    agg_a = df.groupingSets(
        [[*extra], [*extra, a], [*extra, t], [*extra, a, t]], *extra, a, t
    ).agg(_label(a).alias("__a"), _label(t).alias("__t"), *measures)
    mcols = [c for c in agg_a.columns if c not in (*extra, a, t, "__a", "__t")]
    half_a = agg_a.select(
        *extra, F.col("__a").alias(a), F.col("__t").alias(t),
        F.lit("All").alias(e), *mcols
    )

    filtered = df.filter(~F.col(e).isin(*not_set)).withColumn(e, strip_spaces(F.col(e)))
    half_b = (
        filtered.groupingSets(
            [[*extra, e], [*extra, a, e], [*extra, t, e], [*extra, a, t, e]],
            *extra, a, t, e,
        )
        .agg(_label(a).alias("__a"), _label(t).alias("__t"), *measures)
        .select(*extra, F.col("__a").alias(a), F.col("__t").alias(t),
                F.col(e), *mcols)
    )

    return half_a.unionByName(half_b)


def cube_lattice_two_level(
    df: DataFrame,
    base_aggs: list[Column],
    re_aggs: list[Column],
    activity: str = "activity",
    activity_type: str = "activity_type",
    equipment: str = "equipment",
    extra_keys: list[str] | None = None,
    not_set: tuple[str, ...] = NOT_SET,
) -> DataFrame:
    """Lattice via pre-aggregation — the shape that wins at 100 TB.

    ``cube_lattice`` feeds every input row through an 8-way Expand
    (8× the aggregation work and shuffle input). When every measure is
    algebraic (sum / weighted-sum / max / count — all of the
    reference's, SURVEY §2.1), aggregate once to the physical cell
    grain ``(extra, a, t, e)`` with ``base_aggs`` (ordinary shuffle,
    map-side combine collapses to |cells| rows per task), then run the
    8-set lattice over the tiny cell table with ``re_aggs`` re-merging
    the partials. The per-set Not-Set filter (SURVEY §2.3.1) drops
    whole cells, so applying it to the pre-aggregate is exact.
    """
    extra = extra_keys or []
    base = df.groupBy(*extra, activity, activity_type, equipment).agg(*base_aggs)
    return cube_lattice(
        base, re_aggs, activity, activity_type, equipment, extra_keys, not_set
    )
