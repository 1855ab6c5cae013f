"""Scalar function surface (OP-FN-* / OP-PRJ-4 in SURVEY §2).

All JVM-side Column expressions — whole-stage-codegen friendly, no UDFs.
Semantics verified against the reference (SURVEY §2.3.4):

- ``year_week``: calendar year + ISO week number, e.g. 2019-12-30 →
  ``"2019-1"`` (quirk included: Spark ``weekofyear`` is ISO week while
  ``year`` is the calendar year — exactly what the reference's
  ``f'{d.year}-{d.isocalendar()[1]}'`` produces).
- ``year_month`` → ``"2020-Jan"``; ``day_of_week`` → ``"Mon"``;
  ``month`` → ``"Jan"`` (``date_format`` patterns ``MMM`` / ``EEE``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_away(x: float, nd: int) -> float:
    """Driver-side rounding that mirrors DuckDB's ``round(x, nd)`` on
    DOUBLE **operation-for-operation**: DuckDB rounds the scaled
    double product — ``std::round(x * 10^nd) / 10^nd`` (half away from
    zero on the already-imprecise product) — so matching its OUTPUT
    means reproducing that arithmetic, not quantizing the exact binary
    value of ``x`` (a Decimal-quantize diverges from DuckDB on ~1e-5
    of random doubles, e.g. 0.123456785 → duck 0.12345679 vs exact
    0.12345678, because the scaled product rounds differently than the
    true value). Python's builtin ``round`` is also wrong here (half
    to even). Every iterative fit that feeds driver-rounded floats
    back into the next epoch/iteration (logreg weights, k-means
    centroids) must round through THIS helper so both engines see
    identical doubles at every step.

    NB the classic ``floor(abs + 0.5)`` trick is NOT equivalent to
    ``std::round``: for a scaled value one ulp BELOW a .5 midpoint,
    ``abs(scaled) + 0.5`` rounds up to the midpoint in float
    arithmetic and floor then overshoots (e.g. x=0.049999999999999996,
    nd=1: +0.5 path gives 0.1, DuckDB gives 0.0 — r8 review finding,
    verified). Comparing the fraction explicitly performs no float
    addition, so it matches std::round exactly.

    Non-finite inputs (and finite x whose scaled product overflows to
    inf) pass through unchanged — DuckDB's ``round`` returns inf/NaN
    as-is, and any |x| big enough to overflow the scaling has no
    fractional digits to round anyway (r8 ADVICE: ``math.floor`` on
    inf/nan raises, a latent crash for unbounded aggregate feeders).
    """
    if not math.isfinite(x):
        return x
    scaled = abs(x) * 10.0**nd
    if not math.isfinite(scaled):
        return x
    f = math.floor(scaled)
    r = f + 1.0 if scaled - f >= 0.5 else f
    return math.copysign(r, x) / 10.0**nd


def year_week(d: Column) -> Column:
    return F.concat_ws("-", F.year(d).cast("string"), F.weekofyear(d).cast("string"))


def year_month(d: Column) -> Column:
    return F.concat_ws("-", F.year(d).cast("string"), F.date_format(d, "MMM"))


def day_of_week(d: Column) -> Column:
    return F.date_format(d, "EEE")


def month_abbrev(d: Column) -> Column:
    return F.date_format(d, "MMM")


def time_dims(d: Column) -> dict[str, Column]:
    """The four derived time-dimension columns (reference :510-513)."""
    return {
        "year_week": year_week(d),
        "year_month": year_month(d),
        "day_of_week": day_of_week(d),
        "month": month_abbrev(d),
    }


def strip_spaces(c: Column) -> Column:
    """Whitespace removal in dimension values (reference :372, OP-FN-4)."""
    return F.regexp_replace(c, " ", "")


def key_concat(*cols: Column | str) -> Column:
    """Colon-joined composite key (reference :390, OP-FN-3)."""
    return F.concat_ws(":", *cols)
