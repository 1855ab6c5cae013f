"""Query registry: name → (Spark builder, DuckDB oracle SQL).

Every operator claimed in SURVEY §2 is exercised by at least one named
query over the driver's synthetic tables (FIXTURES.md §B.1 role
mapping), with an equivalent ANSI-SQL oracle. Builders and oracles are
written together so the semantics (weighted vs plain means, banker's
rounding, per-set filters) stay aligned — the misalignment risks are
exactly SURVEY §7's "hard parts".

Float discipline: any column whose value is produced by a
non-order-deterministic float aggregation is rounded (≤6 dp) in BOTH
engines before comparison, and intermediate series that feed sequential
recurrences are rounded once at the handoff so both engines iterate
identical inputs.
"""

from __future__ import annotations

from .base import Query  # noqa: F401
from . import core, lattice_q, timeseries_q, relational, tpch_deep, northstar


def _collect() -> dict[str, Query]:
    out: dict[str, Query] = {}
    for mod in (core, lattice_q, timeseries_q, relational, tpch_deep, northstar):
        out.update(mod.QUERIES)
    # Deterministic (alphabetical) ordering — stable across runs and
    # unbiased under any sampling of the registry.
    return {n: out[n] for n in sorted(out)}


QUERIES: dict[str, Query] = _collect()
