"""Iterative graph centrality — deterministic fixed-point PageRank.

The missing family next to ``dedup.connected_components``: dedup needs
*membership* (which component), corpus curation also needs *weight* —
link-graph centrality is a standard document-quality prior (page/host
rank features in public web-corpus pipelines, e.g. the URL/host-level
quality signals described for C4/RefinedWeb-class cleaning). Reference
scope: the reference engine has no graph operators at all
(`populate_from_json.py` is row-at-a-time SQL); this is charter-
extension surface.

Why FIXED-POINT INTEGER arithmetic: PageRank is a float recurrence, and
float sums over in-edges are shuffle-order-dependent — the exact class
of nondeterminism the registry's float discipline exists to contain.
Instead of rounding every iteration handoff (which still leaves
boundary ulps), ranks here are BIGINT in units of 1/SCALE: every
contribution is ``floor(d·r / (D·deg))``, integer sums are associative
under any partitioning/merge order, so the result is bit-identical on
Spark, DuckDB, or a hand loop — no rounding contract needed anywhere.
Mass floors leak a few units per node per iteration (bounded by
``iterations · (in_deg + 2)`` units of 1e-12); that defined semantics
IS the operator's contract.

Semantics per iteration (standard damping-d PageRank with uniform
dangling-mass redistribution, Brin & Page 1998):

    r'(v) = (D-d)·S // (D·N)                      -- teleport
          + d·Σ_dangling r(u) // (D·N)            -- dangling share
          + Σ_{u→v} d·r(u) // (D·deg(u))          -- link mass

with d/D = damping_pct/100, S = SCALE, N = node count, deg = out-degree
after self-loop/duplicate removal. Everything — N, the dangling sum —
stays IN-PLAN as one-row broadcast frames: no ``collect()``, the whole
K-iteration computation is a single declarative DAG.

Scale shape (100 TB / billions of edges): each iteration is one
shuffle of (dst, contribution) pairs into a sum — the minimal cost of
distributed PageRank — plus two broadcast one-row joins. Ranks are
checkpointed per iteration through ``eager_checkpoint`` (stat-less
leaves — iteration t+1 reads t twice, contrib + dangling, so
origin-stats inheritance would compound size estimates per
generation; r13 verdict #5) and each superseded generation's blocks
are released, so peak storage is O(1) generations. On a real
cluster, checkpoint to reliable storage, pre-partition ``edges`` by
``src`` so the rank join is co-located, and apply
``session.tune_for_iterative`` at high iteration counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.caching import eager_checkpoint, release_local_checkpoint

PR_SCALE = 10**12


def pagerank_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
    init_ranks: DataFrame | None = None,
    renormalize_init: bool = False,
) -> DataFrame:
    """Fixed-point PageRank over ``nodes`` (one row per node) and
    ``edges`` (src, dst). Self-loops and duplicate edges are removed;
    edges pointing outside ``nodes`` are dropped. Returns one row per
    node: (node_col, pr_rank BIGINT in 1/scale units, pr_out_deg,
    pr_in_deg). Bit-deterministic under any partitioning.

    ``init_ranks`` (node_col, pr_rank) WARM-STARTS the iteration from
    a previous run's output — the incremental-maintenance path when
    the graph grows: nodes present in ``init_ranks`` keep their old
    rank, new nodes start at the uniform ``scale // N``. No mass
    rescaling is applied (the recurrence pulls total mass toward
    ``scale`` geometrically: after k iterations the init-mass error
    shrinks by d^k, so a slightly-over-mass warm start self-corrects).
    By construction ``pagerank(init=pagerank(G, a), b) ==
    pagerank(G, a+b)`` bit-for-bit on an unchanged graph — the
    equivalence the warm-start test pins.

    ``renormalize_init`` rescales the warm-start vector so its total
    mass is exactly ``scale`` (exact DECIMAL(38,0) integer math, still
    bit-deterministic). Measured at the 100× probe: after 10 % node
    growth the RAW warm start's error is almost entirely the
    systematic mass excess (old ranks sum to ~1.1·scale at the new N;
    L1-to-converged tracked 0.09·d^k to three decimals), so
    renormalizing removes the bias up front and leaves only the local
    perturbation from the new edges. Off by default because it breaks
    the continued-iteration bit-equivalence above (it rescales even a
    perfect input by its floor-leak deficit)."""
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    n = nodes.select(F.col(node_col).alias("__n")).distinct()
    # eager_checkpoint, not plain localCheckpoint: one-shot, so no
    # per-generation compounding of ITS OWN estimate — but the
    # inherited origin estimate would multiply into every iteration's
    # contrib join (the edge set is read once per round). Stat-less
    # leaf keeps the family consistent (r14 verdict #1).
    e = eager_checkpoint(
        edges.select(F.col(src_col).alias("__s"), F.col(dst_col).alias("__d"))
        .filter(F.col("__s") != F.col("__d"))
        .distinct()
        .join(n.withColumnRenamed("__n", "__s"), "__s")
        .join(n.withColumnRenamed("__n", "__d"), "__d")
    )
    deg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    cnt = n.agg(F.count(F.lit(1)).alias("__nodecnt"))

    d, dd = damping_pct, 100  # d/D damping as exact integers
    base = n.crossJoin(F.broadcast(cnt))
    # checkpoint every rank generation (initial included): iteration
    # t+1 reads ranks_t twice (contrib + dangling) — without the break
    # each use re-derives the whole upstream chain (2^K plan blowup)
    uniform = F.expr(f"CAST({scale} AS BIGINT) DIV __nodecnt")
    if init_ranks is None:
        ranks = eager_checkpoint(base.select(
            "__n", "__nodecnt", uniform.alias("__r")
        ))
    else:
        iv = init_ranks.select(
            F.col(node_col).alias("__n"),
            F.col("pr_rank").cast("long").alias("__prev"),
        )
        warm = base.join(iv, "__n", "left").select(
            "__n", "__nodecnt",
            F.coalesce("__prev", uniform).alias("__r"),
        )
        if renormalize_init:
            tot = (
                warm.select(F.col("__r").alias("__ri"))
                .agg(F.sum("__ri").cast("long").alias("__tot"))
            )
            warm = warm.crossJoin(F.broadcast(tot)).select(
                "__n", "__nodecnt",
                F.expr(
                    f"CAST((CAST(__r AS DECIMAL(38,0)) * {scale})"
                    f" DIV __tot AS BIGINT)"
                ).alias("__r"),
            )
        ranks = eager_checkpoint(warm)
    for _ in range(iterations):
        ranked_edges = e.join(
            ranks.select(F.col("__n").alias("__s"), "__r"), "__s"
        ).join(deg, "__s")
        contrib = (
            ranked_edges.select(
                "__d",
                F.expr(f"{d}L * __r DIV ({dd}L * __deg)").alias("__c"),
            )
            .groupBy("__d")
            .agg(F.sum("__c").alias("__in"))
        )
        dangling = (
            ranks.join(deg, ranks["__n"] == deg["__s"], "left_anti")
            .agg(F.coalesce(F.sum("__r"), F.lit(0)).cast("long")
                 .alias("__dang"))
        )
        new_ranks = eager_checkpoint(
            base.join(contrib, base["__n"] == contrib["__d"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "__n",
                "__nodecnt",
                (
                    F.expr(f"({dd - d}L * {scale}L) DIV ({dd}L * __nodecnt)")
                    + F.expr(f"{d}L * __dang DIV ({dd}L * __nodecnt)")
                    + F.coalesce(F.col("__in"), F.lit(0).cast("long"))
                ).alias("__r"),
            )
        )
        # generation t is fully materialized into t+1 (eager) — free
        # its blocks so peak storage is O(1) generations, not
        # O(iterations) (the CC/BPE release discipline).
        release_local_checkpoint(ranks)
        ranks = new_ranks
    in_deg = e.groupBy("__d").agg(F.count(F.lit(1)).alias("__ind"))
    return (
        ranks.join(deg, ranks["__n"] == deg["__s"], "left")
        .join(in_deg, ranks["__n"] == in_deg["__d"], "left")
        .select(
            F.col("__n").alias(node_col),
            F.col("__r").alias("pr_rank"),
            F.coalesce("__deg", F.lit(0).cast("long")).alias("pr_out_deg"),
            F.coalesce("__ind", F.lit(0).cast("long")).alias("pr_in_deg"),
        )
    )


def pagerank_fixed_reference(
    node_ids: list,
    edge_pairs: list[tuple],
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> dict:
    """Driver-side pure-Python twin of ``pagerank_fixed`` for tests —
    the same integer recurrence as a dict loop."""
    nodes = sorted(set(node_ids))
    nn = len(nodes)
    eset = {
        (s, t)
        for s, t in edge_pairs
        if s != t and s in set(nodes) and t in set(nodes)
    }
    deg: dict = {}
    for s, _ in eset:
        deg[s] = deg.get(s, 0) + 1
    d, dd = damping_pct, 100
    r = {v: scale // nn for v in nodes}
    for _ in range(iterations):
        dang = sum(r[v] for v in nodes if v not in deg)
        nxt = {v: (dd - d) * scale // (dd * nn) + d * dang // (dd * nn)
               for v in nodes}
        for s, t in eset:
            nxt[t] += d * r[s] // (dd * deg[s])
        r = nxt
    return r
