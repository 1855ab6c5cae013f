"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming (SURVEY §2.2); these are the charter's
"custom stateful operator" surface. Two operators:

- ``running_user_totals``: per-user running event count / value sum
  maintained in the state store across micro-batches (update mode).
- ``streaming_first_seen_dedup``: exact streaming dedup — emit a key's
  row only the first time it is ever seen; later arrivals (any
  micro-batch) are dropped. State is one marker per key.

Scale posture: state is keyed by the group column only and holds a
fixed-size tuple per key — the state store grows with |distinct keys|,
not with event volume. For unbounded key spaces pair with a TTL
(``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.setTimeoutDuration``)
so abandoned keys are evicted; the operators here use NoTimeout because
the driver's synthetic key spaces are small and bounded.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame) -> DataFrame:
    """(user_id, n_events, total_value) updated every micro-batch.

    State per user: (count, sum) — merged with each batch's partial,
    so each micro-batch shuffles only its own rows.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_first_seen_dedup(events: DataFrame, key_col: str) -> DataFrame:
    """Streaming exact dedup: first row per key wins, across all
    micro-batches (OP-DD-1 semantics lifted to a stream).

    Emits (key, first_event_id, first_ts_micros) exactly once per key;
    subsequent arrivals find the state marker and emit nothing.
    """

    def dedup(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain, late duplicates
                pass
            return
        first: dict[str, Any] | None = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            row = pdf.iloc[0]
            if first is None or (row["ts"], row["event_id"]) < (first["ts"], first["event_id"]):
                first = {"ts": row["ts"], "event_id": int(row["event_id"])}
        if first is None:
            return
        state.update((1,))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "first_event_id": [first["event_id"]],
                "first_ts_micros": [int(pd.Timestamp(first["ts"]).value // 1000)],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType="key string, first_event_id long, first_ts_micros long",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_funnel_progress(
    events: DataFrame,
    steps: list[str],
    within_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """STREAMING ordered-sequence funnel: per-user progress through
    ``steps`` (the exact `operators/funnel.py` min-chain semantics —
    t1 = min step-1 ts; t_i = min step-i ts with t_{i-1} < ts <=
    t1 + within_days), maintained across micro-batches.

    Why state holds per-step TIMESTAMP LISTS and re-derives the chain
    every batch, instead of just the chain (t1..tk): funnel progress
    is NOT monotone under out-of-order arrival. A later micro-batch
    can deliver an EARLIER step-1 event, which lowers t1, tightens the
    attribution window, and can legitimately REDUCE a user's reached
    step — a chain-only state cannot roll forward through that, the
    event lists can. Emissions therefore carry the batch sequence
    number ``nb``; the caller takes each user's LAST emission
    (max_by nb), not the max step.

    Scale posture: state per user = this user's step-typed event
    timestamps (longs); non-step events are filtered out BEFORE the
    shuffle, so the state store scales with |users| x step-event
    density, not event volume. In a production continuous stream the
    lists are bounded by pairing with a ProcessingTimeTimeout TTL at
    the attribution horizon (t1 + within_days — events beyond it can
    no longer change the chain); the availableNow drains here use
    NoTimeout like the other operators (bounded synthetic key space).
    """
    n_steps = len(steps)
    if n_steps < 2:
        raise ValueError("a funnel needs at least two steps")
    win_us = within_days * 86_400 * 1_000_000
    idx = {s: i for i, s in enumerate(steps)}

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            prev = state.get
            lists = [list(prev[i]) for i in range(n_steps)]
            nb = prev[n_steps]
        else:
            lists = [[] for _ in range(n_steps)]
            nb = 0
        for pdf in pdfs:
            for et, ts in zip(pdf[type_col], pdf[ts_col]):
                i = idx.get(et)
                if i is not None:
                    lists[i].append(int(pd.Timestamp(ts).value // 1000))
        nb += 1
        state.update((*lists, nb))
        reached = 0
        if lists[0]:
            t1 = min(lists[0])
            reached, prev_t, limit = 1, t1, t1 + win_us
            for i in range(1, n_steps):
                nxt = [t for t in lists[i] if prev_t < t <= limit]
                if not nxt:
                    break
                prev_t = min(nxt)
                reached = i + 1
        yield pd.DataFrame(
            {"user_id": [key[0]], "nb": [nb], "max_step": [reached]}
        )

    state_schema = ", ".join(
        [f"s{i} array<long>" for i in range(n_steps)] + ["nb long"]
    )
    return (
        events.filter(events[type_col].isin(steps))
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, nb long, max_step int",
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_kmv_sketch(hashed: DataFrame, k: int = 64) -> DataFrame:
    """STREAMING KMV distinct-count sketch per key, maintained across
    micro-batches (r11 — the r10 verdict's 'sketches ride the
    streaming path' task). Input is a pre-hashed frame
    (event_type, h) — the same md5-prefix integer hash the batch
    ``plans/relational._kmv_stages`` uses, computed JVM-side BEFORE
    the shuffle so Python only sees (key, long) pairs.

    State per key = the k SMALLEST distinct hashes seen so far plus a
    batch counter — the bottom-k insertion is a semilattice merge
    (a value above the current k-th smallest can never re-enter: the
    k current values all stay present and stay smaller), so the final
    state is EXACTLY the batch sketch regardless of how rows were
    split into micro-batches. That order-independence is what makes
    the parity against the batch oracle a real check, and the ≤ k
    bound is the bounded-state contract SCALE.md argues: state grows
    with |keys|·k, never with event volume.

    Update mode re-emits a key's row each batch it appears in; ``nb``
    (batches seen) is strictly increasing per key, so the caller
    selects the final state with ``max_by(..., nb)`` (the
    running_user_totals convention). Emitted per batch:
    (event_type, nb, cnt, hk) — sketch occupancy and the k-th
    smallest hash, from which the estimate derives in closed form."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            prev = state.get
            hs, nb = list(prev[0]), prev[1]
        else:
            hs, nb = [], 0
        s = set(hs)
        for pdf in pdfs:
            # a NULL user hashes to NULL in BOTH engines (md5(NULL) is
            # NULL) and counts toward no audience — drop it here
            # instead of crashing int(None)
            s.update(int(h) for h in pdf["h"] if pd.notna(h))
        hs = sorted(s)[:k]          # bottom-k: state stays <= k longs
        nb += 1
        state.update((hs, nb))
        yield pd.DataFrame({
            "event_type": [key[0]], "nb": [nb],
            "cnt": [len(hs)], "hk": [hs[-1] if hs else 0],
        })

    return hashed.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType="event_type string, nb long, cnt long, hk long",
        stateStructType="hs array<long>, nb long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_neardup_admission(
    band_rows: DataFrame, ttl_ms: int | None = None,
    event_ttl_ms: int | None = None, event_time_col: str = "ts",
) -> DataFrame:
    """STREAMING near-dup admission (r12 — the r11 verdict's top ask):
    probe each micro-batch's new document signatures against the
    historical banded LSH index, maintained as state ACROSS
    micro-batches, and emit the admit/reject evidence per (doc, band).
    This is the top-of-funnel filter-before-store operator a 100 TB
    ingest pipeline runs: a new document is rejected when it collides
    with something already seen, WITHOUT ever rescanning the corpus.

    Input: (doc_id, band, sig) rows from a ROW-LOCAL signature kernel
    (``dedup.minhash_band_rows_rowlocal`` — Structured Streaming
    forbids an aggregation upstream of ``applyInPandasWithState``, so
    signatures must not need a shuffle). Grouping key = the band
    bucket (band, sig) — the unit of index membership.

    State per bucket: (first_id, n) — TWO LONGS, by construction
    (``event_ttl_ms`` adds a third, the running max event timestamp;
    see below).
    First-writer-wins admission only ever needs the bucket's EARLIEST
    member: every later arrival matches against it, so storing more
    members adds no information to the decision. This makes the
    hot-bucket problem vanish rather than need a cap — a
    boilerplate-flooded bucket holds the same two longs as a singleton
    (the batch family's ``max_bucket`` guards quadratic PAIR expansion,
    which admission never performs; `n` is kept so occupancy stays
    observable and a cap COULD gate emission). State grows with
    |distinct touched buckets| only — the banded index itself, 3 longs
    per entry, orders of magnitude smaller than its corpus.

    Arrival order IS the admission order (the operator's contract):
    within a batch, rows are processed in ascending doc_id; across
    batches, the source must deliver batches in id order (the e2e
    harness sorts + mtime-orders the splits). Under that contract the
    bucket's first member is its MINIMUM id, so the emitted decision
    equals the batch SQL twin ``min(e.id) WHERE e.id < d.id AND e
    shares the bucket`` — which is how the driver's differential gate
    hash-checks a genuinely sequential streaming decision.

    Emits one row per input row: (doc_id, band, match_id) where
    match_id is the bucket's prior first member (NULL -> this doc
    opened the bucket). The caller aggregates to doc grain:
    admit = every band NULL; matched-cluster id = min(match_id).

    ``ttl_ms`` (r13 — the r12 verdict's #3): OPTIONAL idle-bucket
    eviction for month-scale ingest gates. Without it, state grows
    monotonically with distinct touched buckets forever (16 bytes
    each — SCALE.md prices 10⁹ docs ≈ 64 GB cluster-wide; bounded,
    but history-sized). With a TTL, state is bounded by the ACTIVE
    working set: a bucket idle longer than the horizon is dropped via
    ``GroupStateTimeout.ProcessingTimeTimeout``, and a duplicate of
    an evicted bucket's ancient first member is RE-ADMITTED — the
    standard, stated trade of a time-horizon gate (dedup guarantees
    hold within the horizon only; the batch twin for parity is the
    first-writer rule restricted to arrivals inside the horizon).
    Eviction follows the engine's timeout contract: an expired bucket
    is removed at the next TRIGGER in which it receives no data — a
    duplicate arriving in that same trigger still matches
    (conservative-keep: late eviction never causes a false admit,
    only delays the re-admission window). Run TTL gates with a
    continuous trigger (e.g. ``processingTime``): with
    ``Trigger.AvailableNow`` the engine keeps scheduling timeout-check
    batches and the query never self-terminates while a timeout conf
    is registered (observed on Spark 4.1.2 — the gate test stops the
    query explicitly), which suits a month-scale always-on gate but
    not drain-and-exit batch jobs.

    ``event_ttl_ms`` (r15 — the r14 probe's own lesson): the SAME
    eviction semantics keyed to EVENT TIME instead of wall clock. The
    wall-clock horizon measured its failure mode live (SCALE.md r14:
    a 16.9 s cold-start trigger cadence blew a 15 s ``ttl_ms`` and
    re-admitted within-horizon duplicates) — the horizon a month-scale
    ingest wants is defined by the DATA's timestamps, not by trigger
    scheduling. A bucket expires when the stream's WATERMARK passes
    (the bucket's LATEST event time + horizon): slow triggers,
    backfill bursts, and replay at any speed all preserve the
    decision sequence, because watermark and timestamps replay with
    the data (``GroupStateTimeout.EventTimeTimeout`` +
    ``state.setTimeoutTimestamp``). "Latest event time" is a RUNNING
    MAX persisted in state (event mode stores THREE longs per bucket:
    first_id, n, max_ts — one long over the two the other modes
    keep), not the current batch's max: a late out-of-order row that
    lands in a batch AFTER a newer row must not REWIND the bucket's
    eviction deadline from newer_ts+horizon back to late_ts+horizon,
    or eviction (hence re-admission) would depend on which
    micro-batch boundary the late row happened to fall on — exactly
    the replay-instability this mode exists to remove (r16, from the
    r15 ADVICE). Requirements: ``band_rows`` must carry
    ``event_time_col`` (pass it through the signature kernel
    via ``minhash_band_rows_rowlocal(keep_cols=(...,))``) and the
    caller must set ``withWatermark`` on that column upstream —
    EventTimeTimeout without a watermark is rejected by the engine.
    The timeout is clamped to (watermark + 1 ms) when the bucket's
    running max timestamp already trails the watermark past the
    horizon, so the bucket still evicts at the next opportunity
    instead of crashing the query. Mutually exclusive with
    ``ttl_ms``."""
    if ttl_ms is not None and event_ttl_ms is not None:
        raise ValueError(
            "ttl_ms (wall-clock horizon) and event_ttl_ms (event-time "
            "horizon) are mutually exclusive")
    has_ttl = ttl_ms is not None or event_ttl_ms is not None

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if has_ttl and state.hasTimedOut:
            state.remove()   # idle past the horizon: forget the bucket
            return
        stored_max = 0
        if state.exists:
            if event_ttl_ms is not None:
                fid, n, stored_max = state.get
            else:
                fid, n = state.get
        else:
            fid, n = None, 0
        ids: list[int] = []
        max_ts_ms = None
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
            if event_ttl_ms is not None and len(pdf):
                # .value = ns since epoch (tz-safe); horizon anchors
                # to the bucket's latest arrival SO FAR (running max,
                # merged with the persisted max below) — never to
                # this batch alone
                mx = int(pd.Timestamp(pdf[event_time_col].max()).value
                         // 1_000_000)
                max_ts_ms = mx if max_ts_ms is None else max(max_ts_ms, mx)
        if not ids:  # data-less invocation: nothing to decide
            return
        ids.sort()
        out_id, out_match = [], []
        for d in ids:
            out_id.append(d)
            out_match.append(fid)
            if fid is None:
                fid = d
            n += 1
        if ttl_ms is not None:
            state.update((int(fid), n))
            state.setTimeoutDuration(ttl_ms)
        elif event_ttl_ms is not None:
            # a late batch (max_ts < stored_max) keeps the NEWER
            # deadline: the horizon is anchored to the bucket's
            # latest event time ever seen, so eviction decisions are
            # independent of micro-batch boundaries (ADVICE r15)
            anchor = max(stored_max, max_ts_ms or 0)
            state.update((int(fid), n, anchor))
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(anchor + event_ttl_ms, wm + 1))
        else:
            state.update((int(fid), n))
        yield pd.DataFrame({
            "doc_id": out_id,
            "band": [key[0]] * len(out_id),
            "match_id": pd.Series(out_match, dtype="object"),
        })

    return band_rows.groupBy("band", "sig").applyInPandasWithState(
        update,
        outputStructType="doc_id long, band int, match_id long",
        # event mode persists the bucket's running max event time so
        # late out-of-order arrivals cannot rewind the horizon; the
        # other modes keep the original two-longs-per-bucket state
        # byte-identical
        stateStructType=(
            "first_id long, n long, max_ts long"
            if event_ttl_ms is not None
            else "first_id long, n long"
        ),
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.EventTimeTimeout
            if event_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_quantile_sketch(rows: DataFrame, k: int = 2048) -> DataFrame:
    """STREAMING maintenance of the mergeable quantile sketch (r12 —
    the bottom-k coordinated sample of `plans/relational._qsk_stages`,
    maintained across micro-batches the way `streaming_kmv_sketch`
    maintains the KMV sketch). Input is a pre-hashed frame
    (event_type, h, eid, vc): md5-prefix hash of the unique event id,
    integer-cents value — all computed JVM-side before the shuffle.

    State per key = the k rows with the smallest (h, eid) seen so far
    (hash, id tie-break, value cents — 3 longs per kept row) plus a
    batch counter. Bottom-k by a fixed total order is a semilattice
    merge, so the final state equals the batch sketch bit-for-bit
    regardless of micro-batch layout — the oracle recomputes the batch
    sketch in SQL and the estimates are hash-checked as exact values.
    State is bounded at |keys|·k rows by construction.

    Emitted per batch: (event_type, nb, m, p50c, p95c, p99c) — sketch
    occupancy and the ceil(q·m)-th smallest sampled cents values; the
    caller selects the final state with max_by(..., nb)."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hs, eids, vcs, nb = state.get
            triples = list(zip(hs, eids, vcs))
        else:
            triples, nb = [], 0
        for pdf in pdfs:
            for h, e, v in zip(pdf["h"], pdf["eid"], pdf["vc"]):
                if pd.notna(h):
                    triples.append((int(h), int(e), int(v)))
        triples.sort()
        triples = triples[:k]
        nb += 1
        state.update((
            [t[0] for t in triples],
            [t[1] for t in triples],
            [t[2] for t in triples],
            nb,
        ))
        vs = sorted(t[2] for t in triples)
        m = len(vs)
        est = {q: vs[math.ceil(q * m) - 1] if m else 0
               for q in (0.5, 0.95, 0.99)}
        yield pd.DataFrame({
            "event_type": [key[0]], "nb": [nb], "m": [m],
            "p50c": [est[0.5]], "p95c": [est[0.95]], "p99c": [est[0.99]],
        })

    return rows.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "event_type string, nb long, m long, "
            "p50c long, p95c long, p99c long"
        ),
        stateStructType=(
            "hs array<long>, eids array<long>, vcs array<long>, nb long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
