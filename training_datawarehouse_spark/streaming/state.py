"""Streaming state-store provider selection (100 TB posture).

The default HDFS-backed provider keeps every key of every stateful
operator (dedup ids, session windows, join buffers) as JVM heap
objects — at 100 TB keyed state that is an OOM, not a tuning problem.
Production Structured Streaming at scale runs the RocksDB provider
(``spark.sql.streaming.stateStore.providerClass``): state lives
off-heap / on local SSD with incremental checkpointing to the
checkpoint location, so per-executor state is bounded by disk, not
heap. Results are provider-independent — the provider is a storage
engine for the same exact-once state contract (parity-tested against
the oracle-pinned dedup stage in ``tests/``).

The conf is read once per STREAM START (stamped into the query's
offset log metadata), so a context manager scoped around
``writeStream.start()`` is the right granularity; restarting an
existing checkpoint under a different provider is a state-format
migration, not a conf flip — keep one provider per checkpoint dir.

Sizing note (SCALE.md r8): RocksDB state for the dedup stage is one
entry per in-watermark event id (~40 B key+overhead); a 1-day
watermark over 10^9 events/day ≈ 40 GB cluster-wide — SSD-resident
per executor under the default 100-executor spread, impossible as
heap objects under the default provider.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
_ALIASES = {"rocksdb": ROCKSDB_PROVIDER, "hdfs": HDFS_PROVIDER}


@contextmanager
def state_store_provider(spark: SparkSession, provider: str = "rocksdb"):
    """Scope the streaming state-store provider: queries STARTED inside
    the context use ``provider`` (``"rocksdb"``, ``"hdfs"``, or a fully
    qualified provider class); the previous session value is restored
    on exit. Already-running queries are unaffected (the conf is
    captured at stream start).

    NOT thread-safe (r8 review): the provider conf is SESSION-GLOBAL,
    so two threads nesting this context on one SparkSession can stamp
    each other's provider into a checkpoint and restore a stale value.
    Start streams from one thread, or give each thread its own
    ``spark.newSession()`` (session-scoped confs are per-session)."""
    target = _ALIASES.get(provider, provider)
    # get with an explicit None default distinguishes never-set from
    # set-to-the-default: a bare .get() returns the built-in default
    # (HDFS provider) for an unset key, which would make the restore
    # branch pin the previously-implicit default into the session conf
    # instead of restoring to truly-unset (r8 ADVICE).
    old = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, target)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, old)
