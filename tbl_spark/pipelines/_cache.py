"""Bounded DataFrame-cache ring shared by the pipeline operators.

DataFrame caches live in Spark's CacheManager until explicitly
unpersisted — they are NOT cleaned by GC or the ContextCleaner (that
only applies to raw RDD persists) — so an op that persists per call
would leak one session-lifetime cache entry per invocation (streaming
foreachBatch, bench reps). The ring keeps the N most recent cached
frames and evicts the oldest; eviction is always safe — an evicted plan
recomputes from lineage if it ever re-executes, it never loses data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CACHE_RING: list = []
RING_MAX = 4


def ring_persist(df: DataFrame) -> DataFrame:
    from pyspark import StorageLevel
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    CACHE_RING.append(df)
    while len(CACHE_RING) > RING_MAX:
        CACHE_RING.pop(0).unpersist(blocking=False)
    return df
