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
# r8: a single pipeline_curate_v2 invocation holds three live persist
# points (gated tokens, bad-window lists, the packer input); the ring
# must not evict a frame its own invocation is still reading, so the
# cap clears that with headroom. Eviction is still always safe — an
# evicted frame recomputes from lineage.
RING_MAX = 6


def _session_dead(df: DataFrame) -> bool:
    """True when the frame's SparkContext has been stopped — its cache
    entry died with the JVM, and calling unpersist() on it would raise.

    Only the *expected* stopped-session signals count as dead: the
    explicit `_jsc is None` sentinel; the attribute chain being torn
    down (AttributeError after `SparkSession.stop()`, or an environment
    like Spark Connect where `_jsc` never exists — there the CacheManager
    handle is gone from this process either way); or a py4j-layer error /
    an error naming the stopped context (the JVM gateway is gone).  Any
    other, transient exception keeps the frame in the ring so the
    best-effort unpersist in the eviction path still gets a chance to run
    (ADVICE r6: classifying every error as dead silently leaked
    still-persisted frames)."""
    try:
        return df.sparkSession.sparkContext._jsc is None
    except AttributeError:
        return True
    except Exception as e:  # noqa: BLE001 — classified below, not swallowed
        if type(e).__module__.startswith("py4j"):
            return True
        msg = str(e).lower()
        return "shut down" in msg or "shutdown" in msg or "stopped" in msg


def ring_persist(df: DataFrame) -> DataFrame:
    from pyspark import StorageLevel
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    # the ring is process-global and outlives SparkSession restarts
    # (ADVICE r5): frames bound to a stopped session are already gone
    # from the (dead) CacheManager — drop them without unpersist, so a
    # later eviction never raises into an unrelated healthy-session op
    CACHE_RING[:] = [c for c in CACHE_RING if not _session_dead(c)]
    # Spark's CacheManager keys entries by canonicalized plan, so
    # re-persisting a semantically identical frame (the same op invoked
    # again in one session) shares ONE cache entry with the ring's older
    # handle. Keeping both handles would let the ring's eviction
    # unpersist that shared entry out from under the frame just
    # registered — the op would then run fully uncached (the exact
    # multi-scan recomputation the persist exists to prevent). Drop the
    # older duplicate handle WITHOUT unpersist (same entry, now owned by
    # the new handle); any comparison error keeps the frame.
    keep = []
    for c in CACHE_RING:
        try:
            if c.sameSemantics(df):
                continue
        except Exception:  # noqa: BLE001 — cross-session/py4j: not a dup
            pass
        keep.append(c)
    CACHE_RING[:] = keep
    CACHE_RING.append(df)
    while len(CACHE_RING) > RING_MAX:
        old = CACHE_RING.pop(0)
        try:  # best-effort: eviction must never fail the caller's op
            old.unpersist(blocking=False)
        except Exception:
            pass
    return df
