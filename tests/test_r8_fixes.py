"""Round-8 optimization regression tests.

1. Cache-ring handle aliasing: Spark's CacheManager keys cache entries
   by canonicalized plan, so re-persisting a semantically identical
   frame (the same pipeline op invoked twice in one session — exactly
   what bench best-of-N reps do) shares ONE cache entry with the ring's
   older handle. The pre-fix ring kept both handles, so evicting the
   older one unpersisted the shared entry out from under the frame the
   current invocation had just registered — the op then ran fully
   uncached (measured 1.5 s → 8-15 s per rep on pipeline_curate_v2).
"""

from __future__ import annotations


def _drain_ring():
    from tbl_spark.pipelines._cache import CACHE_RING
    for c in CACHE_RING:
        try:
            c.unpersist(blocking=False)
        except Exception:
            pass
    CACHE_RING.clear()


def test_ring_repersist_same_plan_keeps_one_live_handle(spark):
    from tbl_spark.pipelines._cache import CACHE_RING, RING_MAX, ring_persist

    _drain_ring()
    try:
        plan = lambda: spark.range(100).selectExpr("id", "id * 2 AS v")  # noqa: E731
        first = ring_persist(plan())
        assert first.count() == 100  # materialize the shared entry

        # the same op invoked again: fresh DataFrame object, same
        # canonicalized plan → same CacheManager entry
        again = ring_persist(plan())
        dups = [c for c in CACHE_RING if c.sameSemantics(again)]
        assert len(dups) == 1, "older duplicate handle must be dropped"

        # fill most of the ring with distinct frames: pre-fix, the stale
        # duplicate handle sat at the front and its eviction here would
        # have unpersisted the entry `again` still relies on
        for i in range(RING_MAX - 1):
            ring_persist(spark.range(200 + i))
        assert again in CACHE_RING
        lvl = again.storageLevel
        assert lvl.useMemory or lvl.useDisk, (
            "shared cache entry was unpersisted by a stale duplicate "
            "handle's eviction")
    finally:
        _drain_ring()


def test_ring_distinct_plans_still_evict(spark):
    from tbl_spark.pipelines._cache import CACHE_RING, RING_MAX, ring_persist

    _drain_ring()
    try:
        frames = [ring_persist(spark.range(300 + i))
                  for i in range(RING_MAX + 2)]
        assert len(CACHE_RING) == RING_MAX
        # the two oldest were genuinely evicted (distinct plans — their
        # entries die with them), the newest RING_MAX survive
        for old in frames[:2]:
            lvl = old.storageLevel
            assert not (lvl.useMemory or lvl.useDisk)
        for live in frames[2:]:
            assert live in CACHE_RING
    finally:
        _drain_ring()
