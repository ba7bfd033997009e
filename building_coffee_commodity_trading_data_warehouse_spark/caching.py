"""Bounded persist() registry shared by operators that cache
intermediate frames during plan construction (dedup shingle frames,
Pareto per-customer aggregates).

Why not try/finally-unpersist: these operators RETURN a lazy DataFrame
whose plan reads the cached frame — unpersisting before the caller's
action would silently recompute the expensive intermediate and defeat
the cache. Why not leave it to Spark's LRU: a long-lived session
(notebook, server) that runs many dedup/analytics calls accumulates
cached blocks without bound until executor-memory pressure evicts
them, paying eviction churn in the hot path.

Policy: keep the newest ``_CAP`` scoped frames, eagerly releasing
older ones (oldest-first). Each cached frame here is bounded by
construction (corpus-row-sized shingle frames gated at
``_BITMAP_MAX_DOCS``, per-customer aggregates), so the worst-case
held memory is ``_CAP`` × one bounded frame. ``release_caches()``
drops everything — call it between pipeline stages or in tests.

Composition hazard the cap cannot remove: a driver that CONSTRUCTS
more than ``_CAP`` cache-backed operators before running an action on
the first one will see the oldest registrations evicted and silently
recomputed at action time. The cap (8) covers every in-repo pipeline
with headroom; sessions composing more lazily-held operators than
that should trigger actions as they go or raise ``_CAP``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CAP = 8
_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it; evict the oldest registered
    frame beyond the cap. Returns the persisted frame.

    Eviction is PLAN-aware: Spark's CacheManager keys cache entries by
    canonicalized plan, so two calls that build the same frame share
    one entry — unpersisting the old registration would yank the entry
    out from under the newer one (measured: repeated bitmap-dedup runs
    went 3× slower when eviction uncached the shared shingle frame
    mid-sequence). An evicted frame is only unpersisted when no newer
    registered frame has the same semantics."""
    p = df.persist()
    _SCOPED.append(p)
    while len(_SCOPED) > _CAP:
        old = _SCOPED.pop(0)
        try:
            shared = any(old.sameSemantics(cur) for cur in _SCOPED)
        except Exception:
            shared = False
        if not shared:
            old.unpersist(blocking=False)
    return p


def release_caches() -> None:
    """Release every scoped-persisted frame (non-blocking)."""
    while _SCOPED:
        _SCOPED.pop().unpersist(blocking=False)
