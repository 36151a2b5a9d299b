"""Session-scoped DataFrame cache hygiene for module-level caches.

graph._TRI_CENSUS_CACHE and text._BIGRAM_CB_CACHE memoize NODE-/vocab-sized
localCheckpoint'd frames per (applicationId, fixture dir). Two caveats this
module exists to manage (r8 ADVICE):

- Entries for STOPPED sessions would otherwise pin dead DataFrames for the
  process lifetime. ``evict_stale`` drops every entry whose applicationId is
  not the caller's current one — in a one-context-per-process world any
  other appId is a stopped (or replaced) context — and is called on every
  cache lookup.
- localCheckpoint blocks live in executor storage, which is NOT reliable
  storage: after an executor loss the cached frame FAILS the job instead of
  recomputing (Spark cannot rebuild truncated lineage). Callers accept that
  trade for the measured win (triangle census 18.5 s -> 0.2 s warm); a
  production deployment that must survive executor loss should swap
  localCheckpoint for reliable checkpoint() on these two frames.
"""

from __future__ import annotations


def evict_stale(cache: dict, current_app_id: str, cap: int = 8) -> None:
    """Drop cache entries from other (stopped) Spark applications, then cap
    the dict at ``cap`` entries (oldest-inserted first) so a long-lived
    process cycling fixture dirs cannot grow it unboundedly. Cache keys must
    be tuples whose first element is the owning applicationId."""
    stale = [k for k in cache if k[0] != current_app_id]
    for k in stale:
        cache.pop(k, None)
    while len(cache) > cap:
        cache.pop(next(iter(cache)), None)


def clear_all() -> None:
    """Drop every module-level DataFrame cache (bench standalone honesty:
    a solo-timed sample must not silently reuse a checkpoint built during
    the interleaved pass)."""
    from go_batch_processor_spark.operators import graph, text

    graph._TRI_CENSUS_CACHE.clear()
    text._BIGRAM_CB_CACHE.clear()
