"""The relation cache must stay bounded under per-query session churn
(each cached DataFrame pins its creating session alive, so an unbounded
dict would leak one session + N frames per spark.newSession())."""

from __future__ import annotations

from lingo_db_spark import catalog


def test_relation_cache_evicts_oldest_sessions():
    saved = dict(catalog._RELATION_CACHE)
    catalog._RELATION_CACHE.clear()
    try:
        for s in range(3 * catalog._CACHE_MAX_SESSIONS):
            key = (s, "app")
            catalog._evict_stale_sessions(key)
            for p in ("/a", "/b"):
                catalog._RELATION_CACHE[(s, "app", p)] = object()
        sessions = {(sid, app) for (sid, app, _p) in catalog._RELATION_CACHE}
        assert len(sessions) <= catalog._CACHE_MAX_SESSIONS
        # newest sessions survive, oldest were evicted
        assert (3 * catalog._CACHE_MAX_SESSIONS - 1, "app") in sessions
        assert (0, "app") not in sessions
        # re-seen session is not double-counted or evicted
        catalog._evict_stale_sessions(
            (3 * catalog._CACHE_MAX_SESSIONS - 1, "app"))
        assert {(sid, app) for (sid, app, _p)
                in catalog._RELATION_CACHE} == sessions
    finally:
        catalog._RELATION_CACHE.clear()
        catalog._RELATION_CACHE.update(saved)
