"""Gateway-scoped memoization for JVM-bound plan objects.

Column expressions and scan DataFrames wrap immutable JVM objects, so
rebuilding them on every plan build only pays Py4J round-trips — the
measured driver-side cost center for the expression-heavy operators
(spec projections, hyperplane/cosine trees, the capstone's literal
select lists). One shared helper replaces the per-module caches that
had grown in normalize/vectors/readers/__spark_entry__, so the epoch
and pruning semantics live in exactly one place.

Epoch key: ``id(SparkContext)`` alone is NOT a safe epoch — CPython
reuses freed addresses, so a restarted context can collide with its
predecessor and hand back objects bound to a dead JVM gateway. The
epoch therefore also folds in ``applicationId``, which is minted fresh
(timestamp-based in local mode) for every context lifetime.

Scope: a Column is valid for the lifetime of the JVM gateway (it is
not session-state-bound), so context epoch is the right scope for
expression memos. Scan DataFrames ARE session-bound — callers caching
those must fold a session identity into ``key`` themselves.

Pruning: inserting under a new epoch drops every entry from other
epochs — entries of a dead context are unreachable garbage holding
dead py4j refs, and without pruning they would pin them for process
lifetime.
"""

from __future__ import annotations

from typing import Any, Callable

_CACHE: dict[tuple, Any] = {}


def gateway_epoch() -> str:
    """Identity of the active SparkContext's lifetime (see module doc)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    app = None
    if sc is not None:
        try:
            app = sc.applicationId
        except Exception:  # context mid-shutdown: fall back to address only
            app = None
    return f"{id(sc)}:{app}"


def memo(key: tuple, build: Callable[[], Any]) -> Any:
    """Return ``build()`` memoized under ``key`` for the current gateway
    epoch. ``key`` must fold in every name/parameter the built object
    depends on."""
    epoch = gateway_epoch()
    k = (epoch,) + key
    v = _CACHE.get(k)
    if v is None:
        stale = [c for c in _CACHE if c[0] != epoch]
        for c in stale:
            del _CACHE[c]
        v = build()
        _CACHE[k] = v
    return v
