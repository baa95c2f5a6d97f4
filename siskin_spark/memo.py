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

import threading
import uuid
from typing import Any, Callable

_CACHE: dict[tuple, Any] = {}
_LOCK = threading.Lock()
# Sentinel for cache misses: ``None`` is a legitimate build() result
# (a builder that returns None must not be rebuilt on every call).
_MISS = object()


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


def session_token(spark: Any) -> str:
    """Stable identity for a SparkSession's lifetime.

    ``id(session)`` is subject to the same CPython address-reuse hazard
    as ``id(SparkContext)`` (module doc), so session-scoped memo keys
    must not use it. A uuid is minted once and stashed on the session
    object; a genuinely new session (even one landing at a recycled
    address) gets a fresh token."""
    tok = getattr(spark, "_siskin_memo_token", None)
    if tok is None:
        tok = uuid.uuid4().hex
        try:
            spark._siskin_memo_token = tok
        except Exception:  # frozen/slotted proxy: degrade to address
            tok = f"addr:{id(spark)}"
    return tok


def memo(key: tuple, build: Callable[[], Any], evict_prefix: tuple | None = None) -> Any:
    """Return ``build()`` memoized under ``key`` for the current gateway
    epoch. ``key`` must fold in every name/parameter the built object
    depends on. Thread-safe; ``build()`` runs outside the lock (it may
    perform Py4J round-trips), so two racing callers may both build —
    last insert wins, which is harmless for immutable plan objects.

    ``evict_prefix``: when inserting, additionally drop same-epoch
    entries whose key starts with this prefix (and differs from the
    full key) — for keys carrying a freshness component (e.g. a path
    mtime), where a new version supersedes every older one instead of
    accumulating beside them for the epoch's lifetime."""
    epoch = gateway_epoch()
    k = (epoch,) + key
    with _LOCK:
        v = _CACHE.get(k, _MISS)
    if v is _MISS:
        v = build()
        with _LOCK:
            stale = [c for c in _CACHE if c[0] != epoch]
            if evict_prefix is not None:
                pre = (epoch,) + evict_prefix
                stale += [
                    c
                    for c in _CACHE
                    if c != k and c[0] == epoch and c[: len(pre)] == pre
                ]
            for c in stale:
                del _CACHE[c]
            _CACHE[k] = v
    return v
