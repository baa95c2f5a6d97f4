"""memo.py contract tests: None-result caching (sentinel miss),
session_token stability, and mtime-superseding eviction via
evict_prefix. Relocated from test_pipeline_streaming.py (r5 verdict,
misfiled-tests item)."""

from __future__ import annotations

from siskin_spark.memo import _CACHE, gateway_epoch, memo, session_token


def test_memo_none_and_session_token(spark):
    """memo() caches a legitimately-None build result (sentinel miss
    test) and session_token is stable per session object — not an
    id() address that a GC'd session could recycle."""
    calls = []

    def build():
        calls.append(1)
        return None

    key = ("test-none-memo", id(build))
    assert memo(key, build) is None
    assert memo(key, build) is None
    assert len(calls) == 1  # second call served from cache despite None
    tok1 = session_token(spark)
    assert tok1 == session_token(spark)
    assert isinstance(tok1, str) and len(tok1) >= 8


def test_memo_evict_prefix_supersedes(spark):
    """Inserting under a new freshness component (e.g. a path mtime)
    with evict_prefix drops the prior entries for the same logical key
    instead of accumulating them for the epoch's lifetime — and leaves
    unrelated keys alone."""
    marker = f"test-evict-{id(spark)}"
    pre = ("scan-test", marker, "/some/path")
    other_key = ("scan-test", marker, "/other/path", 1.0)

    memo(other_key, lambda: "other")
    memo(pre + (1.0,), lambda: "v1")
    memo(pre + (2.0,), lambda: "v2", evict_prefix=pre)

    epoch = gateway_epoch()
    assert (epoch,) + pre + (1.0,) not in _CACHE  # superseded
    assert _CACHE[(epoch,) + pre + (2.0,)] == "v2"
    assert _CACHE[(epoch,) + other_key] == "other"  # untouched
    # and the fresh entry still serves without rebuilding
    assert memo(pre + (2.0,), lambda: "REBUILT", evict_prefix=pre) == "v2"
