"""Promote predicate for the cross-round control-best bench record
(bench.py): a candidate must (a) start on a host window at least as
fast as the committed record's and (b) have held a stable window for
its whole suite (jvm control end/start within 10%). Pure-Python —
no SparkSession."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _promote_ok, _read_best  # noqa: E402


def _rec(ctrl: float, stab: float) -> dict:
    return {"control_jvm_xxhash_s": ctrl, "window_stability": stab}


def test_promotes_on_faster_stable_window():
    assert _promote_ok(_rec(2.0, 1.0), _rec(2.4, 1.0))
    # equal control also promotes (ties refresh the record)
    assert _promote_ok(_rec(2.4, 0.95), _rec(2.4, 1.0))


def test_rejects_slower_start_control():
    assert not _promote_ok(_rec(2.5, 1.0), _rec(2.0, 1.0))


def test_rejects_unstable_window_even_when_faster():
    # the r12 hazard: a 0.796-stability window (suite sped up 20%
    # mid-run) produced a flattering total off a good start control
    assert not _promote_ok(_rec(1.8, 0.796), _rec(2.4, 1.0))
    # drift in the OTHER direction (host slowed down) is equally
    # non-comparable — don't let a pessimistic record block later wins
    assert not _promote_ok(_rec(1.8, 1.25), _rec(2.4, 1.0))
    # boundary: exactly 0.9 / 1.1 are stable
    assert _promote_ok(_rec(1.8, 0.9), _rec(2.4, 1.0))
    assert _promote_ok(_rec(1.8, 1.1), _rec(2.4, 1.0))


def test_missing_stability_field_never_promotes():
    assert not _promote_ok({"control_jvm_xxhash_s": 1.0}, _rec(2.4, 1.0))


def test_first_run_becomes_record_only_if_stable(tmp_path):
    # no committed record: prev == {} -> promote iff candidate stable
    prev = _read_best(str(tmp_path / "nope.json"))
    assert prev == {}
    assert _promote_ok(_rec(9.9, 1.0), prev)
    assert not _promote_ok(_rec(9.9, 0.5), prev)
