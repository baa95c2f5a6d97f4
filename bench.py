#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "runs": {...}, "sf": ...}

Each query runs warm-ups until back-to-back passes converge (min 3,
max 6 — pays file listing, codegen compile, broadcast build, and JIT
tier-up), then three timed runs (five when the first three spread >2.5x — a
GC-pause excursion can hit any single run). The per-query stat in
"queries" (and the suite total in "value") is the MEDIAN of the runs
— same-box re-runs of this suite historically ranged +-20%, so a
single run (or the min, which systematically understates steady-state
cost) made round-over-round numbers incomparable; the median resists
one GC-paused outlier in either direction. All raw runs are
emitted under "runs" so any consumer can recompute min/max/spread.
A System.gc() between queries keeps one query's garbage from billing
the next. The timed action is a write to the `noop` v2 sink: unlike
count() — under which Catalyst prunes any column the count doesn't
need, silently skipping the expensive expressions — noop materializes
EVERY output column, without paying driver-side collection of wide
rows.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from siskin_spark.session import get_spark  # noqa: E402


#: canonical host window for control_normalized_s: the jvm-xxhash
#: control of the committed r10 record (BENCH_r10.json, local[32]) —
#: every later record rescales its suite seconds to this pin so
#: cross-round tables need no host-window footnote
_JVM_CONTROL_REF_S = 1.62


def _read_best(best_path: str) -> dict:
    """The committed control-best record, or {} when absent/unreadable
    (first run on a fresh checkout becomes the record)."""
    try:
        with open(best_path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _promote_ok(record: dict, prev: dict) -> bool:
    """Promote predicate for the cross-round control-best record
    (r11 ask #4 + r12 verdict #2): the candidate's START control must
    be at least as fast as the committed record's, AND the candidate's
    own window must have held stable (jvm control end/start within
    10%) — a suite measured under a drifting host, in EITHER
    direction, is not a comparable cross-round number even if its
    start control looked good."""
    stab = record.get("window_stability")
    if stab is None or not (0.9 <= stab <= 1.1):
        return False
    return record["control_jvm_xxhash_s"] <= prev.get(
        "control_jvm_xxhash_s", float("inf")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf)
    except ValueError:
        sf = None

    spark = get_spark("siskin-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # JIT compilation runs on background JVM threads; after a query's
    # warm-ups converge, queued C2 compilations (this query's AND the
    # previous queries') can still be in flight, stealing cores from
    # the first timed run. Poll the cumulative JIT compile-time counter
    # until it stops advancing before starting the clock.
    comp_bean = spark._jvm.java.lang.management.ManagementFactory.getCompilationMXBean()

    def jit_quiesce(max_wait: float = 5.0, poll: float = 0.15) -> None:
        last = comp_bean.getTotalCompilationTime()
        waited = 0.0
        while waited < max_wait:
            time.sleep(poll)
            waited += poll
            cur = comp_bean.getTotalCompilationTime()
            if cur - last < 5:  # <5ms compile activity in a poll window
                return
            last = cur

    # host-speed controls FIRST (r9 verdict #7: bench records quoted
    # across host windows were incomparable) — the SAME pinned
    # workloads as scale_bench's artifacts, so any two bench/scale
    # records compare via control-to-control, and a per-query
    # cross-round diff can be read against the host normalizer
    controls: dict[str, float] = {}
    from scale_bench import _control_leg

    def timed_df(df) -> float:
        t0 = time.perf_counter()
        materialize(df)
        return time.perf_counter() - t0

    _control_leg(spark, controls, timed_df)

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    warmups: dict[str, int] = {}
    for name, fn in sorted(queries.items()):
        # convergence-gated warm-up: the first pass pays file listing,
        # codegen compile and broadcast build; subsequent passes let the
        # JIT tier the generated code up to C2. A FIXED two warm-ups was
        # not enough for the hash-heavy queries (minhash/neardup measured
        # 9.8 -> 2.1 -> 1.4 -> 1.4 per fresh JVM: still tiering during
        # the timed runs, which committed 2.4-4x max/min spreads), so
        # warm until TWO consecutive passes stop improving by >20% — one
        # converged delta proved spoofable by a transient plateau
        # mid-tier-up (min 3 passes, max 6).
        wt: list[float] = []
        while len(wt) < 6:
            w0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            wt.append(time.perf_counter() - w0)
            if (
                len(wt) >= 3
                and wt[-1] > 0.8 * wt[-2]
                and wt[-2] > 0.8 * wt[-3]
            ):
                break
        warmups[name] = len(wt)
        # untimed housekeeping before the clock starts: collect the
        # warm-ups' garbage (3-6 passes of it) and wait out the JIT
        # compile queue — both otherwise bill to the first timed run
        spark._jvm.System.gc()
        jit_quiesce()
        ts: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            ts.append(round(time.perf_counter() - t0, 4))
        if max(ts) > 2.5 * min(ts):
            # a single GC pause / host-steal excursion can hit one run
            # (observed: a 14.8s run amid 1.6s neighbors); add two more
            # samples and report the median of all five — every raw run
            # stays in "runs", nothing is discarded
            for _ in range(2):
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                ts.append(round(time.perf_counter() - t0, 4))
        timings[name] = round(statistics.median(ts), 4)
        runs[name] = ts
        spark._jvm.System.gc()  # untimed: don't bill this query's garbage to the next

    total = round(sum(timings.values()), 4)
    # resample the jvm control AFTER the suite: external steal is
    # bursty, and a single control at t=0 cannot vouch for a 10-minute
    # window (r12 observed two runs at near-identical start controls
    # with a 20% suite spread; an A/B against the prior commit plus
    # isolated per-query reruns pinned it on the window, not the code).
    # window_stability = end/start — far from 1.0 means the suite total
    # is window-noise-dominated; re-run before reading it as a trend.
    controls_end: dict[str, float] = {}
    _control_leg(spark, controls_end, timed_df)
    record = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        # run counts vary per query (3, or 5 on a >2.5x spread) — the
        # label must not claim a fixed 3; per-query counts are in "runs"
        "stat": "median"
        if any(len(r) != 3 for r in runs.values())
        else "median_of_3",
        "queries": timings,
        "runs": runs,
        "warmups": warmups,
        "sf": sf,
        "n_queries": len(timings),
        "cpus": cpus,
        # host normalizer: same pinned workloads as the SCALE artifacts
        # (scale_bench._control_leg) — compare records control-to-control
        "control_jvm_xxhash_s": round(controls["control_jvm_xxhash_s"], 2),
        "control_jvm_xxhash_rows": controls["control_jvm_xxhash_rows"],
        "control_py_md5_s": round(controls["control_py_md5_s"], 2),
        "control_py_md5_iters": controls["control_py_md5_iters"],
        "control_jvm_xxhash_end_s": round(
            controls_end["control_jvm_xxhash_s"], 2
        ),
        "window_stability": round(
            controls_end["control_jvm_xxhash_s"]
            / controls["control_jvm_xxhash_s"],
            3,
        ),
        # the record self-describes its host window (r10 verdict #7):
        # suite seconds rescaled to the canonical window so round-over-
        # round tables compare directly — a record taken on a 35%-slower
        # host (jvm control 2.2 vs 1.62) reads ~35% lower here, no
        # footnote needed. Only comparable between records with equal
        # "cpus" (the control parallelizes over the same local[N]).
        # The rescale is linear and calibrated on mild drift; under
        # HEAVY steal (control >= 2x the pin) the pure-JVM control
        # slows more than mixed query work does and the correction
        # OVERSTATES — prefer the control-best committed record for
        # cross-round tables and treat heavy-window normalized values
        # as a lower bound.
        "control_normalized_s": round(
            total * _JVM_CONTROL_REF_S / controls["control_jvm_xxhash_s"], 4
        ),
        "control_ref_jvm_xxhash_s": _JVM_CONTROL_REF_S,
    }
    print(json.dumps(record))
    # also persist the COMPLETE record to a repo file: the driver stores
    # only a 2000-char tail of stdout, which truncates mid-JSON and
    # loses the alphabetically-first queries from the committed history.
    # Every run writes the *_lastrun file; the control-best file
    # (BENCH_local_sf{sf}.json, the cross-round comparison record) is
    # only overwritten when this run's host window is at least as fast
    # as the committed record's — a run on a heavy-steal window must
    # not clobber the best-window record (it happened twice; r11
    # verdict ask #4).
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(repo_dir, f"BENCH_local_sf{sf}_lastrun.json"),
    )
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(record, fh, indent=1)
            fh.write("\n")
        best_path = os.path.join(repo_dir, f"BENCH_local_sf{sf}.json")
        # promote only from a STABLE window (r12 verdict #2): a suite
        # whose jvm control drifted >10% start-to-end produced its
        # total under a moving host — the r12 record rode a 0.796-
        # stability window (the suite sped up 20% mid-run) and read
        # flatteringly low. Both conditions must hold: at least as
        # fast a start control as the committed record, AND the
        # window held within 10% for the whole suite.
        promote = _promote_ok(record, _read_best(best_path))
        if promote:
            with open(best_path, "w") as fh:
                json.dump(record, fh, indent=1)
                fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
