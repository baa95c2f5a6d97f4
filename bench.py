#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "runs": {...}, "sf": ...}

Each query is executed four times: a warm-up that also triggers
JIT/codegen caches, then three timed runs. The per-query stat in
"queries" (and the suite total in "value") is the MEDIAN of the three
— same-box re-runs of this suite historically ranged +-20%, so a
single run (or the min, which systematically understates steady-state
cost) made round-over-round numbers incomparable; the median resists
one GC-paused outlier in either direction. All three raw runs are
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

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name, fn in sorted(queries.items()):
        # two warm-ups: the first pays file listing, codegen compile and
        # broadcast build; the second lets the JIT tier the generated
        # code up to C2 (one pass is not enough — the md5/shingle-heavy
        # queries measured [5.7, 3.1, 2.1] across runs with one warm-up,
        # so a median-of-3 was still billing compilation, not the query)
        materialize(fn(spark, sf_dir))
        materialize(fn(spark, sf_dir))
        ts: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            ts.append(round(time.perf_counter() - t0, 4))
        timings[name] = round(statistics.median(ts), 4)
        runs[name] = ts
        spark._jvm.System.gc()  # untimed: don't bill this query's garbage to the next

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "stat": "median_of_3",
                "queries": timings,
                "runs": runs,
                "sf": sf,
                "n_queries": len(timings),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
