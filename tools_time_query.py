#!/usr/bin/env python
"""Time one or more declared queries in isolation (noop sink), mirroring
bench.py methodology. Usage: python tools_time_query.py q1 [q2 ...] [--runs N]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from siskin_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 5
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("siskin-timeq", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    comp_bean = spark._jvm.java.lang.management.ManagementFactory.getCompilationMXBean()

    def jit_quiesce(max_wait=5.0, poll=0.15):
        last = comp_bean.getTotalCompilationTime()
        waited = 0.0
        while waited < max_wait:
            time.sleep(poll)
            waited += poll
            cur = comp_bean.getTotalCompilationTime()
            if cur - last < 5:
                return
            last = cur

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    qs = entry_mod.queries()
    from scale_bench import _control_leg

    def timed_df(df) -> float:
        t0 = time.perf_counter()
        materialize(df)
        return time.perf_counter() - t0

    controls: dict = {}
    _control_leg(spark, controls, timed_df)
    print(f"jvm control: {controls['control_jvm_xxhash_s']:.2f}s")
    for name in args:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warm {name}")
        wt = []
        while len(wt) < 6:
            w0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            wt.append(time.perf_counter() - w0)
            if len(wt) >= 3 and wt[-1] > 0.8 * wt[-2] and wt[-2] > 0.8 * wt[-3]:
                break
        spark._jvm.System.gc()
        jit_quiesce()
        ts = []
        spark.sparkContext.setJobDescription(f"timed {name}")
        for _ in range(runs):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            ts.append(round(time.perf_counter() - t0, 4))
            spark._jvm.System.gc()
        print(
            f"{name}: median {statistics.median(ts):.4f}  runs {ts}  "
            f"warmups {[round(w, 3) for w in wt]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
