#!/usr/bin/env python
"""Capture .explain('formatted') for every declared query into
plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (round dir defaults to
r14). Usage: python tools_capture_plans.py <tag> [query ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from siskin_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("siskin-plans", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    for name in sorted(qs):
        if only and name not in only:
            continue
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(name, len(plan.splitlines()), "lines")
    spark.stop()


if __name__ == "__main__":
    main()
