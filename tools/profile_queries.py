"""Per-query profiling harness for the optimization rounds.

For each named query (or the N slowest from bench_result.json):
  - time DataFrame CONSTRUCTION (python fn call: py4j plan building),
  - time PLANNING (analysis+optimization+physical planning via
    queryExecution().executedPlan()),
  - time EXECUTION to the noop sink, min over --passes runs,
  - optionally dump .explain("formatted") to plans/<tag>/<q>_<suffix>.txt.

Usage:
  python tools/profile_queries.py [--top N | q1 q2 ...] [--passes 3]
      [--sf-dir /root/testdata/sf0.1] [--plans plans/r11 --suffix before]

Same session shape as bench.py (local[$SPARK_GRAFT_CPUS]); queries are
labeled via setJobDescription per guide §1.5.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_apache_flink_streaming_mode_spark.plans.registry import ALL_QUERIES
from demo_apache_flink_streaming_mode_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--plans", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    by_name = {q.name: q for q in ALL_QUERIES}
    names = list(args.names)
    if args.top:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        prior_path = os.path.join(here, "bench_result.json")
        try:
            prior = json.load(open(prior_path))["queries"]
        except (OSError, ValueError, KeyError) as e:
            raise SystemExit(
                f"--top needs a committed {prior_path} with a 'queries' "
                f"map (run bench.py first): {e}")
        names += [n for n, _ in sorted(prior.items(), key=lambda kv: -kv[1])
                  if n in by_name][: args.top]
    names = list(dict.fromkeys(names))  # dedupe, preserving order
    qs = [by_name[n] for n in names]

    spark = get_spark("profile")
    sc = spark.sparkContext

    results = {}
    for q in qs:
        if not args.no_warm:  # codegen/JIT warm pass at the small SF
            sc.setJobDescription(f"warm:{q.name}")
            q.fn(spark, args.warm_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        cons, plan, execs = [], [], []
        for p in range(args.passes):
            sc.setJobDescription(f"{q.name}:p{p}")
            t0 = time.perf_counter()
            df = q.fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            spark.catalog.clearCache()
            cons.append(t1 - t0)
            plan.append(t2 - t1)
            execs.append(t3 - t2)
            print(f"  {q.name} p{p}: construct={t1-t0:.2f} plan={t2-t1:.2f} "
                  f"exec={t3-t2:.2f} total={t3-t0:.2f}", flush=True)
        if cons:
            results[q.name] = {
                "construct_min": round(min(cons), 3),
                "plan_min": round(min(plan), 3),
                "exec_min": round(min(execs), 3),
                "total_min": round(min(c + p_ + e for c, p_, e in
                                       zip(cons, plan, execs)), 3),
            }
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = q.fn(spark, args.sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans, f"{q.name}_{args.suffix}.txt"), "w") as f:
                f.write(txt)
            spark.catalog.clearCache()
        sc.setJobDescription(None)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
