"""Benchmark harness: run every registry query at the bench scale factor
and print ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query executes its full physical plan into Spark's noop sink (no
driver-side collect, no Python in the result path) so the measured time
is the engine, not the harness. Env: SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), SPARK_GRAFT_CPUS (default all cores).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo_apache_flink_streaming_mode_spark.plans.registry import ALL_QUERIES
from demo_apache_flink_streaming_mode_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    # Warm-up: run every query once at the small SF (untimed). The plans are
    # identical, so this compiles the same whole-stage-codegen classes and
    # C2-heats the expression interpreter; the timed pass then measures the
    # data-proportional engine work (steady-state throughput), not one-shot
    # JVM compilation overhead.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.01")
    for q in ALL_QUERIES:
        q.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()

    # Two timed passes, min per query: the host shows bursty multi-second
    # interference stalls (hypervisor steal), and min-of-N isolates engine
    # time from environment noise.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for q in ALL_QUERIES:
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[q.name] = min(timings.get(q.name, dt), dt)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_query_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
