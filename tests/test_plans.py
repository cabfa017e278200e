"""Physical-plan regression guard (scale hygiene).

Builds every registry query's executed plan (no execution) and asserts
the interpreter/shuffle antipatterns stay out:

- SortAggregate: an aggregate fell out of HashAggregate (immutable
  buffer type, e.g. min/max over strings/arrays) — loses map-side
  partial aggregation.
- CartesianProduct: an unbounded cross join appeared.
- BroadcastNestedLoopJoin: allowed ONLY in the three deliberate
  brute-force baselines whose scale paths are the LSH/IVF variants.
"""

from __future__ import annotations

import pytest

from demo_apache_flink_streaming_mode_spark.plans.registry import ALL_QUERIES

SF = "/root/testdata/sf0.001"

BNLJ_ALLOWED = {"dedup_embedding_cosine", "sim_topk_bruteforce", "sim_topk_ivf"}


@pytest.mark.parametrize("query", ALL_QUERIES, ids=lambda q: q.name)
def test_no_plan_antipatterns(spark, query):
    plan = query.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan, f"{query.name}: SortAggregate in plan"
    assert "CartesianProduct" not in plan, f"{query.name}: CartesianProduct in plan"
    if query.name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{query.name}: unexpected BroadcastNestedLoopJoin")
