"""Property test: exact brute-force cosine top-k vs a sequential
reference — EXACT double equality.

The normalize/dot kernels are left-associative IEEE folds in index
order, so a plain Python walk (acc += x*x, acc += qa*ca, same order)
reproduces cosine scores bit-for-bit; the ranking reference re-states
the (score desc, neighbor id asc) tiebreak.  Integer-grid vectors
produce frequent EXACT score ties, the regime where an unstable sort
would diverge.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from demo_apache_flink_streaming_mode_spark.operators import similarity as S

DIM = 3

vec = st.lists(st.integers(-5, 5), min_size=DIM, max_size=DIM).map(
    lambda v: v if any(v) else [1] + v[1:])  # no zero-norm vectors
corpus = st.lists(vec, min_size=2, max_size=8).map(
    lambda vs: [(i + 1, [float(x) for x in v]) for i, v in enumerate(vs)])


def _unit(v):
    acc = 0.0
    for x in v:
        acc = acc + x * x
    n = math.sqrt(acc)
    return [x / n for x in v]


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=corpus, k=st.sampled_from([1, 3]), unrolled=st.booleans())
def test_topk_bruteforce_matches_reference(spark, rows, k, unrolled):
    qrows = rows[:2]
    units = {i: _unit(v) for i, v in rows}
    want = set()
    for qid, _ in qrows:
        scored = sorted(
            ((-_dot(units[qid], units[nid]), nid) for nid, _ in rows
             if nid != qid))
        for rank, (neg, nid) in enumerate(scored[:k], 1):
            want.add((qid, rank, nid, -neg))
    schema = "vec_id long, embedding array<double>"
    got = {(r.query_id, r.rank, r.neighbor_id, r.cos_sim)
           for r in S.topk_bruteforce(
               spark.createDataFrame(qrows, schema),
               spark.createDataFrame(rows, schema), k,
               dim=DIM if unrolled else None).collect()}
    assert got == want
