"""Property tests: the HLL and CMS sketches against sequential
references on hypothesis-generated data.

Both sketches are md5-deterministic, so a plain-Python reference
reproduces not just error bounds but the EXACT estimates — any drift
in bucket math, rho, the dense-register fold, or the min-of-rows
lookup is an equality failure, not a tolerance miss.  The merge
invariant (union of sub-sketch registers == whole-corpus sketch) runs
over random splits, the distributed-combine contract at 100 TB.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pytest
import hypo
from hypothesis import HealthCheck, given, settings, strategies as st

from demo_apache_flink_streaming_mode_spark.operators import sketches as SK
from demo_apache_flink_streaming_mode_spark.operators.sketches import (
    HLL_ALPHA, HLL_M, _POW2_61)

SLOW = hypo.budget(12)

kv_rows = st.lists(
    st.tuples(st.integers(1, 2), st.integers(0, 500)),
    min_size=1, max_size=40)

word = st.text(alphabet="abc", min_size=1, max_size=3)
corpus = st.lists(
    st.lists(word, min_size=1, max_size=8).map(" ".join),
    min_size=1, max_size=4,
).map(lambda ds: [(i + 1, d) for i, d in enumerate(ds)])


def _hll_ref(rows, m=HLL_M):
    """key -> exact hll_est: md5 bucket/rho registers + dense fold."""
    regs = defaultdict(dict)
    for k, v in rows:
        h = hashlib.md5(str(v).encode()).hexdigest()
        bucket = int(h[:2], 16) % m
        v60 = int(h[2:17], 16)
        rho = 61 if v60 == 0 else 61 - v60.bit_length()
        regs[k][bucket] = max(regs[k].get(bucket, 0), rho)
    out = {}
    for k, r in regs.items():
        s = sum(1 << (61 - r.get(b, 0)) for b in range(m))
        out[k] = (HLL_ALPHA * m * m) * _POW2_61 / float(s)
    return out


@SLOW
@given(rows=kv_rows)
def test_hll_estimate_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r.k: r.hll_est
           for r in SK.hll_distinct(df, ["k"], "v").collect()}
    want = _hll_ref(rows)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


@SLOW
@given(rows=kv_rows, cut=st.integers(0, 40))
def test_hll_merge_of_random_split_equals_whole(spark, rows, cut):
    """Union of two sub-sketch register tables, merged by register-wise
    max, estimates EXACTLY what the whole-corpus sketch estimates —
    for any split point, including empty parts."""
    cut = min(cut, len(rows))
    schema = "k long, v long"
    whole = spark.createDataFrame(rows, schema)
    parts = [spark.createDataFrame(p, schema)
             for p in (rows[:cut], rows[cut:]) if p]
    regs = SK.hll_registers(parts[0], ["k"], "v")
    for p in parts[1:]:
        regs = regs.unionByName(SK.hll_registers(p, ["k"], "v"))
    got = {r.k: r.hll_est
           for r in SK.hll_estimate(SK.hll_merge(regs, ["k"]),
                                    ["k"]).collect()}
    want = {r.k: r.hll_est
            for r in SK.hll_distinct(whole, ["k"], "v").collect()}
    assert got == want


@SLOW
@given(rows=corpus, w=st.sampled_from([4, 16]))
def test_cms_estimates_match_reference(spark, rows, w):
    """cms_term_estimates == sequential d*w counter build + min-of-rows
    lookup; tiny w forces dense collisions so overcounts are exercised,
    and overcount >= 0 by construction."""
    d = 3
    truth = Counter(t for _, text in rows for t in text.split(" "))
    counters = Counter()

    def bucket(term, row):
        h = hashlib.md5(f"{row}:{term}".encode()).hexdigest()
        return int(h[:4], 16) % w

    for term, c in truth.items():
        for row in range(d):
            counters[(row, bucket(term, row))] += c
    want = {}
    for term, c in truth.items():
        est = min(counters[(row, bucket(term, row))] for row in range(d))
        want[term] = (c, est, est - c)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.term: (r.true_cnt, r.cms_est, r.overcount)
           for r in SK.cms_term_estimates(df, d=d, w=w).collect()}
    assert got == want
    assert all(v[2] >= 0 for v in got.values())
