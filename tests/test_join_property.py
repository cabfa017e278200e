"""Property tests: the as-of join, the grid-binned interval join, and
the Z-order key against sequential references.

The as-of reference picks, per left row, the max-(ts, tiebreak) right
row with ts <= left ts — duplicate timestamps on both sides exercise
the <=-visibility and tiebreak rules the single-window carry must
reproduce.  The interval join must equal the brute-force range filter
with every pair EXACTLY once (the bin-exploded equi-join's claim).
The Z-order key must equal bit interleaving.
"""

from __future__ import annotations

from collections import Counter

import hypo
from hypothesis import given, strategies as st
from pyspark.sql import functions as F

from demo_apache_flink_streaming_mode_spark.operators import joins as J
from demo_apache_flink_streaming_mode_spark.operators.scale import zorder_key

SLOW = hypo.budget(12)

left_rows = st.lists(
    st.tuples(st.integers(1, 2), st.integers(0, 20)),
    min_size=1, max_size=15,
).map(lambda rs: [(k, ts, i + 1) for i, (k, ts) in enumerate(rs)])
right_rows = st.lists(
    st.tuples(st.integers(1, 2), st.integers(0, 20), st.integers(0, 5)),
    min_size=0, max_size=15)


@SLOW
@given(lrows=left_rows, rrows=right_rows)
def test_asof_join_matches_reference(spark, lrows, rrows):
    want = {}
    for k, lts, lid in lrows:
        cands = [(rts, rv) for rk, rts, rv in rrows
                 if rk == k and rts <= lts]
        want[lid] = max(cands) if cands else (None, None)
    l = spark.createDataFrame(lrows, "k long, lts long, lid long")
    r = spark.createDataFrame(rrows, "k long, rts long, rval long") \
        if rrows else spark.createDataFrame([], "k long, rts long, rval long")
    got = {row.lid: (row.rts, row.rval)
           for row in J.asof_join(l, r, "k", "lts", "rts",
                                  tiebreak=["rval"]).collect()}
    assert got == want


@SLOW
@given(lrows=left_rows, rrows=right_rows,
       lower=st.sampled_from([-5, 0, 3]), span=st.sampled_from([1, 7]))
def test_interval_join_matches_brute_force(spark, lrows, rrows, lower,
                                           span):
    """Every (left, right) pair with right_ts in [left_ts+lower,
    left_ts+upper] appears EXACTLY once — no bin-seam duplicates or
    misses. Timestamps shifted non-negative per the contract."""
    upper = lower + span
    shift = 5  # keep ts + lower >= 0 for the div-binning contract
    want = Counter((lid, rv, rts)
                   for _, lts, lid in lrows
                   for _, rts, rv in rrows
                   if lts + shift + lower <= rts + shift
                   <= lts + shift + upper)
    l = spark.createDataFrame(
        [(k, ts + shift, i) for k, ts, i in lrows],
        "k long, lts long, lid long")
    r = spark.createDataFrame(
        [(k, ts + shift, v) for k, ts, v in rrows],
        "k2 long, rts long, rval long") if rrows else \
        spark.createDataFrame([], "k2 long, rts long, rval long")
    got = Counter((row.lid, row.rval, row.rts - shift)
                  for row in J.interval_join(l, r, "lts", "rts",
                                             lower, upper).collect())
    assert got == want


@SLOW
@given(dims=st.lists(st.integers(0, 255), min_size=1, max_size=3),
       bits=st.sampled_from([4, 8]))
def test_zorder_key_matches_bit_interleave(spark, dims, bits):
    n = len(dims)
    want = 0
    for b in range(bits):
        for d, v in enumerate(dims):
            want |= ((v >> b) & 1) << (b * n + d)
    df = spark.createDataFrame([tuple(dims)],
                               ", ".join(f"c{i} long" for i in range(n)))
    got = df.select(zorder_key([F.col(f"c{i}") for i in range(n)],
                               bits).alias("z")).collect()[0].z
    assert got == want
