"""Property test: pack_shards equals a direct sequential reference.

The operator composes an md5 order hash, a two-phase distributed
prefix sum, and integer shard cuts — the reference here is the naive
single-threaded layout (sort rows by (bucket, hash, id), walk them
accumulating offsets), so any divergence in hash math, bucket
assignment, sum order, or the DIV cut shows up on random inputs,
including duplicate weights, zero weights, and budgets smaller than a
single row's weight.
"""

from __future__ import annotations

import hashlib

import hypo
from hypothesis import HealthCheck, given, settings, strategies as st

from demo_apache_flink_streaming_mode_spark.operators.scale import pack_shards

rows_strategy = st.lists(
    st.integers(min_value=0, max_value=50),  # weights incl. zero
    min_size=1, max_size=60,
).map(lambda ws: [(i + 1, w) for i, w in enumerate(ws)])


def _ref_layout(rows, budget, num_buckets):
    """(id, weight) -> {id: (global_offset, shard_id)} sequentially."""
    def h(i):
        return int(hashlib.md5(f"shard:{i}".encode()).hexdigest()[:15], 16)

    ordered = sorted(rows, key=lambda r: (h(r[0]) % num_buckets,
                                          h(r[0]), r[0]))
    out, off = {}, 0
    for i, w in ordered:
        out[i] = (off, off // budget)
        off += w
    return out


@hypo.budget(20)
@given(rows=rows_strategy, budget=st.integers(min_value=1, max_value=120),
       num_buckets=st.sampled_from([1, 3, 8]))
def test_pack_shards_matches_sequential_reference(spark, rows, budget,
                                                  num_buckets):
    df = spark.createDataFrame(rows, "id long, w long")
    got = {r.id: (r.global_offset, r.shard_id)
           for r in pack_shards(df, "id", "w", budget,
                                num_buckets=num_buckets).collect()}
    assert got == _ref_layout(rows, budget, num_buckets)
