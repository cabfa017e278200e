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


def _ref_sequences(rows, ctx, num_buckets):
    """(id, weight) -> {(id, seq_id): (start_in_doc, n_in_seq)} by
    walking the sequential layout and slicing each row's token range
    into the ctx windows it overlaps."""
    layout = _ref_layout(rows, ctx, num_buckets)
    out = {}
    for i, w in rows:
        if w == 0:
            continue
        off = layout[i][0]
        for seq in range(off // ctx, (off + w - 1) // ctx + 1):
            start = max(seq * ctx - off, 0)
            end = min((seq + 1) * ctx, off + w) - off
            out[(i, seq)] = (start, end - start)
    return out


@hypo.budget(20)
@given(rows=rows_strategy, ctx=st.integers(min_value=1, max_value=40),
       num_buckets=st.sampled_from([1, 3, 8]))
def test_pack_sequences_matches_sequential_reference(spark, rows, ctx,
                                                     num_buckets):
    from demo_apache_flink_streaming_mode_spark.operators.scale import (
        pack_sequences)
    df = spark.createDataFrame(rows, "id long, w long")
    got = {(r.id, r.seq_id): (r.start_in_doc, r.n_in_seq)
           for r in pack_sequences(df, "id", "w", ctx,
                                   num_buckets=num_buckets).collect()}
    assert got == _ref_sequences(rows, ctx, num_buckets)
