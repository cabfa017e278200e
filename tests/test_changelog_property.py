"""Property test: changelog apply/materialize vs a sequential reference.

Random per-key op sequences — upserts, deletes, and NULL delete
predicates (the three-valued-logic case behind the r4 tombstone fix:
NULL must mean UPSERT, never a silent drop) — through derive_ops →
apply_changelog → latest_state, against a plain dict walk.  Order
values are unique per key so last-writer-wins is well-defined on both
sides.
"""

from __future__ import annotations

from collections import defaultdict

import hypo
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from demo_apache_flink_streaming_mode_spark.operators import changelog as CL

# (key, value, del_flag) — seq assigned by index (globally unique)
ops = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 99),
              st.sampled_from([True, False, None])),
    min_size=1, max_size=25,
).map(lambda rs: [(k, i + 1, v, d) for i, (k, v, d) in enumerate(rs)])


@hypo.budget(15)
@given(rows=ops)
def test_changelog_apply_matches_reference(spark, rows):
    last, n_changes = {}, defaultdict(int)
    for k, seq, v, d in rows:
        n_changes[k] += 1
        if last.get(k, (0,))[0] < seq:
            last[k] = (seq, v, d is True)  # NULL predicate == upsert
    want_applied = {k: (seq, v, deleted, n_changes[k])
                    for k, (seq, v, deleted) in last.items()}
    want_state = {k: t for k, t in want_applied.items() if not t[2]}

    df = spark.createDataFrame(
        rows, "k long, seq long, value long, del boolean")
    cl = CL.derive_ops(df, F.col("del"))
    got_applied = {r.k: (r.seq, r.value, r.is_deleted, r.n_changes)
                   for r in CL.apply_changelog(cl, "k", ["seq"]).collect()}
    assert got_applied == want_applied
    got_state = {r.k: (r.seq, r.value, False, r.n_changes)
                 for r in CL.latest_state(cl, "k", ["seq"]).collect()}
    assert got_state == want_state
