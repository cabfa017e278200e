"""Property test: length_bucket_stats' array-filter bucket fan equals
the literal per-doc counting rule on adversarially tied lengths.

The operator's bucket id is ``1 + #{boundary : tok > boundary}`` over
the broadcast decile-boundary array — rewritten this round from n-1
unrolled comparisons to one ``F.filter`` pass (r5 ADVICE #8).  The
semantics worth pinning are the tie cases: heavily tied corpora make
several boundaries COINCIDE, ties land in the highest qualifying
bucket, and whole buckets may come out empty.  The reference re-buckets
with the very boundaries Spark computed (interpolated-percentile parity
vs DuckDB is already covered by the 3-SF oracle gate), so this test
attacks only the counting/grouping logic, exactly.
"""

from __future__ import annotations

import hypo
from hypothesis import HealthCheck, given, settings, strategies as st

from demo_apache_flink_streaming_mode_spark.operators.text import (
    length_bucket_stats)

# few distinct lengths on many docs -> tied deciles, coincident
# boundaries, empty buckets: the regime the fixture corpus never hits
lengths_strategy = st.lists(st.integers(1, 6), min_size=1, max_size=24)


def _ref(toks, bs, n_buckets):
    per_bucket: dict[int, list] = {}
    for t in toks:
        b = 1 + sum(1 for bound in bs if t > bound)
        per_bucket.setdefault(b, []).append(t)
    return sorted((b, len(v), min(v), max(v), sum(v))
                  for b, v in per_bucket.items())


@hypo.budget(20)
@given(lengths_strategy, st.integers(2, 10))
def test_length_buckets_match_counting_rule(spark, toks, n_buckets):
    docs = spark.createDataFrame(
        [(i, " ".join("w%d" % j for j in range(c)))
         for i, c in enumerate(toks)], "doc_id long, text string")
    out = length_bucket_stats(docs, n_buckets=n_buckets)
    got = sorted((r["bucket"], r["n_docs"], r["min_tokens"],
                  r["max_tokens"], r["sum_tokens"]) for r in out.collect())
    # re-bucket with the boundaries Spark itself computed
    from pyspark.sql import functions as F
    from demo_apache_flink_streaming_mode_spark.operators.dedup import (
        word_tokens)
    lens = docs.select(F.size(word_tokens(F.col("text"))).alias("tok"))
    ps = [i / n_buckets for i in range(1, n_buckets)]
    bs = lens.agg(F.percentile("tok", F.lit(ps))).collect()[0][0]
    assert len(bs) == n_buckets - 1
    assert all(a <= b for a, b in zip(bs, bs[1:]))
    assert got == _ref(toks, bs, n_buckets)
    # every doc landed somewhere: bucket ids within [1, n_buckets]
    assert sum(r[1] for r in got) == len(toks)
    assert all(1 <= r[0] <= n_buckets for r in got)
