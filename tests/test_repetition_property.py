"""Property test: the Gopher-style repetition signals equal a
sequential per-doc counting reference.

``repetition_stats`` is three integer-over-integer divisions wired
through explode + two HashAggregates; the regimes worth attacking are
EMPTY docs (0/0 dup-token fraction must surface as NULL while the
whole-text-gram rule still yields a 1/1 n-gram fraction), docs shorter
than the gram width (one whole-text gram), all-same-token docs
(dup fraction (n-1)/n, gram fraction 1), and tied max-gram counts
(max/sum is tie-independent).  Every fraction divides the same two
integers in the same order on both sides, so equality is exact.
"""

from __future__ import annotations

import hypo
from hypothesis import HealthCheck, given, settings, strategies as st

from demo_apache_flink_streaming_mode_spark.operators.text import (
    repetition_stats)

docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=7),
    min_size=1, max_size=12)


def _shingles(toks, n):
    m = max(len(toks) - (n - 1), 1)
    return [" ".join(toks[i:i + n]) for i in range(m)]


def _top_frac(toks, n):
    counts: dict[str, int] = {}
    for g in _shingles(toks, n):
        counts[g] = counts.get(g, 0) + 1
    return max(counts.values()) / sum(counts.values())


def _ref(token_docs):
    out = []
    for i, toks in enumerate(token_docs):
        dup = (None if not toks
               else (len(toks) - len(set(toks))) / len(toks))
        out.append((i, dup, _top_frac(toks, 2), _top_frac(toks, 3)))
    return out


@hypo.budget(20)
@given(docs_strategy)
def test_repetition_stats_match_reference(spark, token_docs):
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_docs)],
        "doc_id long, text string")
    got = sorted((r["doc_id"], r["dup_token_frac"], r["top_bigram_frac"],
                  r["top_trigram_frac"])
                 for r in repetition_stats(docs).collect())
    assert got == _ref(token_docs)
