"""Property test: the distinct-n diversity report equals a sequential
tokenize-shingle-count reference.

``ngram_diversity`` counts total vs distinct word n-grams per n with
``word_shingles``'s whole-text-if-shorter rule; the edges hypothesis
targets are docs SHORTER than n (one whole-text gram), EMPTY docs
(empty token array still emits one gram — the empty string), and
cross-document gram collisions that only the distinct count merges.
The reference restates the shingle rule in plain Python over token
lists; diversity divides the same two integers in the same order, so
the double compares exactly.
"""

from __future__ import annotations

import hypo
from hypothesis import HealthCheck, given, settings, strategies as st

from demo_apache_flink_streaming_mode_spark.operators.text import (
    ngram_diversity)

NS = (1, 2, 3)

docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=6),
    min_size=1, max_size=12)


def _shingles(toks, n):
    m = max(len(toks) - (n - 1), 1)
    return [" ".join(toks[i:i + n]) for i in range(m)]


def _ref(token_docs):
    out = []
    for n in NS:
        grams = [g for toks in token_docs for g in _shingles(toks, n)]
        out.append((n, len(grams), len(set(grams)),
                    len(set(grams)) / len(grams)))
    return out


@hypo.budget(20)
@given(docs_strategy)
def test_ngram_diversity_matches_reference(spark, token_docs):
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_docs)],
        "doc_id long, text string")
    got = sorted((r["n"], r["total_ngrams"], r["distinct_ngrams"],
                  r["diversity"])
                 for r in ngram_diversity(docs, ns=NS).collect())
    assert got == _ref(token_docs)
