"""Property test: the prefix-filtered exact Jaccard join
(``dedup.jaccard_exact_pairs``) returns EXACTLY the brute-force
all-pairs result — the prefix filter may prune candidates but must
never lose a true pair.

The oracle gate already proves this on the fixture corpora (the
DuckDB oracle is the complete inverted-index form); hypothesis drives
the boundary regimes: thresholds whose IEEE ceil diverges from the
rational ceil (ceil((9/11) * 77) = 64 in doubles but 9*77/11 = 63
exactly — the rational integer ceil must be used or the prefix
silently shortens), docs whose similarity lands exactly ON the
threshold, empty docs (their shingle set is {''} per the shingling
convention, so two empty docs are exact duplicates), and corpora where
every doc shares every gram.
"""

from __future__ import annotations

import math

import hypo
from hypothesis import given, strategies as st

from demo_apache_flink_streaming_mode_spark.operators.dedup import (
    jaccard_exact_pairs)


def test_rational_ceil_avoids_the_ieee_prefix_bug():
    """ceil((9/11) * 77) in IEEE doubles is 64, but 9*77 = 693 = 63*11
    exactly — the float form would shorten the prefix by one gram and
    can drop true pairs. The operator's integer form is exact."""
    assert math.ceil((9 / 11) * 77) == 64      # the hazard
    assert (9 * 77 + 11 - 1) // 11 == 63       # the operator's form


def _shingle_set(toks: list[str]) -> set[str]:
    # word_shingles convention: n=1 over an empty token list yields
    # one empty-string shingle
    return set(toks) if toks else {""}


def _ref(token_docs, num, den):
    sets = {i: _shingle_set(t) for i, t in enumerate(token_docs)}
    out = []
    for a in range(len(token_docs)):
        for b in range(a + 1, len(token_docs)):
            ni = len(sets[a] & sets[b])
            na, nb = len(sets[a]), len(sets[b])
            if ni == 0:
                continue
            j = ni / (na + nb - ni)
            if j >= num / den:
                out.append((a, b, j))
    return sorted(out)


_token = st.sampled_from(["a", "b", "c", "d", "e"])
_corpus = st.lists(st.lists(_token, min_size=0, max_size=6),
                   min_size=2, max_size=10)


@hypo.budget(20)
@given(_corpus, st.sampled_from([(3, 10), (1, 2), (2, 3), (1, 10)]))
def test_prefix_filter_matches_bruteforce(spark, token_docs, thr):
    num, den = thr
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_docs)],
        "doc_id long, text string")
    got = sorted((r["doc_a"], r["doc_b"], r["jaccard"])
                 for r in jaccard_exact_pairs(docs, num, den,
                                              shingle_n=1).collect())
    assert got == _ref(token_docs, num, den)


def _ref_incremental(token_docs, num, den, inc_mod):
    sets = {i: _shingle_set(t) for i, t in enumerate(token_docs)}
    out = []
    for a in range(len(token_docs)):
        if a % inc_mod != 0:
            continue
        for b in range(len(token_docs)):
            if b % inc_mod == 0:
                continue
            ni = len(sets[a] & sets[b])
            if ni == 0:
                continue
            na, nb = len(sets[a]), len(sets[b])
            j = ni / (na + nb - ni)
            if j >= num / den:
                out.append((a, b, j))
    return sorted(out)


@hypo.budget(15)
@given(_corpus, st.sampled_from([(3, 10), (1, 2), (2, 3)]))
def test_incremental_prefix_filter_matches_bruteforce(spark, token_docs,
                                                      thr):
    """Cross-set prefix filtering under the FROZEN corpus-df order
    (increment shingles absent from the corpus rank with df 0) finds
    exactly the brute-force new x corpus pairs — and the index= form
    equals the train-inline form."""
    from demo_apache_flink_streaming_mode_spark.operators.dedup import (
        jaccard_incremental_pairs, jaccard_prefix_index)

    num, den = thr
    inc_mod = 3
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_docs)],
        "doc_id long, text string")
    new = docs.filter(f"doc_id % {inc_mod} = 0")
    corpus = docs.filter(f"doc_id % {inc_mod} != 0")
    got = sorted((r["new_id"], r["dup_of"], r["jaccard"])
                 for r in jaccard_incremental_pairs(
                     new, corpus, num, den, shingle_n=1).collect())
    assert got == _ref_incremental(token_docs, num, den, inc_mod)
    idx = jaccard_prefix_index(corpus, num, den, shingle_n=1)
    via_index = sorted((r["new_id"], r["dup_of"], r["jaccard"])
                       for r in jaccard_incremental_pairs(
                           new, None, num, den, shingle_n=1,
                           index=idx).collect())
    assert via_index == got
