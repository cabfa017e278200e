"""Property test: the bigram-LM familiarity scores equal a sequential
count-and-score reference.

``lm_familiarity`` is oracle-matched on the fixture corpus; hypothesis
drives the regimes the fixtures avoid — tiny docs below the two-token
bigram floor (must surface with zeros via the left join), corpora
where EVERY bigram repeats, corpora where none does, and same-doc
bigram repeats (each occurrence counts separately in n_bg/sum_c).
Every output is integer-exact, including the ppm integer division, so
the comparison is strict equality.
"""

from __future__ import annotations

import hypo
from hypothesis import HealthCheck, given, settings, strategies as st

from demo_apache_flink_streaming_mode_spark.operators.text import (
    lm_familiarity)

MIN_COUNT = 2

docs_strategy = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=6),
    min_size=1, max_size=12)


def _ref(token_docs, min_count):
    per_doc_bg = {i: [" ".join(toks[j:j + 2])
                      for j in range(len(toks) - 1)]
                  for i, toks in enumerate(token_docs) if len(toks) >= 2}
    corpus: dict[str, int] = {}
    for bgs in per_doc_bg.values():
        for g in bgs:
            corpus[g] = corpus.get(g, 0) + 1
    out = []
    for i in range(len(token_docs)):
        bgs = per_doc_bg.get(i, [])
        n_bg = len(bgs)
        sum_c = sum(corpus[g] for g in bgs)
        n_rep = sum(1 for g in bgs if corpus[g] >= min_count)
        ppm = 0 if n_bg == 0 else (1000000 * n_rep) // n_bg
        out.append((i, n_bg, sum_c, n_rep, ppm))
    return out


@hypo.budget(20)
@given(docs_strategy)
def test_lm_familiarity_matches_reference(spark, token_docs):
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_docs)],
        "doc_id long, text string")
    got = sorted((r["doc_id"], r["n_bg"], r["sum_c"], r["n_repeated"],
                  r["familiarity_ppm"])
                 for r in lm_familiarity(docs, min_count=MIN_COUNT).collect())
    assert got == _ref(token_docs, MIN_COUNT)
