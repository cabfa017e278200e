"""Property test: the per-source drift report equals a sequential
Python reference — bit-for-bit, including the chi-square float fold.

``text_source_drift`` is oracle-matched on the fixture corpus;
hypothesis drives the regimes the fixtures avoid: single-source corpora
(TV must be 0 and chi-square ~0), sources that share no terms (maximal
drift), empty documents (contribute nothing; an all-empty source must
be ABSENT from the report), and heavy term skew. The total-variation
numerator is exact integer arithmetic and the chi-square is an
in-term-order left fold of +,-,*,/ doubles, so both compare with strict
equality (the reference replays the identical IEEE op chain).
"""

from __future__ import annotations

import hypo
from hypothesis import given, strategies as st

from demo_apache_flink_streaming_mode_spark.operators.text import (
    source_drift_report)

_token = st.sampled_from(["a", "b", "c", "d"])
_corpus = st.lists(
    st.tuples(st.sampled_from(["s1", "s2", "s3"]),
              st.lists(_token, min_size=0, max_size=8)),
    min_size=1, max_size=12)


def _ref(rows):
    stf: dict[tuple[str, str], int] = {}
    for _id, src, text in rows:
        for t in [t for t in text.strip().split(" ") if t]:
            stf[(src, t)] = stf.get((src, t), 0) + 1
    ctf: dict[str, int] = {}
    for (_s, t), c in stf.items():
        ctf[t] = ctf.get(t, 0) + c
    n_total = sum(ctf.values())
    out = []
    for src in sorted({s for s, _t in stf}):
        present = sorted(t for s, t in stf if s == src)
        n_src = sum(stf[(src, t)] for t in present)
        tv_present = sum(abs(stf[(src, t)] * n_total - ctf[t] * n_src)
                         for t in present)
        tfc_present = sum(ctf[t] for t in present)
        tv_num = tv_present + (n_total - tfc_present) * n_src
        tv_ppm = (1000000 * tv_num) // (2 * n_src * n_total)
        chi = 0.0
        for t in present:            # in-term-order left fold
            e = ctf[t] * n_src / n_total
            d = stf[(src, t)] - e
            chi = chi + (d * d / e - e)
        out.append((src, n_src, len(present), tv_ppm, chi + n_src))
    return out


@hypo.budget(20)
@given(_corpus)
def test_source_drift_matches_reference(spark, corpus):
    rows = [(i, src, " ".join(toks))
            for i, (src, toks) in enumerate(corpus)]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, source string, text string")
    got = sorted((r["source"], r["n_tokens"], r["n_terms"], r["tv_ppm"],
                  r["chi2"])
                 for r in source_drift_report(docs).collect())
    assert got == _ref(rows)


def test_single_source_has_zero_drift(spark):
    docs = spark.createDataFrame(
        [(1, "s1", "a b a"), (2, "s1", "c a")],
        "doc_id long, source string, text string")
    rows = source_drift_report(docs).collect()
    assert len(rows) == 1
    assert rows[0]["tv_ppm"] == 0
    assert abs(rows[0]["chi2"]) < 1e-9
