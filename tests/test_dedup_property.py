"""Property tests: the MinHash/LSH dedup chain and connected components
against sequential references.

MinHash is md5-deterministic, so the reference reproduces signatures,
band hashes, candidate pairs, and similarity estimates EXACTLY on
random corpora (dense shingle collisions from a 2-letter alphabet);
connected components is checked against union-find on random edge
sets — pair transitivity, chains, islands, self-contained cliques.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import hypo
from hypothesis import HealthCheck, given, settings, strategies as st

from demo_apache_flink_streaming_mode_spark.operators import dedup as D

SLOW = hypo.budget(12)

word = st.text(alphabet="ab", min_size=1, max_size=3)
corpus = st.lists(
    st.lists(word, min_size=1, max_size=8).map(" ".join),
    min_size=1, max_size=5,
).map(lambda ds: [(i + 1, d) for i, d in enumerate(ds)])

NUM_HASHES, BANDS, ROWS_PER_BAND, SHINGLE_N = 8, 4, 2, 3


def _shingles(text: str) -> set[str]:
    toks = text.split(" ")
    stop = max(len(toks) - SHINGLE_N + 1, 1)
    return {" ".join(toks[i:i + SHINGLE_N]) for i in range(stop)}


def _sig(text: str) -> list[int]:
    gs = _shingles(text)
    return [min(int(hashlib.md5(f"{i}:{g}".encode()).hexdigest()[:15], 16)
                for g in gs)
            for i in range(NUM_HASHES)]


def _bands(sig: list[int]) -> list[tuple[int, str]]:
    return [(b, hashlib.md5("|".join(
                str(sig[b * ROWS_PER_BAND + r])
                for r in range(ROWS_PER_BAND)).encode()).hexdigest())
            for b in range(BANDS)]


@SLOW
@given(rows=corpus)
def test_minhash_signature_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: list(r.sig)
           for r in D.minhash_signature(
               df, shingle_n=SHINGLE_N, num_hashes=NUM_HASHES).collect()}
    assert got == {did: _sig(text) for did, text in rows}


@SLOW
@given(rows=corpus)
def test_lsh_candidate_pairs_match_reference(spark, rows):
    """Candidate pairs == docs sharing any (band index, band hash);
    est_jaccard == exact fraction of equal signature positions."""
    sigs = {did: _sig(text) for did, text in rows}
    want = {}
    for (da, sa), (db, sb) in combinations(sorted(sigs.items()), 2):
        if set(_bands(sa)) & set(_bands(sb)):
            eq = sum(1 for x, y in zip(sa, sb) if x == y)
            want[(da, db)] = eq / NUM_HASHES
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.est_jaccard
           for r in D.lsh_candidate_pairs(
               D.minhash_signature(df, shingle_n=SHINGLE_N,
                                   num_hashes=NUM_HASHES),
               bands=BANDS, rows_per_band=ROWS_PER_BAND).collect()}
    assert got == want


edges = st.lists(
    st.tuples(st.integers(1, 8), st.integers(1, 8)).filter(
        lambda e: e[0] != e[1]),
    min_size=1, max_size=15,
).map(lambda es: [(min(a, b), max(a, b)) for a, b in es])


@SLOW
@given(pairs=edges)
def test_connected_components_matches_union_find(spark, pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    want = {x: min(y for y in parent if find(y) == find(x))
            for x in parent}
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id
           for r in D.connected_components(df).collect()}
    assert got == want


@SLOW
@given(rows=st.lists(
    st.lists(word, min_size=1, max_size=8).map(" ".join),
    min_size=2, max_size=8,
).map(lambda ds: [(i + 1, d) for i, d in enumerate(ds)]),
    num=st.integers(min_value=0, max_value=4),
    den=st.integers(min_value=4, max_value=10))
def test_fuzzy_contamination_matches_reference(spark, rows, num, den):
    """fuzzy_contamination == the sequential pipeline: MinHash band
    join across the candidate/benchmark split, exact distinct-shingle
    Jaccard on band-colliding pairs only, integer rational threshold,
    worst-match argmax (jaccard desc, bench id asc). Benchmark set =
    odd doc ids, so both splits vary with the corpus."""
    import pyspark.sql.functions as F
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["matched_bench"], r["n_inter"], r["n_union"],
                         r["jaccard"])
           for r in D.fuzzy_contamination(
               df, F.col("doc_id") % 2 == 1, num, den,
               shingle_n=SHINGLE_N, num_hashes=NUM_HASHES, bands=BANDS,
               rows_per_band=ROWS_PER_BAND).collect()}

    sh = {i: _shingles(t) for i, t in rows}
    bands = {i: _bands(_sig(t)) for i, t in rows}
    want: dict[int, tuple] = {}
    for c, _ in rows:
        if c % 2 == 1:
            continue
        best = None
        for b, _ in rows:
            if b % 2 == 0 or not any(
                    x == y for x, y in zip(bands[c], bands[b])):
                continue
            ni = len(sh[c] & sh[b])
            nu = len(sh[c] | sh[b])
            if ni * den < nu * num:
                continue
            j = ni / nu
            if best is None or j > best[3] or (j == best[3]
                                               and b < best[0]):
                best = (b, ni, nu, j)
        if best is not None:
            want[c] = best
    assert got == want


def test_exact_rational_key_bound_enforced(spark):
    """The exact-rational argmax key's u <= 2^20 exactness bound is a
    loud per-row error, not a silent fall-back to float-collision
    behavior (r10 advice); in-bound rows, including u == 2^20 exactly,
    produce the documented scaled-integer key."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException
    ok = spark.createDataFrame(
        [(3, 7), (1, 1 << 20)], "n_inter long, n_union long")
    got = [r["k"] for r in ok.select(
        D.exact_rational_jaccard_key().alias("k")).collect()]
    assert got == [(3 * (1 << 40)) // 7, (1 * (1 << 40)) // (1 << 20)]
    bad = spark.createDataFrame(
        [(2, (1 << 20) + 1)], "n_inter long, n_union long")
    with pytest.raises((SparkRuntimeException, Py4JJavaError),
                       match="n_union <= 2\\^20"):
        bad.select(D.exact_rational_jaccard_key().alias("k")).collect()
