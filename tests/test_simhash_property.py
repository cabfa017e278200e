"""Property tests: SimHash fingerprints vs a sequential majority-vote
reference, and the pigeonhole band-blocked near-pair search vs brute
force.

The near-pair property is the completeness claim itself: for
max_hamming <= bands-1 the band equi-join must find EVERY pair within
the Hamming budget — identical to the all-pairs scan — on random
corpora whose tiny vocabulary makes band collisions dense (the hostile
regime for blocking bugs).  Tie votes (equal set/unset counts) resolve
to the bit being SET; duplicate token occurrences each vote.
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
    min_size=1, max_size=6,
).map(lambda ds: [(i + 1, d) for i, d in enumerate(ds)])

BITS = 16


def _simhash(text: str) -> int:
    votes = [0] * BITS
    for t in text.split(" "):
        h = int(hashlib.md5(t.encode()).hexdigest()[:4], 16)
        for j in range(BITS):
            votes[j] += 1 if (h >> j) & 1 else -1
    return sum(1 << j for j in range(BITS) if votes[j] >= 0)


@SLOW
@given(rows=corpus)
def test_simhash_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in D.simhash(df, bits=BITS).collect()}
    assert got == {did: _simhash(text) for did, text in rows}


@SLOW
@given(rows=corpus, max_hamming=st.sampled_from([0, 1, 3]))
def test_simhash_near_pairs_equal_brute_force(spark, rows, max_hamming):
    fps = {did: _simhash(text) for did, text in rows}
    want = {(a, b): bin(fps[a] ^ fps[b]).count("1")
            for a, b in combinations(sorted(fps), 2)
            if bin(fps[a] ^ fps[b]).count("1") <= max_hamming}
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in D.simhash_near_pairs(
               df, max_hamming=max_hamming, bits=BITS, bands=4).collect()}
    assert got == want
