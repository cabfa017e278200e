"""Property tests: PageRank vs a sequential power iteration and
degree-oriented triangle counting vs brute force.

The PageRank reference mirrors the deterministic-folds contract
bit-for-bit — ascending-u left fold from 0.0, the same (1-d)/N + d*s
expression shape — so equality is EXACT doubles, not a tolerance;
random multigraphs exercise multi-edges (they weight both outdeg and
contributions), dangling vertices (mass lost, per the documented
contract), and in-degree-0 vertices (base term only).  Triangle
counting is integer-exact and orientation-invariant, so brute force
over all vertex triples is the reference.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

import hypo
from hypothesis import HealthCheck, given, settings, strategies as st

from demo_apache_flink_streaming_mode_spark.operators import graph as G

SLOW = hypo.budget(10)

edges = st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 6)).filter(
        lambda e: e[0] != e[1]),
    min_size=1, max_size=15)


def _ref_pagerank(e, iters, damping):
    verts = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(verts)
    odeg = Counter(u for u, _ in e)
    pr = {v: 1.0 / n for v in verts}
    for _ in range(iters):
        contribs = defaultdict(list)
        for u, v in e:
            contribs[v].append((u, pr[u] / odeg[u]))
        nxt = {}
        for v in verts:
            s = 0.0
            for _, c in sorted(contribs.get(v, [])):
                s = s + c
            nxt[v] = (1.0 - damping) / n + damping * s
        pr = nxt
    return pr


@SLOW
@given(e=edges)
def test_pagerank_matches_reference_exactly(spark, e):
    df = spark.createDataFrame(e, "src long, dst long")
    got = {r.vertex: r.pagerank
           for r in G.pagerank(df, iters=2, damping=0.85).collect()}
    assert got == _ref_pagerank(e, iters=2, damping=0.85)


@SLOW
@given(e=edges)
def test_triangle_count_matches_brute_force(spark, e):
    und = {(min(a, b), max(a, b)) for a, b in e}
    verts = sorted({v for p in und for v in p})
    want = sum(1 for x, y, z in combinations(verts, 3)
               if {(x, y), (x, z), (y, z)} <= und)
    df = spark.createDataFrame(e, "src long, dst long")
    assert G.triangle_count(df).collect()[0].n_triangles == want
