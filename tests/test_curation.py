"""Behavior + property tests for the DSIR importance-resampling
operator (operators.curation) and the D4/SSL-prototypes pruning
operator (similarity.prototypicality).

(Oracle parity — Spark vs DuckDB hash equality of the judged queries —
runs in test_correctness.py over the registry like every other query.)
The property test drives DSIR's full integer pipeline against a
sequential Python reference on adversarial corpora: empty/one-token
docs (no grams — must surface with zeros), forced bucket collisions
(tiny n_buckets), all-target and no-target splits, and per-source rank
ties.
"""

from __future__ import annotations

import hashlib

import pytest

import hypo
from hypothesis import given, strategies as st

from pyspark.sql import functions as F

from demo_apache_flink_streaming_mode_spark.operators import curation
from demo_apache_flink_streaming_mode_spark.operators.similarity import (
    prototypicality, semantic_cells)
from demo_apache_flink_streaming_mode_spark.plans.queries_llm import (
    DIM, DSIR_BUCKETS, DSIR_KEEP, DSIR_TGT_MOD, KMEANS_ITERS, N_CELLS,
    PROTO_DROP_TOPN)
from demo_apache_flink_streaming_mode_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# --- DSIR ------------------------------------------------------------------

def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_dsir(rows, n_buckets, tgt_mod, keep):
    """Sequential reference of the full dsir_select pipeline."""
    grams = {}   # doc_id -> list of buckets
    for doc_id, _source, text in rows:
        toks = [t for t in text.strip().split(" ") if t] if text else []
        grams[doc_id] = [
            _md5_long(f"{toks[i]} {toks[i + 1]}") % n_buckets
            for i in range(len(toks) - 1)] if len(toks) >= 2 else []
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    for doc_id, _s, _t in rows:
        is_tgt = _md5_long(f"tgt:{doc_id}") % tgt_mod == 0
        for b in grams[doc_id]:
            raw[b] = raw.get(b, 0) + 1
            if is_tgt:
                tgt[b] = tgt.get(b, 0) + 1
    w = {b: (1000000 * (tgt.get(b, 0) + 1)) // (raw[b] + 1) for b in raw}
    scored = []
    for doc_id, source, _t in rows:
        n = len(grams[doc_id])
        sw = sum(w[b] for b in grams[doc_id])
        scored.append((doc_id, source, n, sw, sw // n if n else 0))
    out = []
    by_source: dict[str, list] = {}
    for rec in scored:
        by_source.setdefault(rec[1], []).append(rec)
    for source, recs in by_source.items():
        recs.sort(key=lambda r: (-r[4], r[0]))
        for rank, rec in enumerate(recs, 1):
            out.append(rec + (rank, rank <= keep))
    return sorted(out)


_token = st.sampled_from(["a", "b", "ab", "ba"])
_corpus = st.lists(
    st.tuples(st.sampled_from(["s1", "s2"]),
              st.lists(_token, min_size=0, max_size=6)),
    min_size=1, max_size=10)


@hypo.budget(20)
@given(_corpus, st.sampled_from([1, 2, 5]), st.sampled_from([4, 64]))
def test_dsir_select_matches_reference(spark, corpus, tgt_mod, n_buckets):
    rows = [(i, source, " ".join(toks))
            for i, (source, toks) in enumerate(corpus)]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, source string, text string")
    keep = 2
    got = sorted(tuple(r) for r in curation.dsir_select(
        docs, n_buckets, tgt_mod, keep).collect())
    assert got == _ref_dsir(rows, n_buckets, tgt_mod, keep)


def test_dsir_weights_bounded_and_smoothed(docs):
    """w_ppm lives in (0, 1e6]: the add-one-smoothed ratio maxes out at
    exactly 1e6 when every occurrence of the bucket is a target
    occurrence, and is always positive; the table never exceeds
    n_buckets rows (the bounded-model contract)."""
    w = curation.bucket_weights(docs, DSIR_BUCKETS, DSIR_TGT_MOD).collect()
    assert 0 < len(w) <= DSIR_BUCKETS
    for r in w:
        assert 0 < r["w_ppm"] <= 1000000
        assert 0 <= r["n_tgt"] <= r["n_raw"]


def test_dsir_selection_quota_per_source(docs):
    """Exactly min(DSIR_KEEP, |source|) docs selected per source, ranks
    contiguous from 1, and every pool document is scored (full
    coverage, gram-less docs included with zeros)."""
    out = curation.dsir_select(docs, DSIR_BUCKETS, DSIR_TGT_MOD,
                               DSIR_KEEP)
    rows = out.collect()
    assert len(rows) == docs.count()
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
    for source, rs in per_source.items():
        ranks = sorted(r["rank_in_source"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        n_sel = sum(r["selected"] for r in rs)
        assert n_sel == min(DSIR_KEEP, len(rs))


def test_dsir_frozen_weights_serve_batch_twin(docs):
    """The serve shape: scoring the pool against the pool-trained
    weight table reproduces exactly the score columns of the
    end-to-end dsir_select — the frozen table changes no values."""
    w = curation.bucket_weights(docs, DSIR_BUCKETS, DSIR_TGT_MOD)
    served = sorted(
        tuple(r) for r in curation.score_docs(docs, w, DSIR_BUCKETS)
        .collect())
    inline = sorted(
        (r["doc_id"], r["n_grams"], r["sum_w_ppm"], r["avg_w_ppm"])
        for r in curation.dsir_select(docs, DSIR_BUCKETS, DSIR_TGT_MOD,
                                      DSIR_KEEP).collect())
    assert served == inline and len(served) > 0


# --- prototypicality -------------------------------------------------------

@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_prototypes_ranks_and_drop_quota(embs):
    """Per cell: ranks contiguous from 1, kept == (rank > drop_topn),
    so exactly min(drop_topn, n_cell) docs are dropped; proto_sim is a
    cosine of unit vectors (within [-1, 1] modulo fp slack) and
    non-increasing down the rank order."""
    rows = prototypicality(embs, N_CELLS, train_iters=KMEANS_ITERS,
                           drop_topn=PROTO_DROP_TOPN, dim=DIM).collect()
    assert len(rows) > 0
    cells: dict[int, list] = {}
    for r in rows:
        cells.setdefault(r["cell"], []).append(r)
    for cell, rs in cells.items():
        rs.sort(key=lambda r: r["rank_in_cell"])
        assert [r["rank_in_cell"] for r in rs] == list(range(1, len(rs) + 1))
        for prev, cur in zip(rs, rs[1:]):
            assert prev["proto_sim"] >= cur["proto_sim"]
        for r in rs:
            assert -1.000001 <= r["proto_sim"] <= 1.000001
            assert r["kept"] == (r["rank_in_cell"] > PROTO_DROP_TOPN)
        assert sum(not r["kept"] for r in rs) == min(PROTO_DROP_TOPN,
                                                     len(rs))


def test_prototypes_share_semantic_cell_assignment(embs):
    """The pruning leg blocks on the IDENTICAL cells SemDeDup uses:
    (vec_id -> cell) must match semantic_cells exactly — D4 is the two
    legs composed over ONE clustering."""
    proto = {r["vec_id"]: r["cell"]
             for r in prototypicality(embs, N_CELLS,
                                      train_iters=KMEANS_ITERS,
                                      drop_topn=PROTO_DROP_TOPN,
                                      dim=DIM).collect()}
    cells = {r["vec_id"]: r["cell"]
             for r in semantic_cells(embs, N_CELLS,
                                     train_iters=KMEANS_ITERS,
                                     dim=DIM).collect()}
    assert proto == cells and len(proto) > 0


def test_cluster_sample_quota_and_strata(spark, sf_dir):
    """Cluster-balanced sampling keeps exactly min(CELL_QUOTA, n_cell)
    docs per semantic cell, with contiguous ranks, and its strata are
    the IDENTICAL semantic_cells assignment."""
    from demo_apache_flink_streaming_mode_spark.plans.queries_llm import (
        CELL_QUOTA, text_cluster_sample)

    rows = text_cluster_sample(spark, sf_dir).collect()
    assert len(rows) > 0
    embs2 = load_table(spark, sf_dir, "embeddings")
    cells = {}
    for r in semantic_cells(embs2, N_CELLS, train_iters=KMEANS_ITERS,
                            dim=DIM).collect():
        cells.setdefault(r["cell"], set()).add(r["vec_id"])
    per_cell: dict[int, list] = {}
    for r in rows:
        assert r["doc_id"] in cells[r["cell"]]
        per_cell.setdefault(r["cell"], []).append(r["rank_in_cell"])
    for cell, ranks in per_cell.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) == min(CELL_QUOTA, len(cells[cell]))
