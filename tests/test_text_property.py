"""Property tests: the round-6 text machinery (repeated-span report,
boilerplate removal, winnowing selection, distributed BPE training)
against direct sequential Python references on hypothesis-generated
corpora.

Each operator composes several exact-semantics pieces — shingle
positions (whole-text-if-shorter rule), interval-union islands, the
rolling-min winnow window, the weight-desc/lex-asc BPE tie-break and
the greedy left-fold merge — and a divergence in any piece shows up on
random corpora long before it would on the fixture data (which has few
ties, no one-token docs, no vocabulary exhaustion).  The references
re-state the semantics independently: plain dict/set/loop Python, no
Spark, no shared helpers.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import hypo
from hypothesis import HealthCheck, given, settings, strategies as st

from demo_apache_flink_streaming_mode_spark.operators import text as T

# small alphabet + short docs → dense span/pair collisions (the
# interesting regime: ties, same-doc repeats, full-doc coverage)
word = st.text(alphabet="ab", min_size=1, max_size=4)
doc = st.lists(word, min_size=1, max_size=10).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=5).map(
    lambda ds: [(i + 1, d) for i, d in enumerate(ds)])

SLOW = hypo.budget(15)


def _spans(tokens: list[str], n: int) -> list[str]:
    """word_shingles semantics: positions 1..max(len-n+1, 1); a doc
    shorter than n yields exactly one whole-text span."""
    stop = max(len(tokens) - n + 1, 1)
    return [" ".join(tokens[i:i + n]) for i in range(stop)]


def _dup_hashes(rows: list[tuple[int, str]], n: int,
                min_docs: int) -> set[str]:
    """Spans (by md5) occurring in >= min_docs DISTINCT documents."""
    docs_per = {}
    for did, text in rows:
        for s in set(_spans(text.split(" "), n)):
            docs_per.setdefault(hashlib.md5(s.encode()).hexdigest(),
                                set()).add(did)
    return {h for h, ds in docs_per.items() if len(ds) >= min_docs}


def _ref_report(rows: list[tuple[int, str]], n: int, min_docs: int):
    """doc_id -> (n_tokens, n_spans, n_dup_spans, covered_tokens)."""
    dup = _dup_hashes(rows, n, min_docs)
    out = {}
    for did, text in rows:
        toks = text.split(" ")
        spans = _spans(toks, n)
        hits = [i + 1 for i, s in enumerate(spans)
                if hashlib.md5(s.encode()).hexdigest() in dup]
        covered = set()
        for start in hits:
            covered.update(range(start, min(start + n, len(toks) + 1)))
        out[did] = (len(toks), len(spans), len(hits), len(covered))
    return out


@SLOW
@given(rows=corpus, n=st.sampled_from([2, 3]))
def test_dup_span_report_matches_reference(spark, rows, n):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_spans, r.n_dup_spans,
                      r.covered_tokens)
           for r in T.dup_span_report(df, span_n=n, min_docs=2).collect()}
    assert got == _ref_report(rows, n, min_docs=2)


@SLOW
@given(rows=corpus, n=st.sampled_from([2, 3]))
def test_boilerplate_strip_matches_reference(spark, rows, n):
    dup = _dup_hashes(rows, n, min_docs=2)
    want = {}
    for did, text in rows:
        toks = text.split(" ")
        removed = set()
        for i, s in enumerate(_spans(toks, n)):
            if hashlib.md5(s.encode()).hexdigest() in dup:
                removed.update(range(i + 1, min(i + 1 + n, len(toks) + 1)))
        kept = [t for p, t in enumerate(toks, 1) if p not in removed]
        want[did] = (len(toks), len(removed), " ".join(kept))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
           for r in T.boilerplate_strip(df, span_n=n,
                                        min_docs=2).collect()}
    assert got == want
    # cross-operator invariant: tokens the strip removes are EXACTLY
    # the tokens the report counts as covered (same dup set)
    rep = {r.doc_id: r.covered_tokens
           for r in T.dup_span_report(df, span_n=n, min_docs=2).collect()}
    assert {d: v[1] for d, v in got.items()} == rep


@SLOW
@given(rows=corpus, shingle_n=st.sampled_from([2, 3]),
       window=st.sampled_from([2, 4]))
def test_winnow_fingerprint_matches_reference(spark, rows, shingle_n,
                                              window):
    want = {}
    for did, text in rows:
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
              for g in _spans(text.split(" "), shingle_n)]
        mins = {min(hs[p:p + window])
                for p in range(max(len(hs) - window, 0) + 1)}
        want[did] = "|".join(str(m) for m in sorted(mins))
    got = {r.doc_id: r.fp
           for r in T.winnow_fingerprint(
               spark.createDataFrame(rows, "doc_id long, text string"),
               shingle_n=shingle_n, window=window).collect()}
    assert got == want


@SLOW
@given(new=corpus, old=corpus, n=st.sampled_from([2, 3]))
def test_span_overlap_against_matches_reference(spark, new, old, n):
    """Incremental span probe == per-new-doc hit count + interval-union
    coverage against the set of ALL corpus span hashes (any doc, any
    multiplicity — the index is distinct digests)."""
    idx = set()
    for _, text in old:
        for s in _spans(text.split(" "), n):
            idx.add(hashlib.md5(s.encode()).hexdigest())
    want = {}
    for did, text in new:
        toks = text.split(" ")
        spans = _spans(toks, n)
        hits = [i + 1 for i, s in enumerate(spans)
                if hashlib.md5(s.encode()).hexdigest() in idx]
        covered = set()
        for start in hits:
            covered.update(range(start, min(start + n, len(toks) + 1)))
        want[did] = (len(toks), len(spans), len(hits), len(covered))
    got = {r.doc_id: (r.n_tokens, r.n_spans, r.n_corpus_spans,
                      r.covered_tokens)
           for r in T.span_overlap_against(
               spark.createDataFrame(new, "doc_id long, text string"),
               spark.createDataFrame(old, "doc_id long, text string"),
               span_n=n).collect()}
    assert got == want


def _ref_bpe(rows: list[tuple[int, str]],
             merges: int) -> list[tuple[int, str, str, int]]:
    """Sequential BPE trainer: word-frequency dict, heaviest pair with
    (weight desc, left asc, right asc) ties, greedy left-fold merge.
    Returns the (rank, left, right, weight) table; stops early when no
    adjacent pairs remain (the DataFrame form's empty-argmax round)."""
    wc = Counter(w for _, text in rows for w in text.split(" "))
    seqs = {w: list(w) for w in wc}
    table = []
    for rank in range(1, merges + 1):
        pc = Counter()
        for w, c in wc.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (left, right), weight = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        table.append((rank, left, right, weight))
        for w, s in seqs.items():
            acc: list[str] = []
            for x in s:
                if acc and acc[-1] == left and x == right:
                    acc[-1] = left + right
                else:
                    acc.append(x)
            seqs[w] = acc
    return table


@SLOW
@given(rows=corpus, window=st.sampled_from([2, 4]),
       divisor=st.sampled_from([2, 4]))
def test_cdc_chunks_match_reference(spark, rows, window, divisor):
    """Content-defined chunking == sequential rolling-hash walk: a
    boundary token ENDS its chunk, grams truncate at the doc head,
    chunk hashes are md5 of the reassembled text."""
    from demo_apache_flink_streaming_mode_spark.operators import sketches as SK

    want = set()
    for did, text in rows:
        toks = text.split(" ")
        chunks = {}
        cid = 1
        for p, tok in enumerate(toks, 1):
            chunks.setdefault(cid, []).append(tok)
            gram = " ".join(toks[max(p - window + 1, 1) - 1:p])
            h = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
            if h % divisor == 0:
                cid += 1
        for cid, ctoks in chunks.items():
            txt = " ".join(ctoks)
            want.add((did, cid, len(ctoks),
                      hashlib.md5(txt.encode()).hexdigest()))
    got = {(r.doc_id, r.chunk_id, r.n_tokens, r.chunk_hash)
           for r in SK.cdc_chunks(
               spark.createDataFrame(rows, "doc_id long, text string"),
               window=window, divisor=divisor).collect()}
    assert got == want


@SLOW
@given(rows=st.lists(
    st.lists(st.text(alphabet="ab1", min_size=1, max_size=3),
             min_size=0, max_size=60).map(" ".join),
    min_size=1, max_size=4).map(
        lambda ds: [(i + 1, d) for i, d in enumerate(ds)]))
def test_quality_rules_match_reference(spark, rows):
    """Gopher gate == per-row reference over the same signals; the
    'a'/'1' alphabet exercises the stopword ('a' IS one), alpha-word,
    and duplicate-token rules, with word counts straddling none/some
    rule boundaries — including ZERO-token docs (min_size=0), whose
    ratio signals are NULL and flags all FALSE (the ANSI-0/0 class)."""
    want = {}
    for did, text in rows:
        toks = [t for t in text.split(" ") if t]
        n = len(toks)
        if n == 0:
            want[did] = (0, None, 0, None, None,
                         False, False, False, False, False, False)
            continue
        chars = len(text.replace(" ", ""))
        mwl = chars / n
        n_stop = sum(1 for t in toks if t in T.GOPHER_STOPWORDS)
        alpha = sum(1 for t in toks if any(c.isalpha() for c in t)) / n
        dup = (n - len(set(toks))) / n
        flags = (T.GOPHER_MIN_WORDS <= n <= T.GOPHER_MAX_WORDS,
                 T.GOPHER_MIN_MWL <= mwl <= T.GOPHER_MAX_MWL,
                 n_stop >= T.GOPHER_MIN_STOPWORDS,
                 alpha >= T.GOPHER_MIN_ALPHA_FRAC,
                 dup <= T.GOPHER_MAX_DUP_TOKEN_FRAC)
        want[did] = (n, mwl, n_stop, alpha, dup, *flags, all(flags))
    got = {r.doc_id: (r.n_tokens, r.mean_word_len, r.n_stopwords,
                      r.alpha_frac, r.dup_token_frac, r.ok_length,
                      r.ok_word_len, r.ok_stopwords, r.ok_alpha,
                      r.ok_repetition, r.keep)
           for r in T.quality_rules(
               spark.createDataFrame(rows,
                                     "doc_id long, text string")).collect()}
    assert got == want


@hypo.budget(8)
@given(rows=corpus, merges=st.sampled_from([1, 3]))
def test_bpe_train_matches_reference(spark, rows, merges):
    got = [(r.rank, r.left_sym, r.right_sym, r.weight)
           for r in T.bpe_train(
               spark.createDataFrame(rows, "doc_id long, text string"),
               merges=merges).orderBy("rank").collect()]
    assert got == _ref_bpe(rows, merges)
