"""Deduplication operators for large-scale training-data pipelines.

Four families, all expression-only (no Python UDFs — every hash is md5/
bit arithmetic computed JVM-side inside whole-stage codegen, so the hot
path scales linearly and the only shuffles are the groupBys/joins that
the algorithm genuinely needs):

- exact:        hash-groupBy on the full text (one shuffle on md5(text))
- MinHash+LSH:  shingle -> k minhashes (narrow, per-row) -> band buckets
                -> candidate pairs via band-bucket self-join. At 100 TB
                the band join shuffles only (band_hash, doc_id) pairs,
                never the text.
- SimHash:      16-bit fingerprint by bitwise majority vote over token
                hashes; near-dups collide exactly -> hash-groupBy.
- n-gram Jaccard: exact verification of LSH candidate pairs (the
                standard two-phase near-dup pipeline).

MinHash trick: min(md5(seed || shingle)) over the shingle array is a
valid minhash per seed (md5 is uniform; lexicographic min over fixed-
length hex == numeric min). Keeping hashes as hex strings makes the
DuckDB oracle bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from demo_apache_flink_streaming_mode_spark.functions.scalars import hex_to_long
from demo_apache_flink_streaming_mode_spark.operators.scale import cut_lineage


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition to full parallelism before per-row-heavy compute.

    The testdata tables are single parquet files (one input split); an
    expression-heavy map (thousands of md5 calls per row) would otherwise
    run on one core. The repartition cost is one linear shuffle of the
    input rows — at any scale it is dwarfed by the per-row work it
    parallelizes, and on a well-split production table it is a no-op
    choice the caller can drop.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(c) for c in cols]) if cols else df.repartition(n)


# --- shared shingling ----------------------------------------------------


def word_tokens(text: Column) -> Column:
    """Whitespace tokens, empties removed (documents are space-separated)."""
    return F.filter(F.split(F.trim(text), " "), lambda t: t != "")


def word_shingles(tokens: Column, n: int) -> Column:
    """Array of word n-gram strings (positions 1..len-n+1; whole text if
    shorter than n)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )


# --- exact dedup ---------------------------------------------------------


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: one row per distinct text with group size + keeper id.

    The shuffle key is md5(text) (16 bytes), not the text itself — at
    100 TB the exchange carries digests, and the keeper (min doc_id) is
    resolved by partial min/count map-side.
    """
    return (docs
            .groupBy(F.md5(F.col(text_col)).alias("text_hash"))
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("n_copies")))


# --- MinHash + LSH -------------------------------------------------------


def exact_hash_index(corpus_docs: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """The STANDING exact-dedup store: distinct md5 digests of the
    corpus — what a daily pipeline persists and probes (one row per
    distinct text, 16 bytes each, bounded by content cardinality not
    row count). Output: (h). Persist/reload through
    ``similarity.save_index``/``load_index`` (kind ``dedup_exact``,
    bucketed on ``h`` so the daily probe join reads it
    exchange-free)."""
    return corpus_docs.select(F.md5(text_col).alias("h")).distinct()


def incremental_exact(batch_docs: DataFrame, index: DataFrame,
                      text_col: str = "text") -> DataFrame:
    """Increment-vs-corpus EXACT dedup: classify each NEW doc against
    the standing digest store (:func:`exact_hash_index`) as
    dup_of_corpus (digest already stored), dup_in_batch (fresh digest
    but a lower-id batch doc has it first), or unique. One
    16-byte-digest shuffle; the index side is already distinct, so
    join input is bounded by corpus content cardinality."""
    batch = batch_docs.select("doc_id", F.md5(text_col).alias("h"))
    corpus = index.withColumn("in_corpus", F.lit(True))
    first = batch.groupBy("h").agg(F.min("doc_id").alias("first_id"))
    return (batch.join(corpus, "h", "left").join(first, "h")
            .select("doc_id",
                    F.when(F.col("in_corpus"), "dup_of_corpus")
                    .when(F.col("doc_id") != F.col("first_id"),
                          "dup_in_batch")
                    .otherwise("unique").alias("status")))


def doc_shingles(docs: DataFrame, text_col: str = "text",
                 shingle_n: int = 3) -> DataFrame:
    """Exploded (doc_id, g) distinct word n-gram shingles.

    The shingling HOF runs once per row; everything downstream (hashing,
    mins, joins) is flat codegen'd expressions over the exploded rows.
    """
    return spread(docs, "doc_id").select(
        "doc_id",
        F.explode(F.array_distinct(
            word_shingles(word_tokens(F.col(text_col)), shingle_n))).alias("g"))


def minhash_signature(docs: DataFrame, text_col: str = "text",
                      shingle_n: int = 3, num_hashes: int = 8) -> DataFrame:
    """Per-doc MinHash signature as array<long> (md5-derived minhashes).

    Formulated as explode + groupBy(min) rather than fold-over-array
    HOFs: `md5`/`min` run inside whole-stage codegen with map-side
    partial aggregation, so the shuffle carries one (doc_id, k mins) row
    per doc — and since `doc_shingles` is already hash-partitioned by
    doc_id, the groupBy needs no extra exchange at all. The hash value
    is the first 15 md5 hex digits as BIGINT: min(long) keeps the
    aggregate in HashAggregate (mutable buffer); min(string) would
    force SortAggregate. Fixed-width hex means numeric min == the
    lexicographic min of the hex form, so semantics are unchanged.
    """
    grams = doc_shingles(docs, text_col, shingle_n)
    aggs = [F.min(hex_to_long(F.md5(F.concat(F.lit(f"{i}:"), F.col("g")))))
            .alias(f"m{i}") for i in range(num_hashes)]
    return (grams.groupBy("doc_id").agg(*aggs)
            .select("doc_id",
                    F.array(*[F.col(f"m{i}") for i in range(num_hashes)])
                    .alias("sig")))


def _band_table(signatures: DataFrame, bands: int,
                rows_per_band: int) -> DataFrame:
    """(doc_id, sig, band, band_hash): one row per (doc, band), the LSH
    index shape shared by the self-join, the increment-vs-corpus probe,
    and the streaming near-dup form. Stateless expressions only."""
    return signatures.select(
        "doc_id", "sig",
        F.posexplode(F.array(*[
            F.md5(F.concat_ws("|", *[
                F.col("sig")[b * rows_per_band + r]
                for r in range(rows_per_band)
            ])) for b in range(bands)
        ])).alias("band", "band_hash"),
    )


def minhash_signature_stateless(docs: DataFrame, text_col: str = "text",
                                shingle_n: int = 3,
                                num_hashes: int = 8) -> DataFrame:
    """``minhash_signature`` as a PURE per-row expression: the mins
    fold over the in-row shingle array instead of explode + groupBy.

    Bit-identical output (same md5 hash math over the same distinct
    shingle set — parity-tested), but one row in -> one row out with
    NO aggregation, which is what an APPEND-mode stream needs: the
    batch formulation's groupBy would be an unbounded keyed streaming
    aggregate. Batch pipelines should keep ``minhash_signature``
    (map-side-combinable partial mins beat the per-row O(grams *
    num_hashes) fold when docs are large).
    """
    grams = F.array_distinct(
        word_shingles(word_tokens(F.col(text_col)), shingle_n))

    # closure factory, NOT `lambda g, i=i:` — a 2-arg transform lambda
    # would receive the array INDEX as its second argument, silently
    # shadowing the hash-row number (the documented HOF-arity gotcha)
    def _min_hash(i: int) -> Column:
        return F.array_min(F.transform(
            grams,
            lambda g: hex_to_long(F.md5(F.concat(F.lit(f"{i}:"), g)))))

    sig = F.array(*[_min_hash(i) for i in range(num_hashes)])
    return docs.select("doc_id", sig.alias("sig"))


def minhash_band_index(corpus_sigs: DataFrame, bands: int = 4,
                       rows_per_band: int = 2) -> DataFrame:
    """The STANDING MinHash-LSH store: the corpus band table
    (doc_id, sig, band, band_hash) — what a daily pipeline persists
    and band-equi-joins each increment against. Persist/reload through
    ``similarity.save_index``/``load_index`` (kind ``dedup_minhash``,
    bucketed on ``band_hash``)."""
    return _band_table(corpus_sigs, bands, rows_per_band)


def lsh_candidates_against(new_sigs: DataFrame,
                           corpus_sigs: DataFrame | None,
                           bands: int = 4, rows_per_band: int = 2,
                           num_hashes: int | None = None,
                           index: DataFrame | None = None) -> DataFrame:
    """Increment-vs-corpus LSH: candidate (new doc, corpus doc) pairs —
    a NEW batch's signatures probed against the standing corpus's band
    table, the near-dup analog of exact incremental dedup. At 100 TB
    the corpus band table is the persisted LSH index a daily pipeline
    maintains; each day ships one band-equi-join of the increment
    against it, never a corpus self-join. The probe is stateless
    expressions + an equi join, so the SAME dataflow runs stream-static
    (``streaming.pipelines.near_dup_stream``).

    Output: (doc_id, corpus_doc_id, est_jaccard) — one row per
    candidate pair, est as in ``lsh_candidate_pairs``.

    ``index`` plugs in a prebuilt (possibly reloaded-from-storage)
    :func:`minhash_band_index` so the probe skips re-banding the
    corpus; ``corpus_sigs`` may then be None.
    """
    if num_hashes is not None and num_hashes != bands * rows_per_band:
        raise ValueError(
            f"banding {bands}x{rows_per_band} does not cover a "
            f"{num_hashes}-hash signature")
    a = _band_table(new_sigs, bands, rows_per_band).alias("a")
    b = ((index if index is not None
          else _band_table(corpus_sigs, bands, rows_per_band))
         .hint("shuffle_hash").alias("b"))
    est = (F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                      lambda x, y: x == y), lambda e: e))
           / F.size("sig_a").cast("double"))
    scored = (a.join(b, ["band", "band_hash"])
              .filter(F.col("a.doc_id") != F.col("b.doc_id"))
              .select(F.col("a.doc_id").alias("doc_id"),
                      F.col("b.doc_id").alias("corpus_doc_id"),
                      F.col("a.sig").alias("sig_a"),
                      F.col("b.sig").alias("sig_b"))
              .select("doc_id", "corpus_doc_id", est.alias("est_jaccard")))
    return (scored.groupBy("doc_id", "corpus_doc_id")
            .agg(F.min("est_jaccard").alias("est_jaccard")))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 4,
                        rows_per_band: int = 2,
                        num_hashes: int | None = None) -> DataFrame:
    """LSH banding: docs sharing any band bucket become a candidate pair.

    Output: (doc_a, doc_b, est_jaccard) — est_jaccard is the fraction of
    equal signature positions (the MinHash similarity estimate),
    normalized by the ACTUAL signature length, not the banding shape.
    The band explode duplicates only (doc_id, band_hash, sig); the
    self-join shuffles on (band, band_hash) — bounded state per bucket.

    The banding must exactly cover the signature: a shorter signature
    would yield NULL positions that concat_ws silently drops (distinct
    bands collapsing into colliding band hashes); a longer one would
    leave positions unbanded. Pass ``num_hashes`` to validate up front.
    """
    if num_hashes is not None and num_hashes != bands * rows_per_band:
        raise ValueError(
            f"banding {bands}x{rows_per_band} does not cover a "
            f"{num_hashes}-hash signature")
    banded = _band_table(signatures, bands, rows_per_band)
    # the bucket self-join MUST be a shuffle join: both sides grow with
    # the corpus, and Catalyst's size estimate after a Generate is
    # unreliable (it would happily broadcast the exploded side through
    # the driver). shuffle_hash: bounded per-bucket state, no sort.
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    est = (F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                      lambda x, y: x == y), lambda e: e))
           / F.size("sig_a").cast("double"))
    scored = (a.join(b, ["band", "band_hash"])
              .filter(F.col("a.doc_id") < F.col("b.doc_id"))
              .select(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"),
                      F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
              .select("doc_a", "doc_b", est.alias("est_jaccard")))
    # a pair can match in several bands with the same est value: dedup by
    # aggregating the scalar (min == the value) — keeps HashAggregate;
    # dropDuplicates over the sig arrays would force SortAggregate
    return (scored.groupBy("doc_a", "doc_b")
            .agg(F.min("est_jaccard").alias("est_jaccard")))


# --- duplicate clustering (connected components) -------------------------


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_iters: int = 20) -> DataFrame:
    """Connected components over candidate pairs: label every node with
    the smallest id reachable from it. Output: (doc_id, cluster_id).

    This is the final stage of a production dedup pipeline — candidate
    PAIRS (from LSH/SimHash blocking) must become duplicate CLUSTERS
    before a keeper can be chosen, and pair-transitivity (a~b, b~c =>
    {a,b,c} one group) is exactly connected components.

    Algorithm: iterative min-label propagation with pointer jumping
    (label <- label(label) each round), the standard O(log n)-round
    distributed CC scheme (cf. hash-to-min, Vassilvitskii et al.). Each
    round is two shuffle equi-joins + a HashAggregate min — no
    all-pairs work, state linear in |V| + |E|. The driver only steers
    the loop (a converged? boolean per round); the data never leaves
    the cluster, and ``cut_lineage`` (executor-local or reliable
    checkpoint, per ``spark.graft.reliableCheckpoint``) cuts the
    growing lineage so round N's plan does not replay rounds 1..N-1.

    Deterministic: min-labels are monotone non-increasing and converge
    to the component minimum regardless of partitioning or iteration
    interleaving. Raises if max_iters rounds do not converge (2^20-hop
    label reach covers any realistic dup-cluster diameter).
    """
    # materialize the edge set ONCE — every round joins against it, and
    # without this the (possibly expensive) pair-producing pipeline
    # upstream would be re-executed per round
    edges = (pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
             .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
             .distinct()
             .transform(cut_lineage))
    # the seed labels are NOT cut (r12): round 1 references them twice,
    # but each reference is a cheap distinct over the already-cached
    # edge blocks, and round 1's own checkpoint replaces them — a
    # dedicated materialization job bought nothing
    labels = (edges.select(F.col("a").alias("id")).distinct()
              .withColumn("label", F.col("id")))
    for _ in range(max_iters):
        nbr_min = (edges.join(labels.select(F.col("id").alias("b"),
                                            F.col("label").alias("nl")), "b")
                   .groupBy("a").agg(F.min("nl").alias("nbr_min")))
        # carry the round's INPUT label ("old") through to the
        # checkpoint so convergence is a filter over the cached frame —
        # previously a separate join of new-vs-old labels ran as its
        # own job every round (r11, one exchange + one job per round
        # saved; the loop output drops the extra column)
        stepped = (labels.join(nbr_min.withColumnRenamed("a", "id"), "id", "left")
                   .select("id", F.least("label", F.coalesce("nbr_min", "label"))
                           .alias("label"), F.col("label").alias("old")))
        # pointer jumping: follow the label's own label (halves chains)
        jumped = (stepped.alias("x")
                  .join(stepped.select(F.col("id").alias("label"),
                                       F.col("label").alias("_l2")).alias("y"),
                        "label")
                  .select("id", F.col("_l2").alias("label"), F.col("x.old")))
        new_labels = jumped.transform(cut_lineage)
        converged = (new_labels.filter(F.col("label") != F.col("old"))
                     .isEmpty())
        labels = new_labels.select("id", "label")
        if converged:
            return labels.select(F.col("id").alias("doc_id"),
                                 F.col("label").alias("cluster_id"))
    raise RuntimeError(f"connected_components: no convergence in {max_iters} rounds")


# --- SimHash -------------------------------------------------------------


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """Per-doc SimHash fingerprint (bitwise majority of token hashes).

    Token hash = first 4 md5 hex digits -> 16-bit int; bit j of the
    fingerprint is set iff tokens with bit j set outnumber those without.
    Pure integer expressions -> identical on any engine.

    Explode + groupBy formulation: the token hash is computed once per
    token (not once per bit), and the per-bit majority votes are plain
    codegen'd SUM aggregates with map-side combine. Docs with zero
    tokens would drop out (none exist: tokenization of non-blank text
    always yields >= 1 token).
    """
    toks = spread(docs, "doc_id").select(
        "doc_id", F.explode(word_tokens(F.col(text_col))).alias("t"))
    th = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("t")), 1, 4), 16, 10)
        .cast("long").alias("h"))
    votes = [F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1,
                          F.lit(1)).otherwise(F.lit(-1))).alias(f"v{j}")
             for j in range(bits)]
    fp = sum([F.when(F.col(f"v{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
              for j in range(bits)], F.lit(0))
    return (th.groupBy("doc_id").agg(*votes)
            .select("doc_id", fp.cast("long").alias("simhash")))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       bits: int = 16, bands: int = 4,
                       text_col: str = "text") -> DataFrame:
    """SimHash near-duplicate pairs: Hamming distance <= max_hamming,
    found WITHOUT an all-pairs comparison.

    The signature splits into ``bands`` equal bit-bands; by pigeonhole
    any pair differing in <= bands-1 bits shares at least one band
    verbatim, so a per-band equi-self-join yields a complete candidate
    set for ``max_hamming <= bands - 1`` (asserted). Candidates then
    verify the EXACT Hamming distance via bit_count(xor) — the same
    block-then-verify shape as MinHash-LSH, shuffling only
    (band, band_value) ints, never text.

    Band selectivity scales with signature width: the testdata's tiny
    vocabulary makes 16-bit bands collision-heavy; at 100 TB use
    bits=64 / bands=5-8 (band values then spread over 2^8..2^12) so
    per-band buckets stay small. Same plan, wider ints.
    """
    if max_hamming > bands - 1:
        raise ValueError("pigeonhole completeness needs "
                         "max_hamming <= bands - 1")
    width = bits // bands
    sig = simhash(docs, text_col, bits)
    banded = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright("simhash", b * width)
                     .bitwiseAND((1 << width) - 1).alias("bv"))
            for b in range(bands)])).alias("bb")
    ).select("doc_id", "simhash", "bb.band", "bb.bv")
    a = banded.select(F.col("doc_id").alias("doc_a"),
                      F.col("simhash").alias("sig_a"), "band", "bv")
    b = banded.select(F.col("doc_id").alias("doc_b"),
                      F.col("simhash").alias("sig_b"), "band", "bv")
    cand = (a.join(b, ["band", "bv"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sig_a", "sig_b")
            .distinct())
    return (cand.withColumn(
                "hamming",
                F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


# --- exact n-gram Jaccard verification ----------------------------------


def ngram_jaccard_pairs(docs: DataFrame, candidates: DataFrame,
                        text_col: str = "text", shingle_n: int = 3,
                        carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Exact Jaccard over distinct word n-grams for candidate (doc_a, doc_b).

    Intersection via explode + count; |A ∪ B| = |A| + |B| − |A ∩ B|.
    Shuffles scale with candidate-pair shingle counts, not corpus size —
    this is the verify phase behind an LSH/blocking prefilter.

    Every join is hinted shuffle_hash: candidates, grams, and sizes all
    grow with the corpus (nothing here is broadcast-safe at 100 TB), and
    post-Generate size estimates would otherwise mislead Catalyst into
    broadcasting an exploded side through the driver. AQE still
    broadcast-converts at runtime if a side turns out tiny.

    ``carry_cols`` names extra ``candidates`` columns to carry through
    to the output (they ride the joins and join the per-pair groupBy
    key — constant per (doc_a, doc_b), so the aggregate is unchanged).
    Lets a caller verifying the UNION of several candidate sets keep
    per-set membership flags without re-deriving the candidate frame
    (one verify pipeline instead of one per set — r12, guide §2.3).
    """
    grams = doc_shingles(docs, text_col, shingle_n)
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("g"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("g"))
    inter = (candidates.hint("shuffle_hash")
             .join(ga, "doc_a")
             .join(gb.hint("shuffle_hash"), ["doc_b", "g"])
             .groupBy("doc_a", "doc_b", *carry_cols)
             .agg(F.count("*").alias("n_inter")))
    return (inter
            .join(sizes.hint("shuffle_hash")
                  .select(F.col("doc_id").alias("doc_a"),
                          F.col("n_grams").alias("na")), "doc_a")
            .join(sizes.hint("shuffle_hash")
                  .select(F.col("doc_id").alias("doc_b"),
                          F.col("n_grams").alias("nb")), "doc_b")
            .select("doc_a", "doc_b", *carry_cols,
                    (F.col("n_inter") /
                     (F.col("na") + F.col("nb") - F.col("n_inter")))
                    .alias("jaccard")))


# --- benchmark decontamination -------------------------------------------


def benchmark_contamination(docs: DataFrame, bench_filter: Column,
                            shingle_n: int = 5, threshold: float = 0.2,
                            text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: for every non-benchmark document, the
    fraction of its distinct word ``shingle_n``-grams that also occur in
    ANY benchmark document (``bench_filter`` selects the benchmark set).

    The standard training-data hygiene pass (cf. GPT-3 appendix C /
    PaLM-style 13-gram overlap): docs with ``contamination >=
    threshold`` are flagged for removal so evaluation data doesn't leak
    into the training corpus.

    Execution shape: shingle once over the whole corpus, hash each gram
    to a 60-bit md5-derived long, split by the benchmark flag. The
    benchmark gram set is distinct-ed and BROADCAST — benchmarks are
    tiny relative to a 100 TB corpus, so the candidate side (the actual
    100 TB) is never shuffled for the membership probe; the only
    exchanges are the vocab-bounded distinct on the benchmark side and
    the per-doc count aggregation (map-side combinable). Joining on the
    8-byte hash, never the gram text, keeps the broadcast table and the
    probe narrow.
    """
    grams = spread(docs, "doc_id").select(
        "doc_id", bench_filter.alias("_isb"),
        F.explode(F.array_distinct(
            word_shingles(word_tokens(F.col(text_col)), shingle_n))).alias("g"))
    hashed = grams.select("doc_id", "_isb",
                          hex_to_long(F.md5(F.col("g"))).alias("gh"))
    bench = (hashed.filter(F.col("_isb")).select("gh").distinct()
             .withColumn("_hit", F.lit(1)))
    cand = hashed.filter(~F.col("_isb")).select("doc_id", "gh")
    return (cand.join(F.broadcast(bench), "gh", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_grams"),
                 F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long")
                 .alias("n_overlap"))
            .select("doc_id", "n_grams", "n_overlap",
                    (F.col("n_overlap") / F.col("n_grams"))
                    .alias("contamination"),
                    (F.col("n_overlap") / F.col("n_grams") >= threshold)
                    .alias("is_contaminated")))


# --- Bloom-prefiltered decontamination -----------------------------------

BLOOM_M_BITS = 1 << 20   # bitmap width; power of two so modulo is a mask
BLOOM_K = 5              # hash functions per element


def _bloom_positions(gh1: Column, gh2: Column, k: int, m_bits: int) -> Column:
    """k bit positions via Kirsch-Mitzenmacher double hashing:
    pos_j = (h1 + j*h2) & (m-1). Both hashes are 60-bit md5 halves, so
    h1 + (k-1)*h2 stays far below 2^63 for k <= 7."""
    assert k <= 7 and m_bits & (m_bits - 1) == 0
    return F.array(*[
        (gh1 + F.lit(j) * gh2).bitwiseAND(F.lit(m_bits - 1)).cast("long")
        for j in range(k)])


def bloom_prefiltered_contamination(
        docs: DataFrame, bench_filter: Column, shingle_n: int = 5,
        threshold: float = 0.2, m_bits: int = BLOOM_M_BITS,
        k: int = BLOOM_K, text_col: str = "text") -> DataFrame:
    """``benchmark_contamination`` with a Bloom-filter first pass.

    Output is IDENTICAL to the exact operator (a Bloom filter has no
    false negatives, and every Bloom survivor is re-verified against
    the exact benchmark gram set), which is why the registered query
    shares the exact operator's oracle. What changes is the probe
    economics at 100 TB: the first membership test every candidate gram
    meets is an ``m_bits``-wide bitmap (128 KiB at the default) instead
    of the multi-MB benchmark hash set, and the exact verify join's
    probe input shrinks to true positives + the Bloom false-positive
    residue.

    Build: benchmark grams explode to ``k`` bit positions; positions
    aggregate by 64-bit word index with ``bit_or`` -> at most
    ``m_bits/64`` rows, broadcast everywhere. Probe: candidate gram
    positions broadcast-join the word table; a gram *might* be
    contaminated iff all ``k`` bits are set. Everything is flat bit
    arithmetic inside whole-stage codegen — no UDFs, no driver state.
    """
    grams = spread(docs, "doc_id").select(
        "doc_id", bench_filter.alias("_isb"),
        F.explode(F.array_distinct(
            word_shingles(word_tokens(F.col(text_col)), shingle_n))).alias("g"))
    h = F.md5(F.col("g"))
    hashed = grams.select("doc_id", "_isb",
                          hex_to_long(h).alias("gh"),
                          hex_to_long(h, 16, 15).alias("gh2"))
    bench = hashed.filter(F.col("_isb")).select("gh", "gh2").distinct()
    words = (bench
             .select(F.explode(_bloom_positions(
                 F.col("gh"), F.col("gh2"), k, m_bits)).alias("pos"))
             .select((F.col("pos") / 64).cast("int").alias("w_idx"),
                     F.expr("shiftleft(CAST(1 AS BIGINT),"
                            " CAST(pos % 64 AS INT))").alias("bit"))
             .groupBy("w_idx").agg(F.bit_or("bit").alias("word")))
    cand = hashed.filter(~F.col("_isb"))
    totals = cand.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    cpos = (cand
            .select("doc_id", "gh",
                    F.explode(_bloom_positions(
                        F.col("gh"), F.col("gh2"), k, m_bits)).alias("pos"))
            .select("doc_id", "gh",
                    (F.col("pos") / 64).cast("int").alias("w_idx"),
                    F.expr("shiftleft(CAST(1 AS BIGINT),"
                           " CAST(pos % 64 AS INT))").alias("bit")))
    # min(hit) over the k positions == "all bits set"; n_dup restores
    # the multiplicity of 60-bit-hash-colliding grams within a doc so
    # the overlap count matches the exact operator's row semantics.
    probe = (cpos.join(F.broadcast(words), "w_idx", "left")
             .select("doc_id", "gh",
                     (F.col("word").isNotNull()
                      & (F.col("word").bitwiseAND(F.col("bit")) != 0))
                     .alias("hit"))
             .groupBy("doc_id", "gh")
             .agg(F.min("hit").alias("might"),
                  (F.count("*") / k).cast("long").alias("n_dup")))
    survivors = (probe.filter(F.col("might"))
                 .join(F.broadcast(bench.select("gh").distinct()),
                       "gh", "left_semi"))
    overlaps = survivors.groupBy("doc_id").agg(
        F.sum("n_dup").cast("long").alias("n_overlap"))
    return (totals.join(overlaps, "doc_id", "left")
            .select("doc_id", "n_grams",
                    F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long")
                    .alias("n_overlap"))
            .select("doc_id", "n_grams", "n_overlap",
                    (F.col("n_overlap") / F.col("n_grams"))
                    .alias("contamination"),
                    (F.col("n_overlap") / F.col("n_grams") >= threshold)
                    .alias("is_contaminated")))


def exact_rational_jaccard_key() -> Column:
    """EXACT rational argmax key over (n_inter, n_union) columns (r9
    advice): two distinct Jaccards i1/u1 > i2/u2 differ by at least
    1/(u1*u2), so the scaled-integer key (i * 2^40) DIV u separates
    them exactly whenever u <= 2^20 — shingle-union sizes are bounded
    by document length, far below that — and i * 2^40 <= 2^60 stays in
    BIGINT. A float quotient could collapse two distinct rationals
    onto one double and leak the decision to the tie-break; the
    integer key cannot.

    The u <= 2^20 assumption is ENFORCED, not just asserted in prose
    (r10 advice): a >1M-shingle union raises with a specific error
    instead of silently reverting to the float-collision behavior the
    key exists to fix."""
    return F.when(
        F.col("n_union") > F.lit(1 << 20),
        F.raise_error(F.concat(
            F.lit("exact-rational argmax requires n_union <= 2^20 "
                  "for BIGINT exactness; got n_union="),
            F.col("n_union").cast("string"))).cast("bigint"),
    ).otherwise(F.expr("(n_inter * 1099511627776) DIV n_union"))


def fuzzy_contamination(docs: DataFrame, bench_filter: Column,
                        threshold_num: int, threshold_den: int,
                        shingle_n: int = 3, num_hashes: int = 8,
                        bands: int = 4, rows_per_band: int = 2,
                        text_col: str = "text") -> DataFrame:
    """FUZZY benchmark decontamination: flag candidate documents that
    NEAR-DUPLICATE any benchmark document — paraphrased or lightly
    edited eval items that exact gram-overlap decontamination
    (``benchmark_contamination``) under-counts.

    Two-phase, the standard LSH shape pointed across the corpus/bench
    split instead of at a self-join: MinHash signatures for both
    sides, candidate (candidate doc, benchmark doc) pairs via the
    band equi-join (``lsh_candidates_against`` — the benchmark band
    table is the tiny side), then EXACT distinct-n-gram Jaccard
    verification on candidates only, thresholded RATIONALLY
    (n_inter * den >= n_union * num — integer math, no float
    boundary). Emits one row per contaminated candidate with its
    worst (highest-Jaccard) benchmark match, ties to the smaller
    benchmark id.

    Scale shape: the corpus is never self-joined and never shuffled
    against the whole benchmark text — signatures are narrow per-row
    expressions, the band join shuffles (band_hash, doc_id) ints, and
    the exact verify touches candidate pairs' grams only.
    """
    from pyspark.sql import Window as W
    base = spread(docs, "doc_id").select(
        "doc_id", text_col, bench_filter.alias("_isb"))
    bench = base.filter(F.col("_isb")).select("doc_id", text_col)
    cand = base.filter(~F.col("_isb")).select("doc_id", text_col)
    pairs = (lsh_candidates_against(
                 minhash_signature(cand, text_col, shingle_n, num_hashes),
                 minhash_signature(bench, text_col, shingle_n, num_hashes),
                 bands, rows_per_band)
             .select(F.col("doc_id").alias("doc_a"),
                     F.col("corpus_doc_id").alias("doc_b")))
    grams = doc_shingles(docs, text_col, shingle_n)
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    ga = grams.select(F.col("doc_id").alias("doc_a"), "g")
    gb = grams.select(F.col("doc_id").alias("doc_b"), "g")
    inter = (pairs.hint("shuffle_hash")
             .join(ga, "doc_a")
             .join(gb.hint("shuffle_hash"), ["doc_b", "g"])
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_inter")))
    scored = (inter
              .join(sizes.hint("shuffle_hash")
                    .select(F.col("doc_id").alias("doc_a"),
                            F.col("n_grams").alias("na")), "doc_a")
              .join(sizes.hint("shuffle_hash")
                    .select(F.col("doc_id").alias("doc_b"),
                            F.col("n_grams").alias("nb")), "doc_b")
              .select("doc_a", "doc_b", "n_inter",
                      (F.col("na") + F.col("nb") - F.col("n_inter"))
                      .alias("n_union")))
    hits = scored.filter(F.col("n_inter") * F.lit(threshold_den)
                         >= F.col("n_union") * F.lit(threshold_num))
    w = W.partitionBy("doc_a").orderBy(
        F.desc(exact_rational_jaccard_key()), F.asc("doc_b"))
    return (hits.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("doc_a").alias("doc_id"),
                    F.col("doc_b").alias("matched_bench"),
                    "n_inter", "n_union",
                    (F.col("n_inter") / F.col("n_union")).alias("jaccard")))


def jaccard_exact_pairs(docs: DataFrame, threshold_num: int,
                        threshold_den: int, text_col: str = "text",
                        shingle_n: int = 3) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard >= num/den via prefix filtering
    (Chaudhuri et al. 2006; Xiao et al. 2008, PPJoin — public): the
    scale path for exact set-similarity join, no LSH, no full
    inverted-index self-join.

    Prefix-filter principle: order every doc's distinct shingles by ONE
    global total order; if J(A, B) >= t, the two docs must share a
    shingle within their first |X| - ceil(t*|X|) + 1 shingles. So the
    candidate join runs on PREFIXES only — and with the global order
    chosen as ascending document frequency (rarest grams first), the
    prefixes are the least-joinable shingles, collapsing the hot-gram
    quadratic blowup of the naive inverted index. Survivors verify with
    the full intersection count (``ngram_jaccard_pairs``).

    ceil(t * ng) is computed in INTEGER arithmetic from the rational
    threshold ((num*ng + den - 1) div den) — IEEE ceil((9/11) * 77)
    gives 64 where 9*77/11 is exactly 63, shortening the prefix and
    silently MISSING true pairs
    (pinned in tests/test_jaccard_exact_property.py).

    Scale shape: df counting and prefix ranking are vocab-/doc-bounded
    shuffles; the candidate join moves prefix rows only; verification
    scales with surviving-pair shingles. Every join is equi.
    """
    cands = jaccard_candidates(docs, threshold_num, threshold_den,
                               text_col, shingle_n)
    thr = threshold_num / threshold_den
    return (ngram_jaccard_pairs(docs, cands, text_col, shingle_n)
            .filter(F.col("jaccard") >= thr))


def jaccard_candidates(docs: DataFrame, threshold_num: int,
                       threshold_den: int, text_col: str = "text",
                       shingle_n: int = 3) -> DataFrame:
    """The prefix-filter CANDIDATE stage of :func:`jaccard_exact_pairs`
    — the complete (by the prefix theorem) (doc_a, doc_b) superset of
    every pair with Jaccard >= num/den. Exposed so a caller combining
    several candidate sources (e.g. the recall report verifying both
    the prefix and the LSH candidates) can run ONE verify pipeline
    over their union instead of one per source (r12, guide §2.3).

    Examined-and-rejected here (r12, measured at sf0.1): the PPJoin
    length filter (den*min(ng) >= num*max(ng)) and positional filter
    (1 + min(na-rka, nb-rkb) >= ceil-rational alpha) are lossless and
    cut the candidate count 648k -> 325k, but made the whole query
    ~30% SLOWER — the wider prefix rows (rk, ng riding the self-join)
    and extra predicates cost more than the halved verify saves at
    this threshold (t=0.3 prefixes are 70% of each doc's grams, and
    the corpus has near-uniform doc lengths, so neither filter bites).
    """
    from pyspark.sql import Window as W

    grams = doc_shingles(docs, text_col, shingle_n)
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("ng"))
    dfreq = grams.groupBy("g").agg(F.count("*").alias("gdf"))
    pref_len = (F.col("ng")
                - F.expr(f"({threshold_num} * ng + {threshold_den} - 1) "
                         f"div {threshold_den}") + F.lit(1))
    w = W.partitionBy("doc_id").orderBy(F.asc("gdf"), F.asc("g"))
    prefix = (grams.join(dfreq.hint("shuffle_hash"), "g")
              .join(sizes.hint("shuffle_hash"), "doc_id")
              .withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= pref_len)
              .select("doc_id", "g"))
    return (prefix.select(F.col("doc_id").alias("doc_a"), "g")
            .hint("shuffle_hash")
            .join(prefix.select(F.col("doc_id").alias("doc_b"), "g"), "g")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())


def jaccard_prefix_index(corpus_docs: DataFrame, threshold_num: int,
                         threshold_den: int, text_col: str = "text",
                         shingle_n: int = 3, cut: bool = True
                         ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The STANDING exact-Jaccard store — the prefix-filter analog of
    :func:`exact_hash_index` / :func:`minhash_band_index`: what a daily
    pipeline persists so each increment probes EXACT set similarity
    without ever re-scanning the corpus. Three parts, all lineage-cut:

    * ``prefix`` (doc_id, g): the corpus docs' rarest-df-first prefix
      rows under the global (df, g) order and the rational-ceil length
      (see :func:`jaccard_exact_pairs`);
    * ``grams`` (doc_id, g, ng): every corpus doc's distinct shingles
      with its set size — the verification side;
    * ``dfreq`` (g, gdf): the corpus document frequencies that DEFINE
      the global order — increments must rank their shingles by the
      SAME order (absent shingles coalesce to df 0, still a total
      order), or the prefix theorem's shared-order premise breaks.

    Persist/reload through ``similarity.save_index``/``load_index``
    (kind ``dedup_jaccard``; prefix and grams bucketed on ``g``, the
    probe/verify join key).

    ``cut=False`` (r12, the same one-shot economics as ``ivfpq_index``'s
    ``cut_codes``): an INLINE increment query builds and probes the
    store exactly once, so only ``dfreq`` — referenced by BOTH the
    corpus and the increment prefix rankings — is worth its own
    materialization job; ``prefix`` and ``grams`` each feed a single
    downstream join, and leaving them lazy lets the final job share
    the corpus-shingle scan via exchange reuse instead of paying three
    eager jobs that each re-derive it. Store builders that persist or
    repeatedly probe the index keep the default (every part cut)."""
    grams0 = doc_shingles(corpus_docs, text_col, shingle_n)
    sizes = grams0.groupBy("doc_id").agg(F.count("*").alias("ng"))
    dfreq = grams0.groupBy("g").agg(F.count("*").alias("gdf"))
    grams = grams0.join(sizes.hint("shuffle_hash"), "doc_id")
    prefix = _rarest_prefix(grams0, sizes, dfreq, threshold_num,
                            threshold_den)
    if cut:
        grams = grams.transform(cut_lineage)
        prefix = prefix.transform(cut_lineage)
    return prefix, grams, dfreq.transform(cut_lineage)


def _rarest_prefix(grams: DataFrame, sizes: DataFrame, dfreq: DataFrame,
                   threshold_num: int, threshold_den: int) -> DataFrame:
    """(doc_id, g) prefix rows under the global (df asc, g asc) order;
    shingles missing from ``dfreq`` rank first with df 0 (the increment
    side probes a FROZEN corpus order). Prefix length uses the exact
    rational ceil."""
    from pyspark.sql import Window as W

    pref_len = (F.col("ng")
                - F.expr(f"({threshold_num} * ng + {threshold_den} - 1) "
                         f"div {threshold_den}") + F.lit(1))
    w = W.partitionBy("doc_id").orderBy(F.asc("gdf"), F.asc("g"))
    return (grams.join(dfreq.hint("shuffle_hash"), "g", "left")
            .withColumn("gdf", F.coalesce("gdf", F.lit(0)))
            .join(sizes.hint("shuffle_hash"), "doc_id")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= pref_len)
            .select("doc_id", "g"))


def jaccard_incremental_pairs(new_docs: DataFrame,
                              corpus_docs: DataFrame | None,
                              threshold_num: int, threshold_den: int,
                              text_col: str = "text", shingle_n: int = 3,
                              index: tuple[DataFrame, DataFrame,
                                           DataFrame] | None = None
                              ) -> DataFrame:
    """Increment-vs-corpus EXACT n-gram Jaccard >= num/den — the fifth
    member of the incremental family (exact hash / MinHash near / span
    overlap / semantic / exact Jaccard): the new batch's shingles rank
    under the CORPUS-df global order, its prefixes equi-join the
    standing prefix store for candidates, and only candidates verify
    with full intersection counts. Never a corpus self-join; the probe
    is stateless expressions + equi joins, so the same dataflow runs
    stream-static over micro-batches (parity test in
    tests/test_streaming.py).

    ``index`` plugs in a prebuilt (possibly reloaded)
    :func:`jaccard_prefix_index`; ``corpus_docs`` may then be None.
    Output: (new_id, dup_of, jaccard)."""
    if index is None:
        # inline one-shot build-and-probe: only dfreq is cut (see
        # jaccard_prefix_index's cut note)
        index = jaccard_prefix_index(corpus_docs, threshold_num,
                                     threshold_den, text_col, shingle_n,
                                     cut=False)
    cpref, cgrams, cdf = index
    ngrams = doc_shingles(new_docs, text_col, shingle_n)
    nsizes = ngrams.groupBy("doc_id").agg(F.count("*").alias("ng"))
    npref = _rarest_prefix(ngrams, nsizes, cdf, threshold_num,
                           threshold_den)
    cands = (npref.select(F.col("doc_id").alias("new_id"), "g")
             .hint("shuffle_hash")
             .join(cpref.select(F.col("doc_id").alias("dup_of"), "g"), "g")
             .select("new_id", "dup_of").distinct())
    inter = (cands
             .join(ngrams.hint("shuffle_hash")
                   .select(F.col("doc_id").alias("new_id"), "g"),
                   "new_id")
             .join(cgrams.hint("shuffle_hash")
                   .select(F.col("doc_id").alias("dup_of"), "g",
                           F.col("ng").alias("nb")), ["dup_of", "g"])
             .groupBy("new_id", "dup_of", "nb")
             .agg(F.count("*").alias("ni")))
    thr = threshold_num / threshold_den
    return (inter
            .join(nsizes.hint("shuffle_hash")
                  .select(F.col("doc_id").alias("new_id"),
                          F.col("ng").alias("na")), "new_id")
            .select("new_id", "dup_of",
                    (F.col("ni")
                     / (F.col("na") + F.col("nb") - F.col("ni")))
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= thr))
