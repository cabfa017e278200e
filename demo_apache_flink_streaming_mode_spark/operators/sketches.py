"""Distributed sketch operators: HyperLogLog distinct counting,
count-min frequency estimation, and content-defined chunking.

The 100 TB motivation: exact `COUNT(DISTINCT x)` shuffles every
distinct value and a per-key top-k of term counts shuffles the whole
vocabulary; sketches compress both to fixed-size state that partial-
aggregates map-side. These are the "novel sketch" class of custom
operator (no reference equivalent — SURVEY.md §2.9/§2.10): composed
entirely of built-in expressions (md5 / integer bit arithmetic /
decimal sums), no Python in the data path, so every stage stays in
whole-stage codegen and the shuffles carry only (key, register) or
(row, bucket) rows.

Engine-portability (the DuckDB oracle must hash-match bit-for-bit):
- all hashes are md5 substrings parsed as BIGINT (`hex_to_long`);
- the HLL register sum is computed EXACTLY: sum of 2^(61-reg) in
  DECIMAL(38,0) (order-free, no float accumulation), converted to
  double once at the end — a float SUM over registers would be
  partition-order-dependent in the last ulp;
- rho (leading-zero rank) uses `length(bin(v))`, identical in Spark
  and DuckDB (both print minimal binary digits, bin(0) = '0');
- no log/exp anywhere (the raw HLL estimator without the small-range
  linear-counting correction — the correction needs ln(), whose libm
  rounding differs across engines; the delta is documented, not hidden).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from demo_apache_flink_streaming_mode_spark.functions.scalars import hex_to_long
from demo_apache_flink_streaming_mode_spark.operators.dedup import word_tokens

# Raw-estimator bias constant alpha_m for m=64 registers; repr() of this
# float is inlined into the oracle SQL so both engines use the same bits.
HLL_M = 64
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_POW2_61 = float(1 << 61)  # exact in double


def hll_registers(df: DataFrame, key_cols: list[str], value_col: str,
                  m: int = HLL_M) -> DataFrame:
    """Per-key HLL register vector: (keys..., bucket, reg).

    This is the mergeable state of the sketch — max() over registers
    merges sub-sketches, so it works unchanged as a STREAMING update-
    mode aggregation (state: m small ints per key) with the estimate
    fold applied downstream of the sink; the batch path continues into
    ``hll_distinct``. Parity of the two forms is asserted in
    tests/test_streaming.py.
    """
    bucket, rho = hll_bucket_rho(value_col, m)
    return (df.select(*key_cols, bucket, rho)
            .groupBy(*key_cols, "bucket").agg(F.max("rho").alias("reg")))


def hll_bucket_rho(value_col: str, m: int = HLL_M) -> tuple[Column, Column]:
    """The per-row sketch projection: (bucket, rho) columns for a value.

    Exposed separately so streaming pipelines can compose them with
    their own watermarked `window()` grouping (see the windowed
    streaming test) while batch goes through ``hll_registers``.
    """
    h = F.md5(F.col(value_col).cast("string"))
    bucket = (hex_to_long(h, 1, 2) % m).alias("bucket")
    v60 = hex_to_long(h, 3, 15)
    rho = (F.when(v60 == 0, F.lit(61))
           .otherwise(F.lit(61) - F.length(F.bin(v60)))).alias("rho")
    return bucket, rho


def hll_estimate(regs: DataFrame, key_cols: list[str],
                 m: int = HLL_M) -> DataFrame:
    """Estimate fold over a (keys..., bucket, reg) register table — the
    shared tail of the direct and merged sketch paths. Emits
    (keys..., hll_est double)."""
    # densify to all m buckets (missing register == 0) so the sum has a
    # fixed term count; the per-key bucket list is tiny (m rows)
    keys = regs.select(*key_cols).distinct()
    dense = (keys.select(*key_cols, F.explode(F.sequence(F.lit(0), F.lit(m - 1)))
                         .alias("bucket"))
             .join(regs, [*key_cols, "bucket"], "left")
             .withColumn("reg", F.coalesce("reg", F.lit(0))))
    # EXACT register sum: sum_j 2^-reg_j == (sum_j 2^(61-reg_j)) / 2^61,
    # accumulated in DECIMAL(38,0) — order-free, so plain SUM is safe
    s_int = F.sum(F.expr("shiftleft(cast(1 as bigint), 61 - reg)")
                  .cast("decimal(38,0)")).alias("s_int")
    est = (F.lit(HLL_ALPHA * m * m) * F.lit(_POW2_61)
           / F.col("s_int").cast("double")).alias("hll_est")
    return dense.groupBy(*key_cols).agg(s_int).select(*key_cols, est)


def hll_merge(regs: DataFrame, key_cols: list[str]) -> DataFrame:
    """Merge sub-sketch register tables by register-wise MAX — the
    associative/commutative union that makes HLL map-side-combinable
    and cross-partition mergeable at 100 TB. Input may carry extra
    partition columns beyond ``key_cols``; they fold away here."""
    return (regs.groupBy(*key_cols, "bucket")
            .agg(F.max("reg").alias("reg")))


def hll_distinct(df: DataFrame, key_cols: list[str], value_col: str,
                 m: int = HLL_M) -> DataFrame:
    """Per-key HyperLogLog distinct estimate (raw estimator, m registers).

    Dataflow: one narrow projection computes (bucket, rho) per row, a
    groupBy(keys, bucket) max collapses to <= m register rows per key
    (map-side combinable — the shuffle carries registers, not values),
    then a per-key fold over the dense register vector produces the
    estimate. At 100 TB the state per key is m small ints regardless of
    cardinality — the entire point of the sketch.

    Emits (keys..., hll_est double). Estimate error ~ 1.04/sqrt(m).
    """
    return hll_estimate(hll_registers(df, key_cols, value_col, m),
                        key_cols, m)


def cms_buckets(term: Column, row: int, w: int) -> Column:
    """Count-min bucket of `term` for hash row `row` (md5-derived)."""
    return hex_to_long(F.md5(F.concat(F.lit(f"{row}:"), term)), 1, 4) % w


def cms_sketch(terms: DataFrame, d: int = 3, w: int = 256,
               term_col: str = "term") -> DataFrame:
    """The d*w counter build of the count-min sketch: one (row, bucket)
    pair per term occurrence, map-side-combined into at most d*w
    counter rows. A plain keyed count, so the SAME expressions run
    unchanged as an update-mode streaming aggregate (parity test in
    tests/test_streaming.py) — the live-frequency sketch a pipeline
    maintains over an event feed, mergeable across partitions/workers
    by counter addition. Emits (row, bucket, cnt).
    """
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    return (terms.select(F.col(term_col).alias("term"), rows)
            .withColumn("bucket",
                        hex_to_long(F.md5(F.concat_ws(":", "row", "term")),
                                    1, 4) % w)
            .groupBy("row", "bucket").agg(F.count("*").alias("cnt")))


def cms_term_estimates(docs: DataFrame, d: int = 3, w: int = 256,
                       text_col: str = "text") -> DataFrame:
    """Count-min sketch over corpus term frequencies, joined back to the
    true counts to expose the overcount (always >= 0 by construction).

    The sketch itself is d*w counters — at 100 TB the explode shuffles
    one (row, bucket) pair per token occurrence with map-side combine,
    so the reduce side sees at most d*w*partitions rows; the estimate
    join broadcasts the d*w-row sketch. Emits (term, true_cnt, cms_est,
    overcount) for every distinct term.
    """
    terms = docs.select(F.explode(word_tokens(F.col(text_col))).alias("term"))
    truth = terms.groupBy("term").agg(F.count("*").alias("true_cnt"))
    sketch = cms_sketch(terms, d, w)
    est = truth
    for i in range(d):
        row_counts = (sketch.filter(F.col("row") == i)
                      .select(F.col("bucket").alias(f"b{i}"),
                              F.col("cnt").alias(f"c{i}")))
        est = (est.withColumn(f"b{i}", cms_buckets(F.col("term"), i, w))
               .join(F.broadcast(row_counts), f"b{i}"))
    cms = F.least(*[F.col(f"c{i}") for i in range(d)]).alias("cms_est")
    return est.select("term", "true_cnt", cms,
                      (cms - F.col("true_cnt")).alias("overcount"))


def cms_heavy_hitters(docs: DataFrame, k: int = 10, d: int = 3,
                      w: int = 256, text_col: str = "text") -> DataFrame:
    """Heavy hitters from the count-min sketch: the k terms with the
    highest ESTIMATED frequency, with the per-estimate error bound —
    the query a CMS actually exists to answer (frequent-token /
    frequent-URL reports without a full exact term table).

    err_bound is the Markov bound floor(2N/w) on a single hash row's
    overcount (P[over > 2N/w] < 1/2 per row, so < 2^-d after the
    d-row min); overcount joins the true count to show the realized
    error, always 0 <= overcount <= est.

    Dataflow on top of ``cms_term_estimates``'s judged sketch: the
    global top-k is orderBy+limit — Spark plans TakeOrderedAndProject
    (per-partition top-k, merge k*partitions rows on the driver side
    of the exchange), never a full vocabulary sort — then a window
    ranks only the k survivor rows. N rides in as a 1-row broadcast
    (the text_bm25 global-stats shape). Emits
    (est_rank, term, cms_est, true_cnt, overcount, err_bound).
    """
    est = cms_term_estimates(docs, d, w, text_col)
    tot = est.agg(F.sum("true_cnt").alias("_n"))
    top = est.orderBy(F.desc("cms_est"), F.asc("term")).limit(k)
    rw = W.orderBy(F.desc("cms_est"), F.asc("term"))
    return (top.crossJoin(F.broadcast(tot))
            .withColumn("est_rank", F.row_number().over(rw))
            .select("est_rank", "term", "cms_est", "true_cnt", "overcount",
                    F.floor(2 * F.col("_n") / w).alias("err_bound")))


def cdc_chunks(docs: DataFrame, window: int = 4, divisor: int = 16,
               text_col: str = "text") -> DataFrame:
    """Content-defined chunking: split each document at positions where
    the rolling hash of the last `window` tokens is 0 mod `divisor`.

    Content-defined (not fixed-size) boundaries survive insertions —
    an edit only reflows the chunk it touches, so chunk-level dedup
    across document versions still hits. Expected chunk length is
    `divisor` tokens.

    Per-token work is a narrow expression over the doc's own token
    array (no self-join); chunk assembly is one groupBy(doc, chunk) of
    (pos, token) rows — linear shuffle. Emits one row per chunk:
    (doc_id, chunk_id, n_tokens, chunk_hash).
    """
    toks = docs.select("doc_id", word_tokens(F.col(text_col)).alias("tokens"))
    pe = toks.select("doc_id", F.posexplode("tokens").alias("idx", "tok"),
                     F.col("tokens"))
    pos = F.col("idx") + 1  # 1-based
    start = F.greatest(pos - (window - 1), F.lit(1))
    gram = F.concat_ws(" ", F.slice(F.col("tokens"), start, pos - start + 1))
    bnd = (hex_to_long(F.md5(gram), 1, 15) % divisor == 0).cast("int")
    marked = pe.select("doc_id", pos.alias("pos"), "tok", bnd.alias("bnd"))
    # chunk id = boundaries strictly before this position (a boundary
    # token ENDS its chunk); running count via an exclusive-frame window
    w_prev = (W.partitionBy("doc_id").orderBy("pos")
              .rowsBetween(W.unboundedPreceding, -1))
    chunked = marked.withColumn(
        "chunk_id", F.lit(1) + F.coalesce(F.sum("bnd").over(w_prev), F.lit(0)))
    return (chunked.groupBy("doc_id", "chunk_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.concat_ws(" ", F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                     lambda s: s["tok"])).alias("chunk_text"))
            .select("doc_id", "chunk_id", "n_tokens",
                    F.md5(F.col("chunk_text")).alias("chunk_hash")))


def duplicate_chunks(chunks: DataFrame) -> DataFrame:
    """Cross-document duplicate chunks from `cdc_chunks` output: chunks
    whose text hash recurs, with the keeper occurrence (lowest doc,
    then lowest chunk id). Shuffles 16-byte hashes, not chunk text.

    The keeper argmin is packed into one BIGINT (doc_id << 32 | chunk)
    instead of min(struct(...)) — struct aggregation buffers knock the
    groupBy out of HashAggregate into SortAggregate (see the plan guard
    in tests/test_plans.py); a long min keeps the hash path.

    Packing bounds: doc_id < 2^31 and chunk_id < 2^32 (a single doc
    would need ~69 G tokens at the default divisor to overflow the
    chunk half; the doc half is a standard 31-bit id domain). Outside
    those bounds the packed argmin would silently corrupt — re-key
    docs or chunk coarser before this operator rather than widening
    past 63 bits."""
    packed = F.min(F.shiftleft(F.col("doc_id"), 32) + F.col("chunk_id"))
    return (chunks.groupBy("chunk_hash")
            .agg(F.count("*").alias("n_copies"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 packed.alias("keep_key"))
            .filter(F.col("n_copies") > 1)
            .select("chunk_hash", "n_copies", "n_docs",
                    F.shiftright(F.col("keep_key"), 32).alias("keep_doc_id"),
                    (F.col("keep_key") % F.lit(1 << 32)).alias("keep_chunk_id")))
