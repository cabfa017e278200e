"""Round-3 scale-operator queries with DuckDB twins.

HLL distinct (global + windowed) over ``events``, count-min term
frequencies, content-defined chunk dedup, and PII redaction over
``documents``, plus exact per-group quantiles. Every oracle reproduces
the Spark math bit-for-bit: md5-derived hashes, integer bit arithmetic,
and an exact DECIMAL register sum (see operators/sketches.py docstring
for why no float accumulation or libm call appears on either side).

The oracles deliberately use per-document list comprehensions where the
Spark side uses windows — the oracle only has to be CORRECT at the
driver's sf0.01, while the Spark plan has to scale; asymmetry here is
a feature, not drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_apache_flink_streaming_mode_spark.functions.scalars import hex_to_long
from demo_apache_flink_streaming_mode_spark.operators import graph, sketches, text
from demo_apache_flink_streaming_mode_spark.plans.base import Query
from demo_apache_flink_streaming_mode_spark.sources.batch import load_table

HLL_M = sketches.HLL_M
CMS_D, CMS_W = 3, 256
HH_K = 10               # heavy-hitter report size
CDC_WINDOW, CDC_DIVISOR = 4, 16

# inlined float literals: repr() round-trips, so DuckDB parses the bits
_HLL_SCALE = sketches.HLL_ALPHA * HLL_M * HLL_M
_POW2_61 = float(1 << 61)

_TOKENS = "list_filter(string_split(trim(text), ' '), t -> t <> '')"


# --- Spark queries -------------------------------------------------------

def sketch_hll_users(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"))
    est = sketches.hll_distinct(ev, ["event_type"], "user_id", m=HLL_M)
    return exact.join(est, "event_type").select("event_type", "n_exact", "hll_est")


def sketch_hll_merge(spark, sf_dir):
    """HLL union semantics, proven end-to-end: registers built per
    (event_type, half-of-data) and max-merged across halves must give
    EXACTLY the direct whole-data estimate — the associative property
    that makes the sketch map-side-combinable and lets sub-sketches
    from different partitions/days/workers union without re-reading
    rows. The halves are an md5(event_id) split so both engines
    partition identically.
    """
    ev = load_table(spark, sf_dir, "events")
    half = (hex_to_long(F.md5(F.col("event_id").cast("string")), 1, 2)
            % 2).alias("half")
    part = sketches.hll_registers(
        ev.select("event_type", half, "user_id"),
        ["event_type", "half"], "user_id", m=HLL_M)
    merged_est = (sketches.hll_estimate(
        sketches.hll_merge(part, ["event_type"]), ["event_type"], m=HLL_M)
        .withColumnRenamed("hll_est", "hll_est_merged"))
    direct_est = sketches.hll_distinct(ev, ["event_type"], "user_id", m=HLL_M)
    return (direct_est.join(merged_est, "event_type")
            .select("event_type", "hll_est", "hll_est_merged"))


def sketch_cms_terms(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return sketches.cms_term_estimates(docs, d=CMS_D, w=CMS_W)


def sketch_cms_heavy_hitters(spark, sf_dir):
    """Top-HH_K terms by ESTIMATED frequency with the floor(2N/w)
    Markov error bound and the realized overcount — the report a CMS
    exists to produce (see operators.sketches.cms_heavy_hitters for
    the TakeOrderedAndProject top-k shape)."""
    docs = load_table(spark, sf_dir, "documents")
    return sketches.cms_heavy_hitters(docs, k=HH_K, d=CMS_D, w=CMS_W)


def _chunks(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return sketches.cdc_chunks(docs, window=CDC_WINDOW, divisor=CDC_DIVISOR)


def text_cdc_chunks(spark, sf_dir):
    return (_chunks(spark, sf_dir)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_chunks"),
                 F.max("n_tokens").alias("max_chunk_tokens"),
                 F.countDistinct("chunk_hash").alias("n_distinct_chunks")))


def dedup_cdc_chunks(spark, sf_dir):
    return sketches.duplicate_chunks(_chunks(spark, sf_dir))


def sketch_hll_windowed(spark, sf_dir):
    """Tumbling-window HLL: distinct users per (event_type, hour).

    The register aggregation (`hll_registers`) is the streaming-safe
    part — the same expressions run as an update-mode streaming agg
    (parity test in tests/test_streaming.py); batch continues into the
    estimate fold.
    """
    ev = load_table(spark, sf_dir, "events")
    evw = (ev.select("event_type", "user_id", F.window("ts", "1 hour").alias("w"))
           .select("event_type", "user_id",
                   F.unix_millis(F.col("w.start")).alias("window_start")))
    exact = evw.groupBy("event_type", "window_start").agg(
        F.countDistinct("user_id").alias("n_exact"))
    est = sketches.hll_distinct(evw, ["event_type", "window_start"], "user_id",
                                m=HLL_M)
    return (exact.join(est, ["event_type", "window_start"])
            .select("event_type", "window_start", "n_exact", "hll_est"))


PII_MOD = 10  # every 10th doc (md5-picked) gets synthetic PII injected


def text_pii_redact(spark, sf_dir):
    """PII count + redaction over a deterministically PII-seeded corpus.

    The test corpus contains no PII, so the query first injects a
    synthetic email + phone into an md5-picked ~10% of docs (a
    self-contained fixture, reproduced identically by the oracle), then
    runs the redaction operator — which therefore demonstrably finds
    and strips real matches rather than counting zeros.
    """
    docs = load_table(spark, sf_dir, "documents")
    picked = (hex_to_long(F.md5(F.concat(F.lit("pii:"),
                                         F.col("doc_id").cast("string"))))
              % PII_MOD == 0)
    injected = F.concat(
        F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    seeded = docs.withColumn("text", F.when(picked, injected)
                             .otherwise(F.col("text")))
    return text.pii_redact(seeded)


def corpus_report(spark, sf_dir):
    """Curation dashboard: per (source, lang) doc counts, kept-doc
    counts after corpus_clean decisions, and mean quality score — the
    rollup a data curator reads before shipping a training mix.

    The mean floors each quality score to exact integer micro-units
    before summing — NOT a decimal(38,6) cast: for computed doubles
    (unlike the parquet-born decimals in the TPC-H sums) the
    decimal-cast rounding can differ across engines at a decimal
    midpoint (observed at sf0.001), while floor(x * 1e6) is exact IEEE
    on both sides and the integer sum is order-free. Kept docs are a
    filtered COUNT so both engines stay in BIGINT.
    """
    from demo_apache_flink_streaming_mode_spark.plans.queries_llm import (
        corpus_clean, text_quality)
    docs = load_table(spark, sf_dir, "documents")
    quality = text_quality(spark, sf_dir)
    decisions = corpus_clean(spark, sf_dir)
    joined = (docs.select("doc_id", "source", "lang")
              .join(quality, "doc_id").join(decisions, "doc_id"))
    return (joined.groupBy("source", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.count(F.when(F.col("decision") == "keep", 1))
                 .alias("n_kept"),
                 (F.sum(F.floor(F.col("quality") * F.lit(1e6))).cast("double")
                  / F.lit(1e6) / F.count("*")).alias("mean_quality")))


def events_value_quantiles(spark, sf_dir):
    """Exact p50/p95/p99 of event value per type.

    Spark's `percentile` and DuckDB's `quantile_cont` share the
    (n-1)*p linear-interpolation definition and match bit-for-bit on
    doubles (verified at sf0.01). Exact percentile state is O(group
    size) — fine for a bounded type dimension; the 100 TB path for
    high-cardinality keys is ``events_value_quantiles_approx`` below.
    """
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("p"))
            .select("event_type",
                    F.col("p")[0].alias("p50"),
                    F.col("p")[1].alias("p95"),
                    F.col("p")[2].alias("p99")))


APPROX_PCT_ACCURACY = 10_000  # 1/accuracy relative-rank error bound


def events_value_quantiles_approx(spark, sf_dir):
    """Sketched p50/p95/p99 per type — the high-cardinality path.

    ``approx_percentile`` keeps bounded per-group state (a
    KLL/GK-style summary of ~accuracy entries) regardless of group
    size, so it scales to key domains where exact percentile's
    O(group) buffer cannot. Deliberately NOT hash-oracled: sketch
    internals aren't cross-engine-reproducible. Instead
    tests/test_scale_ops.py asserts every approx value lands within
    the sketch's rank-error band of the exact oracle values.
    """
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.expr(f"approx_percentile(value, array(0.5, 0.95, 0.99), "
                        f"{APPROX_PCT_ACCURACY})").alias("p"))
            .select("event_type",
                    F.col("p")[0].alias("p50"),
                    F.col("p")[1].alias("p95"),
                    F.col("p")[2].alias("p99")))


PAGERANK_ITERS = 3
PAGERANK_DAMPING = 0.85


COOC_BUCKET_MS = 600_000  # 10-minute co-occurrence buckets (see r4 note)


def _cooccurrence_edges(spark, sf_dir):
    """Symmetric user co-occurrence edges: (src, dst) for every user
    pair sharing an (event_type, 10-minute-bucket) activity cell. The
    single source of the graph definition — the two graph queries AND
    the ``_COOC_CTES`` oracle prefix must stay in lockstep with it.
    Bucket width note (r4, measured): hourly buckets made the graph
    dense enough (~28 users/bucket at sf0.1) that the wedge join and
    per-round edge scans dominated the bench; 10-minute buckets keep
    degree bounded with the same semantics.
    """
    ev = load_table(spark, sf_dir, "events")
    b = (ev.select("user_id", "event_type",
                   F.expr(f"unix_millis(ts) div {COOC_BUCKET_MS}").alias("h"))
         .distinct())
    return (b.alias("a").join(b.alias("b"), ["event_type", "h"])
            .filter(F.col("a.user_id") != F.col("b.user_id"))
            .select(F.col("a.user_id").alias("src"),
                    F.col("b.user_id").alias("dst"))
            .distinct())


# the oracle twin of _cooccurrence_edges: CTEs b (buckets) and e (edges)
_COOC_CTES = f"""
        b AS (SELECT DISTINCT user_id, event_type,
                              epoch_ms(ts) // {COOC_BUCKET_MS} AS h
              FROM events),
        e AS (SELECT DISTINCT a.user_id AS u, bb.user_id AS v
              FROM b a JOIN b bb
                ON a.event_type = bb.event_type AND a.h = bb.h
               AND a.user_id <> bb.user_id)"""


def graph_pagerank(spark, sf_dir):
    """PageRank over the user co-occurrence graph
    (``_cooccurrence_edges`` — symmetric, so the operator's no-dangling
    contract holds). 3 deterministic rounds with in-neighbor-id-order
    contribution folds (see operators.graph).
    """
    return graph.pagerank(_cooccurrence_edges(spark, sf_dir),
                          iters=PAGERANK_ITERS, damping=PAGERANK_DAMPING)


def graph_triangles(spark, sf_dir):
    """Triangle count of the same user co-occurrence graph:
    degree-oriented (Suri–Vassilvitskii), wedge self-join at the
    source vertex, semi-close — each triangle counted exactly once and
    wedge fan-out bounded by the smaller endpoint degree (see
    operators.graph.triangle_count; the id-oriented SQL oracle stays
    valid because the count is orientation-invariant).
    """
    return graph.triangle_count(_cooccurrence_edges(spark, sf_dir))


def _pagerank_oracle(iters: int, damping: float) -> str:
    """Unrolled-iteration DuckDB twin of ``operators.graph.pagerank``
    over the co-occurrence edges: in-u-order contribution folds, all
    float arithmetic explicitly DOUBLE (DuckDB's bare numeric literals
    are DECIMAL), base term written with the exact Python double of
    (1 - damping)."""
    base = repr(1.0 - damping)
    ctes = [f"""{_COOC_CTES},
        verts AS (SELECT DISTINCT vertex FROM
                  (SELECT u AS vertex FROM e
                   UNION ALL SELECT v AS vertex FROM e)),
        nn AS (SELECT COUNT(*) AS n FROM verts),
        od AS (SELECT u, COUNT(*) AS odeg FROM e GROUP BY 1),
        pr0 AS (SELECT vertex, 1.0::DOUBLE / n::DOUBLE AS pr
                FROM verts CROSS JOIN nn)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""
        c{i} AS (SELECT e.v AS vertex, e.u, p.pr / od.odeg::DOUBLE AS c
                 FROM e JOIN od ON e.u = od.u
                 JOIN pr{i - 1} p ON p.vertex = e.u),
        s{i} AS (SELECT vertex, list_aggregate(list(c ORDER BY u), 'sum')
                     AS s
                 FROM c{i} GROUP BY 1),
        pr{i} AS (SELECT v.vertex,
                         {base}::DOUBLE / nn.n::DOUBLE
                         + {damping!r}::DOUBLE * coalesce(s.s, 0.0::DOUBLE)
                             AS pr
                  FROM verts v CROSS JOIN nn
                  LEFT JOIN s{i} s ON s.vertex = v.vertex)""")
    return f"""
        WITH {','.join(ctes)}
        SELECT vertex, pr AS pagerank FROM pr{iters}"""


def events_key_skew_report(spark, sf_dir):
    """Key-skew diagnostic for the shuffle key (user_id): per-key row
    counts, share of the table in ppm (exact integer div), and rank —
    the operational input to the salt-or-not decision
    (``operators.scale.salted_join``). Top 20 heaviest keys.

    One hash aggregation + a 20-row TakeOrdered — at 100 TB this is
    the cheapest possible full-table profile (map-side partials
    collapse each partition to its distinct keys).
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W
    total = ev.agg(F.count("*").alias("total"))  # 1-row broadcast side
    top = (ev.groupBy("user_id").agg(F.count("*").alias("n_rows"))
           .orderBy(F.col("n_rows").desc(), F.col("user_id"))
           .limit(20))  # TakeOrderedAndProject, never a global sort
    return (top.crossJoin(F.broadcast(total))
            .withColumn("share_ppm", F.expr("(1000000 * n_rows) div total"))
            # rank window runs over the 20 surviving rows only
            .withColumn("rank", F.row_number().over(
                W.orderBy(F.col("n_rows").desc(), F.col("user_id"))))
            .select("rank", "user_id", "n_rows", "share_ppm"))


def events_zorder_stats(spark, sf_dir):
    """Z-order (Morton) clustering audit — the layout analysis behind
    lakehouse OPTIMIZE ZORDER (``operators.scale.zorder_key`` /
    ``write_zordered``): interleave the bits of two dimensions
    (user bucket, hour-of-epoch bucket) into one key, cut the key
    space into 64 ranges (one range ~ one output file), and report
    each range's row count and min/max ENVELOPE on every dimension —
    the bounded envelopes are exactly why a Z-layout lets scans skip
    files on predicates over ANY dimension, where a plain sort only
    serves its leading column.  All integer bit math, so the oracle is
    exact; one hash aggregation on the 64 ranges.
    """
    from demo_apache_flink_streaming_mode_spark.operators.scale import (
        ZORDER_BITS, zorder_key)
    ev = load_table(spark, sf_dir, "events")
    d1 = F.pmod(F.col("user_id"), F.lit(256)).cast("long")
    d2 = F.pmod(F.expr("unix_millis(ts) div 3600000"), F.lit(256))
    z = zorder_key([d1, d2], bits=ZORDER_BITS)
    return (ev.select(d1.alias("d_user"), d2.alias("d_hour"),
                      z.alias("z"))
            .withColumn("z_range", F.expr("z div 1024"))
            .groupBy("z_range")
            .agg(F.count("*").alias("n_rows"),
                 F.min("z").alias("z_min"), F.max("z").alias("z_max"),
                 F.min("d_user").alias("user_min"),
                 F.max("d_user").alias("user_max"),
                 F.min("d_hour").alias("hour_min"),
                 F.max("d_hour").alias("hour_max")))


def orders_fingerprint(spark, sf_dir):
    """Order-insensitive table fingerprint — the migration-validation
    utility for exactly this engine's situation: prove two systems hold
    the SAME rows without moving them. Per row, md5 of a canonical
    '|'-joined rendering of the integer/string columns (doubles are
    excluded — float formatting is not portable across engines), folded
    to a 60-bit value and combined with ``bit_xor``: commutative, so
    no sort, no overflow, one map-side-combinable aggregate regardless
    of table size. Any single-row difference flips the checksum.
    """
    o = load_table(spark, sf_dir, "orders")
    s = F.concat_ws("|", F.col("o_orderkey"), F.col("o_custkey"),
                    F.col("o_orderstatus"), F.col("o_orderpriority"),
                    F.unix_millis("o_orderdate"))
    h = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    return (o.select(h.alias("h"))
            .agg(F.count("*").alias("n_rows"),
                 F.expr("bit_xor(h)").alias("checksum")))


# --- DuckDB oracles ------------------------------------------------------

# shared chunking CTEs: boundary flags per position, then chunk id as
# the count of boundaries strictly before the position (list math —
# quadratic per doc, fine at oracle scale)
_CDC_CTES = f"""
    toks AS (SELECT doc_id, {_TOKENS} AS tokens FROM documents),
    b AS (SELECT doc_id, tokens,
                 list_transform(range(1, len(tokens)+1), i -> CASE WHEN
                     ('0x' || substr(md5(array_to_string(
                         list_slice(tokens, greatest(i-{CDC_WINDOW - 1}, 1), i),
                         ' ')), 1, 15))::BIGINT % {CDC_DIVISOR} = 0
                     THEN 1 ELSE 0 END) AS bnd
          FROM toks),
    px AS (SELECT doc_id, tokens, bnd,
                  unnest(range(1, len(tokens)+1)) AS pos
           FROM b),
    ch AS (SELECT doc_id, pos, tokens[pos] AS tok,
                  1 + coalesce(list_sum(list_slice(bnd, 1, pos-1)), 0) AS chunk_id
           FROM px),
    chunks AS (SELECT doc_id, chunk_id, COUNT(*) AS n_tokens,
                      md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
               FROM ch GROUP BY 1, 2)"""

_FOOTER_TABLES = (
    # (table, first leaf / stats key column, leaf column count)
    ("region", "r_regionkey", 2), ("nation", "n_nationkey", 3),
    ("customer", "c_custkey", 5), ("supplier", "s_suppkey", 4),
    ("part", "p_partkey", 6), ("orders", "o_orderkey", 6),
    ("lineitem", "l_orderkey", 11), ("events", "event_id", 6),
    ("documents", "doc_id", 5), ("embeddings", "vec_id", 3),
)


def meta_parquet_footer(spark, sf_dir):
    """Manifest sweep via the FROM-SCRATCH Parquet footer reader: the
    planner's pruning pass as a judged query.

    A file-listing DataFrame (all ten testdata tables) flows through
    ``operators.parquet_meta.footer_report`` — per file, two tail
    range-reads and a from-scratch Thrift-compact decode of
    FileMetaData (schema leaves, row groups, first-column min/max/
    null-count statistics), zero data-plane I/O. The DuckDB oracle
    re-derives every reported number with DuckDB's OWN independent
    parquet reader + aggregates over the data itself: footer
    num_rows == COUNT(*), footer key stats == MIN/MAX/null count —
    so each green row proves the Thrift parse end to end against a
    second engine. pyarrow cross-checks the same fields in tests
    (a third independent reader)."""
    from demo_apache_flink_streaming_mode_spark.operators import (
        parquet_meta)
    listing = spark.createDataFrame(
        [(t, f"{sf_dir}/{t}.parquet") for t, _, _ in _FOOTER_TABLES],
        "table_name string, path string")
    return parquet_meta.footer_report(listing)


ORACLES_FOOTER = "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS table_name, COUNT(*) AS num_rows,
               {ncols} AS n_cols,
               CAST(MIN({key}) AS BIGINT) AS min_key,
               CAST(MAX({key}) AS BIGINT) AS max_key,
               COUNT(*) - COUNT({key}) AS null_count_key
        FROM {t}"""
    for t, key, ncols in _FOOTER_TABLES)


def _hll_oracle(key_exprs: str, key_names: list[str]) -> str:
    """DuckDB twin of hll_distinct + exact count over ``events``.

    ``key_exprs`` projects the grouping keys (may compute, e.g. a
    window start); ``key_names`` are their output aliases.
    """
    names = ", ".join(key_names)
    k_names = ", ".join(f"k.{n}" for n in key_names)
    on = " AND ".join(f"r.{n} = k.{n}" for n in key_names)
    return f"""
        WITH h AS (SELECT {key_exprs},
                          md5(CAST(user_id AS VARCHAR)) AS h FROM events),
        br AS (SELECT {names},
                      ('0x' || substr(h, 1, 2))::BIGINT % {HLL_M} AS bucket,
                      ('0x' || substr(h, 3, 15))::BIGINT AS v60
               FROM h),
        r AS (SELECT {names}, bucket,
                     MAX(CASE WHEN v60 = 0 THEN 61
                         ELSE 61 - length(bin(v60)) END) AS reg
              FROM br GROUP BY ALL),
        dense AS (SELECT {k_names}, g.bucket, coalesce(r.reg, 0) AS reg
                  FROM (SELECT DISTINCT {names} FROM r) k
                  CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS bucket) g
                  LEFT JOIN r ON {on} AND r.bucket = g.bucket),
        s AS (SELECT {names},
                     SUM(((1::BIGINT << (61 - reg)))::DECIMAL(38,0)) AS s_int
              FROM dense GROUP BY ALL),
        e AS (SELECT {key_exprs}, COUNT(DISTINCT user_id) AS n_exact
              FROM events GROUP BY ALL)
        SELECT {names}, e.n_exact,
               ({_HLL_SCALE!r} * {_POW2_61!r}) / s.s_int::DOUBLE AS hll_est
        FROM e JOIN s USING ({names})"""


def _hll_est_ctes(reg_cte: str, sfx: str) -> str:
    """Densify + exact-decimal-sum + estimate CTE chain over a
    (event_type, bucket, reg) register CTE, suffixed to allow two
    independent estimate folds in one query."""
    return f"""
        dense{sfx} AS (SELECT k.event_type, g.bucket,
                              coalesce(r.reg, 0) AS reg
                       FROM (SELECT DISTINCT event_type FROM {reg_cte}) k
                       CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS bucket) g
                       LEFT JOIN {reg_cte} r
                         ON r.event_type = k.event_type
                        AND r.bucket = g.bucket),
        s{sfx} AS (SELECT event_type,
                          SUM(((1::BIGINT << (61 - reg)))::DECIMAL(38,0))
                              AS s_int
                   FROM dense{sfx} GROUP BY 1),
        est{sfx} AS (SELECT event_type,
                            ({_HLL_SCALE!r} * {_POW2_61!r}) / s_int::DOUBLE
                                AS est
                     FROM s{sfx})"""


_HLL_MERGE_ORACLE = f"""
    WITH h AS (SELECT event_type,
                      ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2)
                      )::BIGINT % 2 AS half,
                      md5(CAST(user_id AS VARCHAR)) AS hu
               FROM events),
    br AS (SELECT event_type, half,
                  ('0x' || substr(hu, 1, 2))::BIGINT % {HLL_M} AS bucket,
                  ('0x' || substr(hu, 3, 15))::BIGINT AS v60
           FROM h),
    rp AS (SELECT event_type, half, bucket,
                  MAX(CASE WHEN v60 = 0 THEN 61
                      ELSE 61 - length(bin(v60)) END) AS reg
           FROM br GROUP BY ALL),
    rm AS (SELECT event_type, bucket, MAX(reg) AS reg FROM rp GROUP BY ALL),
    rd AS (SELECT event_type, bucket,
                  MAX(CASE WHEN v60 = 0 THEN 61
                      ELSE 61 - length(bin(v60)) END) AS reg
           FROM br GROUP BY ALL),{_hll_est_ctes('rd', '_d')},{_hll_est_ctes('rm', '_m')}
    SELECT d.event_type, d.est AS hll_est, m.est AS hll_est_merged
    FROM est_d d JOIN est_m m USING (event_type)"""


ORACLES: dict[str, str] = {
    "sketch_hll_users": _hll_oracle("event_type", ["event_type"]),
    "sketch_hll_merge": _HLL_MERGE_ORACLE,
    "sketch_hll_windowed": _hll_oracle(
        "event_type, (epoch_ms(ts) // 3600000) * 3600000 AS window_start",
        ["event_type", "window_start"]),
    "sketch_cms_terms": f"""
        WITH t AS (SELECT unnest({_TOKENS}) AS term FROM documents),
        truth AS (SELECT term, COUNT(*) AS true_cnt FROM t GROUP BY 1),
        pairs AS (SELECT term, unnest(range(0, {CMS_D})) AS row FROM t),
        sk AS (SELECT row,
                      ('0x' || substr(md5(row::VARCHAR || ':' || term), 1, 4)
                      )::BIGINT % {CMS_W} AS bucket,
                      COUNT(*) AS cnt
               FROM pairs GROUP BY 1, 2),
        v AS (SELECT term, true_cnt,
                     ('0x' || substr(md5('0:' || term), 1, 4))::BIGINT
                         % {CMS_W} AS b0,
                     ('0x' || substr(md5('1:' || term), 1, 4))::BIGINT
                         % {CMS_W} AS b1,
                     ('0x' || substr(md5('2:' || term), 1, 4))::BIGINT
                         % {CMS_W} AS b2
              FROM truth)
        SELECT v.term, v.true_cnt,
               least(s0.cnt, s1.cnt, s2.cnt) AS cms_est,
               least(s0.cnt, s1.cnt, s2.cnt) - v.true_cnt AS overcount
        FROM v
        JOIN sk s0 ON s0.row = 0 AND s0.bucket = v.b0
        JOIN sk s1 ON s1.row = 1 AND s1.bucket = v.b1
        JOIN sk s2 ON s2.row = 2 AND s2.bucket = v.b2""",
    "text_pii_redact": f"""
        WITH seeded AS (
          SELECT doc_id,
                 CASE WHEN ('0x' || substr(md5('pii:' || doc_id::VARCHAR),
                                           1, 15))::BIGINT % {PII_MOD} = 0
                      THEN text || ' contact user' || doc_id::VARCHAR
                           || '@example.com or +1-555-'
                           || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                      ELSE text END AS text
          FROM documents)
        SELECT doc_id,
               len(regexp_extract_all(text, '{text.PII_EMAIL}')) AS n_emails,
               len(regexp_extract_all(text, '{text.PII_PHONE}')) AS n_phones,
               md5(regexp_replace(
                   regexp_replace(text, '{text.PII_EMAIL}', '<EMAIL>', 'g'),
                   '{text.PII_PHONE}', '<PHONE>', 'g')) AS redacted_hash
        FROM seeded""",
    "corpus_report": None,  # assigned below (composes queries_llm oracles)
    "graph_pagerank": _pagerank_oracle(PAGERANK_ITERS, PAGERANK_DAMPING),
    "graph_triangles": f"""
        WITH {_COOC_CTES},
        und AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS bb
                FROM e)
        SELECT COUNT(*) AS n_triangles
        FROM und e1 JOIN und e2 ON e1.bb = e2.a
        WHERE EXISTS (SELECT 1 FROM und e3
                      WHERE e3.a = e1.a AND e3.bb = e2.bb)""",
    "orders_fingerprint": """
        WITH h AS (
          SELECT ('0x' || substr(md5(concat_ws('|',
                     o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
                     epoch_ms(o_orderdate))), 1, 15))::BIGINT AS h
          FROM orders)
        SELECT COUNT(*) AS n_rows, bit_xor(h) AS checksum FROM h""",
    "events_value_quantiles": """
        SELECT event_type,
               quantile_cont(value, 0.5)  AS p50,
               quantile_cont(value, 0.95) AS p95,
               quantile_cont(value, 0.99) AS p99
        FROM events GROUP BY 1""",
    "text_cdc_chunks": f"""
        WITH {_CDC_CTES}
        SELECT doc_id, COUNT(*) AS n_chunks,
               MAX(n_tokens) AS max_chunk_tokens,
               COUNT(DISTINCT chunk_hash) AS n_distinct_chunks
        FROM chunks GROUP BY 1""",
    "dedup_cdc_chunks": f"""
        WITH {_CDC_CTES}
        SELECT chunk_hash, COUNT(*) AS n_copies,
               COUNT(DISTINCT doc_id) AS n_docs,
               (MIN((doc_id << 32) + chunk_id) // 4294967296)::BIGINT
                   AS keep_doc_id,
               (MIN((doc_id << 32) + chunk_id) % 4294967296)::BIGINT
                   AS keep_chunk_id
        FROM chunks GROUP BY 1 HAVING COUNT(*) > 1""",
}

def _llm_oracles() -> dict[str, str]:
    from demo_apache_flink_streaming_mode_spark.plans import queries_llm
    return queries_llm.ORACLES


# heavy hitters on top of the judged sketch oracle (embedded verbatim
# so the two cannot drift); INT cast matches Spark row_number's int
ORACLES["sketch_cms_heavy_hitters"] = f"""
    WITH est AS ({ORACLES["sketch_cms_terms"]}),
    n AS (SELECT SUM(true_cnt) AS _n FROM est),
    top AS (SELECT * FROM est ORDER BY cms_est DESC, term ASC LIMIT {HH_K})
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cms_est DESC, term ASC) AS INT)
               AS est_rank,
           term, cms_est, true_cnt, overcount,
           CAST(FLOOR(2 * _n / {CMS_W}) AS BIGINT) AS err_bound
    FROM top CROSS JOIN n"""

ORACLES["corpus_report"] = f"""
    WITH q AS ({_llm_oracles()['text_quality']}),
    d AS ({_llm_oracles()['corpus_clean']})
    SELECT s.source, s.lang, COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE d.decision = 'keep') AS n_kept,
           SUM(FLOOR(q.quality * 1000000.0))::DOUBLE / 1000000.0 / COUNT(*)
               AS mean_quality
    FROM documents s
    JOIN q USING (doc_id)
    JOIN d USING (doc_id)
    GROUP BY 1, 2"""

ORACLES["events_key_skew_report"] = """
    WITH counts AS (
      SELECT user_id, count(*) AS n_rows FROM events GROUP BY 1),
    t AS (SELECT count(*) AS total FROM events),
    top AS (
      SELECT user_id, n_rows,
             row_number() OVER (ORDER BY n_rows DESC, user_id) AS rank
      FROM counts)
    SELECT rank, user_id, n_rows, (1000000 * n_rows) // total AS share_ppm
    FROM top CROSS JOIN t WHERE rank <= 20"""

# Morton interleave as unrolled integer bit ops — identical expression
# shape to operators.scale.zorder_key
_Z_EXPR = " | ".join(
    f"(((d{d + 1} >> {b}) & 1) << {b * 2 + d})"
    for b in range(8) for d in range(2))

ORACLES["events_zorder_stats"] = f"""
    WITH dims AS (
      SELECT user_id % 256 AS d1,
             (epoch_ms(ts) // 3600000) % 256 AS d2
      FROM events),
    zed AS (SELECT d1 AS d_user, d2 AS d_hour, {_Z_EXPR} AS z FROM dims)
    SELECT z // 1024 AS z_range,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(z) AS z_min, max(z) AS z_max,
           min(d_user) AS user_min, max(d_user) AS user_max,
           min(d_hour) AS hour_min, max(d_hour) AS hour_max
    FROM zed GROUP BY 1"""

QUERIES = [
    Query("sketch_hll_users", sketch_hll_users, ORACLES["sketch_hll_users"],
          "HyperLogLog distinct-user estimate per event type (m=64, exact "
          "decimal register sum) vs exact count"),
    Query("sketch_cms_terms", sketch_cms_terms, ORACLES["sketch_cms_terms"],
          "count-min sketch term frequencies (d=3, w=256) vs true counts"),
    Query("sketch_cms_heavy_hitters", sketch_cms_heavy_hitters,
          ORACLES["sketch_cms_heavy_hitters"],
          "top-k estimated-frequency terms with floor(2N/w) error bound"),
    Query("sketch_hll_merge", sketch_hll_merge, ORACLES["sketch_hll_merge"],
          "HLL register-max union across data halves == direct estimate"),
    Query("text_cdc_chunks", text_cdc_chunks, ORACLES["text_cdc_chunks"],
          "content-defined chunking (rolling-hash boundaries) per-doc stats"),
    Query("dedup_cdc_chunks", dedup_cdc_chunks, ORACLES["dedup_cdc_chunks"],
          "cross-document duplicate chunk groups from CDC chunking"),
    Query("events_value_quantiles", events_value_quantiles,
          ORACLES["events_value_quantiles"],
          "exact p50/p95/p99 per event type (interpolation parity)"),
    Query("events_value_quantiles_approx", events_value_quantiles_approx,
          None,  # sketch internals aren't cross-engine; banded pytest instead
          "approx_percentile p50/p95/p99 (bounded state, high-cardinality path)"),
    Query("sketch_hll_windowed", sketch_hll_windowed,
          ORACLES["sketch_hll_windowed"],
          "tumbling-window HLL distinct users (streaming-safe registers)"),
    Query("text_pii_redact", text_pii_redact, ORACLES["text_pii_redact"],
          "PII count + redaction (self-seeded fixture, shuffle-free map)"),
    Query("corpus_report", corpus_report, ORACLES["corpus_report"],
          "per-(source, lang) curation dashboard: docs, kept, mean quality"),
    Query("orders_fingerprint", orders_fingerprint,
          ORACLES["orders_fingerprint"],
          "order-insensitive bit_xor table checksum (migration validation)"),
    Query("events_zorder_stats", events_zorder_stats,
          ORACLES["events_zorder_stats"],
          "Z-order (Morton) clustering audit: per-z-range row counts + "
          "min/max envelopes on every dimension"),
    Query("events_key_skew_report", events_key_skew_report,
          ORACLES["events_key_skew_report"],
          "key-skew diagnostic: top-20 heaviest shuffle keys with ppm "
          "share (input to the salt-or-not decision)"),
    Query("graph_pagerank", graph_pagerank, ORACLES["graph_pagerank"],
          "PageRank over the user co-occurrence graph (3 exact rounds)"),
    Query("graph_triangles", graph_triangles, ORACLES["graph_triangles"],
          "triangle count (oriented wedge join + semi-close)"),
    Query("meta_parquet_footer", meta_parquet_footer, ORACLES_FOOTER,
          "manifest sweep: from-scratch Thrift-compact Parquet footer "
          "parse (rows, schema leaves, key min/max/null stats) judged "
          "against DuckDB's own parquet reader"),
]
