"""Similarity search over an embedding column (array<float>).

Two tiers:
- brute-force cosine top-k: exact baseline, O(|Q| * N) — fine when the
  query set is small; the cross join broadcasts the query side so the
  corpus never shuffles.
- LSH-bucketed ANN: random-hyperplane signatures (sign of dot with
  deterministic md5-derived hyperplanes) bucket the corpus; search only
  same-bucket candidates. At 100 TB the bucket join replaces the cross
  join: corpus shuffles once on the bucket id, queries broadcast.

All vector math is built-in higher-order functions (zip_with/aggregate)
running JVM-side — no Python in the hot path. ``functions.scalars.dot``
is a strict in-order left fold so results are bit-identical to a
sequential oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from demo_apache_flink_streaming_mode_spark.functions.scalars import cosine_similarity


def hyperplane(plane_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component list.

    component(j, i) = (int(md5(f"{j}_{i}")[:8], 16) % 1000) / 1000 - 0.5
    — reproducible in any engine with md5 (the DuckDB oracle computes the
    identical values in SQL).
    """
    out = []
    for i in range(dim):
        h = hashlib.md5(f"{plane_idx}_{i}".encode()).hexdigest()
        out.append((int(h[:8], 16) % 1000) / 1000 - 0.5)
    return out


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-signature bucket id from the given hyperplanes (int)."""
    bucket = F.lit(0)
    for j, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in p]),
                       lambda v, w: v.cast("double") * w),
            F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket.cast("long")


def topk_bruteforce(queries: DataFrame, corpus: DataFrame, k: int,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Ties broken by candidate id for full determinism.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      cosine_similarity(F.col("qv"), F.col("cv")).alias("cos_sim")))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cos_sim"))


def topk_lsh(queries: DataFrame, corpus: DataFrame, k: int,
             num_planes: int = 6, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket.

    Approximate — recall depends on num_planes; the scale path where the
    brute-force cross join is infeasible. Bucket assignment is a narrow
    per-row expression; the candidate join is an equi-join on bucket.
    """
    planes = [hyperplane(j, dim) for j in range(num_planes)]
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                       lsh_bucket(F.col(vec_col), planes).alias("bucket"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
                      lsh_bucket(F.col(vec_col), planes).alias("bucket"))
    scored = (F.broadcast(q).join(c, "bucket")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      cosine_similarity(F.col("qv"), F.col("cv")).alias("cos_sim")))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cos_sim"))


def cosine_near_dup_pairs(vecs: DataFrame, threshold: float,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold).

    Brute-force all-pairs — correct baseline; at scale run it behind
    ``lsh_bucket`` blocking (same bucket only), which is what
    ``topk_lsh`` demonstrates.
    """
    a = vecs.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = vecs.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (a.join(b, F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b",
                    cosine_similarity(F.col("va"), F.col("vb")).alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))
