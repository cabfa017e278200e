"""Skew-mitigation utilities for the 100 TB design point.

AQE's runtime skew-join splitting (``spark.sql.adaptive.skewJoin``, on
in session.py) is the first line of defense and needs no code. These
helpers cover the cases AQE can't fix:

- a *single* join key so hot that even a split partition's build side
  overflows (salted_join replicates the build side per salt bucket, so
  the hot key's probe rows spread over ``buckets`` tasks);
- deterministic plans where runtime re-optimization is disabled.

Results are bitwise-identical to the unsalted equivalents: salting only
re-routes rows; multiplicity and values are untouched.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, functions as F

RELIABLE_CHECKPOINT_CONF = "spark.graft.reliableCheckpoint"
DETERMINISTIC_FOLDS_CONF = "spark.graft.deterministicFolds"


def deterministic_folds(df: DataFrame) -> bool:
    """Session switch for the iterative trainers' float reductions
    (k-means / PQ codebook means, PageRank contribution sums).

    - true (default): explicit in-id-order ``collect_list`` +
      ``F.aggregate`` left folds — bit-exact across engines, runs, and
      partitionings (the oracle-parity path), but buffers each group's
      values, O(group size) at a hot cell / hub vertex.
    - false: plain ``avg``/``sum`` — map-side combinable partial
      aggregation, bounded executor memory at any key skew (the
      production path at 100 TB), nondeterministic only in the last
      ulp of the double sum.

    The two paths are tied together by tolerance tests
    (``tests/test_scale_ops.py``); flip the conf off for production
    training jobs where a popular cell would make a ``collect_list``
    buffer the straggler.
    """
    return (df.sparkSession.conf.get(DETERMINISTIC_FOLDS_CONF, "true")
            .lower() == "true")


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize an iterative-op intermediate and cut its lineage.

    Iterative operators (connected components, Lloyd's k-means)
    re-reference their round-N result; without a checkpoint the plan
    replays rounds 1..N-1 per reference. Two modes, chosen by the
    session conf ``spark.graft.reliableCheckpoint`` (default false):

    - false: ``localCheckpoint`` — blocks cached on executors. Fast
      (no FS round-trip) and right for local mode or static clusters,
      but the lineage is GONE: losing an executor (dynamic allocation,
      spot kill) makes the blocks unrecoverable mid-job.
    - true: reliable ``checkpoint()`` — writes to the SparkContext
      checkpoint dir (set ``sc.setCheckpointDir`` to durable shared
      storage on a real cluster; a local temp dir is auto-provisioned
      here if unset so the switch is testable). Survives executor
      loss; the cluster-safe choice for long jobs at 100 TB.
    """
    spark = df.sparkSession
    if spark.conf.get(RELIABLE_CHECKPOINT_CONF, "false").lower() != "true":
        return df.localCheckpoint()
    sc = spark.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(tempfile.mkdtemp(prefix="graft_ckpt_"))
    return df.checkpoint()


def salted_join(left: DataFrame, right: DataFrame, on: str, buckets: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join with the LEFT side's hot keys spread over salt buckets.

    Left rows get a deterministic per-row salt (xxhash64 over the whole
    row, mod ``buckets``); the right side is replicated once per salt
    value (an ``explode`` of a ``buckets``-element literal array — a
    narrow map, no shuffle). The join key becomes (on, salt), so one hot
    key's rows land in ``buckets`` distinct shuffle partitions instead
    of one straggler task. Cost: right side shuffles ``buckets``x its
    size — use for big-probe/small-build joins where the build side is
    too big to broadcast but replicating it is still cheap.

    Row multiplicity is exactly that of the plain join (each left row
    matches the single right replica carrying its salt). Supports
    inner/left only — under right/full the replicas would surface as
    spurious unmatched rows.

    The replicated side carries a ``shuffle_hash`` hint: post-explode
    size estimates are unreliable and Catalyst may otherwise pick a
    broadcast, which would defeat the point of salting.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    lsalt = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                         F.lit(buckets)).cast("int"))
    rsalt = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    return lsalt.join(rsalt.hint("shuffle_hash"), [on, "__salt"], how).drop("__salt")


def write_bucketed(df: DataFrame, name: str, key: str, buckets: int = 8,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) catalog
    table so repeated joins/aggregations on ``key`` are co-located.

    The 100 TB rationale: a fact table that joins on the same key in
    every pipeline run (orders x lineitem on orderkey, embeddings x
    assignments on vec_id) pays one bucketed write, after which every
    join between same-bucketed tables runs with NO shuffle exchange on
    either side — Spark matches bucket files pairwise. ``sort=True``
    additionally pre-sorts within buckets so sort-merge joins skip the
    per-task sort. This is Spark's answer to the reference's keyed
    partitioning contract (keyBy pins a key to an operator instance;
    bucketing pins it to a file): declare the layout once, let every
    downstream plan exploit it.

    tests/test_bucketing.py asserts the no-Exchange plan and value
    parity with the unbucketed join.

    The write repartitions on the key into exactly ``buckets`` tasks
    first: Spark's reader only trusts a bucket's sort order (and so
    skips the SMJ's per-task Sort) when each bucket is a SINGLE file,
    which requires each writer task to hold exactly one bucket's rows
    (repartition and bucketing share the same Murmur3 pmod placement).
    """
    w = (df.repartition(buckets, F.col(key))
         .write.format("parquet").mode(mode).bucketBy(buckets, key))
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(name)
