"""Grouping, aggregation and time windows (SURVEY.md §2.4, A1-A7).

The reference expresses every aggregate as a binary ReduceFunction over
keyed/windowed streams; here each becomes a declarative groupBy + built-in
aggregate so Spark plans partial (map-side) aggregation before the
shuffle — the scalable form of Flink's incremental reduce.

Scale notes (100 TB design point):
- groupBy keys here (user_id, event_type, window buckets) are
  low-cardinality or time-bucketed -> partial aggregation collapses
  almost everything map-side; the shuffle moves only (key, window)
  partial states, not rows.
- The per-row window functions (running totals) partition by user_id:
  at 100 TB that is a single shuffle on a well-distributed key; skewed
  users are handled by AQE skew-join/salting at the query layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from demo_apache_flink_streaming_mode_spark.functions.scalars import decimal_sum, epoch_ms


def running_total(df: DataFrame, key: str, order: list[str], value: str,
                  out: str = "running_sum") -> DataFrame:
    """A2 — per-key running aggregate emitting an updated total per record.

    Reference: keyed reduce that re-emits the running SUM on every input
    record (``chapter2/KeyedStreamOperations.java:64-84``). Batch twin: an
    unbounded-preceding window sum in event order. The decimal cast keeps
    the running double sum exact/order-independent (oracle hash match).
    """
    w = (W.partitionBy(key).orderBy(*order)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return df.withColumn(
        out, F.sum(F.col(value).cast("decimal(38,6)")).over(w).cast("double"))


def tumbling_count(df: DataFrame, ts: str, width: str,
                   keys: list[str] | None = None) -> DataFrame:
    """A3/A4 — tumbling-window count, global (no keys) or keyed.

    Reference: ``timeWindowAll(3s)+reduce`` (``common/MapCountPrinter.java:
    12-34``) and ``keyBy(user,action).timeWindow(10s).reduce``
    (``chapter6_exercise/AnalyzeBrowserEvents.java:83-96``).
    """
    groups = [F.window(ts, width).alias("w")] + [F.col(k) for k in (keys or [])]
    return (df.groupBy(*groups)
            .agg(F.count("*").alias("n"))
            .select(*(keys or []),
                    F.unix_millis(F.col("w.start")).alias("window_start"), "n"))


def sliding_stats(df: DataFrame, ts: str, width: str, slide: str,
                  keys: list[str] | None = None) -> DataFrame:
    """A5 — sliding window with simultaneous COUNT/MIN/MAX.

    Reference: ``timeWindowAll(10s, 5s)`` + a reduce that threads count,
    min-ts and max-ts through one accumulator
    (``chapter3/WindowOperations.java:85-100``).
    """
    groups = [F.window(ts, width, slide).alias("w")] + [F.col(k) for k in (keys or [])]
    return (df.groupBy(*groups)
            .agg(F.count("*").alias("n"),
                 F.min(epoch_ms(F.col(ts))).alias("min_ts"),
                 F.max(epoch_ms(F.col(ts))).alias("max_ts"))
            .select(*(keys or []),
                    F.unix_millis(F.col("w.start")).alias("window_start"),
                    "n", "min_ts", "max_ts"))


def session_gap_ms(gap_ms: Column) -> Column:
    """Per-record session gap (milliseconds, > 0) as a CalendarInterval
    via exact DECIMAL arithmetic (``session_window`` rejects
    DayTimeIntervalType, so ``make_interval`` it is).

    Boundary rule (r8, verified against Flink 1.9.1 source): Flink's
    ``TimeWindow.intersects`` is INCLUSIVE on the touch
    (``this.start <= other.end && this.end >= other.start``), so the
    per-event windows ``[t, t+gap)`` and ``[t+gap, t+2gap)`` MERGE —
    ``EventTimeSessionWindowsTest.testMergeConsecutiveWindows`` pins
    exactly this.  A new session starts only when ``diff > gap``.
    Spark's native ``session_window`` implements the same inclusive
    merge, so the gap is passed through UNMODIFIED.  (Round 7 shipped a
    1-microsecond-shrunk gap implementing the opposite, split-on-touch
    rule — a misreading of Flink's half-open window extent as an
    exclusive *merge* test; reverted here with the oracles, property
    references and streaming parity tests moved in lockstep.)
    """
    us = gap_ms.cast("long") * F.lit(1000)
    return F.make_interval(
        secs=(us.cast("decimal(18,0)") / F.lit(1_000_000)).cast("decimal(18,6)"))


def _session_agg(df: DataFrame, ts: str, key: str, gap: Column) -> DataFrame:
    return (df.groupBy(key, F.session_window(ts, gap).alias("w"))
            .agg(F.count("*").alias("n"),
                 F.min(epoch_ms(F.col(ts))).alias("min_ts"),
                 F.max(epoch_ms(F.col(ts))).alias("max_ts"))
            .select(key, F.col("min_ts").alias("session_start"), "n",
                    "min_ts", "max_ts"))


def session_stats(df: DataFrame, ts: str, gap: str, key: str) -> DataFrame:
    """A6 — gap-based session window aggregate.

    Reference: ``keyBy(user).window(ProcessingTimeSessionWindows.withGap(5s))
    .reduce`` (``chapter3/WindowOperations.java:124-138``); a session
    closes after `gap` inactivity.  Sessions are unions of per-event
    ``[ts, ts+gap)`` windows merged under Flink's INCLUSIVE
    ``TimeWindow.intersects`` — touching windows merge, so an event at
    exactly ``prev_ts + gap`` joins the SAME session and a new one
    starts only when the silence EXCEEDS the gap.  Spark-first: native
    ``session_window`` (state-store backed in streaming, hash-agg in
    batch) implements the identical inclusive-merge rule, used
    unmodified (see :func:`session_gap_ms` for the boundary-rule
    provenance).  session_start is the session's first event time.
    """
    return _session_agg(df, ts, key, F.expr(f"cast('{gap}' as interval)"))


def dynamic_session_stats(df: DataFrame, ts: str, key: str,
                          gap_ms: Column) -> DataFrame:
    """A13 — session windows with a PER-RECORD gap (Flink
    ``SessionWindows.withDynamicGap`` / ``SessionWindowTimeGapExtractor``,
    the dynamic-session feature of ``chapter3/About Windowing.md``):
    each event holds its session open for its OWN gap — e.g. an error
    event keeps the session alive longer than a click. ``gap_ms`` is a
    per-record LONG milliseconds column (> 0). Spark-first: native
    ``session_window(ts, gap_expr)`` builds the per-event
    [ts, ts+gap) interval and merges overlaps (inclusive on the touch,
    matching Flink's ``TimeWindow.intersects`` — see
    :func:`session_gap_ms`), batch (hash agg) and streaming (state
    store) alike: a session closes only when the next event starts
    strictly AFTER the running max of prior interval ends.

    Same output shape as ``session_stats``.
    """
    return _session_agg(df, ts, key, session_gap_ms(gap_ms))


def keyed_agg(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """A1+A7 — plain keyed aggregation (sum/min/max/count in one pass)."""
    return (df.groupBy(*keys)
            .agg(F.count("*").alias("n"),
                 decimal_sum(value).alias("sum_value"),
                 F.min(value).alias("min_value"),
                 F.max(value).alias("max_value")))


def count_window_agg(df: DataFrame, key: str, order: list[str], value: str,
                     size: int) -> DataFrame:
    """Tumbling COUNT window (Flink ``keyBy(..).countWindow(n)`` analog).

    Not exercised by the reference demo but core Flink DataStream API:
    per key, every ``size`` consecutive records (in ``order``) form one
    window, aggregated on close. Flink implements it as a count trigger
    over a global window; the Spark-first batch form is a per-key
    ``row_number`` bucketed by ``size`` — one shuffle on the key, then
    hash aggregation on (key, window id). Flink drops the trailing
    partial window (the count trigger never fires); we KEEP it with its
    actual n, the more useful batch semantics — filter ``n = size`` for
    Flink-exact output.

    At 100 TB: the row_number window sorts only each key's own rows
    (time-ordered within a key-partition), and the second aggregation
    reuses the same hash partitioning — Exchange reuse, no extra
    shuffle.
    """
    w = W.partitionBy(key).orderBy(*order)
    # integer `div`, not FP division-then-cast: bucketing must be exact
    # arithmetic by construction, matching the oracle's integer `//`
    return (df.withColumn("_rn0", F.row_number().over(w) - F.lit(1))
            .withColumn("window_id", F.expr(f"_rn0 div {int(size)}"))
            .drop("_rn0")
            .groupBy(key, "window_id")
            .agg(F.count("*").alias("n"),
                 decimal_sum(value).alias("sum_value"),
                 F.min(value).alias("min_value"),
                 F.max(value).alias("max_value")))


def sliding_count_window_agg(df: DataFrame, key: str, order: list[str],
                             value: str, size: int, slide: int) -> DataFrame:
    """Sliding COUNT window (Flink ``keyBy(..).countWindow(size, slide)``
    analog — GlobalWindow + CountTrigger(slide) + CountEvictor(size)):
    per key, a window FIRES at every ``slide``-th record (in ``order``)
    and aggregates the last ``size`` records at that point. Early
    windows are partial (fewer than ``size`` rows at the stream head),
    exactly as Flink's evictor leaves them; windows whose trigger never
    fires (the trailing < ``slide`` rows) are absent, also as in Flink.

    Spark-first batch form: rank each key's rows (``row_number``), then
    explode each row into the window ids it belongs to — window w
    (1-based) covers ranks (w*slide - size, w*slide], so a row belongs
    to at most ceil(size/slide) windows, a bounded narrow fan-out — and
    hash-aggregate on (key, window_id), capped at the key's fired
    window count. One shuffle on the key (the rank window), then the
    aggregation reuses that partitioning (window ids are per-key).

    Emits (key, window_id, trigger_rn, n, sum_value, min_value,
    max_value) where trigger_rn = window_id * slide is the per-key
    record count at which Flink's trigger would have fired.
    """
    if size <= 0 or slide <= 0:
        raise ValueError(f"size and slide must be positive, got {size}/{slide}")
    w = W.partitionBy(key).orderBy(*order)
    d = (df.withColumn("_rn", F.row_number().over(w))
         .withColumn("_nk", F.count("*").over(W.partitionBy(key))))
    lo = F.expr(f"(_rn - 1) div {int(slide)} + 1")
    hi = F.least(F.expr(f"(_rn + {int(size)} - 1) div {int(slide)}"),
                 F.expr(f"_nk div {int(slide)}"))  # fired windows only
    d = (d.withColumn(
            "window_id",
            F.explode(F.when(lo <= hi, F.sequence(lo, hi))
                      .otherwise(F.array().cast("array<long>")))))
    return (d.groupBy(key, "window_id")
            .agg(F.count("*").alias("n"),
                 decimal_sum(value).alias("sum_value"),
                 F.min(value).alias("min_value"),
                 F.max(value).alias("max_value"))
            .withColumn("trigger_rn", F.col("window_id") * slide))
