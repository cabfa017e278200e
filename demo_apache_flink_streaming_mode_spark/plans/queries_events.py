"""Reference-derived queries over the ``events`` table (SURVEY.md §2).

Column binding (FIXTURES.md §3): user -> user_id, operation/action ->
event_type, event_time -> ts, duration -> value. The reference's
seconds-scale demo windows become hour/day-scale here because the
events table spans 30 days with minute-to-hour inter-event gaps — same
semantics, meaningful bucket sizes.

Constants:
  ST1 'Delete'          -> event_type 'error', repeat threshold 1 h
  ST2 'Login'/'Logout'  -> 'signup' / 'purchase'
  A6 session gap        -> 6 h (data's median per-user gap ~7.3 h, so
                           both merge and split cases occur)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from demo_apache_flink_streaming_mode_spark.operators import (
    cep, changelog, eventtime, joins, stateful, timeseries, transforms,
    windows)
from demo_apache_flink_streaming_mode_spark.plans.base import Query
from demo_apache_flink_streaming_mode_spark.sources.batch import load_table

HOUR_MS = 3_600_000
SESSION_GAP_MS = 6 * HOUR_MS
ST1_THRESHOLD_MS = HOUR_MS
LATE_BUFFER_MS = 600_000  # 10 min (reference: 2 s at seconds scale)
INTERVAL_MS = 600_000     # j3 interval half-width (10 min)
FUNNEL_STEPS = ["view", "click", "purchase"]   # CEP pattern, in order
FUNNEL_WITHIN_MS = 12 * HOUR_MS                # max gap between steps


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- T1-T4 ---------------------------------------------------------------

def t1_parse_project(spark, sf_dir):
    return transforms.parse_project(_events(spark, sf_dir))


def t2_filter(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return transforms.keep(ev, F.col("event_type") == "error").select(
        "event_id", "user_id", "event_type", F.unix_millis("ts").alias("ts_ms"))


def t3_split_main(spark, sf_dir):
    main, _side = transforms.split_stream(_events(spark, sf_dir),
                                          F.col("event_type") == "click")
    return main.select("event_id", "user_id", "event_type",
                       F.unix_millis("ts").alias("ts_ms"), "value")


def t3_split_side(spark, sf_dir):
    _main, side = transforms.split_stream(_events(spark, sf_dir),
                                          F.col("event_type") == "click")
    return side.select("user_id", F.lit(1).alias("cnt"))


def t4_merge(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return transforms.merge_streams(
        {"Stream-Click": ev.filter(F.col("event_type") == "click")
             .select("user_id", F.lit(1).alias("cnt")),
         "Stream-Error": ev.filter(F.col("event_type") == "error")
             .select("user_id", F.lit(1).alias("cnt"))},
        ["user_id", "cnt"])


# --- A2-A7 ---------------------------------------------------------------

def a2_running_total(spark, sf_dir):
    return windows.running_total(
        _events(spark, sf_dir), "user_id", ["ts", "event_id"], "value"
    ).select("event_id", "user_id", "running_sum")


def a3_tumbling_count_global(spark, sf_dir):
    return windows.tumbling_count(_events(spark, sf_dir), "ts", "1 hour")


def a4_tumbling_count_keyed(spark, sf_dir):
    return windows.tumbling_count(_events(spark, sf_dir), "ts", "1 day",
                                  keys=["user_id", "event_type"])


def a5_sliding_stats(spark, sf_dir):
    return windows.sliding_stats(_events(spark, sf_dir), "ts", "2 hours", "1 hour")


def a6_session_stats(spark, sf_dir):
    return windows.session_stats(_events(spark, sf_dir), "ts", "6 hours", "user_id")


A13_ERROR_GAP_MS = 10 * 3_600_000   # error events hold sessions 10h
A13_BASE_GAP_MS = 4 * 3_600_000     # everything else 4h


def a13_dynamic_session(spark, sf_dir):
    """Per-record session gap (Flink SessionWindows.withDynamicGap):
    an error event keeps the user's session open for 10 hours, any
    other event for 4 — the session survives long silences after a
    failure but closes quickly in normal traffic. Native
    session_window(ts, gap_expr), unmodified; the oracle reproduces
    the interval merge with a running max of per-event interval ends
    (a plain lag is wrong under variable gaps: an old long-gap event
    can span past its successors), opening a new session when ms
    strictly EXCEEDS that running max — Flink's inclusive
    TimeWindow.intersects boundary (see operators/windows.py
    session_gap_ms for the r8 provenance)."""
    gap_ms = (F.when(F.col("event_type") == "error", F.lit(A13_ERROR_GAP_MS))
              .otherwise(F.lit(A13_BASE_GAP_MS)))
    return windows.dynamic_session_stats(_events(spark, sf_dir), "ts",
                                         "user_id", gap_ms)


def a7_keyed_agg(spark, sf_dir):
    return windows.keyed_agg(_events(spark, sf_dir), ["user_id", "event_type"], "value")


# --- J1, ST1, ST2, W3 ----------------------------------------------------

def j1_window_join(spark, sf_dir):
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    return joins.window_join(clicks, purchases, "user_id", "ts", "1 hour").select(
        "user_id", "window_start", "event_id_l", "event_id_r")


def j1_window_join_left(spark, sf_dir):
    """J1 outer extension: clicks LEFT-join purchases per (user, hour
    window) — unmatched clicks survive with null purchase ids. Flink
    needs a CoGroupFunction for this; Spark exposes the join type, and
    the streaming form is a native watermarked outer join."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    return joins.window_join(clicks, purchases, "user_id", "ts", "1 hour",
                             how="left").select(
        "user_id", "window_start", "event_id_l", "event_id_r")


def st1_repeat_action_alert(spark, sf_dir):
    return stateful.repeat_action_alert(
        _events(spark, sf_dir), "user_id", "ts", "event_type",
        action="error", threshold_ms=ST1_THRESHOLD_MS)


def st2_action_durations(spark, sf_dir):
    return stateful.action_durations(
        _events(spark, sf_dir), "user_id", "ts", "event_type",
        start_action="signup", end_action="purchase")


def j2_asof_click_view(spark, sf_dir):
    """As-of join: each click aligned to the user's latest prior view.

    The time-series alignment operator the reference (and stock Spark)
    lacks — implemented as union + last-non-null window carry-forward
    (operators.joins.asof_join), one shuffle on the key. The oracle is
    DuckDB's native ASOF LEFT JOIN.
    """
    ev = _events(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("click_id"),
                      F.unix_millis("ts").alias("click_ms")))
    views = (ev.filter(F.col("event_type") == "view")
             .select("user_id", F.col("event_id").alias("view_id"),
                     F.unix_millis("ts").alias("view_ms")))
    j = joins.asof_join(clicks, views, "user_id", "click_ms", "view_ms")
    return j.select("user_id", "click_id", "click_ms", "view_id",
                    (F.col("click_ms") - F.col("view_ms")).alias("gap_ms"))


def a8_state_intervals(spark, sf_dir):
    """SCD2-style history build: each event opens a validity interval
    that closes at the user's next event (NULL while current) — the
    standard latest-state/history warehouse pattern, one ``lead``
    window pass keyed by user. Ties on ts resolve by event_id.
    """
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type",
        F.unix_millis("ts").alias("valid_from_ms"))
    from pyspark.sql import Window as W
    w = W.partitionBy("user_id").orderBy("valid_from_ms", "event_id")
    return ev.select(
        "user_id", "event_id", "event_type", "valid_from_ms",
        F.lead("valid_from_ms").over(w).alias("valid_to_ms"))


def a9_value_histogram(spark, sf_dir):
    """Fixed-width numeric binning: value histogram per event type
    (bin width 10). A shuffle on (type, bin) with map-side partials —
    the numeric twin of the time-bucket windows.
    """
    ev = _events(spark, sf_dir)
    return (ev.select("event_type",
                      F.floor(F.col("value") / 10).cast("long").alias("bin"))
            .groupBy("event_type", "bin")
            .agg(F.count("*").alias("n")))


def a10_moving_avg(spark, sf_dir):
    """Row-frame window aggregate: per user, 3-row moving average of
    `value` ordered by (ts, event_id). The frame sum goes through
    DECIMAL(38,6) so both engines add the same bits in any frame
    order; the divisor is the frame's own row count (1 or 2 at the
    series head).
    """
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_millis("ts").alias("ms"), "value")
    w = (W.partitionBy("user_id").orderBy("ms", "event_id")
         .rowsBetween(-2, 0))
    avg3 = (F.sum(F.col("value").cast("decimal(38,6)")).over(w)
            .cast("double") / F.count("*").over(w))
    return ev.select("user_id", "event_id", "ms", "value",
                     avg3.alias("avg3"))


def events_anomalies(spark, sf_dir):
    """Z-score anomaly detection: flag events whose value sits more
    than 2 standard deviations from their type's mean. Mean and
    variance come from exact decimal sums (S, S2) so the derived
    doubles — mean = S/n, var = S2/n - mean^2, z = (v-mean)/sqrt(var)
    — are the identical IEEE chain on both engines.
    """
    ev = _events(spark, sf_dir).select(
        "event_id", "event_type", "value")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)"))
        .cast("double").alias("s2"))
    # greatest(var, 0): catastrophic cancellation can leave a tiny
    # negative variance whose sqrt is NaN; zero-variance groups get a
    # NULL z and are flagged whenever the value differs from the mean
    # (a deviation from a constant baseline is maximally anomalous,
    # not silently droppable)
    stats = s.select(
        "event_type",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(F.greatest(
            F.col("s2") / F.col("n")
            - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n")),
            F.lit(0.0))).alias("std"))
    j = ev.join(F.broadcast(stats), "event_type")
    z = F.when(F.col("std") > 0,
               (F.col("value") - F.col("mean")) / F.col("std"))
    flagged = ((F.col("std") > 0) & (F.abs(z) > 2.0)) | \
              ((F.col("std") == 0) & (F.col("value") != F.col("mean")))
    return (j.withColumn("z", z).filter(flagged)
            .select("event_type", "event_id", "value", "z"))


WEEK_MS = 7 * 24 * HOUR_MS


def events_retention_cohorts(spark, sf_dir):
    """Cohort retention triangle — the canonical product-analytics
    query: users grouped by first-activity week, distinct active users
    per (cohort week, week offset). One aggregate for cohort starts
    (map-side combinable), one distinct-count shuffle keyed by the
    (cohort, offset) pair.
    """
    ev = (_events(spark, sf_dir)
          .select("user_id",
                  F.expr(f"unix_millis(ts) div {WEEK_MS}").alias("wk")))
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    act = ev.distinct()
    return (act.join(first, "user_id")
            .groupBy("cohort_wk",
                     (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
            .agg(F.countDistinct("user_id").alias("n_users")))


def cep_action_bigrams(spark, sf_dir):
    """Sequence mining: consecutive action-pair (bigram) frequencies
    per user stream — one lag window keyed by user, then a bounded
    (|types|^2) aggregate. The micro-pattern primitive under the full
    CEP funnel.
    """
    from pyspark.sql import Window as W
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_millis("ts").alias("ms"), "event_id")
    w = W.partitionBy("user_id").orderBy("ms", "event_id")
    pairs = ev.select("user_id", "event_type",
                      F.lag("event_type").over(w).alias("prev_action"))
    return (pairs.filter(F.col("prev_action").isNotNull())
            .groupBy("prev_action", F.col("event_type").alias("next_action"))
            .agg(F.count("*").alias("n")))


def t5_json_props_stats(spark, sf_dir):
    """Semi-structured projection: parse the JSON ``props`` payload with
    a declared schema (``from_json`` — typed, whole-stage codegen, no
    schema inference pass) and aggregate the extracted field per event
    type. The scan still prunes to (event_type, props); at 100 TB the
    parse is a narrow per-row expression fused into the scan stage.
    """
    from pyspark.sql import types as T
    ev = _events(spark, sf_dir)
    k = F.from_json("props", T.StructType(
        [T.StructField("k", T.LongType())]))["k"]
    return (ev.select("event_type", k.alias("k"))
            .filter(F.col("k").isNotNull())
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k"),
                 F.count(F.when(F.col("k") > 50, 1)).alias("n_gt50")))


def j4_resample_1h(spark, sf_dir):
    """Hourly forward-filled resample of each user's `value` series —
    regular-grid alignment (operators.timeseries.resample_ffill):
    bounds agg -> sequence/explode grid -> one-shuffle as-of carry.
    Collisions on (user, ts) resolve to the greatest event_id; the
    oracle mirrors with an explicit argmax row_number.
    """
    ev = _events(spark, sf_dir).select(
        "user_id", F.unix_millis("ts").alias("obs_ms"),
        F.col("value").alias("obs_value"),
        F.col("event_id").alias("obs_event_id"))
    r = timeseries.resample_ffill(ev, "user_id", "obs_ms", HOUR_MS,
                                  tiebreak=["obs_event_id"])
    return r.select("user_id", "grid_ms", "obs_ms", "obs_value",
                    "obs_event_id",
                    (F.col("grid_ms") - F.col("obs_ms")).alias("staleness_ms"))


def j5_resample_interp_1h(spark, sf_dir):
    """Hourly linear-interpolation resample of each user's `value`
    series: both as-of legs (backward + forward-via-negated-ts) are the
    one-shuffle carry; the lerp is a fixed IEEE chain mirrored by the
    oracle. Past the last observation the value degenerates to forward
    fill.
    """
    ev = _events(spark, sf_dir).select(
        "user_id", F.unix_millis("ts").alias("ms"), "value")
    return timeseries.resample_interp(ev, "user_id", "ms", "value", HOUR_MS)


MOVING_WINDOW = 3


def j6_moving_features(spark, sf_dir):
    """Per-user rolling features (lag / delta / trailing 3-row moving
    sum+count) — the event-stream-to-model-features pass; bounded
    frames, exact windowed DECIMAL sum (see
    operators.timeseries.moving_features). Extends a10_moving_avg's
    frame aggregate with the offset functions (lag/delta) a feature
    pipeline needs — one window definition serves all four columns, so
    the plan stays a single shuffle + single Window node."""
    out = timeseries.moving_features(
        _events(spark, sf_dir), "user_id", ["ts", "event_id"], "value",
        MOVING_WINDOW)
    return out.select("user_id", "event_id",
                      F.unix_millis("ts").alias("ms"), "value",
                      "prev_value", "delta", "moving_sum", "n_window")


def j3_interval_join(spark, sf_dir):
    """Interval join: clicks within +/-10 min of each error event.

    Flink's DataStream interval join (no equi key) — grid-binned into
    an equi-join on time-bin + residual filter (operators.joins
    .interval_join) instead of the nested loop stock Spark would plan.
    """
    ev = _events(spark, sf_dir)
    errors = (ev.filter(F.col("event_type") == "error")
              .select(F.col("event_id").alias("error_id"),
                      F.unix_millis("ts").alias("err_ms")))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.unix_millis("ts").alias("clk_ms")))
    j = joins.interval_join(errors, clicks, "err_ms", "clk_ms",
                            -INTERVAL_MS, INTERVAL_MS)
    return j.select("error_id", "click_id",
                    (F.col("clk_ms") - F.col("err_ms")).alias("delta_ms"))


def w3_late_classify(spark, sf_dir):
    ev = _events(spark, sf_dir)
    # deterministic pseudo-arrival order: hour bucket, then an id-derived
    # interleave — models out-of-order arrival within each hour
    arrival = [(F.unix_millis("ts") / F.lit(HOUR_MS)).cast("long"),
               (F.col("event_id") % 16), F.col("event_id")]
    return eventtime.classify_late(ev, "ts", arrival, LATE_BUFFER_MS).select(
        "event_id", "watermark_ms", "is_late")


def cep_funnel(spark, sf_dir):
    """FlinkCEP-style begin(view).followedBy(click).followedBy(purchase)
    .within(12h) — relaxed contiguity, per user."""
    return cep.funnel_matches(_events(spark, sf_dir), FUNNEL_STEPS,
                              FUNNEL_WITHIN_MS)


def cep_funnel_rates(spark, sf_dir):
    """Funnel conversion rollup: distinct users and completion events
    per funnel prefix (step 1 = any first-step event; step k = the
    k-step funnel's completions). One small row per step — the
    dashboard number on top of the CEP operator."""
    ev = _events(spark, sf_dir)

    def stats(df, step):
        return df.agg(F.lit(step).alias("step"),
                      F.countDistinct("user_id").alias("n_users"),
                      F.count("*").alias("n_events"))

    out = stats(ev.filter(F.col("event_type") == FUNNEL_STEPS[0]), 1)
    for k in range(2, len(FUNNEL_STEPS) + 1):
        out = out.unionByName(stats(
            cep.funnel_matches(ev, FUNNEL_STEPS[:k], FUNNEL_WITHIN_MS), k))
    return out


COUNT_WINDOW_SIZE = 25


def a11_count_window(spark, sf_dir):
    """Tumbling count window per user (Flink ``countWindow(25)`` analog;
    core DataStream API beyond the demo's time windows). Trailing
    partial windows are kept with their actual n."""
    return windows.count_window_agg(
        _events(spark, sf_dir), "user_id", ["ts", "event_id"], "value",
        COUNT_WINDOW_SIZE)


SLIDING_COUNT_SIZE, SLIDING_COUNT_SLIDE = 25, 10


def a12_sliding_count_window(spark, sf_dir):
    """Sliding count window per user (Flink ``countWindow(25, 10)`` —
    CountTrigger(10) + CountEvictor(25)): a window fires at every 10th
    record and aggregates the last 25. Batch form is a bounded explode
    into the <= ceil(size/slide) window ids each row belongs to (see
    operators.windows.sliding_count_window_agg); early partial windows
    match Flink's evictor, never-fired tails are absent."""
    return windows.sliding_count_window_agg(
        _events(spark, sf_dir), "user_id", ["ts", "event_id"], "value",
        SLIDING_COUNT_SIZE, SLIDING_COUNT_SLIDE)


# --- changelog / upsert-stream semantics (Flink dynamic tables) ----------

def _changelog(spark, sf_dir):
    """Events as a per-user changelog: 'error' is the delete tombstone
    (the same binding ST1 uses for the reference's 'Delete' action),
    every other event upserts the user's state."""
    return changelog.derive_ops(_events(spark, sf_dir),
                                F.col("event_type") == "error")


def cl_latest_state(spark, sf_dir):
    """Materialized dynamic table: each user's LAST event wins; users
    whose last event is a delete are absent (Flink upsert-stream
    materialization, chapter5/StatefulOperations.java:83-143 state
    model). One key-partitioned window — no log replay."""
    st = changelog.latest_state(_changelog(spark, sf_dir),
                                "user_id", ["ts", "event_id"])
    return st.select("user_id", F.unix_millis("ts").alias("last_ms"),
                     F.col("event_type").alias("last_type"),
                     F.col("value").alias("last_value"), "n_changes")


def cl_state_summary(spark, sf_dir):
    """Retract-aware aggregate: group the MATERIALIZED state, not the
    raw log — the batch collapse of Flink's retraction machinery (an
    upsert that moves a user between groups needs no retraction once
    superseded versions are already discarded)."""
    st = changelog.latest_state(_changelog(spark, sf_dir),
                                "user_id", ["ts", "event_id"])
    return (changelog.state_summary(st, ["event_type"], "value")
            .select(F.col("event_type").alias("last_type"),
                    "n_keys", "sum_value"))


# --- oracles -------------------------------------------------------------

_LAG_WINDOW = "(PARTITION BY user_id ORDER BY ts, event_id)"

_CL_RANKED = """
  ranked AS (
    SELECT user_id, ts, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_changes
    FROM events)"""

ORACLES = {
    "t1_parse_project": """
        SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, 1 AS cnt
        FROM events""",
    "t2_filter": """
        SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
        FROM events WHERE event_type = 'error'""",
    "t3_split_main": """
        SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value
        FROM events WHERE event_type = 'click'""",
    "t3_split_side": """
        SELECT user_id, 1 AS cnt FROM events WHERE event_type <> 'click'""",
    "t4_merge": """
        SELECT 'Stream-Click' AS src, user_id, 1 AS cnt FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT 'Stream-Error' AS src, user_id, 1 AS cnt FROM events WHERE event_type = 'error'""",
    "a2_running_total": """
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS running_sum
        FROM events""",
    "a3_tumbling_count_global": """
        SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_start, count(*) AS n
        FROM events GROUP BY 1""",
    "a4_tumbling_count_keyed": """
        SELECT user_id, event_type,
               (epoch_ms(ts) // 86400000) * 86400000 AS window_start, count(*) AS n
        FROM events GROUP BY 1, 2, 3""",
    "a5_sliding_stats": """
        SELECT (epoch_ms(ts) // 3600000 - off) * 3600000 AS window_start,
               count(*) AS n, min(epoch_ms(ts)) AS min_ts, max(epoch_ms(ts)) AS max_ts
        FROM events, (VALUES (0), (1)) AS t(off)
        GROUP BY 1""",
    "a6_session_stats": f"""
        WITH o AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ms,
                 CASE WHEN lag(epoch_ms(ts)) OVER {_LAG_WINDOW} IS NULL
                        OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER {_LAG_WINDOW}
                           > {SESSION_GAP_MS}
                      THEN 1 ELSE 0 END AS new_sess
          FROM events),
        s AS (
          SELECT user_id, ms,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
          FROM o)
        SELECT user_id, MIN(ms) AS session_start, COUNT(*) AS n,
               MIN(ms) AS min_ts, MAX(ms) AS max_ts
        FROM s GROUP BY user_id, sess""",
    "a13_dynamic_session": f"""
        WITH o AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ms,
                 CASE WHEN event_type = 'error' THEN {A13_ERROR_GAP_MS}
                      ELSE {A13_BASE_GAP_MS} END AS gap
          FROM events),
        e AS (
          SELECT user_id, event_id, ms,
                 MAX(ms + gap) OVER (PARTITION BY user_id
                                     ORDER BY ms, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) AS prev_end
          FROM o),
        f AS (
          SELECT user_id, event_id, ms,
                 CASE WHEN prev_end IS NULL OR ms > prev_end
                      THEN 1 ELSE 0 END AS new_sess
          FROM e),
        s AS (
          SELECT user_id, ms,
                 SUM(new_sess) OVER (PARTITION BY user_id
                                     ORDER BY ms, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
          FROM f)
        SELECT user_id, MIN(ms) AS session_start, COUNT(*) AS n,
               MIN(ms) AS min_ts, MAX(ms) AS max_ts
        FROM s GROUP BY user_id, sess""",
    "a7_keyed_agg": """
        SELECT user_id, event_type, count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
               min(value) AS min_value, max(value) AS max_value
        FROM events GROUP BY 1, 2""",
    "j1_window_join": """
        SELECT a.user_id, (epoch_ms(a.ts) // 3600000) * 3600000 AS window_start,
               a.event_id AS event_id_l, b.event_id AS event_id_r
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND epoch_ms(a.ts) // 3600000 = epoch_ms(b.ts) // 3600000
        WHERE a.event_type = 'click' AND b.event_type = 'purchase'""",
    "j1_window_join_left": """
        SELECT a.user_id, (epoch_ms(a.ts) // 3600000) * 3600000 AS window_start,
               a.event_id AS event_id_l, b.event_id AS event_id_r
        FROM (SELECT * FROM events WHERE event_type = 'click') a
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
          ON a.user_id = b.user_id
         AND epoch_ms(a.ts) // 3600000 = epoch_ms(b.ts) // 3600000""",
    "st1_repeat_action_alert": f"""
        WITH d AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ms,
                 lag(epoch_ms(ts)) OVER {_LAG_WINDOW} AS prev_ms
          FROM events WHERE event_type = 'error')
        SELECT user_id, event_id, ms - prev_ms AS time_diff_ms
        FROM d
        WHERE prev_ms IS NOT NULL AND ms - prev_ms < {ST1_THRESHOLD_MS}""",
    "st2_action_durations": f"""
        WITH o AS (
          SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
                 lag(event_type) OVER {_LAG_WINDOW} AS prev_a,
                 lag(epoch_ms(ts)) OVER {_LAG_WINDOW} AS prev_ms
          FROM events)
        SELECT user_id, event_id,
               CASE WHEN prev_a IS NULL OR prev_a = 'purchase'
                         OR event_type = 'signup'
                    THEN 'None' ELSE prev_a END AS prev_action,
               CAST(CASE WHEN prev_a IS NULL OR prev_a = 'purchase'
                              OR event_type = 'signup'
                         THEN 0 ELSE ms - prev_ms END AS BIGINT) AS duration_ms
        FROM o""",
    "j2_asof_click_view": """
        WITH c AS (SELECT user_id, event_id AS click_id, epoch_ms(ts) AS click_ms
                   FROM events WHERE event_type = 'click'),
             v AS (SELECT user_id, event_id AS view_id, epoch_ms(ts) AS view_ms
                   FROM events WHERE event_type = 'view')
        SELECT c.user_id, c.click_id, c.click_ms, v.view_id,
               c.click_ms - v.view_ms AS gap_ms
        FROM c ASOF LEFT JOIN v
          ON c.user_id = v.user_id AND v.view_ms <= c.click_ms""",
    "a8_state_intervals": """
        SELECT user_id, event_id, event_type,
               epoch_ms(ts) AS valid_from_ms,
               LEAD(epoch_ms(ts)) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS valid_to_ms
        FROM events""",
    "a9_value_histogram": """
        SELECT event_type, CAST(FLOOR(value / 10) AS BIGINT) AS bin,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2""",
    "a10_moving_avg": """
        SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
                   / COUNT(*) OVER w AS avg3
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_ms(ts), event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
    "events_anomalies": """
        WITH s AS (SELECT event_type, COUNT(*) AS n,
                          CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                              AS s1,
                          CAST(SUM(CAST(value * value AS DECIMAL(38,6)))
                               AS DOUBLE) AS s2
                   FROM events GROUP BY 1),
        st AS (SELECT event_type, s1 / n AS mean,
                      sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0))
                          AS std
               FROM s)
        SELECT e.event_type, e.event_id, e.value,
               CASE WHEN st.std > 0
                    THEN (e.value - st.mean) / st.std END AS z
        FROM events e JOIN st ON e.event_type = st.event_type
        WHERE (st.std > 0 AND abs((e.value - st.mean) / st.std) > 2.0)
           OR (st.std = 0 AND e.value <> st.mean)""",
    "events_retention_cohorts": f"""
        WITH ev AS (SELECT DISTINCT user_id,
                           epoch_ms(ts) // {WEEK_MS} AS wk FROM events),
        first AS (SELECT user_id, MIN(wk) AS cohort_wk
                  FROM ev GROUP BY 1)
        SELECT f.cohort_wk, e.wk - f.cohort_wk AS week_offset,
               COUNT(DISTINCT e.user_id) AS n_users
        FROM ev e JOIN first f ON e.user_id = f.user_id
        GROUP BY 1, 2""",
    "cep_action_bigrams": """
        WITH p AS (SELECT user_id, event_type,
                          LAG(event_type) OVER (PARTITION BY user_id
                              ORDER BY epoch_ms(ts), event_id) AS prev_action
                   FROM events)
        SELECT prev_action, event_type AS next_action, COUNT(*) AS n
        FROM p WHERE prev_action IS NOT NULL
        GROUP BY 1, 2""",
    "t5_json_props_stats": """
        WITH e AS (SELECT event_type,
                          CAST(json_extract(props, '$.k') AS BIGINT) AS k
                   FROM events)
        SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
               MIN(k) AS min_k, MAX(k) AS max_k,
               COUNT(CASE WHEN k > 50 THEN 1 END) AS n_gt50
        FROM e WHERE k IS NOT NULL
        GROUP BY 1""",
    "j4_resample_1h": f"""
        WITH ev AS (SELECT user_id, epoch_ms(ts) AS obs_ms,
                           value AS obs_value, event_id AS obs_event_id
                    FROM events),
        b AS (SELECT user_id,
                     ((MIN(obs_ms) // {HOUR_MS}) + (CASE WHEN MIN(obs_ms) % {HOUR_MS} > 0 THEN 1 ELSE 0 END)) * {HOUR_MS} AS gs,
                     ((MAX(obs_ms) // {HOUR_MS}) - (CASE WHEN MAX(obs_ms) % {HOUR_MS} < 0 THEN 1 ELSE 0 END)) * {HOUR_MS} AS ge
              FROM ev GROUP BY 1),
        grid AS (SELECT user_id, unnest(range(gs, ge + 1, {HOUR_MS})) AS grid_ms
                 FROM b WHERE gs <= ge),
        j AS (SELECT g.user_id, g.grid_ms, e.obs_ms, e.obs_value,
                     e.obs_event_id,
                     ROW_NUMBER() OVER (PARTITION BY g.user_id, g.grid_ms
                         ORDER BY e.obs_ms DESC, e.obs_event_id DESC) AS rn
              FROM grid g JOIN ev e
                ON e.user_id = g.user_id AND e.obs_ms <= g.grid_ms)
        SELECT user_id, grid_ms, obs_ms, obs_value, obs_event_id,
               grid_ms - obs_ms AS staleness_ms
        FROM j WHERE rn = 1""",
    "j5_resample_interp_1h": f"""
        WITH ev AS (SELECT user_id, epoch_ms(ts) AS ms, value AS v
                    FROM events),
        b AS (SELECT user_id,
                     ((MIN(ms) // {HOUR_MS}) + (CASE WHEN MIN(ms) % {HOUR_MS} > 0 THEN 1 ELSE 0 END)) * {HOUR_MS} AS gs,
                     ((MAX(ms) // {HOUR_MS}) - (CASE WHEN MAX(ms) % {HOUR_MS} < 0 THEN 1 ELSE 0 END)) * {HOUR_MS} AS ge
              FROM ev GROUP BY 1),
        grid AS (SELECT user_id, unnest(range(gs, ge + 1, {HOUR_MS})) AS grid_ms
                 FROM b WHERE gs <= ge),
        g0 AS (SELECT * FROM (
                 SELECT g.user_id, g.grid_ms, e.ms AS t0, e.v AS v0,
                        ROW_NUMBER() OVER (PARTITION BY g.user_id, g.grid_ms
                            ORDER BY e.ms DESC, e.v DESC) AS rn
                 FROM grid g JOIN ev e
                   ON e.user_id = g.user_id AND e.ms <= g.grid_ms)
               WHERE rn = 1),
        g1 AS (SELECT * FROM (
                 SELECT g.user_id, g.grid_ms, e.ms AS t1, e.v AS v1,
                        ROW_NUMBER() OVER (PARTITION BY g.user_id, g.grid_ms
                            ORDER BY e.ms ASC, e.v DESC) AS rn
                 FROM grid g JOIN ev e
                   ON e.user_id = g.user_id AND e.ms >= g.grid_ms)
               WHERE rn = 1)
        SELECT g0.user_id, g0.grid_ms, g0.t0, g0.v0, g1.t1, g1.v1,
               CASE WHEN g1.t1 IS NULL THEN g0.v0
                    WHEN g1.t1 = g0.t0 THEN g0.v0
                    ELSE g0.v0 + (g1.v1 - g0.v0)
                         * CAST(g0.grid_ms - g0.t0 AS DOUBLE)
                         / CAST(g1.t1 - g0.t0 AS DOUBLE)
               END AS interp_value
        FROM g0 LEFT JOIN g1
          ON g1.user_id = g0.user_id AND g1.grid_ms = g0.grid_ms""",
    "j3_interval_join": """
        WITH e AS (SELECT event_id AS error_id, epoch_ms(ts) AS err_ms
                   FROM events WHERE event_type = 'error'),
             c AS (SELECT event_id AS click_id, epoch_ms(ts) AS clk_ms
                   FROM events WHERE event_type = 'click')
        SELECT e.error_id, c.click_id, c.clk_ms - e.err_ms AS delta_ms
        FROM e JOIN c
          ON c.clk_ms BETWEEN e.err_ms - 600000 AND e.err_ms + 600000""",
    "cep_funnel": f"""
        WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
                   FROM events),
        s0 AS (SELECT *, CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN ms END
                           AS q0 FROM e),
        p1 AS (SELECT *, MAX(q0) OVER (PARTITION BY user_id ORDER BY ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p0
               FROM s0),
        s1 AS (SELECT *, CASE WHEN event_type = '{FUNNEL_STEPS[1]}'
                                AND p0 >= ms - {FUNNEL_WITHIN_MS} THEN ms END
                           AS q1 FROM p1),
        p2 AS (SELECT *, MAX(q1) OVER (PARTITION BY user_id ORDER BY ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv
               FROM s1)
        SELECT user_id, event_id, ms AS complete_ms, pv AS prev_step_ms
        FROM p2
        WHERE event_type = '{FUNNEL_STEPS[2]}' AND pv >= ms - {FUNNEL_WITHIN_MS}""",
    "w3_late_classify": f"""
        WITH o AS (
          SELECT event_id, epoch_ms(ts) AS ms,
                 MAX(epoch_ms(ts)) OVER (
                     ORDER BY epoch_ms(ts) // {HOUR_MS}, event_id % 16, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   - {LATE_BUFFER_MS} AS wm
          FROM events)
        SELECT event_id, wm AS watermark_ms,
               COALESCE(ms < wm, FALSE) AS is_late
        FROM o""",
}

def _funnel_sql(steps: list[str], within_ms: int) -> str:
    """k-step funnel completions as SQL — the general form of the
    hand-written cep_funnel oracle (same CTE chain, any k)."""
    ctes = [
        "e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms "
        "FROM events)",
        f"s0 AS (SELECT *, CASE WHEN event_type = '{steps[0]}' THEN ms END "
        "AS q0 FROM e)",
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"p{i} AS (SELECT *, MAX(q{i-1}) OVER (PARTITION BY user_id "
            "ORDER BY ms, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            f"1 PRECEDING) AS pp{i} FROM s{i-1})")
        ctes.append(
            f"s{i} AS (SELECT *, CASE WHEN event_type = '{steps[i]}' "
            f"AND pp{i} >= ms - {within_ms} THEN ms END AS q{i} FROM p{i})")
    last = len(steps) - 1
    return ("WITH " + ", ".join(ctes)
            + f" SELECT user_id, event_id FROM s{last} "
            f"WHERE q{last} IS NOT NULL")


ORACLES["cep_funnel_rates"] = " UNION ALL ".join(
    [f"""SELECT 1 AS step, COUNT(DISTINCT user_id) AS n_users,
                COUNT(*) AS n_events
         FROM events WHERE event_type = '{FUNNEL_STEPS[0]}'"""]
    + [f"""SELECT {k} AS step, COUNT(DISTINCT user_id) AS n_users,
                  COUNT(*) AS n_events
           FROM ({_funnel_sql(FUNNEL_STEPS[:k], FUNNEL_WITHIN_MS)})"""
       for k in range(2, len(FUNNEL_STEPS) + 1)])

ORACLES["a11_count_window"] = f"""
    WITH b AS (
      SELECT user_id, value,
             (row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) - 1)
               // {COUNT_WINDOW_SIZE} AS window_id
      FROM events)
    SELECT user_id, window_id, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           min(value) AS min_value, max(value) AS max_value
    FROM b GROUP BY 1, 2"""

ORACLES["j6_moving_features"] = f"""
    SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
           lag(value) OVER w AS prev_value,
           value - lag(value) OVER w AS delta,
           CAST(SUM(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN {MOVING_WINDOW - 1} PRECEDING
                      AND CURRENT ROW) AS DOUBLE) AS moving_sum,
           COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN {MOVING_WINDOW - 1} PRECEDING
                              AND CURRENT ROW) AS n_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""

ORACLES["a12_sliding_count_window"] = f"""
    WITH r AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS nk
      FROM events),
    x AS (
      SELECT user_id, value,
             unnest(generate_series(
                 (rn - 1) // {SLIDING_COUNT_SLIDE} + 1,
                 least((rn + {SLIDING_COUNT_SIZE} - 1) // {SLIDING_COUNT_SLIDE},
                       nk // {SLIDING_COUNT_SLIDE}))) AS window_id
      FROM r)
    SELECT user_id, window_id, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           min(value) AS min_value, max(value) AS max_value,
           window_id * {SLIDING_COUNT_SLIDE} AS trigger_rn
    FROM x GROUP BY 1, 2"""

ORACLES["cl_latest_state"] = f"""
    WITH {_CL_RANKED}
    SELECT user_id, epoch_ms(ts) AS last_ms, event_type AS last_type,
           value AS last_value, n_changes
    FROM ranked WHERE rn = 1 AND event_type IS DISTINCT FROM 'error'"""

ORACLES["cl_state_summary"] = f"""
    WITH {_CL_RANKED}
    SELECT event_type AS last_type, count(*) AS n_keys,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM ranked WHERE rn = 1 AND event_type IS DISTINCT FROM 'error'
    GROUP BY 1"""

QUERIES = [
    Query("t1_parse_project", t1_parse_project, ORACLES["t1_parse_project"],
          "T1 map/projection + literal tag (BasicStreamingOperations.java:64-88)"),
    Query("t2_filter", t2_filter, ORACLES["t2_filter"],
          "T2 predicate filter (StatefulOperations.java:129-143)"),
    Query("t3_split_main", t3_split_main, ORACLES["t3_split_main"],
          "T3 stream split, main branch (StreamSplitAndMerge.java:68-102)"),
    Query("t3_split_side", t3_split_side, ORACLES["t3_split_side"],
          "T3 stream split, side branch as (user,1) (StreamSplitAndMerge.java:91-97)"),
    Query("t4_merge", t4_merge, ORACLES["t4_merge"],
          "T4 heterogeneous merge via normalize+union (StreamSplitAndMerge.java:114-167)"),
    Query("a2_running_total", a2_running_total, ORACLES["a2_running_total"],
          "A2 per-key running aggregate (KeyedStreamOperations.java:64-84)"),
    Query("a3_tumbling_count_global", a3_tumbling_count_global,
          ORACLES["a3_tumbling_count_global"],
          "A3 global tumbling count (MapCountPrinter.java:12-34)"),
    Query("a4_tumbling_count_keyed", a4_tumbling_count_keyed,
          ORACLES["a4_tumbling_count_keyed"],
          "A4 keyed tumbling count (AnalyzeBrowserEvents.java:83-96)"),
    Query("a5_sliding_stats", a5_sliding_stats, ORACLES["a5_sliding_stats"],
          "A5 sliding window count/min/max (WindowOperations.java:85-100)"),
    Query("a6_session_stats", a6_session_stats, ORACLES["a6_session_stats"],
          "A6 session window aggregate (WindowOperations.java:124-138)"),
    Query("a13_dynamic_session", a13_dynamic_session,
          ORACLES["a13_dynamic_session"],
          "per-record session gap (Flink SessionWindows.withDynamicGap)"),
    Query("a7_keyed_agg", a7_keyed_agg, ORACLES["a7_keyed_agg"],
          "A1/A7 keyed multi-aggregate (reduce lambdas -> built-in aggs)"),
    Query("j1_window_join", j1_window_join, ORACLES["j1_window_join"],
          "J1 tumbling-window inner equi-join (WindowJoin.java:119-158)"),
    Query("j2_asof_click_view", j2_asof_click_view, ORACLES["j2_asof_click_view"],
          "J2 backward as-of join via union + window carry-forward"),
    Query("t5_json_props_stats", t5_json_props_stats,
          ORACLES["t5_json_props_stats"],
          "typed JSON payload extraction + per-type aggregate"),
    Query("a8_state_intervals", a8_state_intervals,
          ORACLES["a8_state_intervals"],
          "SCD2-style validity intervals per user (lead window)"),
    Query("a10_moving_avg", a10_moving_avg, ORACLES["a10_moving_avg"],
          "3-row moving average per user (decimal frame sum)"),
    Query("events_retention_cohorts", events_retention_cohorts,
          ORACLES["events_retention_cohorts"],
          "cohort retention triangle (first-week cohorts x week offset)"),
    Query("cep_action_bigrams", cep_action_bigrams,
          ORACLES["cep_action_bigrams"],
          "consecutive action-pair frequencies per user stream"),
    Query("events_anomalies", events_anomalies, ORACLES["events_anomalies"],
          "z-score anomaly detection per event type (|z| > 2)"),
    Query("a9_value_histogram", a9_value_histogram,
          ORACLES["a9_value_histogram"],
          "fixed-width value histogram per event type"),
    Query("j4_resample_1h", j4_resample_1h, ORACLES["j4_resample_1h"],
          "hourly forward-filled resample per user (grid + as-of carry)"),
    Query("j5_resample_interp_1h", j5_resample_interp_1h,
          ORACLES["j5_resample_interp_1h"],
          "hourly linear-interpolation resample (dual as-of legs + lerp)"),
    Query("j3_interval_join", j3_interval_join, ORACLES["j3_interval_join"],
          "J3 keyless interval join via grid binning (Flink intervalJoin analog)"),
    Query("st1_repeat_action_alert", st1_repeat_action_alert,
          ORACLES["st1_repeat_action_alert"],
          "ST1 keyed ValueState repeat-action alert (StatefulOperations.java:83-143)"),
    Query("st2_action_durations", st2_action_durations,
          ORACLES["st2_action_durations"],
          "ST2 dual ValueState dwell-time sessionization (AnalyzeBrowserEvents.java:115-181)"),
    Query("w3_late_classify", w3_late_classify, ORACLES["w3_late_classify"],
          "W2/W3 watermark + late-data classification (EventTimeOperations.java:88-134)"),
    Query("cep_funnel", cep_funnel, ORACLES["cep_funnel"],
          "CEP funnel view->click->purchase within 12h (FlinkCEP followedBy analog)"),
    Query("cep_funnel_rates", cep_funnel_rates, ORACLES["cep_funnel_rates"],
          "funnel conversion rollup: users + completions per step prefix"),
    Query("j1_window_join_left", j1_window_join_left,
          ORACLES["j1_window_join_left"],
          "J1 windowed LEFT outer stream-stream join (unmatched clicks "
          "kept; Flink CoGroup analog, native Spark join type)"),
    Query("a11_count_window", a11_count_window, ORACLES["a11_count_window"],
          "tumbling count window per key (Flink countWindow analog, "
          "trailing partial kept)"),
    Query("a12_sliding_count_window", a12_sliding_count_window,
          ORACLES["a12_sliding_count_window"],
          "sliding count window per key (Flink countWindow(size, slide): "
          "CountTrigger + CountEvictor semantics)"),
    Query("j6_moving_features", j6_moving_features,
          ORACLES["j6_moving_features"],
          "per-key rolling features: lag/delta/trailing moving sum+count"),
    Query("cl_latest_state", cl_latest_state, ORACLES["cl_latest_state"],
          "changelog apply: per-key last-writer-wins dynamic table "
          "(Flink upsert-stream materialization)"),
    Query("cl_state_summary", cl_state_summary, ORACLES["cl_state_summary"],
          "retract-aware aggregate over the materialized changelog state"),
]
