"""Time-series resampling: regular-grid alignment with forward fill.

The classic telemetry/feature-store operator the DataFrame API lacks:
project each key's irregular observations onto a fixed-step grid, each
grid point carrying the latest observation at or before it. Composed
entirely from existing engine pieces — a bounds aggregate, a narrow
``sequence``/``explode`` grid, and the single-shuffle as-of carry
(``operators.joins.asof_join``) — so there is no range join and no
per-point probe anywhere.

Scale notes: the bounds aggregate is map-side combinable; grid size is
span/step rows per key (choose ``step_ms`` so that is bounded — a
years-long sparse key at 1 s step would dominate its partition); the
fill inherits asof_join's one-shuffle-one-sort shape and is therefore
skew-bound by the hottest key, same as any keyed window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from demo_apache_flink_streaming_mode_spark.operators.joins import asof_join


def resample_ffill(events: DataFrame, key: str, ts_ms: str,
                   step_ms: int,
                   tiebreak: list[str] | None = None) -> DataFrame:
    """Per key, emit one row per grid point ``grid_ms`` in
    ``[ceil(min_ts/step)*step, floor(max_ts/step)*step]`` carrying the
    latest observation (every non-key column of ``events``) with
    ``ts_ms <= grid_ms``.

    The grid starts at the first step boundary AT OR AFTER the key's
    first observation, so forward fill is never null by construction;
    keys whose span contains no boundary emit nothing. Observations
    colliding on (key, ts) resolve to the greatest by ``tiebreak``
    (asof_join semantics). Integer-only boundary math (``div``), so
    the grid is engine-portable at any epoch magnitude.
    """
    grid = _grid(events, key, ts_ms, step_ms)
    return asof_join(grid, events, key, "grid_ms", ts_ms, tiebreak=tiebreak)


def _grid(events: DataFrame, key: str, ts_ms: str,
          step_ms: int) -> DataFrame:
    # true ceil/floor boundaries at ANY sign: `div` truncates toward
    # zero (so does DuckDB's `//`), which only equals ceil/floor for
    # non-negative timestamps — the remainder term corrects pre-1970
    # epochs. `%` carries the dividend's sign on both engines.
    b = events.groupBy(key).agg(F.min(ts_ms).alias("_mn"),
                                F.max(ts_ms).alias("_mx"))
    ceil_gs = (f"((_mn div {step_ms}) + (CASE WHEN _mn % {step_ms} > 0 "
               f"THEN 1 ELSE 0 END)) * {step_ms}")
    floor_ge = (f"((_mx div {step_ms}) - (CASE WHEN _mx % {step_ms} < 0 "
                f"THEN 1 ELSE 0 END)) * {step_ms}")
    return (b.select(key,
                     F.expr(ceil_gs).alias("_gs"),
                     F.expr(floor_ge).alias("_ge"))
            .filter(F.col("_gs") <= F.col("_ge"))
            .select(key,
                    F.explode(F.sequence("_gs", "_ge", F.lit(step_ms)))
                    .alias("grid_ms")))


def resample_interp(events: DataFrame, key: str, ts_ms: str, value: str,
                    step_ms: int) -> DataFrame:
    """Linear-interpolation resample: per grid point, ``interp_value``
    lerps between the latest observation at-or-before and the earliest
    at-or-after; a grid point past the last observation carries the
    last value (degenerating to forward fill), and an exact-hit grid
    point returns the observation itself (both as-of legs agree).

    The forward leg reuses the SAME backward as-of operator on negated
    timestamps (latest ``-ts <= -grid`` == earliest ``ts >= grid``),
    so both directions are the one-shuffle carry — still no range
    join. Collisions on (key, ts) resolve to the greatest value on
    both legs (ORDER-BY-payload asof tiebreak), mirrored in the
    oracle. The lerp ``v0 + (v1 - v0) * (g - t0) / (t1 - t0)`` is a
    fixed IEEE chain, engine-portable.
    """
    grid = _grid(events, key, ts_ms, step_ms)
    back = events.select(key, F.col(ts_ms).alias("t0"),
                         F.col(value).alias("v0"))
    fwd = events.select(key, (-F.col(ts_ms)).alias("_nt"),
                        F.col(ts_ms).alias("t1"), F.col(value).alias("v1"))
    g0 = asof_join(grid, back, key, "grid_ms", "t0", tiebreak=["v0"])
    g0 = g0.withColumn("_ng", -F.col("grid_ms"))
    # forward as-of: tiebreak must make (t1, v1) resolve to the
    # greatest v1 among equal ts — _nt equal => t1 equal, order by v1
    g01 = asof_join(g0, fwd, key, "_ng", "_nt", tiebreak=["v1"])
    interp = (F.when(F.col("t1").isNull(), F.col("v0"))
              .when(F.col("t1") == F.col("t0"), F.col("v0"))
              .otherwise(
                  F.col("v0")
                  + (F.col("v1") - F.col("v0"))
                  * (F.col("grid_ms") - F.col("t0")).cast("double")
                  / (F.col("t1") - F.col("t0")).cast("double")))
    return g01.select(key, "grid_ms", "t0", "v0", "t1", "v1",
                      interp.alias("interp_value"))


def moving_features(df: DataFrame, key: str, order: list[str], value: str,
                    window: int = 3) -> DataFrame:
    """Per-key rolling feature extraction — the standard pass that turns
    an event stream into model features: previous value, delta, and a
    trailing ``window``-row moving sum/count (callers derive the moving
    average; sum+count are emitted instead of ``avg`` because windowed
    DECIMAL sums are exact and order-free on every engine, while a
    windowed double ``avg``'s addition order is engine-internal —
    DuckDB's segment-tree accumulation vs Spark's frame-order fold
    could differ in the last ulp).

    One shuffle on the key; every frame is bounded at ``window`` rows,
    so no unbounded buffering at any key size — the same cost class as
    any keyed window at 100 TB.
    """
    from pyspark.sql import Window as W
    w = W.partitionBy(key).orderBy(*order)
    wa = w.rowsBetween(-(window - 1), 0)
    lag = F.lag(value).over(w)
    return df.withColumn("prev_value", lag) \
             .withColumn("delta", F.col(value) - lag) \
             .withColumn("moving_sum",
                         F.sum(F.col(value).cast("decimal(38,6)")).over(wa)
                         .cast("double")) \
             .withColumn("n_window", F.count(value).over(wa))
