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
    b = events.groupBy(key).agg(F.min(ts_ms).alias("_mn"),
                                F.max(ts_ms).alias("_mx"))
    grid = (b.select(
                key,
                F.expr(f"(_mn + {step_ms - 1}) div {step_ms} * {step_ms}")
                .alias("_gs"),
                F.expr(f"_mx div {step_ms} * {step_ms}").alias("_ge"))
            .filter(F.col("_gs") <= F.col("_ge"))
            .select(key,
                    F.explode(F.sequence("_gs", "_ge", F.lit(step_ms)))
                    .alias("grid_ms")))
    return asof_join(grid, events, key, "grid_ms", ts_ms, tiebreak=tiebreak)
