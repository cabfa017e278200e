"""Property test: the grid/as-of resample operators equal a direct
sequential reference on random keyed series.

The DataFrame forms compose integer boundary math, an explode grid,
and as-of carries — subtle enough (boundary-at-observation hits, keys
whose span holds no boundary, timestamp collisions, past-last-obs
interpolation fallback) that hypothesis drives both forms over random
inputs including shapes the fixture data never produces.
"""

from __future__ import annotations

import hypo
from hypothesis import given, strategies as st

from demo_apache_flink_streaming_mode_spark.operators.timeseries import (
    moving_features, resample_ffill, resample_interp)

STEP = 10


def _grid_bounds(ts_list):
    lo, hi = min(ts_list), max(ts_list)
    gs = -(-lo // STEP) * STEP
    ge = (hi // STEP) * STEP
    return gs, ge


def _ref_ffill(rows):
    """rows: (key, ts, value, eid). Carry = latest ts <= g, ties ->
    greatest eid. Independent of the DataFrame form."""
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    out = []
    for key, obs in by_key.items():
        gs, ge = _grid_bounds([o[1] for o in obs])
        for g in range(gs, ge + 1, STEP):
            eligible = [o for o in obs if o[1] <= g]
            if not eligible:
                continue
            pick = max(eligible, key=lambda o: (o[1], o[3]))
            out.append((key, g, pick[1], pick[2], pick[3]))
    return sorted(out)


def _ref_interp(rows):
    """rows: (key, ts, value). Lerp between argmax(v) of the latest
    at-or-before ts and argmax(v) of the earliest at-or-after ts."""
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    out = []
    for key, obs in by_key.items():
        gs, ge = _grid_bounds([o[1] for o in obs])
        for g in range(gs, ge + 1, STEP):
            before = [o for o in obs if o[1] <= g]
            after = [o for o in obs if o[1] >= g]
            t0, v0 = max(((o[1], o[2]) for o in before))
            if not after:
                iv = v0
                t1 = v1 = None
            else:
                t1 = min(o[1] for o in after)
                v1 = max(o[2] for o in after if o[1] == t1)
                iv = v0 if t1 == t0 else (
                    v0 + (v1 - v0) * float(g - t0) / float(t1 - t0))
            out.append((key, g, t0, v0, t1, v1, iv))
    return sorted(out)


series_strategy = st.lists(
    st.tuples(st.integers(0, 2),        # key
              st.integers(-59, 59),     # ts incl. NEGATIVE epochs —
                                        # ceil/floor vs truncation diverge
                                        # below zero (pre-1970 data)
              st.integers(-5, 5)),      # value (exact in double)
    min_size=1, max_size=16)


@hypo.budget(25)
@given(series_strategy)
def test_resample_ffill_matches_reference(spark, raw):
    rows = [(k, ts, float(v), eid) for eid, (k, ts, v) in enumerate(raw)]
    df = spark.createDataFrame(rows, "k int, ms long, v double, eid long")
    got = sorted((r["k"], r["grid_ms"], r["ms"], r["v"], r["eid"])
                 for r in resample_ffill(df, "k", "ms", STEP,
                                         tiebreak=["eid"]).collect())
    assert got == _ref_ffill(rows)


@hypo.budget(25)
@given(series_strategy)
def test_resample_interp_matches_reference(spark, raw):
    rows = [(k, ts, float(v)) for k, ts, v in raw]
    df = spark.createDataFrame(rows, "k int, ms long, v double")
    got = sorted((r["k"], r["grid_ms"], r["t0"], r["v0"], r["t1"], r["v1"],
                  r["interp_value"])
                 for r in resample_interp(df, "k", "ms", "v", STEP).collect())
    assert got == _ref_interp(rows)


def _ref_moving(rows, window):
    """rows: (key, ts, eid, value); order = (ts, eid), unique per key.
    Emits (key, eid, prev, delta, moving_sum, n_window) — the literal
    per-key sequential rolling pass the DataFrame form must equal.
    Values are small integers, so every sum is exact in double and the
    comparison is exact equality, no tolerance."""
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    out = []
    for key, obs in by_key.items():
        obs.sort(key=lambda o: (o[1], o[2]))
        for i, (_, _, eid, v) in enumerate(obs):
            prev = obs[i - 1][3] if i > 0 else None
            frame = [o[3] for o in obs[max(0, i - window + 1):i + 1]]
            out.append((key, eid, prev,
                        None if prev is None else v - prev,
                        float(sum(frame)), len(frame)))
    return sorted(out, key=lambda t: (t[0], t[1]))


@hypo.budget(25)
@given(series_strategy, st.integers(1, 4))
def test_moving_features_matches_reference(spark, raw, window):
    # eid disambiguates ts collisions so both forms see one total order
    rows = [(k, ts, eid, float(v)) for eid, (k, ts, v) in enumerate(raw)]
    df = spark.createDataFrame(rows, "k int, ms long, eid long, v double")
    got = sorted(((r["k"], r["eid"], r["prev_value"], r["delta"],
                   r["moving_sum"], r["n_window"])
                  for r in moving_features(df, "k", ["ms", "eid"], "v",
                                           window=window).collect()),
                 key=lambda t: (t[0], t[1]))
    assert got == _ref_moving(rows, window)
