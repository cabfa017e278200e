"""Benchmark harness: run every registry query at the bench scale factor
and print the contract JSON line {"metric", "value", "unit", "queries",
"sf"} followed by a compact headline line (the FINAL stdout line must
fit the driver's 2000-char tail window — see the stdout-contract note
in main()).

Each query executes its full physical plan into Spark's noop sink (no
driver-side collect, no Python in the result path) so the measured time
is the engine, not the harness.

Structure (deadline-bounded — the harness ALWAYS terminates):
1. untimed warm-up pass at a small SF (compiles the same codegen
   classes, C2-heats the expression paths) — skipped when the budget
   runs short;
2. timed pass at the bench SF (always completes — it produces the
   numbers);
3. best-effort second timed pass taking the per-query min, because the
   host shows bursty multi-second interference stalls (hypervisor
   steal) and min-of-N isolates engine time from environment noise.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default all cores), SPARK_GRAFT_WARM_DIR,
SPARK_GRAFT_BENCH_BUDGET seconds (default: 14 s/query over the
registry, floored at 2200 — sized so an unattended run completes
min-of-5 for every query; the old 420 s default guaranteed every
driver-side artifact carried the UNDER-BUDGET banner).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo_apache_flink_streaming_mode_spark.plans.registry import ALL_QUERIES
from demo_apache_flink_streaming_mode_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Default budget scales with the registry (~14 s/query covers warmup
    # + 5 timed passes at sf0.1 on this host class, measured r8:
    # 159 queries ~ 2200 s), so the no-env-var run — the one the driver
    # executes — produces a committable min-of-5 artifact.
    default_budget = max(2200, 14 * len(ALL_QUERIES))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET",
                                  str(default_budget)))
    deadline = time.monotonic() + budget
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    def log(msg: str) -> None:
        print(msg, file=sys.stderr, flush=True)

    def run(q, d: str) -> float:
        t0 = time.perf_counter()
        q.fn(spark, d).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        # Release per-invocation persisted frames (knn_agreement_report
        # caches a bounded survivor frame per call and cannot unpersist
        # its own lazy plan) — and keep later passes honest: Spark's
        # CacheManager matches by logical plan, so without this a
        # repeat pass would silently reuse the previous pass's cache
        # instead of re-measuring the materialization.
        spark.catalog.clearCache()
        return dt

    spark = get_spark("bench")

    # Host calibration: one fixed synthetic job (no I/O, no query code)
    # run twice up front, keeping the second time. Bench hosts differ
    # across rounds — divide two rounds' calib_s to get the host-speed
    # ratio, and normalize per-query times by it before reading a
    # round-over-round delta as a regression.
    calib = None
    for _ in range(2):  # 2nd run: steady-state CPU, no codegen/JIT compile
        t0 = time.perf_counter()
        (spark.range(0, 200_000_000, 1, 32)
         .selectExpr("bit_xor(xxhash64(id)) as h")
         .write.format("noop").mode("overwrite").save())
        calib = round(time.perf_counter() - t0, 3)
    log(f"calib_s={calib}")

    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    # Warmup is capped at 25% of budget (the registry outgrew the old
    # 40% share: at 100+ queries it starved the re-pass phase, and a
    # 1-pass bench reads as a phantom regression). Priority order:
    # queries with no prior timing first (coldest codegen, least
    # predictable), then slowest-known first (most JIT surface) — the
    # prior comes from the committed side file when present.
    prior: dict[str, float] = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_result.json")) as f:
            prior = json.load(f).get("queries", {})
    except (OSError, ValueError):
        pass
    warm_order = sorted(ALL_QUERIES,
                        key=lambda q: (q.name in prior,
                                       -prior.get(q.name, 0.0)))
    for q in warm_order:
        if time.monotonic() > deadline - 0.75 * budget:
            log(f"warmup budget exhausted at {q.name}")
            break
        run(q, warm_dir)
    log(f"warmup done t={budget - (deadline - time.monotonic()):.0f}s")

    passes: dict[str, list[float]] = {q.name: [] for q in ALL_QUERIES}
    for q in ALL_QUERIES:  # pass 1: always completes
        passes[q.name].append(run(q, sf_dir))
        log(f"p1 {q.name}: {passes[q.name][-1]}s")
    # passes 2..N: best-effort min within budget. The host shows bursty
    # multi-second hypervisor-steal stalls; per-query min over as many
    # passes as the budget allows isolates engine time from that noise.
    for p in range(2, 6):
        if time.monotonic() > deadline:
            break
        # least-measured first, slowest-so-far next: when the budget
        # dies mid-pass, the extra samples went to the queries whose
        # current min is most noise-prone (a single JIT-cold timing),
        # not to whatever happened to sit early in registry order
        order = sorted(ALL_QUERIES,
                       key=lambda q: (len(passes[q.name]),
                                      -min(passes[q.name])))
        for q in order:
            if time.monotonic() > deadline:
                log(f"pass-{p} budget exhausted at {q.name}")
                break
            dt = run(q, sf_dir)
            log(f"p{p} {q.name}: {dt}s")
            passes[q.name].append(dt)

    # Headline value is min-of-N. The driver parses the FINAL stdout
    # line from a bounded tail window; r02 and r03 both overflowed it by
    # inlining the 74-entry per-query dict ("parsed": null). So the
    # stdout line is now compact (fits any tail window) and the full
    # per-query min map + per-pass raws live in committed side files.
    timings = {name: min(ts) for name, ts in passes.items()}
    total = round(sum(timings.values()), 3)
    log("passes: " + json.dumps(passes))
    # Under-budget guard: a run where pass 2 never reached a query left
    # that query with ONE (JIT-cold, noise-exposed) sample — committed
    # benchmark artifacts must never silently carry such numbers (the
    # r4 postmortem: a 1-pass run raw-read 2x slower than reality).
    # One threshold drives BOTH the flag and the warning (r5 ADVICE:
    # the flag flipped at 1 single-sample query but the warning only
    # printed past 10%, so 1-12 under-sampled queries passed silently),
    # and an under-budget run's side files are quarantined under
    # *.UNDERBUDGET.json so the committable names always hold min-of-N.
    n_single = sum(1 for ts in passes.values() if len(ts) < 2)
    committable = n_single == 0
    # Flag contract (r7 VERDICT item 2 — the old `passes_complete` name
    # promised all-5 but its threshold was >= 2): `committable` gates
    # the quarantine (every query min-of->=2); `passes_complete` now
    # means exactly what it says (every query got all 5 passes);
    # `min_samples`/`sample_histogram` state the actual N so the README
    # claim can be checked against the artifact.
    min_samples = min(len(ts) for ts in passes.values())
    passes_complete = min_samples == 5
    hist: dict[int, int] = {}
    for ts in passes.values():
        hist[len(ts)] = hist.get(len(ts), 0) + 1
    if not committable:
        log(f"*** WARNING: {n_single}/{len(passes)} queries have a single "
            "sample — this run is UNDER-BUDGET and NOT a committable "
            "benchmark. Re-run with a larger SPARK_GRAFT_BENCH_BUDGET "
            f"(default {default_budget}) on a quiet host. Side files "
            "quarantined as *.UNDERBUDGET.json. ***")
    here = os.path.dirname(os.path.abspath(__file__))
    result = {
        "metric": "total_query_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calib_s": calib,
        "committable": committable,
        "passes_complete": passes_complete,
        "min_samples": min_samples,
        "sample_histogram": {str(k): v for k, v in sorted(hist.items())},
    }
    suffix = ".json" if committable else ".UNDERBUDGET.json"
    for fname, payload in ((f"bench_passes{suffix}", passes),
                           (f"bench_result{suffix}", result)):
        try:
            with open(os.path.join(here, fname), "w") as f:
                json.dump(payload, f, indent=1)
        except OSError as e:  # side data must never sink the headline line
            log(f"could not write {fname}: {e}")
    # Per-query stdout contract (r11 VERDICT item 1): the full contract
    # line {"metric", "value", "unit", "queries", "sf"} goes to stdout
    # so any consumer reading the whole stream gets the per-query min
    # map — but it CANNOT be the final line: the driver parses the last
    # line from a 2000-char tail window (measured: every BENCH_rNN.json
    # carries len(tail) == 2000, and the r02/r03 runs that inlined the
    # map in the final line recorded parsed: null), while the 192 query
    # NAMES alone total 3300 chars. So the full line prints first and a
    # compact, always-parseable headline stays last. Values are
    # 2-decimal (the map is a summary; side files keep 3-decimal mins
    # and all raw passes).
    print(json.dumps({
        "metric": "total_query_runtime",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf,
    }, separators=(",", ":")))
    print(json.dumps({
        "metric": "total_query_runtime",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "sf": sf,
        "calib_s": calib,
        "committable": committable,
        "passes_complete": passes_complete,
        "min_samples": min_samples,
        "queries_file": f"bench_result{suffix}",
    }))


if __name__ == "__main__":
    main()
