"""Behavior tests for the distributed linear-model trainers
(operators.ml): planted-weight recovery for the closed-form probe, a
strictly decreasing GD learning curve, the dual-path fold contract,
and the safety/portability of the generated Cramer expressions.

(Oracle parity — Spark vs DuckDB hash equality of both queries — runs
in test_correctness.py over the registry like every other query.)
"""

from __future__ import annotations

import re

import pytest

from demo_apache_flink_streaming_mode_spark.operators import ml
from demo_apache_flink_streaming_mode_spark.operators.scale import (
    DETERMINISTIC_FOLDS_CONF)
from demo_apache_flink_streaming_mode_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_probe_recovers_planted_weights(spark, docs):
    """The teacher score IS a linear function of the features
    (weights 0.4/0.4/0.2, zero bias), so least squares must recover it
    to float precision — this is the planted-concept proof that the
    distributed sufficient-statistics pass + Cramer solve genuinely
    train, not just run."""
    rows = {r["feature"]: r for r in ml.train_quality_probe(docs).collect()}
    assert set(rows) == set(ml.QF_FEATURES)
    for name, planted in zip(ml.QF_FEATURES, ml.QF_PLANTED):
        assert rows[name]["planted"] == planted
        assert abs(rows[name]["weight"] - planted) < 1e-6, (name, rows[name])
    # a perfect linear fit classifies every doc exactly like the teacher
    assert all(r["train_acc"] == 1.0 for r in rows.values())


def test_gd_learning_curve_strictly_decreases(spark, docs):
    curve = {r["iter"]: r["mse"] for r in ml.train_quality_gd(docs).collect()}
    assert set(curve) == set(range(ml.QF_GD_ITERS + 1))
    for t in range(1, ml.QF_GD_ITERS + 1):
        assert curve[t] < curve[t - 1], curve
    assert curve[0] > 0.0


def test_logit_curve_decreases_and_classifier_learns(spark, docs):
    """The sigmoidal classifier's squared loss must strictly decrease
    (lr is swept to the largest strictly-stable rate, see QF_LOGIT_LR)
    and the decision accuracy must end meaningfully above the
    untrained model's (w = 0 predicts keep for everything)."""
    rows = {r["iter"]: (r["sq_loss"], r["train_acc"])
            for r in ml.train_quality_logit(docs).collect()}
    assert set(rows) == set(range(ml.QF_LOGIT_ITERS + 1))
    assert rows[0][0] == 0.25  # w=0 -> p=0.5 everywhere, y binary
    for t in range(1, ml.QF_LOGIT_ITERS + 1):
        assert rows[t][0] < rows[t - 1][0], rows
    assert rows[ml.QF_LOGIT_ITERS][1] > rows[0][1] + 0.2


def test_logit_fast_fold_path_matches_within_tolerance(spark, docs):
    """The classifier's production aggregation path (plain F.sum) must
    agree with the parity path's in-id-order folds to float
    tolerance on the whole learning curve."""
    det = {r["iter"]: (r["sq_loss"], r["train_acc"])
           for r in ml.train_quality_logit(docs).collect()}
    spark.conf.set(DETERMINISTIC_FOLDS_CONF, "false")
    try:
        fast = {r["iter"]: (r["sq_loss"], r["train_acc"])
                for r in ml.train_quality_logit(docs).collect()}
    finally:
        spark.conf.unset(DETERMINISTIC_FOLDS_CONF)
    assert set(det) == set(fast)
    for t in det:
        assert abs(det[t][0] - fast[t][0]) < 1e-9
        assert det[t][1] == fast[t][1]  # integer-exact decisions


def test_alg_sigmoid_shape(spark):
    """p(0)=0.5, monotone, symmetric, saturating — the properties that
    make the rational softsign a drop-in sigmoid."""
    import pyspark.sql.functions as F
    df = spark.range(1).select(
        *[ml._alg_sigmoid(F.lit(z)).alias(f"p{i}")
          for i, z in enumerate([-1e9, -2.0, -0.5, 0.0, 0.5, 2.0, 1e9])])
    p = list(df.collect()[0])
    assert p[3] == 0.5
    assert all(p[i] < p[i + 1] for i in range(len(p) - 1))
    assert p[0] > 0.0 and p[-1] < 1.0  # saturates but never reaches
    assert abs((1 - p[1]) - p[5]) < 1e-15  # symmetry around 0.5


def test_fast_fold_path_matches_within_tolerance(spark, docs):
    """The production aggregation path (plain F.sum partial
    aggregation, bounded memory) must agree with the parity path's
    in-doc_id-order folds to float tolerance, and its plan must not
    buffer the corpus (no collect_list)."""
    det = {r["feature"]: r["weight"]
           for r in ml.train_quality_probe(docs).collect()}
    feats = ml.quality_filter_features(docs)
    spark.conf.set(DETERMINISTIC_FOLDS_CONF, "false")
    try:
        fast = {r["feature"]: r["weight"]
                for r in ml.train_quality_probe(docs).collect()}
        # the fast path's stats plan must aggregate without buffering
        # the corpus into lists: inspect the exact aggregation
        # _fold_sum builds under the toggled conf
        import pyspark.sql.functions as F
        from demo_apache_flink_streaming_mode_spark.operators.scale import (
            deterministic_folds)
        assert not deterministic_folds(feats)
        agg_plan = (feats.agg(F.sum(feats["x1"] * feats["x1"]).alias("a00"))
                    ._jdf.queryExecution().optimizedPlan().toString())
        assert "collect_list" not in agg_plan
    finally:
        spark.conf.unset(DETERMINISTIC_FOLDS_CONF)
    for k in det:
        assert abs(det[k] - fast[k]) < 1e-9, (k, det[k], fast[k])


def test_cramer_exprs_are_portable_and_safe():
    """The generated determinant expressions are shared verbatim
    between Python eval and the DuckDB oracle: only names, digits,
    + - * / and parens may appear (identical precedence and left
    association in both languages), and eval runs with no builtins."""
    exprs = ml.cramer_weight_exprs()
    assert len(exprs) == ml.QF_D
    tok = re.compile(r"^[a-z0-9_\s()+\-*/]+$")
    for e in exprs:
        assert tok.match(e), e
        assert "__" not in e
    # solving the identity system recovers b exactly
    stats = {n: 0.0 for n in ml.GRAM_NAMES}
    for i in range(ml.QF_D):
        stats[f"a{i}{i}"] = 1.0
    for i, v in enumerate((2.0, -3.0, 0.5, 7.0)):
        stats[f"b{i}"] = v
    w = [eval(e, {"__builtins__": {}}, dict(stats)) for e in exprs]
    assert w == [2.0, -3.0, 0.5, 7.0]
    # the production ast interpreter is BIT-IDENTICAL to Python eval on
    # every generated expression (same parse tree, same IEEE op order)
    # — eval stays here as the independent cross-check of eval_arith
    import random
    rnd = random.Random(13)
    noisy = {n: rnd.uniform(-2, 2)
             for n in (*ml.GRAM_NAMES, *ml.MOMENT_NAMES)}
    for e in (*exprs, ml.cramer_det_expr()):
        assert ml.eval_arith(e, noisy) == eval(
            e, {"__builtins__": {}}, dict(noisy))


def test_zero_token_docs_train_as_rejected_rows(spark):
    """Degenerate documents (no tokens) must coalesce to all-zero
    features and s = 0 instead of NULL, so they flow through training
    instead of nulling every fold."""
    docs = spark.createDataFrame(
        [(1, "", "a"), (2, "real words here", "a")],
        "doc_id long, text string, source string")
    feats = ml.quality_filter_features(docs).collect()
    empty = next(r for r in feats if r["doc_id"] == 1)
    assert (empty["x2"], empty["x3"], empty["x4"], empty["s"]) == (0, 0, 0, 0)
    curve = ml.train_quality_gd(docs).collect()
    assert all(r["mse"] is not None for r in curve)


def test_calibration_buckets_partition_and_align(spark, docs):
    """The reliability diagram partitions the corpus (bucket counts sum
    to |docs|, bucket ids within range), and because the probe recovers
    the planted teacher EXACTLY (to fp), predicted and teacher means
    per bin must agree to float tolerance — a perfectly calibrated
    model is the planted-concept fixture's ground truth. Keep counts
    must likewise agree and total the apply-pass keep count."""
    rep = ml.calibration_report(docs).collect()
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in rep) == n_docs
    assert all(0 <= r["bucket"] < ml.QF_CAL_BUCKETS for r in rep)
    assert len(set(r["bucket"] for r in rep)) == len(rep)
    for r in rep:
        assert r["cal_gap"] == abs(r["mean_pred"] - r["mean_teacher"])
        assert r["cal_gap"] < 1e-6, r
        assert r["n_keep_pred"] == r["n_keep_teacher"]
    n_keep = sum(r["n_keep_pred"] for r in rep)
    applied = ml.train_and_filter(docs)
    assert n_keep == applied.filter("keep").count()


def test_pipeline_single_training_pass(spark, docs, monkeypatch):
    """The composed train->apply->calibrate pipeline runs EXACTLY ONE
    training aggregation (the r9 verdict item): fit_quality_weights is
    invoked once for the whole pipeline, and threading ``weights=``
    into the standalone surfaces skips training entirely."""
    calls = []
    real = ml.fit_quality_weights
    monkeypatch.setattr(
        ml, "fit_quality_weights",
        lambda feats: (calls.append(1), real(feats))[1])
    out = ml.train_apply_calibrate(docs).persist()
    assert out.count() == docs.count()
    assert calls == [1], "composed pipeline must train exactly once"
    calls.clear()
    w = list(ml.QF_PLANTED)
    kept = ml.train_and_filter(docs, weights=w)
    cal = ml.calibration_report(docs, weights=w)
    assert kept.count() == docs.count()
    assert cal.count() <= ml.QF_CAL_BUCKETS
    assert calls == [], "weights= must skip the training aggregation"
    out.unpersist()


def test_pipeline_matches_standalone_surfaces(spark, docs):
    """Row-for-row: the pipeline's serve columns equal
    train_and_filter's output and its bucket annotation equals
    calibration_report's (n_docs, cal_gap) for that bucket — the
    composition changes the plan (one training pass, broadcast-back
    annotate), never the semantics."""
    pipe = ml.train_apply_calibrate(docs).persist()
    serve = {r["doc_id"]: (r["pred_score"], r["keep"])
             for r in ml.train_and_filter(docs).collect()}
    for r in pipe.collect():
        assert serve[r["doc_id"]] == (r["pred_score"], r["keep"])
    cal = {r["bucket"]: (r["n_docs"], r["cal_gap"])
           for r in ml.calibration_report(docs).collect()}
    for r in pipe.select("bucket", "bucket_n_docs",
                         "bucket_cal_gap").distinct().collect():
        assert cal[r["bucket"]] == (r["bucket_n_docs"],
                                    r["bucket_cal_gap"])
    # the bucket annotation must come back as a broadcast, never a
    # corpus-sized shuffle join
    plan = pipe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    pipe.unpersist()


def test_calibration_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert ml.calibration_report(docs).count() == 0


# --- property: the generated Cramer solve recovers planted weights ---------

import hypo
from hypothesis import assume, given, strategies as st

_corpus = st.lists(
    st.tuples(st.floats(0, 1, allow_nan=False, width=32),
              st.floats(0, 1, allow_nan=False, width=32),
              st.floats(0, 1, allow_nan=False, width=32)),
    min_size=4, max_size=60)


@hypo.budget(30)
@given(_corpus, st.tuples(*[st.floats(-2, 2, allow_nan=False, width=32)
                            for _ in range(4)]))
def test_cramer_solve_recovers_any_planted_weights(rows, planted):
    """For ANY bounded feature matrix whose Gram system is well
    conditioned, least squares on a target that IS linear in the
    features must hand back the planted weights — hypothesis hunts the
    generated determinant expansions for an ordering/sign slip that a
    single fixture corpus would never expose."""
    X = [(1.0, a, b, c) for a, b, c in rows]
    s = [planted[0] * x[0] + planted[1] * x[1] + planted[2] * x[2]
         + planted[3] * x[3] for x in X]
    stats = {}
    for i in range(ml.QF_D):
        for j in range(i, ml.QF_D):
            stats[f"a{i}{j}"] = sum(x[i] * x[j] for x in X)
        stats[f"b{i}"] = sum(x[i] * t for x, t in zip(X, s))
    exprs = ml.cramer_weight_exprs()
    det_a = eval(ml.cramer_det_expr(), {"__builtins__": {}}, dict(stats))
    assume(abs(det_a) > 1e-6)
    w = [eval(e, {"__builtins__": {}}, dict(stats)) for e in exprs]
    for got, want in zip(w, planted):
        assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (w, planted)
