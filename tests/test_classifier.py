"""Distributed logistic regression: trajectory parity vs a dense numpy
replay, loss monotonicity, and distillation accuracy vs the labeling
gate."""

from __future__ import annotations

from lakehouse_for_data_streaming_and_analysis_spark.analytics import classifier
from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table
from lakehouse_for_data_streaming_and_analysis_spark.queries.training import (
    XCOLS,
    classifier_features,
    quality_classifier_scores,
)

from .conftest import SF_DIR

ITERS = 10


def _features(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return classifier.standardize(
        classifier_features(docs), XCOLS
    ).localCheckpoint(eager=True)


def test_gd_trajectory_matches_numpy(spark):
    feats = _features(spark)
    model = classifier.logreg_fit(feats, XCOLS, "label", iters=ITERS)
    rows = feats.select(*XCOLS, "label").collect()
    X = [[r[c] for c in XCOLS] for r in rows]
    y = [r.label for r in rows]
    want = classifier.numpy_replay(X, y, iters=ITERS)
    for got_w, want_w in zip(
        model["weights"] + [model["bias"]],
        want["weights"] + [want["bias"]],
    ):
        assert abs(got_w - want_w) < 1e-6, (model, want)
    for got_l, want_l in zip(model["losses"], want["losses"]):
        assert abs(got_l - want_l) < 1e-8


def test_loss_decreases(spark):
    model = classifier.logreg_fit(
        _features(spark), XCOLS, "label", iters=ITERS
    )
    losses = model["losses"]
    assert losses[-1] < losses[0]
    # Newton converges: the last steps are essentially at the optimum
    assert abs(losses[-1] - losses[-2]) < 1e-6


def test_distillation_accuracy(spark):
    out = quality_classifier_scores(spark, SF_DIR, iters=10).collect()
    n = len(out)
    correct = sum(1 for r in out if r.predicted == r.label)
    assert n > 0
    # the gate is a near-linear rule of these features; the distilled
    # model should reproduce it on the large majority of docs
    assert correct / n >= 0.85, f"accuracy {correct}/{n}"
    assert all(0.0 <= r.score <= 1.0 for r in out)
