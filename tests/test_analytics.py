"""M5 analytics layer: oracle matches for the SQL-expressible feature
queries and property checks for the grouped-map model fits
(SURVEY.md §2.13 X3-X10)."""

from __future__ import annotations

import numpy as np
import pytest

from lakehouse_for_data_streaming_and_analysis_spark.analytics import timeseries
from lakehouse_for_data_streaming_and_analysis_spark.queries import analytics

from .conftest import SF_DIR
from .util import assert_matches_oracle

ORACLE_KEYS = sorted(analytics.ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_analytics_oracle(spark, duck, name):
    assert_matches_oracle(
        analytics.QUERIES[name](spark, SF_DIR), duck, analytics.ORACLES[name]
    )


def test_adf_distinguishes_random_walk_from_noise():
    rng = np.random.RandomState(7)
    noise = rng.standard_normal(500)
    walk = np.cumsum(noise)
    t_noise, _ = timeseries.adf_stat(noise, max_lag=1)
    t_walk, _ = timeseries.adf_stat(walk, max_lag=1)
    assert t_noise < timeseries.ADF_CRIT_CONST["5%"]  # stationary: reject unit root
    assert t_walk > timeseries.ADF_CRIT_CONST["5%"]  # random walk: fail to reject


def test_ljung_box_detects_autocorrelation():
    rng = np.random.RandomState(3)
    noise = rng.standard_normal(400)
    ar = np.zeros(400)
    for t in range(1, 400):
        ar[t] = 0.7 * ar[t - 1] + noise[t]
    assert timeseries.ljung_box_q(noise, 10) < timeseries.CHI2_CRIT_5PCT[10]
    assert timeseries.ljung_box_q(ar, 10) > timeseries.CHI2_CRIT_5PCT[10]


def test_ar_forecast_recovers_ar1_coefficient():
    rng = np.random.RandomState(11)
    y = np.zeros(2000)
    for t in range(1, 2000):
        y[t] = 1.0 + 0.6 * y[t - 1] + 0.1 * rng.standard_normal()
    fc, err, beta = timeseries.ar_fit_forecast(y, p=1, horizon=5)
    assert abs(beta[1] - 0.6) < 0.05
    # forecast-error std grows with horizon (psi-weight accumulation)
    assert all(err[i] <= err[i + 1] + 1e-12 for i in range(4))


def test_garch_fit_on_garch_data():
    rng = np.random.RandomState(5)
    n, omega, a, b = 3000, 0.1, 0.12, 0.8
    r = np.zeros(n)
    h = omega / (1 - a - b)
    for t in range(1, n):
        h = omega + a * r[t - 1] ** 2 + b * h
        r[t] = np.sqrt(h) * rng.standard_normal()
    w_, a_, b_, ll, nxt = timeseries.garch11_fit(r)
    assert abs(a_ - a) < 0.08 and abs(b_ - b) < 0.12
    assert nxt > 0 and np.isfinite(ll)


def test_ar_intervals_ordered(spark):
    rows = analytics.ar_forecast_intervals(spark, SF_DIR).collect()
    assert len(rows) == 5 * 5  # 5 series x 5 steps
    for r in rows:
        assert r.lo_95 <= r.lo_80 <= r.yhat <= r.hi_80 <= r.hi_95


def test_cv_split_counts(spark):
    rows = analytics.rolling_origin_cv(spark, SF_DIR).collect()
    by = {(r.event_type, r.fold, r.role): r.n_rows for r in rows}
    test_counts = {k: v for k, v in by.items() if k[2] == "test"}
    assert all(v == 24 for v in test_counts.values())
    # later folds have strictly larger training windows (step = 24)
    for et in {k[0] for k in by}:
        assert by[(et, 1, "train")] == by[(et, 0, "train")] + 24
        assert by[(et, 2, "train")] == by[(et, 1, "train")] + 24
