"""Property-based tests (hypothesis) for the self-contained numeric
cores — invariants that must hold for ANY input series, not just the
fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from lakehouse_for_data_streaming_and_analysis_spark.analytics import timeseries

finite_series = arrays(
    np.float64,
    st.integers(min_value=30, max_value=200),
    elements=st.floats(
        min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
    ),
)


@settings(max_examples=25, deadline=None)
@given(finite_series)
def test_ljung_box_nonnegative(y):
    if np.allclose(y, y[0]):
        return  # constant series: acf undefined
    q = timeseries.ljung_box_q(y, lags=5)
    assert q >= 0 and np.isfinite(q)


@settings(max_examples=25, deadline=None)
@given(finite_series)
def test_garch_fit_invariants(y):
    if np.allclose(y, y[0]):
        return
    omega, a, b, ll, nxt = timeseries.garch11_fit(y)
    assert a + b < 0.999
    assert omega >= 0
    assert nxt >= 0 and np.isfinite(nxt)
    assert np.isfinite(ll)


@settings(max_examples=25, deadline=None)
@given(finite_series, st.integers(min_value=1, max_value=3))
def test_ar_forecast_shape_and_growing_uncertainty(y, p):
    if np.allclose(y, y[0]):
        return
    fc, err, beta = timeseries.ar_fit_forecast(y, p=p, horizon=6)
    assert fc.shape == (6,) and err.shape == (6,)
    assert len(beta) == p + 1
    # forecast-error std is non-decreasing in horizon
    assert all(err[i] <= err[i + 1] + 1e-9 for i in range(5))


@settings(max_examples=25, deadline=None)
@given(finite_series)
def test_adf_stat_finite_for_varying_series(y):
    if np.std(np.diff(y)) < 1e-9:
        return  # (near-)deterministic trend: regression degenerate
    t, nobs = timeseries.adf_stat(y, max_lag=1)
    assert nobs == len(y) - 2
    if not np.isfinite(t):
        # nan is the documented contract for a rank-deficient design
        # (e.g. y = [1, 0, 0, ...]: the lagged-level column is all
        # zeros) — verify the design really is degenerate, so nan can
        # never mask a numeric bug on a well-posed series.
        dy = np.diff(y)
        x = np.column_stack([np.ones(len(dy) - 1), y[1:-1], dy[:-1]])
        assert np.linalg.matrix_rank(x) < x.shape[1]
        return
    assert np.isfinite(t)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.1, max_value=100, allow_nan=False),
        min_size=5,
        max_size=50,
    )
)
def test_walk_forward_errors_bounded_by_range(values):
    """1-step AR errors can't exceed ~the series' dynamic range when
    the series is bounded (sanity bound on the refit loop)."""
    y = np.array(values)
    if np.allclose(y, y[0]):
        return
    fc, _, _ = timeseries.ar_fit_forecast(y, p=1, horizon=1)
    assert np.isfinite(fc[0])
