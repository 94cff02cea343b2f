"""Cross-implementation pins for the fixture-literal oracle replays.

The optimizer-loop oracles (DECISIONS.md §14) embed parameters
recomputed by INDEPENDENT reimplementations in queries/analytics.py and
queries/training.py. These tests pin each replay against the package's
distributed/numpy implementation on synthetic data — if either side
drifts, the disagreement surfaces here first (and would fail the
driver hash next).
"""

from __future__ import annotations

import numpy as np
import pytest

from lakehouse_for_data_streaming_and_analysis_spark.analytics import timeseries
from lakehouse_for_data_streaming_and_analysis_spark.queries import analytics as qa
from lakehouse_for_data_streaming_and_analysis_spark.queries import training as qt


def _synth_returns(n=300, seed=7):
    rng = np.random.RandomState(seed)
    # GARCH(1,1)-ish synthetic returns: volatility clustering
    h, r = 1.0, []
    for _ in range(n):
        h = 0.1 + 0.1 * (r[-1] ** 2 if r else 1.0) + 0.8 * h
        r.append(float(rng.standard_normal()) * h ** 0.5)
    return np.asarray(r)


def _synth_levels(n=300, seed=11):
    rng = np.random.RandomState(seed)
    y = [100.0, 101.0]
    for _ in range(n - 2):
        y.append(5.0 + 0.6 * y[-1] + 0.3 * y[-2] + float(rng.standard_normal()))
    return np.asarray(y)


def test_indep_garch11_matches_package():
    r = _synth_returns()
    want = timeseries.garch11_fit(r)
    got = qa._indep_garch11(list(r))
    assert got[1] == want[1] and got[2] == want[2]  # alpha, beta exact
    assert got[0] == pytest.approx(want[0], abs=1e-12)  # omega
    assert got[3] == pytest.approx(want[3], rel=1e-12)  # loglik
    assert got[4] == pytest.approx(want[4], rel=1e-12)  # next_sigma


def test_indep_garch_pq_matches_package():
    r = _synth_returns(n=200, seed=3)
    for p, q in ((1, 1), (1, 2), (2, 1), (2, 2)):
        _, _, _, ll_want, k_want = timeseries.garch_pq_fit(r, p, q)
        ll_got, k_got = qa._indep_garch_pq(list(r), p, q)
        assert k_got == k_want
        assert ll_got == pytest.approx(ll_want, rel=1e-10), (p, q)


def test_indep_arima_search_matches_package():
    y = _synth_levels()
    want = timeseries.arima_order_search(y)
    got = qa._indep_arima_search([float(v) for v in y])
    assert (got[0], got[1], got[2]) == (want[0], want[1], want[2])
    assert got[3] == pytest.approx(want[3], rel=1e-8)
    assert got[4] == pytest.approx(want[4], rel=1e-8)


def test_indep_ar2_matches_lstsq():
    y = _synth_levels(n=150, seed=5)
    fc, _, beta = timeseries.ar_fit_forecast(y, 2, 1)
    b0, p1, p2, resid = qa._ar2_normal_eq([float(v) for v in y])
    assert b0 == pytest.approx(float(beta[0]), rel=1e-9)
    assert p1 == pytest.approx(float(beta[1]), rel=1e-9)
    assert p2 == pytest.approx(float(beta[2]), rel=1e-9)


def test_sequential_bpe_matches_test_reference():
    """Two independent sequential BPEs (the oracle replay and the
    test-side reference that pins the distributed operator) must
    produce the identical merge sequence."""
    from .test_bpe import _python_bpe

    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges, vocab = qt._sequential_bpe(counts, 8)
    want = _python_bpe(counts, 8)[0]
    got = [
        {"rank": r, "left": a, "right": b, "merged": m, "pair_count": c}
        for r, a, b, m, c in merges
    ]
    assert got == want
    assert all(n >= 1 for n in vocab.values())
