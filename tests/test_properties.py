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


# ---------------------------------------------------------------- delta log
# The VERSION_CHECKSUM writer computes its summary INCREMENTALLY from
# each commit's own actions (delta/table.py _commit_next); the
# validator recomputes by FULL REPLAY (delta/log.py
# validate_version_checksum). Those two paths must agree for ANY
# action sequence — including re-adds of a live path with a new size,
# removes, and replay that resumes from a mid-history checkpoint.


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["add", "readd", "remove"]),
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=1, max_value=10_000),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=11),
)
def test_incremental_checksum_equals_replay(tmp_path_factory, ops, cp_at):
    import json as _json

    from lakehouse_for_data_streaming_and_analysis_spark.delta import log as dlog

    root = str(tmp_path_factory.mktemp("crcfuzz"))
    dlog.write_commit(
        root,
        0,
        [
            {"metaData": {"id": "fuzz", "schemaString": _json.dumps(
                {"type": "struct", "fields": []}), "partitionColumns": [],
                "configuration": {}}},
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        ],
    )
    files: dict[str, dict] = {}
    dlog.write_version_checksum(root, 0, files)
    v = 0
    for kind, idx, size in ops:
        path = f"p{idx}.parquet"
        if kind == "remove" and not files:
            continue
        if kind == "remove":
            path = sorted(files)[idx % len(files)]
            actions = [{"remove": {"path": path, "dataChange": True,
                                   "deletionTimestamp": 1}}]
        else:
            if kind == "readd" and files:
                path = sorted(files)[idx % len(files)]
            actions = [{"add": {"path": path, "partitionValues": {},
                                "size": size, "modificationTime": 1,
                                "dataChange": True}}]
        v += 1
        dlog.write_commit(root, v, actions)
        # the writer's incremental fold (mirrors _commit_next)
        for a in actions:
            if "add" in a:
                files[a["add"]["path"]] = a["add"]
            else:
                files.pop(a["remove"]["path"], None)
        dlog.write_version_checksum(root, v, dict(files))
        if v == cp_at:
            dlog.write_checkpoint(root, v)
    # full-replay validation agrees at EVERY version, whether replay
    # runs from scratch or resumes from the mid-history checkpoint
    for vv in range(v + 1):
        assert dlog.validate_version_checksum(root, vv) is True
