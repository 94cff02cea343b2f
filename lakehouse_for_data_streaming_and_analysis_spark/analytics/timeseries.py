"""Grouped-map time-series model operators (SURVEY.md §2.13 X3-X8).

The reference runs these in driver-side pandas with statsmodels/arch/
statsforecast (Garch_v1.ipynb, test5.ipynb, garch_model_v4.ipynb).
Here each is an ``applyInPandas`` grouped-map operator: Spark shuffles
once on the series key, then every series is fitted independently in an
Arrow-batched pandas worker — embarrassingly parallel across series, so
a 100 TB table with millions of series keys scales linearly with
executors (the per-group payload is one series, never the whole table).

statsmodels/arch are not available in this environment, so the numeric
cores are self-contained numpy implementations of the published
algorithms (Dickey-Fuller OLS regression, Ljung-Box Q, AR(p) via
least squares with psi-weight prediction intervals, GARCH(1,1)
Gaussian quasi-likelihood with variance targeting). They are gated so
that, if statsmodels/arch are importable, the same operator contracts
could delegate to them; outputs here are deterministic (no RNG, no
optimizer seeds), which is what lets tests pin exact values.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# MacKinnon (1994/2010) approximate critical values for the
# constant-only ADF regression, asymptotic case (public constants,
# same table statsmodels ships).
ADF_CRIT_CONST = {"1%": -3.43, "5%": -2.86, "10%": -2.57}
# Chi-square 5% critical values by df, for Ljung-Box decisions.
CHI2_CRIT_5PCT = {1: 3.841, 2: 5.991, 5: 11.070, 10: 18.307, 20: 31.410}
Z = {80: 1.2815515655446004, 95: 1.959963984540054}


def _ols(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Least squares with coefficient standard errors."""
    beta, *_ = np.linalg.lstsq(x, y, rcond=None)
    resid = y - x @ beta
    dof = max(len(y) - x.shape[1], 1)
    sigma2 = float(resid @ resid) / dof
    xtx_inv = np.linalg.pinv(x.T @ x)
    se = np.sqrt(np.maximum(np.diag(xtx_inv) * sigma2, 0.0))
    return beta, se


def adf_stat(y: np.ndarray, max_lag: int) -> tuple[float, int]:
    """Augmented Dickey-Fuller t-statistic, constant-only regression:
    dy_t = a + b*y_{t-1} + sum_i g_i dy_{t-i}; returns (t(b), nobs)."""
    y = np.asarray(y, dtype=float)
    dy = np.diff(y)
    k = max_lag
    rows = len(dy) - k
    cols = [np.ones(rows), y[k:-1]]
    for i in range(1, k + 1):
        cols.append(dy[k - i : len(dy) - i])
    x = np.column_stack(cols)
    beta, se = _ols(x, dy[k:])
    t = float(beta[1] / se[1]) if se[1] > 0 else float("nan")
    return t, rows


def ljung_box_q(y: np.ndarray, lags: int) -> float:
    """Ljung-Box Q = n(n+2) * sum_k acf_k^2 / (n-k)."""
    return ljung_box_and_box_pierce(y, lags)[0]


def ljung_box_and_box_pierce(y: np.ndarray, lags: int) -> tuple[float, float]:
    """Both portmanteau statistics from one ACF pass: Ljung-Box
    Q = n(n+2)·Σ acf_k²/(n-k) and the original Box-Pierce
    Q* = n·Σ acf_k² (always ≤ Q; the reference's notebooks report
    both — test5.ipynb cell 8)."""
    y = np.asarray(y, dtype=float)
    y = y - y.mean()
    n = len(y)
    denom = float(y @ y)
    q = 0.0
    bp = 0.0
    for k in range(1, lags + 1):
        rk = float(y[k:] @ y[:-k]) / denom
        q += rk * rk / (n - k)
        bp += rk * rk
    return n * (n + 2) * q, n * bp


def pacf_durbin_levinson(y: np.ndarray, nlags: int) -> np.ndarray:
    """Sample partial autocorrelations via the Durbin-Levinson
    recursion on the sample ACF (the 'ywm' method statsmodels uses) —
    pacf[k] is the lag-k coefficient of the order-k Yule-Walker AR
    fit, the quantity the PACF correlogram plots for AR order
    identification (Garch_v1.ipynb cell 13). Deterministic, no
    optimizer."""
    y = np.asarray(y, dtype=float)
    y = y - y.mean()
    denom = float(y @ y)
    acf = np.array(
        [1.0] + [float(y[k:] @ y[:-k]) / denom for k in range(1, nlags + 1)]
    )
    phi_prev = np.zeros(nlags + 1)
    phi = np.zeros(nlags + 1)
    out = np.zeros(nlags)
    for k in range(1, nlags + 1):
        if k == 1:
            phi[1] = acf[1]
        else:
            num = acf[k] - float(
                sum(phi_prev[j] * acf[k - j] for j in range(1, k))
            )
            den = 1.0 - float(sum(phi_prev[j] * acf[j] for j in range(1, k)))
            phi[k] = num / den if den != 0 else float("nan")
            for j in range(1, k):
                phi[j] = phi_prev[j] - phi[k] * phi_prev[k - j]
        out[k - 1] = phi[k]
        phi_prev = phi.copy()
    return out


def pacf_by_group(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    nlags: int = 3,
) -> DataFrame:
    """X4 (PACF): per-series partial autocorrelations at lags
    1..nlags via Durbin-Levinson inside the grouped-map worker —
    same shuffle topology as adf_by_group."""
    keys = list(key_cols)
    schema = (
        ", ".join(f"{k} string" for k in keys)
        + ", n_obs int, "
        + ", ".join(f"pacf_{k} double" for k in range(1, nlags + 1))
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        y = pdf[value_col].to_numpy(dtype=float)
        p = pacf_durbin_levinson(y, nlags)
        return pd.DataFrame(
            [
                [str(pdf[k].iloc[0]) for k in keys]
                + [len(y)]
                + [round(float(v), 6) for v in p]
            ],
            columns=keys
            + ["n_obs"]
            + [f"pacf_{k}" for k in range(1, nlags + 1)],
        )

    return df.groupBy(*keys).applyInPandas(fit, schema=schema)


def ar_fit_forecast(
    y: np.ndarray, p: int, horizon: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """AR(p) with intercept by least squares; h-step recursive forecast
    with forecast-error std from the psi-weight (MA) representation:
    var_h = sigma^2 * sum_{j<h} psi_j^2."""
    y = np.asarray(y, dtype=float)
    x = np.column_stack(
        [np.ones(len(y) - p)] + [y[p - i - 1 : len(y) - i - 1] for i in range(p)]
    )
    beta, _ = _ols(x, y[p:])
    resid = y[p:] - x @ beta
    sigma = float(np.sqrt((resid @ resid) / max(len(resid) - p - 1, 1)))
    phi = beta[1:]
    psi = np.zeros(horizon)
    psi[0] = 1.0
    for j in range(1, horizon):
        psi[j] = sum(phi[i] * psi[j - i - 1] for i in range(min(p, j)))
    err_std = sigma * np.sqrt(np.cumsum(psi**2))
    hist = list(y)
    fc = np.zeros(horizon)
    for h in range(horizon):
        fc[h] = beta[0] + sum(phi[i] * hist[-i - 1] for i in range(p))
        hist.append(fc[h])
    return fc, err_std, beta


def garch11_fit(
    r: np.ndarray,
    alpha_grid: Sequence[float] = tuple(np.round(np.arange(0.02, 0.32, 0.02), 2)),
    beta_grid: Sequence[float] = tuple(np.round(np.arange(0.50, 0.97, 0.02), 2)),
) -> tuple[float, float, float, float, float]:
    """GARCH(1,1) by deterministic grid search over (alpha, beta) with
    variance targeting (omega = var * (1 - alpha - beta)), maximizing
    the Gaussian quasi-log-likelihood. Returns (omega, alpha, beta,
    loglik, next_sigma). The reference's grid search over (p, q) by
    AIC is test5.ipynb cell 10; this fixes p=q=1 and grids the
    parameters instead, which keeps the fit seed-free."""
    r = np.asarray(r, dtype=float)
    r = r - r.mean()
    var = float(r.var()) or 1e-12
    # vectorize across the whole (alpha, beta) grid: the variance
    # recursion is sequential in t but independent across grid points,
    # so h is a (G,) vector updated n times — ~grid-size× faster than
    # nested Python loops and identical output (argmax over the same
    # likelihoods; first-index tie-break preserves grid order)
    pairs = np.array(
        [(a, b) for a in alpha_grid for b in beta_grid if a + b < 0.999]
    )
    if len(pairs) == 0:
        return (var, 0.0, 0.0, -np.inf, float(np.sqrt(var)))
    alphas, betas = pairs[:, 0], pairs[:, 1]
    omegas = var * (1.0 - alphas - betas)
    h = np.full(len(pairs), var)
    ll = -0.5 * (np.log(2 * np.pi * h) + r[0] ** 2 / h)
    for t in range(1, len(r)):
        h = omegas + alphas * r[t - 1] ** 2 + betas * h
        ll += -0.5 * (np.log(2 * np.pi * h) + r[t] ** 2 / h)
    i = int(np.argmax(ll))
    nxt = float(np.sqrt(omegas[i] + alphas[i] * r[-1] ** 2 + betas[i] * h[i]))
    return (
        float(omegas[i]),
        float(alphas[i]),
        float(betas[i]),
        float(ll[i]),
        nxt,
    )


def choose_d(y: np.ndarray, d_max: int = 2, max_lag: int = 1) -> int:
    """Differencing order: the smallest d whose d-th difference is
    ADF-stationary at 5% (the unit-root-test d-selection pmdarima's
    auto_arima performs before its (p, q) information-criterion grid;
    reference: garch_model_v4.ipynb cell 6)."""
    y = np.asarray(y, dtype=float)
    for d in range(d_max + 1):
        w = np.diff(y, n=d) if d else y
        if len(w) < max_lag + 8:
            break
        t, _ = adf_stat(w, max_lag)
        if np.isfinite(t) and t < ADF_CRIT_CONST["5%"]:
            return d
    return d_max


def arma_fit_hr(w: np.ndarray, p: int, q: int) -> tuple[np.ndarray, float, int]:
    """ARMA(p, q) with intercept by the Hannan-Rissanen two-stage
    regression: a long-AR fit supplies residual estimates, then w_t is
    regressed on its own p lags and q lagged residuals. Pure least
    squares — deterministic, no optimizer seed — which is what lets
    the order search stay reproducible cross-run. Returns
    (coefficients, innovation variance, effective sample size)."""
    w = np.asarray(w, dtype=float)
    if q == 0:
        if p == 0:
            resid = w - w.mean()
            return (
                np.array([w.mean()]),
                float(resid @ resid) / max(len(w), 1),
                len(w),
            )
        x = np.column_stack(
            [np.ones(len(w) - p)] + [w[p - i - 1 : len(w) - i - 1] for i in range(p)]
        )
        beta, _ = _ols(x, w[p:])
        resid = w[p:] - x @ beta
        return beta, float(resid @ resid) / max(len(resid), 1), len(resid)
    m = min(max(2 * (p + q), 4), max(len(w) // 4, p + q + 1))
    xm = np.column_stack(
        [np.ones(len(w) - m)] + [w[m - i - 1 : len(w) - i - 1] for i in range(m)]
    )
    bm, _ = _ols(xm, w[m:])
    e = np.concatenate([np.zeros(m), w[m:] - xm @ bm])
    t0 = m + max(p, q)
    rows = len(w) - t0
    cols = [np.ones(rows)]
    cols += [w[t0 - i - 1 : len(w) - i - 1] for i in range(p)]
    cols += [e[t0 - j - 1 : len(w) - j - 1] for j in range(q)]
    x = np.column_stack(cols)
    beta, _ = _ols(x, w[t0:])
    resid = w[t0:] - x @ beta
    return beta, float(resid @ resid) / max(len(resid), 1), len(resid)


def arima_order_search(
    y: np.ndarray, p_max: int = 3, q_max: int = 2, d_max: int = 2
) -> tuple[int, int, int, float, float]:
    """auto-ARIMA order selection (reference capability:
    garch_model_v4.ipynb cell 6): d from repeated unit-root tests
    (choose_d), then an exhaustive (p, q) grid on the d-th difference
    scored by AIC = n·ln(sigma²) + 2(p+q+1) under the Gaussian
    least-squares approximation. Ties break toward the smaller
    (p+q, p) — the parsimony order pmdarima uses. Returns
    (p, d, q, aic, sigma2)."""
    y = np.asarray(y, dtype=float)
    d = choose_d(y, d_max)
    w = np.diff(y, n=d) if d else y
    best: tuple[float, int, int, float] | None = None  # (aic, p, q, sigma2)
    for p in range(p_max + 1):
        for q in range(q_max + 1):
            if len(w) < (p + q) * 4 + 12:
                continue
            try:
                _, sigma2, n_eff = arma_fit_hr(w, p, q)
            except np.linalg.LinAlgError:
                continue
            if not np.isfinite(sigma2) or sigma2 <= 0:
                continue
            aic = n_eff * float(np.log(sigma2)) + 2.0 * (p + q + 1)
            key = (round(aic, 10), p + q, p)
            if best is None or key < (round(best[0], 10), best[1] + best[2], best[1]):
                best = (aic, p, q, sigma2)
    if best is None:
        return 0, d, 0, float("nan"), float("nan")
    return best[1], d, best[2], float(best[0]), float(best[3])


def garch_pq_fit(
    r: np.ndarray,
    p: int,
    q: int,
    alpha_choices: Sequence[float] = (0.02, 0.05, 0.08, 0.10, 0.13, 0.17, 0.22),
    beta_choices: Sequence[float] = (0.20, 0.35, 0.50, 0.65, 0.75, 0.82, 0.88, 0.93),
) -> tuple[tuple[float, ...], tuple[float, ...], float, float, int]:
    """GARCH(p, q) Gaussian quasi-likelihood over a deterministic
    parameter grid with variance targeting (omega = var·(1-Σa-Σb)).
    The variance recursion is sequential in t but independent across
    grid points, so it runs vectorized over the whole grid. Returns
    (alphas, betas, omega, loglik, k)."""
    from itertools import product as _product

    r = np.asarray(r, dtype=float)
    r = r - r.mean()
    var = float(r.var()) or 1e-12
    combos = [
        (a, b)
        for a in _product(alpha_choices, repeat=p)
        for b in _product(beta_choices, repeat=q)
        if sum(a) + sum(b) < 0.999
    ]
    if not combos:
        return ((),) * 2 + (var, -np.inf, p + q + 1)  # type: ignore[return-value]
    A = np.array([c[0] for c in combos])  # (G, p)
    B = np.array([c[1] for c in combos])  # (G, q)
    omega = var * (1.0 - A.sum(axis=1) - B.sum(axis=1))
    g = len(combos)
    r2 = r**2
    hbuf = np.full((max(q, 1), g), var)  # h_{t-1}..h_{t-q}, newest first
    ll = np.zeros(g)
    for t in range(len(r)):
        if t == 0:
            h = np.full(g, var)
        else:
            h = omega.copy()
            for i in range(p):
                h += A[:, i] * (r2[t - 1 - i] if t - 1 - i >= 0 else var)
            for j in range(q):
                h += B[:, j] * hbuf[j]
        ll += -0.5 * (np.log(2 * np.pi * h) + r2[t] / h)
        if q:
            hbuf = np.vstack([h, hbuf[:-1]])
    i = int(np.argmax(ll))
    return (
        tuple(float(a) for a in A[i]),
        tuple(float(b) for b in B[i]),
        float(omega[i]),
        float(ll[i]),
        p + q + 1,
    )


def garch_order_search(
    r: np.ndarray,
    orders: Sequence[tuple[int, int]] = ((1, 1), (1, 2), (2, 1), (2, 2)),
) -> tuple[int, int, float, float]:
    """GARCH order selection by AIC = 2k - 2·loglik over candidate
    (p, q) orders (the reference's grid: test5.ipynb cell 10 scores a
    (p, q) grid on AIC/BIC before picking the fit). Ties break toward
    the smaller (p+q, p). Returns (p, q, aic, loglik)."""
    best: tuple[float, int, int, float] | None = None
    for p, q in orders:
        _, _, _, ll, k = garch_pq_fit(np.asarray(r, dtype=float), p, q)
        if not np.isfinite(ll):
            continue
        aic = 2.0 * k - 2.0 * ll
        if best is None or (round(aic, 10), p + q, p) < (
            round(best[0], 10),
            best[1] + best[2],
            best[1],
        ):
            best = (aic, p, q, ll)
    if best is None:
        return 1, 1, float("nan"), float("nan")
    return best[1], best[2], float(best[0]), float(best[3])


def adf_by_group(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    max_lag: int = 1,
) -> DataFrame:
    """X3: per-series ADF stationarity decision (Garch_v1 cells 7-8)."""
    keys = list(key_cols)
    schema = (
        ", ".join(f"{k} string" for k in keys)
        + ", n_obs int, adf_stat double, max_lag int, stationary_5pct boolean"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        t, nobs = adf_stat(pdf[value_col].to_numpy(), max_lag)
        return pd.DataFrame(
            [
                [str(pdf[k].iloc[0]) for k in keys]
                + [nobs, round(t, 6), max_lag, bool(t < ADF_CRIT_CONST["5%"])]
            ],
            columns=keys + ["n_obs", "adf_stat", "max_lag", "stationary_5pct"],
        )

    return df.groupBy(*keys).applyInPandas(fit, schema=schema)


def ljung_box_by_group(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    lags: int = 10,
) -> DataFrame:
    """X4: per-series Ljung-Box white-noise test (test5.ipynb cell 8,
    Garch_v1 cell 15)."""
    keys = list(key_cols)
    schema = (
        ", ".join(f"{k} string" for k in keys)
        + ", n_obs int, lb_stat double, bp_stat double, lags int,"
        + " reject_whitenoise_5pct boolean"
    )
    crit = CHI2_CRIT_5PCT.get(lags, 18.307)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        y = pdf[value_col].to_numpy()
        q, bp = ljung_box_and_box_pierce(y, lags)
        return pd.DataFrame(
            [
                [str(pdf[k].iloc[0]) for k in keys]
                + [len(y), round(q, 6), round(bp, 6), lags, bool(q > crit)]
            ],
            columns=keys
            + ["n_obs", "lb_stat", "bp_stat", "lags", "reject_whitenoise_5pct"],
        )

    return df.groupBy(*keys).applyInPandas(fit, schema=schema)


def ar_forecast_by_group(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    p: int = 2,
    horizon: int = 5,
    levels: Sequence[int] = (80, 95),
) -> DataFrame:
    """X5/X8: per-series AR(p) forecast with prediction intervals —
    the yhat/lo/hi contract of Garch_v1 cells 35,43,46."""
    keys = list(key_cols)
    lvl_cols = [c for lv in levels for c in (f"lo_{lv}", f"hi_{lv}")]
    schema = (
        ", ".join(f"{k} string" for k in keys)
        + ", step int, yhat double, "
        + ", ".join(f"{c} double" for c in lvl_cols)
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        fc, err, _ = ar_fit_forecast(pdf[value_col].to_numpy(), p, horizon)
        rows = []
        for h in range(horizon):
            row = [str(pdf[k].iloc[0]) for k in keys] + [h + 1, round(float(fc[h]), 6)]
            for lv in levels:
                half = Z[lv] * err[h]
                row += [round(float(fc[h] - half), 6), round(float(fc[h] + half), 6)]
            rows.append(row)
        return pd.DataFrame(rows, columns=keys + ["step", "yhat"] + lvl_cols)

    return df.groupBy(*keys).applyInPandas(fit, schema=schema)


def garch_by_group(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """X6: per-series GARCH(1,1) volatility fit + 1-step sigma forecast
    (test5.ipynb cell 10, test6.ipynb cells 0-1)."""
    keys = list(key_cols)
    schema = (
        ", ".join(f"{k} string" for k in keys)
        + ", n_obs int, omega double, alpha double, beta double,"
        + " loglik double, next_sigma double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        r = pdf[value_col].to_numpy()
        omega, a, b, ll, nxt = garch11_fit(r)
        return pd.DataFrame(
            [
                [str(pdf[k].iloc[0]) for k in keys]
                + [
                    len(r),
                    round(omega, 8),
                    round(a, 4),
                    round(b, 4),
                    round(ll, 4),
                    round(nxt, 6),
                ]
            ],
            columns=keys
            + ["n_obs", "omega", "alpha", "beta", "loglik", "next_sigma"],
        )

    return df.groupBy(*keys).applyInPandas(fit, schema=schema)


def arima_order_by_group(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    p_max: int = 3,
    q_max: int = 2,
    d_max: int = 2,
) -> DataFrame:
    """X5 (order-selection shape): per-series auto-ARIMA (p, d, q)
    chosen by unit-root d + AIC grid (reference:
    garch_model_v4.ipynb cell 6 auto_arima). One shuffle on the series
    key; every grid fit is closed-form least squares inside the Arrow
    worker, so a million series parallelize like any grouped agg."""
    keys = list(key_cols)
    schema = (
        ", ".join(f"{k} string" for k in keys)
        + ", n_obs int, p int, d int, q int, aic double, sigma2 double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        y = pdf[value_col].to_numpy(dtype=float)
        p, d, q, aic, sigma2 = arima_order_search(y, p_max, q_max, d_max)
        return pd.DataFrame(
            [
                [str(pdf[k].iloc[0]) for k in keys]
                + [
                    len(y),
                    p,
                    d,
                    q,
                    round(aic, 4) if np.isfinite(aic) else None,
                    round(sigma2, 8) if np.isfinite(sigma2) else None,
                ]
            ],
            columns=keys + ["n_obs", "p", "d", "q", "aic", "sigma2"],
        )

    return df.groupBy(*keys).applyInPandas(fit, schema=schema)


def garch_order_by_group(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    orders: Sequence[tuple[int, int]] = ((1, 1), (1, 2), (2, 1), (2, 2)),
) -> DataFrame:
    """X6 (order-selection shape): per-series GARCH(p, q) chosen by
    AIC across candidate orders (reference: test5.ipynb cell 10's
    AIC/BIC/p-value grid). Same grouped-map topology as garch_by_group."""
    keys = list(key_cols)
    schema = (
        ", ".join(f"{k} string" for k in keys)
        + ", n_obs int, p int, q int, aic double, loglik double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        r = pdf[value_col].to_numpy(dtype=float)
        p, q, aic, ll = garch_order_search(r, orders)
        return pd.DataFrame(
            [
                [str(pdf[k].iloc[0]) for k in keys]
                + [
                    len(r),
                    p,
                    q,
                    round(aic, 4) if np.isfinite(aic) else None,
                    round(ll, 4) if np.isfinite(ll) else None,
                ]
            ],
            columns=keys + ["n_obs", "p", "q", "aic", "loglik"],
        )

    return df.groupBy(*keys).applyInPandas(fit, schema=schema)


def arima_garch_residual_by_group(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    p: int = 2,
) -> DataFrame:
    """X6 (combined shape): AR(p) mean model, then GARCH(1,1) on the
    AR residuals — the two-stage ARIMA-GARCH the reference builds in
    test6.ipynb cells 0-1 (mean dynamics out of the way first, then
    volatility clustering on what remains). One grouped-map pass per
    series emits the mean-model coefficients, the residual-volatility
    parameters, and the 1-step-ahead conditional sigma."""
    keys = list(key_cols)
    schema = (
        ", ".join(f"{k} string" for k in keys)
        + ", n_obs int, ar_intercept double, ar_phi_1 double, ar_phi_2 double,"
        + " resid_var double, omega double, alpha double, beta double,"
        + " next_sigma double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        y = pdf[value_col].to_numpy(dtype=float)
        x = np.column_stack(
            [np.ones(len(y) - p)]
            + [y[p - i - 1 : len(y) - i - 1] for i in range(p)]
        )
        beta, _ = _ols(x, y[p:])
        resid = y[p:] - x @ beta
        omega, a, b, _ll, nxt = garch11_fit(resid)
        phi = list(beta[1:]) + [0.0] * (2 - p)
        return pd.DataFrame(
            [
                [str(pdf[k].iloc[0]) for k in keys]
                + [
                    len(y),
                    round(float(beta[0]), 6),
                    round(float(phi[0]), 6),
                    round(float(phi[1]), 6),
                    round(float(resid.var()), 8),
                    round(omega, 8),
                    round(a, 4),
                    round(b, 4),
                    round(nxt, 6),
                ]
            ],
            columns=keys
            + [
                "n_obs",
                "ar_intercept",
                "ar_phi_1",
                "ar_phi_2",
                "resid_var",
                "omega",
                "alpha",
                "beta",
                "next_sigma",
            ],
        )

    return df.groupBy(*keys).applyInPandas(fit, schema=schema)


def walk_forward_eval_by_group(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    p: int = 2,
    n_test: int = 48,
) -> DataFrame:
    """X5 (evaluation shape): iterative 1-step-ahead forecast with
    refit at every step over the last ``n_test`` points — the walk-
    forward loop of the reference's ARIMA notebook (reference:
    Jupiter Notebook/garch_model_v4.ipynb cell 6: auto_arima + per-step
    history.append + refit), with the AR(p) core standing in for
    auto_arima. Emits per-series mae/rmse/mape over the walk."""
    keys = list(key_cols)
    schema = (
        ", ".join(f"{k} string" for k in keys)
        + ", n_test int, mae double, rmse double, mape double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        y = pdf[value_col].to_numpy(dtype=float)
        n = len(y)
        t0 = max(p + 2, n - n_test)
        errs, pct = [], []
        for t in range(t0, n):
            fc, _, _ = ar_fit_forecast(y[:t], p, 1)  # refit on history
            e = y[t] - fc[0]
            errs.append(e)
            if y[t] != 0:
                pct.append(abs(e / y[t]))
        errs_a = np.asarray(errs)
        return pd.DataFrame(
            [
                [str(pdf[k].iloc[0]) for k in keys]
                + [
                    len(errs),
                    round(float(np.mean(np.abs(errs_a))), 6),
                    round(float(np.sqrt(np.mean(errs_a**2))), 6),
                    round(float(np.mean(pct)), 6) if pct else None,
                ]
            ],
            columns=keys + ["n_test", "mae", "rmse", "mape"],
        )

    return df.groupBy(*keys).applyInPandas(fit, schema=schema)
