"""Analytics-layer queries (SURVEY.md §2.13): deterministic time-series
features with DuckDB oracles, plus grouped-map model fits (rows-only —
model fits are not SQL-expressible, the driver's weaker check applies).

Series fixture: hourly average of events.value per event_type — the
rebuild's stand-in for the reference's daily OHLCV close series
(reference: Sourcecode/spark/udf.py:85-99, Garch_v1.ipynb cell 1).
Decimal-sum/COUNT keeps the hourly mean order-independent so Spark and
DuckDB agree bit-for-bit after ROUND.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..analytics import cv, metrics, timeseries
from ..catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Shared hourly series: one row per (event_type, hour).
HOURLY_SQL = """
  SELECT event_type,
         strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:00') AS ds,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS y
  FROM events GROUP BY 1, 2
"""


def hourly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("ds"),
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("y")
    )


# ------------------------------------------------------- oracle-backed features

@q(
    "acf_by_lag",
    f"""WITH hourly AS ({HOURLY_SQL}),
       lagged AS (
         SELECT event_type, y,
                LAG(y, 1) OVER (PARTITION BY event_type ORDER BY ds) AS y1,
                LAG(y, 2) OVER (PARTITION BY event_type ORDER BY ds) AS y2,
                LAG(y, 3) OVER (PARTITION BY event_type ORDER BY ds) AS y3
         FROM hourly)
       SELECT event_type,
              ROUND(CORR(y, y1), 4) AS acf_1,
              ROUND(CORR(y, y2), 4) AS acf_2,
              ROUND(CORR(y, y3), 4) AS acf_3
       FROM lagged GROUP BY event_type""",
)
def acf_by_lag(spark, sf_dir):
    """X4 (ACF): per-series autocorrelation at lags 1..3 as corr(y,
    lag_k(y)) — a window + one hash aggregate, no pandas
    (Garch_v1.ipynb cell 13's correlogram, computed in-engine)."""
    h = hourly_series(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ds")
    lagged = h.select(
        "event_type",
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 2).over(w).alias("y2"),
        F.lag("y", 3).over(w).alias("y3"),
    )
    return lagged.groupBy("event_type").agg(
        F.round(F.corr("y", "y1"), 4).alias("acf_1"),
        F.round(F.corr("y", "y2"), 4).alias("acf_2"),
        F.round(F.corr("y", "y3"), 4).alias("acf_3"),
    )


@q(
    "arch_lm_test",
    f"""WITH hourly AS ({HOURLY_SQL}),
       ret AS (
         SELECT event_type, ds,
                y / LAG(y) OVER (PARTITION BY event_type ORDER BY ds) - 1 AS r
         FROM hourly),
       cen AS (
         SELECT event_type, ds,
                r - AVG(r) OVER (PARTITION BY event_type) AS e
         FROM ret WHERE r IS NOT NULL),
       lagged AS (
         SELECT event_type, e * e AS e2,
                LAG(e * e) OVER (PARTITION BY event_type ORDER BY ds) AS e2l
         FROM cen)
       SELECT event_type,
              CAST(regr_count(e2, e2l) AS BIGINT) AS n,
              ROUND(regr_count(e2, e2l) * regr_r2(e2, e2l), 4) AS lm_stat,
              ROUND(regr_count(e2, e2l) * regr_r2(e2, e2l), 4) > 3.841
                AS arch_effect_5pct
       FROM lagged GROUP BY 1""",
)
def arch_lm_test(spark, sf_dir):
    """X4 (ARCH-LM, het_arch): Engle's Lagrange-multiplier test for
    conditional heteroskedasticity at one lag — regress squared
    demeaned returns on their own lag; LM = n·R² is chi²(1) under the
    no-ARCH null (5% critical value 3.841). Entirely in-engine: the
    single-regressor form makes R² a regr_r2 aggregate, so the test
    that statsmodels runs driver-side (test5.ipynb cell 4) becomes a
    window + one hash aggregate per series, hash-checked against the
    identical DuckDB expression. The 5% flag compares the ROUNDED
    statistic so no cross-engine ulp can flip it (DECISIONS.md §8)."""
    h = hourly_series(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ds")
    wp = Window.partitionBy("event_type")
    ret = h.select(
        "event_type", "ds", (F.col("y") / F.lag("y").over(w) - 1).alias("r")
    )
    cen = ret.filter(F.col("r").isNotNull()).select(
        "event_type", "ds", (F.col("r") - F.avg("r").over(wp)).alias("e")
    )
    e2 = (F.col("e") * F.col("e")).alias("e2")
    lagged = cen.select(
        "event_type",
        e2,
        F.lag(F.col("e") * F.col("e")).over(w).alias("e2l"),
    )
    lm = F.round(F.regr_count("e2", "e2l") * F.regr_r2("e2", "e2l"), 4)
    return lagged.groupBy("event_type").agg(
        F.regr_count("e2", "e2l").cast("bigint").alias("n"),
        lm.alias("lm_stat"),
        (lm > 3.841).alias("arch_effect_5pct"),
    )


@q(
    "dickey_fuller_tstat",
    f"""WITH hourly AS ({HOURLY_SQL}),
       reg AS (
         SELECT event_type,
                y - LAG(y) OVER (PARTITION BY event_type ORDER BY ds) AS dy,
                LAG(y) OVER (PARTITION BY event_type ORDER BY ds) AS ylag
         FROM hourly),
       fit AS (
         SELECT event_type,
                REGR_SLOPE(dy, ylag) AS slope,
                CAST(REGR_COUNT(dy, ylag) AS BIGINT) AS n,
                REGR_SXX(dy, ylag) AS sxx,
                REGR_SYY(dy, ylag) AS syy
         FROM reg WHERE dy IS NOT NULL GROUP BY event_type)
       SELECT event_type, n,
              ROUND(slope / SQRT(((syy - slope * slope * sxx) / (n - 2)) / sxx), 4)
                AS df_tstat
       FROM fit""",
)
def dickey_fuller_tstat(spark, sf_dir):
    """X3 (non-augmented case): Dickey-Fuller t-statistic of the unit-
    root coefficient, dy = a + b*y_lag, computed entirely with regr_*
    aggregates — the simple-regression special case of adf_by_group
    below, SQL-expressible so it gets a hash-matched oracle."""
    h = hourly_series(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ds")
    reg = h.select(
        "event_type",
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
        F.lag("y").over(w).alias("ylag"),
    ).filter(F.col("dy").isNotNull())
    fit = reg.groupBy("event_type").agg(
        F.regr_slope("dy", "ylag").alias("slope"),
        F.regr_count("dy", "ylag").alias("n"),
        F.regr_sxx("dy", "ylag").alias("sxx"),
        F.regr_syy("dy", "ylag").alias("syy"),
    )
    slope, n, sxx, syy = F.col("slope"), F.col("n"), F.col("sxx"), F.col("syy")
    se = F.sqrt(((syy - slope * slope * sxx) / (n - 2)) / sxx)
    return fit.select("event_type", "n", F.round(slope / se, 4).alias("df_tstat"))


@q(
    "forecast_eval_metrics",
    f"""WITH hourly AS ({HOURLY_SQL}),
       pred AS (
         SELECT event_type, y,
                LAG(y) OVER (PARTITION BY event_type ORDER BY ds) AS yhat
         FROM hourly)
       SELECT event_type,
              ROUND(AVG(ABS(y - yhat)), 6) AS mae,
              ROUND(SQRT(AVG((y - yhat) * (y - yhat))), 6) AS rmse,
              ROUND(AVG(ABS((y - yhat) / NULLIF(y, 0))), 6) AS mape,
              ROUND(AVG(ABS(y - yhat) / NULLIF((ABS(y) + ABS(yhat)) / 2, 0)), 6)
                AS smape
       FROM pred WHERE yhat IS NOT NULL GROUP BY event_type""",
)
def forecast_eval_metrics(spark, sf_dir):
    """X9: mae/rmse/mape/smape of a naive lag-1 forecast against
    actuals (the Garch_v1 cell 49 evaluate() contract as aggregate
    expressions over a prediction/actual join)."""
    h = hourly_series(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ds")
    pred = h.select(
        "event_type", "y", F.lag("y").over(w).alias("yhat")
    ).filter(F.col("yhat").isNotNull())
    return pred.groupBy("event_type").agg(
        F.round(metrics.mae("y", "yhat"), 6).alias("mae"),
        F.round(metrics.rmse("y", "yhat"), 6).alias("rmse"),
        F.round(metrics.mape("y", "yhat"), 6).alias("mape"),
        F.round(metrics.smape("y", "yhat"), 6).alias("smape"),
    )


@q(
    "rolling_origin_cv",
    f"""WITH hourly AS ({HOURLY_SQL}),
       rn AS (
         SELECT event_type, ds, y,
                ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ds) AS _rn,
                COUNT(*) OVER (PARTITION BY event_type) AS _n
         FROM hourly),
       folds AS (
         SELECT rn.*, f.fold,
                _n - 24 - (3 - 1 - f.fold) * 24 AS cutoff
         FROM rn CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS fold) f),
       roles AS (
         SELECT event_type, fold, ds,
                CASE WHEN _rn <= cutoff THEN 'train'
                     WHEN _rn <= cutoff + 24 THEN 'test' END AS role
         FROM folds)
       SELECT event_type, fold, role, COUNT(*) AS n_rows,
              MIN(ds) AS first_ds, MAX(ds) AS last_ds
       FROM roles WHERE role IS NOT NULL
       GROUP BY event_type, fold, role""",
)
def rolling_origin_cv(spark, sf_dir):
    """X7: rolling-origin CV split assignment (h=24, step=24,
    n_windows=3 — StatsForecast.cross_validation's windowing,
    Garch_v1 cells 21-26) summarized per (series, fold, role)."""
    h = hourly_series(spark, sf_dir)
    assigned = cv.rolling_origin_assign(
        h, "ds", ["event_type"], horizon=24, step_size=24, n_windows=3
    )
    return assigned.groupBy("event_type", "fold", "role").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ds").alias("first_ds"),
        F.max("ds").alias("last_ds"),
    )


@q(
    "price_reconstruction",
    f"""WITH hourly AS ({HOURLY_SQL}),
       resid AS (
         SELECT event_type, ds, y,
                y / LAG(y) OVER (PARTITION BY event_type ORDER BY ds) - 1 AS r
         FROM hourly)
       SELECT event_type, ds,
              ROUND(LAG(y) OVER (PARTITION BY event_type ORDER BY ds)
                    * (1 + LAG(r) OVER (PARTITION BY event_type ORDER BY ds)), 6)
                AS y_recon
       FROM resid QUALIFY y_recon IS NOT NULL""",
)
def price_reconstruction(spark, sf_dir):
    """X10: reconstruct the level series from lagged returns —
    close * (1 + resid.shift(1)) (test6.ipynb cell 7)."""
    h = hourly_series(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ds")
    resid = h.withColumn("r", F.col("y") / F.lag("y").over(w) - 1)
    return (
        resid.select(
            "event_type",
            "ds",
            F.round(F.lag("y").over(w) * (1 + F.lag("r").over(w)), 6).alias("y_recon"),
        )
        .filter(F.col("y_recon").isNotNull())
    )


# --------------------------------------------------- grouped-map model fits
# Not SQL-expressible (iterative fits) — no oracle entry; the driver
# records the weaker rows-only check, per the contract.

@q("adf_stationarity")
def adf_stationarity(spark, sf_dir):
    """X3: augmented Dickey-Fuller per series via applyInPandas."""
    return timeseries.adf_by_group(
        hourly_series(spark, sf_dir), ["event_type"], "ds", "y", max_lag=1
    )


@q("ljung_box_whitenoise")
def ljung_box_whitenoise(spark, sf_dir):
    """X4: Ljung-Box Q on hourly pct-returns per series."""
    h = hourly_series(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ds")
    rets = (
        h.withColumn("r", (F.col("y") / F.lag("y").over(w) - 1) * 100)
        .filter(F.col("r").isNotNull())
    )
    return timeseries.ljung_box_by_group(rets, ["event_type"], "ds", "r", lags=10)


@q("pacf_by_lag")
def pacf_by_lag(spark, sf_dir):
    """X4 (PACF): per-series partial autocorrelations at lags 1..3 via
    Durbin-Levinson (the AR-order-identification correlogram,
    Garch_v1.ipynb cell 13). Rows-only: the recursion is not
    SQL-expressible; pinned against a numpy lstsq AR-fit reference in
    tests/test_analytics.py."""
    return timeseries.pacf_by_group(
        hourly_series(spark, sf_dir), ["event_type"], "ds", "y", nlags=3
    )


@q("ar_forecast_intervals")
def ar_forecast_intervals(spark, sf_dir):
    """X5/X8: AR(2) 5-step forecast with 80/95% prediction intervals."""
    return timeseries.ar_forecast_by_group(
        hourly_series(spark, sf_dir), ["event_type"], "ds", "y", p=2, horizon=5
    )


@q("garch_volatility")
def garch_volatility(spark, sf_dir):
    """X6: GARCH(1,1) volatility fit on hourly pct-returns."""
    h = hourly_series(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ds")
    rets = (
        h.withColumn("r", (F.col("y") / F.lag("y").over(w) - 1) * 100)
        .filter(F.col("r").isNotNull())
    )
    return timeseries.garch_by_group(rets, ["event_type"], "ds", "r")


@q(
    "cv_fold_rmse",
    f"""WITH hourly AS ({HOURLY_SQL}),
       rn AS (
         SELECT event_type, ds, y,
                ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ds) AS _rn,
                COUNT(*) OVER (PARTITION BY event_type) AS _n,
                LAG(y) OVER (PARTITION BY event_type ORDER BY ds) AS yhat
         FROM hourly),
       folds AS (
         SELECT rn.*, f.fold,
                _n - 24 - (3 - 1 - f.fold) * 24 AS cutoff
         FROM rn CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS fold) f),
       scored AS (
         SELECT event_type, fold,
                SQRT(AVG((y - yhat) * (y - yhat))) AS fold_rmse
         FROM folds
         WHERE _rn > cutoff AND _rn <= cutoff + 24 AND yhat IS NOT NULL
         GROUP BY event_type, fold)
       SELECT event_type,
              ROUND(AVG(fold_rmse), 6) AS mean_rmse,
              CAST(COUNT(*) AS INT) AS n_folds
       FROM scored GROUP BY event_type""",
)
def cv_fold_rmse(spark, sf_dir):
    """X7 (scoring): per-fold naive-forecast RMSE on each rolling-origin
    test window, then the per-series mean across folds — the
    groupby(['unique_id','cutoff']).apply(rmse).groupby('unique_id')
    .mean() contract of Garch_v1 cell 26, as pure aggregates."""
    h = hourly_series(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ds")
    with_pred = h.withColumn("yhat", F.lag("y").over(w))
    assigned = cv.rolling_origin_assign(
        with_pred, "ds", ["event_type"], horizon=24, step_size=24, n_windows=3
    )
    scored = (
        assigned.filter((F.col("role") == "test") & F.col("yhat").isNotNull())
        .groupBy("event_type", "fold")
        .agg(F.sqrt(F.avg(F.pow(F.col("y") - F.col("yhat"), 2))).alias("fold_rmse"))
    )
    return scored.groupBy("event_type").agg(
        F.round(F.avg("fold_rmse"), 6).alias("mean_rmse"),
        F.count(F.lit(1)).cast("int").alias("n_folds"),
    )


@q("arima_order_search")
def arima_order_search(spark, sf_dir):
    """X5: per-series auto-ARIMA (p, d, q) selection — d by repeated
    unit-root tests, (p, q) by an AIC grid over Hannan-Rissanen
    least-squares fits (reference: garch_model_v4.ipynb cell 6
    auto_arima). Deterministic, so rows are stable across runs."""
    return timeseries.arima_order_by_group(
        hourly_series(spark, sf_dir), ["event_type"], "ds", "y",
        p_max=3, q_max=2, d_max=2,
    )


@q("garch_order_grid")
def garch_order_grid(spark, sf_dir):
    """X6: per-series GARCH(p, q) order chosen by AIC across
    {(1,1),(1,2),(2,1),(2,2)} (reference: test5.ipynb cell 10's
    AIC/BIC grid), on hourly pct-returns."""
    h = hourly_series(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ds")
    rets = (
        h.withColumn("r", (F.col("y") / F.lag("y").over(w) - 1) * 100)
        .filter(F.col("r").isNotNull())
    )
    return timeseries.garch_order_by_group(rets, ["event_type"], "ds", "r")


@q("arima_garch_residual_fit")
def arima_garch_residual_fit(spark, sf_dir):
    """X6: two-stage ARIMA-GARCH — AR(2) mean model per series, then
    GARCH(1,1) on the AR residuals with the 1-step conditional sigma
    (test6.ipynb cells 0-1). Rows-only; component recovery is pinned
    in tests/test_analytics.py on synthetic AR+GARCH data."""
    return timeseries.arima_garch_residual_by_group(
        hourly_series(spark, sf_dir), ["event_type"], "ds", "y", p=2
    )


@q("ar_walk_forward_eval")
def ar_walk_forward_eval(spark, sf_dir):
    """X5: iterative 1-step refit evaluation (garch_model_v4 cell 6's
    walk-forward loop) — AR(2) refit at every step over the last 48
    hours per series; per-series mae/rmse/mape."""
    return timeseries.walk_forward_eval_by_group(
        hourly_series(spark, sf_dir), ["event_type"], "ds", "y", p=2, n_test=48
    )


@q(
    "daily_ohlcv",
    """WITH t AS (
         SELECT event_type,
                strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS d,
                CAST(ts AS TIMESTAMP) AS tts, event_id, value
         FROM events),
       w AS (
         SELECT *,
                FIRST_VALUE(value) OVER (PARTITION BY event_type, d
                                         ORDER BY tts, event_id) AS o,
                FIRST_VALUE(value) OVER (PARTITION BY event_type, d
                                         ORDER BY tts DESC, event_id DESC) AS c
         FROM t)
       SELECT event_type, d,
              MIN(o) AS open,
              MAX(value) AS high,
              MIN(value) AS low,
              MIN(c) AS close,
              ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS volume,
              COUNT(*) AS n_ticks
       FROM w GROUP BY 1, 2""",
)
def daily_ohlcv(spark, sf_dir):
    """S4/udf.py:85-99 parity: the daily OHLCV frame the reference
    fetches from yfinance, derived in-engine from the tick stream —
    open/close via min_by/max_by on the (ts, event_id) composite (the
    id breaks equal-timestamp ties deterministically), one hash
    aggregate, no window."""
    ev = load_table(spark, sf_dir, "events")
    order = F.struct("ts", "event_id")
    return ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d"),
    ).agg(
        F.min_by("value", order).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", order).alias("close"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 6).alias(
            "volume"
        ),
        F.count(F.lit(1)).alias("n_ticks"),
    )
