"""Forecast-evaluation aggregates (SURVEY.md §2.13 X9).

The reference computes mae/mape/rmse/smape with utilsforecast over a
pandas merge of predictions vs actuals (Garch_v1.ipynb cell 49,
garch_model_v4.ipynb cell 6). Here each metric is a plain aggregate
expression over a joined (y, yhat) DataFrame — JVM-side, codegen'd,
shuffle-free beyond the single group-by.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def mae(y: Column | str, yhat: Column | str) -> Column:
    return F.avg(F.abs(_c(y) - _c(yhat)))


def mse(y: Column | str, yhat: Column | str) -> Column:
    return F.avg(F.pow(_c(y) - _c(yhat), 2))


def rmse(y: Column | str, yhat: Column | str) -> Column:
    return F.sqrt(mse(y, yhat))


def mape(y: Column | str, yhat: Column | str) -> Column:
    """Mean absolute percentage error; rows with y=0 contribute null
    and are excluded by avg (same as utilsforecast's guard)."""
    y, yhat = _c(y), _c(yhat)
    return F.avg(F.abs((y - yhat) / F.when(y != 0, y)))


def smape(y: Column | str, yhat: Column | str) -> Column:
    """Symmetric MAPE in [0, 2]: |y-yhat| / ((|y|+|yhat|)/2)."""
    y, yhat = _c(y), _c(yhat)
    denom = (F.abs(y) + F.abs(yhat)) / 2
    return F.avg(F.abs(y - yhat) / F.when(denom != 0, denom))
