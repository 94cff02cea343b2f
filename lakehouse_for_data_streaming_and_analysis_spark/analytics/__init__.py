"""Analytics layer (SURVEY.md §2.13 X1-X11): time-series statistics and
model fits as Spark-native operators.

Deterministic feature ops (returns, rolling stats, ACF, eval metrics,
CV splits) are pure Catalyst expressions in ``metrics``/``cv`` and
``functions.finance``; inherently iterative model fits (ADF regression,
AR forecast, GARCH likelihood) are grouped-map ``applyInPandas``
operators in ``timeseries`` — one pandas group per series key, the same
per-series contract the reference's StatsForecast usage has
(reference: Jupiter Notebook/Garch_v1.ipynb cells 20-23).
"""

from . import cv, metrics, timeseries

__all__ = ["cv", "metrics", "timeseries"]
