"""Aggregation operators (SURVEY.md §2.5).

All partial-aggregating (map-side combine) built-ins; the only shuffle
is on the group keys. Top-N pushes the limit through a sort
(TakeOrderedAndProject physical op — no full sort at scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    time_col: str,
    duration: str,
    aggs: Sequence[Column],
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Tumbling-window aggregation (batch analog of the bronze stream agg,
    reference: etl.py:34-41 — 1-minute window avg/last)."""
    return df.groupBy(F.window(time_col, duration), *extra_keys).agg(*aggs)


def grouped_topn(
    df: DataFrame,
    keys: Sequence[str],
    metric: Column,
    metric_name: str,
    n: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """groupBy(keys).agg(metric) -> ORDER BY metric DESC LIMIT n
    (reference: dashboard JSON:151 'Top trading volume')."""
    out = df.groupBy(*keys).agg(metric.alias(metric_name))
    order = [F.desc(metric_name)] + [F.asc(c) for c in (tiebreak or keys)]
    return out.orderBy(*order).limit(n)


def time_grained_series(
    df: DataFrame,
    time_col: str,
    grain: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Per-time-grain metric series (reference: dashboard JSON:55,67 —
    MAX(price) + AVG(price) per grain)."""
    g = F.date_format(F.date_trunc(grain, time_col), _GRAIN_FMT[grain]).alias("grain")
    return df.groupBy(g, *keys).agg(*aggs)


_GRAIN_FMT = {
    "minute": "yyyy-MM-dd HH:mm",
    "hour": "yyyy-MM-dd HH",
    "day": "yyyy-MM-dd",
    "month": "yyyy-MM",
    "year": "yyyy",
}
