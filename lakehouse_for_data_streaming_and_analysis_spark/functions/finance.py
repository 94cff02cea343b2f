"""Financial time-series expressions (SURVEY.md §2.6 W3-W5, §2.13 X1-X2).

The reference computes these in pandas (Garch_v1.ipynb cell 9,
test5.ipynb cell 2, garch_model_v4.ipynb cell 4); here they are window
expressions that stay in whole-stage codegen and scale to any number of
series via the partition key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def series_window(order_col: str, partition_cols: Sequence[str] = ()) -> WindowSpec:
    # bounded-grain: finance callers pass daily/bar series (rows =
    # distinct days/bars after aggregation, not ticks)
    w = Window.orderBy(order_col)
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(order_col)
    return w


def pct_return(c: Column | str, w: WindowSpec, scale: float = 100.0) -> Column:
    """scale * pct_change: (x/lag(x) - 1) * scale (Garch_v1 cell 9)."""
    c = F.col(c) if isinstance(c, str) else c
    return (c / F.lag(c, 1).over(w) - 1) * scale


def log_return(c: Column | str, w: WindowSpec) -> Column:
    """ln(x / lag(x)) (test5.ipynb cell 2)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.log(c / F.lag(c, 1).over(w))


def difference(c: Column | str, w: WindowSpec, lag: int = 1) -> Column:
    """x - lag(x, k) (garch_model_v4 cell 4 differencing)."""
    c = F.col(c) if isinstance(c, str) else c
    return c - F.lag(c, lag).over(w)


def rolling_mean(c: Column | str, w: WindowSpec, n: int) -> Column:
    """Trailing n-row mean (rolling(n).mean())."""
    c = F.col(c) if isinstance(c, str) else c
    return F.avg(c).over(w.rowsBetween(-(n - 1), 0))


def rolling_std(c: Column | str, w: WindowSpec, n: int) -> Column:
    """Trailing n-row sample std (rolling(n).std())."""
    c = F.col(c) if isinstance(c, str) else c
    return F.stddev_samp(c).over(w.rowsBetween(-(n - 1), 0))


def squared(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c * c
