"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10; the "custom stateful operator" extension point the
reference never needed — its only state is the built-in window agg,
Sourcecode/spark/etl.py:34-41).

``running_stats`` keeps (count, sum, min_ts, max_ts) per key in the
state store and emits the refreshed running aggregate once per key per
micro-batch — the building block for live per-coin counters that
update-mode window aggs can't express (state spans ALL time, not one
window). State is O(1) per key, so a 100 TB stream with millions of
keys holds millions of tiny rows in the state store — the shuffle is
on the grouping key, identical topology to a streaming groupBy.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "key string, n_rows long, total double, running_avg double, "
    "first_unix double, last_unix double"
)
STATE_SCHEMA = "n long, total double, mn double, mx double"


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (n, total, mn, mx) = state.get if state.exists else (0, 0.0, None, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        lo, hi = float(pdf["unix_ts"].min()), float(pdf["unix_ts"].max())
        mn = lo if mn is None else min(mn, lo)
        mx = hi if mx is None else max(mx, hi)
    state.update((n, total, mn, mx))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n_rows": [n],
            "total": [round(total, 6)],
            "running_avg": [round(total / n, 6) if n else None],
            "first_unix": [mn],
            "last_unix": [mx],
        }
    )


def running_stats(
    stream: DataFrame, key_col: str, value_col: str, ts_col: str
) -> DataFrame:
    """Per-key all-time running (count, sum, avg, ts-range), one output
    row per key per micro-batch (update semantics)."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
        (F.unix_micros(F.col(ts_col)) / 1e6).alias("unix_ts"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
