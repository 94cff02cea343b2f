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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API): typed state
# variables + timers replace applyInPandasWithState's single opaque tuple.
# Runtime requirement: google.protobuf in the Python workers (the state
# API speaks protobuf to the JVM); tests skip where it is absent.
# The reference's change_percent_last_day (Sourcecode/spark/etl.py:60)
# freezes "last price" at startup (SURVEY §7.3 T9); this operator computes
# it CORRECTLY against the truly-previous tick held in the state store.

DEVIATION_OUTPUT_SCHEMA = (
    "key string, unix_ts double, value double, prev_value double, "
    "change_pct double"
)


def _make_deviation_processor(threshold_pct: float):
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class DeviationAlert(StatefulProcessor):
        """Emit a row whenever a key's value moves more than
        threshold_pct from its previous observed value. ValueState
        holds exactly (last_value,) per key — O(keys) state, the same
        shuffle topology as a streaming groupBy."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last", "v double")

        def handleInputRows(self, key, rows, timerValues):
            last = self._last.get()[0] if self._last.exists() else None
            out = []
            for pdf in rows:
                for r in pdf.sort_values("unix_ts").itertuples():
                    if last is not None and last != 0.0:
                        pct = (r.value - last) / last * 100.0
                        if abs(pct) > threshold_pct:
                            out.append(
                                (key[0], r.unix_ts, r.value, last, round(pct, 4))
                            )
                    last = r.value
            self._last.update((float(last),))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "key",
                        "unix_ts",
                        "value",
                        "prev_value",
                        "change_pct",
                    ],
                )

        def close(self) -> None:
            pass

    return DeviationAlert()


def deviation_alerts(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    threshold_pct: float = 50.0,
) -> DataFrame:
    """Per-key large-move detector on the arbitrary-state API."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        F.col(key_col).alias("key"),
        (F.unix_micros(F.col(ts_col).cast("timestamp")) / 1e6).alias("unix_ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("key").transformWithStateInPandas(
        _make_deviation_processor(threshold_pct),
        DEVIATION_OUTPUT_SCHEMA,
        "append",
        "none",
    )
