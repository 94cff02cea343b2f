"""Rolling-origin cross-validation splitter (SURVEY.md §2.13 X7).

The reference calls ``StatsForecast.cross_validation(h, step_size,
n_windows)`` (Garch_v1.ipynb cells 21-26): n_windows training cutoffs
spaced step_size apart, each followed by an h-row test window. Here the
split assignment is pure window-function algebra — one shuffle on the
series key, then a generator join against the fold list — so it scales
to any number of series (each series' rows stay in one partition of
the window shuffle; folds are a tiny broadcast-able sequence).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_origin_assign(
    df: DataFrame,
    order_col: str,
    key_cols: Sequence[str],
    horizon: int,
    step_size: int,
    n_windows: int,
) -> DataFrame:
    """Explode each row into the (fold, role) pairs it participates in.

    For fold f in 0..n_windows-1 the cutoff row-number is
    ``N - horizon - (n_windows - 1 - f) * step_size``; rows with
    rn <= cutoff are 'train', the next ``horizon`` rows are 'test'.
    Output = input columns + fold INT, role STRING (train rows are
    duplicated across folds, exactly like StatsForecast's stacked
    cross_validation frame).
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    n = Window.partitionBy(*key_cols)
    rn = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(n)
    )
    folds = rn.withColumn("fold", F.explode(F.sequence(F.lit(0), F.lit(n_windows - 1))))
    cutoff = (
        F.col("_n")
        - F.lit(horizon)
        - (F.lit(n_windows - 1) - F.col("fold")) * F.lit(step_size)
    )
    return (
        folds.withColumn(
            "role",
            F.when(F.col("_rn") <= cutoff, F.lit("train")).when(
                (F.col("_rn") > cutoff) & (F.col("_rn") <= cutoff + F.lit(horizon)),
                F.lit("test"),
            ),
        )
        .filter(F.col("role").isNotNull())
        .drop("_rn", "_n")
    )
