"""Set operators (SURVEY.md §2.8): union-all and anti-difference."""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """Vertical concat by column name (U1 — pd.concat axis=0)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def difference_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Multiset difference (U2 — EXCEPT ALL)."""
    return a.exceptAll(b)
