"""Chart-query builder: Superset-slice semantics compiled to Spark.

A slice is (metrics, groupby, adhoc equality filters, time grain,
order, limit) over a dataset (reference: data/Superset Dashboard/
20240618_101644.json — e.g. "Top trading volume" = MAX(volume24h)
GROUP BY symbol WHERE is_current='Y' LIMIT 10; "BTC price with MA" =
MAX(price) + AVG(price) per P1D grain). ``ChartQuery`` compiles the
same spec two ways:

- ``to_df(df)``    — a DataFrame plan (filters land in the parquet scan
                     via pushdown; the aggregate is a partial+final
                     hash agg; ORDER BY + LIMIT becomes TakeOrdered).
- ``to_sql(view)`` — ANSI SQL in the DuckDB dialect for the oracle.

Both emit identical column names, which is what the driver's
hash-compare requires. Time grains use the ISO-8601 durations Superset
stores (P1D, PT1M, PT1S, P1M, P1W).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ISO-8601 grain -> (date_trunc unit, duckdb strftime, spark date_format)
GRAINS = {
    "P1D": ("day", "%Y-%m-%d", "yyyy-MM-dd"),
    "P1W": ("week", "%Y-%m-%d", "yyyy-MM-dd"),
    "P1M": ("month", "%Y-%m-%d", "yyyy-MM-dd"),
    "PT1H": ("hour", "%Y-%m-%d %H:%M:%S", "yyyy-MM-dd HH:mm:ss"),
    "PT1M": ("minute", "%Y-%m-%d %H:%M:%S", "yyyy-MM-dd HH:mm:ss"),
    "PT1S": ("second", "%Y-%m-%d %H:%M:%S", "yyyy-MM-dd HH:mm:ss"),
}

_AGGS = {"MAX", "MIN", "SUM", "AVG", "COUNT", "COUNT_DISTINCT"}


@dataclass(frozen=True)
class Metric:
    """One Superset metric: a simple aggregate over a column, or a raw
    SQL expression (the gauge charts' ``supply/maxsupply``)."""

    label: str
    agg: str | None = None  # None => sql expression metric
    column: str | None = None
    sql: str | None = None
    round_to: int | None = None

    def to_column(self) -> Column:
        if self.agg is None:
            c = F.expr(self.sql)
        elif self.agg == "COUNT":
            c = F.count(F.lit(1))
        elif self.agg == "COUNT_DISTINCT":
            c = F.count_distinct(F.col(self.column))
        else:
            c = getattr(F, self.agg.lower())(F.col(self.column))
        if self.round_to is not None:
            c = F.round(c, self.round_to)
        return c.alias(self.label)

    def to_sql(self) -> str:
        if self.agg is None:
            expr = self.sql
        elif self.agg == "COUNT":
            expr = "COUNT(*)"
        elif self.agg == "COUNT_DISTINCT":
            expr = f"COUNT(DISTINCT {self.column})"
        else:
            assert self.agg in _AGGS
            expr = f"{self.agg}({self.column})"
        if self.round_to is not None:
            expr = f"ROUND({expr}, {self.round_to})"
        return f'{expr} AS "{self.label}"'


@dataclass(frozen=True)
class ChartQuery:
    metrics: tuple[Metric, ...]
    groupby: tuple[str, ...] = ()
    # adhoc equality filters only — the sole operator the dashboard uses
    # (dashboard JSON:103,115,151)
    filters: tuple[tuple[str, str], ...] = ()
    time_col: str | None = None
    time_grain: str | None = None  # ISO-8601; requires time_col
    order_desc_by: str | None = None  # a metric label
    limit: int | None = None
    grain_alias: str = field(default="__timestamp")

    # -- Spark side ----------------------------------------------------
    def to_df(self, df: DataFrame) -> DataFrame:
        for col, val in self.filters:
            df = df.filter(F.col(col) == F.lit(val))
        keys: list[Column] = [F.col(g) for g in self.groupby]
        if self.time_grain is not None:
            unit, _, spark_fmt = GRAINS[self.time_grain]
            keys.append(
                F.date_format(F.date_trunc(unit, F.col(self.time_col)), spark_fmt)
                .alias(self.grain_alias)
            )
        aggs = [m.to_column() for m in self.metrics]
        out = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
        if self.order_desc_by is not None:
            # same deterministic tie-break as the oracle SQL: group-by
            # columns + time grain ascending after the metric
            ties = list(self.groupby)
            if self.time_grain is not None:
                ties.append(self.grain_alias)
            out = out.orderBy(F.desc(self.order_desc_by), *[F.asc(t) for t in ties])
        if self.limit is not None:
            out = out.limit(self.limit)
        return out

    # -- Oracle side ---------------------------------------------------
    def to_sql(self, relation: str) -> str:
        select = []
        group = []
        for g in self.groupby:
            select.append(g)
            group.append(g)
        if self.time_grain is not None:
            unit, duck_fmt, _ = GRAINS[self.time_grain]
            select.append(
                f"strftime(date_trunc('{unit}', CAST({self.time_col} AS TIMESTAMP)),"
                f" '{duck_fmt}') AS \"{self.grain_alias}\""
            )
            group.append(str(len(select)))
        select += [m.to_sql() for m in self.metrics]
        sql = f"SELECT {', '.join(select)} FROM {relation}"
        if self.filters:
            conds = " AND ".join(f"{c} = '{v}'" for c, v in self.filters)
            sql += f" WHERE {conds}"
        if group:
            sql += f" GROUP BY {', '.join(group)}"
        if self.order_desc_by is not None:
            sql += f' ORDER BY "{self.order_desc_by}" DESC'
            # deterministic tie-break for LIMIT: Superset relies on the
            # engine's arbitrary order; the oracle needs a total order
            ties = list(self.groupby)
            if self.time_grain is not None:
                ties.append(f'"{self.grain_alias}"')
            if ties:
                sql += ", " + ", ".join(ties)
        if self.limit is not None:
            sql += f" LIMIT {self.limit}"
        return sql
