"""Semantic (chart) layer — SURVEY.md §7.1 M6.

The reference's Superset dashboard defines 14 slices as declarative
specs: metric aggregates, group-bys, adhoc equality filters, an ISO-8601
time grain, and a row limit, wrapped around a virtual-dataset star join
(reference: data/Superset Dashboard/20240618_101644.json:19-175).
``charts.ChartQuery`` is that spec as a dataclass; it compiles to a
Spark DataFrame plan AND to ANSI SQL (DuckDB dialect) from the same
object, so every chart is oracle-checkable by construction.
"""

from .charts import ChartQuery, Metric

__all__ = ["ChartQuery", "Metric"]
