"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; ``queries()`` maps operator names
(SURVEY.md §2) to (spark, sf_dir) -> DataFrame callables; ``oracle_sql()``
gives the DuckDB-equivalent SQL for hash-matched correctness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_tables
from lakehouse_for_data_streaming_and_analysis_spark.plans import star
from lakehouse_for_data_streaming_and_analysis_spark.queries import (
    advanced,
    analytics,
    charts,
    curation,
    decision,
    lmstats,
    datapipe,
    observability,
    olap,
    pipeline,
    product,
    relational,
    timeseries,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Deliberately oracle-less (iterative model fits are not
# SQL-expressible; the driver records its rows-only check for these —
# SURVEY.md §2.13 X3-X8).
ROWS_ONLY = (
    "adf_stationarity",
    "ljung_box_whitenoise",
    "ar_forecast_intervals",
    "garch_volatility",
    "ar_walk_forward_eval",
    "pagerank_user_influence",
    "kmeans_embedding_clusters",
    "sketch_cardinalities",
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: 5-way star join + grouped agg + top-N."""
    t = load_tables(spark, SMOKE_SF_DIR)
    return star.star_revenue_by_nation_month(
        t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"]
    )


def _q_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return star.star_revenue_by_nation_month(
        t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"]
    )


def _q_star_filtered_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return star.star_filtered_dim_subquery(
        t["lineitem"], t["orders"], t["customer"], t["nation"]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "star_revenue_by_nation_month": _q_star_revenue,
        "star_filtered_dim_subquery": _q_star_filtered_dim,
    }
    out.update(relational.QUERIES)
    out.update(datapipe.QUERIES)
    out.update(pipeline.QUERIES)
    out.update(analytics.QUERIES)
    out.update(charts.QUERIES)
    out.update(observability.QUERIES)
    out.update(olap.QUERIES)
    out.update(advanced.QUERIES)
    out.update(curation.QUERIES)
    out.update(decision.QUERIES)
    out.update(timeseries.QUERIES)
    out.update(lmstats.QUERIES)
    out.update(product.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out = {
        "star_revenue_by_nation_month": star.STAR_REVENUE_ORACLE,
        "star_filtered_dim_subquery": star.STAR_FILTERED_DIM_ORACLE,
    }
    out.update(relational.ORACLES)
    out.update(datapipe.ORACLES)
    out.update(pipeline.ORACLES)
    out.update(analytics.ORACLES)
    out.update(charts.ORACLES)
    out.update(observability.ORACLES)
    out.update(olap.ORACLES)
    out.update(advanced.ORACLES)
    out.update(curation.ORACLES)
    out.update(decision.ORACLES)
    out.update(timeseries.ORACLES)
    out.update(lmstats.ORACLES)
    out.update(product.ORACLES)
    return out
