"""M5 DDL bootstrap: the reference's query.sql schema against Spark's
session catalog — databases, table schemas, write/read through the
catalog, partitioned fact, and idempotent re-run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark import catalog_ddl


@pytest.fixture()
def bootstrap(spark, tmp_path):
    created = catalog_ddl.bootstrap_ddl(spark, str(tmp_path / "warehouse"))
    yield created
    catalog_ddl.drop_all(spark)


def test_bootstrap_creates_reference_schema(spark, bootstrap):
    dbs = {d.name for d in spark.catalog.listDatabases()}
    assert {"bronze", "silver", "gold"} <= dbs
    assert set(bootstrap) == {
        "silver.fact", "bronze.bitcoin_stg", "bronze.ethereum_stg",
        "silver.dimcoin", "silver.dimtime", "silver.dimdate",
        "silver.dailybitcoin", "silver.dailyethereum",
    }
    fact = dict(spark.table("silver.fact").dtypes)
    assert fact == {
        "coin_id": "int", "date_id": "int", "time_id": "int",
        "price": "double", "market_cap": "double",
        "change_percent_last_day": "double", "average_1minute": "double",
        "created_at": "string",
    }
    assert dict(spark.table("silver.dimcoin").dtypes)["surrogate_key"] == "bigint"


def test_catalog_write_read_partitioned(spark, bootstrap, tmp_path):
    rows = spark.range(6).select(
        (F.col("id") % 2).cast("int").alias("coin_id"),
        F.lit(20240101).alias("date_id"),
        F.col("id").cast("int").alias("time_id"),
        (F.col("id") * 1.5).alias("price"),
        F.lit(0.0).alias("market_cap"),
        F.lit(0.0).alias("change_percent_last_day"),
        F.lit(0.0).alias("average_1minute"),
        F.lit("t0").alias("created_at"),
    )
    # insertInto is positional and the partitioned table physically
    # orders coin_id last — align to the catalog's column order
    rows.select(*spark.table("silver.fact").columns).write.insertInto(
        "silver.fact"
    )
    got = spark.table("silver.fact")
    assert got.count() == 6
    # partition pruning on the DDL'd partition column reaches the scan
    plan = (
        got.filter(F.col("coin_id") == 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert got.filter(F.col("coin_id") == 1).count() == 3
    assert "PartitionFilters: [isnotnull(coin_id" in plan, plan


def test_bootstrap_is_idempotent(spark, bootstrap, tmp_path):
    again = catalog_ddl.bootstrap_ddl(spark, str(tmp_path / "warehouse"))
    assert set(again) == set(bootstrap)
    assert spark.table("silver.dimdate").count() == 0
