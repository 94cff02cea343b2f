"""M5 DDL bootstrap: the reference's metastore schema, as Spark SQL.

The reference bootstraps its catalog by running ``query.sql`` through
Trino at startup (Sourcecode/spark/metadata.py:41-65): three medallion
schemas (bronze/silver/gold) and the star-schema tables. This module
executes the same bootstrap against Spark's session catalog with
Spark-typed DDL (VARCHAR->STRING, Trino ``TIMESTAMP(3) WITH TIME
ZONE``->TIMESTAMP, ``WITH (partitioned_by=...)``->PARTITIONED BY),
using parquet as the table format (delta-spark absent — DECISIONS.md
§11; the Deltaish log in ``delta/`` covers transaction-log semantics
for path-based tables).

Statements are IF NOT EXISTS end to end, so the bootstrap is
idempotent — re-running at every startup is the reference's own
pattern (metadata.py runs unconditionally).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# (database, table, spark-sql columns, partition clause) — one row per
# CREATE TABLE in query.sql:4-11.
TABLES: list[tuple[str, str, str, str]] = [
    (
        "silver",
        "fact",
        "coin_id INT, date_id INT, time_id INT, price DOUBLE, "
        "market_cap DOUBLE, change_percent_last_day DOUBLE, "
        "average_1minute DOUBLE, created_at STRING",
        "PARTITIONED BY (coin_id)",
    ),
    (
        "bronze",
        "bitcoin_stg",
        "bitcoin DOUBLE, `timestamp` TIMESTAMP, average_1minute DOUBLE",
        "",
    ),
    (
        "bronze",
        "ethereum_stg",
        "ethereum DOUBLE, `timestamp` TIMESTAMP, average_1minute DOUBLE",
        "",
    ),
    (
        "silver",
        "dimcoin",
        "surrogate_key BIGINT, coin_id INT, symbol STRING, name STRING, "
        "supply DOUBLE, maxSupply DOUBLE, volume24h DOUBLE, hash STRING, "
        "start_date DATE, end_date DATE, is_current STRING",
        "",
    ),
    (
        "silver",
        "dimtime",
        "id INT, Time STRING, Hour STRING, Minute STRING, Second STRING, "
        "Time24 STRING, Hour24 STRING, AmPm STRING",
        "",
    ),
    (
        "silver",
        "dimdate",
        "id INT, CalendarDate DATE, CalendarYear INT, CalendarMonth STRING, "
        "MonthOfYear INT, CalendarDay STRING, DayOfWeek INT, "
        "DayOfMonth INT, DayOfYear INT, WeekOfYearIso INT",
        "",
    ),
    (
        "silver",
        "dailybitcoin",
        "Date DATE, Open DOUBLE, High DOUBLE, Low DOUBLE, Close DOUBLE, "
        "AdjClose DOUBLE, Volume BIGINT",
        "",
    ),
    (
        "silver",
        "dailyethereum",
        "Date DATE, Open DOUBLE, High DOUBLE, Low DOUBLE, Close DOUBLE, "
        "AdjClose DOUBLE, Volume BIGINT",
        "",
    ),
]

DATABASES = ("bronze", "silver", "gold")


def bootstrap_ddl(spark: SparkSession, location_root: str) -> list[str]:
    """Create the medallion databases + reference tables; returns the
    fully-qualified names created. Idempotent (IF NOT EXISTS)."""
    created = []
    for db in DATABASES:
        spark.sql(
            f"CREATE DATABASE IF NOT EXISTS {db} "
            f"LOCATION '{location_root}/{db}'"
        )
    for db, name, cols, part in TABLES:
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {db}.{name} ({cols}) "
            f"USING parquet {part}"
        )
        created.append(f"{db}.{name}")
    return created


def drop_all(spark: SparkSession) -> None:
    """Tear the bootstrap down (tests; the reference never drops)."""
    for db, name, _cols, _part in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {db}.{name}")
    for db in DATABASES:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
