"""Date/time dimension generators (SURVEY.md §2.2 tables dimdate/dimtime).

Row generation is `explode(sequence(...))` exactly as the reference
does it (reference: Sourcecode/spark/populate_dim.py:11-59), with the
same derived-column surface:
  dimdate: id=yyyyMMdd int, calendar fields, ISO week  (query.sql:9)
  dimtime: id=HHmmss int, 12/24h fields, AM/PM         (query.sql:8)

Scale note: these are generators, not scans — a few thousand /
86 400 rows; Catalyst plans them as a local Range. They exist to be
broadcast against fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dim_date(
    spark: SparkSession, start: str = "2020-01-01", end: str = "2030-12-31"
) -> DataFrame:
    days = spark.sql(
        f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'), "
        "interval 1 day)) AS CalendarDate"
    )
    return days.select(
        (F.year("CalendarDate") * 10000 + F.month("CalendarDate") * 100
         + F.dayofmonth("CalendarDate")).cast("int").alias("id"),
        "CalendarDate",
        F.year("CalendarDate").cast("int").alias("CalendarYear"),
        F.date_format("CalendarDate", "MMMM").alias("CalendarMonth"),
        F.month("CalendarDate").cast("int").alias("MonthOfYear"),
        F.date_format("CalendarDate", "EEEE").alias("CalendarDay"),
        # ISO day-of-week 1=Monday..7 (portable across engines, unlike
        # Spark's Sunday-based dayofweek)
        (F.weekday("CalendarDate") + 1).cast("int").alias("DayOfWeek"),
        F.dayofmonth("CalendarDate").cast("int").alias("DayOfMonth"),
        F.dayofyear("CalendarDate").cast("int").alias("DayOfYear"),
        F.weekofyear("CalendarDate").cast("int").alias("WeekOfYearIso"),
    )


DIM_DATE_ORACLE = """
SELECT CAST(year(d)*10000 + month(d)*100 + day(d) AS INT) AS id,
       d AS CalendarDate,
       CAST(year(d) AS INT) AS CalendarYear,
       strftime(d, '%B') AS CalendarMonth,
       CAST(month(d) AS INT) AS MonthOfYear,
       strftime(d, '%A') AS CalendarDay,
       CAST(isodow(d) AS INT) AS DayOfWeek,
       CAST(day(d) AS INT) AS DayOfMonth,
       CAST(dayofyear(d) AS INT) AS DayOfYear,
       CAST(weekofyear(d) AS INT) AS WeekOfYearIso
FROM (SELECT CAST(g AS DATE) AS d
      FROM generate_series(DATE '2020-01-01', DATE '2030-12-31', INTERVAL 1 DAY) t(g))
"""


def dim_time(spark: SparkSession) -> DataFrame:
    """One row per second of a day (86 400 rows; populate_dim.py:11-31)."""
    base = "2000-01-01 00:00:00"
    secs = spark.sql("SELECT explode(sequence(0, 86399)) AS s")
    t = F.timestamp_seconds(
        F.unix_timestamp(F.lit(base).cast("timestamp")) + F.col("s")
    )
    return secs.select(
        F.date_format(t, "HHmmss").cast("int").alias("id"),
        F.date_format(t, "HH:mm:ss").alias("Time"),
        F.date_format(t, "hh").cast("int").alias("Hour"),
        F.minute(t).cast("int").alias("Minute"),
        F.second(t).cast("int").alias("Second"),
        F.date_format(t, "HH:mm").alias("Time24"),
        F.hour(t).cast("int").alias("Hour24"),
        F.date_format(t, "a").alias("AmPm"),
    )


DIM_TIME_ORACLE = """
SELECT CAST(strftime(t, '%H%M%S') AS INT) AS id,
       strftime(t, '%H:%M:%S') AS Time,
       CAST(strftime(t, '%I') AS INT) AS Hour,
       CAST(minute(t) AS INT) AS Minute,
       CAST(second(t) AS INT) AS Second,
       strftime(t, '%H:%M') AS Time24,
       CAST(hour(t) AS INT) AS Hour24,
       strftime(t, '%p') AS AmPm
FROM (SELECT TIMESTAMP '2000-01-01 00:00:00' + to_seconds(s) AS t
      FROM generate_series(0, 86399) g(s))
"""
