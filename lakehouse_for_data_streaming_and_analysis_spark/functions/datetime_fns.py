"""Datetime expression library (SURVEY.md §2.9 date/time rows).

Re-expresses the reference's surrogate-key/time derivations as pure
column expressions (JVM-side, codegen-friendly — no UDFs):
  - date_id = y*10000 + m*100 + d   (reference: Sourcecode/spark/udf.py:49-50)
  - time_id = HHmmss as int          (reference: Sourcecode/spark/etl.py:57)
  - unix seconds -> session-tz timestamp (reference: etl.py:24-25)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_id(c: Column | str) -> Column:
    """Integer yyyyMMdd surrogate key for a date/timestamp column."""
    c = F.col(c) if isinstance(c, str) else c
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("int")


def time_id(c: Column | str) -> Column:
    """Integer HHmmss surrogate key (reference: etl.py:57)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.date_format(c, "HHmmss").cast("int")


def from_unix_seconds(c: Column | str, tz: str | None = None) -> Column:
    """Unix seconds (double) -> timestamp, optionally shifted to a named
    zone (reference: etl.py:24-25 localizes to Asia/Ho_Chi_Minh)."""
    c = F.col(c) if isinstance(c, str) else c
    ts = F.to_timestamp(F.from_unixtime(c))
    return F.from_utc_timestamp(ts, tz) if tz else ts


def created_at(c: Column | str) -> Column:
    """HH:mm:ss string stamp (reference: etl.py:61)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.date_format(c, "HH:mm:ss")


def zero_pad_time_id(c: Column | str, width: int = 6) -> Column:
    """lpad(time_id, 6, '0') (reference: TimeDelay.ipynb zfill(6))."""
    c = F.col(c) if isinstance(c, str) else c
    return F.lpad(c.cast("string"), width, "0")
