"""Hashing / fingerprint expressions (SURVEY.md §2.9 string rows).

Change-detection hash mirrors the reference's SCD-2 candidate hashing
(reference: Sourcecode/spark/populate_dim.py:116 —
``sha2(concat_ws("~", ...), 256)``). All JVM-side built-ins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def row_hash(cols: Sequence[Column | str], sep: str = "~", bits: int = 256) -> Column:
    """sha2(concat_ws(sep, cols), bits) — SCD-2 change-detection hash."""
    return F.sha2(F.concat_ws(sep, *cols), bits)


def text_fingerprint(c: Column | str) -> Column:
    """md5 of normalized text — exact-dedup key. Normalization:
    lowercase + collapse whitespace, so trivially-reformatted copies
    collide."""
    c = F.col(c) if isinstance(c, str) else c
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))
