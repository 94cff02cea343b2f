"""Vector expressions over ArrayType(Float/Double) embedding columns.

Built on higher-order functions (zip_with / aggregate / transform) —
JVM-evaluated, no Python round-trip. ``aggregate`` folds left-to-right
over the array, so the summation order is deterministic (important for
oracle-matched similarity scores).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column | str) -> Column:
    arr = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def scale(a: Column, s: Column | float) -> Column:
    s = F.lit(s) if isinstance(s, (int, float)) else s
    return F.transform(a, lambda x: x * s)


def add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x + y)
