"""Declarative data-quality constraints (deequ-style): a constraint
spec compiles to ONE aggregate pass over the table, returning a
per-constraint report (metric, threshold, pass/fail).

The lakehouse needs this at ingest gates (bronze -> silver promotion
in the reference's medallion flow): completeness, uniqueness, domain
membership, range bounds, and referential integrity — each a single
JVM aggregate expression, so a 50-constraint suite still costs one
scan + one 1-row shuffle. Referential integrity joins the (small)
key-side aggregate in by broadcast rather than scanning twice.

Constraints are algebraic over counts, so the report is exact and
engine-portable (the oracle recomputes each metric independently).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: `name`, the aggregate `metric` (0..1 fraction
    or a count), and `ok` — the boolean pass expression over the
    metric column."""

    name: str
    metric: Column
    # threshold semantics: metric >= min_frac passes
    min_frac: float = 1.0


def completeness(col: str) -> Check:
    """Fraction of non-null values."""
    return Check(
        f"completeness({col})",
        F.avg(F.col(col).isNotNull().cast("double")),
    )


def uniqueness(col: str) -> Check:
    """Fraction of values that occur exactly once — computed without
    a self-join: distinct count equals total count iff all unique, and
    approx for the report is exact via two count aggregates."""
    return Check(
        f"uniqueness({col})",
        F.count_distinct(F.col(col)).cast("double")
        / F.count(F.col(col)).cast("double"),
    )


def in_set(col: str, values: tuple) -> Check:
    """Fraction of values inside the accepted domain."""
    return Check(
        f"in_set({col})",
        F.avg(F.col(col).isin(*values).cast("double")),
    )


def non_negative(col: str) -> Check:
    return Check(
        f"non_negative({col})",
        F.avg((F.col(col) >= 0).cast("double")),
    )


def bounds(col: str, lo: float, hi: float, min_frac: float = 1.0) -> Check:
    return Check(
        f"bounds({col})",
        F.avg(F.col(col).between(lo, hi).cast("double")),
        min_frac,
    )


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every constraint in ONE aggregate pass. Returns
    (constraint_name, metric, threshold, passed) rows."""
    row = df.agg(
        *[F.round(c.metric, 6).alias(f"m{i}") for i, c in enumerate(checks)]
    )
    reports = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("constraint_name"),
                F.col(f"m{i}").alias("metric"),
                F.lit(c.min_frac).alias("threshold"),
                (F.col(f"m{i}") >= c.min_frac).alias("passed"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return row.select(F.explode(reports).alias("r")).select("r.*")


def referential_integrity(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Orphan fraction: child keys without a parent. The parent side
    reduces to its distinct keys (broadcastable at dimension scale);
    the child side is scanned once with a broadcast left join."""
    pk = parent.select(F.col(parent_key).alias("__pk")).distinct()
    j = child.join(
        F.broadcast(pk), child[child_key] == F.col("__pk"), "left"
    )
    return j.agg(
        F.lit(f"ref({child_key}->{parent_key})").alias("constraint_name"),
        F.round(F.avg(F.col("__pk").isNotNull().cast("double")), 6).alias(
            "metric"
        ),
        F.lit(1.0).alias("threshold"),
        (F.count(F.when(F.col("__pk").isNull(), 1)) == 0).alias("passed"),
    )
