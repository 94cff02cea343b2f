"""Exact (order-independent) aggregate carriers — DECISIONS.md §50/§53.

The fleet's time-series stage boundary was ``ROUND(AVG(value), 6)``: a
float sum whose accumulation ORDER differs between engines (and between
data layouts), rounded on a 1e-6 grid. At sf1 the 10x-replicated events
table pushed one daily mean onto a rounding tie and
``hurst_exponent_rs`` flipped its last digit (r10 full-registry sf1
sim) — the same class as the r9 ``sessionize_user_events`` red.

``events.value`` is exact 2-decimal data (fixture-verified), so the
mean of any group is the exact rational ``cents / (100 * n)``.  These
helpers round it half-up on the 1e-6 grid entirely in integer space:

    v6 = (2 * cents * 10**4 + n) intdiv (2 * n)        # half-up
    v  = v6 / 1e6                                      # exact double

Both engines compute the same BIGINT, then the same exact double
division — bit-identical by construction, no ROUND anywhere.  Values
differ from the old float path ONLY at exact representation ties, so
historical greens stay valid (the §50 argument).

Numerator bound: cents <= ~5e2 * 1e2 * group_rows; at sf100 a daily
group is ~1.3e6 rows -> numerator ~1.3e15 << 2^63.  The Spark side
still uses integral DIV (not float floor) so the carrier stays exact
far beyond that.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mean_6dp_sql(col: str = "value") -> str:
    """DuckDB spelling of the exact 6dp half-up group mean."""
    return (
        f"CAST((2 * CAST(SUM(CAST({col} AS DECIMAL(18,2))) * 100 AS BIGINT)"
        f" * 10000 + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 1000000"
    )


def mean_6dp(col: str = "value") -> Column:
    """Spark spelling — an aggregate expression usable in ``agg``/
    ``pivot().agg``, value-identical to :func:`mean_6dp_sql`."""
    return (
        F.expr(
            f"(2 * CAST(sum(CAST({col} AS DECIMAL(18,2))) * 100 AS BIGINT)"
            f" * 10000 + count(*)) DIV (2 * count(*))"
        ).cast("double")
        / 1000000
    )
