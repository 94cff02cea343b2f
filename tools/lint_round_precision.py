#!/usr/bin/env python3
"""Fleet lint: cross-engine float-rounding precision hazards.

The round-7 driver red (``dow_seasonality_strength``) shipped because an
oracle emitted ``ROUND(VAR_POP(v), 6)`` on a ~3e6-magnitude variance:
six decimals on a 10^6 double demands ~13 significant digits, beyond
what float64 summation-order determinism guarantees across engines and
thread schedules, so DuckDB's different accumulation order flipped the
6th decimal and the typed hash went red — while the builder's own sim
canon (9 significant digits) was exactly blind to it (VERDICT r7,
"What's wrong #1").

This lint closes that blind spot at the *output* level, where the
driver hashes: it executes every oracle at sf0.01, and for each float64
output column measures

* ``d_obs`` — the effective rounding precision actually present in the
  values (the smallest ``d`` in 0..9 such that ``round(v, d) == v`` for
  every value), and
* ``mag`` — the maximum absolute value.

A column is HAZARDOUS when ``mag * 10**d_obs`` exceeds the threshold
(default 1e12 ≈ the float64 determinism budget with ~3 digits of
margin): the emitted precision then demands more significant digits
than cross-engine float64 reproducibility guarantees, so the hash can
flip on a different summation order even though both plans are correct.
Fix by lowering the ROUND precision (magnitude-aware: 10^6 values get
≤2 dp), emitting a scale-free ratio instead, or accumulating in
DECIMAL before rounding (the ``o_totalprice`` audit pattern).

Columns that no ``d ≤ 9`` reproduces are reported as ``unrounded`` —
raw doubles in a hashed output are their own hazard class unless the
computation is exactly reproducible (integer-valued, single-value, or
decimal-backed); they are listed but only fail the lint when their
magnitude alone exceeds the threshold.

Usage::

    python tools/lint_round_precision.py            # whole registry
    python tools/lint_round_precision.py name1 ...  # subset
    SPARK_GRAFT_LINT_THRESHOLD=1e11 python tools/lint_round_precision.py

Exit 1 on any hazardous column.  Consumed by
``tests/test_oracle_dtypes.py`` as a fleet regression gate and part of
the round-close checklist (VERDICT r7 ask #1).
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
THRESHOLD = float(os.environ.get("SPARK_GRAFT_LINT_THRESHOLD", "1e12"))

# query.column -> why high apparent precision is safe there.  The lint's
# hazard model is two engines independently re-accumulating floats; a column is
# exempt when the oracle does NOT independently recompute it — e.g. the
# fixture-literal oracles (DECISIONS.md §14), whose values come from the
# same deterministic Python recursion both sides run over a
# DECIMAL-pinned stage boundary, so they are bit-identical by
# construction rather than by rounding headroom.
ALLOW = {
    "garch_volatility.omega": (
        "oracle embeds grid-QMLE literals from the identical recursion "
        "over the DECIMAL(18,2)-pinned hourly stage (analytics.py "
        "HOURLY_SQL); driver-green r4"
    ),
}
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _effective_decimals(values) -> int | None:
    """Smallest d in 0..9 with round(v, d) == v for all values, else None."""
    vals = [float(v) for v in values if v is not None and v == v and math.isfinite(float(v))]
    if not vals:
        return 0
    for d in range(10):
        if all(round(v, d) == v for v in vals):
            return d
    return None


def lint(names=None):
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    targets = names or sorted(oracles)
    hazards, unrounded, errors = [], [], []
    for name in targets:
        sql = oracles.get(name)
        if sql is None:
            errors.append((name, "no oracle"))
            continue
        try:
            rel = con.execute(sql)
            cols = [d[0] for d in rel.description]
            rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            errors.append((name, f"{type(exc).__name__}: {exc}"))
            continue
        if not rows:
            continue
        for ci, col in enumerate(cols):
            vals = [r[ci] for r in rows]
            floats = [v for v in vals if isinstance(v, float)]
            if not floats or len(floats) < sum(v is not None for v in vals):
                continue
            mag = max((abs(v) for v in floats if v == v and math.isfinite(v)), default=0.0)
            d = _effective_decimals(floats)
            if f"{name}.{col}" in ALLOW:
                continue
            if d is None:
                if mag > THRESHOLD:
                    hazards.append((name, col, mag, "raw"))
                else:
                    unrounded.append((name, col, mag))
                continue
            demand = mag * 10**d
            if demand > THRESHOLD:
                hazards.append((name, col, mag, f"{d}dp→{demand:.1e}"))
    return hazards, unrounded, errors


def main() -> int:
    names = sys.argv[1:] or None
    hazards, unrounded, errors = lint(names)
    for name, col, mag, why in hazards:
        print(f"HAZARD  {name}.{col}: |max|={mag:.4g} {why} "
              f"(> {THRESHOLD:.0e} sig-digit budget)")
    for name, col, mag in unrounded:
        print(f"note    {name}.{col}: unrounded float output (|max|={mag:.4g})")
    for name, err in errors:
        print(f"ERROR   {name}: {err}")
    n = "all" if names is None else len(names)
    print(
        f"checked {n} oracles @ {SF_DIR}: "
        f"{len(hazards)} hazardous, {len(unrounded)} unrounded-note, "
        f"{len(errors)} errors"
    )
    return 1 if hazards or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
