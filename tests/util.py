"""Oracle comparison helpers mirroring the driver's check: row count +
column names + order-insensitive value comparison."""

from __future__ import annotations

import math


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    return v


def rows_to_set(cols, rows):
    """Sorted-column, order-insensitive multiset of normalized rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(_norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def assert_matches_oracle(spark_df, duck_con, sql):
    sres = spark_df.collect()
    scols = spark_df.columns
    dres = duck_con.execute(sql)
    dcols = [d[0] for d in dres.description]
    drows = dres.fetchall()
    assert sorted(scols) == sorted(dcols), f"columns differ: {scols} vs {dcols}"
    assert len(sres) == len(drows), f"row counts differ: {len(sres)} vs {len(drows)}"
    sset = rows_to_set(scols, [tuple(r) for r in sres])
    dset = rows_to_set(dcols, drows)
    if sset != dset:
        only_s = {k: c for k, c in sset.items() if dset.get(k) != c}
        only_d = {k: c for k, c in dset.items() if sset.get(k) != c}
        raise AssertionError(
            f"value mismatch; spark-only={list(only_s.items())[:5]} "
            f"duck-only={list(only_d.items())[:5]}"
        )
