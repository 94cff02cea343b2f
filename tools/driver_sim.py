#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 alongside its
``oracle_sql()`` DuckDB equivalent and compares row count, sorted column
names, and canonicalized values (columns sorted by name, rows sorted,
floats rounded to 9 significant digits).  This is not bit-identical to
the driver's typed hash — ``tools/lint_oracle_dtypes.py`` covers the
type axis — but it catches every *value* divergence before the driver
does.

Usage::

    python tools/driver_sim.py                 # all queries
    python tools/driver_sim.py name1 name2 ... # subset
    SPARK_GRAFT_SIM_SF_DIR=/root/testdata/sf0.001 python tools/driver_sim.py

Writes ``/tmp/driver_sim.json`` and prints one line per query plus a
final summary.  Exit 1 on any mismatch or error.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from lakehouse_for_data_streaming_and_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v):
    # Artifact classes the driver's typed hash does NOT distinguish
    # (r1 evidence: dim_date_generate green despite DATE->datetime64
    # widening in fetchdf): Decimal trailing zeros vs float64 repr,
    # DATE vs midnight datetime, None vs NaN.
    import datetime as _dt
    import decimal as _dec

    if v is None:
        return "<null>"
    try:
        if v != v:  # NaN / NaT
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, _dec.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, _dt.datetime):
        if v.time() == _dt.time(0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if hasattr(v, "to_pydatetime"):  # pandas Timestamp
        return _canon(v.to_pydatetime())
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _frame_key(df) -> tuple[tuple[str, ...], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    # DRIVER FIDELITY (r4 lesson, VERDICT r4 "What's wrong" #1): the
    # driver canonicalizes with pandas ``sort_values`` over the RAW
    # columns, which raises ``TypeError: unhashable type`` on any
    # list/dict/ndarray cell (array/map/struct output columns).  The
    # r4 sim stringified cells BEFORE sorting and so passed
    # ``user_event_profile`` that the driver then crashed on.  Run the
    # driver's own raw sort first so non-scalar outputs fail the
    # pre-flight loudly.
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    # itertuples, not iterrows: identical tuples, ~100x less Python
    # overhead — iterrows stalled ~1 h on a 16.9M-row frame at sf1
    rows = sorted(
        tuple(_canon(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    return tuple(cols), rows


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("driver_sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # spill, don't OOM: an sf1 oracle with a pathological pair blowup
    # (semdedup on the verbatim-replica embeddings) reached >100 GB
    # RSS and nearly took the box down; cap DuckDB and let it go
    # out-of-core instead
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/tmp/duckdb_sim_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {"err": None}
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            rec["spark_rows"] = len(sdf)
            if name in oracles:
                # optional per-oracle watchdog (seconds; 0 = off): at
                # sf1 a few pure-SQL list-op oracle reimplementations
                # run 2-threaded in DuckDB for tens of minutes — name
                # them as timeouts instead of stalling the whole sim
                budget = float(
                    os.environ.get("SPARK_GRAFT_SIM_ORACLE_TIMEOUT", "0")
                )
                timer = None
                if budget > 0:
                    import threading

                    timer = threading.Timer(budget, con.interrupt)
                    timer.start()
                try:
                    odf = con.execute(oracles[name]).fetchdf()
                finally:
                    if timer is not None:
                        timer.cancel()
                rec["oracle_rows"] = len(odf)
                scols, srows = _frame_key(sdf)
                ocols, orows = _frame_key(odf)
                rec["rows_match"] = len(sdf) == len(odf)
                rec["schema_match"] = scols == ocols
                rec["value_match"] = srows == orows
                if not rec["value_match"] and rec["rows_match"] and rec["schema_match"]:
                    diff = [
                        (a, b) for a, b in zip(srows, orows) if a != b
                    ][:3]
                    rec["first_diffs"] = diff
            else:
                rec["rows_only"] = True
        except Exception:
            rec["err"] = traceback.format_exc(limit=3)
        rec["sec"] = round(time.perf_counter() - t0, 2)
        ok = rec["err"] is None and (
            rec.get("rows_only")
            or (rec["rows_match"] and rec["schema_match"] and rec["value_match"])
        )
        if not ok:
            bad += 1
        results[name] = rec
        flag = "ok " if ok else "BAD"
        print(f"{flag} {name} ({rec['sec']}s)", flush=True)

    with open("/tmp/driver_sim.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    print(f"== {len(results)} checked, {bad} bad ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
