#!/usr/bin/env python3
"""Cross-engine output-dtype lint (DECISIONS.md §8 enforcement).

The driver's correctness gate hashes *typed* results, so a query whose
values match but whose output types diverge (e.g. DuckDB widening
``SUM(INTEGER)`` to HUGEINT while Spark emits BIGINT) fails
``hash_match``.  This tool catches that class of bug for the WHOLE
inventory without executing any data: it analyzes each Spark query's
schema (Catalyst analysis only — no job runs) and binds each oracle in
DuckDB (``Relation.types`` — bind/plan only), then compares the two
under a canonical type mapping.

Usage::

    python tools/lint_oracle_dtypes.py            # lint all oracles
    python tools/lint_oracle_dtypes.py name1 ...  # lint a subset

Exit status 1 if any mismatch.  Also consumed by
``tests/test_oracle_dtypes.py`` as a fleet-wide regression gate.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB logical type -> canonical.  Anything not listed is kept verbatim
# (lower-cased) so novel mismatches still surface.
_DUCK_CANON = {
    "tinyint": "int8",
    "smallint": "int16",
    "integer": "int32",
    "bigint": "int64",
    "hugeint": "int128",  # never matches a Spark type -> always flagged
    "utinyint": "uint8",
    "usmallint": "uint16",
    "uinteger": "uint32",
    "ubigint": "uint64",
    "float": "float32",
    "double": "float64",
    "varchar": "string",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp with time zone": "timestamp",
    "blob": "binary",
}

_SPARK_CANON = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "integer": "int32",
    "bigint": "int64",
    "long": "int64",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}

_DEC_RE = re.compile(r"decimal\((\d+),\s*(\d+)\)", re.IGNORECASE)


def _canon(type_str: str, table: dict[str, str]) -> str:
    s = str(type_str).strip().lower()
    m = _DEC_RE.fullmatch(s)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if s.startswith("array<") or s.startswith("struct<") or s.startswith("map<"):
        return s  # element-type comparison is best-effort verbatim
    if s.endswith("[]"):
        inner = _canon(s[:-2], table)
        return f"array<{inner}>"
    return table.get(s, s)


def duck_output_types(con, sql: str) -> dict[str, str]:
    rel = con.sql(sql)  # bind/plan only; no execution
    return {
        c: _canon(t, _DUCK_CANON) for c, t in zip(rel.columns, rel.types)
    }


def spark_output_types(df) -> dict[str, str]:
    return {
        f.name: _canon(f.dataType.simpleString(), _SPARK_CANON)
        for f in df.schema.fields
    }


def lint(names: list[str] | None = None) -> list[str]:
    """Return a list of human-readable mismatch lines (empty == clean)."""
    import duckdb

    import __spark_entry__ as entrymod
    from lakehouse_for_data_streaming_and_analysis_spark.session import get_spark

    spark = get_spark("oracle_dtype_lint")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    problems: list[str] = []
    target = names or sorted(oracles)
    for name in target:
        sql = oracles.get(name)
        if sql is None:
            problems.append(f"{name}: oracle missing")
            continue
        fn = qs.get(name)
        if fn is None:
            problems.append(f"{name}: oracle has no queries() entry")
            continue
        try:
            duck_t = duck_output_types(con, sql)
        except Exception as e:  # noqa: BLE001 - report, keep linting
            problems.append(f"{name}: DuckDB bind error: {e}")
            continue
        try:
            spark_t = spark_output_types(fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: Spark analysis error: {e}")
            continue
        if set(duck_t) != set(spark_t):
            problems.append(
                f"{name}: column sets differ: duck={sorted(duck_t)} spark={sorted(spark_t)}"
            )
            continue
        for col in sorted(duck_t):
            if duck_t[col] != spark_t[col]:
                problems.append(
                    f"{name}.{col}: duck={duck_t[col]} spark={spark_t[col]}"
                )
    return problems


def main() -> int:
    names = sys.argv[1:] or None
    problems = lint(names)
    for p in problems:
        print(p)
    print(f"-- {len(problems)} mismatch(es)")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
