"""Generate QUERIES.md — the one-line-per-query inventory.

Run: ``python -m lakehouse_for_data_streaming_and_analysis_spark.inventory``
Regenerates QUERIES.md from the live registry so the doc can never
drift from ``__spark_entry__.queries()``.
"""

from __future__ import annotations

import os
import sys


def generate(out_path: str = "QUERIES.md") -> str:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    lines = [
        "# QUERIES — driver-facing inventory",
        "",
        "Auto-generated from `__spark_entry__.queries()` by",
        "`python -m lakehouse_for_data_streaming_and_analysis_spark.inventory` — do not edit by hand.",
        "",
        f"{len(qs)} queries, {len(oracles)} DuckDB-oracle-backed"
        f" ({len(qs) - len(oracles)} rows-only iterative ops).",
        "",
        "Exact/approx unification: the quantile, distinct-count, and",
        "heavy-hitter families below exist in both exact and sketch",
        "form; `operators/sketches.py` exposes each as ONE operator",
        "with an `exact=` switch, identical output schema in both",
        "modes, mergeable sketch state (DDSketch buckets, HLL",
        "registers, count-min cells), and published error bounds",
        "gated per sketch against the exact twin in",
        "`tests/test_sketch_unification.py` — the 100 TB path is a",
        "one-line swap.",
        "",
        "| query | module | check | summary |",
        "|---|---|---|---|",
    ]
    for name in sorted(qs):
        fn = qs[name]
        mod = fn.__module__.rsplit(".", 1)[-1]
        doc = (fn.__doc__ or "").strip().split("\n")[0].strip()
        check = "oracle" if name in oracles else "rows-only"
        lines.append(f"| `{name}` | {mod} | {check} | {doc} |")
    text = "\n".join(lines) + "\n"
    with open(out_path, "w") as f:
        f.write(text)
    return text


if __name__ == "__main__":
    generate(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md"))
    print("QUERIES.md regenerated")
