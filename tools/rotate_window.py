#!/usr/bin/env python3
"""Rotate the driver-verification window (see __spark_entry__.py).

The driver oracle-checks only the FIRST 50 keys of ``queries()`` each
round. This tool ingests a round's ``CORRECTNESS_r{N}.json``, folds the
newly green names into DRIVER_GREEN, and proposes the next
WINDOW_PRIORITY: hash-fail names first (they need re-verification after
fixes), then never-checked oracle-backed queries in registry order.

Usage:
    python tools/rotate_window.py CORRECTNESS_r02.json          # report
    python tools/rotate_window.py CORRECTNESS_r02.json --apply  # rewrite
                                                               # __spark_entry__.py

--apply rewrites the DRIVER_GREEN and WINDOW_PRIORITY tuples in place
(the tuples must keep their current ``NAME = (`` ... ``)`` layout).
After applying, re-run pytest tests/test_entry.py to re-validate the
registry.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ENTRY = os.path.join(REPO, "__spark_entry__.py")
WINDOW = 50


def compute(correctness_path: str):
    import __spark_entry__ as m

    with open(correctness_path) as f:
        rows = json.load(f)
    green_now = {
        k
        for k, v in rows.items()
        if v.get("hash_match") or (v.get("err") is None and k in m.ROWS_ONLY)
    }
    failed_now = [
        k for k, v in rows.items() if k not in green_now
    ]
    all_green = sorted(set(m.DRIVER_GREEN) | green_now)
    oracles = set(m.oracle_sql())
    unchecked = [
        k
        for k in m.queries()
        if k not in all_green and k not in failed_now and k in oracles
    ]
    window = (failed_now + unchecked)[:WINDOW]
    return all_green, window, failed_now


def _format_tuple(name: str, items) -> str:
    body = "".join(f'    "{x}",\n' for x in items)
    return f"{name} = (\n{body})"


def apply(all_green, window) -> None:
    with open(ENTRY) as f:
        src = f.read()
    for name, items in (
        ("DRIVER_GREEN", all_green),
        ("WINDOW_PRIORITY", window),
    ):
        # line-anchored: tolerate parens inside comment lines in the tuple
        pat = re.compile(rf"^{name} = \(\n.*?^\)", re.S | re.M)
        if not pat.search(src):
            raise SystemExit(f"could not locate tuple {name} in {ENTRY}")
        src = pat.sub(_format_tuple(name, items), src, count=1)
    with open(ENTRY, "w") as f:
        f.write(src)


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    all_green, window, failed = compute(sys.argv[1])
    print(f"cumulative green: {len(all_green)}")
    print(f"failed this round (window head): {failed}")
    print(f"next window ({len(window)}): {window}")
    if "--apply" in sys.argv:
        apply(all_green, window)
        print(f"rewrote {ENTRY}")


if __name__ == "__main__":
    main()
