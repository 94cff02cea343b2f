#!/usr/bin/env python3
"""Rotate the driver-verification window (see __spark_entry__.py).

The driver oracle-checks only the FIRST 50 keys of ``queries()`` each
round. This tool ingests a round's ``CORRECTNESS_r{N}.json``, folds the
newly green names into DRIVER_GREEN, and proposes the next
WINDOW_PRIORITY: hash-fail names first (they need re-verification after
fixes), then never-checked oracle-backed queries in registry order.

Since round 9 the window is also STALENESS-AWARE (VERDICT r8 ask #1):
with the registry closed (every query green at least once), a green
row's evidentiary value decays as the code under it churns. When the
window has spare slots after failed + never-checked names, they are
filled with the STALEST greens — ranked by lines changed (git numstat)
in each query's implementing SURFACE between the commit that recorded
its most recent green row (the round's CORRECTNESS artifact) and HEAD,
tie-broken by green age (older round first) then name. A re-verified
green refreshes its row, resetting the clock.

The churn surface is the query's defining module PLUS every package
module that module directly imports (operators/, functions/,
analytics/, ... — resolved from live module attributes, so both
``from ..operators import sessions`` and ``from ..operators.dedup
import minhash`` count).  Scoring only the defining module was a
blind spot (ADVICE r9): a shared operator could change while every
query module importing it scored zero churn and never rotated in.
Transitive (deeper) imports still don't count — one level covers the
call sites the query actually exercises without making every green
stale whenever any leaf utility changes.

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
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ENTRY = os.path.join(REPO, "__spark_entry__.py")
WINDOW = 50


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def _green_rounds() -> dict[str, int]:
    """query -> most recent round with a green row, from the committed
    CORRECTNESS_r*.json artifacts."""
    latest: dict[str, int] = {}
    for fn in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(os.path.join(REPO, fn)) as f:
            rows = json.load(f)
        for name, v in rows.items():
            if v.get("hash_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _round_commits() -> dict[int, str]:
    """round -> the commit that added its CORRECTNESS artifact."""
    out: dict[int, str] = {}
    for fn in os.listdir(REPO):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        log = _git(
            "log", "--diff-filter=A", "--format=%H", "--", fn
        ).split()
        if log:
            out[int(m.group(1))] = log[-1]
    return out


_PKG = "lakehouse_for_data_streaming_and_analysis_spark"


def _module_surface(mod) -> tuple[str, ...]:
    """Repo-relative files of ``mod`` plus every package module it
    directly imports (module attributes AND attributes carrying a
    package ``__module__``, so ``from ..x import fn`` counts too)."""
    import types

    files = set()

    def add(m) -> None:
        f = getattr(m, "__file__", None)
        if f and os.path.abspath(f).startswith(REPO + os.sep):
            files.add(os.path.relpath(f, REPO))

    add(mod)
    for v in vars(mod).values():
        if isinstance(v, types.ModuleType):
            m = v
        else:
            owner = getattr(v, "__module__", None)
            m = sys.modules.get(owner) if owner else None
        if m is not None and getattr(m, "__name__", "").startswith(_PKG):
            add(m)
    return tuple(sorted(files))


def _impl_files(queries: dict) -> dict[str, tuple[str, ...]]:
    """query -> repo-relative paths of its implementing surface."""
    import inspect

    out: dict[str, tuple[str, ...]] = {}
    surface_cache: dict[str, tuple[str, ...]] = {}
    for name, fn in queries.items():
        modname = getattr(fn, "__module__", None)
        mod = sys.modules.get(modname) if modname else None
        if mod is None:
            try:
                out[name] = (os.path.relpath(inspect.getfile(fn), REPO),)
            except TypeError:
                out[name] = (os.path.relpath(ENTRY, REPO),)
            continue
        if modname not in surface_cache:
            surface_cache[modname] = _module_surface(mod)
        out[name] = surface_cache[modname]
    return out


def staleness(queries: dict) -> list[tuple[str, int, int]]:
    """[(query, churn_lines, green_round)] sorted stalest-first.

    churn_lines = added+deleted lines in the query's implementing
    module between the commit that recorded its latest green row and
    HEAD. Zero-churn greens sort last (their evidence still binds).
    """
    rounds = _green_rounds()
    commits = _round_commits()
    files = _impl_files(queries)
    churn_cache: dict[tuple[str, tuple[str, ...]], int] = {}
    scored: list[tuple[str, int, int]] = []
    for name in queries:
        rnd = rounds.get(name)
        if rnd is None or rnd not in commits:
            continue
        key = (commits[rnd], files[name])
        if key not in churn_cache:
            numstat = _git(
                "diff", "--numstat", key[0], "HEAD", "--", *key[1]
            )
            total = 0
            for line in numstat.splitlines():
                a, d, *_ = line.split("\t")
                if a.isdigit() and d.isdigit():
                    total += int(a) + int(d)
            churn_cache[key] = total
        scored.append((name, churn_cache[key], rnd))
    scored.sort(key=lambda t: (-t[1], t[2], t[0]))
    return scored


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
    qs = m.queries()
    unchecked = [
        k
        for k in qs
        if k not in all_green and k not in failed_now and k in oracles
    ]
    window = (failed_now + unchecked)[:WINDOW]
    if len(window) < WINDOW:
        staged = set(window)
        stale = [
            name
            for name, churn, _rnd in staleness(qs)
            if name not in staged and churn > 0
        ]
        window += stale[: WINDOW - len(window)]
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
