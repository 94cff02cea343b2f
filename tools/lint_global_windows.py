#!/usr/bin/env python3
"""Fleet lint: unpartitioned (global) window functions need a declared
bounded grain.

An unpartitioned ``Window.orderBy(...)`` forces every input row through
ONE task — the classic 100 TB scale-killer. The ~29 existing sites in
the package are all safe because they operate on post-aggregation
grains that are bounded by construction (daily series, the 25-nation
dim, a 3-row threshold grid), not on the raw corpus — a justification
the round-8 VERDICT ("What's wrong" #3) asked to make structural
instead of re-earned prose: every new query family was re-arguing it
in review.

This lint enforces the declaration at the call site. Every
``Window.orderBy`` whose receiver is the ``Window`` class itself (i.e.
no ``partitionBy``) must carry a grain tag comment on the call line or
in the contiguous comment block directly above it::

    # bounded-grain: daily close series (= distinct days, not corpus rows)
    w = Window.orderBy("day")

The tag must name WHAT bounds the partition. Untagged sites fail the
lint; so do tags with no text after the colon. ``Window.partitionBy``
chains are exempt (they scale with the key count), as is the scale-safe
``surrogate_keys_distributed`` zipWithIndex-style sibling
(operators/windows.py) which exists precisely for unbounded inputs.

Detection is AST-based (``ast.walk`` for ``Call(func=Attribute(
value=Name('Window'), attr='orderBy'))``), so aliased/partitioned
windows never false-positive and string contents never match.

Usage::

    python tools/lint_global_windows.py          # exit 1 on violations

Consumed by ``tests/test_plans.py`` as a fleet gate (VERDICT r8 ask #8).
"""

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "lakehouse_for_data_streaming_and_analysis_spark")
TAG = "bounded-grain:"


def _global_window_calls(tree: ast.AST):
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "orderBy"
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "Window"
        ):
            yield node.lineno


def _tagged(lines: list[str], lineno: int) -> bool:
    """Tag on the call line or anywhere in the contiguous comment block
    directly above it, with non-empty reason text after the colon."""
    candidates = [lineno]
    ln = lineno - 1
    while 1 <= ln <= len(lines) and lines[ln - 1].lstrip().startswith("#"):
        candidates.append(ln)
        ln -= 1
    for ln in candidates:
        if 1 <= ln <= len(lines):
            text = lines[ln - 1]
            if TAG in text:
                reason = text.split(TAG, 1)[1].strip()
                return bool(reason)
    return False


def lint(root: str = PKG) -> list[str]:
    """Return 'path:line' for every untagged global-window site."""
    problems: list[str] = []
    for dirpath, _dirs, files in os.walk(root):
        if "__pycache__" in dirpath:
            continue
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as f:
                src = f.read()
            lines = src.splitlines()
            tree = ast.parse(src, filename=path)
            for lineno in _global_window_calls(tree):
                if not _tagged(lines, lineno):
                    rel = os.path.relpath(path, REPO)
                    problems.append(f"{rel}:{lineno}")
    return problems


def main() -> None:
    problems = lint()
    if problems:
        print(
            "untagged global Window.orderBy sites (add a "
            "'# bounded-grain: <what bounds the partition>' comment on "
            "the call line or the line above, or partition the window):"
        )
        for p in problems:
            print(f"  {p}")
        sys.exit(1)
    print("all global-window sites carry a bounded-grain tag")


if __name__ == "__main__":
    main()
