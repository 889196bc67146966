"""Regenerate docs/OPERATORS.md from __spark_entry__.queries(): one row
per query in driver order, docstring as semantics, correctness tag from
the 50-entry driver-window boundary.  Run after any queries() rotation
so the catalog can't drift from the real window membership."""

from __future__ import annotations

import inspect
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as em

    path = os.path.join(REPO, "docs", "OPERATORS.md")
    head = open(path).read().split("| # | query |")[0]
    rows = []
    for i, (name, fn) in enumerate(em.queries().items(), 1):
        doc = " ".join((inspect.getdoc(fn) or "").split())
        tag = "driver window" if i <= 50 else "local parity"
        rows.append(f"| {i} | `{name}` | {doc} | {tag} |")
    body = (
        "| # | query | semantics | correctness |\n|---|---|---|---|\n"
        + "\n".join(rows)
        + "\n"
    )
    open(path, "w").write(head + body)
    print(f"wrote {len(rows)} rows")


if __name__ == "__main__":
    main()
