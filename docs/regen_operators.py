"""Regenerate docs/OPERATORS.md from __spark_entry__.queries().

Keeps each row's hand-written semantics text (parsed from the existing
table), re-emits the rows in current queries() order with fresh position
numbers and the correctness column derived from position: entries 1-50
are the driver's value-check window, 51+ are local-parity (every entry
has a DuckDB oracle since r5). A brand-new query with no existing row
gets its docstring's first sentence as a placeholder — edit it by hand.

Run from the repo root: python docs/regen_operators.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

DOC = ROOT / "docs" / "OPERATORS.md"


def main() -> None:
    import __spark_entry__ as em

    text = DOC.read_text()
    head, _, table = text.partition("| # | query | semantics | correctness |")
    existing: dict[str, str] = {}
    for line in table.splitlines():
        m = re.match(r"\| \d+ \| `([^`]+)` \| (.*) \| [^|]+ \|$", line)
        if m:
            existing[m.group(1)] = m.group(2)

    rows = []
    for i, (name, fn) in enumerate(em.queries().items(), start=1):
        sem = existing.get(name)
        if sem is None:
            doc = (fn.__doc__ or "").strip().replace("\n", " ")
            sem = re.sub(r"\s+", " ", doc.split(". ")[0]) + "."
        status = "driver window" if i <= 50 else "local parity"
        rows.append(f"| {i} | `{name}` | {sem} | {status} |")

    out = (
        head
        + "| # | query | semantics | correctness |\n|---|---|---|---|\n"
        + "\n".join(rows)
        + "\n"
    )
    DOC.write_text(out)
    print(f"wrote {DOC} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
