#!/usr/bin/env python
"""Regenerate QUERIES.md from the live query registry.

Keeps the doc in lockstep with ``all_queries()`` — run after adding a
query.  Usage: python scripts/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    from fluvio_duck_spark.queries import all_queries

    qs = all_queries()
    n = len(qs)
    n_oracle = sum(1 for s in qs.values() if s.oracle)
    lines = [
        "# QUERIES — the `queries()` inventory",
        "",
        f"{n} entries; {n_oracle} oracle-paired (driver hash-compares Spark vs "
        "DuckDB at sf0.01), the rest rows-only with equivalence/recall tests "
        "named in COVERAGE.md.",
        "",
        "| query | oracle | what it demonstrates |",
        "|---|---|---|",
    ]
    for name, spec in qs.items():
        kind = "SQL" if spec.oracle else "rows-only"
        lines.append(f"| `{name}` | {kind} | {spec.doc} |")
    with open(os.path.join(_REPO, "QUERIES.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {n} entries, {n_oracle} oracle-paired")

    # Rewrite COVERAGE.md's totals line from the same live registry so
    # the committed numbers cannot drift from QUERIES.md (VERDICT r3 #9:
    # one source of truth).
    import re

    cov_path = os.path.join(_REPO, "COVERAGE.md")
    cov = open(cov_path).read()
    cov2, n_sub = re.subn(
        r"Current totals: \d+ registered queries, \d+ oracle-paired",
        f"Current totals: {n} registered queries, {n_oracle} oracle-paired",
        cov,
        count=1,
    )
    if n_sub:
        open(cov_path, "w").write(cov2)
        print(f"COVERAGE.md: totals synced ({n}/{n_oracle})")
    else:
        print("COVERAGE.md: totals line not found — update manually")


if __name__ == "__main__":
    main()
