#!/usr/bin/env python
"""Regenerate QUERIES.md from the live query registry.

Keeps the doc in lockstep with ``all_queries()`` — run after adding a
query.  Usage: python scripts/gen_queries_md.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


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
    with open("/root/repo/QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {n} entries, {n_oracle} oracle-paired")


if __name__ == "__main__":
    main()
