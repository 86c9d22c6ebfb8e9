"""Emit the round-close registry totals for BENCH.md from the registry
itself — never hand-written (the r4 verdict caught a hand-maintained
count going stale the same round two queries landed).

Usage: python scripts/registry_stats.py
Prints one markdown-ready line plus the rows-only key list (should stay
empty: every operator with observable output carries a DuckDB twin).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry


def main() -> int:
    qs = entry.queries()
    oracles = entry.oracle_sql()
    rows_only = sorted(k for k in qs if k not in oracles)
    extra = sorted(k for k in oracles if k not in qs)
    print(
        f"Registry: **{len(qs)} queries, {len(oracles)} DuckDB oracle twins, "
        f"{len(rows_only)} rows-only entries**"
    )
    if rows_only:
        print("rows-only:", ", ".join(rows_only))
    if extra:
        print("ORPHAN oracle keys (no queries() entry):", ", ".join(extra))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
