#!/usr/bin/env python
"""Regenerate README.md's '## Operator coverage' table from the registry
(run after adding/changing entries so the README can't drift)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    REGISTRY,
    _ensure_loaded,
)

HEADER = "## Operator coverage (generated from the registry)"


def table() -> str:
    _ensure_loaded()
    n = len(REGISTRY)
    with_oracle = sum(1 for rq in REGISTRY.values() if rq.oracle is not None)
    lines = [
        HEADER,
        "",
        f"{n} registered queries, {with_oracle} with exact DuckDB oracles"
        + (
            "." if with_oracle == n
            else " (the rest are validated rows-only plus dedicated recall tests)."
        ),
        "",
        "| query | oracle | covers |",
        "|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        rq = REGISTRY[name]
        oracle = "DuckDB SQL" if rq.oracle is not None else "rows-only (validated in tests)"
        lines.append(f"| `{name}` | {oracle} | {rq.covers or '—'} |")
    return "\n".join(lines) + "\n"


def main() -> None:
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")
    text = open(path).read()
    pattern = re.compile(re.escape(HEADER) + r".*?(?=\n## |\Z)", re.DOTALL)
    if not pattern.search(text):
        raise SystemExit(f"section {HEADER!r} not found in README.md")
    open(path, "w").write(pattern.sub(table(), text))
    print("README operator table regenerated:", len(REGISTRY), "entries")


if __name__ == "__main__":
    main()
