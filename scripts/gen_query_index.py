#!/usr/bin/env python
"""Regenerate QUERIES.md from the live registry (one line per declared
query: name, check kind, first docstring sentence)."""

from __future__ import annotations

import inspect
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from java_etl_bi_generator_spark.oracles import ORACLES  # noqa: E402
from java_etl_bi_generator_spark.queries import registry  # noqa: E402


def main() -> None:
    reg = registry()
    lines = [
        "# QUERIES — declared-query index",
        "",
        "Auto-generated from `queries.registry()` (regenerate: "
        "`python scripts/gen_query_index.py`).  Check = `hash` (DuckDB oracle "
        "value-hash at sf0.01) or `rows` (rows-only).",
        "",
        f"{len(reg)} queries: {sum(1 for q in reg if q in ORACLES)} "
        f"hash-checked, {sum(1 for q in reg if q not in ORACLES)} rows-only.",
        "",
        "| Query | Check | Summary |",
        "|---|---|---|",
    ]
    for name in sorted(reg):
        doc = inspect.getdoc(reg[name]) or ""
        first = " ".join(
            re.split(r"\.(?:\s|$)", doc, 1)[0].replace("\n", " ").split()
        )
        check = "hash" if name in ORACLES else "rows"
        lines.append(f"| `{name}` | {check} | {first}. |")
    with open(os.path.join(REPO, "QUERIES.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(reg)} entries")


if __name__ == "__main__":
    main()
