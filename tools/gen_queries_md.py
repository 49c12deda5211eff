"""Regenerate QUERIES.md — the query-board index — from the registry
(plans/queries.py docstrings + oracle coverage). Run after adding or
reordering declared queries:

    python tools/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADER = """# QUERIES — the declared board (auto-generated from plans/queries.py docstrings)

Order = driver gate order (the external gate records the first 50).
Every query has an independent DuckDB oracle; `tools/compare.py` runs the
board, `--vanilla` on a bare session.

| # | Query | Oracle | What it computes |
| --- | --- | --- | --- |
"""


def first_line(doc: str | None) -> str:
    if not doc:
        return ""
    return doc.strip().splitlines()[0].strip()


def main() -> None:
    from adtech_log_data_pipeline_spark.plans.oracles import ORACLES
    from adtech_log_data_pipeline_spark.plans.queries import QUERIES

    rows = []
    for i, (name, fn) in enumerate(QUERIES.items(), start=1):
        oracle = "SQL" if name in ORACLES else "rows-only"
        rows.append(f"| {i} | `{name}` | {oracle} | {first_line(fn.__doc__)} |")
    out = HEADER + "\n".join(rows) + "\n"
    with open(os.path.join(REPO, "QUERIES.md"), "w") as f:
        f.write(out)
    print(f"wrote QUERIES.md with {len(rows)} queries")


if __name__ == "__main__":
    main()
