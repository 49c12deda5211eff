"""Assemble LOCALGATE_r{N}.json from tools/compare.py run logs.

Each section maps query -> {rows, sec} scraped from the "PASS name: N
rows [X.Xs]" lines; a FAIL anywhere aborts (the artifact only records
green boards). Usage:

    python tools/mk_localgate.py LOCALGATE_r08.json \
        engine_session_sf0.1=/tmp/gate_sf01_engine.log \
        vanilla_session_sf0.1=/tmp/gate_sf01_vanilla.log \
        --note "..."
"""

from __future__ import annotations

import argparse
import json
import re


def parse_log(path: str) -> dict[str, dict[str, float]]:
    out: dict[str, dict[str, float]] = {}
    text = open(path, encoding="utf-8", errors="replace").read()
    fails = re.findall(r"FAIL ([a-z0-9_]+)", text)
    if fails:
        raise SystemExit(f"{path}: FAIL rows present: {fails}")
    for m in re.finditer(
        r"PASS ([a-z0-9_]+): (\d+) rows \[([0-9.]+)s\]", text
    ):
        out[m.group(1)] = {"rows": int(m.group(2)), "sec": float(m.group(3))}
    if not out:
        raise SystemExit(f"{path}: no PASS lines found")
    return dict(sorted(out.items()))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("target")
    ap.add_argument("sections", nargs="+", metavar="name=logpath")
    ap.add_argument("--note", default="")
    args = ap.parse_args()
    target = args.target
    sections: dict[str, object] = {}
    for arg in args.sections:
        name, path = arg.split("=", 1)
        sections[name] = parse_log(path)
    doc: dict[str, object] = {"note": args.note}
    doc.update(sections)
    with open(target, "w", encoding="utf-8") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    counts = {k: len(v) for k, v in sections.items()}
    print(f"wrote {target}: {counts}")


if __name__ == "__main__":
    main()
