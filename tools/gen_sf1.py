"""Generate a local sf1-equivalent (10x the sf0.1 parquet) for scaling
measurement — the scale point where the fixed stage overheads that
dominate sf0.1 stop masking a super-linear plan (round-6 verdict #3).

Deterministic key-remapped union: copy i (0..9) shifts every table's
primary/foreign keys by i * stride (stride = max key + 1 at sf0.1), so
referential integrity holds copy-locally and entity counts — customers,
devices, orders, documents — grow 10x with per-entity activity held
constant, which is how real fact data grows. Dimension tables region and
nation stay 1x (the one TPC-H departure: country domains don't scale).

Document text is rotated through a copy-specific Caesar substitution
(translate over [a-zA-Z]) so the 10 copies are genuinely DISTINCT
documents: every shingle changes, so near-dup density stays at the sf0.1
rate instead of manufacturing a 90% duplicate corpus that would inflate
any banded-join measurement for data reasons, not plan reasons.
Embedding vectors are copied unchanged (vec_id remapped); none of the
scaling-curve queries read them.

Output: $SPARK_GRAFT_SF1_DIR (default /root/repo/.sf1), DuckDB-written
parquet, events.ts as TIMESTAMP like the driver's files (sources/
tables.py::_normalize_event_ts handles either timestamp physical type).

Usage: python tools/gen_sf1.py [--force]
"""

from __future__ import annotations

import os
import string
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.sf1")
COPIES = 10

# (table, [key columns to shift], key column the stride derives from)
FACTS = [
    ("customer", ["c_custkey"], "c_custkey"),
    ("supplier", ["s_suppkey"], "s_suppkey"),
    ("part", ["p_partkey"], "p_partkey"),
    ("orders", ["o_orderkey", "o_custkey"], "o_orderkey"),
    ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"], "l_orderkey"),
    ("events", ["event_id", "user_id"], "event_id"),
    ("documents", ["doc_id"], "doc_id"),
    ("embeddings", ["vec_id"], "vec_id"),
]
DIMS_1X = ["region", "nation"]


def _rot(s: str, i: int) -> str:
    return s[i % 26 :] + s[: i % 26]


def main() -> int:
    force = "--force" in sys.argv
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    # strides: one per keyed entity, shared by every referencing table
    stride: dict[str, int] = {}
    for t, _keys, k in FACTS:
        stride[k] = (
            con.execute(
                f"SELECT max({k}) + 1 FROM '{SRC}/{t}.parquet'"
            ).fetchone()[0]
        )
    stride["user_id"] = (
        con.execute(
            f"SELECT max(user_id) + 1 FROM '{SRC}/events.parquet'"
        ).fetchone()[0]
    )
    # FK strides alias their PK table's stride
    stride["o_custkey"] = stride["c_custkey"]
    stride["l_orderkey"] = stride["o_orderkey"]
    stride["l_partkey"] = stride["p_partkey"]
    stride["l_suppkey"] = stride["s_suppkey"]

    for t in DIMS_1X:
        dst = f"{OUT}/{t}.parquet"
        if force or not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{dst}'"
                " (FORMAT parquet)"
            )

    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    for t, keys, _k in FACTS:
        dst = f"{OUT}/{t}.parquet"
        if not force and os.path.exists(dst):
            continue
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        pieces = []
        for i in range(COPIES):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {i * stride[c]} AS {c}")
                elif t == "documents" and c == "text":
                    sel.append(
                        f"translate(text, '{lower + upper}',"
                        f" '{_rot(lower, i) + _rot(upper, i)}') AS text"
                    )
                else:
                    sel.append(c)
            pieces.append(
                f"SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet'"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(pieces)}) TO '{dst}' (FORMAT parquet)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"sf1-equivalent ready at {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
