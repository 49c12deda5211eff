"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and the
matching ``oracle_sql()`` on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified). Queries with no
oracle get a rows-only check. Usage:

    python tools/compare.py [--vanilla] [sf_dir] [query ...]

``--vanilla`` builds a PLAIN SparkSession (no engine configs at all) —
the driver's documented environment. Round 4's only red row
(stream_attribution_outer) passed locally under ``get_spark()`` (Arrow
on) but crashed on the driver's vanilla session; this mode reproduces
config-dependent failures before submission.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    # Mirror the driver's canonicalizer: sort the RAW values before
    # stringifying.  An array/list-typed column is unsortable there
    # (pandas raises "unhashable type: 'list'") and must fail here too —
    # round 3's image_embed ERR only reached the scoreboard because the
    # old local order (stringify, then sort) masked the shape bug.
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(
        by=list(df.columns), kind="mergesort"
    ).reset_index(drop=True)
    out = pd.DataFrame()
    for c in df.columns:
        out[c] = df[c].map(_cell)
    return out


def _cell(v):
    import numpy as np

    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "<null>"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, float):
        # exact — a 1-ulp engine difference must FAIL here (the driver's
        # hash may be exact; masking differences locally would be worse)
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    canon = _canon(df)
    h = hashlib.md5()
    for row in canon.itertuples(index=False):
        h.update(("\x1f".join(map(str, row)) + "\x1e").encode())
    return h.hexdigest()


def main() -> int:
    argv = sys.argv[1:]
    vanilla = "--vanilla" in argv
    if vanilla:
        argv = [a for a in argv if a != "--vanilla"]
    # repeatable --conf k=v: extra engine-session configs, for conf-matrix
    # sweeps (e.g. --conf spark.sql.codegen.wholeStage=false); ignored
    # with --vanilla (that session is deliberately config-free)
    extra_conf: dict[str, str] = {}
    while "--conf" in argv:
        i = argv.index("--conf")
        k, _, v = argv[i + 1].partition("=")
        extra_conf[k] = v
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry_mod

    if vanilla:
        # the driver's environment: a bare builder, zero engine configs —
        # no Arrow, no AQE overrides, no timezone pin, default memory
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[*]")
            .appName("oracle-compare-vanilla")
            .getOrCreate()
        )
    else:
        from adtech_log_data_pipeline_spark.session import get_spark

        spark = get_spark("oracle-compare", extra_conf=extra_conf)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    from adtech_log_data_pipeline_spark.functions._cache import release_cached

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            release_cached()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(sdf)} rows [{t_spark:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                problems.append("value-hash mismatch")
                a, b = _canon(sdf), _canon(odf)
                neq = (a != b).any(axis=1)
                print(a[neq].head(5))
                print(b[neq].head(5))
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{t_spark:.1f}s]")
            failures.append(name)
        else:
            print(f"PASS {name}: {len(sdf)} rows [{t_spark:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
