"""Scaling-curve measurement: run representative queries at every
available scale factor and report wall time plus the fitted power-law
exponent (t ~ sf^alpha between consecutive scale factors, 100x data
range end to end).

What good looks like: alpha <= ~1 means the operator scales at worst
linearly in data size on this box (sub-linear values are common at
small SFs where fixed stage overheads dominate); a super-linear alpha
flags a join/agg whose work grows faster than its input — the thing to
catch BEFORE a 1000x cluster run.

Usage: python tools/scaling.py [query ...]   (defaults below)
Output: one markdown table + one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# the locally generated 10x point (tools/gen_sf1.py) — included when present;
# this is the scale where fixed stage overheads stop dominating and a
# super-linear plan becomes visible in the last alpha column
_SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.sf1")
if os.path.exists(os.path.join(_SF1, "lineitem.parquet")):
    SFS = SFS + [_SF1]

# one representative per cost family: scan+agg, shuffle join, banded
# near-dup, iterative graph, window rank, streaming replay
DEFAULT = [
    "device_profiles_flat",
    "top_revenue_orders",
    "dedup_minhash",
    "copurchase_pagerank",
    "rolling_user_features",
    "stream_window_counts",
]


def main() -> None:
    from adtech_log_data_pipeline_spark.functions._cache import release_cached
    from adtech_log_data_pipeline_spark.plans.queries import QUERIES
    from adtech_log_data_pipeline_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("scaling")
    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, "id long").count()

    def parity7_chain(spark, sf_dir):
        """The reference's two pipelines END TO END as one composed job:
        all 7 parity queries executed back-to-back (validate → profiles →
        app profiles → suspicious → features → predictions) — the shape
        whose super-linearity would matter most and which single-query
        curves can't see (shared scans, cache pressure across stages)."""
        from pyspark.sql import functions as F

        for q in (
            "bidlog_validation", "device_profiles_flat",
            "device_profile_summary", "app_profiles_flat", "suspicious_ids",
            "feature_inputs", "predictions",
        ):
            QUERIES[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return spark.range(0).select(F.lit(0).alias("done"))

    rows = []
    for name in names:
        fn = parity7_chain if name == "parity7_chain" else QUERIES[name]
        times = []
        for sf_dir in SFS:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
                release_cached()
                spark.catalog.clearCache()
            times.append(best)
        alphas = [
            math.log(times[i + 1] / times[i]) / math.log(10)
            for i in range(len(times) - 1)
        ]
        rows.append((name, times, alphas))

    labels = [os.path.basename(d.rstrip("/")).lstrip(".") for d in SFS]
    head = (
        [f"{l} s" for l in labels]
        + [f"a({labels[i]}->{labels[i + 1]})" for i in range(len(labels) - 1)]
    )
    print("| query | " + " | ".join(head) + " |")
    print("| --- |" + " --- |" * len(head))
    for name, t, a in rows:
        cells = [f"{x:.2f}" for x in t] + [f"{x:+.2f}" for x in a]
        print(f"| {name} | " + " | ".join(cells) + " |")
    print(
        json.dumps(
            {
                "metric": "scaling_curve",
                "queries": {
                    name: {"times_sec": [round(x, 3) for x in t],
                           "alpha": [round(x, 3) for x in a]}
                    for name, t, a in rows
                },
            }
        )
    )


if __name__ == "__main__":
    main()
