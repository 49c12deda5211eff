"""KMV sketch laws, expectations-rule semantics, SCD2 interval laws."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_kmv_exact_below_k(spark):
    """Fewer than k distinct values: the sketch kept every hash, so the
    estimate IS the exact distinct count."""
    from adtech_log_data_pipeline_spark.functions.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", i % 3) for i in range(30)],
        "g string, v long",
    )
    out = {r["g"]: r for r in kmv_distinct(df, "v", ["g"], k=64).collect()}
    assert out["a"]["n_kept"] == 7 and out["a"]["est_distinct"] == 7.0
    assert out["b"]["n_kept"] == 3 and out["b"]["est_distinct"] == 3.0


def test_kmv_estimator_accuracy_and_duplicate_invariance(spark):
    """Above k the (k-1)/h_k estimator must land within ~3 standard
    errors (1/sqrt(k)) of truth, and duplicates must not move it."""
    from adtech_log_data_pipeline_spark.functions.sketch import kmv_distinct

    n = 5000
    df = spark.createDataFrame([("g", i) for i in range(n)], "g string, v long")
    est = kmv_distinct(df, "v", ["g"], k=256).collect()[0]["est_distinct"]
    assert abs(est - n) / n < 3 / (256 ** 0.5)

    dup = spark.createDataFrame(
        [("g", i % n) for i in range(3 * n)], "g string, v long"
    )
    est_dup = kmv_distinct(dup, "v", ["g"], k=256).collect()[0]["est_distinct"]
    assert est_dup == est


def test_kmv_merge_law(spark):
    """Mergeability: the sketch of a union equals re-sketching the union
    of the two halves' kept hashes (k smallest of combined k-smallest
    sets == k smallest of the union, since each half's kept set contains
    its k smallest)."""
    from adtech_log_data_pipeline_spark.functions.sketch import (
        KMV_K,
        kmv_distinct,
    )

    a = spark.createDataFrame([("g", i) for i in range(500)], "g string, v long")
    b = spark.createDataFrame(
        [("g", i) for i in range(300, 900)], "g string, v long"
    )
    merged = kmv_distinct(a.unionByName(b), "v", ["g"], k=KMV_K).collect()[0]
    direct = kmv_distinct(
        spark.createDataFrame([("g", i) for i in range(900)], "g string, v long"),
        "v",
        ["g"],
        k=KMV_K,
    ).collect()[0]
    assert merged["kth_hash"] == direct["kth_hash"]
    assert merged["est_distinct"] == direct["est_distinct"]


def test_kmv_ignores_nulls(spark):
    from adtech_log_data_pipeline_spark.functions.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("g", 1), ("g", None), ("g", 2), ("g", None)], "g string, v long"
    )
    row = kmv_distinct(df, "v", ["g"]).collect()[0]
    assert row["n_kept"] == 2 and row["est_distinct"] == 2.0


def test_expectations_rule_semantics(spark):
    """Each rule kind: nulls count against not_null only; conformance
    rules are fractions over NON-null rows; unique is distinct/count."""
    from adtech_log_data_pipeline_spark.functions.expectations import (
        Expectation,
        run_expectations,
    )

    df = spark.createDataFrame(
        [
            (1, "en", 10.0, "ok"),
            (2, "xx", 20.0, None),
            (2, None, -5.0, "ok"),
            (4, "en", 30.0, "bad!"),
        ],
        "id long, lang string, v double, s string",
    )
    rules = [
        Expectation("id_nn", "id", "not_null"),
        Expectation("id_uq", "id", "unique", threshold=0.8),
        Expectation("lang_set", "lang", "in_set", values=("en", "de")),
        Expectation("v_min", "v", "min_value", bound=0.0, threshold=0.7),
        Expectation("s_re", "s", "matches", pattern=r"^[a-z]+$"),
    ]
    out = {r["rule"]: r for r in run_expectations(df, rules).collect()}
    assert out["id_nn"]["metric_r6"] == 1.0 and out["id_nn"]["passed"]
    assert out["id_uq"]["metric_r6"] == 0.75 and not out["id_uq"]["passed"]
    # lang: 3 non-null, 2 in set
    assert out["lang_set"]["metric_r6"] == round(2 / 3, 6)
    assert out["v_min"]["metric_r6"] == 0.75 and out["v_min"]["passed"]
    # s: 3 non-null, 2 match
    assert out["s_re"]["metric_r6"] == round(2 / 3, 6)
    assert not out["s_re"]["passed"]


def test_expectations_empty_frame_vacuous_pass(spark):
    from adtech_log_data_pipeline_spark.functions.expectations import (
        Expectation,
        run_expectations,
    )

    df = spark.createDataFrame([], "id long")
    out = run_expectations(
        df, [Expectation("id_nn", "id", "not_null")]
    ).collect()
    assert out[0]["metric_r6"] == 1.0 and out[0]["passed"]


def test_scd2_intervals_laws(spark):
    """Intervals tile each user's history: n_events conserve, versions
    are 1..V dense, valid_to == next version's valid_from (NULL only on
    the last), and adjacent intervals change event_type."""
    from adtech_log_data_pipeline_spark.plans.queries import QUERIES

    out = QUERIES["scd2_intervals"](spark, SF).collect()
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    total = load_table(spark, SF, "events").count()
    assert sum(r["n_events"] for r in out) == total

    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to_ms"] == b["valid_from_ms"]
            assert a["event_type"] != b["event_type"]
        assert rows[-1]["valid_to_ms"] is None


def test_enforce_expectations_quarantine(spark):
    """Row-level enforcement: NULLs pass conformance rules (not_null
    indicts them), failed_rules preserves declaration order, clean rows
    are absent, unique is skipped."""
    from adtech_log_data_pipeline_spark.functions.expectations import (
        Expectation,
        enforce_expectations,
    )

    df = spark.createDataFrame(
        [
            (1, "en", 200.0),
            (2, "xx", 50.0),
            (3, None, None),
            (None, "en", 300.0),
        ],
        "id long, lang string, n double",
    )
    rules = [
        Expectation("id_nn", "id", "not_null"),
        Expectation("id_uq", "id", "unique"),  # table-level: skipped
        Expectation("lang_set", "lang", "in_set", values=("en", "de")),
        Expectation("n_min", "n", "min_value", bound=100.0),
    ]
    out = {r["id"]: r for r in enforce_expectations(df, rules, ["id"]).collect()}
    assert 1 not in out  # clean
    assert out[2]["failed_rules"] == "lang_set,n_min" and out[2]["n_failed"] == 2
    assert 3 not in out  # NULL lang/n pass conformance rules
    assert out[None]["failed_rules"] == "id_nn"


def test_kmv_partitioning_invariance_fuzz(spark):
    """Monoid law under physical partitioning: the sketch over any
    repartitioning/duplication of the input is identical (hypothesis over
    random multisets, folded through 1-partition and 16-partition runs)."""
    import hypothesis.strategies as st
    from hypothesis import HealthCheck, given, settings

    from adtech_log_data_pipeline_spark.functions.sketch import kmv_distinct

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        vals=st.lists(st.integers(0, 200), min_size=1, max_size=60),
        k=st.sampled_from([4, 16]),
    )
    def law(vals, k):
        rows = [("g", v) for v in vals]
        one = spark.createDataFrame(rows, "g string, v long").coalesce(1)
        many = spark.createDataFrame(rows * 2, "g string, v long").repartition(16)
        a = kmv_distinct(one, "v", ["g"], k=k).collect()[0]
        b = kmv_distinct(many, "v", ["g"], k=k).collect()[0]
        assert (a["n_kept"], a["kth_hash"], a["est_distinct"]) == (
            b["n_kept"], b["kth_hash"], b["est_distinct"],
        )
        if len(set(vals)) < k:
            assert a["est_distinct"] == float(len(set(vals)))

    law()


def test_expectations_match_python_truth_fuzz(spark):
    """Aggregate metrics vs a straight Python recomputation on random
    frames (nulls included), and quarantine consistency: a row fails
    not_null exactly when the column is null, and the aggregate
    not-null metric equals 1 - failing_fraction."""
    import hypothesis.strategies as st
    from hypothesis import HealthCheck, given, settings

    from adtech_log_data_pipeline_spark.functions.expectations import (
        Expectation,
        enforce_expectations,
        run_expectations,
    )

    cell = st.one_of(st.none(), st.integers(-5, 15))

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(vals=st.lists(st.tuples(st.integers(0, 9), cell), min_size=1, max_size=40))
    def law(vals):
        rows = [(i, v) for i, (i_, v) in zip(range(len(vals)), vals)]
        df = spark.createDataFrame(rows, "rid long, v long")
        rules = [
            Expectation("v_nn", "v", "not_null"),
            Expectation("v_min", "v", "min_value", bound=0.0, threshold=0.5),
        ]
        out = {r["rule"]: r for r in run_expectations(df, rules).collect()}
        n = len(rows)
        nn = sum(1 for _, v in rows if v is not None)
        ok_min = sum(1 for _, v in rows if v is not None and v >= 0)
        assert out["v_nn"]["metric_r6"] == round(nn / n, 6)
        assert out["v_min"]["metric_r6"] == (
            round(ok_min / nn, 6) if nn else 1.0
        )
        q = {r["rid"]: r for r in enforce_expectations(df, rules, ["rid"]).collect()}
        for rid, v in rows:
            fails = []
            if v is None:
                fails.append("v_nn")
            elif v < 0:
                fails.append("v_min")
            if fails:
                assert q[rid]["failed_rules"] == ",".join(fails)
            else:
                assert rid not in q

    law()


# --- Count-Min sketch laws --------------------------------------------------


def test_cm_never_underestimates_and_exact_without_collisions(spark):
    """est >= true for every key (the CM guarantee); with input far
    smaller than the 4x512 counter grid, most keys should be exact."""
    from adtech_log_data_pipeline_spark.functions.sketch import (
        cm_estimate,
        cm_sketch_state,
    )

    rows = [(f"k{i % 37}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "v string")
    state = cm_sketch_state(df, "v")
    keys = df.distinct()
    est = {
        r["v"]: r["est_count"]
        for r in cm_estimate(keys, state, "v").collect()
    }
    true = {}
    for (v,) in rows:
        true[v] = true.get(v, 0) + 1
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)
    # 37 keys into 512 buckets x 4 independent rows: a collision in every
    # row for the same key is overwhelmingly unlikely
    exact = sum(1 for k in true if est[k] == true[k])
    assert exact >= 30


def test_cm_state_is_bounded_and_additive(spark):
    """State never exceeds depth*width rows, and merging two halves'
    states by (row, bucket) sum equals the state of the whole input —
    the additive law streaming merge relies on."""
    from adtech_log_data_pipeline_spark.functions.sketch import (
        CM_DEPTH,
        CM_WIDTH,
        cm_sketch_state,
    )

    a = spark.createDataFrame([(i % 11,) for i in range(300)], "v long")
    b = spark.createDataFrame([(i % 17,) for i in range(200)], "v long")
    sa, sb = cm_sketch_state(a, "v"), cm_sketch_state(b, "v")
    assert sa.count() <= CM_DEPTH * CM_WIDTH
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in sa.unionByName(sb)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    whole = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cm_sketch_state(a.unionByName(b), "v").collect()
    }
    assert merged == whole


def test_cm_ignores_nulls(spark):
    from adtech_log_data_pipeline_spark.functions.sketch import cm_sketch_state

    df = spark.createDataFrame([("x",), (None,), ("x",), (None,)], "v string")
    total = cm_sketch_state(df, "v").groupBy("row").agg(
        F.sum("cnt").alias("n")
    )
    assert all(r["n"] == 2 for r in total.collect())


def test_hll_register_max_merge_law(spark):
    """The HLL register is a MAX — idempotent and commutative — so (a) the
    state over a union equals the per-(idx) max-merge of the slice
    states, and (b) re-merging a slice (a retried micro-batch) changes
    nothing. This is the law that lets the streaming sink skip the CM
    stream's per-batch-partial machinery."""
    from adtech_log_data_pipeline_spark.functions.sketch import hll_state

    a = spark.range(0, 3000).selectExpr("cast(id as string) as v")
    b = spark.range(2000, 6000).selectExpr("cast(id as string) as v")

    whole = {
        (r["idx"], r["max_rho"])
        for r in hll_state(a.unionByName(b), "v").collect()
    }
    sa, sb = hll_state(a, "v"), hll_state(b, "v")
    merged_df = (
        sa.unionByName(sb)
        .unionByName(sb)  # retry of slice b: idempotent
        .groupBy("idx")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    assert {(r["idx"], r["max_rho"]) for r in merged_df.collect()} == whole


def test_hll_estimator_accuracy_and_duplicate_invariance(spark):
    """Raw estimate within 3 standard errors (3 * 1.04/sqrt(512) = 13.8%)
    of the true cardinality at several scales, and duplicates never move
    a register (distinct-ness is intrinsic to the max)."""
    from adtech_log_data_pipeline_spark.functions.sketch import (
        HLL_M,
        hll_distinct,
    )

    for n in (2_000, 5_000, 20_000):  # >= ~2.5m: raw-estimator regime
        df = spark.range(n).selectExpr("cast(id as string) as v")
        (row,) = hll_distinct(df, "v").collect()
        assert abs(row["est_raw"] - n) / n < 0.138, (n, row["est_raw"])
        assert row["n_set"] + row["n_zero"] == HLL_M
        dup = df.unionByName(df).unionByName(df)
        (row2,) = hll_distinct(dup, "v").collect()
        assert row2["z_scaled"] == row["z_scaled"]

    # below 2.5m the raw estimate biases high by design; the DOCUMENTED
    # consumer correction — linear counting m*ln(m/n_zero) from the
    # reported n_zero — recovers the cardinality
    import math

    (small,) = hll_distinct(
        spark.range(800).selectExpr("cast(id as string) as v"), "v"
    ).collect()
    assert small["n_zero"] > 0
    linear = HLL_M * math.log(HLL_M / small["n_zero"])
    assert abs(linear - 800) / 800 < 0.10, linear


def test_hll_ignores_nulls_and_partitioning(spark):
    from adtech_log_data_pipeline_spark.functions.sketch import hll_distinct

    rows = [(str(i),) for i in range(1000)] + [(None,)] * 50
    df = spark.createDataFrame(rows, "v string")
    (r1,) = hll_distinct(df, "v").collect()
    (r4,) = hll_distinct(df.repartition(13), "v").collect()
    assert (r1["z_scaled"], r1["est"]) == (r4["z_scaled"], r4["est"])


def test_quantile_sketch_guarantee_and_merge_law(spark):
    """(a) The additive merge law: the state over a union equals the
    per-bucket sum of slice states. (b) The GUARANTEED bracket: for every
    group and quantile, est <= exact rank-th value < est * 33/32 — on an
    adversarial mix of tiny, huge, near-power-of-two and duplicated
    values. (c) rank = ceil(q*n) pins the edge: q=1.0 would pick the max;
    q50 of 2 rows picks the 1st."""
    from pyspark.sql.window import Window as W

    from adtech_log_data_pipeline_spark.functions.sketch import (
        quantile_sketch,
        quantile_sketch_estimates,
        quantile_sketch_state,
    )

    import random

    rng = random.Random(7)
    vals = (
        [rng.randrange(1, 10) for _ in range(50)]
        + [2 ** rng.randrange(1, 40) + rng.randrange(-1, 2) for _ in range(100)]
        + [rng.randrange(10**6, 10**12) for _ in range(200)]
        + [777] * 60
    )
    rows = [("g%d" % (i % 3), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, v long")

    # (a) merge law
    a, b = df.filter("v % 2 = 0"), df.filter("v % 2 = 1")
    whole = {
        (r["g"], r["bucket"], r["cnt"])
        for r in quantile_sketch_state(df, "v", ["g"]).collect()
    }
    merged = (
        quantile_sketch_state(a, "v", ["g"])
        .unionByName(quantile_sketch_state(b, "v", ["g"]))
        .groupBy("g", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert {(r["g"], r["bucket"], r["cnt"]) for r in merged.collect()} == whole

    # (b) bracket guarantee vs the exact order statistic
    est = quantile_sketch(df, "v", ["g"]).collect()
    ordered = df.withColumn(
        "rn", F.row_number().over(W.partitionBy("g").orderBy("v"))
    ).collect()
    byrank = {(r["g"], r["rn"]): r["v"] for r in ordered}
    assert len(est) == 9
    for r in est:
        exact = byrank[(r["g"], r["rank"])]
        assert r["est"] <= exact < r["est"] * 33 / 32, (r, exact)

    # (c) rank edges
    two = spark.createDataFrame([("g", 10), ("g", 1000)], "g string, v long")
    got = {
        r["q_ppm"]: r["rank"]
        for r in quantile_sketch_estimates(
            quantile_sketch_state(two, "v", ["g"]), ["g"], (500_000, 1_000_000)
        ).collect()
    }
    assert got == {500_000: 1, 1_000_000: 2}
