"""Mergeable cardinality sketches — the approximate-distinct layer a
100 TB pipeline uses where exact countDistinct state would grow with
cardinality (reference parity: the reference's exact per-key distinct
counts, AppProfiles.java:48-133, stay exact; THIS module is the
documented scale path for global/rollup cardinalities).

KMV (k-minimum-values, Bar-Yossef et al. 2002, public) instead of
HyperLogLog: Spark's approx_count_distinct and DuckDB's approx HLLs are
different implementations and can never hash-match across engines,
while KMV over an explicit md5-derived 48-bit hash is bit-reproducible
everywhere — the estimator is (k-1)/h_k with h_k the k-th smallest
normalized hash, all single IEEE ops on integer-exact inputs.

Scale shape: one DISTINCT-hash aggregation (map-side combining; state
per group is bounded by the distinct count ONLY until the per-group
top-k filter — at 100 TB swap the exact distinct for a per-partition
bounded min-k partial via the same hash, which the banded window below
already models at k rows/group) followed by a k-row window. The sketch
rows (group, kth_hash) are MERGEABLE: union two sketches' kept-hash
relations, re-take the k smallest, same estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KMV_K = 64
HASH_HEX_CHARS = 12  # 48 bits: exact in a double, fits bigint in DuckDB
HASH_SPACE = float(1 << 48)


def kmv_hash(col: str, salt: str = "kmv") -> F.Column:
    """48-bit integer hash of a column value: first 12 hex chars of
    md5('{salt}:' || value). Identical in DuckDB as
    ('0x' || substr(md5(...), 1, 12))::BIGINT."""
    return F.expr(
        f"cast(conv(substr(md5(concat('{salt}:', cast({col} as string))),"
        f" 1, {HASH_HEX_CHARS}), 16, 10) as bigint)"
    )


def kmv_distinct(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    k: int = KMV_K,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group KMV distinct-count sketch:
    (group_cols..., n_kept, kth_hash, est_distinct).

    n_kept is min(k, distinct hashes); when the group holds fewer than k
    distinct values the estimate IS the exact count (the sketch kept
    every hash). Determinism: the hash is integer-exact; the estimator
    divides (k-1) by kth_hash/2^48 — the normalization is an exact
    power-of-two scale and the final divide is one IEEE op, so Spark and
    DuckDB agree bit-for-bit (rounded to 1e-6 by convention)."""
    # NULLs are excluded (the usual distinct-count convention — and the
    # engines disagree on NULL sort position, so a NULL hash would break
    # cross-engine row_number determinism)
    d = (
        df.filter(F.col(col).isNotNull())
        .select(*group_cols, kmv_hash(col, salt).alias("h"))
        .distinct()
    )
    return kmv_report(kmv_keep(d, group_cols, k), group_cols, k)


def kmv_keep(hashes: DataFrame, group_cols: list[str], k: int = KMV_K) -> DataFrame:
    """The sketch STATE: the k smallest distinct hashes per group from a
    (group_cols..., h) relation. Idempotent and mergeable — kmv_keep over
    a union of kept states equals kmv_keep over the union of the raw
    hash relations (each state contains its side's k smallest)."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_report(kept: DataFrame, group_cols: list[str], k: int = KMV_K) -> DataFrame:
    """Estimator over a kept-hash state: (group..., n_kept, kth_hash,
    est_distinct)."""
    return kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.max("h").alias("kth_hash"),
    ).select(
        *group_cols,
        "n_kept",
        "kth_hash",
        F.round(
            F.when(
                F.col("n_kept") < k, F.col("n_kept").cast("double")
            ).otherwise(
                F.lit(float(k - 1)) / (F.col("kth_hash") / F.lit(HASH_SPACE))
            ),
            6,
        ).alias("est_distinct"),
    )


def kmv_overlap(
    df: DataFrame,
    col: str,
    group_col: str,
    k: int = KMV_K,
    salt: str = "kmv",
) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS from KMV states alone: for every
    pair of groups, estimate the distinct-value union, Jaccard similarity
    and intersection WITHOUT touching the raw data again — the merged
    sketch is the k smallest hashes of the union of the two kept states,
    theta is its k-th value, and the fraction of merged-sketch members
    present in BOTH sides estimates Jaccard (Beyer et al. 2007's KMV
    set-operation estimator; the same algebra theta sketches
    productize). This is the sketch answer to "how many users do these
    two segments share?" at 100 TB — each side keeps k rows of state,
    the pair join touches only sketches.

    Determinism: hashes are integer-exact and shared with kmv_distinct
    (same salt => states are reusable across both operators);
    jaccard_ppm is an integer cross-multiplication; the two estimate
    columns are single IEEE divides rounded to 1e-6 (the kmv_report
    convention), so the DuckDB oracle matches bit-for-bit.

    Scale shape: the kept state is k rows per group (bounded); the pair
    relation is groups^2 * 2k rows of SKETCH data, independent of the
    fact table; one window per pair orders the merged hashes. Exact
    below k: when the union keeps < k hashes, the estimates ARE the
    exact counts. Output: (g_1, g_2, n_union_kept, n_common,
    jaccard_ppm, est_union, est_intersection)."""
    kept = kmv_keep(
        df.filter(F.col(col).isNotNull())
        .select(F.col(group_col).alias("g"), kmv_hash(col, salt).alias("h"))
        .distinct(),
        ["g"],
        k,
    )
    # build (g_1, g_2, h, in_1, in_2) for all ordered pairs g_1 < g_2:
    # union the two sides tagged, then group per (pair, hash)
    groups = kept.select("g").distinct()
    gp = (
        groups.alias("x")
        .join(groups.alias("y"), F.col("x.g") < F.col("y.g"))
        .select(F.col("x.g").alias("g_1"), F.col("y.g").alias("g_2"))
    )
    tagged = (
        gp.join(kept.select(F.col("g").alias("g_1"), "h"), "g_1")
        .select("g_1", "g_2", "h", F.lit(1).alias("in_1"), F.lit(0).alias("in_2"))
        .unionByName(
            gp.join(kept.select(F.col("g").alias("g_2"), "h"), "g_2")
            .select("g_1", "g_2", "h", F.lit(0).alias("in_1"), F.lit(1).alias("in_2"))
        )
        .groupBy("g_1", "g_2", "h")
        .agg(F.max("in_1").alias("in_1"), F.max("in_2").alias("in_2"))
    )
    w = Window.partitionBy("g_1", "g_2").orderBy("h")
    merged = tagged.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    rep = merged.groupBy("g_1", "g_2").agg(
        F.count(F.lit(1)).cast("int").alias("n_union_kept"),
        F.max("h").alias("kth_hash"),
        F.sum(F.expr("in_1 * in_2")).cast("int").alias("n_common"),
    )
    est_union = F.when(
        F.col("n_union_kept") < k, F.col("n_union_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("kth_hash") / F.lit(HASH_SPACE)))
    return rep.select(
        "g_1",
        "g_2",
        "n_union_kept",
        "n_common",
        F.expr("cast(n_common * 1000000 div n_union_kept as bigint)").alias(
            "jaccard_ppm"
        ),
        F.round(est_union, 6).alias("est_union"),
        F.round(
            est_union * F.col("n_common") / F.col("n_union_kept"), 6
        ).alias("est_intersection"),
    )


# --- Count-Min sketch -------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 512


def cm_bucket(col: str, row: int, width: int = CM_WIDTH) -> F.Column:
    """Bucket of `col` in sketch row `row`: the 48-bit md5 hash (one salt
    per row) reduced mod width. Hash values are non-negative so `%` and
    `pmod` agree; identical in DuckDB as
    ('0x' || substr(md5('cm{row}:' || v), 1, 12))::BIGINT % width."""
    return (kmv_hash(col, salt=f"cm{row}") % width).cast("int")


def cm_sketch_state(
    df: DataFrame,
    col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Count-Min sketch STATE (Cormode & Muthukrishnan 2005) over the
    occurrences of `col`: a (row, bucket, cnt) relation of exactly
    depth x width counters, independent of both the input size and the
    key cardinality — the frequency counterpart of the KMV cardinality
    sketch above.

    Mergeable/streamable: counters are plain sums, so the union of two
    states re-aggregated per (row, bucket) IS the state of the
    concatenated inputs — the same additive-merge law the foreachBatch
    sinks rely on. Scale shape: one projection fans each input row into
    `depth` (row, bucket) pairs; partial hash aggregation collapses them
    map-side to at most depth*width groups per task, so the shuffle
    carries a fixed few thousand rows no matter how many input rows or
    distinct keys exist (the regime where exact per-key counts — the
    key_skew_report path — would need unbounded state). NULLs are
    excluded, matching the distinct-count convention of kmv_distinct."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), cm_bucket(col, r, width).alias("bucket")
            )
            for r in range(depth)
        ]
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cm_estimate(
    keys: DataFrame,
    state: DataFrame,
    col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every row of `keys`: est_count =
    min over rows of the key's counter — never an underestimate, and
    over-counts only from hash collisions (Markov bound: err <=
    2N/width with prob >= 1 - 2^-depth). The state (depth*width rows)
    is broadcast; the probe is a map-side join, no shuffle of `keys`."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), cm_bucket(col, r, width).alias("bucket")
            )
            for r in range(depth)
        ]
    )
    probed = (
        keys.select(F.col(col), F.explode(pairs).alias("p"))
        .join(
            F.broadcast(state),
            (F.col("p.row") == F.col("row")) & (F.col("p.bucket") == F.col("bucket")),
            "left",
        )
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
    return probed


# --- HyperLogLog ------------------------------------------------------------

HLL_P = 9
HLL_M = 1 << HLL_P  # 512 registers
_HLL_HASH_BITS = 48
_HLL_RHO_BITS = _HLL_HASH_BITS - HLL_P  # 39 usable bits above the index
# alpha_m * m^2 * 2^RHO_MAX as ONE Python-precomputed double literal, so
# both engines evaluate the estimator as (constant / exact-integer) — a
# single correctly-rounded IEEE division, never a float reduction.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_HLL_RHO_MAX = _HLL_RHO_BITS + 1  # rho for a zero remainder
HLL_EST_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RHO_MAX)


def hll_state(df: DataFrame, col: str, group_cols: list[str] | None = None) -> DataFrame:
    """HyperLogLog sketch STATE (Flajolet et al. 2007) per group: at most
    HLL_M rows (group..., idx, max_rho) — the register array as a
    relation, the cardinality counterpart of cm_sketch_state's frequency
    counters.

    Integer-exact and engine-portable end to end: the 48-bit md5 hash
    (kmv_hash convention) splits into a 9-bit register index (low bits)
    and a 39-bit remainder whose leading-zero rank rho is computed with
    the bin()-length idiom — rho = 40 - bit_length(remainder), with
    remainder 0 -> 40. No floats anywhere in the state.

    Merge law (the reason HLL beats exact countDistinct at scale): the
    register is a MAX — idempotent AND commutative — so re-aggregating
    the union of any two states per (group, idx) IS the state of the
    concatenated inputs, and a RETRIED micro-batch merges for free
    (contrast the CM stream's per-batch-partial machinery, which exists
    because sums are not idempotent). Scale shape: one projection, one
    hash agg with map-side combine to <= m groups per task; the shuffle
    carries at most m rows per group regardless of input size."""
    group_cols = group_cols or []
    h = kmv_hash(col, salt="hll")
    rho = F.when(F.col("__hll_rem") == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        F.lit(_HLL_RHO_MAX) - F.length(F.expr("bin(__hll_rem)"))
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            *group_cols,
            (h % F.lit(HLL_M)).cast("int").alias("idx"),
            F.shiftright(h, HLL_P).alias("__hll_rem"),  # exact integer h div m
        )
        .select(*group_cols, "idx", rho.cast("int").alias("rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_report(state: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Estimate per group from a register state: the raw HLL estimator
    E = alpha_m * m^2 / sum_j 2^(-M_j), restated exactly: the harmonic
    denominator is the INTEGER z_scaled = sum over set registers of
    2^(RHO_MAX - max_rho) plus 2^RHO_MAX per unset register (M_j = 0), so
    est_raw = HLL_EST_NUM / z_scaled is one float division on exact
    inputs — bit-reproducible across engines and partitionings.

    Output: (group..., n_set, n_zero, z_scaled, est_raw, est). est is
    floor(est_raw) as bigint. The small-range linear-counting correction
    (m * ln(m / V)) is deliberately NOT applied — ln() is not
    bit-portable; consumers below 2.5m can apply it to the reported
    n_zero themselves (documented contract, same stance as kmv_report's
    exact-below-k behavior)."""
    group_cols = group_cols or []
    agg = state.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_set"),
        F.sum(
            F.expr(
                f"shiftleft(cast(1 as bigint), {_HLL_RHO_MAX} - max_rho)"
            )
        ).alias("z_set"),
    )
    z = (
        F.col("z_set")
        + (F.lit(HLL_M) - F.col("n_set")).cast("bigint") * F.lit(1 << _HLL_RHO_MAX)
    ).alias("z_scaled")
    return agg.select(
        *group_cols,
        "n_set",
        (F.lit(HLL_M) - F.col("n_set")).cast("int").alias("n_zero"),
        z,
        (F.lit(HLL_EST_NUM) / F.col("z_scaled")).alias("est_raw"),
    ).withColumn("est", F.floor("est_raw").cast("bigint"))


def hll_distinct(
    df: DataFrame, col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """hll_state |> hll_report — per-group approximate distinct count."""
    return hll_report(hll_state(df, col, group_cols), group_cols)


# --- Quantile sketch (deterministic log-bucket histogram) -------------------

QS_SUB = 32  # sub-buckets per octave -> guaranteed relative error <= 1/32
QS_QUANTILES_PPM = (500_000, 900_000, 990_000)  # q50, q90, q99


def quantile_sketch_state(
    df: DataFrame, col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Mergeable quantile sketch STATE over a POSITIVE bigint column: a
    (group..., bucket, cnt) histogram on log-spaced buckets — octave e =
    bit_length(x) - 1 (the bin()-length idiom) split into QS_SUB linear
    sub-buckets, bucket = e * QS_SUB + (x - 2^e) * QS_SUB div 2^e. All
    integer arithmetic, so the state is bit-identical across engines and
    partitionings — the DETERMINISTIC alternative to t-digest/KLL (whose
    centroids/compactions are input-order- or randomness-dependent) with
    an a-priori bound instead of a probabilistic one: every value in a
    bucket is within a 33/32 ratio of its lower bound.

    Merge law: counts are sums (same additive law as the CM sketch), and
    the bucket count is bounded by 64 * QS_SUB ~ 2k rows per group
    regardless of input size — shuffle carries a fixed-size state.
    NULLs and non-positive values are excluded (stated contract)."""
    group_cols = group_cols or []
    x = F.col(col)
    e = (F.length(F.expr(f"bin({col})")) - 1).cast("bigint")
    sub = F.expr(
        f"(({col} - shiftleft(cast(1 as bigint), length(bin({col})) - 1))"
        f" * {QS_SUB}) div shiftleft(cast(1 as bigint), length(bin({col})) - 1)"
    )
    return (
        df.filter(x.isNotNull() & (x > 0))
        .select(*group_cols, (e * QS_SUB + sub).cast("int").alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def quantile_sketch_estimates(
    state: DataFrame,
    group_cols: list[str] | None = None,
    quantiles_ppm: tuple[int, ...] = QS_QUANTILES_PPM,
) -> DataFrame:
    """Quantile estimates from a histogram state: for each q (ppm), rank
    = ceil(q * n) as integers, the answering bucket is the first whose
    cumulative count reaches the rank, and the estimate is the bucket's
    exact lower bound lb = 2^e * (QS_SUB + sub) div QS_SUB. The rank-th
    smallest true value v obeys lb <= v < lb * (QS_SUB + 1)/QS_SUB — a
    GUARANTEED (not probabilistic) relative bound, which
    quantile_sketch_audit pins against the exact order statistic.

    Scale shape: one bounded-width window per group over <= ~2k bucket
    rows (the heavy reduction already happened in the state agg); the
    per-group total rides the same window — no second shuffle.
    Output: (group..., q_ppm, rank, n, est)."""
    from pyspark.sql.window import Window

    group_cols = group_cols or []
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*group_cols)
    cum = (
        state.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(wn))
    )
    qs = F.explode(
        F.array(*[F.lit(q).cast("bigint") for q in quantiles_ppm])
    ).alias("q_ppm")
    probes = cum.select(*group_cols, "bucket", "cnt", "cum", "n", qs).withColumn(
        "rank", F.expr("(n * q_ppm + 999999) div 1000000")
    )
    hits = probes.filter(
        (F.col("cum") >= F.col("rank")) & (F.col("cum") - F.col("cnt") < F.col("rank"))
    )
    lb = F.expr(
        f"shiftleft(cast(1 as bigint), bucket div {QS_SUB})"
        f" * ({QS_SUB} + bucket % {QS_SUB}) div {QS_SUB}"
    )
    return hits.select(
        *group_cols, "q_ppm", "rank", "n", lb.alias("est")
    )


def quantile_sketch(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    quantiles_ppm: tuple[int, ...] = QS_QUANTILES_PPM,
) -> DataFrame:
    """state |> estimates — per-group quantile estimates."""
    return quantile_sketch_estimates(
        quantile_sketch_state(df, col, group_cols), group_cols, quantiles_ppm
    )
