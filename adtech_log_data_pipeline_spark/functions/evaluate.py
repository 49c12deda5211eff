"""Model-evaluation operators: exact ROC-AUC and equi-depth calibration.

The training-data pipeline's closing loop — after features
(operators/features.py) and inference (operators/inference.py) comes
evaluation: does the score actually rank positives above negatives
(AUC), and does the score's magnitude mean what it claims
(calibration)? Both are exact-integer formulations so the DuckDB
oracle hash-compares bit-for-bit.

Scale discipline shared by both operators: neither uses a GLOBAL sort
window over the row relation. Ranks/prefix-counts come from the same
textbook two-phase bucket-partitioned prefix scan as
operators/sweep.py::interval_concurrency — phase 1 is a window
PARTITIONED by score bucket (parallel, spillable), phase 2 prefix-sums
the bounded one-row-per-bucket totals relation. Two keyed shuffles at
any scale; the oracle deliberately restates the naive single-window
form so the decomposition is checked against the textbook definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _neg_below(per_score: DataFrame, bucket_width: int) -> DataFrame:
    """Given one row per distinct score with (score, pos, neg) counts,
    add `neg_below` = total negatives with a strictly smaller score.

    Two-phase prefix scan keyed on score div bucket_width; the phase-2
    window runs over the bounded per-bucket totals only."""
    b = int(bucket_width)
    bucketed = per_score.withColumn("bucket", F.expr(f"score div {b}"))
    local = bucketed.withColumn(
        "local_cum_neg",
        F.sum("neg").over(
            Window.partitionBy("bucket")
            .orderBy("score")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    totals = local.groupBy("bucket").agg(F.sum("neg").alias("bucket_neg"))
    offsets = totals.withColumn(
        "entering_neg",
        F.coalesce(
            F.sum("bucket_neg").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("bucket", "entering_neg")
    return local.join(offsets, "bucket").withColumn(
        "neg_below",
        F.col("entering_neg") + F.col("local_cum_neg") - F.col("neg"),
    )


def auc_exact(
    scored: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    bucket_width: int = 100_000,
) -> DataFrame:
    """Exact tie-aware ROC-AUC of an integer score against a 0/1 label.

    Mann-Whitney formulation kept in integers: over all positive ×
    negative pairs, a correctly-ordered pair scores 2, a tie scores 1,
    an inversion 0 — so ``auc_2u = sum(pos_s * (2*neg_below_s +
    neg_at_s))`` over distinct scores s, and AUC = auc_2u / (2 P N).
    ``auc_micro`` is the floor-divided micro-unit quotient (both engines
    floor: operands are non-negative, so Spark's `div` truncation equals
    DuckDB's `//`).

    Output (one row): n_pos, n_neg, auc_2u, auc_micro — all bigint.
    With a degenerate label column (no positives or no negatives) there
    are no pairs and AUC is undefined: auc_micro = -1 sentinel, stated
    identically in the oracle.

    Scale shape: one hash agg to distinct scores (bounded by the score
    domain, not the row count), the two-phase prefix scan above, one
    final 1-row agg. Nothing collects; no global row sort.
    """
    per_score = (
        scored.select(
            F.col(score_col).cast("long").alias("score"),
            F.col(label_col).cast("long").alias("label"),
        )
        .groupBy("score")
        .agg(
            F.sum("label").alias("pos"),
            F.sum(F.lit(1) - F.col("label")).alias("neg"),
        )
    )
    with_below = _neg_below(per_score, bucket_width)
    return with_below.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(
            F.col("pos") * (F.lit(2) * F.col("neg_below") + F.col("neg"))
        )
        .cast("long")
        .alias("auc_2u"),
    ).select(
        "n_pos",
        "n_neg",
        "auc_2u",
        F.expr(
            "CASE WHEN n_pos = 0 OR n_neg = 0 THEN -1"
            " ELSE (1000000 * auc_2u) div (2 * n_pos * n_neg) END"
        )
        .cast("long")
        .alias("auc_micro"),
    )


def pr_curve_exact(
    scored: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    bucket_width: int = 100_000,
) -> DataFrame:
    """Exact precision/recall operating curve of an integer score against
    a 0/1 label: one row per DISTINCT score t, counting the confusion at
    the rule "predict positive iff score >= t".

    All integers, no floats: tp/fp/fn are exact bigints from cumulative
    at-or-above counts; precision/recall/F1 are floor-divided ppm
    (operands non-negative, so Spark `div` == DuckDB `//`). With no
    positive rows recall/F1 are undefined: -1 sentinel, stated
    identically in the oracle. F1 uses the ppm quotients (the standard
    report convention): f1 = 2·p·r/(p+r) over the ppm values, -1 when
    p+r = 0.

    Scale shape, identical to auc_exact: one hash agg to distinct scores
    (bounded by the score DOMAIN — for token-sum margins that is the
    weight-range x document-length envelope, not the corpus size), the
    same two-phase prefix scan (phase-2 window over per-bucket totals
    only, no global sort), one broadcast 1-row totals join. The curve
    relation itself is score-domain-sized, never corpus-sized.
    """
    per_score = (
        scored.select(
            F.col(score_col).cast("long").alias("s"),
            F.col(label_col).cast("long").alias("label"),
        )
        .groupBy("s")
        .agg(
            F.sum("label").alias("pos"),
            F.sum(F.lit(1) - F.col("label")).alias("neg"),
        )
    )
    # at-or-above prefix via the descending trick: scan strictly-below on
    # the NEGATED score (strictly below -s == strictly above s), both
    # classes in one pass
    b = int(bucket_width)
    neg_keyed = per_score.withColumn("k", -F.col("s")).withColumn(
        "bucket", F.expr(f"k div {b}")
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = neg_keyed.withColumn(
        "loc_pos", F.sum("pos").over(w_local)
    ).withColumn("loc_neg", F.sum("neg").over(w_local))
    totals = local.groupBy("bucket").agg(
        F.sum("pos").alias("b_pos"), F.sum("neg").alias("b_neg")
    )
    w_enter = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("b_pos").over(w_enter), F.lit(0)).alias("ent_pos"),
        F.coalesce(F.sum("b_neg").over(w_enter), F.lit(0)).alias("ent_neg"),
    )
    cum = (
        local.join(offsets, "bucket")
        .withColumn("tp", F.col("ent_pos") + F.col("loc_pos"))
        .withColumn("fp", F.col("ent_neg") + F.col("loc_neg"))
    )
    grand = per_score.agg(
        F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("p_total")
    )
    return (
        cum.crossJoin(F.broadcast(grand))
        .select(
            F.col("s").alias("threshold"),
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            (F.col("p_total") - F.col("tp")).cast("long").alias("fn"),
            F.expr("(1000000 * tp) div (tp + fp)")
            .cast("long")
            .alias("precision_ppm"),
            F.expr(
                "CASE WHEN p_total = 0 THEN -1"
                " ELSE (1000000 * tp) div p_total END"
            )
            .cast("long")
            .alias("recall_ppm"),
        )
        .withColumn(
            "f1_ppm",
            F.expr(
                "CASE WHEN recall_ppm = -1 THEN -1"
                " WHEN precision_ppm + recall_ppm = 0 THEN -1"
                " ELSE (2 * precision_ppm * recall_ppm)"
                " div (precision_ppm + recall_ppm) END"
            ).cast("long"),
        )
    )


def distributed_ntile(
    df: DataFrame,
    *,
    value_col: str,
    id_col: str,
    n_bins: int,
    bucket_width: int = 100_000,
    bin_col: str = "bin",
) -> DataFrame:
    """NTILE(n_bins) over the total order (value, id) WITHOUT a global
    sort window — the building block of every equi-depth report here
    (calibration deciles, RFM quintiles).

    The rank of each row is computed distributed: the two-phase prefix
    scan gives the count of rows with a strictly smaller value, and a
    window PARTITIONED BY value (small tie groups) ordered by id gives
    the intra-tie offset. The NTILE split then follows SQL semantics
    exactly — with n rows, q = n div n_bins, r = n mod n_bins, the
    first r tiles hold q+1 rows — as a closed-form CASE on the rank, so
    an oracle can state plain ntile() and still hash-match (law test:
    tests/test_evaluate.py pins equality against Spark's own ntile()).

    Returns ``df``'s rows (value aliased to ``value_col``'s name,
    untouched other columns preserved) plus the 1-based int ``bin_col``.

    NON-NULL CONTRACT: ``value_col`` must not be NULL (and must not cast
    to NULL). The rank join keys on the value, and a NULL key would
    silently drop the row — while a plain ntile() oracle RANKS NULLs
    (with engine-dependent NULL ordering, so there is no portable
    semantics to match). A NULL therefore raises at execution time
    instead of diverging silently.
    """
    from ._cache import hold

    # HELD (round-13 optimization): `tagged` is referenced twice below
    # (per_value agg + rank join), so a CHAIN of ntile applications (RFM
    # binds three in a row) otherwise re-nests its whole input per
    # reference — plan size and re-execution grow exponentially with
    # chain depth (rfm_segments' formatted plan carried 764 Exchange
    # nodes before this; guide §3.3 "very wide plans"). The hold
    # truncates the lineage per level: the chain is now linear. LAZY on
    # purpose: the two consumers materialize inside one action, where the
    # block manager serializes concurrent fills per partition (measured
    # A/B at sf0.1: lazy 3.2 s vs eager 3.6 s for the 3-level RFM chain —
    # the eager count is pure added latency here).
    tagged = hold(
        df.withColumn(
            "__v",
            F.when(
                F.col(value_col).cast("long").isNull(),
                F.raise_error(
                    F.lit(
                        f"distributed_ntile: NULL (or non-castable) {value_col};"
                        " the operator's non-null contract — filter or impute"
                        " upstream (plain ntile() NULL ordering is not portable)"
                    )
                ).cast("long"),
            ).otherwise(F.col(value_col).cast("long")),
        )
    )
    per_value = tagged.groupBy("__v").agg(
        F.count(F.lit(1)).alias("pos"),  # prefix helper contract: the
        F.count(F.lit(1)).alias("neg"),  # scanned measure is `neg`
    ).withColumnRenamed("__v", "score")
    below = _neg_below(per_value, bucket_width).select(
        F.col("score").alias("__v"), F.col("neg_below").alias("rows_below")
    )
    ranked = (
        tagged.join(below, "__v")
        .withColumn(
            "intra",
            F.row_number().over(
                Window.partitionBy("__v").orderBy(id_col)
            ),
        )
        .withColumn("rnk", F.col("rows_below") + F.col("intra"))
    )
    # n_total from the VALUE-sized relation, not a third scan of the rows
    n_total = per_value.groupBy().agg(
        F.sum("pos").cast("long").alias("n_total")
    )
    k = int(n_bins)
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .withColumn(
            bin_col,
            F.expr(
                f"CASE WHEN n_total div {k} = 0 THEN rnk "
                f"WHEN rnk <= (n_total % {k}) * (n_total div {k} + 1) "
                f"THEN (rnk - 1) div (n_total div {k} + 1) + 1 "
                f"ELSE n_total % {k} + (rnk - 1 - (n_total % {k}) "
                f"* (n_total div {k} + 1)) div (n_total div {k}) + 1 END"
            ).cast("int"),
        )
        .drop("__v", "rows_below", "intra", "rnk", "n_total")
    )


def calibration_bins(
    scored: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    id_col: str = "uid",
    n_bins: int = 10,
    bucket_width: int = 100_000,
) -> DataFrame:
    """Equi-depth calibration report: distributed_ntile over the score,
    then per-bin positive rate — does the score's magnitude mean what it
    claims?

    Output: one row per bin — bin (1-based int), n_rows, n_pos,
    pos_rate_micro, lo_score, hi_score.
    """
    rows = scored.select(
        F.col(score_col).cast("long").alias("score"),
        F.col(label_col).cast("long").alias("label"),
        F.col(id_col).alias("uid"),
    )
    binned = distributed_ntile(
        rows,
        value_col="score",
        id_col="uid",
        n_bins=n_bins,
        bucket_width=bucket_width,
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("label").cast("long").alias("n_pos"),
            F.min("score").cast("long").alias("lo_score"),
            F.max("score").cast("long").alias("hi_score"),
        )
        .select(
            "bin",
            "n_rows",
            "n_pos",
            F.expr("(1000000 * n_pos) div n_rows")
            .cast("long")
            .alias("pos_rate_micro"),
            "lo_score",
            "hi_score",
        )
    )


# hard bound on the exact self-kNN corpus: above this the O(n^2) brute
# baseline is the wrong tool at ANY speed — callers route ivf_topk/lsh_topk
KNN_BRUTE_MAX = 100_000


def _self_knn_topk(embeddings: DataFrame, k: int) -> DataFrame:
    """Exact all-vectors cosine top-k (query_id, neighbor_id, rank), two
    stages so the O(n^2) work is an Arrow matmul, not 25M interpreted
    SQL-lambda folds (37 s -> ~1.5 s at sf0.1):

    1. CANDIDATES (mapInPandas): the corpus matrix (bounded — raises
       over KNN_BRUTE_MAX; the 100 TB path is ivf_topk/lsh_topk) rides
       the task closure; each Arrow batch of queries does one BLAS
       matmul and keeps every neighbor whose unrounded cosine is within
       MARGIN of its k-th best. Selection-only: BLAS pairwise-summation
       error (~1e-12) plus the 0.5e-6 rounding shift both sit far
       inside MARGIN = 3e-6, so every pair that could make the ROUNDED
       top-k (ties included) provably survives to stage 2.
    2. EXACT RE-RANK: the ~k+ties candidates per query are re-scored
       with the very same 1e-6-rounded sequential-fold cosine + id
       tiebreak as functions/similarity.py::brute_force_topk (the
       arithmetic every similarity gate already proves against DuckDB),
       then row_number <= k. Bit-identical ranking, none of the n^2
       cost."""
    import numpy as np
    import pandas as pd

    from .similarity import _cosine_r6, _norm

    n = embeddings.count()
    if n > KNN_BRUTE_MAX:
        raise ValueError(
            f"exact self-kNN is O(n^2): corpus {n} > {KNN_BRUTE_MAX}; "
            "use ivf_topk/lsh_topk for the at-scale report"
        )
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.sqrt((mat * mat).sum(axis=1))
    margin = 3e-6
    out_schema = "query_id long, neighbor_id long"

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            qids = pdf["vec_id"].to_numpy().astype(np.int64)
            qn = np.sqrt((q * q).sum(axis=1))
            denom = qn[:, None] * norms[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                sim = np.where(denom > 0, (q @ mat.T) / denom, -np.inf)
            sim[np.isnan(sim)] = -np.inf
            sim[qids[:, None] == ids[None, :]] = -np.inf  # exclude self
            kk = min(k, sim.shape[1] - 1)
            if kk <= 0:
                continue
            kth = np.partition(sim, -kk, axis=1)[:, -kk]
            keep = sim >= (kth[:, None] - margin)
            qi, ni = np.nonzero(keep)
            yield pd.DataFrame(
                {"query_id": qids[qi], "neighbor_id": ids[ni]}
            )

    cand = embeddings.select("vec_id", "embedding").mapInPandas(
        gen, out_schema
    )
    a = embeddings.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("a"),
        _norm("embedding").alias("na"),
    )
    b = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("b"),
        _norm("embedding").alias("nb"),
    )
    scored = (
        cand.join(a, "query_id")
        .join(b, "neighbor_id")
        # the self pair can leak through `keep` when a query's kth
        # candidate sim is -inf (zero-norm vectors make every sim -inf
        # and keep all-True) — stage 2 must mask it like stage 1 does,
        # or a NULL-cosine self row can win the id tiebreak among NULLs
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _cosine_r6().alias("cos_sim_r6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim_r6").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def knn_label_agreement(
    embeddings: DataFrame, *, k: int = 5
) -> DataFrame:
    """Mislabeled-example screen: for every vector, the fraction of its
    k exact cosine nearest neighbors sharing its label, reported per
    label — the standard kNN label-noise audit run before training on a
    labeled embedding set (low agreement for a label = suspect annotations).

    Neighbors come from _self_knn_topk: Arrow-matmul candidate
    generation + exact re-rank with the same 1e-6-rounded cosine and id
    tiebreak as functions/similarity.py::brute_force_topk, so results
    are rank-stable under any float schedule. Brute-force is the
    exactness baseline the recall audits pin the approximate paths
    against; at 100 TB the same report runs over ivf_topk/lsh_topk
    instead (identical downstream agg).

    Output: one row per label — label, n_vecs, n_neighbor_hits,
    agreement_micro = 1e6 * hits div (k * n_vecs).
    """
    topk = _self_knn_topk(embeddings, k)
    labels = embeddings.select("vec_id", "label")
    q_lab = labels.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
        "label", "q_label"
    )
    n_lab = labels.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed(
        "label", "n_label"
    )
    hits = (
        topk.join(q_lab, "query_id")
        .join(n_lab, "neighbor_id")
        .groupBy(F.col("q_label").alias("label"))
        .agg(
            F.count_distinct("query_id").cast("long").alias("n_vecs"),
            F.sum(
                F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_neighbor_hits"),
        )
    )
    return hits.select(
        "label",
        "n_vecs",
        "n_neighbor_hits",
        F.expr(f"(1000000 * n_neighbor_hits) div ({int(k)} * n_vecs)")
        .cast("long")
        .alias("agreement_micro"),
    )


def zscore_anomaly_cells(
    cells: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "cents",
    z: int = 2,
) -> DataFrame:
    """Integer-exact z-score screen: keep the rows of ``cells`` whose
    ``value_col`` deviates more than ``z`` population sigmas from their
    group's mean — stated WITHOUT division or sqrt, so both engines
    agree bit-for-bit: (n*x - s1)^2 > z^2 * (n*s2 - s1^2) is the
    z^2 inequality cleared of denominators (n^2 cancels on both sides).

    Arithmetic runs in decimal(38,0) (DuckDB: HUGEINT) because the sum
    of squares overflows bigint at warehouse scale. Plan: one hash agg
    to per-group scalars, broadcast back, map-side filter — the
    anomaly-detection primitive over any pre-aggregated cell relation.
    """
    v = F.col(value_col).cast("decimal(38,0)")
    stats = cells.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(v).alias("__s1"),
        F.sum(v * v).alias("__s2"),
    )
    dev = F.col("__n") * F.col(value_col).cast("decimal(38,0)") - F.col("__s1")
    # decimal(38,0) x decimal(38,0) products overflow to NULL under
    # non-ANSI Spark, which would evaluate the filter false and silently
    # DROP a true anomaly — while the DuckDB oracle's HUGEINT overflow
    # errors loudly. Fail like the oracle: a NULL product with non-NULL
    # inputs can only be overflow, so raise instead of filtering.
    dev2 = dev * dev
    bound = F.lit(int(z) * int(z)) * (
        F.col("__n") * F.col("__s2") - F.col("__s1") * F.col("__s1")
    )
    # only flag overflow for non-NULL inputs; a NULL cell value keeps the
    # SQL three-valued semantics (filter false) both engines share
    overflow = F.col(value_col).isNotNull() & (dev2.isNull() | bound.isNull())
    guarded = F.when(
        overflow,
        F.raise_error(
            F.lit(
                "zscore_anomaly_cells: decimal(38,0) overflow in the"
                " cleared z^2 inequality — rescale value_col (the oracle's"
                " HUGEINT errors here too; silence would drop anomalies)"
            )
        ).cast("boolean"),
    ).otherwise(dev2 > bound)
    return (
        cells.join(F.broadcast(stats), group_col)
        .filter(guarded)
        .drop("__n", "__s1", "__s2")
    )


def retrieval_mrr(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    total: int | None = None,
) -> DataFrame:
    """Reciprocal-rank audit of the LSH ANN index: for each query, where
    inside the LSH top-``k`` does the TRUE nearest neighbor (exact
    brute-force top-1) land? The standard retrieval-eval companion to
    recall@k (ann_recall_audit) — recall says "did we find it", MRR says
    "how high did we put it", which is what reranker budgets key off.

    Output: (query_id, true_top1, found_rank, rr_micro) — found_rank is
    0 when the true neighbor is missing from the ANN list, rr_micro is
    the integer-micros reciprocal rank ``1000000 div rank`` (0 when
    missing): exact integers, no float MRR accumulation, so the DuckDB
    oracle hash-matches bit-for-bit.

    Scale shape: both inputs are already-gated deterministic chains
    (similarity_topk / similarity_lsh_topk); this audit only joins two
    (n_queries x k)-row relations — constant cost against any corpus."""
    from .similarity import brute_force_topk, lsh_topk

    exact1 = brute_force_topk(embeddings, queries, k=1).select(
        F.col("query_id").alias("qid"),
        F.col("neighbor_id").alias("true_top1"),
    )
    approx = lsh_topk(embeddings, queries, k=k, total=total).select(
        F.col("query_id").alias("aqid"),
        F.col("neighbor_id").alias("nid"),
        F.col("rank").alias("found"),
    )
    return (
        exact1.join(
            approx,
            (F.col("qid") == F.col("aqid"))
            & (F.col("true_top1") == F.col("nid")),
            "left",
        )
        .select(
            F.col("qid").alias("query_id"),
            "true_top1",
            F.coalesce(F.col("found"), F.lit(0)).cast("int").alias(
                "found_rank"
            ),
            F.coalesce(
                F.expr("1000000 div found"), F.lit(0)
            ).cast("bigint").alias("rr_micro"),
        )
    )


def conformal_coverage(
    events: DataFrame,
    alpha_ppm: int = 100_000,
) -> DataFrame:
    """Split-conformal calibration audit (Vovk et al.; Angelopoulos &
    Bates 2023 tutorial formulation): a deterministic hash splits rows
    into a CALIBRATION and an EVAL set, the calibration set yields the
    exact ceil((n+1)(1-alpha))-th smallest nonconformity score, and the
    audit reports the eval-set coverage of the induced prediction set —
    the guarantee says coverage >= 1 - alpha in expectation.

    Everything is exact integers: scores are value-cents, the threshold
    index is ``(n+1) * (1000000 - alpha_ppm)`` ceiling-divided by 1e6,
    the quantile is picked by rank (two-phase: per-bucket counts, then a
    bounded per-bucket prefix scan — no global sort window), coverage is
    integer ppm. Per event_type group, so the output is a bounded
    per-group summary.

    Output: (event_type, n_cal, n_eval, q_index, threshold_cents,
    n_covered, coverage_ppm)."""
    base = events.select(
        F.col("event_type"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        # calibration membership: md5 of the event id, same cross-engine
        # recipe as train_split (first 8 hex chars -> int, mod 2)
        (
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0
        ).alias("is_cal"),
    ).filter(F.col("cents").isNotNull())
    cal = base.filter("is_cal")
    n_cal = cal.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_cal")
    )
    # q_index = ceil((n_cal + 1) * (1 - alpha)) as exact integer ppm math
    q = n_cal.select(
        "event_type",
        "n_cal",
        F.expr(
            f"CAST(((n_cal + 1) * {1_000_000 - int(alpha_ppm)}"
            " + 999999) div 1000000 AS BIGINT)"
        ).alias("q_index"),
    )
    # rank calibration scores per group WITHOUT a global sort window:
    # per-(group, score) counts, then a prefix scan over the bounded
    # distinct-score relation per group
    per_score = cal.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cum = per_score.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy("event_type")
            .orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    thr = (
        cum.join(F.broadcast(q), "event_type")
        .filter(F.col("cum") >= F.least(F.col("q_index"), F.col("n_cal")))
        .groupBy("event_type", "n_cal", "q_index")
        .agg(F.min("cents").alias("threshold_cents"))
    )
    ev = base.filter(~F.col("is_cal")).select("event_type", "cents")
    return (
        ev.join(F.broadcast(thr), "event_type")
        .groupBy("event_type", "n_cal", "q_index", "threshold_cents")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(
                F.when(F.col("cents") <= F.col("threshold_cents"), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_covered"),
        )
        .select(
            "event_type",
            "n_cal",
            "n_eval",
            "q_index",
            "threshold_cents",
            "n_covered",
            F.expr("(n_covered * 1000000) div n_eval").alias(
                "coverage_ppm"
            ),
        )
    )
