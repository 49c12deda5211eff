"""Streaming IVF-PQ ingest-screen laws (streaming/pq_screen.py):

1. batch identity — the stream result IS the batch restatement of the
   ADC screen (zero streaming state, so nothing can diverge): every hit
   pair is same-inverted-list, self-pairs excluded, scores are the
   exact-bigint dot of query micros against the PQ reconstruction;
2. slicing invariance — a multi-file replay arriving as many
   micro-batches produces the same rows;
3. artifact identity — screening against a persisted build_pq_index
   artifact equals screening against fresh-derived relations;
4. ADC consistency — each hit's score equals the per-subspace ADC-table
   sum (dot(q, recon) == sum over subspaces of the partial dots).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from adtech_log_data_pipeline_spark.streaming.pq_screen import (
    STREAM_PQ_THRESHOLD,
    stream_pq_screen,
)

SF = "/root/testdata/sf0.001"


def _as_tuples(df):
    return sorted(
        (r["vec_id"], r["neighbor_id"], r["adc_cos_r6"]) for r in df.collect()
    )


def _batch_restatement(spark, sf_dir, threshold=STREAM_PQ_THRESHOLD):
    """The screen computed batch-side from first principles (micros,
    codes, reconstruction, same-list pairs, r6 cosine)."""
    from adtech_log_data_pipeline_spark.functions._cache import hold
    from adtech_log_data_pipeline_spark.functions.similarity import (
        PQ_K,
        PQ_M,
        _ivf_seed_vectors,
        _pq_dsub,
        ivf_assignments,
        pq_code_rows,
        pq_codebooks,
    )
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    total = emb.count()
    cb = hold(pq_codebooks(emb, k=PQ_K, total=total), eager=True)
    codes = pq_code_rows(emb, m=PQ_M, codebook=cb)
    seeds = _ivf_seed_vectors(emb, None, total)
    assign = hold(ivf_assignments(emb, seeds=seeds), eager=True)
    dsub = _pq_dsub(emb, PQ_M)
    cw = cb.withColumn("sub", (F.col("dim") / dsub).cast("int"))
    rec = codes.join(cw, ["sub", "cid"]).select("vec_id", "dim", "c_micro")
    corpus = (
        rec.groupBy("vec_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, c_micro))),"
                " s -> s.c_micro)"
            ).alias("recon"),
            F.sum(F.col("c_micro") * F.col("c_micro")).alias("cn2"),
        )
        .join(assign, "vec_id")
        .select(
            F.col("vec_id").alias("neighbor_id"), "list_id", "recon", "cn2"
        )
    )
    q = (
        emb.select("vec_id", "embedding")
        .withColumn(
            "qm",
            F.expr(
                "transform(embedding, x ->"
                " cast(floor(cast(x as double) * 1000000 + 0.5) as bigint))"
            ),
        )
        .withColumn(
            "qn2",
            F.expr("aggregate(qm, cast(0 as bigint), (a, v) -> a + v * v)"),
        )
        .join(assign, "vec_id")
        .select("vec_id", "qm", "qn2", "list_id")
    )
    return (
        q.join(corpus, "list_id")
        .filter(F.col("neighbor_id") != F.col("vec_id"))
        .withColumn(
            "dot",
            F.expr(
                "aggregate(zip_with(qm, recon, (x, y) -> x * y),"
                " cast(0 as bigint), (a, v) -> a + v)"
            ),
        )
        .withColumn(
            "adc_cos_r6",
            F.round(
                F.col("dot") / F.expr("nullif(sqrt(qn2) * sqrt(cn2), 0D)"), 6
            ),
        )
        .filter(F.col("adc_cos_r6") >= F.lit(threshold))
        .select("vec_id", "neighbor_id", "adc_cos_r6")
    )


def test_stream_screen_equals_batch_restatement(spark):
    got = _as_tuples(stream_pq_screen(spark, SF))
    want = _as_tuples(_batch_restatement(spark, SF))
    assert got == want and len(got) > 0


def test_multibatch_slicing_invariance(spark, tmp_path):
    """Embeddings replayed as 3 single-file micro-batches screen
    identically — the projection + stream-static join carries no
    state."""
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        part = rows[i * third : (i + 1) * third]
        p = os.path.join(str(tmp_path), f"part-{i}.parquet")
        spark.createDataFrame(part, emb.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p + ".dir")
        f = [
            x
            for x in os.listdir(p + ".dir")
            if x.endswith(".parquet") and not x.startswith(".")
        ]
        os.rename(os.path.join(p + ".dir", f[0]), p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(tmp_path))
    )
    sliced = stream_pq_screen(spark, SF, embeddings=stream)
    assert _as_tuples(sliced) == _as_tuples(stream_pq_screen(spark, SF))


def test_artifact_equals_fresh_screen(spark, tmp_path):
    from adtech_log_data_pipeline_spark.functions.similarity import (
        build_pq_index,
        load_pq_index,
    )
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    build_pq_index(emb, str(tmp_path))
    idx = load_pq_index(spark, str(tmp_path))
    got = _as_tuples(stream_pq_screen(spark, SF, index=idx))
    want = _as_tuples(stream_pq_screen(spark, SF))
    assert got == want and len(got) > 0


def test_hits_are_same_list_adc_sums(spark):
    """Each emitted hit pair shares an inverted list, and its score is
    the per-subspace ADC-table sum normalized to r6 — checked in plain
    Python against the persisted relations for a sample of hits."""
    import numpy as np

    from adtech_log_data_pipeline_spark.functions._cache import hold
    from adtech_log_data_pipeline_spark.functions.similarity import (
        PQ_K,
        PQ_M,
        _ivf_seed_vectors,
        _pq_dsub,
        ivf_assignments,
        pq_code_rows,
        pq_codebooks,
    )
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    total = emb.count()
    cb_df = hold(pq_codebooks(emb, k=PQ_K, total=total), eager=True)
    codes = {
        (r["vec_id"], r["sub"]): r["cid"]
        for r in pq_code_rows(emb, m=PQ_M, codebook=cb_df).collect()
    }
    assign = {
        r["vec_id"]: r["list_id"]
        for r in ivf_assignments(
            emb, seeds=_ivf_seed_vectors(emb, None, total)
        ).collect()
    }
    cb = {}
    for r in cb_df.collect():
        cb.setdefault(r["cid"], {})[r["dim"]] = r["c_micro"]
    micros = {
        r["vec_id"]: [
            int(np.floor(float(x) * 1_000_000 + 0.5)) for x in r["embedding"]
        ]
        for r in emb.collect()
    }
    dims = len(next(iter(micros.values())))
    dsub = _pq_dsub(emb, PQ_M)

    hits = stream_pq_screen(spark, SF).collect()
    assert len(hits) > 0
    for r in hits[:25]:
        q, c = r["vec_id"], r["neighbor_id"]
        assert q != c and assign[q] == assign[c], r
        dot = qn2 = cn2 = 0
        for d in range(dims):
            cid = codes[(c, d // dsub)]
            dot += micros[q][d] * cb[cid][d]
            qn2 += micros[q][d] * micros[q][d]
            cn2 += cb[cid][d] * cb[cid][d]
        want = round(dot / (np.sqrt(qn2) * np.sqrt(cn2)), 6)
        assert abs(r["adc_cos_r6"] - want) < 1e-9, (r, want)
        assert r["adc_cos_r6"] >= STREAM_PQ_THRESHOLD
