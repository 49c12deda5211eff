"""Unit tests for the training-data-pipeline operators (dedup, similarity,
text analysis, multimodal plumbing)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from adtech_log_data_pipeline_spark.functions import (
    brute_force_topk,
    decode_image_metadata,
    dedup_exact,
    lang_id,
    lsh_topk,
    minhash_candidates,
    ngram_jaccard_pairs,
    simhash,
    text_stats,
    with_blob_column,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)], DOC_SCHEMA
    )


def test_dedup_exact_groups_same_vocab(spark):
    out = {
        r["keep_doc_id"]: r
        for r in dedup_exact(
            docs(spark, ["a b c", "c b a a", "x y z"])  # docs 0,1 share vocab
        ).collect()
    }
    assert out[0]["group_size"] == 2
    assert out[0]["distinct_texts"] == 2  # different texts, same vocab set
    assert out[2]["group_size"] == 1


def test_minhash_flags_duplicates_not_distinct(spark):
    # identical docs share every band deterministically; disjoint docs share
    # none (a near-dup lands probabilistically at J^4 per band — tested via
    # ngram_jaccard over a seeded corpus, not asserted here)
    base = "the quick brown fox jumps over the lazy dog again and again today"
    far = "completely different words about spark engines and parquet columns here"
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidates(docs(spark, [base, base, far])).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_minhash_precision_audit_counts_on_known_corpus(spark):
    """A corpus with one exact dup pair and otherwise-disjoint docs:
    truth = {(0,1)}, the dup pair must surface as a candidate (identical
    docs share every band), and the ppm metrics follow from the counts
    by exact integer arithmetic."""
    from adtech_log_data_pipeline_spark.functions.dedup import (
        minhash_precision_audit,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    far = "completely different words about spark engines and parquet columns here"
    third = "entirely other tokens regarding streaming windows and sketches now"
    row = minhash_precision_audit(
        docs(spark, [base, base, far, third]), n_docs=10
    ).collect()[0]
    assert row["n_docs"] == 10
    assert row["n_truth"] == 1
    assert row["n_true_pos"] == 1  # the dup pair must be a candidate
    assert row["n_true_pos"] <= row["n_candidates"]
    assert row["recall_ppm"] == 1000000
    assert row["precision_ppm"] == 1000000 * row["n_true_pos"] // row["n_candidates"]


def test_jaccard_identical_is_one(spark):
    t = "one two three four five six seven eight"
    out = ngram_jaccard_pairs(docs(spark, [t, t])).collect()
    assert len(out) == 1
    assert out[0]["jaccard"] == 1.0


def test_simhash_equal_for_identical_and_close_for_near(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    out = {r["doc_id"]: r["simhash"] for r in simhash(docs(spark, [base, base])).collect()}
    assert out[0] == out[1]
    assert 0 <= out[0] < 2**16


def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 8).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(20)],
        "vec_id long, embedding array<float>, label int",
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = [r["neighbor_id"] for r in sorted(
        brute_force_topk(emb, q, k=3).collect(), key=lambda r: r["rank"]
    )]
    v = vecs.astype("float64")
    cos = (v @ v[0]) / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    cos[0] = -2
    expected = list(np.argsort(np.round(-cos, 6), kind="stable")[:3])
    assert got == [int(x) for x in expected]


def test_lsh_topk_subset_of_bruteforce_space(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = rng.randn(64, 8).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(64)],
        "vec_id long, embedding array<float>, label int",
    )
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    rows = lsh_topk(emb, q, k=3).collect()
    assert all(r["neighbor_id"] != r["query_id"] for r in rows)
    assert all(1 <= r["rank"] <= 3 for r in rows)


def test_text_stats_values(spark):
    out = text_stats(docs(spark, ["Hello, world! the and of it go."])).collect()[0]
    assert out["n_tokens"] == 7
    assert out["n_tokens_bpe"] == 10  # 7 words + the , ! . punctuation tokens
    assert out["punct_ratio"] == pytest.approx(3 / 31)  # , ! .
    assert out["stopword_ratio"] == pytest.approx(4 / 7)  # the and of it


def test_lang_id_picks_marker_language(spark):
    out = {
        r["doc_id"]: r["lang_pred"]
        for r in lang_id(
            docs(spark, ["the cat and the dog is here", "der hund und die katze ist",
                         "xyzzy plugh"])
        ).collect()
    }
    assert out[0] == "en" and out[1] == "de" and out[2] == "unknown"


def test_multimodal_metadata_matches_md5_formula(spark):
    text = "some synthetic payload"
    out = decode_image_metadata(
        with_blob_column(docs(spark, [text]))
    ).collect()[0]
    h = hashlib.md5(text.encode()).hexdigest()
    assert out["n_bytes"] == len(text.encode())
    assert out["width"] == 64 + int(h[0:4], 16) % 448
    assert out["height"] == 64 + int(h[4:8], 16) % 448
    assert out["format"] in ("png", "jpeg", "webp")


def test_resize_plan_geometry_contract(spark):
    """Images inside the box pass through unchanged; larger ones scale to
    fit with integer floor-at-1 and preserve which side is longer."""
    from adtech_log_data_pipeline_spark.functions.multimodal import (
        RESIZE_MAX_DIM,
        resize_plan,
        with_blob_column,
    )

    texts = [f"payload number {i} with some variation" for i in range(40)]
    rows = resize_plan(with_blob_column(docs(spark, texts))).collect()
    assert len(rows) == len(texts)
    for r in rows:
        m = max(r["width"], r["height"])
        if m <= RESIZE_MAX_DIM:
            assert (r["target_w"], r["target_h"]) == (r["width"], r["height"])
        else:
            assert max(r["target_w"], r["target_h"]) <= RESIZE_MAX_DIM
            assert r["target_w"] >= 1 and r["target_h"] >= 1
            # aspect order preserved
            assert (r["width"] >= r["height"]) == (r["target_w"] >= r["target_h"])
        assert r["est_bytes"] == r["target_w"] * r["target_h"] * 3


def test_frame_sample_manifest_shape(spark):
    from adtech_log_data_pipeline_spark.functions.multimodal import (
        FRAME_SAMPLES,
        frame_sample_manifest,
        with_blob_column,
    )

    out = frame_sample_manifest(with_blob_column(docs(spark, ["clip a", "clip b"])))
    rows = sorted(out.collect(), key=lambda r: (r["doc_id"], r["frame_idx"]))
    assert len(rows) == 2 * FRAME_SAMPLES
    for doc in (0, 1):
        sub = [r for r in rows if r["doc_id"] == doc]
        ts = [r["ts_ms"] for r in sub]
        assert ts == sorted(ts) and ts[0] == 0
        assert all(0 <= t < sub[0]["duration_ms"] for t in ts)


def test_image_embed_fixed_width_deterministic(spark):
    from adtech_log_data_pipeline_spark.functions.multimodal import (
        EMBED_DIMS,
        image_embed,
        with_blob_column,
    )

    a = image_embed(with_blob_column(docs(spark, ["same text", "other"]))).collect()
    b = image_embed(with_blob_column(docs(spark, ["same text", "other"]))).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    for r in a:
        assert len(r["emb"]) == EMBED_DIMS
        assert all(-1_000_000 <= x <= 1_000_000 for x in r["emb"])


def test_dedup_clusters_transitive_grouping(spark):
    # a~b and b~c must land in one component labeled by the min doc_id,
    # even though a and c never share a band necessarily
    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    corpus = docs(spark, [t1, t1, t1, "totally unrelated text about engines and columns"])
    from adtech_log_data_pipeline_spark.functions.dedup import dedup_clusters

    out = {r["doc_id"]: r["component_id"] for r in dedup_clusters(corpus).collect()}
    assert out == {0: 0, 1: 0, 2: 0}


def test_dedup_clusters_driver_and_distributed_paths_agree(spark):
    # the adaptive cutoff must not change results: force the distributed
    # label-propagation loop (driver_cutoff=0 -> never collect) and compare
    # against the driver-side union-find on a chain a~b, b~c, c~d
    from adtech_log_data_pipeline_spark.functions.dedup import dedup_clusters

    chain = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    fast = {
        r["doc_id"]: r["component_id"]
        for r in dedup_clusters(None, candidates=chain).collect()
    }
    dist = {
        r["doc_id"]: r["component_id"]
        for r in dedup_clusters(None, candidates=chain, driver_cutoff=0).collect()
    }
    assert fast == dist == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10}


def test_ivf_topk_shape(spark):
    import numpy as np
    from adtech_log_data_pipeline_spark.functions.similarity import ivf_topk

    rng = np.random.RandomState(3)
    vecs = rng.randn(60, 8).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(60)],
        "vec_id long, embedding array<float>, label int",
    )
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    rows = ivf_topk(emb, q, k=3, n_lists=6).collect()
    assert all(r["neighbor_id"] != r["query_id"] for r in rows)
    assert all(1 <= r["rank"] <= 3 for r in rows)


def test_winnowing_shared_fingerprints_for_shared_substrings(spark):
    from adtech_log_data_pipeline_spark.functions.text import winnowing_fingerprints

    shared = "the quick brown fox jumps over the lazy dog near the old barn today"
    d0 = shared + " with extra trailing words appended here"
    d1 = "completely different prefix words then " + shared
    d2 = "nothing in common with anything else at all whatsoever in this text"
    out = winnowing_fingerprints(docs(spark, [d0, d1, d2])).collect()
    fps = {}
    for r in out:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1]  # the long shared run must yield shared fingerprints
    assert not (fps[0] & fps[2])


def test_text_stats_empty_document_yields_null_ratio(spark):
    """ADVICE guard: an empty/whitespace-only document must produce NULL
    punct_ratio (nullif), not a div-by-zero — and a 0.0 quality score."""
    from adtech_log_data_pipeline_spark.functions.text import text_stats

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real text with some words")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_stats(docs).collect()}
    assert rows[1]["punct_ratio"] is None
    assert rows[1]["quality_score"] == 0.0
    # whitespace-only: n_chars_measured counts raw length (3), ratio is 0
    assert rows[2]["punct_ratio"] == 0.0
    assert rows[3]["punct_ratio"] is not None


def test_simhash_near_dup_finds_single_word_change(spark):
    from adtech_log_data_pipeline_spark.functions.dedup import simhash_near_dup

    # one word changed in a 120-word doc: margins are wide enough that only
    # a few signature bits flip (verified: hamming(0,1)=1 for this corpus)
    base = " ".join(f"w{i:03d}x" for i in range(120))
    corpus = docs(
        spark,
        [base, base.replace("w119x", "zzzzz"),
         "totally different content about columns and rows and nothing else"],
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             simhash_near_dup(corpus).collect()}
    assert (0, 1) in pairs  # one word changed -> tiny Hamming distance
    assert all(p in {(0, 1)} for p in pairs)  # doc 2 matches nothing
    assert pairs[(0, 1)] <= 3


def test_simhash_near_dup_identical_docs_distance_zero(spark):
    from adtech_log_data_pipeline_spark.functions.dedup import simhash_near_dup

    t = "one two three four five six seven eight nine ten"
    out = simhash_near_dup(docs(spark, [t, t])).collect()
    assert len(out) == 1 and out[0]["hamming"] == 0


def test_vocab_topk_counts_and_rank(spark):
    from adtech_log_data_pipeline_spark.functions.text import vocab_topk

    out = vocab_topk(docs(spark, ["a a b", "a b c"]), k=2).collect()
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["token"] == "a"
    assert by_rank[1]["total_count"] == 3 and by_rank[1]["doc_freq"] == 2
    assert by_rank[2]["token"] == "b"  # tie with c on count -> token order


def test_train_split_deterministic_and_partitioning_proof(spark):
    from adtech_log_data_pipeline_spark.functions.text import train_split

    d = docs(spark, [f"doc number {i}" for i in range(200)])
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in train_split(d).collect()}
    b = {
        r["doc_id"]: (r["bucket"], r["split"])
        for r in train_split(d.repartition(7)).collect()
    }
    assert a == b  # reshuffle-proof
    assert all(
        (bk < 80) == (sp == "train") and (80 <= bk < 90) == (sp == "val")
        for bk, sp in a.values()
    )


def test_pii_redact_replaces_and_counts(spark):
    from adtech_log_data_pipeline_spark.functions.text import pii_redact

    text = "mail alice@example.com from 10.0.0.1 or call 555-867-5309 now"
    out = pii_redact(docs(spark, [text, "nothing sensitive here"])).collect()
    byid = {r["doc_id"]: r for r in out}
    assert (byid[0]["n_emails"], byid[0]["n_ips"], byid[0]["n_phones"]) == (1, 1, 1)
    redacted = "mail <EMAIL> from <IP> or call <PHONE> now"
    assert byid[0]["redacted_hash"] == hashlib.md5(redacted.encode()).hexdigest()
    assert byid[0]["redacted_len"] == len(redacted)
    assert byid[1]["redacted_hash"] == hashlib.md5(b"nothing sensitive here").hexdigest()


def test_label_centroids_exact_micros(spark):
    from adtech_log_data_pipeline_spark.functions.similarity import label_centroids

    emb = spark.createDataFrame(
        [(0, [1.0, -0.5], 7), (1, [2.0, 0.25], 7), (2, [10.0, 10.0], 8)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {(r["label"], r["dim"]): r for r in label_centroids(emb).collect()}
    assert out[(7, 0)]["sum_micro"] == 3_000_000
    assert out[(7, 0)]["centroid_micro"] == 1_500_000
    assert out[(7, 1)]["sum_micro"] == -250_000
    assert out[(7, 1)]["centroid_micro"] == -125_000
    assert out[(8, 0)]["n_vecs"] == 1


def test_kmeans_recovers_separated_clusters(spark):
    """Two well-separated blobs, k=2 strided init (one seed lands in
    each): after 3 Lloyd iterations the centroids are the exact integer-
    micro means of their blobs."""
    from adtech_log_data_pipeline_spark.functions.similarity import kmeans_centroids

    rows = (
        # blob A around (0, 0): vec_ids 0..3
        [(0, [0.0, 0.0]), (1, [0.2, 0.0]), (2, [0.0, 0.2]), (3, [0.2, 0.2])]
        # blob B around (10, 10): vec_ids 4..7
        + [(4, [10.0, 10.0]), (5, [10.2, 10.0]), (6, [10.0, 10.2]), (7, [10.2, 10.2])]
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_centroids(emb, k=2, iters=3, total=8)
    got = {(r["cid"], r["dim"]): r for r in out.collect()}
    # strided init: seeds vec_id % 4 == 0 -> cid 0 (blob A) and cid 4 (blob B)
    assert {c for c, _ in got} == {0, 4}
    assert got[(0, 0)]["n_vecs"] == 4 and got[(4, 0)]["n_vecs"] == 4
    assert got[(0, 0)]["centroid_micro"] == 100_000  # mean(0, .2, 0, .2)
    assert got[(4, 0)]["centroid_micro"] == 10_100_000
    assert got[(4, 1)]["centroid_micro"] == 10_100_000


def test_kmeans_deterministic_under_repartition(spark):
    from adtech_log_data_pipeline_spark.functions.similarity import kmeans_centroids
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = {
        (r["cid"], r["dim"]): (r["n_vecs"], r["centroid_micro"])
        for r in kmeans_centroids(emb).collect()
    }
    b = {
        (r["cid"], r["dim"]): (r["n_vecs"], r["centroid_micro"])
        for r in kmeans_centroids(emb.repartition(13)).collect()
    }
    assert a == b and len(a) > 0


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """A seed with no members after assignment survives with n_vecs=0 and
    its previous coordinates (no NULLs, no dropped cluster rows). Seeds 0
    and 2 COINCIDE (same value), so every point — including vec 2 itself —
    ties and breaks to the smaller cid 0: cluster 2 is empty from
    iteration 1 and must ride through on the COALESCE(prev) branch."""
    from adtech_log_data_pipeline_spark.functions.similarity import kmeans_centroids

    rows = [(0, [0.1]), (1, [0.1]), (2, [0.1]), (3, [0.5])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # iters=1: every point ties between the coincident seeds and goes to
    # cid 0 — cluster 2 is empty THIS iteration (a second iteration would
    # let the moved c0 centroid hand the 0.1 points back to c2)
    out = {r["cid"]: r for r in kmeans_centroids(emb, k=2, iters=1, total=4).collect()}
    assert set(out) == {0, 2}
    assert out[0]["n_vecs"] == 4
    assert out[2]["n_vecs"] == 0
    # the empty cluster keeps its seed coordinates exactly
    assert out[2]["centroid_micro"] == 100_000
    # the live cluster is the exact mean: (0.1*3 + 0.5)/4 = 0.2
    assert out[0]["centroid_micro"] == 200_000


def test_repetition_stats_duplicate_detection(spark):
    from adtech_log_data_pipeline_spark.functions.text import repetition_stats

    out = {r["doc_id"]: r for r in repetition_stats(
        docs(spark, [
            "spam spam spam spam",          # one bigram repeated 3x
            "line\nline\nother",            # duplicate lines
            "solo",                          # single token: no bigrams
            "all words here are different",
        ])
    ).collect()}
    r0 = out[0]
    assert r0["dup_token_frac"] == 0.75  # 1 distinct of 4
    assert r0["top_bigram"] == "spam spam" and r0["top_bigram_cnt"] == 3
    assert r0["top_bigram_frac"] == 1.0
    r1 = out[1]
    assert r1["n_lines"] == 3 and abs(r1["dup_line_frac"] - 1 / 3) < 1e-12
    r2 = out[2]
    assert r2["top_bigram"] is None and r2["top_bigram_cnt"] is None
    r3 = out[3]
    assert r3["dup_token_frac"] == 0.0 and r3["top_bigram_cnt"] == 1


def test_repetition_stats_tie_breaks_to_smallest_bigram(spark):
    from adtech_log_data_pipeline_spark.functions.text import repetition_stats

    # "b a" and "a b" both occur twice -> lexicographically smaller wins
    out = repetition_stats(docs(spark, ["a b a b a"])).collect()[0]
    assert out["top_bigram"] == "a b" and out["top_bigram_cnt"] == 2


def test_tfidf_rare_term_outranks_common(spark):
    from adtech_log_data_pipeline_spark.functions.text import tfidf_top_terms

    corpus = docs(spark, ["shared zebra", "shared yak", "shared shared wolf"])
    out = {(r["doc_id"], r["rank"]): r for r in tfidf_top_terms(corpus).collect()}
    # doc 0: zebra df=1 beats shared df=3 (tf 1 each)
    assert out[(0, 1)]["term"] == "zebra" and out[(0, 2)]["term"] == "shared"
    assert out[(0, 1)]["df"] == 1 and out[(0, 2)]["df"] == 3
    # doc 2: shared has tf=2 -> tfidf 2*4/4=2.0 vs wolf 1*4/2=2.0 -> tie,
    # term order breaks it: "shared" < "wolf"
    assert out[(2, 1)]["term"] == "shared" and out[(2, 2)]["term"] == "wolf"
    assert out[(2, 1)]["tfidf"] == out[(2, 2)]["tfidf"] == 2.0


def test_length_percentiles_rank_pick(spark):
    from adtech_log_data_pipeline_spark.functions.text import length_percentiles

    # 10 docs in one source, lengths 1..10 tokens: pct p picks rank ceil(p/10)
    d = spark.createDataFrame(
        [(i, " ".join(["w"] * i), "en", "webA", 0) for i in range(1, 11)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    out = {r["pct"]: r["n_tokens_p"] for r in length_percentiles(d).collect()}
    assert out == {25: 3, 50: 5, 75: 8, 90: 9, 99: 10}


def test_source_mix_shares_sum_to_one(spark):
    from adtech_log_data_pipeline_spark.functions.text import source_mix

    d = spark.createDataFrame(
        [(0, "a b", "en", "webA", 0), (1, "c", "en", "webB", 0),
         (2, "d e f", "de", "webA", 0)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    rows = source_mix(d).collect()
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-12
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-12
    byk = {(r["source"], r["lang"]): r for r in rows}
    assert byk[("webA", "en")]["n_tokens"] == 2
    assert byk[("webA", "de")]["token_share"] == 0.5


def test_packing_plan_contiguous_fill(spark):
    from adtech_log_data_pipeline_spark.functions.text import packing_plan

    # source A: docs of 3, 2, 4 tokens with ctx=4 -> cum_before 0, 3, 5
    d = spark.createDataFrame(
        [(0, "a b c", "en", "A", 0), (1, "d e", "en", "A", 0),
         (2, "f g h i", "en", "A", 0), (3, "x", "en", "B", 0)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    out = {r["doc_id"]: r for r in packing_plan(d, ctx=4).collect()}
    assert (out[0]["cum_before"], out[0]["pack_id"], out[0]["pack_offset"]) == (0, 0, 0)
    assert (out[1]["cum_before"], out[1]["pack_id"], out[1]["pack_offset"]) == (3, 0, 3)
    assert (out[2]["cum_before"], out[2]["pack_id"], out[2]["pack_offset"]) == (5, 1, 1)
    # sources pack independently
    assert (out[3]["cum_before"], out[3]["pack_id"]) == (0, 0)


def test_semantic_dedup_drops_within_cluster_keeps_across(spark):
    """Two separated blobs: near-identical vectors inside one blob prune
    to the smallest vec_id; vectors in different clusters are never
    compared even if (anti-)parallel. kept covers EVERY input row."""
    from adtech_log_data_pipeline_spark.functions.similarity import semantic_dedup

    rows = (
        # blob A: 0/1/2 mutually cosine≈1 (scaled copies), 3 orthogonal-ish
        [(0, [1.0, 0.01]), (1, [2.0, 0.02]), (2, [0.5, 0.005]), (3, [0.01, 1.0])]
        # blob B far away: 4/5 parallel to blob A members but own cluster
        + [(4, [100.0, 1.0]), (5, [200.0, 2.0]), (6, [100.0, 120.0]), (7, [101.0, 1.01])]
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: (r["cid"], r["kept"])
        for r in semantic_dedup(emb, threshold=0.95, k=2, iters=3, total=8).collect()
    }
    assert len(out) == 8
    # strided seeds 0 and 4 -> blobs assign to their own centroid
    cids = {v[0] for v in out.values()}
    assert cids == {0, 4}
    # within blob A: 0 kept (smallest), 1 and 2 dropped (cos=1 to 0)
    assert out[0][1] is True and out[1][1] is False and out[2][1] is False
    assert out[3][1] is True  # orthogonal to its cluster-mates
    # within blob B: 4 kept; 5 and 7 are near-parallel to 4 -> dropped
    assert out[4][1] is True and out[5][1] is False and out[7][1] is False
    assert out[6][1] is True


def test_semantic_dedup_cluster_cap_bounds_pairs_not_membership(spark):
    """Vectors past the cluster cap are still assigned and KEPT (never
    compared) — the degenerate-cluster guard drops comparisons, not rows."""
    from adtech_log_data_pipeline_spark.functions.similarity import semantic_dedup

    # 6 identical vectors -> one cluster; cap=3 means only ids 0,1,2 join
    # pair generation: 0 kept, 1-2 dropped, 3-5 kept-by-cap
    rows = [(i, [1.0, 1.0]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            emb, threshold=0.9, k=1, iters=1, total=6, cluster_cap=3
        ).collect()
    }
    assert out == {0: True, 1: False, 2: False, 3: True, 4: True, 5: True}


def test_dedup_incoming_matches_existing_only(spark):
    """Incoming docs (id%10==7) match EXISTING corpus docs only: two
    identical incoming docs never match each other; the best match wins
    with the smallest-id tiebreak; fresh docs report NULL match."""
    from adtech_log_data_pipeline_spark.functions.dedup import dedup_incoming

    dup_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, dup_text, "a"),           # existing: exact dup source
        (2, dup_text, "a"),           # existing: same text, larger id
        (7, dup_text, "a"),           # incoming: dups 1 and 2 -> match 1
        (17, dup_text, "a"),          # incoming: identical to 7 but must
                                      # still match EXISTING 1, not 7
        (27, "totally different words here nothing shared at all ok", "a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in dedup_incoming(docs).collect()}
    assert set(out) == {7, 17, 27}
    assert out[7]["is_dup"] and out[7]["match_doc"] == 1 and out[7]["jaccard"] == 1.0
    assert out[17]["is_dup"] and out[17]["match_doc"] == 1
    assert not out[27]["is_dup"] and out[27]["match_doc"] is None


def test_kmeans_and_semantic_dedup_empty_input(spark):
    """Empty embeddings: kmeans_centroids returns an empty centroid
    relation (round-5 advice: the strided seed collect crashed on
    cids[0]) and semantic_dedup — which routes every input through it —
    returns an empty verdict frame, no crash."""
    from adtech_log_data_pipeline_spark.functions.similarity import (
        kmeans_assignments,
        kmeans_centroids,
        semantic_dedup,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    cent = kmeans_centroids(emb)
    assert cent.columns == ["cid", "dim", "n_vecs", "centroid_micro"]
    assert cent.count() == 0
    assert kmeans_assignments(emb, cent).count() == 0
    out = semantic_dedup(emb)
    assert out.columns == ["vec_id", "cid", "kept"]
    assert out.count() == 0


def test_band_cap_audit_reports_degenerate_drops(spark):
    """The "no silent caps" rule: a degenerate corpus (every doc
    identical — the boilerplate-heavy-crawl worst case) drives every doc
    into ONE bucket per band in both banding schemes; the audit must
    report the over-cap membership rather than silently truncating
    recall. Cross-law: the capped index relation sizes must equal
    n_members - n_dropped from the audit."""
    from adtech_log_data_pipeline_spark.functions.dedup import (
        N_BANDS,
        SIMHASH64_PIECES,
        band_cap_audit,
        minhash_band_rows,
        simhash_near_dup,
    )

    n, cap = 25, 10
    docs = spark.createDataFrame(
        [(i, "same exact boilerplate text repeated verbatim here", "web")
         for i in range(n)],
        "doc_id long, text string, source string",
    )
    rows = band_cap_audit(docs, bucket_cap=cap).collect()
    assert len(rows) == N_BANDS + SIMHASH64_PIECES
    for r in rows:
        assert r["n_buckets"] == 1
        assert r["n_capped_buckets"] == 1
        assert r["n_members"] == n
        assert r["n_dropped"] == n - cap  # REPORTED, not silent
        assert r["max_bucket"] == n
    # the capped minhash index holds exactly n_members - n_dropped rows
    assert minhash_band_rows(docs, bucket_cap=cap).count() == N_BANDS * cap
    # capped pair generation stays bucket-local O(cap^2), all dups found
    pairs = simhash_near_dup(docs, bucket_cap=cap)
    assert pairs.count() == cap * (cap - 1) // 2


def test_band_cap_audit_honest_corpus_zero_drops(spark):
    """On the real synthetic documents table at the default cap no bucket
    approaches the cap: every band reports zero pressure."""
    from adtech_log_data_pipeline_spark.functions.dedup import band_cap_audit
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for r in band_cap_audit(docs).collect():
        assert r["n_capped_buckets"] == 0 and r["n_dropped"] == 0
        assert r["n_members"] > 0


def test_semantic_cap_audit_partitions_membership(spark):
    """Audit laws: every vector is counted exactly once across clusters;
    n_kept + n_dropped == n_members; a tiny cap on a one-cluster corpus
    reports the overflow."""
    from adtech_log_data_pipeline_spark.functions.similarity import (
        semantic_dedup_cap_audit,
    )
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    total = emb.count()
    rows = semantic_dedup_cap_audit(emb).collect()
    assert sum(r["n_members"] for r in rows) == total
    assert all(r["n_kept"] + r["n_dropped"] == r["n_members"] for r in rows)

    one_blob = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    audited = semantic_dedup_cap_audit(one_blob, k=1, cluster_cap=5).collect()
    assert sum(r["n_dropped"] for r in audited) == 12 - 5


def test_dedup_incoming_indexed_equals_recompute(spark, tmp_path):
    """The persisted-artifact ingest screen must agree with the
    recompute-everything screen on a corpus where no bucket nears the cap
    (per-side vs joint cap semantics only diverge under cap pressure)."""
    from pyspark.sql import functions as F

    from adtech_log_data_pipeline_spark.functions.dedup import (
        INCOMING_MOD,
        INCOMING_SLOT,
        build_dedup_index,
        dedup_incoming,
        dedup_incoming_indexed,
    )
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    is_in = (F.col("doc_id") % INCOMING_MOD) == INCOMING_SLOT
    build_dedup_index(docs.filter(~is_in), str(tmp_path))
    indexed = {
        r["doc_id"]: (r["is_dup"], r["match_doc"], r["jaccard"])
        for r in dedup_incoming_indexed(docs.filter(is_in), str(tmp_path)).collect()
    }
    recomputed = {
        r["doc_id"]: (r["is_dup"], r["match_doc"], r["jaccard"])
        for r in dedup_incoming(docs).collect()
    }
    assert indexed == recomputed and len(indexed) > 0


def test_dup_span_stats_recovers_shared_passage_exactly(spark):
    """A verbatim 25-token passage shared by two docs yields ONE merged
    span per doc covering exactly the passage: dup k-gram hits at every
    in-passage offset (25-20+1 = 6 of them), merged [pos, pos+20) windows
    = [start, start+25). Surrounding unique tokens stay outside."""
    from adtech_log_data_pipeline_spark.functions.dedup import dup_span_stats

    passage = [f"p{i}" for i in range(25)]
    d0 = [f"a{i}" for i in range(5)] + passage
    d1 = passage + [f"b{i}" for i in range(3)]
    d2 = [f"c{i}" for i in range(30)]  # no dups
    out = {
        r["doc_id"]: r
        for r in dup_span_stats(
            docs(spark, [" ".join(d) for d in (d0, d1, d2)])
        ).collect()
    }
    assert (out[0]["n_spans"], out[0]["dup_tokens"]) == (1, 25)
    assert (out[1]["n_spans"], out[1]["dup_tokens"]) == (1, 25)
    assert out[0]["n_tokens"] == 30 and out[0]["dup_ppm"] == 25 * 1000000 // 30
    assert (out[2]["n_spans"], out[2]["dup_tokens"], out[2]["dup_ppm"]) == (0, 0, 0)


def test_dup_span_stats_within_doc_repeat_and_span_split(spark):
    """Within-doc repetition counts (S S -> hits at pos 0 and 20, merged
    into [0, 40)); two shared passages separated by a unique token stay
    TWO spans (hit gap 21 > k)."""
    from adtech_log_data_pipeline_spark.functions.dedup import (
        dup_spans,
        dup_span_stats,
    )

    s = [f"s{i}" for i in range(20)]
    p1 = [f"q{i}" for i in range(20)]
    p2 = [f"r{i}" for i in range(20)]
    d0 = s + s  # self-repeat
    d1 = p1 + ["gap"] + p2  # two dup passages, split by one unique token
    corpus = [" ".join(d) for d in (d0, d1, p1, p2)]
    out = {r["doc_id"]: r for r in dup_span_stats(docs(spark, corpus)).collect()}
    assert (out[0]["n_spans"], out[0]["dup_tokens"]) == (1, 40)
    assert (out[1]["n_spans"], out[1]["dup_tokens"]) == (2, 40)
    spans = sorted(
        (r["span_start"], r["span_end"])
        for r in dup_spans(docs(spark, corpus)).filter("doc_id = 1").collect()
    )
    assert spans == [(0, 20), (21, 41)]


def test_dup_span_stats_short_docs_carry_no_grams(spark):
    """Docs under k tokens emit no grams even when identical — the
    operator is a PASSAGE detector; whole-short-doc dedup is dedup_exact's
    job."""
    from adtech_log_data_pipeline_spark.functions.dedup import dup_span_stats

    out = dup_span_stats(docs(spark, ["x y z", "x y z"])).collect()
    assert all(r["n_spans"] == 0 and r["dup_tokens"] == 0 for r in out)
    assert all(r["n_tokens"] == 3 for r in out)


def test_remove_dup_spans_cuts_exactly_the_passage(spark):
    """Cleaned text keeps every token outside the spans in order: unique
    prefix survives, the shared passage disappears, a fully-duplicated
    doc cleans to '' (kept, not dropped), untouched docs round-trip."""
    from adtech_log_data_pipeline_spark.functions.dedup import remove_dup_spans

    passage = [f"p{i}" for i in range(25)]
    s = [f"s{i}" for i in range(20)]
    d0 = [f"a{i}" for i in range(5)] + passage
    d1 = passage + [f"b{i}" for i in range(3)]
    d2 = s + s
    d3 = [f"c{i}" for i in range(30)]
    corpus = [" ".join(d) for d in (d0, d1, d2, d3)]
    out = {
        r["doc_id"]: r for r in remove_dup_spans(docs(spark, corpus)).collect()
    }
    assert out[0]["clean_text"] == " ".join(f"a{i}" for i in range(5))
    assert out[0]["n_tokens_kept"] == 5 and out[0]["n_tokens"] == 30
    assert out[1]["clean_text"] == " ".join(f"b{i}" for i in range(3))
    assert (out[2]["clean_text"], out[2]["n_tokens_kept"]) == ("", 0)
    assert out[3]["clean_text"] == " ".join(d3) and out[3]["n_tokens_kept"] == 30


def test_quantize_embeddings_hand_values_and_roundtrip_bound(spark):
    """Hand-checked 7-bit codes for [1.0, -1.0, 0.5, 0.0] (amax=1e6):
    q = 127/0/95/64, dequant errors 0/0/3938/7874 micros; the error bound
    amax/127 + 1 holds per dim; the all-zero vector quantizes to zeros."""
    from adtech_log_data_pipeline_spark.functions.similarity import (
        embedding_quantize_audit,
        quantize_embeddings,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, -1.0, 0.5, 0.0], 0), (1, [0.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    q = {
        (r["vec_id"], r["dim"]): r
        for r in quantize_embeddings(emb).collect()
    }
    assert [q[(0, d)]["q"] for d in range(4)] == [127, 0, 95, 64]
    assert q[(0, 0)]["amax"] == 1_000_000
    assert [q[(1, d)]["q"] for d in range(2)] == [0, 0]
    a = {r["vec_id"]: r for r in embedding_quantize_audit(emb).collect()}
    assert a[0]["max_err"] == 7874 and a[0]["sum_err"] == 3938 + 7874
    assert a[0]["n_dims"] == 4
    assert (a[1]["amax"], a[1]["max_err"], a[1]["err_ppm"]) == (0, 0, 0)
    # bound: reconstruction error per dim <= amax/127 + 1
    assert a[0]["max_err"] <= a[0]["amax"] // 127 + 1


def test_dup_span_incoming_screens_against_index_only(spark, tmp_path):
    """Incremental span screen semantics: an incoming doc's passage hits
    when it exists in the INDEXED corpus or repeats within the batch —
    and never via other batch docs' unique text; the indexed-vs-recompute
    paths agree where both sides see the same corpus."""
    from adtech_log_data_pipeline_spark.functions.dedup import (
        build_span_index,
        dup_span_stats_incoming,
    )

    passage = [f"p{i}" for i in range(25)]
    existing = docs(spark, [" ".join(passage + [f"e{i}" for i in range(5)])])
    idx = str(tmp_path / "idx")
    build_span_index(existing, idx)
    s = [f"s{i}" for i in range(20)]
    incoming = docs(
        spark,
        [
            " ".join([f"a{i}" for i in range(3)] + passage),  # hits the index
            " ".join(s + s),  # within-batch self repeat
            " ".join(f"u{i}" for i in range(30)),  # clean
        ],
    )
    out = {
        r["doc_id"]: r
        for r in dup_span_stats_incoming(incoming, idx).collect()
    }
    assert (out[0]["n_spans"], out[0]["dup_tokens"]) == (1, 25)
    assert (out[1]["n_spans"], out[1]["dup_tokens"]) == (1, 40)
    assert (out[2]["n_spans"], out[2]["dup_tokens"], out[2]["dup_ppm"]) == (
        0,
        0,
        0,
    )


def test_update_dedup_index_equals_rebuild(spark, tmp_path):
    """Incremental index append == from-scratch rebuild over the union
    (no bucket near the cap on this corpus), and a batch screened
    against the UPDATED index now catches duplicates of the previously
    appended docs."""
    from pyspark.sql import functions as F

    from adtech_log_data_pipeline_spark.functions.dedup import (
        build_dedup_index,
        dedup_incoming_indexed,
        update_dedup_index,
    )
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    seed = docs.filter(F.col("doc_id") % 10 < 6)
    incr = docs.filter(F.col("doc_id") % 10 == 6)
    probe = docs.filter(F.col("doc_id") % 10 == 7)

    inc_dir = str(tmp_path / "incremental")
    build_dedup_index(seed, inc_dir)
    update_dedup_index(incr, inc_dir)
    full_dir = str(tmp_path / "rebuild")
    build_dedup_index(seed.unionByName(incr), full_dir)

    def rows(d):
        return {
            r["doc_id"]: (r["is_dup"], r["match_doc"], r["jaccard"])
            for r in dedup_incoming_indexed(probe, d).collect()
        }

    a, b = rows(inc_dir), rows(full_dir)
    assert a == b and len(a) > 0
    # the increment actually matters: screening against the seed alone
    # must differ somewhere (the synthetic corpus has dups across slots)
    seed_dir = str(tmp_path / "seedonly")
    build_dedup_index(seed, seed_dir)
    assert rows(seed_dir) != a
