"""Semantic contracts for the round-4 curation/quality operators:
token-budget mixture sampling, Zipf-frequency quality scoring, cross-doc
shingle duplication rate, and the audio chunk manifest."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from adtech_log_data_pipeline_spark.functions.multimodal import (
    AUDIO_CHUNK_MS,
    audio_chunk_manifest,
    with_blob_column,
)
from adtech_log_data_pipeline_spark.functions.text import (
    doc_quality_zipf,
    shingle_dup_rate,
    token_budget_mixture,
)
from adtech_log_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_token_budget_mixture_token_weighted(spark):
    """A long-doc source and a many-doc source with the SAME token mass get
    the SAME keep rate — the property per-doc stratification lacks."""
    rows = (
        # source a: 2 docs x 50 tokens = 100 tokens
        [(i, " ".join(f"w{j}" for j in range(50)), "a") for i in range(2)]
        # source b: 20 docs x 5 tokens = 100 tokens
        + [(100 + i, "x y z q r", "b") for i in range(20)]
    )
    out = token_budget_mixture(_docs(spark, rows), budget_pct=50)
    rates = {
        r["source"]: r["rate_ppm"]
        for r in out.select("source", "rate_ppm").distinct().collect()
    }
    # budget = 100 tokens, share = 50 per source, both sources hold 100
    # tokens -> identical rate ceil(50/100 * 1e6) = 500000
    assert rates.get("a") == rates.get("b") == 500_000 or (
        # one source may have no kept docs by hash luck; rate must still be
        # equal wherever it appears
        len(set(rates.values())) <= 1
    )


def test_token_budget_mixture_small_corpus_keeps_everything(spark):
    """budget_pct=100: every source's share covers its own mass only when
    sources are balanced; with one source the rate caps at keep-all."""
    rows = [(i, "a b c d", "only") for i in range(10)]
    out = token_budget_mixture(_docs(spark, rows), budget_pct=100)
    assert out.count() == 10
    assert out.select("rate_ppm").distinct().collect()[0][0] == 1_000_000


def test_token_budget_mixture_nested_under_rate_changes(spark):
    """Unlike stratified_sample, the keep RATE here is global-budget-
    dependent by design (another source growing grows the budget). The
    hash-threshold contract still guarantees NESTING: per source, when the
    rate moves, the kept set at the lower rate is a subset of the kept set
    at the higher rate — no membership churn beyond the rate delta. Also
    deterministic across runs."""
    docs = load_table(spark, SF, "documents")
    grown = docs.select(F.min("source")).first()[0]
    before = docs.filter(
        (F.col("source") != grown) | (F.col("doc_id") % 2 == 1)
    )

    def by_source(d):
        out: dict[str, tuple[int, set]] = {}
        for r in token_budget_mixture(d).collect():
            rate, kept = out.setdefault(r["source"], (r["rate_ppm"], set()))
            assert rate == r["rate_ppm"]
            kept.add(r["doc_id"])
        return out

    a, b = by_source(before), by_source(docs)
    for src in set(a) & set(b) - {grown}:
        (ra, ka), (rb, kb) = a[src], b[src]
        lo, hi = (ka, kb) if ra <= rb else (kb, ka)
        assert lo <= hi, f"{src}: kept set not nested under rate change"

    again = by_source(docs)
    assert {s: (r, frozenset(k)) for s, (r, k) in b.items()} == {
        s: (r, frozenset(k)) for s, (r, k) in again.items()
    }


def test_doc_quality_zipf_hand_computed(spark):
    """Corpus: 'the' x3 occurrences (bucket len(bin(3))=2), 'rare' x1
    (bucket 1). doc 0 = 'the the rare' -> sum 2+2+1=5, milli=(5*1000)//3."""
    rows = [(0, "the the rare", "s"), (1, "the", "s")]
    out = {r["doc_id"]: r for r in doc_quality_zipf(_docs(spark, rows)).collect()}
    assert out[0]["n_tokens"] == 3
    assert out[0]["sum_log2"] == 5
    assert out[0]["zipf_milli"] == (5 * 1000) // 3
    assert out[1]["sum_log2"] == 2  # 'the' appears 3x in corpus -> bucket 2
    assert out[1]["zipf_milli"] == 2000


def test_doc_quality_zipf_common_text_scores_higher(spark):
    """A doc of corpus-common tokens outscores a doc of hapaxes."""
    rows = [(i, "alpha beta gamma", "s") for i in range(9)] + [
        (100, "alpha beta gamma", "s"),
        (101, "qq ww ee", "s"),
    ]
    out = {r["doc_id"]: r["zipf_milli"] for r in doc_quality_zipf(_docs(spark, rows)).collect()}
    assert out[100] > out[101]


def test_shingle_dup_rate_shared_vs_unique(spark):
    """Two identical docs: every shingle duplicated (ppm=1e6); a disjoint
    doc: zero."""
    shared = " ".join(f"s{j}" for j in range(10))
    unique = " ".join(f"u{j}" for j in range(10))
    rows = [(0, shared, "s"), (1, shared, "s"), (2, unique, "s")]
    out = {r["doc_id"]: r for r in shingle_dup_rate(_docs(spark, rows)).collect()}
    assert out[0]["dup_ppm"] == 1_000_000 and out[1]["dup_ppm"] == 1_000_000
    assert out[2]["dup_ppm"] == 0
    assert out[2]["n_shingles"] == 8  # 10 tokens -> 8 distinct 3-grams


def test_shingle_dup_rate_counts_distinct_shingles(spark):
    """Repeated shingles inside ONE doc are not duplication; a doc that
    repeats itself but shares nothing cross-doc scores 0."""
    rows = [(0, "a b c a b c a b c", "s"), (1, "x y z w", "s")]
    out = {r["doc_id"]: r for r in shingle_dup_rate(_docs(spark, rows)).collect()}
    assert out[0]["dup_ppm"] == 0
    assert out[0]["n_shingles"] == 3  # distinct: 'a b c','b c a','c a b'


def test_cross_source_overlap_matrix(spark):
    """Sources a/b share their one shingle set exactly (jaccard 1e6);
    source c is disjoint from both (no pair row emitted)."""
    from adtech_log_data_pipeline_spark.functions.text import cross_source_overlap

    shared = "one two three four"  # shingles: {one two three, two three four}
    rows = [
        (0, shared, "a"),
        (1, shared, "b"),
        (2, "five six seven eight", "c"),
    ]
    out = {
        (r["source_a"], r["source_b"]): r
        for r in cross_source_overlap(_docs(spark, rows)).collect()
    }
    assert set(out) == {("a", "b")}
    ab = out[("a", "b")]
    assert ab["shared_shingles"] == 2
    assert ab["a_shingles"] == 2 and ab["b_shingles"] == 2
    assert ab["jaccard_ppm"] == 1_000_000


def test_cross_source_overlap_partial(spark):
    from adtech_log_data_pipeline_spark.functions.text import cross_source_overlap

    rows = [
        (0, "x y z w", "a"),   # shingles {x y z, y z w}
        (1, "x y z", "b"),     # shingles {x y z}
    ]
    out = cross_source_overlap(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # shared 1, union 2 -> 500000 ppm
    assert r["shared_shingles"] == 1 and r["jaccard_ppm"] == 500_000


def test_audio_chunks_tile_duration(spark):
    docs = load_table(spark, SF, "documents").limit(20)
    out = audio_chunk_manifest(with_blob_column(docs))
    rows = out.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        h = hashlib.md5(src[doc_id].encode()).hexdigest()
        duration = 1000 + int(h[10:16], 16) % 600_000
        assert all(r["duration_ms"] == duration for r in chunks)
        n = (duration + AUDIO_CHUNK_MS - 1) // AUDIO_CHUNK_MS
        assert [r["chunk_idx"] for r in chunks] == list(range(n))
        # chunks tile [0, duration): contiguous, last ends exactly at end
        assert chunks[0]["chunk_start_ms"] == 0
        for a, b in zip(chunks, chunks[1:]):
            assert a["chunk_end_ms"] == b["chunk_start_ms"]
        assert chunks[-1]["chunk_end_ms"] == duration


def test_doc_chunks_overlap_and_counts(spark):
    """150 tokens, chunk=64, overlap=16 (stride 48): 3 chunks starting at
    0/48/96; adjacent chunks share exactly 16 tokens; last is short."""
    from adtech_log_data_pipeline_spark.functions.text import doc_chunks

    text = " ".join(f"w{i}" for i in range(150))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        doc_chunks(docs).collect(), key=lambda r: r["chunk_id"]
    )
    assert [(r["chunk_id"], r["chunk_start"], r["n_chunk_tokens"]) for r in rows] == [
        (0, 0, 64),
        (1, 48, 64),
        (2, 96, 54),
    ]
    # overlap: chunk 1 starts at token 48, chunk 0 covers 0..63 -> 16 shared
    assert rows[0]["chunk_start"] + 64 - rows[1]["chunk_start"] == 16


def test_doc_chunks_short_and_empty_docs_emit_one_chunk(spark):
    from adtech_log_data_pipeline_spark.functions.text import doc_chunks

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in doc_chunks(docs).collect()}
    assert len(rows) == 2
    assert rows[1]["chunk_id"] == 0 and rows[1]["n_chunk_tokens"] == 3
    # empty text tokenizes to [''] (split convention) -> one 1-token chunk
    assert rows[2]["chunk_id"] == 0 and rows[2]["n_chunk_tokens"] == 1


def test_doc_chunks_no_trailing_contained_chunk(spark):
    """n=70 with stride 48: ceildiv(70-16, 48) = 2 chunks — the second
    covers 48..69; a third would be fully inside the second."""
    from adtech_log_data_pipeline_spark.functions.text import doc_chunks

    text = " ".join(f"w{i}" for i in range(70))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = doc_chunks(docs).collect()
    assert len(rows) == 2
    assert {r["n_chunk_tokens"] for r in rows} == {64, 22}


def test_table_profile_metrics(spark):
    """Null counts, exact cardinalities, numeric value bounds, string
    LENGTH bounds — one row per column."""
    from adtech_log_data_pipeline_spark.functions.profile import table_profile

    df = spark.createDataFrame(
        [(1, "ab", 10.5), (2, None, 3.25), (2, "xyzw", None)],
        "id long, s string, v double",
    )
    out = {r["col"]: r for r in table_profile(df).collect()}
    assert set(out) == {"id", "s", "v"}
    assert all(r["n_rows"] == 3 for r in out.values())
    assert out["id"]["n_nulls"] == 0 and out["id"]["n_distinct"] == 2
    assert out["id"]["min_val"] == 1 and out["id"]["max_val"] == 2
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_val"] == 2 and out["s"]["max_val"] == 4  # lengths
    assert out["v"]["n_nulls"] == 1
    assert out["v"]["min_val"] == 3 and out["v"]["max_val"] == 10  # bigint cast


def test_table_profile_handles_every_column_type(spark):
    """The CLI exposes the profile over arbitrary parquet; no schema may
    fail it (round-4 advice: a date column crashed it). Date -> epoch-day
    bounds, timestamp -> epoch-milli bounds, boolean -> 0/1 bounds;
    array/map still get null/cardinality metrics with NULL bounds."""
    import datetime

    from adtech_log_data_pipeline_spark.functions.profile import table_profile

    df = spark.createDataFrame(
        [
            (
                datetime.date(1970, 1, 3),
                datetime.datetime(1970, 1, 1, 0, 0, 1),
                True,
                [1, 2],
                {"a": 1},
            ),
            (datetime.date(1970, 1, 11), None, False, [3], None),
        ],
        "d date, ts timestamp, b boolean, arr array<int>, m map<string,int>",
    )
    out = {r["col"]: r for r in table_profile(df).collect()}
    assert out["d"]["min_val"] == 2 and out["d"]["max_val"] == 10
    assert out["ts"]["n_nulls"] == 1 and out["ts"]["min_val"] == 1000
    assert out["b"]["min_val"] == 0 and out["b"]["max_val"] == 1
    assert out["arr"]["n_distinct"] == 2
    assert out["arr"]["min_val"] is None and out["arr"]["max_val"] is None
    assert out["m"]["n_nulls"] == 1 and out["m"]["n_distinct"] is None
    # the gated real-table instantiations: orders has a date column
    for t in ("orders", "events"):
        prof = table_profile(
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        )
        assert prof.count() > 0


def test_table_profile_approx_distinct_mode(spark):
    """approx_distinct=True swaps exact countDistinct for HLL++: same
    report shape, estimates within HLL's default 5% rsd."""
    from adtech_log_data_pipeline_spark.functions.profile import table_profile

    df = spark.range(0, 5000).selectExpr("id", "cast(id % 137 as string) as s")
    exact = {r["col"]: r for r in table_profile(df).collect()}
    approx = {r["col"]: r for r in table_profile(df, approx_distinct=True).collect()}
    assert set(approx) == set(exact)
    for c in exact:
        e, a = exact[c]["n_distinct"], approx[c]["n_distinct"]
        assert abs(a - e) <= max(2, 0.1 * e)
        assert approx[c]["min_val"] == exact[c]["min_val"]


def test_table_profile_ntz_bounds_are_timezone_free(spark):
    """TimestampNTZ bounds must not depend on spark.sql.session.timeZone
    (round-5 advice: the cast('timestamp') route did — the vanilla driver
    session has no timezone pin). Epoch millis come from the stored local
    fields: identical under any session zone, and exact to the milli."""
    from adtech_log_data_pipeline_spark.functions.profile import table_profile

    df = spark.sql(
        "SELECT * FROM VALUES (timestamp_ntz'1970-01-02 03:04:05.678'),"
        " (timestamp_ntz'1970-01-05 00:00:00'), (CAST(NULL AS timestamp_ntz))"
        " AS t(tns)"
    )
    expect_min = 86400000 + 3 * 3600000 + 4 * 60000 + 5678
    expect_max = 4 * 86400000
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        bounds = []
        for tz in ("UTC", "Asia/Kathmandu", "America/Los_Angeles"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            row = table_profile(df).collect()[0]
            bounds.append((row["min_val"], row["max_val"], row["n_nulls"]))
        assert bounds == [(expect_min, expect_max, 1)] * 3
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_script_mix_counts_and_ratio_laws(spark):
    """script_mix laws on a hand-built matrix: every class count is the
    exact character tally, counts never exceed the length, the ASCII
    ratio is in [0,1] (NULL for empty text), and multi-byte unicode
    counts by CODE POINT (length semantics, matching the oracle)."""
    from adtech_log_data_pipeline_spark.functions.text import script_mix

    rows = [
        (1, "Abc 123\n"),        # 3 alpha (1 upper), 3 digits, 1 space + 1 \n
        (2, "日本語テキスト"),      # 7 non-ascii code points, nothing else
        (3, ""),                 # empty -> NULL ratio
        (4, "a\tb\rc"),          # tab + CR are whitespace
        (5, "½ öff"),            # mixed: 3 non-ascii (½ ö and?) -> compute
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in script_mix(docs).collect()}

    r1 = out[1]
    assert r1["n_chars_m"] == 8
    assert r1["n_non_ascii"] == 0
    assert r1["n_digits"] == 3
    assert r1["n_upper"] == 1
    assert r1["n_ws"] == 2
    assert r1["ascii_ratio"] == 1.0

    r2 = out[2]
    assert r2["n_chars_m"] == 7 and r2["n_non_ascii"] == 7
    assert r2["ascii_ratio"] == 0.0

    assert out[3]["n_chars_m"] == 0 and out[3]["ascii_ratio"] is None

    assert out[4]["n_ws"] == 2

    r5 = out[5]
    # "½ öff": 5 code points, non-ascii = ½ and ö
    assert r5["n_chars_m"] == 5 and r5["n_non_ascii"] == 2
    assert abs(r5["ascii_ratio"] - 3 / 5) < 1e-12
    for r in out.values():
        for c in ("n_non_ascii", "n_digits", "n_upper", "n_ws"):
            assert 0 <= r[c] <= r["n_chars_m"]


def test_bm25_matches_pure_python_integer_replay(spark):
    """bm25_topk == an independent pure-Python replay of the integer-exact
    formula (bucketed idf via bit_length, rational tf saturation, bigint
    contributions) on a hand-sized corpus — plus the contract details:
    only query terms score, ties rank by doc_id, k bounds the output."""
    from adtech_log_data_pipeline_spark.functions.text import bm25_topk

    docs = [
        (1, "spark join query window stream spark spark"),
        (2, "join join join filler filler filler filler filler"),
        (3, "nothing relevant here at all whatsoever truly"),
        (4, "spark stream stream stream window"),
        (5, "query"),
        (6, "spark join query window stream"),  # all five terms once
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r["doc_id"], r["n_hits"], r["score"], r["rank"])
        for r in bm25_topk(df, k=4).collect()
    ]

    # pure-Python replay
    toks = {d: t.lower().split() for d, t in docs}
    dl = {d: len(t) for d, t in toks.items()}
    T = sum(dl.values())
    N = len(docs)
    Q = sorted({"spark", "join", "query", "window", "stream"})
    tf = {}
    for d, ts in toks.items():
        for t in ts:
            if t in Q:
                tf[(d, t)] = tf.get((d, t), 0) + 1
    dfreq = {}
    for (d, t) in tf:
        dfreq[t] = dfreq.get(t, 0) + 1
    score = {}
    hits = {}
    for (d, t), f in tf.items():
        idf = ((2 * N + 2) // (2 * dfreq[t] + 1)).bit_length() - 1
        tfp = (44 * f * T * 1_000_000) // (20 * f * T + 6 * T + 18 * dl[d] * N)
        score[d] = score.get(d, 0) + idf * tfp
        hits[d] = hits.get(d, 0) + 1
    ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    want = [
        (d, hits[d], s, i + 1) for i, (d, s) in enumerate(ranked)
    ]
    assert sorted(got) == sorted(want)
    assert len(got) == 4  # k bounds output; doc 3 (no hits) never appears
    assert all(d != 3 for d, *_ in got)
