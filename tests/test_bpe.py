"""Distributed BPE merge learning (functions/bpe.py) vs a transparent
pure-Python BPE reference (Sennrich-style: pair counts over the
word-frequency table, greedy left-to-right merge application)."""

import re
from collections import Counter

from adtech_log_data_pipeline_spark.functions.bpe import END_MARK


def _py_word_freq(texts):
    wf = Counter()
    for t in texts:
        for w in re.split(r"[^A-Za-z]+", t):
            if w:
                wf[w.lower()] += 1
    return wf


def _py_merge(sym, x, y):
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == x and sym[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _py_bpe(texts, k):
    wf = _py_word_freq(texts)
    vocab = {w: list(w) + [END_MARK] for w in wf}
    rules = []
    for r in range(1, k + 1):
        pc = Counter()
        for w, cnt in wf.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += cnt
        if not pc:
            break
        # count DESC, pair ASC — the engines' shared tiebreak
        (x, y), total = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        rules.append((r, x, y, total))
        vocab = {w: _py_merge(s, x, y) for w, s in vocab.items()}
    return rules


def _spark_bpe(spark, texts, k):
    from adtech_log_data_pipeline_spark.functions.bpe import bpe_merge_rules

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = bpe_merge_rules(docs, k=k).collect()
    return sorted(
        (r["round"], r["x"], r["y"], r["pair_count"]) for r in rows
    )


def test_matches_python_reference_simple(spark):
    texts = [
        "the theme of the thesis", "then they gathered there",
        "a theory of everything", "the the the",
    ]
    assert _spark_bpe(spark, texts, 6) == _py_bpe(texts, 6)


def test_overlapping_same_symbol_runs(spark):
    """aaaa-style runs: pair (a,a) counts every adjacent position but
    greedy merging takes every OTHER one — the case separating exact BPE
    from naive string replace."""
    texts = ["aaaa aaaa aaa baaab", "aaaa zzz zzz zzzz"]
    assert _spark_bpe(spark, texts, 5) == _py_bpe(texts, 5)


def test_merged_symbols_keep_merging_and_ties_break_lexically(spark):
    # "ab" x3 and "cd" x3: (a,b), (c,d), (b,</w>), (d,</w>) all tie at 3
    # — the lexically smallest pair must win round 1 in both engines
    texts = ["ab ab ab", "cd cd cd"]
    got = _spark_bpe(spark, texts, 3)
    assert got == _py_bpe(texts, 3)
    r1 = [g for g in got if g[0] == 1][0]
    assert (r1[1], r1[2], r1[3]) == ("a", "b", 3)


def test_non_ascii_and_punctuation_are_boundaries(spark):
    texts = ["héllo héllo wörld", "hello-world hello_world"]
    assert _spark_bpe(spark, texts, 4) == _py_bpe(texts, 4)


def _py_encode_stats(texts, sources, k):
    """Per-source (n_words, n_symbols_init, n_tokens) via the Python BPE."""
    wf = _py_word_freq(texts)
    vocab = {w: list(w) + [END_MARK] for w in wf}
    for _r, x, y, _c in _py_bpe(texts, k):
        vocab = {w: _py_merge(s, x, y) for w, s in vocab.items()}
    out = {}
    for t, src in zip(texts, sources):
        for w0 in re.split(r"[^A-Za-z]+", t):
            if not w0:
                continue
            w = w0.lower()
            nw, ns, nt = out.get(src, (0, 0, 0))
            out[src] = (nw + 1, ns + len(w) + 1, nt + len(vocab[w]))
    return out


def test_encode_stats_matches_python_reference(spark):
    from adtech_log_data_pipeline_spark.functions.bpe import bpe_encode_stats

    texts = [
        "the theme of the thesis", "then they gathered there",
        "a theory of everything", "the the the", "aaaa baaab theory",
    ]
    sources = ["web", "web", "book", "book", "web"]
    docs = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(zip(texts, sources))],
        "doc_id long, text string, source string",
    )
    rows = bpe_encode_stats(docs, k=5).collect()
    got = {
        r["source"]: (r["n_words"], r["n_symbols_init"], r["n_tokens_bpe"])
        for r in rows
    }
    assert got == _py_encode_stats(texts, sources, 5)
    # merges only ever shrink the encoding
    assert all(r["n_tokens_bpe"] <= r["n_symbols_init"] for r in rows)


def test_encode_stats_zero_merges_is_identity(spark):
    from adtech_log_data_pipeline_spark.functions.bpe import bpe_encode_stats

    docs = spark.createDataFrame(
        [(0, "ab abc", "s")], "doc_id long, text string, source string"
    )
    row = bpe_encode_stats(docs, k=0).collect()[0]
    # symbols = chars + end mark per word: (2+1) + (3+1) = 7
    assert (row["n_words"], row["n_symbols_init"], row["n_tokens_bpe"]) == (2, 7, 7)
