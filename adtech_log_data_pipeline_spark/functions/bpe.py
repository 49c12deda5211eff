"""Distributed BPE vocabulary induction — byte-pair-encoding merge-rule
learning (Sennrich et al. 2016) over the corpus, the tokenizer-training
step of an LLM data pipeline (SURVEY §2.6 engine-added capability; the
text suite's token counting uses a fixed BPE-ish regex — this LEARNS the
merges).

The classic at-scale formulation: BPE never iterates over the corpus —
it iterates over the WORD-FREQUENCY table (vocabulary-sized, bounded by
Heaps' law), with every pair count weighted by the word's corpus
frequency. One corpus pass builds the word-freq relation; each of the K
merge rounds is then

  1. adjacent-pair counts: explode each word's symbol sequence into its
     (sym[i], sym[i+1]) positions, weight by word count, hash-aggregate;
  2. the winning pair: a 1-row TakeOrdered (count DESC, pair ASC — the
     deterministic tiebreak both engines share);
  3. merge application: EXACT greedy left-to-right non-overlapping
     replacement of the pair inside every word's symbol array — a pure
     JVM ``aggregate`` lambda with (out, pending) state, no Python, no
     regex-boundary hazards.

Each round's relation is eagerly held: round r's symbols feed BOTH the
pair count and the next rewrite, and without materialization the lineage
would re-execute exponentially (the same hazard bounded_shortest_path
documents). K caches of a vocab-sized relation is the entire memory
footprint.

Words are restricted to pure-ASCII letter runs before lower() so the
char-level symbol alphabet is engine-portable (unicode lower() is not).
The DuckDB oracle (plans/northstar.py::_oracle_bpe) restates all K
rounds as chained CTEs: pair counts via per-position unnest, and each
round's merge applied with the chr(1) double-separator replace()
encoding — symbols joined on chr(1)||chr(1), the winning pair rewritten
by one replace() over that string (the doubled separator makes matches
non-overlapping, reproducing the greedy left-to-right scan), then
re-split. Independent of the DataFrame-side per-position lambda.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BPE_ROUNDS = 8
END_MARK = "</w>"


def word_freq(documents: DataFrame) -> DataFrame:
    """(w, cnt): pure-ASCII letter words of the corpus, lowercased, with
    corpus frequencies. One corpus pass; vocabulary-sized output."""
    return (
        documents.select(
            F.explode(F.split(F.col("text"), "[^A-Za-z]+")).alias("w0")
        )
        .filter(F.col("w0") != "")
        .select(F.lower("w0").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_expr(x_col: str, y_col: str) -> str:
    """Greedy left-to-right non-overlapping merge of (x, y) -> x||y over
    the symbol array `s` — an aggregate lambda with (out, pending) state:
    pending holds the last unmerged symbol; a (pending, current) match
    flushes the merged token and clears pending."""
    return f"""
aggregate(
  s,
  named_struct('out', cast(array() as array<string>),
               'pend', cast(null as string)),
  (acc, ch) -> CASE
    WHEN acc.pend IS NOT NULL AND acc.pend = {x_col} AND ch = {y_col}
      THEN named_struct('out',
                        array_append(acc.out, concat({x_col}, {y_col})),
                        'pend', cast(null as string))
    ELSE named_struct('out',
      CASE WHEN acc.pend IS NULL THEN acc.out
           ELSE array_append(acc.out, acc.pend) END, 'pend', ch)
  END,
  acc -> CASE WHEN acc.pend IS NULL THEN acc.out
              ELSE array_append(acc.out, acc.pend) END)
"""


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _bpe_rounds(
    documents: DataFrame, k: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run ``k`` BPE merge rounds; return (rules, final symbol table).

    The final table is (w, cnt, s) — every DISTINCT corpus word with its
    symbol array after all k merges (vocabulary-sized, never corpus-
    sized). Deterministic: ties break (count DESC, x ASC, y ASC).

    Driver state is the kmeans_centroids convention: each round's winning
    PAIR (one row — the per-round model state, never corpus data) is
    collected and re-enters the next round's rewrite as a literal. This
    keeps the symbol relation's lineage LINEAR in k: a held-DataFrame
    formulation (pair argmax AND next rewrite both referencing round
    r-1's relation) doubles the logical plan per round, and analysis cost
    alone goes exponential by round ~6 — plan growth, not execution, is
    the iterative-operator hazard (bounded_shortest_path documents the
    execution-side twin). The symbol relation itself stays distributed
    and is re-held every round; rounds are k x (one TakeOrdered job + one
    map-side rewrite)."""
    from ._cache import hold

    wf = word_freq(documents)
    # LAZY holds (round-13 optimization): each round's symbol table has
    # exactly one FIRST consumer — the pair-count TakeOrdered action —
    # which populates the cache as a side effect; the next round's
    # rewrite then reads the cache. An eager count per round doubled the
    # action count (2k+1 jobs -> k+1) for zero shared-consumer benefit
    # (consumers here are strictly serial, never racing in one job).
    cur = hold(
        wf.select(
            "w",
            "cnt",
            F.expr(
                "array_append(transform(sequence(1, length(w)),"
                f" i -> substring(w, i, 1)), '{END_MARK}')"
            ).alias("s"),
        )
    )
    rules: list[tuple[int, str, str, int]] = []
    for r in range(1, int(k) + 1):
        pairs = (
            cur.select(
                "cnt",
                F.explode(
                    # guard: a fully-merged word (one symbol) has no pairs,
                    # and sequence(1, 0) would DESCEND into s[1] (0-based
                    # brackets) — emit no rows instead
                    F.expr(
                        "CASE WHEN size(s) < 2 THEN"
                        " cast(array() as array<struct<x string, y string>>)"
                        " ELSE transform(sequence(1, size(s) - 1),"
                        " i -> struct(s[i - 1] AS x, s[i] AS y)) END"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("cnt").alias("pair_count"))
        )
        top = pairs.orderBy(
            F.col("pair_count").desc(), F.col("x"), F.col("y")
        ).limit(1).collect()
        if not top:
            break
        x, y, cnt = top[0]["x"], top[0]["y"], int(top[0]["pair_count"])
        rules.append((r, x, y, cnt))
        cur = hold(
            cur.select(
                "w",
                "cnt",
                F.expr(_merge_expr(_sql_str(x), _sql_str(y))).alias("s"),
            )
        )
    return rules, cur


def bpe_merge_rules(
    documents: DataFrame, k: int = BPE_ROUNDS
) -> DataFrame:
    """Learn the first ``k`` BPE merge rules (see _bpe_rounds). Output:
    one row per round — (round int, x, y, pair_count bigint): the merged
    pair and its corpus-weighted adjacency count at selection time."""
    rules, _final = _bpe_rounds(documents, int(k))
    return documents.sparkSession.createDataFrame(
        rules, "round int, x string, y string, pair_count long"
    )


def bpe_encode_stats(documents: DataFrame, k: int = BPE_ROUNDS) -> DataFrame:
    """APPLY the learned merges — the tokenizer's corpus-encoding path.
    Each DISTINCT word is encoded exactly once (the k-merge symbol table
    is vocabulary-sized), then the corpus rolls up per source by joining
    word occurrences to their piece counts: total BPE tokens, plus the
    pre-merge symbol count (chars + the end-of-word marker) so the
    compression the merges bought is visible. The end marker counts as a
    piece until a merge absorbs it — standard end-marked BPE.

    Scale shape: one corpus pass to word occurrences, one join keyed on
    the word against the vocab-sized piece table (broadcastable for real
    vocabularies), one hash agg. Output per source: (source, n_words,
    n_symbols_init, n_tokens_bpe)."""
    _rules, final = _bpe_rounds(documents, int(k))
    pieces = final.select("w", F.size("s").cast("long").alias("n_pieces"))
    occ = (
        documents.select(
            "source", F.explode(F.split(F.col("text"), "[^A-Za-z]+")).alias("w0")
        )
        .filter(F.col("w0") != "")
        .select("source", F.lower("w0").alias("w"))
    )
    return (
        occ.join(pieces, "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w") + 1).alias("n_symbols_init"),
            F.sum("n_pieces").alias("n_tokens_bpe"),
        )
    )
