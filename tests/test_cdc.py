"""CDC changelog-apply (MERGE) laws — operators/cdc.py.

Latest-wins upsert/delete semantics checked against a transparent
pure-Python dict replay, plus the algebraic laws a CDC consumer relies
on: identity (empty changelog), idempotence (reapplying the same batch),
and catch-up composition (A then B == A union B when B follows A).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from adtech_log_data_pipeline_spark.operators.cdc import (
    apply_changelog,
    latest_changes,
)

BASE_SCHEMA = "k bigint, val bigint, tag string"
CH_SCHEMA = "k bigint, val bigint, tag string, op string, seq bigint, uid bigint"


def _base(spark, rows):
    return spark.createDataFrame(rows, BASE_SCHEMA)


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _state(df):
    return {r["k"]: (r["val"], r["tag"]) for r in df.collect()}


def _python_replay(base_rows, change_rows):
    """Transparent reference: replay every change in (seq, uid) order."""
    state = {k: (v, t) for k, v, t in base_rows}
    for k, v, t, op, _seq, _uid in sorted(change_rows, key=lambda r: (r[4], r[5])):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (v, t)
    return state


def test_cdc_semantics_upsert_insert_delete(spark):
    base = _base(spark, [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")])
    ch = _ch(
        spark,
        [
            (2, 99, "B", "U", 5, 0),  # update existing
            (4, 40, "d", "U", 5, 1),  # insert new key
            (3, 0, "x", "D", 5, 2),  # delete existing
            (9, 0, "x", "D", 5, 3),  # delete absent key: no-op
        ],
    )
    out = _state(apply_changelog(base, ch, ["k"], ["seq", "uid"]))
    assert out == {1: (10, "a"), 2: (99, "B"), 4: (40, "d")}


def test_cdc_latest_wins_and_tiebreak(spark):
    base = _base(spark, [(1, 10, "a")])
    ch = _ch(
        spark,
        [
            (1, 11, "first", "U", 1, 0),
            (1, 12, "second", "U", 2, 0),
            (1, 13, "tie-lo", "U", 3, 1),
            (1, 14, "tie-hi", "U", 3, 2),  # same seq: uid breaks the tie
        ],
    )
    out = _state(apply_changelog(base, ch, ["k"], ["seq", "uid"]))
    assert out == {1: (14, "tie-hi")}
    # a trailing delete supersedes every earlier upsert
    ch2 = ch.unionByName(_ch(spark, [(1, 0, "x", "D", 9, 0)]))
    assert _state(apply_changelog(base, ch2, ["k"], ["seq", "uid"])) == {}


def test_cdc_identity_and_idempotence(spark):
    base = _base(spark, [(i, i * 10, "t") for i in range(8)])
    empty = _ch(spark, [])
    assert _state(apply_changelog(base, empty, ["k"], ["seq", "uid"])) == _state(
        base
    )
    ch = _ch(
        spark,
        [(2, 5, "u", "U", 1, 0), (3, 0, "x", "D", 1, 1), (11, 7, "n", "U", 1, 2)],
    )
    once = apply_changelog(base, ch, ["k"], ["seq", "uid"])
    twice = apply_changelog(once, ch, ["k"], ["seq", "uid"])
    assert _state(once) == _state(twice)


def test_cdc_catchup_composition_fuzz(spark):
    """apply(base, A ∪ B) == apply(apply(base, A), B) when every B seq
    follows every A seq — randomized over ops/keys with a fixed seed,
    checked against the pure-Python replay."""
    rng = random.Random(20260815)
    for trial in range(4):
        base_rows = [(k, rng.randrange(100), "b") for k in range(12)]
        mk = lambda seq_lo: [
            (
                rng.randrange(18),
                rng.randrange(100),
                rng.choice("xyz"),
                rng.choice(["U", "U", "D"]),
                seq_lo + i // 3,  # deliberate seq ties within the batch
                i,  # unique uid tiebreak
            )
            for i in range(rng.randrange(1, 25))
        ]
        a_rows, b_rows = mk(0), mk(1000)
        base = _base(spark, base_rows)
        seq = apply_changelog(
            apply_changelog(base, _ch(spark, a_rows), ["k"], ["seq", "uid"]),
            _ch(spark, b_rows),
            ["k"],
            ["seq", "uid"],
        )
        both = apply_changelog(
            base, _ch(spark, a_rows + b_rows), ["k"], ["seq", "uid"]
        )
        expect = _python_replay(base_rows, a_rows + b_rows)
        assert _state(seq) == _state(both) == expect, f"trial {trial}"


def test_latest_changes_one_row_per_key(spark):
    ch = _ch(
        spark,
        [(k, v, "t", "U", v, k * 100 + v) for k in range(5) for v in range(7)],
    )
    got = latest_changes(ch, ["k"], ["seq", "uid"]).collect()
    assert len(got) == 5 and all(r["val"] == 6 for r in got)


def test_cdc_cli_job(spark, tmp_path):
    """--job cdc end to end: parquet base + changelog in, merged
    snapshot parquet out."""
    from adtech_log_data_pipeline_spark.__main__ import main

    base = str(tmp_path / "base")
    ch = str(tmp_path / "ch")
    out = str(tmp_path / "out")
    _base(spark, [(1, 10, "a"), (2, 20, "b")]).write.parquet(base)
    _ch(spark, [(2, 99, "B", "U", 5, 0), (1, 0, "x", "D", 6, 1)]).write.parquet(ch)
    rc = main(
        [
            "--job", "cdc", "--input", base, "--against", ch,
            "--bucket-cols", "k", "--seq-cols", "seq,uid",
            "--output", out, "--master", "local[2]",
        ]
    )
    assert rc == 0
    got = _state(spark.read.parquet(out))
    assert got == {2: (99, "B")}


def test_cdc_null_op_is_upsert_not_silent_erase(spark):
    """A NULL op must apply as an upsert — the failure mode where the
    key is anti-joined out of base but the change row is also filtered
    (row vanishes) is pinned here."""
    base = _base(spark, [(1, 10, "a")])
    ch = spark.createDataFrame(
        [(1, 77, "n", None, 5, 0)], CH_SCHEMA
    )
    out = _state(apply_changelog(base, ch, ["k"], ["seq", "uid"]))
    assert out == {1: (77, "n")}
