"""tf.train.Example codec laws + the TFRecord-shard export roundtrip."""

import hypothesis.strategies as st
from hypothesis import given, settings

from adtech_log_data_pipeline_spark.sources.tfexample import (
    export_tfrecord_examples,
    make_example,
    parse_example,
    read_tfrecord_examples,
)

SF = "/root/testdata/sf0.001"


def test_example_roundtrip_typed_features():
    payload = make_example(
        {
            "ints": [1, -2, 3_000_000_000],
            "floats": [0.5, -1.25],  # exactly representable in float32
            "text": "héllo",
            "raw": b"\x00\xff",
            "empty": [],
        }
    )
    f = parse_example(payload)
    assert f["ints"] == [1, -2, 3_000_000_000]
    assert f["floats"] == [0.5, -1.25]
    assert f["text"] == ["héllo".encode()]
    assert f["raw"] == [b"\x00\xff"]
    assert f["empty"] == []


def test_example_roundtrip_fuzz():
    """Random feature maps survive encode -> parse; serialization is
    deterministic (name-sorted features, packed lists)."""

    feat = st.one_of(
        st.lists(st.integers(-(2**62), 2**62), max_size=6),
        st.lists(st.binary(max_size=12), max_size=4),
        st.text(max_size=8),
    )

    @settings(max_examples=40, deadline=None)
    @given(fmap=st.dictionaries(st.text(min_size=1, max_size=6), feat, max_size=5))
    def law(fmap):
        a = make_example(fmap)
        b = make_example(dict(reversed(list(fmap.items()))))
        assert a == b  # insertion-order-independent (deterministic wire)
        parsed = parse_example(a)
        for k, v in fmap.items():
            vals = v if isinstance(v, list) else [v]
            if not vals:
                assert parsed[k] == []
            elif isinstance(vals[0], int):
                assert parsed[k] == vals
            elif isinstance(vals[0], bytes):
                assert parsed[k] == vals
            else:  # str feature
                assert parsed[k] == [x.encode() for x in ([v] if isinstance(v, str) else v)]

    law()


def test_unknown_fields_skipped():
    """proto3 tolerance: an Example with extra unknown fields still
    parses (forward compatibility with richer writers)."""
    from adtech_log_data_pipeline_spark.sources.protowire import (
        _write_varint,
    )

    base = bytearray(make_example({"a": 7}))
    # append unknown field number 9, length-delimited
    _write_varint(base, 9 << 3 | 2)
    _write_varint(base, 3)
    base += b"xyz"
    assert parse_example(bytes(base))["a"] == [7]


def test_export_and_read_roundtrip_spark(spark, tmp_path):
    """documents -> Example TFRecord(gzip) shards -> read back: frames
    are row-identical (the full S1/S4 interchange loop through our own
    framing, wire codec, and Arrow batch plumbing)."""
    from adtech_log_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "shards")
    n = export_tfrecord_examples(docs, out)
    assert n == docs.count()

    back = read_tfrecord_examples(spark, f"{out}/part-*.tfrecord.gz")
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    assert back.count() == n
    assert back.select(cols).exceptAll(docs.select(cols)).count() == 0
    assert docs.select(cols).exceptAll(back.select(cols)).count() == 0
