"""Property tests for the three hand-rolled container formats
(tfrecord / SequenceFile / Avro OCF): encode->frame->parse must be the
identity over arbitrary keys, payloads, and integers — the law every
shard reader relies on when shards written by a failed-and-retried
task are re-read."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from commoncrawl_ray.sources.avro import iter_avro, write_avro_bytes
from commoncrawl_ray.sources.seqfile import iter_seqfile, write_seqfile_bytes
from commoncrawl_ray.sources.tfrecord import (
    encode_example,
    iter_tfrecord,
    parse_example,
    write_tfrecord_bytes,
)

int64_st = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)
text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)
bytes_st = st.binary(max_size=120)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(int64_st, bytes_st, text_st), max_size=12))
def test_tfrecord_roundtrip_property(rows):
    recs = [
        encode_example({"i": i, "b": b, "t": t}) for i, b, t in rows
    ]
    out = [
        parse_example(r) for r in iter_tfrecord(write_tfrecord_bytes(recs))
    ]
    assert out == [
        {"b": b, "i": [i], "t": t.encode("utf-8")} for i, b, t in rows
    ]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(text_st, bytes_st), max_size=15))
def test_seqfile_roundtrip_property(pairs):
    blob = write_seqfile_bytes("prop", pairs)
    assert list(iter_seqfile(blob)) == [(k, v) for k, v in pairs]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {"doc_id": int64_st, "text": text_st, "blob": bytes_st}
        ),
        max_size=15,
    ),
    st.sampled_from(["null", "deflate"]),
)
def test_avro_roundtrip_property(rows, codec):
    fields = [("doc_id", "long"), ("text", "string"), ("blob", "bytes")]
    blob = write_avro_bytes(iter(rows), fields, codec=codec, block_records=4)
    assert list(iter_avro(blob)) == rows
