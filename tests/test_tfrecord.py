"""TFRecord wire-format kernels: CRC-32C check value, a HAND-DERIVED
proto golden (written as a literal, independent of the encoder),
framing round-trips, corruption detection, and the Ray shard
write->read cycle."""

from __future__ import annotations

import pyarrow as pa
import pytest

from commoncrawl_ray.sources.tfrecord import (
    crc32c,
    encode_example,
    iter_tfrecord,
    parse_example,
    write_tfrecord_bytes,
)


def test_crc32c_check_value():
    # the standard CRC-32C check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_example_golden_bytes():
    # hand-derived from the protobuf wire rules + example.proto layout:
    # Example{features{feature{"a": bytes_list["hi"],
    #                          "n": int64_list[3] (packed)}}}
    golden = bytes.fromhex(
        "0a190a0b0a016112060a040a0268690a0a0a016e12051a030a0103"
    )
    assert encode_example({"a": b"hi", "n": [3]}) == golden
    assert parse_example(golden) == {"a": b"hi", "n": [3]}


def test_example_roundtrip_kinds():
    feats = {
        "neg": -5,  # int64 two's complement (10-byte varint)
        "big": [(1 << 62), 0, -1],
        "txt": "héllo",  # str -> utf-8 bytes_list
        "raw": b"\x00\xff",
        "empty": b"",
    }
    ex = parse_example(encode_example(feats))
    assert ex["neg"] == [-5]
    assert ex["big"] == [1 << 62, 0, -1]
    assert ex["txt"] == "héllo".encode("utf-8")
    assert ex["raw"] == b"\x00\xff"
    assert ex["empty"] == b""


def test_framing_roundtrip_and_crc_detection():
    recs = [encode_example({"i": n}) for n in range(5)]
    blob = write_tfrecord_bytes(recs)
    assert list(iter_tfrecord(blob)) == recs
    # flip one payload byte -> data crc mismatch
    bad = bytearray(blob)
    bad[13] ^= 0x40
    with pytest.raises(ValueError):
        list(iter_tfrecord(bytes(bad)))
    # truncate mid-record -> loud failure, never silent partial data
    with pytest.raises(ValueError):
        list(iter_tfrecord(blob[: len(blob) - 2]))


def test_ray_shard_roundtrip(ray_session, tmp_path):
    import ray as _ray

    from commoncrawl_ray.sources.tfrecord import read_tfrecord, write_tfrecord

    t = pa.table(
        {
            "doc_id": pa.array([7, 8, 9], pa.int64()),
            "text": pa.array(["a b", "", "ζω"], pa.string()),
        }
    )
    out = str(tmp_path / "shards")
    manifest = write_tfrecord(
        _ray.data.from_arrow(t).repartition(2), out
    ).take_all()
    assert sum(m["records"] for m in manifest) == 3
    back = read_tfrecord(out, int64_cols=("doc_id",), bytes_cols=("text",))
    rows = sorted((r["doc_id"], r["text"]) for r in back.take_all())
    assert rows == [(7, "a b"), (8, ""), (9, "ζω")]
