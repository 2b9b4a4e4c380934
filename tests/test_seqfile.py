"""Hadoop SequenceFile kernels: vint parity with the Hadoop spec,
header/sync framing round-trips, corruption detection, and the Ray
shard write->read cycle."""

from __future__ import annotations

import struct

import pyarrow as pa
import pytest

from commoncrawl_ray.sources.seqfile import (
    iter_seqfile,
    read_vint,
    write_seqfile_bytes,
    write_vint,
)


def test_vint_hadoop_encodings():
    # single-byte range
    assert write_vint(0) == b"\x00"
    assert write_vint(127) == b"\x7f"
    assert write_vint(-112) == struct.pack("b", -112)
    # multi-byte spot values per WritableUtils semantics
    assert write_vint(128).hex() == "8f80"  # prefix -113, one byte
    assert write_vint(-129).hex() == "8780"  # prefix -121, ~(-129)=128
    for v in (0, 1, -1, 127, -112, 128, 255, 65535, 1 << 31, 1 << 62, -(1 << 40)):
        r, p = read_vint(write_vint(v), 0)
        assert r == v and p == len(write_vint(v))


def test_seqfile_header_and_roundtrip():
    recs = [("url:0", b"abc"), ("url:1", b""), ("url:2", b"\x00\xff" * 10)]
    blob = write_seqfile_bytes("shard", recs)
    assert blob[:4] == b"SEQ\x06"
    assert b"org.apache.hadoop.io.Text" in blob[:64]
    assert b"org.apache.hadoop.io.BytesWritable" in blob[:96]
    assert list(iter_seqfile(blob)) == recs


def test_seqfile_sync_escapes_and_detection():
    # >2000 bytes forces sync escapes between records
    recs = [(f"k{i}", bytes([i % 251]) * 300) for i in range(20)]
    blob = write_seqfile_bytes("s", recs)
    assert struct.pack(">i", -1) in blob  # at least one escape emitted
    assert list(iter_seqfile(blob)) == recs
    # corrupt one sync byte -> loud failure
    idx = blob.index(struct.pack(">i", -1))
    bad = bytearray(blob)
    bad[idx + 5] ^= 1
    with pytest.raises(ValueError):
        list(iter_seqfile(bytes(bad)))
    # bad magic
    with pytest.raises(ValueError):
        list(iter_seqfile(b"NOPE" + blob[4:]))


def test_ray_seqfile_roundtrip(ray_session, tmp_path):
    import ray as _ray

    from commoncrawl_ray.sources.seqfile import read_seqfile, write_seqfile

    t = pa.table(
        {
            "k": pa.array(["a", "b", "c"], pa.string()),
            "text": pa.array(["x y", "", "ζ"], pa.string()),
        }
    )
    out = str(tmp_path / "seq")
    manifest = write_seqfile(
        _ray.data.from_arrow(t).repartition(2), out, key_col="k", value_col="text"
    ).take_all()
    assert sum(m["records"] for m in manifest) == 3
    rows = sorted(
        (r["key"], r["value"]) for r in read_seqfile(out).take_all()
    )
    assert rows == [("a", b"x y"), ("b", b""), ("c", "ζ".encode())]
