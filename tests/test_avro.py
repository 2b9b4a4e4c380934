"""Avro OCF kernels: zigzag spec examples, null/deflate round-trips,
sync corruption detection, and the Ray shard write->read cycle."""

from __future__ import annotations

import pyarrow as pa
import pytest

from commoncrawl_ray.sources.avro import (
    iter_avro,
    write_avro_bytes,
    zigzag_decode,
    zigzag_encode,
)

FIELDS = [("doc_id", "long"), ("text", "string"), ("blob", "bytes")]


def test_zigzag_spec_examples():
    # the Avro spec's own table
    for v, hx in (
        (0, "00"), (-1, "01"), (1, "02"), (-2, "03"),
        (2, "04"), (-64, "7f"), (64, "8001"),
    ):
        assert zigzag_encode(v).hex() == hx
        r, p = zigzag_decode(bytes.fromhex(hx), 0)
        assert r == v and p == len(hx) // 2
    for v in (1 << 62, -(1 << 62), 12345678901234):
        r, _ = zigzag_decode(zigzag_encode(v), 0)
        assert r == v


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip_multiblock(codec):
    rows = [
        {"doc_id": i * 7 - 3, "text": f"t{i} é", "blob": bytes([i % 251]) * 3}
        for i in range(2500)
    ]
    data = write_avro_bytes(iter(rows), FIELDS, codec=codec, block_records=1000)
    assert data[:4] == b"Obj\x01"
    assert list(iter_avro(data)) == rows  # 3 blocks, all syncs verified


def test_ocf_sync_and_magic_detection():
    rows = [{"doc_id": 1, "text": "x", "blob": b""}]
    data = write_avro_bytes(iter(rows), FIELDS)
    bad = bytearray(data)
    bad[-8] ^= 1  # inside the trailing sync marker
    with pytest.raises(ValueError):
        list(iter_avro(bytes(bad)))
    with pytest.raises(ValueError):
        list(iter_avro(b"NOPE" + data[4:]))


def test_ray_avro_roundtrip(ray_session, tmp_path):
    import ray as _ray

    from commoncrawl_ray.sources.avro import read_avro, write_avro

    fields = [("doc_id", "long"), ("text", "string")]
    t = pa.table(
        {
            "doc_id": pa.array([5, 6, 7], pa.int64()),
            "text": pa.array(["a", "", "ζω"], pa.string()),
        }
    )
    out = str(tmp_path / "avro")
    manifest = write_avro(
        _ray.data.from_arrow(t).repartition(2), out, fields
    ).take_all()
    assert sum(m["records"] for m in manifest) == 3
    rows = sorted(
        (r["doc_id"], r["text"]) for r in read_avro(out, fields).take_all()
    )
    assert rows == [(5, "a"), (6, ""), (7, "ζω")]
