"""ORC + Arrow IPC shard kernels: byte determinism, schema-faithful
round-trips (typed nulls, int64, binary), and the Ray shard
write->read cycle (sources/columnar.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from commoncrawl_ray.sources.columnar import (
    ipc_bytes,
    orc_bytes,
    read_ipc_bytes,
    read_orc_bytes,
)

TBL = pa.table(
    {
        "doc_id": pa.array([1, None, -(1 << 62), 4], pa.int64()),
        "text": pa.array(["a", "b\nc,d", None, "ζω\x00"], pa.string()),
        "blob": pa.array([b"", b"\x00\xff", None, b"x" * 300], pa.binary()),
    }
)


@pytest.mark.parametrize(
    "to_bytes,from_bytes",
    [(orc_bytes, read_orc_bytes), (ipc_bytes, read_ipc_bytes)],
    ids=["orc", "ipc"],
)
def test_bytes_roundtrip_and_determinism(to_bytes, from_bytes):
    b1, b2 = to_bytes(TBL), to_bytes(TBL)
    assert b1 == b2  # no wall clock / UUIDs: retries rename to a no-op
    back = from_bytes(b1)
    assert back.equals(TBL)  # schema AND values, nulls stay typed


def test_ipc_compression_none():
    b = ipc_bytes(TBL, compression=None)
    assert read_ipc_bytes(b).equals(TBL)


def test_ray_columnar_roundtrip(ray_session, tmp_path):
    import ray as _ray

    from commoncrawl_ray.sources.columnar import (
        read_ipc,
        read_orc,
        write_ipc,
        write_orc,
    )

    t = pa.table(
        {
            "doc_id": pa.array([5, 6, 7], pa.int64()),
            "text": pa.array(["a", "", "ζω"], pa.string()),
        }
    )
    for write_fn, read_fn, sub in (
        (write_orc, read_orc, "orc"),
        (write_ipc, read_ipc, "ipc"),
    ):
        out = str(tmp_path / sub)
        manifest = write_fn(
            _ray.data.from_arrow(t).repartition(2), out
        ).take_all()
        assert sum(m["records"] for m in manifest) == 3
        back = read_fn(out)
        assert back.schema().types == [pa.int64(), pa.string()]
        rows = sorted((r["doc_id"], r["text"]) for r in back.take_all())
        assert rows == [(5, "a"), (6, ""), (7, "ζω")]
