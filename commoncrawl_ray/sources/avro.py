"""Avro Object Container File source/sink — the remaining classic
data-engineering interchange container (Kafka/Hadoop ecosystems),
spoken from the PUBLIC Avro 1.x spec with no avro library:

    magic "Obj\\x01"
    file metadata: an Avro map<bytes> — repeated blocks of
        (count: zigzag long, then count x (key: string, val: bytes)),
        terminated by a 0 count; keys "avro.schema" (JSON) and
        "avro.codec" ("null" | "deflate")
    16-byte sync marker
    data blocks: (record count: long, byte size: long,
        records [raw-deflate-compressed under the deflate codec],
        16-byte sync marker == the header's)

Primitive encodings (Avro binary spec): long/int = ZIGZAG base-128
little-endian varint ((v << 1) ^ (v >> 63)); string/bytes = long
length + raw bytes. Supported field types here: long, string, bytes —
the training-shard shapes this engine exchanges. The reader takes the
field layout from the EMBEDDED JSON schema (names + order), so shards
written by other Avro writers with the same primitive types parse
too; every block's sync marker is verified (torn shards fail loudly).

deflate codec = RAW deflate (RFC 1951, zlib wbits=-15) per the spec.
Deterministic sync marker (md5 of the schema JSON) instead of a
random UUID — legal, readers use the header's value; identical input
re-runs produce byte-identical shards (no-wall-clock discipline).

Scale shape mirrors sources/tfrecord.py / seqfile.py: one shard per
block inside map_batches (content-hash names, tmp+rename), one
stateless parse task per shard on read.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import zlib

import pyarrow as pa

_MAGIC = b"Obj\x01"


def zigzag_encode(v: int) -> bytes:
    """Avro long: zigzag then base-128 little-endian varint."""
    n = ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    n = 0
    while True:
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (n >> 1) ^ -(n & 1), pos


def _avro_bytes(b: bytes) -> bytes:
    return zigzag_encode(len(b)) + b


def _read_avro_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    ln, pos = zigzag_decode(data, pos)
    return data[pos : pos + ln], pos + ln


def _schema_json(fields: list[tuple[str, str]]) -> str:
    return json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [{"name": n, "type": t} for n, t in fields],
        },
        sort_keys=True,
        separators=(",", ":"),
    )


def write_avro_bytes(
    records, fields: list[tuple[str, str]], codec: str = "deflate",
    block_records: int = 1000,
) -> bytes:
    """Frame row dicts as an OCF. ``fields`` = [(name, avro_type)]
    with types long | string | bytes; encoding order = field order."""
    schema = _schema_json(fields)
    sync = hashlib.md5(schema.encode("utf-8")).digest()
    meta = (
        zigzag_encode(2)
        + _avro_bytes(b"avro.codec") + _avro_bytes(codec.encode())
        + _avro_bytes(b"avro.schema") + _avro_bytes(schema.encode())
        + zigzag_encode(0)
    )
    parts = [_MAGIC, meta, sync]

    def enc_row(row: dict) -> bytes:
        out = []
        for name, typ in fields:
            v = row[name]
            if typ == "long":
                out.append(zigzag_encode(int(v)))
            elif typ == "string":
                out.append(_avro_bytes((v or "").encode("utf-8")))
            else:  # bytes
                out.append(_avro_bytes(v or b""))
        return b"".join(out)

    buf: list[bytes] = []

    def flush():
        if not buf:
            return
        raw = b"".join(buf)
        if codec == "deflate":
            co = zlib.compressobj(wbits=-15)
            raw = co.compress(raw) + co.flush()
        parts.append(zigzag_encode(len(buf)))
        parts.append(zigzag_encode(len(raw)))
        parts.append(raw)
        parts.append(sync)
        buf.clear()

    for row in records:
        buf.append(enc_row(row))
        if len(buf) >= block_records:
            flush()
    flush()
    return b"".join(parts)


def iter_avro(data: bytes):
    """Yield row dicts; field layout from the embedded JSON schema,
    every block's sync marker verified against the header's."""
    if data[:4] != _MAGIC:
        raise ValueError("not an Avro OCF (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        cnt, pos = zigzag_decode(data, pos)
        if cnt == 0:
            break
        if cnt < 0:  # spec: negative count is followed by a byte size
            _sz, pos = zigzag_decode(data, pos)
            cnt = -cnt
        for _ in range(cnt):
            k, pos = _read_avro_bytes(data, pos)
            v, pos = _read_avro_bytes(data, pos)
            meta[k.decode("utf-8")] = v
    codec = meta.get("avro.codec", b"null").decode()
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    for _n, t in fields:
        if t not in ("long", "int", "string", "bytes"):
            raise ValueError(f"unsupported avro type {t!r}")
    sync = data[pos : pos + 16]
    pos += 16
    n = len(data)
    while pos < n:
        cnt, pos = zigzag_decode(data, pos)
        size, pos = zigzag_decode(data, pos)
        raw = data[pos : pos + size]
        pos += size
        if data[pos : pos + 16] != sync:
            raise ValueError("avro sync marker mismatch (torn shard)")
        pos += 16
        if codec == "deflate":
            raw = zlib.decompress(raw, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        rpos = 0
        for _ in range(cnt):
            row = {}
            for name, typ in fields:
                if typ in ("long", "int"):
                    row[name], rpos = zigzag_decode(raw, rpos)
                else:
                    b, rpos = _read_avro_bytes(raw, rpos)
                    row[name] = b.decode("utf-8") if typ == "string" else b
            yield row


def write_avro(
    ds, out_dir: str, fields: list[tuple[str, str]],
    codec: str = "deflate", prefix: str = "part",
):
    """Sink a Dataset as one ``.avro`` OCF shard per block.
    Content-hash names + tmp+rename (idempotent side-writes)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        cols = {n: batch.column(n).to_pylist() for n, _t in fields}
        body = write_avro_bytes(
            ({n: cols[n][i] for n, _t in fields} for i in range(len(batch))),
            fields,
            codec=codec,
        )
        name = f"{prefix}-{hashlib.md5(body).hexdigest()}.avro"
        tmp = os.path.join(out_dir, f".{name}.tmp{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "file": pa.array([name]),
                "records": pa.array([len(batch)], pa.int64()),
            }
        )

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)


def read_avro(paths, fields: list[tuple[str, str]]):
    """Read an OCF shard tree back to a Dataset with the given column
    layout (long -> int64, string -> string, bytes -> binary). One
    parse task per shard."""
    import ray

    files = ray.data.read_binary_files(paths)
    types = {"long": pa.int64(), "int": pa.int64(),
             "string": pa.string(), "bytes": pa.binary()}

    def parse(batch: pa.Table) -> pa.Table:
        rows: dict = {n: [] for n, _t in fields}
        for blob in batch.column("bytes").to_pylist():
            for row in iter_avro(blob):
                for n, _t in fields:
                    rows[n].append(row[n])
        return pa.table(
            {n: pa.array(rows[n], types[t]) for n, t in fields}
        )

    return files.map_batches(parse, batch_format="pyarrow")
