"""Hadoop SequenceFile source/sink — the reference engine's primary
spill/sink container (`SequenceFileSpillWriter.java:100-103` creates
`SequenceFile.createWriter(...)` per spill; `SequenceFileReader.java`
and `SequenceFileMerger.java` consume them), implemented here from the
PUBLIC on-disk format (the Hadoop SequenceFile spec) with no JVM:

    header:  "SEQ" + version byte 6
             keyClassName, valueClassName   (Hadoop Text: vint + utf8)
             compress flag (0), blockCompress flag (0)
             metadata entry count (int32 BE) + Text k/v pairs
             16-byte sync marker
    record:  [optional sync escape: int32 -1 + the 16-byte sync,
              emitted whenever >= 2000 bytes passed since the last]
             int32 BE recordLen (= keyLen + valLen)
             int32 BE keyLen
             key bytes      (org.apache.hadoop.io.Text: vint + utf8)
             value bytes    (org.apache.hadoop.io.BytesWritable:
                             int32 BE length + raw bytes)

Hadoop vints: one byte for [-112, 127]; otherwise a negative prefix
byte (-113.. -120 positive, -121.. -128 negated) followed by the
magnitude big-endian (WritableUtils.writeVInt semantics).

Determinism: the sync marker is the md5 of the shard's logical name
instead of Hadoop's random UUID — readers take the marker from the
header, so any value is legal, and identical input re-runs produce
byte-identical shards (the repo's no-wall-clock discipline). The
reader VERIFIES every sync escape against the header marker, so a
torn or mis-spliced shard fails loudly.

Scale shape mirrors sources/tfrecord.py: one shard per block written
inside map_batches (content-hash names, tmp+rename idempotence), one
stateless parse task per shard on read.
"""

from __future__ import annotations

import hashlib
import os
import struct

import pyarrow as pa

_MAGIC = b"SEQ\x06"
TEXT_CLASS = b"org.apache.hadoop.io.Text"
BYTES_CLASS = b"org.apache.hadoop.io.BytesWritable"
_SYNC_INTERVAL = 2000  # bytes between sync escapes (Hadoop: 100*(4+16))
_SYNC_ESCAPE = struct.pack(">i", -1)


def write_vint(i: int) -> bytes:
    """Hadoop WritableUtils.writeVInt/VLong."""
    if -112 <= i <= 127:
        return struct.pack("b", i)
    ln = -112
    if i < 0:
        i ^= -1
        ln = -120
    tmp = i
    while tmp:
        tmp >>= 8
        ln -= 1
    nbytes = -(ln + 120) if ln < -120 else -(ln + 112)
    return struct.pack("b", ln) + i.to_bytes(nbytes, "big")


def read_vint(data: bytes, pos: int) -> tuple[int, int]:
    first = struct.unpack_from("b", data, pos)[0]
    pos += 1
    if -112 <= first <= 127:
        return first, pos
    negate = first < -120
    nbytes = -(first + 120) if negate else -(first + 112)
    v = int.from_bytes(data[pos : pos + nbytes], "big")
    pos += nbytes
    return (v ^ -1) if negate else v, pos


def _text(b: bytes) -> bytes:
    """org.apache.hadoop.io.Text serialization."""
    return write_vint(len(b)) + b


def _read_text(data: bytes, pos: int) -> tuple[bytes, int]:
    ln, pos = read_vint(data, pos)
    return data[pos : pos + ln], pos + ln


def write_seqfile_bytes(name: str, records) -> bytes:
    """Frame (key: str, value: bytes) pairs as a SequenceFile with
    Text keys and BytesWritable values."""
    sync = hashlib.md5(name.encode("utf-8")).digest()
    parts = [
        _MAGIC,
        _text(TEXT_CLASS),
        _text(BYTES_CLASS),
        b"\x00",  # compress
        b"\x00",  # blockCompress
        struct.pack(">i", 0),  # metadata entries
        sync,
    ]
    since_sync = 0
    for key, value in records:
        if since_sync >= _SYNC_INTERVAL:
            parts.append(_SYNC_ESCAPE)
            parts.append(sync)
            since_sync = 0
        kb = _text(key.encode("utf-8"))
        vb = struct.pack(">i", len(value)) + value
        rec = (
            struct.pack(">i", len(kb) + len(vb))
            + struct.pack(">i", len(kb))
            + kb
            + vb
        )
        parts.append(rec)
        since_sync += len(rec)
    return b"".join(parts)


def iter_seqfile(data: bytes):
    """Yield (key: str, value: bytes); verifies magic, declared
    key/value classes, and every sync escape against the header."""
    if data[:4] != _MAGIC:
        raise ValueError("not a SequenceFile (bad magic/version)")
    pos = 4
    kcls, pos = _read_text(data, pos)
    vcls, pos = _read_text(data, pos)
    if kcls != TEXT_CLASS or vcls != BYTES_CLASS:
        raise ValueError(f"unsupported classes {kcls!r}/{vcls!r}")
    compress, blockcompress = data[pos], data[pos + 1]
    pos += 2
    if compress or blockcompress:
        raise ValueError("compressed SequenceFiles not supported")
    (nmeta,) = struct.unpack_from(">i", data, pos)
    pos += 4
    for _ in range(nmeta):
        _k, pos = _read_text(data, pos)
        _v, pos = _read_text(data, pos)
    sync = data[pos : pos + 16]
    pos += 16
    n = len(data)
    while pos < n:
        (reclen,) = struct.unpack_from(">i", data, pos)
        pos += 4
        if reclen == -1:  # sync escape
            if data[pos : pos + 16] != sync:
                raise ValueError("sync marker mismatch (torn shard)")
            pos += 16
            continue
        (keylen,) = struct.unpack_from(">i", data, pos)
        pos += 4
        if pos + reclen > n:
            raise ValueError("truncated SequenceFile record")
        kb = data[pos : pos + keylen]
        vb = data[pos + keylen : pos + reclen]
        pos += reclen
        key, kpos = _read_text(kb, 0)
        (vlen,) = struct.unpack_from(">i", vb, 0)
        value = vb[4 : 4 + vlen]
        yield key.decode("utf-8"), value


def write_seqfile(ds, out_dir: str, key_col: str, value_col: str, prefix: str = "part"):
    """Sink a Dataset as one ``.seq`` shard per block (Text key from
    ``key_col``, BytesWritable value from ``value_col`` — string
    values are utf-8 encoded). Content-hash names + tmp+rename."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        vals = batch.column(value_col).to_pylist()
        pairs = [
            (
                str(k),
                v if isinstance(v, bytes) else (v or "").encode("utf-8"),
            )
            for k, v in zip(keys, vals)
        ]
        body = write_seqfile_bytes(prefix, pairs)
        name = f"{prefix}-{hashlib.md5(body).hexdigest()}.seq"
        tmp = os.path.join(out_dir, f".{name}.tmp{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "file": pa.array([name]),
                "records": pa.array([len(pairs)], pa.int64()),
            }
        )

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)


def read_seqfile(paths, key_name: str = "key", value_name: str = "value"):
    """Read a SequenceFile shard tree back to a (key: string,
    value: binary) Dataset — one parse task per shard."""
    import ray

    files = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        keys: list[str] = []
        vals: list[bytes] = []
        for blob in batch.column("bytes").to_pylist():
            for k, v in iter_seqfile(blob):
                keys.append(k)
                vals.append(v)
        return pa.table(
            {
                key_name: pa.array(keys, pa.string()),
                value_name: pa.array(vals, pa.binary()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")
