"""TFRecord source/sink — the training-shard interchange format of
the TF/TPU data ecosystem, implemented from the PUBLIC on-disk spec
only (no tensorflow / protobuf dependency; this container has
neither, and the wire format is small enough to speak directly).

Record framing (tfrecord spec):

    uint64  length                (little-endian)
    uint32  masked_crc32c(length) (little-endian)
    bytes   data[length]          (a serialized tf.train.Example)
    uint32  masked_crc32c(data)   (little-endian)

mask(crc) = ((crc >> 15) | (crc << 17)) + 0xA282EAD8  (mod 2^32);
CRC32C = Castagnoli, reflected polynomial 0x82F63B78.

Payload: tf.train.Example in protobuf wire format (protobuf.dev
encoding rules; message layout per TensorFlow's example.proto /
feature.proto):

    Example  { Features features = 1; }
    Features { map<string, Feature> feature = 1; }     // entries:
                                                       // key=1, value=2
    Feature  { BytesList bytes_list = 1;
               FloatList float_list = 2;               // not emitted
               Int64List int64_list = 3; }
    BytesList{ repeated bytes value = 1; }
    Int64List{ repeated int64 value = 1 [packed]; }

The writer emits map entries in SORTED key order (deterministic
shards; protobuf map order is unspecified, so any order is legal) and
packed int64 lists; the parser accepts packed or unpacked. Both CRCs
are verified on every read — a torn or bit-flipped shard fails
loudly, the sources/arc.py reader discipline.

Scale shape: the sink writes one shard per block from inside
map_batches (content-hash names, tmp+rename — idempotent re-runs,
the crawl side-write discipline); the source is read_binary_files →
a stateless per-file parse (one task per shard, the unsplittable-
member model the ARC/WARC readers share).
"""

from __future__ import annotations

import hashlib
import os
import struct

import pyarrow as pa

_MASK_DELTA = 0xA282EAD8
_U32 = 0xFFFFFFFF
_CRC_TABLE: list[int] | None = None


def _crc_table() -> list[int]:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        tab = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if (c & 1) else c >> 1
            tab.append(c)
        _CRC_TABLE = tab
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), table-driven; check value
    crc32c(b"123456789") == 0xE3069283."""
    tab = _crc_table()
    crc = _U32
    for b in data:
        crc = (crc >> 8) ^ tab[(crc ^ b) & 0xFF]
    return crc ^ _U32


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | ((c << 17) & _U32)) + _MASK_DELTA) & _U32


def _varint(n: int) -> bytes:
    """Protobuf varint; int64 negatives use the 64-bit two's
    complement (10-byte) form, matching protobuf int64 semantics."""
    n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _feature(value) -> bytes:
    """Encode one Feature: bytes/str -> bytes_list, int or list[int]
    -> packed int64_list."""
    if isinstance(value, str):
        value = value.encode("utf-8")
    if isinstance(value, bytes):
        return _ld(1, _ld(1, value))  # bytes_list.value
    if isinstance(value, int):
        value = [value]
    packed = b"".join(_varint(v) for v in value)
    return _ld(3, _ld(1, packed))  # int64_list.value (packed)


def encode_example(feats: dict) -> bytes:
    """Serialize a feature dict as a tf.train.Example (sorted keys)."""
    entries = b"".join(
        _ld(1, _ld(1, k.encode("utf-8")) + _ld(2, _feature(feats[k])))
        for k in sorted(feats)
    )
    return _ld(1, entries)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not (b & 0x80):
            return out, pos
        shift += 7


def _fields(data: bytes):
    """Yield (field_no, wire_type, value) over one message's bytes —
    value is raw bytes for wire 2, the varint for wire 0."""
    pos = 0
    n = len(data)
    while pos < n:
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 2:
            ln, pos = _read_varint(data, pos)
            yield field, wire, data[pos : pos + ln]
            pos += ln
        elif wire == 0:
            v, pos = _read_varint(data, pos)
            yield field, wire, v
        else:  # pragma: no cover - we never write wires 1/5
            raise ValueError(f"unsupported wire type {wire}")


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def parse_example(data: bytes) -> dict:
    """Decode a tf.train.Example into {name: bytes | list[int]}."""
    out: dict = {}
    for f, _w, features in _fields(data):
        if f != 1:
            continue
        for ef, _ew, entry in _fields(features):
            if ef != 1:
                continue
            key = None
            val: object = None
            for kf, _kw, kv in _fields(entry):
                if kf == 1:
                    key = kv.decode("utf-8")
                elif kf == 2:
                    for ff, fw, fv in _fields(kv):
                        if ff == 1:  # bytes_list
                            for bf, _bw, bv in _fields(fv):
                                if bf == 1:
                                    val = bv
                        elif ff == 3:  # int64_list, packed or not
                            if fw == 2:
                                ints = []
                                inner = list(_fields(fv))
                                if inner and inner[0][1] == 2:  # packed
                                    raw = inner[0][2]
                                    pos = 0
                                    while pos < len(raw):
                                        v, pos = _read_varint(raw, pos)
                                        ints.append(_to_signed64(v))
                                else:
                                    ints = [
                                        _to_signed64(v)
                                        for _f2, w2, v in inner
                                        if w2 == 0
                                    ]
                                val = ints
            if key is not None:
                out[key] = val
    return out


def write_tfrecord_bytes(examples) -> bytes:
    """Frame an iterable of serialized examples as tfrecord bytes."""
    parts = []
    for data in examples:
        ln = struct.pack("<Q", len(data))
        parts.append(ln)
        parts.append(struct.pack("<I", _masked_crc(ln)))
        parts.append(data)
        parts.append(struct.pack("<I", _masked_crc(data)))
    return b"".join(parts)


def iter_tfrecord(data: bytes):
    """Yield record payloads, verifying BOTH masked CRCs per record."""
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("truncated tfrecord: partial header")
        ln_bytes = data[pos : pos + 8]
        (ln,) = struct.unpack("<Q", ln_bytes)
        (lcrc,) = struct.unpack("<I", data[pos + 8 : pos + 12])
        if lcrc != _masked_crc(ln_bytes):
            raise ValueError("tfrecord length crc mismatch")
        pos += 12
        if pos + ln + 4 > n:
            raise ValueError("truncated tfrecord: partial record")
        rec = data[pos : pos + ln]
        (dcrc,) = struct.unpack("<I", data[pos + ln : pos + ln + 4])
        if dcrc != _masked_crc(rec):
            raise ValueError("tfrecord data crc mismatch")
        pos += ln + 4
        yield rec


def write_tfrecord(ds, out_dir: str, prefix: str = "part"):
    """Sink a Dataset as one ``.tfrecord`` shard per block: every row
    becomes a tf.train.Example (string/binary columns -> bytes_list,
    integer columns -> int64_list). Content-hash shard names +
    tmp+rename: re-running a failed task rewrites the identical file
    (idempotent side-writes, the crawl-sink discipline). Returns the
    (file, records) manifest Dataset."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        cols = batch.column_names
        pyc = {c: batch.column(c).to_pylist() for c in cols}
        blob = write_tfrecord_bytes(
            encode_example({c: pyc[c][i] for c in cols})
            for i in range(len(batch))
        )
        name = f"{prefix}-{hashlib.md5(blob).hexdigest()}.tfrecord"
        tmp = os.path.join(out_dir, f".{name}.tmp{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "file": pa.array([name]),
                "records": pa.array([len(batch)], pa.int64()),
            }
        )

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)


def read_tfrecord(paths, int64_cols: tuple = (), bytes_cols: tuple = ()):
    """Read a tfrecord shard tree back to a Dataset with the given
    column layout (int64 columns from int64_list[0], utf-8 string
    columns from bytes_list). One parse task per shard file."""
    import ray

    files = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        rows: dict = {c: [] for c in int64_cols + bytes_cols}
        for blob in batch.column("bytes").to_pylist():
            for rec in iter_tfrecord(blob):
                ex = parse_example(rec)
                for c in int64_cols:
                    v = ex[c]
                    rows[c].append(int(v[0]) if isinstance(v, list) else int(v))
                for c in bytes_cols:
                    rows[c].append(ex[c].decode("utf-8"))
        return pa.table(
            {
                **{c: pa.array(rows[c], pa.int64()) for c in int64_cols},
                **{c: pa.array(rows[c], pa.string()) for c in bytes_cols},
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")
