"""ORC + Arrow IPC (Feather v2) source/sink — the two remaining
columnar interchange containers of the Hadoop/Arrow ecosystems,
spoken through pyarrow's native writers (no JVM, no extra deps):

  * ORC — the Hive/Presto warehouse column format
    (orc.apache.org spec); shards here use the zlib stripe codec.
  * Arrow IPC file (a.k.a. Feather v2) — Arrow's own zero-copy
    on-disk framing (arrow.apache.org/docs/format/Columnar.html);
    shards use the zstd buffer codec built into pyarrow.

Unlike sources/avro.py / tfrecord.py / seqfile.py there is nothing to
hand-roll — pyarrow owns both formats end to end — so this module is
only the Ray plumbing, in the exact shape of those siblings:

  * sink: one shard per block inside ``map_batches`` (content-hash
    names, tmp+rename — idempotent under task retry), slim
    (file, records) manifest rows returned;
  * source: ``read_binary_files`` over the shard tree, one stateless
    parse task per shard from a ``pa.BufferReader`` (zero-copy for
    IPC), full Arrow schema fidelity both ways (ints stay ints,
    nulls stay typed — the decay parquet->pandas round-trips suffer).

Both writers are byte-deterministic for a given table (verified in
tests/test_columnar.py) — no wall clock, no UUIDs — so re-runs
reproduce identical shard names and a retried task's rename is a
no-op.

Scale shape: streaming shard-per-block both directions; nothing
materializes beyond the manifest rows.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa


def orc_bytes(table: pa.Table, compression: str = "zlib") -> bytes:
    """Serialize one Arrow table as a single ORC file in memory."""
    import io

    import pyarrow.orc as po

    buf = io.BytesIO()
    po.write_table(table, buf, compression=compression)
    return buf.getvalue()


def read_orc_bytes(data: bytes) -> pa.Table:
    import pyarrow.orc as po

    return po.ORCFile(pa.BufferReader(data)).read()


def ipc_bytes(table: pa.Table, compression: str | None = "zstd") -> bytes:
    """Serialize one Arrow table as a single Arrow IPC (Feather v2)
    file in memory."""
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression=compression)
    with pa.ipc.new_file(sink, table.schema, options=opts) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def read_ipc_bytes(data: bytes) -> pa.Table:
    return pa.ipc.open_file(pa.BufferReader(data)).read_all()


def _write_shards(ds, out_dir: str, to_bytes, ext: str, prefix: str):
    """Shared sink plumbing: one content-hash shard per block,
    tmp+rename (the sources/avro.py discipline)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        body = to_bytes(batch)
        name = f"{prefix}-{hashlib.md5(body).hexdigest()}.{ext}"
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


def _read_shards(paths, from_bytes):
    """Shared source plumbing: one stateless parse task per shard."""
    import ray

    files = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [from_bytes(b.as_py()) for b in batch.column("bytes")]
        return pa.concat_tables(tables)

    return files.map_batches(parse, batch_format="pyarrow")


def write_orc(ds, out_dir: str, compression: str = "zlib",
              prefix: str = "part"):
    """Sink a Dataset as one ``.orc`` shard per block."""
    return _write_shards(
        ds, out_dir, lambda t: orc_bytes(t, compression), "orc", prefix
    )


def read_orc(paths):
    """Read an ORC shard tree back to a Dataset (full Arrow schema)."""
    return _read_shards(paths, read_orc_bytes)


def write_ipc(ds, out_dir: str, compression: str | None = "zstd",
              prefix: str = "part"):
    """Sink a Dataset as one Arrow IPC (Feather v2) ``.arrow`` shard
    per block."""
    return _write_shards(
        ds, out_dir, lambda t: ipc_bytes(t, compression), "arrow", prefix
    )


def read_ipc(paths):
    """Read an Arrow IPC shard tree back to a Dataset (zero-copy
    decode, full Arrow schema)."""
    return _read_shards(paths, read_ipc_bytes)
