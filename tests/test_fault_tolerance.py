"""Task-retry fault tolerance — the 256-node reality check.

On a real cluster map tasks die (preemption, OOM, node loss) and the
streaming executor re-executes them. These tests crash a worker
mid-stage (os._exit — a genuine SYSTEM_ERROR death, not a Python
exception) and assert the two properties the engine's design leans on:

1. exactness: a retried pure transform yields the same result as a
   clean run (Ray replays the lost block; nothing is dropped or
   doubled);
2. side-write idempotency: the content-hash + tmp+rename shard sink
   discipline (sources/columnar._write_shards, the avro/arc/warc
   family) survives a crash AFTER the payload hits disk — the retry
   rewrites the same content-hash name, so readers see exactly one
   byte-identical shard, never a duplicate or a torn file.
"""

import glob
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _crash_once_marker() -> str:
    # on-disk coordination: survives the worker's death, unique per test
    return f"/tmp/ccray_crash_once_{uuid.uuid4().hex}"


def test_transform_exact_under_worker_crash(ray_session):
    import ray.data as rd

    marker = _crash_once_marker()
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "n_chars"])

    def fn(b: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            open(marker, "w").close()
            os._exit(1)  # first task attempt dies mid-stage
        return b

    ds = rd.from_arrow(t).repartition(8).map_batches(fn, batch_format="pyarrow")
    try:
        assert ds.sum("n_chars") == sum(t.column("n_chars").to_pylist())
        assert ds.count() == t.num_rows
    finally:
        os.remove(marker)


def test_shard_sink_idempotent_under_worker_crash(ray_session):
    import ray.data as rd

    from commoncrawl_ray.sources.columnar import (
        read_ipc,
        write_ipc,
    )

    marker = _crash_once_marker()
    out_clean = f"/tmp/ccray_ft_clean_{uuid.uuid4().hex}"
    out_crash = f"/tmp/ccray_ft_crash_{uuid.uuid4().hex}"
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])

    def crash_after_first_batch(b: pa.Table) -> pa.Table:
        # dies AFTER write_block has renamed its shard into place on
        # the first attempt (the stage below chains after the sink)
        if not os.path.exists(marker):
            open(marker, "w").close()
            os._exit(1)
        return b

    def run(out_dir, inject):
        ds = rd.from_arrow(t).repartition(6)
        stats = write_ipc(ds, out_dir)
        if inject:
            stats = stats.map_batches(
                crash_after_first_batch, batch_format="pyarrow"
            )
        stats.materialize()
        return sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*.arrow"))

    try:
        clean = run(out_clean, inject=False)
        crashed = run(out_crash, inject=True)
        # identical shard sets: the re-executed block rewrote the SAME
        # content-hash name — no duplicate, no orphan
        assert crashed == clean and len(clean) == 6
        assert not glob.glob(f"{out_crash}/.*.tmp*")  # no torn temp files
        # byte-identical payloads and full readability
        for name in clean:
            a = open(os.path.join(out_clean, name), "rb").read()
            b = open(os.path.join(out_crash, name), "rb").read()
            assert a == b, name
        back = read_ipc(sorted(glob.glob(f"{out_crash}/*.arrow")))
        got = sorted(r["doc_id"] for r in back.take_all())
        assert got == sorted(t.column("doc_id").to_pylist())
    finally:
        if os.path.exists(marker):
            os.remove(marker)
