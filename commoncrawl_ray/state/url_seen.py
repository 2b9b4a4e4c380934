"""Partitioned URL-seen set — actor pool with bloom fast path + exact
authoritative set.

This is the crawl-control structure the reference *lacks* (SURVEY §0):
J5/T5 — frontier ∖ seen as a partitioned anti-join. Partition
``i = url_fp_hash % P`` is owned by one ``UrlSeenActor``; its API is a
batched ``check_and_add(int64[]) -> bool[]`` (True = newly admitted).
The bloom (reference math, ``util/shared/BloomFilter.java:35``) answers
"definitely new" without touching the exact set; the exact set is
authoritative (SURVEY §7 hard-parts 4: bloom false positives must not
drop URLs, so every bloom hit is re-checked exactly).

Scale note: at 10^10 URLs / 4096 partitions each partition holds
~2.4M fps ≈ 20 MB exact + ~4.5 MB bloom — comfortably in one actor.
Checkpoint form: sorted fp parquet per partition (+ bloom rebuilt or
restored from blob), written via ``checkpoint()`` and restored with
``restore()`` (SURVEY §4 checkpoint/resume row).
"""

from __future__ import annotations

import os

import numpy as np
import ray

from .bloom import BloomFilter

# Version tag for the fp->partition routing function below. Recorded in
# every crawl manifest; resume REFUSES on mismatch, because a seen-pool
# checkpoint written under a different scheme would restore fps into
# partitions the new routing never consults and silently re-admit
# already-seen URLs (ADVICE r1). Bump when partition_of changes.
ROUTING_SCHEME = "range-v2"


def partition_of(url_fps: np.ndarray, num_partitions: int) -> np.ndarray:
    """Deterministic partition routing: RANGE of the unsigned fp
    (``floor(u64/2^64 * P)`` in integer math). fps are 64-bit hashes,
    so ranges are uniformly loaded like modulo — but range routing
    CO-PARTITIONS with the discovery job's ``sort(url_fp)`` shuffle:
    a sorted block spans a contiguous fp range and therefore touches
    ~P/num_blocks seen-actors instead of all P, keeping the anti-join
    RPC fan-out constant as the pool grows (measured: an all-partition
    fan-out at P=32 doubled crawl wall time vs P=8).
    Must be identical wherever routing happens (manifest records P)."""
    u = url_fps.view(np.uint64)
    return (((u >> np.uint64(32)) * np.uint64(num_partitions)) >> np.uint64(32)).astype(
        np.int64
    )


class _SeenCore:
    """The per-partition state, actor-agnostic (reused by the oracle).

    ``filter_kind``: "bloom" (default; parity-locked) or "cuckoo"
    (state/cuckoo.py — deletable, for recrawl expiry). Either way the
    filter is only the fast path; the exact set stays authoritative,
    so the choice cannot change crawl parity."""

    def __init__(self, expected_elements: int = 1 << 16, filter_kind: str = "bloom"):
        self.exact: set[int] = set()
        if filter_kind == "cuckoo":
            from .cuckoo import CuckooFilter

            self.bloom = CuckooFilter(max(expected_elements, 1024))
        else:
            self.bloom = BloomFilter(max(expected_elements, 1024))

    def check_and_add(self, fps: np.ndarray) -> np.ndarray:
        fps = np.asarray(fps, dtype=np.int64)
        out = np.zeros(len(fps), dtype=bool)
        maybe = self.bloom.maybe_present_batch(fps)
        exact = self.exact
        new_keys = []
        for i, fp in enumerate(fps.tolist()):
            if maybe[i] and fp in exact:
                continue
            if fp in exact:  # pragma: no cover (bloom false negative impossible)
                continue
            exact.add(fp)
            new_keys.append(fp)
            out[i] = True
        if new_keys:
            self.bloom.add_batch(np.array(new_keys, dtype=np.int64))
        return out

    def contains(self, fps: np.ndarray) -> np.ndarray:
        return np.fromiter((int(f) in self.exact for f in fps), dtype=bool, count=len(fps))

    def snapshot(self) -> np.ndarray:
        return np.fromiter(self.exact, dtype=np.int64, count=len(self.exact))


@ray.remote(num_cpus=0)
class UrlSeenActor:
    """One partition of the URL-seen set.

    num_cpus=0: the pool is sized by partition count (which can be much
    larger than cores); each actor does short vectorized set/bloom ops
    and sits idle otherwise, so reserving whole CPUs would deadlock
    small clusters and waste big ones."""

    def __init__(
        self, partition: int, expected_elements: int = 1 << 16, filter_kind: str = "bloom"
    ):
        self.partition = partition
        self.core = _SeenCore(expected_elements, filter_kind)

    def check_and_add(self, fps: np.ndarray) -> np.ndarray:
        return self.core.check_and_add(fps)

    def contains(self, fps: np.ndarray) -> np.ndarray:
        return self.core.contains(fps)

    def size(self) -> int:
        return len(self.core.exact)

    def checkpoint(self, directory: str) -> int:
        """Write sorted fps parquet + bloom blob (atomic: tmp+rename,
        mirroring the attempt-dir pattern of query/Query.java:246-260)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        fps = np.sort(self.core.snapshot())
        table = pa.table(
            {
                "partition": pa.array(np.full(len(fps), self.partition, dtype=np.int32)),
                "url_fp": pa.array(fps),
            }
        )
        tmp = os.path.join(directory, f".part-{self.partition:05d}.parquet.tmp")
        final = os.path.join(directory, f"part-{self.partition:05d}.parquet")
        pq.write_table(table, tmp)
        os.replace(tmp, final)
        blob_tmp = os.path.join(directory, f".bloom-{self.partition:05d}.tmp")
        blob_final = os.path.join(directory, f"bloom-{self.partition:05d}.bin")
        with open(blob_tmp, "wb") as f:
            f.write(self.core.bloom.to_bytes())
        os.replace(blob_tmp, blob_final)
        return len(fps)

    def restore(self, directory: str) -> int:
        import pyarrow.parquet as pq

        path = os.path.join(directory, f"part-{self.partition:05d}.parquet")
        if not os.path.exists(path):
            return 0
        fps = pq.read_table(path).column("url_fp").to_numpy()
        self.core.exact = set(fps.tolist())
        blob = os.path.join(directory, f"bloom-{self.partition:05d}.bin")
        filter_cls = type(self.core.bloom)  # bloom or cuckoo, per construction
        if os.path.exists(blob):
            with open(blob, "rb") as f:
                self.core.bloom = filter_cls.from_bytes(f.read())
        else:
            self.core.bloom = filter_cls(max(len(fps) * 2, 1024))
            if len(fps):
                self.core.bloom.add_batch(fps)
        return len(fps)


class UrlSeenPool:
    """Driver-side handle on the P-partition actor pool."""

    def __init__(
        self,
        num_partitions: int,
        expected_per_partition: int = 1 << 16,
        filter_kind: str = "bloom",
    ):
        self.num_partitions = num_partitions
        self.actors = [
            UrlSeenActor.remote(i, expected_per_partition, filter_kind)
            for i in range(num_partitions)
        ]

    def check_and_add(self, fps: np.ndarray) -> np.ndarray:
        """Batched routed check-and-add; preserves input order."""
        fps = np.asarray(fps, dtype=np.int64)
        parts = partition_of(fps, self.num_partitions)
        out = np.zeros(len(fps), dtype=bool)
        refs, idxs = [], []
        for p in range(self.num_partitions):
            sel = np.nonzero(parts == p)[0]
            if len(sel):
                refs.append(self.actors[p].check_and_add.remote(fps[sel]))
                idxs.append(sel)
        for sel, res in zip(idxs, ray.get(refs)):
            out[sel] = res
        return out

    def total_size(self) -> int:
        return sum(ray.get([a.size.remote() for a in self.actors]))

    def checkpoint(self, directory: str) -> int:
        os.makedirs(directory, exist_ok=True)
        return sum(ray.get([a.checkpoint.remote(directory) for a in self.actors]))

    def restore(self, directory: str) -> int:
        return sum(ray.get([a.restore.remote(directory) for a in self.actors]))
