"""Previous-crawl payload-digest store — the revisit/conditional-GET
state of an incremental recrawl.

A recrawl decides per fetched page whether its payload is ALREADY in
the archive (same digest as the previous snapshot's capture) and, if
so, writes a WARC ``revisit`` record instead of re-storing the bytes
(sources/warc.py revisit family; what real web archives do between
monthly snapshots). At 10^10 URLs the previous digest map is far too
big to broadcast, so it lives in the same fp-range-partitioned actor
pool shape as the URL-seen set (state/url_seen.partition_of routing —
co-partitioned with every sort(url_fp) exchange), loaded ONCE per
recrawl by a streaming Ray Data pass over the previous checkpoint's
slim (url_fp, digest64) side-writes, and queried with one batched RPC
per touched partition per fetch batch.

Per-actor state is two parallel sorted numpy arrays (fp, digest64),
16 B/URL — lookups are a vectorized searchsorted, inserts happen only
at load time. No reference counterpart (the reference predates WARC);
the revisit semantics follow WARC 1.0 §6.7.2.
"""

from __future__ import annotations

import numpy as np
import ray

from .url_seen import partition_of


@ray.remote(num_cpus=0)
class DigestStoreActor:
    """One fp-range partition of the previous crawl's digest map.
    num_cpus=0: lookups are sub-millisecond searchsorted calls."""

    def __init__(self) -> None:
        self._fps: list[np.ndarray] = []
        self._digs: list[np.ndarray] = []
        self._tss: list[np.ndarray] = []
        self._fp: np.ndarray | None = None
        self._dig: np.ndarray | None = None
        self._ts: np.ndarray | None = None

    def add(self, fps: np.ndarray, digs: np.ndarray, tss: np.ndarray) -> int:
        """Load-phase append (routed rows only). Chunks accumulate and
        are sorted once at seal() — O(n log n) total, not per chunk."""
        self._fps.append(np.asarray(fps, dtype=np.int64))
        self._digs.append(np.asarray(digs, dtype=np.int64))
        self._tss.append(np.asarray(tss, dtype=np.int64))
        return len(fps)

    def seal(self) -> int:
        fp = (
            np.concatenate(self._fps) if self._fps else np.empty(0, np.int64)
        )
        dig = (
            np.concatenate(self._digs) if self._digs else np.empty(0, np.int64)
        )
        ts = (
            np.concatenate(self._tss) if self._tss else np.empty(0, np.int64)
        )
        # on duplicate fps the LATEST capture wins (max ts, then load
        # order) — lexsort by (ts, fp) then keep each fp's last row
        order = np.lexsort((ts, fp))
        fp, dig, ts = fp[order], dig[order], ts[order]
        if len(fp):
            last = np.r_[fp[1:] != fp[:-1], True]
            fp, dig, ts = fp[last], dig[last], ts[last]
        self._fp, self._dig, self._ts = fp, dig, ts
        self._fps, self._digs, self._tss = [], [], []
        return len(fp)

    def lookup(self, fps: np.ndarray) -> np.ndarray:
        """(2, n) int64: previous digest and capture ts_ms per fp, 0
        where unknown (0 is not a real sha1-prefix in practice;
        collision odds 2^-64)."""
        fps = np.asarray(fps, dtype=np.int64)
        out = np.zeros((2, len(fps)), dtype=np.int64)
        if self._fp is None or len(self._fp) == 0 or len(fps) == 0:
            return out
        pos = np.searchsorted(self._fp, fps)
        ok = (pos < len(self._fp)) & (self._fp[np.minimum(pos, len(self._fp) - 1)] == fps)
        out[0, ok] = self._dig[pos[ok]]
        out[1, ok] = self._ts[pos[ok]]
        return out

    def size(self) -> int:
        return 0 if self._fp is None else len(self._fp)


class DigestStorePool:
    """Driver-side handle; routing identical to UrlSeenPool."""

    def __init__(self, num_partitions: int) -> None:
        self.num_partitions = num_partitions
        self.actors = [DigestStoreActor.remote() for _ in range(num_partitions)]

    def load_from_parquet(self, dirs: list[str]) -> int:
        """ONE streaming Ray Data pass over the previous checkpoint's
        digest side-writes: each block routes its rows to the owning
        partitions (batched RPC per touched partition — the url_seen
        discipline), then every actor sorts its slice once."""
        import pyarrow.dataset as pads

        import ray.data as rd

        files = []
        for d in dirs:
            files.extend(
                f.path for f in pads.dataset(d).get_fragments()
            )
        if files:
            actors = self.actors
            n_parts = self.num_partitions

            def route(t):
                fps = t.column("url_fp").to_numpy(zero_copy_only=False)
                digs = t.column("digest64").to_numpy(zero_copy_only=False)
                tss = t.column("ts_ms").to_numpy(zero_copy_only=False)
                parts = partition_of(np.asarray(fps, np.int64), n_parts)
                refs = []
                for p in np.unique(parts):
                    sel = parts == p
                    refs.append(
                        actors[p].add.remote(fps[sel], digs[sel], tss[sel])
                    )
                ray.get(refs)
                import pyarrow as pa

                return pa.table({"n": pa.array([len(fps)], pa.int64())})

            rd.read_parquet(files).map_batches(
                route, batch_format="pyarrow"
            ).sum("n")
        return sum(ray.get([a.seal.remote() for a in self.actors]))

    def lookup(self, fps: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batched routed lookup; preserves input order. Returns
        (digest64, ts_ms) arrays, 0 where the fp is unknown."""
        fps = np.asarray(fps, dtype=np.int64)
        parts = partition_of(fps, self.num_partitions)
        dig = np.zeros(len(fps), dtype=np.int64)
        ts = np.zeros(len(fps), dtype=np.int64)
        refs, idxs = [], []
        for p in range(self.num_partitions):
            sel = np.nonzero(parts == p)[0]
            if len(sel):
                refs.append(self.actors[p].lookup.remote(fps[sel]))
                idxs.append(sel)
        for sel, res in zip(idxs, ray.get(refs)):
            dig[sel] = res[0]
            ts[sel] = res[1]
        return dig, ts

    def total_size(self) -> int:
        return sum(ray.get([a.size.remote() for a in self.actors]))
