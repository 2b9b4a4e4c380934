"""Cuckoo filter — the deletable approximate-membership alternative to
the bloom filter for the URL-seen fast path (BASELINE.json north_star:
"partitioned bloom-filter/cuckoo-filter URL-seen set").

Standard partial-key cuckoo hashing (public algorithm: Fan, Andersen,
Kaminsky, Mitzenmacher — "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT'14): 4-slot buckets, 16-bit fingerprints, alternate
bucket ``i2 = i1 XOR hash(fp)``, bounded eviction chain. Unlike bloom
(state/bloom.py) it supports DELETE, which a recrawl scheduler needs to
expire URLs out of the seen fast path without a full rebuild.

Hashing derives from the engine's 64-bit fp domain (the url_fp column),
so the filter is deterministic across processes. numpy storage
(``uint16[nbuckets, 4]``; 0 = empty — fingerprints are forced nonzero)
serializes to bytes for actor checkpoints exactly like BloomFilter.
"""

from __future__ import annotations

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche (public domain construction)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


class CuckooFilter:
    """Approximate set of int64 fingerprints with deletion."""

    def __init__(self, expected_elements: int = 1 << 16):
        # size for ~95% load: buckets = next pow2 >= n / (slots * 0.95)
        need = max(16, int(expected_elements / (_SLOTS * 0.95)) + 1)
        nb = 1
        while nb < need:
            nb <<= 1
        self.nbuckets = nb
        self.table = np.zeros((nb, _SLOTS), dtype=np.uint16)
        self.count = 0

    # -- hashing -------------------------------------------------------
    def _fingerprint(self, fps: np.ndarray) -> np.ndarray:
        f = (_mix64(fps.view(np.uint64)) & np.uint64(0xFFFF)).astype(np.uint16)
        f[f == 0] = 1  # 0 marks an empty slot
        return f

    def _index1(self, fps: np.ndarray) -> np.ndarray:
        return (
            (_mix64(fps.view(np.uint64) ^ _MIX) & np.uint64(self.nbuckets - 1))
        ).astype(np.int64)

    def _alt_index(self, idx: np.ndarray, fprint: np.ndarray) -> np.ndarray:
        h = _mix64(fprint.astype(np.uint64))
        return (
            (idx.astype(np.uint64) ^ h) & np.uint64(self.nbuckets - 1)
        ).astype(np.int64)

    # -- single-item ops (eviction chains are inherently sequential) ---
    def _try_put(self, bucket: int, fprint: int) -> bool:
        row = self.table[bucket]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = fprint
            return True
        return False

    def add(self, fp: int) -> bool:
        """Insert one fingerprint; False if the filter is full."""
        arr = np.array([fp], dtype=np.int64)
        f = int(self._fingerprint(arr)[0])
        i1 = int(self._index1(arr)[0])
        i2 = int(self._alt_index(np.array([i1]), np.array([f], dtype=np.uint16))[0])
        if self._try_put(i1, f) or self._try_put(i2, f):
            self.count += 1
            return True
        # evict: random-walk displacement, deterministic seed from item
        rng = np.random.RandomState((fp ^ (fp >> 32)) & 0x7FFFFFFF)
        bucket = i2 if rng.randint(2) else i1
        cur = f
        undo = []  # (bucket, slot, displaced) so a failed chain rolls back
        for _ in range(_MAX_KICKS):
            slot = rng.randint(_SLOTS)
            displaced = int(self.table[bucket, slot])
            self.table[bucket, slot] = cur
            undo.append((bucket, slot, displaced))
            cur = displaced
            bucket = int(
                self._alt_index(
                    np.array([bucket]), np.array([cur], dtype=np.uint16)
                )[0]
            )
            if self._try_put(bucket, cur):
                self.count += 1
                return True
        # chain failed: undo every swap (reverse order) so previously
        # inserted fingerprints keep their no-false-negative guarantee
        for b, s, displaced in reversed(undo):
            self.table[b, s] = displaced
        return False

    def delete(self, fp: int) -> bool:
        """Remove one previously-added fingerprint. True if found."""
        arr = np.array([fp], dtype=np.int64)
        f = int(self._fingerprint(arr)[0])
        i1 = int(self._index1(arr)[0])
        i2 = int(self._alt_index(np.array([i1]), np.array([f], dtype=np.uint16))[0])
        for b in (i1, i2):
            row = self.table[b]
            hit = np.nonzero(row == f)[0]
            if len(hit):
                row[hit[0]] = 0
                self.count -= 1
                return True
        return False

    # -- batched membership (the hot path) -----------------------------
    def maybe_present_batch(self, fps: np.ndarray) -> np.ndarray:
        fps = np.asarray(fps, dtype=np.int64)
        f = self._fingerprint(fps)
        i1 = self._index1(fps)
        i2 = self._alt_index(i1, f)
        t = self.table
        hit1 = (t[i1] == f[:, None]).any(axis=1)
        hit2 = (t[i2] == f[:, None]).any(axis=1)
        return hit1 | hit2

    def add_batch(self, fps: np.ndarray) -> int:
        """Insert many; returns how many were inserted (filter-full
        failures are counted out — callers keep the exact set
        authoritative, mirroring the bloom discipline)."""
        ok = 0
        for fp in np.asarray(fps, dtype=np.int64).tolist():
            if self.add(int(fp)):
                ok += 1
        return ok

    # -- checkpoint ----------------------------------------------------
    def to_bytes(self) -> bytes:
        import struct

        head = struct.pack("<QQ", self.nbuckets, self.count)
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        import struct

        nb, count = struct.unpack_from("<QQ", blob, 0)
        obj = cls.__new__(cls)
        obj.nbuckets = int(nb)
        obj.count = int(count)
        obj.table = (
            np.frombuffer(blob, dtype=np.uint16, offset=16)
            .reshape(int(nb), _SLOTS)
            .copy()
        )
        return obj
