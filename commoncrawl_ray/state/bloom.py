"""Bloom filter — approximate URL-seen membership sketch.

Reimplements the reference's bloom stack (SURVEY §2.5 A7):

- ``BloomCalculations.computeBucketsAndK`` (reference
  ``util/shared/BloomCalculations.java:114-137``) with its probability
  table (``:50-69``) and optimal-K table;
- Kirsch-Mitzenmacher double hashing ``|h1 + i*h2| % max`` over the 8
  big-endian bytes of the key with MurmurHash2 seed-chained
  (``util/shared/Filter.java:85-104``);
- serialization = (hash_count, bitset) (``BloomFilter.java:129-141``).

Adds are vectorized over int64 numpy arrays (the per-batch API the
UrlSeenActor pool needs); the per-key hash math matches the reference's
scalar semantics exactly (Java ``Math.abs`` included — with its
MIN_VALUE quirk avoided because max > 0 keeps values in range).
"""

from __future__ import annotations

import numpy as np

from ..functions.fingerprint import murmur32_long

_OPT_K_PER_BUCKETS = [1, 1, 2, 3, 3, 4, 5, 5, 6, 7, 8, 8, 8, 8, 8, 8]

_PROBS = [
    [1.0],
    [1.0, 1.0],
    [1.0, 0.393, 0.400],
    [1.0, 0.283, 0.237, 0.253],
    [1.0, 0.221, 0.155, 0.147, 0.160],
    [1.0, 0.181, 0.109, 0.092, 0.092, 0.101],
    [1.0, 0.154, 0.0804, 0.0609, 0.0561, 0.0578, 0.0638],
    [1.0, 0.133, 0.0618, 0.0423, 0.0359, 0.0347, 0.0364],
    [1.0, 0.118, 0.0489, 0.0306, 0.024, 0.0217, 0.0216, 0.0229],
    [1.0, 0.105, 0.0397, 0.0228, 0.0166, 0.0141, 0.0133, 0.0135, 0.0145],
    [1.0, 0.0952, 0.0329, 0.0174, 0.0118, 0.00943, 0.00844, 0.00819, 0.00846],
    [1.0, 0.0869, 0.0276, 0.0136, 0.00864, 0.0065, 0.00552, 0.00513, 0.00509],
    [1.0, 0.08, 0.0236, 0.0108, 0.00646, 0.00459, 0.00371, 0.00329, 0.00314],
    [1.0, 0.074, 0.0203, 0.00875, 0.00492, 0.00332, 0.00255, 0.00217, 0.00199],
    [1.0, 0.0689, 0.0177, 0.00718, 0.00381, 0.00244, 0.00179, 0.00146, 0.00129],
    [1.0, 0.0645, 0.0156, 0.00596, 0.003, 0.00183, 0.00128, 0.001, 0.000852],
]
_MIN_BUCKETS, _MIN_K = 2, 1
_MAX_BUCKETS, _MAX_K = 15, 8


def compute_best_k(buckets_per_element: int) -> int:
    if buckets_per_element >= len(_OPT_K_PER_BUCKETS):
        return _OPT_K_PER_BUCKETS[-1]
    return _OPT_K_PER_BUCKETS[buckets_per_element]


def compute_buckets_and_k(max_fp_prob: float) -> tuple[int, int]:
    """-> (K, buckets_per_element), BloomCalculations.computeBucketsAndK."""
    if max_fp_prob >= _PROBS[_MIN_BUCKETS][_MIN_K]:
        return compute_best_k(2), 2
    if max_fp_prob < _PROBS[_MAX_BUCKETS][_MAX_K]:
        return _MAX_K, _MAX_BUCKETS
    buckets = 2
    k = compute_best_k(buckets)
    while _PROBS[buckets][k] > max_fp_prob:
        buckets += 1
        k = compute_best_k(buckets)
    while _PROBS[buckets][k - 1] <= max_fp_prob:
        k -= 1
    return k, buckets


class BloomFilter:
    """Bit-array bloom over signed-64-bit keys."""

    def __init__(self, num_elements: int, max_fp_prob: float = 0.0009):
        k, buckets = compute_buckets_and_k(max_fp_prob)
        self.hash_count = k
        self.num_buckets = num_elements * buckets + 20
        self.bits = np.zeros((self.num_buckets + 63) // 64, dtype=np.uint64)

    # --- scalar path (reference-parity semantics) ---------------------

    def _buckets_for(self, key: int) -> list[int]:
        h1 = murmur32_long(key, 0)
        h2 = murmur32_long(key, h1)
        out = []
        for i in range(self.hash_count):
            v = h1 + i * h2
            # Java int overflow then Math.abs then % max
            v &= 0xFFFFFFFF
            if v >= 0x80000000:
                v -= 0x100000000
            out.append(abs(v) % self.num_buckets)
        return out

    def add(self, key: int) -> None:
        for b in self._buckets_for(key):
            self.bits[b >> 6] |= np.uint64(1 << (b & 63))

    def is_present(self, key: int) -> bool:
        for b in self._buckets_for(key):
            if not (int(self.bits[b >> 6]) >> (b & 63)) & 1:
                return False
        return True

    # --- vectorized batch path ----------------------------------------

    def _buckets_batch(self, keys: np.ndarray) -> np.ndarray:
        """(n, hash_count) int64 bucket indices; same math as scalar."""
        from ..functions.fingerprint import murmur32_long_batch

        keys = np.asarray(keys, dtype=np.int64)
        h1_32 = murmur32_long_batch(keys, 0)
        h2_32 = murmur32_long_batch(keys, h1_32)
        h1 = h1_32.astype(np.int64)
        h2 = h2_32.astype(np.int64)
        i = np.arange(self.hash_count, dtype=np.int64)
        v = h1[:, None] + i[None, :] * h2[:, None]
        v = ((v + 0x80000000) & 0xFFFFFFFF) - 0x80000000  # wrap to int32
        return np.abs(v) % self.num_buckets

    def add_batch(self, keys: np.ndarray) -> None:
        b = self._buckets_batch(keys).ravel()
        np.bitwise_or.at(self.bits, b >> 6, np.uint64(1) << (b & 63).astype(np.uint64))

    def maybe_present_batch(self, keys: np.ndarray) -> np.ndarray:
        """bool mask: True = possibly present, False = definitely new."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        b = self._buckets_batch(keys)
        bitvals = (self.bits[b >> 6] >> (b & 63).astype(np.uint64)) & np.uint64(1)
        return bitvals.all(axis=1)

    # --- serialization -------------------------------------------------

    def to_bytes(self) -> bytes:
        import struct

        return struct.pack(">ii", self.hash_count, self.num_buckets) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        import struct

        hash_count, num_buckets = struct.unpack(">ii", blob[:8])
        obj = cls.__new__(cls)
        obj.hash_count = hash_count
        obj.num_buckets = num_buckets
        obj.bits = np.frombuffer(blob[8:], dtype=np.uint64).copy()
        return obj
