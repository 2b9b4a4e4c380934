"""SimHash near-duplicate sketch (64-bit), Rabin-fingerprint based.

Reimplements ``util/shared/SimHash.java`` (SURVEY §2.5 A8):

- :func:`simhash_text` == ``computeOptimizedSimHashForString``
  (``SimHash.java:55-106``): distinct 4-char shingles packed into a
  64-bit word (16 bits/char), each hashed with ``FPGenerator.std64``
  over its 8 big-endian bytes, bit-vote aggregation.
- :func:`simhash_bytes` == ``computeOptimizedSimHashForBytes``
  (``SimHash.java:108-162``) including Java's signed-byte OR quirk
  (sign-extended bytes corrupt high shingle bits — reproduced for
  bit parity).
- :func:`hamming` == ``hammingDistance`` (``SimHash.java:189-197``).
"""

from __future__ import annotations

import numpy as np

from .fingerprint import _T7, EMPTY, _to_signed

HASH_SIZE = 64
_M64 = 0xFFFFFFFFFFFFFFFF


def _fp64_u64_batch(vals: np.ndarray) -> np.ndarray:
    """std64.fp over the 8 big-endian bytes of each uint64 (vectorized
    extend_byte fold: 8 steps across the whole array)."""
    f = np.full(vals.shape, EMPTY, dtype=np.uint64)
    for shift in range(56, -8, -8):
        b = (vals >> np.uint64(shift)) & np.uint64(0xFF)
        g = f ^ b
        f = (g >> np.uint64(8)) ^ _T7[(g & np.uint64(0xFF)).astype(np.int64)]
    return f


def _simhash_from_shingles(shingles: np.ndarray) -> int:
    if shingles.size == 0:
        return 0
    hashes = _fp64_u64_batch(np.unique(shingles))
    # bit-vote: v[i] = (#hashes with bit i set) - (#without); bit set if
    # v>0. ONE unpackbits pass instead of 64 shift+sum array sweeps
    # (this sat at 40% of the whole parse kernel before).
    n = hashes.size
    bits = np.unpackbits(
        hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    votes = bits.sum(axis=0, dtype=np.int64)
    cond = 2 * votes > n
    sim = int(np.packbits(cond, bitorder="little").view("<u8")[0])
    return _to_signed(sim)


def simhash_text(s: str) -> int:
    """64-bit simhash over distinct 4-char (UTF-16 code unit) shingles."""
    codes = np.frombuffer(s.encode("utf-16-le"), dtype="<u2").astype(np.uint64)
    n = codes.size
    if n < 4:
        return 0
    shingles = (
        (codes[: n - 3] << np.uint64(48))
        | (codes[1 : n - 2] << np.uint64(32))
        | (codes[2 : n - 1] << np.uint64(16))
        | codes[3:n]
    )
    return _simhash_from_shingles(shingles)


def simhash_bytes(data: bytes) -> int:
    """64-bit simhash over distinct 8-byte shingles, reproducing Java's
    signed-byte OR behavior (``SimHash.java:115-134``)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.size
    if n < 8:
        return 0
    # Java: shingle = ((...(b0) << 8 | sext(b1)) << 8 | sext(b2)) ...
    # with each b sign-extended to 64 bits before OR. A negative byte
    # ORs 0xFF..F into all bits above position 8, so every later OR of
    # a negative byte saturates the high bits.
    sext = arr.astype(np.int64)
    sext = np.where(sext >= 128, sext - 256, sext).astype(np.int64)
    shingle = sext[: n - 7].astype(np.int64)
    for k in range(1, 8):
        shingle = (shingle << 8) | sext[k : n - 7 + k]
    return _simhash_from_shingles(shingle.view(np.uint64))


def hamming(a: int, b: int) -> int:
    return int(bin((a ^ b) & _M64).count("1"))


def simhash_text_batch(texts) -> np.ndarray:
    return np.fromiter((simhash_text(t or "") for t in texts), dtype=np.int64, count=len(texts))
