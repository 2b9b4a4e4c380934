"""64-bit Rabin (GF(2^64)) fingerprints + MurmurHash2 (32-bit).

Reimplements the semantics of the reference's fingerprint stack:

- ``FPGenerator`` (reference ``util/shared/FPGenerator.java:49-499``):
  table-driven polynomial fingerprint over GF(2^d), polynomials stored
  bit-reversed (least-significant exponent in the most-significant bit).
  We only need the standard degree-64 generator (``std64``,
  ``FPGenerator.java:481``) whose polynomial is ``0xD74307D3FD3382DB``
  (``FPGenerator.java:474``). For degree 64 ``reduce`` is the identity
  (``FPGenerator.java:81-91`` with N == 0), so
  ``fp(CharSequence) = fold(extend_char, empty, utf16_code_units(s))``
  (``FPGenerator.java:180,273-281``) and
  ``fp(byte[]) = fold(extend_byte, empty, bytes)``
  (``FPGenerator.java:165,247-253``).
- ``URLFingerprint.generate64BitURLFPrint`` == ``std64.fp(url)``
  (reference ``util/shared/URLFingerprint.java:36-46``).
- ``MurmurHash`` v2, 32-bit, Java signed-int overflow semantics
  (reference ``util/shared/MurmurHash.java:30-116``) — used by the bloom
  filter's Kirsch-Mitzenmacher double hashing
  (``util/shared/Filter.java:69-104``).

Results are returned with Java ``long``/``int`` signed semantics so the
bit patterns stored in Arrow int64/int32 columns match the reference.

The batch entry point :func:`fp64_batch` is vectorized with numpy
(one fused table-lookup step per character *position*, across all rows),
which is what lets the URL-fingerprint stage run as a zero-copy
``map_batches`` kernel instead of a per-row Python loop.
"""

from __future__ import annotations

import numpy as np

_POLY = np.uint64(0xD74307D3FD3382DB)  # FPGenerator.polynomials[64][0]
_ONE = np.uint64(0x8000000000000000)  # x^0 in bit-reversed representation


def _build_tables() -> tuple[np.uint64, np.ndarray]:
    """Build PowerTable / ByteModTable exactly as FPGenerator's ctor
    (reference ``FPGenerator.java:364-403``) for degree 64."""
    power = np.zeros(128, dtype=np.uint64)
    x = int(_ONE)
    for i in range(128):
        power[i] = x
        overflow = x & 1
        x >>= 1
        if overflow:
            x ^= int(_POLY)
    empty = np.uint64(power[64])

    table = np.zeros((16, 256), dtype=np.uint64)
    for i in range(16):
        for j in range(256):
            v = 0
            for k in range(8):
                if j & (1 << k):
                    v ^= int(power[127 - i * 8 - k])
            table[i, j] = v
    return empty, table


EMPTY, _TABLE = _build_tables()
_T6 = _TABLE[6]
_T7 = _TABLE[7]
_MASK8 = np.uint64(0xFF)
_SH8 = np.uint64(8)
_SH16 = np.uint64(16)


def _to_signed(v: int) -> int:
    """uint64 bit pattern -> Java signed long."""
    v &= 0xFFFFFFFFFFFFFFFF
    return v - 0x10000000000000000 if v >= 0x8000000000000000 else v


def fp64(s: str) -> int:
    """std64.fp(CharSequence): fingerprint of the UTF-16 code units of s.

    Matches Java's ``charAt`` iteration (surrogate pairs hash as two
    code units). Returns a Java-signed 64-bit int.
    """
    codes = np.frombuffer(s.encode("utf-16-le"), dtype="<u2")
    f = int(EMPTY)
    t6 = _T6
    t7 = _T7
    for v in codes.tolist():
        f ^= v
        f = (f >> 16) ^ int(t6[f & 0xFF]) ^ int(t7[(f >> 8) & 0xFF])
    return _to_signed(f)


def fp64_bytes(data: bytes) -> int:
    """std64.fp(byte[]): fingerprint of raw bytes (``extend_byte`` fold,
    reference ``FPGenerator.java:102-107``)."""
    f = int(EMPTY)
    t7 = _T7
    for b in data:
        f ^= b
        f = (f >> 8) ^ int(t7[f & 0xFF])
    return _to_signed(f)


def fp64_batch(strings) -> np.ndarray:
    """Vectorized std64.fp over a sequence of strings -> int64 ndarray.

    Strategy: encode each string to UTF-16LE code units, pad into an
    (n, maxlen) uint64 matrix, then run the ``extend_char`` recurrence
    once per character *position* with the whole column vectorized.
    Rows shorter than the current position keep their value via a mask.
    """
    n = len(strings)
    out = np.full(n, EMPTY, dtype=np.uint64)
    if n == 0:
        return out.view(np.int64)
    encoded = [
        np.frombuffer((s or "").encode("utf-16-le"), dtype="<u2") for s in strings
    ]
    lengths = np.fromiter((e.size for e in encoded), count=n, dtype=np.int64)
    maxlen = int(lengths.max()) if n else 0
    if maxlen == 0:
        return out.view(np.int64).copy()
    mat = np.zeros((n, maxlen), dtype=np.uint64)
    for i, e in enumerate(encoded):
        if e.size:
            mat[i, : e.size] = e
    f = out
    for pos in range(maxlen):
        active = lengths > pos
        g = f ^ mat[:, pos]
        nf = (g >> _SH16) ^ _T6[(g & _MASK8).astype(np.int64)] ^ _T7[
            ((g >> _SH8) & _MASK8).astype(np.int64)
        ]
        f = np.where(active, nf, f)
    return f.view(np.int64).copy()


def _i32(v: int) -> int:
    """Wrap to Java signed 32-bit int."""
    v &= 0xFFFFFFFF
    return v - 0x100000000 if v >= 0x80000000 else v


def murmur32(data: bytes, seed: int) -> int:
    """MurmurHash2 32-bit with Java overflow semantics
    (reference ``MurmurHash.java:65-116``)."""
    m = 0x5BD1E995
    h = _i32(seed ^ len(data))
    length = len(data)
    len_4 = length >> 2
    for i in range(len_4):
        i4 = i << 2
        # Java assembles k from SIGNED byte 3 then ORs unsigned lower bytes.
        k = data[i4 + 3]
        if k >= 0x80:
            k -= 0x100  # signed byte
        k = _i32(k << 8) | data[i4 + 2]
        k = _i32(k << 8) | data[i4 + 1]
        k = _i32(k << 8) | data[i4 + 0]
        k = _i32(k * m)
        k ^= (k & 0xFFFFFFFF) >> 24
        k = _i32(k * m)
        h = _i32(h * m)
        h = _i32(h ^ k)
    left = length - (len_4 << 2)
    if left != 0:
        if left >= 3:
            b = data[length - 3]
            h = _i32(h ^ _i32((b - 0x100 if b >= 0x80 else b) << 16))
        if left >= 2:
            b = data[length - 2]
            h = _i32(h ^ _i32((b - 0x100 if b >= 0x80 else b) << 8))
        if left >= 1:
            b = data[length - 1]
            h = _i32(h ^ (b - 0x100 if b >= 0x80 else b))
        h = _i32(h * m)
    h ^= (h & 0xFFFFFFFF) >> 13
    h = _i32(h * m)
    h ^= (h & 0xFFFFFFFF) >> 15
    return _i32(h)


def murmur32_long(key: int, seed: int = 0) -> int:
    """MurmurHash over the 8 big-endian bytes of a (signed) 64-bit key,
    as the bloom filter does (reference ``Filter.java:85-104``)."""
    b = (key & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "big")
    return murmur32(b, seed)


_MM = np.uint32(0x5BD1E995)


def murmur32_long_batch(keys: np.ndarray, seeds) -> np.ndarray:
    """Vectorized murmur32_long over an int64 array. ``seeds`` is a
    scalar or an int32 array (seed chaining for the double hash).
    Returns int32 (Java-signed) values identical to the scalar path.

    For an 8-big-endian-byte key, the two little-endian int32 chunks
    are the byteswapped high and low 32-bit halves.
    """
    u = keys.astype(np.int64).view(np.uint64)
    hi = (u >> np.uint64(32)).astype(np.uint32).byteswap()
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32).byteswap()
    h = (np.uint32(seeds) if np.isscalar(seeds) else seeds.astype(np.int32).view(np.uint32)) ^ np.uint32(8)
    with np.errstate(over="ignore"):
        for k in (hi, lo):
            k = k * _MM
            k = k ^ (k >> np.uint32(24))
            k = k * _MM
            h = h * _MM
            h = h ^ k
        h = h ^ (h >> np.uint32(13))
        h = h * _MM
        h = h ^ (h >> np.uint32(15))
    return h.view(np.int32) if not np.isscalar(h) else np.int32(h)


def splitmix64(key: int, seed: int = 0) -> int:
    """SplitMix64 finalizer (Steele et al. 2014, public domain; the
    java.util.SplittableRandom mixer) over ``key ^ seed`` — the
    deterministic shuffle key used by the training-data shuffle
    export. Returns a signed int64."""
    z = (int(key) ^ int(seed)) & 0xFFFFFFFFFFFFFFFF
    z = (z + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    z = z ^ (z >> 31)
    return _to_signed(z)


def splitmix64_batch(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized splitmix64 over an int64 array; bit-identical to the
    scalar path (wrapping uint64 arithmetic)."""
    z = keys.astype(np.int64).view(np.uint64) ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z.view(np.int64)
