"""Content-defined chunking (CDC) — Rabin-style rolling-hash
boundaries over raw bytes.

The storage-layer dedup primitive (Muthitacharoen, Chen & Mazières,
"A low-bandwidth network file system", SOSP 2001): cut points are
chosen where a rolling hash of the last ``window`` bytes hits a
pattern, so an insertion or deletion only reshuffles the chunks
around the edit instead of shifting every fixed-size block — the
property that makes chunk-level dedup work across near-identical
web captures. Web archives apply exactly this to WARC payload
streams; here the same kernel feeds the corpus-level chunk-dedup
census (pipelines/queries.q_cdc_dedup).

The kernel is shared verbatim by the distributed query and the
sequential oracle, so the value-hash check verifies the DISTRIBUTED
aggregation over a common deterministic chunking.
"""

from __future__ import annotations

import hashlib

import numpy as np

_P = np.uint64(1099511628211)  # FNV prime as the polynomial base


def cdc_boundaries(
    data: bytes, window: int = 16, avg_bits: int = 6, min_size: int = 24
) -> list[int]:
    """Cut positions (exclusive chunk ends) for ``data``.

    A position ``i`` (end of a ``window``-byte run) is a cut when the
    polynomial rolling hash of that run has its low ``avg_bits`` bits
    zero — expected chunk size ~2^avg_bits bytes. Cuts closer than
    ``min_size`` to the previous cut are suppressed (the standard
    minimum-chunk clamp). The final boundary ``len(data)`` is always
    included. Vectorized: ``window`` shifted multiply-adds, no
    per-byte Python."""
    n = len(data)
    if n <= window or n <= min_size:
        return [n] if n else []
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    m = n - window + 1
    with np.errstate(over="ignore"):
        pows = _P ** np.arange(window, dtype=np.uint64)
        h = np.zeros(m, dtype=np.uint64)
        for j in range(window):
            h += b[j : j + m] * pows[window - 1 - j]
    mask = np.uint64((1 << avg_bits) - 1)
    ends = np.nonzero((h & mask) == 0)[0] + window  # cut AFTER the run
    out: list[int] = []
    prev = 0
    for e in ends.tolist():
        if e - prev >= min_size and e < n:
            out.append(e)
            prev = e
    out.append(n)
    return out


def cdc_chunk_fps(data: bytes, **kw) -> list[tuple[int, int]]:
    """``data`` -> [(chunk_fp int64, chunk_len)] under cdc_boundaries.

    Chunk fingerprint = low 63 bits of the md5 of the chunk bytes
    (md5 runs at C speed; 63 bits keeps the int64 wire positive)."""
    out = []
    prev = 0
    for e in cdc_boundaries(data, **kw):
        c = data[prev:e]
        fp = int.from_bytes(hashlib.md5(c).digest()[:8], "big") >> 1
        out.append((fp, e - prev))
        prev = e
    return out
