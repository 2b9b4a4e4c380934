"""Tolerant gzip inflate with size cap + truncation flag.

Reimplements ``GZIPUtils.unzipBestEffort`` (reference
``util/shared/GZIPUtils.java:56-114``, SURVEY §2.2 P7): inflate as much
of a possibly-truncated gzip stream as possible, stop at ``size_limit``
output bytes, and report whether the result was truncated (either by
the limit or by a corrupt/incomplete stream). The TruncatedInInflate /
TruncatedInDownload flag bits live in ``protocol/shared/protocol.jr:20-23``.
"""

from __future__ import annotations

import zlib

# ArcFileItem.Flags (protocol/shared/protocol.jr:20-23)
FLAG_TRUNCATED_IN_DOWNLOAD = 1
FLAG_TRUNCATED_IN_INFLATE = 2


def unzip_best_effort(data: bytes, size_limit: int = 64 * 1024 * 1024) -> tuple[bytes | None, bool]:
    """-> (inflated_bytes_or_None, truncated). None only when nothing at
    all could be inflated (bad header)."""
    d = zlib.decompressobj(wbits=31)  # gzip wrapper
    out = bytearray()
    truncated = False
    try:
        chunk = d.decompress(data, size_limit + 1)
        out.extend(chunk)
        if len(out) > size_limit:
            del out[size_limit:]
            truncated = True
        elif not d.eof:
            # stream ended mid-member
            truncated = True
    except zlib.error:
        truncated = True
    if not out and truncated and not data:
        return None, True
    if not out and truncated:
        # header was bad enough that nothing inflated
        return (bytes(out), True) if data[:2] == b"\x1f\x8b" else (None, True)
    return bytes(out), truncated
