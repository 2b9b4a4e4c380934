"""Digest / encoding utilities: CRC16, Base64 variants, HexDump.

Parity ports of the reference's small codec helpers (SURVEY §2.2 P16):

- :class:`CRC16` — the LSB-first CRC-16/ARC (poly 0x8005 reflected =
  0xA001) of ``util/shared/CRC16.java:14-72``. The 256-entry table is
  generated from the polynomial instead of being transcribed; the
  generated values are identical (asserted in tests against the
  reference table's leading entries and the standard check vector).
- Base64 — the reference vendors the public-domain iharder Base64
  (``util/shared/Base64.java``) with STANDARD / URL_SAFE / ORDERED
  alphabets; here the stdlib codec provides STANDARD and URL_SAFE and
  the ORDERED alphabet is a byte-translation of STANDARD.
- :func:`dump_hex_string` / :func:`to_hex_string` /
  :func:`hex_string_to_bytes` — byte-for-byte output parity with
  ``util/shared/HexDump.java:27-166`` (16-byte lines, ``0x%08X``
  offsets, printable-ASCII gutter with the reference's exclusive
  ``' ' < b < '~'`` printable test on SIGNED bytes).
"""

from __future__ import annotations

import base64 as _b64


def _make_crc16_table() -> list[int]:
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ 0xA001 if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC16_TABLE = _make_crc16_table()


class CRC16:
    """Streaming CRC-16/ARC with the reference's Checksum interface."""

    def __init__(self):
        self.crc = 0

    def update(self, data: bytes | int) -> None:
        if isinstance(data, int):
            data = bytes([data & 0xFF])
        crc = self.crc
        table = _CRC16_TABLE
        for b in data:
            crc = (crc >> 8) ^ table[(crc ^ b) & 0xFF]
        self.crc = crc

    def get_value(self) -> int:
        return self.crc

    def reset(self) -> None:
        self.crc = 0


def crc16(data: bytes) -> int:
    c = CRC16()
    c.update(data)
    return c.get_value()


# --- Base64 (iharder option flags) -----------------------------------

NO_OPTIONS = 0
URL_SAFE = 16
ORDERED = 32

_STD = b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
# Base64.java:301 _ORDERED_ALPHABET: '-', digits, uppers, '_', lowers
_ORD = b"-0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ_abcdefghijklmnopqrstuvwxyz"
_STD_TO_ORD = bytes.maketrans(_STD, _ORD)
_ORD_TO_STD = bytes.maketrans(_ORD, _STD)


def b64_encode(data: bytes, options: int = NO_OPTIONS) -> str:
    if options & ORDERED:
        return _b64.b64encode(data).translate(_STD_TO_ORD).decode("ascii")
    if options & URL_SAFE:
        return _b64.urlsafe_b64encode(data).decode("ascii")
    return _b64.b64encode(data).decode("ascii")


def b64_decode(text: str, options: int = NO_OPTIONS) -> bytes:
    raw = text.encode("ascii")
    if options & ORDERED:
        raw = raw.translate(_ORD_TO_STD)
        return _b64.b64decode(raw)
    if options & URL_SAFE:
        return _b64.urlsafe_b64decode(raw)
    return _b64.b64decode(raw)


# --- HexDump ----------------------------------------------------------

_HEX = "0123456789ABCDEF"


def to_hex_string(data: bytes | int) -> str:
    """HexDump.toHexString: bytes -> uppercase hex; int -> 8-digit
    big-endian hex (HexDump.java:106-124)."""
    if isinstance(data, int):
        data = bytes(
            [(data >> 24) & 0xFF, (data >> 16) & 0xFF, (data >> 8) & 0xFF, data & 0xFF]
        )
    return "".join(_HEX[(b >> 4) & 0xF] + _HEX[b & 0xF] for b in data)


def _gutter(chunk: bytes) -> str:
    # Java: line[j] > ' ' && line[j] < '~' on SIGNED bytes
    out = []
    for b in chunk:
        signed = b - 256 if b >= 128 else b
        out.append(chr(b) if 0x20 < signed < 0x7E else ".")
    return "".join(out)


def dump_hex_string(data: bytes, offset: int = 0, length: int | None = None) -> str:
    """HexDump.dumpHexString byte-for-byte (HexDump.java:32-95)."""
    if length is None:
        length = len(data) - offset
    result = ["\n0x", to_hex_string(offset)]
    line = bytearray()
    for i in range(offset, offset + length):
        if len(line) == 16:
            result.append(" ")
            result.append(_gutter(bytes(line)))
            result.append("\n0x")
            result.append(to_hex_string(i))
            line.clear()
        b = data[i]
        result.append(" ")
        result.append(_HEX[(b >> 4) & 0xF])
        result.append(_HEX[b & 0xF])
        line.append(b)
    if len(line) != 16:
        result.append(" " * ((16 - len(line)) * 3 + 1))
        result.append(_gutter(bytes(line)))
    return "".join(result)


def hex_string_to_bytes(hex_string: str) -> bytes:
    """HexDump.hexStringToByteArray (accepts upper/lower case)."""
    return bytes(
        (int(hex_string[i], 16) << 4) | int(hex_string[i + 1], 16)
        for i in range(0, len(hex_string) - 1, 2)
    )


def md5_hex_column(col) -> list[str]:
    """MD5 hex digests of an Arrow string column, read straight off its
    UTF-8 data buffer via memoryview slices — no per-row Python string
    materialization or re-encode (VERDICT r4 #10). Null rows digest as
    the empty string, matching ``md5((t or "").encode())``. Byte input
    equals each row's UTF-8 buffer slice, so results are identical to
    the per-string loop it replaces.
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return []
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[arr.offset : arr.offset + n + 1]
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    md5 = hashlib.md5
    return [md5(data[offs[i] : offs[i + 1]]).hexdigest() for i in range(n)]
