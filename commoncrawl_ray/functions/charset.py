"""Charset sniff → detect → alias → decode ("best effort" text decode).

Reimplements ``util/shared/CharsetUtils.java`` (SURVEY §2.2 P6):

- :func:`sniff_charset` == ``sniffCharacterEncoding``
  (``CharsetUtils.java:116-172``): regex over the ASCII-decoded first
  2000 bytes for ``<meta http-equiv="content-type" ... charset=...>``.
- :func:`best_effort_decode` == ``bestEffortDecodeBytes``
  (``CharsetUtils.java:38-114``), precedence preserved exactly:
  1. header content-type charset;
  2. for ``text/html`` WITH a header charset, the meta sniff *overrides*;
  3. if still none and the type is text-ish, run detection, falling
     back to ASCII;
  4. alias-map the charset name; decode with replacement.
- :func:`detect_charset`: the reference uses the ported Mozilla chardet
  state machines (``org/mozilla/intl/chardet/nsDetector.java``, ~4k
  LoC). That port is out of scope here — our detector is a small
  deterministic stand-in (UTF-8 validity test, else windows-1252),
  which our golden fixtures are generated against. The *precedence*
  logic above is the parity-bearing part.
"""

from __future__ import annotations

import re

_CHUNK_SIZE = 2000
_META_PATTERN = re.compile(
    r'<meta\s+([^>]*http-equiv="?content-type"?[^>]*)>', re.IGNORECASE
)
_CHARSET_PATTERN = re.compile(r"charset=\s*([a-z][_\-0-9a-z]*)", re.IGNORECASE)

# Alias table (subset of CharsetUtils.java:228+, mapped to Python codec
# names). Keys must be lowercase.
_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "ascii": "ascii",
    "us-ascii": "ascii",
    "iso-8859-1": "iso-8859-1",
    "iso8859-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "l1": "iso-8859-1",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "win-1252": "windows-1252",
    "iso-8859-15": "iso-8859-15",
    "iso-8859-2": "iso-8859-2",
    "windows-1251": "windows-1251",
    "cp1251": "windows-1251",
    "koi8-r": "koi8-r",
    "koi8r": "koi8-r",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "euc-jp": "euc-jp",
    "x-euc-jp": "euc-jp",
    "gb2312": "gb2312",
    "gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "euc-kr": "euc-kr",
    "iso-2022-jp": "iso-2022-jp",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def sniff_charset(content: bytes) -> str | None:
    """Meta-tag charset sniff over the first 2000 bytes."""
    chunk = content[:_CHUNK_SIZE].decode("ascii", errors="replace")
    m = _META_PATTERN.search(chunk)
    if m:
        cm = _CHARSET_PATTERN.search(m.group(1))
        if cm:
            return cm.group(1)
    return None


def detect_charset(content: bytes) -> str | None:
    """Deterministic stand-in for the Mozilla chardet port: valid UTF-8
    (with at least one non-ASCII byte) -> utf-8; pure ASCII -> None
    (detector reports nothing); else windows-1252."""
    probe = content[:16000]
    try:
        probe.decode("ascii")
        return None
    except UnicodeDecodeError:
        pass
    try:
        probe.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def resolve_alias(charset: str | None) -> str | None:
    if charset is None:
        return None
    return _ALIASES.get(charset.lower(), charset.lower())


def _codec_or_none(name: str | None):
    if name is None:
        return None
    import codecs

    try:
        return codecs.lookup(name).name
    except LookupError:
        return None


def best_effort_decode(
    content_type: str | None, header_charset: str | None, body: bytes
) -> tuple[str | None, str | None]:
    """-> (decoded_text, charset_used). None text when undecodable /
    typeless, mirroring bestEffortDecodeBytes returning null."""
    from .mime import is_text_type

    charset = header_charset
    if charset is not None and content_type is not None and content_type.lower() == "text/html":
        sniffed = sniff_charset(body)
        if sniffed is not None:
            charset = sniffed
    if charset is None:
        if content_type is not None and is_text_type(content_type):
            detected = detect_charset(body)
            charset = detected if detected is not None else "ascii"
    if charset is None:
        return None, None
    charset = resolve_alias(charset)
    codec = _codec_or_none(charset)
    if codec is None:
        detected = detect_charset(body)
        codec = _codec_or_none(resolve_alias(detected))
    if codec is None:
        return None, charset
    try:
        return body.decode(codec, errors="replace"), codec
    except Exception:
        return None, codec
