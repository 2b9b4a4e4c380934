"""HTTP header block parsing — status line, headers, content-type/charset.

Reimplements (SURVEY §2.2 P3-P5):

- ``NIOHttpHeaders.parseHttpHeaders`` (reference
  ``io/shared/NIOHttpHeaders.java:530``): lenient line-oriented parse;
  the status line and key-less lines are stored with a ``None`` key;
  ``findValue`` is a case-insensitive first match
  (``NIOHttpHeaders.java:87-98``); duplicate keys are kept in order.
- ``HttpHeaderUtils.parseContentType`` (``util/shared/HttpHeaderUtils.java:22-130``):
  mozilla-style content-type parse — LWS trimming, ``;``-separated
  params scanned for ``charset=``, quoted charset values, ``*/*`` and
  slash-less types rejected, later content-type headers override.
- ``HttpHeaderUtils.parseStatusLine`` (``HttpHeaderUtils.java:154-222``):
  lenient status extraction defaulting to 200.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_LWS = " \t"
_K_CHARSET = "charset="


@dataclass
class Headers:
    """Ordered (key, value) pairs; key None for the status line and
    key-less continuation junk."""

    items: list[tuple[str | None, str]] = field(default_factory=list)

    def find_value(self, key: str) -> str | None:
        kl = key.lower()
        for k, v in self.items:
            if k is not None and k.lower() == kl:
                return v
        return None

    def multi_values(self, key: str) -> list[str]:
        kl = key.lower()
        return [v for k, v in self.items if k is not None and k.lower() == kl]

    def value_at(self, i: int) -> str | None:
        return self.items[i][1] if i < len(self.items) else None


def parse_headers(header_text: str) -> Headers:
    """Parse a raw header block (status line included) into Headers.

    Mirrors ``NIOHttpHeaders.parseHttpHeadersAlternate``
    (``NIOHttpHeaders.java:499-528``) with the value-trim of the RFC-844
    parser: split lines on CR/LF; ``key: value`` when a colon exists and
    is not the last char and both sides are non-empty; otherwise the
    whole line is stored with a None key (status line, junk lines).
    """
    out = Headers()
    if not header_text:
        return out
    for line in re.split(r"[\r\n]+", header_text):
        if not line:
            continue
        colon = line.find(":")
        if colon != -1 and colon != len(line) - 1:
            key = line[:colon]
            val = line[colon + 1 :].strip()
            if key and val and not key.lower().startswith("http/"):
                out.items.append((key, val))
                continue
        out.items.append((None, line))
    return out


def _skip_past_lws(s: str, pos: int) -> int:
    while pos < len(s) and s[pos] in _LWS:
        pos += 1
    return pos


def _skip_to_lws_and_extra(s: str, pos: int) -> int:
    while pos < len(s) and s[pos] not in " \t;(":
        pos += 1
    return pos


def parse_content_type(content_type_values) -> tuple[str | None, str | None]:
    """-> (content_type, charset), both lowercased, either may be None.

    ``content_type_values`` is the ordered list of Content-Type header
    values; later values override (HttpHeaderUtils.parseContentType
    iterates the multi-value iterator re-using one output struct).
    """
    ctype: str | None = None
    charset: str | None = None
    for raw in content_type_values:
        if raw is None:
            continue
        ctype_new, charset_new, has_charset = _parse_one_content_type(raw)
        if ctype_new is not None:
            prev = ctype
            ctype = ctype_new
            if has_charset:
                charset = charset_new
            elif prev is not None and prev != ctype_new:
                charset = None
    return ctype, charset


def _parse_one_content_type(raw: str) -> tuple[str | None, str | None, bool]:
    type_val = min(_skip_past_lws(raw, 0), len(raw))
    type_end = _skip_to_lws_and_extra(raw, type_val)

    charset_val = 0
    charset_end = 0
    has_charset = False
    param_start = raw.find(";", type_end)
    if param_start != -1:
        cur = param_start + 1
        while True:
            cur_end = raw.find(";", cur)
            if cur_end == -1:
                cur_end = len(raw)
            name_start = min(_skip_past_lws(raw, cur), cur_end)
            cmp_end = min(name_start + len(_K_CHARSET), cur_end)
            if raw[name_start:cmp_end].lower() == _K_CHARSET:
                charset_val = name_start + len(_K_CHARSET)
                charset_end = cur_end
                has_charset = True
            cur = cur_end + 1
            if cur >= len(raw):
                break
    if has_charset:
        charset_val = min(_skip_past_lws(raw, charset_val), charset_end)
        if charset_val >= len(raw):
            has_charset = False
        else:
            first = raw[charset_val]
            if first in "\"'":
                charset_val += 1
                charset_end = raw.find(first, charset_val)
                if charset_end == -1:
                    charset_end = _skip_to_lws_and_extra(raw, charset_val)
            else:
                charset_end = min(_skip_to_lws_and_extra(raw, charset_val), charset_end)

    if len(raw) != 0 and raw != "*/*" and "/" in raw:
        ctype = raw[type_val:type_end].lower()
        cset = raw[charset_val:charset_end].lower() if has_charset else None
        return ctype, cset, has_charset
    return None, None, False


def parse_status_line(line: str | None) -> int:
    """HttpHeaderUtils.parseStatusLine (``HttpHeaderUtils.java:162-222``):
    lenient, default 200. Java's exact (buggy-lenient) condition
    ``(dot != -1 && dot != 5) || dot + 1 < len`` is preserved; index
    overruns that would throw in Java fall back to 200 here."""
    if line is None or len(line) < 4:
        return 200
    low = line.lower()
    if not low.startswith("http"):
        return 200
    if len(low) > 4:
        dot = low.find(".", 5)
        if (dot != -1 and dot != 5) or dot + 1 < len(low):
            if len(low) <= 5 or dot + 1 >= len(low):
                return 200  # Java would throw OOB; treat as default
            major, minor = low[5], low[dot + 1]
            if major.isdigit() and minor.isdigit():
                space = low.find(" ", dot + 1)
                if space != -1 and space + 1 < len(low):
                    start = space + 1
                    end = start
                    while end < len(low) and low[end].isdigit():
                        end += 1
                    if end > start:
                        try:
                            return int(low[start:end])
                        except ValueError:
                            return 0
    return 200


# Injected header names (reference crawl/common/shared/Constants.java:6-21)
HDR_HOST_IP = "x_commoncrawl_HostIP"
HDR_ARC_TIMESTAMP = "x_commoncrawl_ArcTimestamp"
HDR_ARC_MIMETYPE = "x_commoncrawl_ArcMimeType"
HDR_ARC_PAYLOAD_LEN = "x_commoncrawl_ArcPayloadLen"
HDR_SIGNATURE = "x_commoncrawl_Signature"
HDR_FETCH_TIMESTAMP = "x_commoncrawl_FetchTimestamp"
HDR_CONTENT_TRUNCATED = "x_commoncrawl_ContentTruncated"


_TS14 = re.compile(r"^(\d{4})(\d{2})(\d{2})(\d{2})(\d{2})(\d{2})$")


def parse_timestamp14(s: str) -> int | None:
    """ARC TIMESTAMP14 ``yyyyMMddHHmmss`` -> epoch millis (GMT), as the
    reference's SimpleDateFormat parse (``ARCFileReader.java:374``)."""
    m = _TS14.match(s.strip()) if s else None
    if not m:
        return None
    import calendar

    y, mo, d, h, mi, se = (int(g) for g in m.groups())
    try:
        return calendar.timegm((y, mo, d, h, mi, se, 0, 0, 0)) * 1000
    except Exception:
        return None


def format_timestamp14(epoch_ms: int) -> str:
    import time

    t = time.gmtime(epoch_ms // 1000)
    return f"{t.tm_year:04d}{t.tm_mon:02d}{t.tm_mday:02d}{t.tm_hour:02d}{t.tm_min:02d}{t.tm_sec:02d}"


# --------------------------------------------------------------------
# lenient HTTP/cookie date parse (P18)
# --------------------------------------------------------------------

_HTTP_DATE_DELIMS = "\t !\"#$%&'()*+,-./;<=>?@[\\]^_`{|}~"
_HTTP_MONTHS = ("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec")
_TIME_RE = re.compile(r"(\d+):(\d+):(\d+).*")


def parse_http_date(time_string: str | None) -> int:
    """Lenient HTTP/cookie expiration date -> epoch millis GMT, or -1.

    Port of the reference's Chromium-style tokenizer parser
    (``util/shared/DateUtils.java:87-214``): tokens split on a wide
    delimiter set; first month-prefix string = month, first ``h:m:s``
    = time, first <=2-digit number = day, first <=5-digit number =
    year; 2-digit years 69-99 -> 19xx, 0-68 -> 20xx; ranges validated
    exactly as the reference does."""
    if not time_string:
        return -1
    year = month = day = hour = minute = second = -1
    found_day = found_month = found_time = found_year = False
    token = ""
    tokens = []
    for ch in time_string:
        if ch in _HTTP_DATE_DELIMS:
            if token:
                tokens.append(token)
                token = ""
        else:
            token += ch
    if token:
        tokens.append(token)
    for tok in tokens:
        numerical = tok[0].isdigit() and ord(tok[0]) < 128
        if not numerical:
            if not found_month:
                low = tok.lower()
                for i, m in enumerate(_HTTP_MONTHS):
                    if low.startswith(m):
                        month = i + 1
                        found_month = True
                        break
            # else: timezone name -- ignored (reference expects GMT)
        elif ":" in tok:
            if not found_time:
                m = _TIME_RE.match(tok)
                if m:
                    try:
                        hour, minute, second = (int(g) for g in m.groups())
                        found_time = True
                    except ValueError:
                        pass
        else:
            if not found_day and len(tok) <= 2:
                try:
                    day = int(tok)
                    found_day = True
                except ValueError:
                    pass
            elif not found_year and len(tok) <= 5:
                try:
                    year = int(tok)
                    found_year = True
                except ValueError:
                    pass
    if not (found_day and found_month and found_time and found_year):
        return -1
    if 69 <= year <= 99:
        year += 1900
    elif 0 <= year <= 68:
        year += 2000
    if not (1 <= day <= 31 and 1 <= month <= 12 and 1601 <= year <= 30827
            and hour <= 23 and minute <= 59 and second <= 59):
        return -1
    import calendar

    return calendar.timegm((year, month, day, hour, minute, second, 0, 0, 0)) * 1000


# --------------------------------------------------------------------
# IPv4 string <-> int (P19, ``util/shared/IPAddressUtils.java:127-166``)
# --------------------------------------------------------------------


def ipv4_str_to_int(s: str) -> int | None:
    """Dotted-quad IPv4 -> unsigned 32-bit int, None if malformed."""
    parts = s.split(".") if s else []
    if len(parts) != 4:
        return None
    out = 0
    for p in parts:
        if not p.isdigit() or len(p) > 3:
            return None
        v = int(p)
        if v > 255:
            return None
        out = (out << 8) | v
    return out


def ipv4_int_to_str(v: int) -> str:
    v &= 0xFFFFFFFF
    return f"{(v >> 24) & 0xFF}.{(v >> 16) & 0xFF}.{(v >> 8) & 0xFF}.{v & 0xFF}"
