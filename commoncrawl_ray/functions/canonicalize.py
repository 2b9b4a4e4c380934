"""URL parsing + canonicalization + URLFPV2 fingerprinting.

This is the engine's equivalent of the reference composition
(SURVEY §2.2 P9-P13):

- ``GoogleURL`` / native ``url_canon`` (reference
  ``util/shared/GoogleURL.java:29-221`` + ``src/native/src/libGoogleURL``):
  scheme/host lowercasing, percent-encoding normalization, backslash →
  slash, dot-segment resolution, default-port elision. The ~12k-LoC C++
  library cannot run in this sandbox, so the rules below are OUR spec'd
  canonicalization (same composition, locked by golden tests) — see
  SURVEY §7 "hard parts" item 2.
- ``URLUtils.canonicalizeURL`` (``URLUtils.java:355-434``): assemble
  scheme://[user[:pass]@]host[:port]path[?query]; trailing-host-dot
  strip; conditional ``www.`` strip (only when host != root domain,
  the "nasty hack" branch ``URLUtils.java:397-407``); port-80 elision;
  path truncated at first ``;``; fragment dropped; then session-id
  normalization (:func:`normalize_sessionid`).
- ``URLUtils.getURLFPV2FromCanonicalURL`` (``URLUtils.java:308-336``):
  ``url_fp = FP64(canon_url)``; ``domain_fp = FP64(host minus
  conditional www.)``; ``root_domain_fp = FP64(root domain)``; returns
  None when the host has no recognizable root domain.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache

from .fingerprint import fp64
from .sessionid import normalize_sessionid
from .tld import extract_root_domain

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+\-.]*):")
_CTRL_TAB_NL = re.compile(r"[\t\r\n]")
_STANDARD_SCHEMES = {"http": "80", "https": "443", "ftp": "21"}
_HOST_OK = re.compile(r"^[a-z0-9\-._]+$")
_HEX = "0123456789ABCDEF"

# Characters that stay literal in a canonical path; everything else is
# percent-encoded (url_canon's path charset, conservative superset).
_PATH_SAFE = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "-._~!$&'()*+,;=:@/%"
)
_QUERY_SAFE = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "-._~!$&'()*+,;=:@/?%"
)


@dataclass
class UrlParts:
    """Parsed canonical components (cf. GoogleURL component getters,
    ``GoogleURL.java:107-141``). Empty string == component absent."""

    valid: bool
    scheme: str = ""
    username: str = ""
    password: str = ""
    host: str = ""
    port: str = ""  # "" when absent or default for scheme
    path: str = ""
    query: str = ""  # without '?'
    ref: str = ""  # without '#'


def _pct_normalize(text: str, safe: frozenset, plus_ok: bool = True) -> str:
    """Normalize percent-encoding: uppercase valid escapes, escape bare
    '%' and unsafe chars, UTF-8-encode non-ASCII."""
    out = []
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == "%":
            if i + 2 < n + 1 and i + 3 <= n and _is_hex(text[i + 1 : i + 3]):
                out.append("%" + text[i + 1 : i + 3].upper())
                i += 3
                continue
            out.append("%25")
            i += 1
            continue
        if c in safe:
            out.append(c)
        else:
            for b in c.encode("utf-8"):
                out.append("%" + _HEX[b >> 4] + _HEX[b & 15])
        i += 1
    return "".join(out)


def _is_hex(s: str) -> bool:
    return len(s) == 2 and s[0] in "0123456789abcdefABCDEF" and s[1] in "0123456789abcdefABCDEF"


def _canon_host(raw: str) -> str | None:
    """Lowercase, %-unescape, IDN-encode, validate. None => invalid."""
    host = raw.strip().lower()
    if "%" in host:
        # unescape then re-validate (url_canon host canonicalizer)
        try:
            from urllib.parse import unquote

            host = unquote(host)
        except Exception:
            return None
        host = host.lower()
    if not host:
        return None
    if not _HOST_OK.match(host):
        # try IDN (non-ASCII labels -> punycode)
        try:
            host = host.encode("idna").decode("ascii").lower()
        except Exception:
            return None
        if not _HOST_OK.match(host):
            return None
    if ".." in host:
        return None
    # a host that is nothing but dots canonicalizes to empty after the
    # trailing-dot strip downstream => invalid URL, not "http:///"
    if host.strip(".") == "":
        return None
    return host


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 (url_canon path resolution)."""
    segments: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if segments:
                segments.pop()
            continue
        segments.append(seg)
    # preserve leading '/' (path always starts with '/') and trailing
    # '/' semantics of '.'/'..' terminal segments
    out = "/".join(segments)
    if not out.startswith("/"):
        out = "/" + out
    if (path.endswith("/.") or path.endswith("/..") or path.endswith("/")) and not out.endswith("/"):
        out += "/"
    return out


def parse_url(url: str) -> UrlParts:
    """Parse + canonicalize a URL into components (our GoogleURL spec).

    Only standard crawlable schemes (http/https/ftp) are valid, which
    matches how the crawl path uses GoogleURL results.
    """
    if url is None:
        return UrlParts(False)
    s = _CTRL_TAB_NL.sub("", url.strip(" \x00\x01\x02\x03\x04\x05\x06\x07\x08\x0b\x0c\x0e\x0f"))
    m = _SCHEME_RE.match(s)
    if not m:
        return UrlParts(False)
    scheme = m.group(1).lower()
    if scheme not in _STANDARD_SCHEMES:
        return UrlParts(False)
    rest = s[m.end() :]
    # allow scheme:/\ variants: consume all leading '/' or '\'
    i = 0
    while i < len(rest) and rest[i] in "/\\":
        i += 1
    if i == 0:
        return UrlParts(False)
    rest = rest[i:]
    # authority ends at first /, \, ?, or #
    auth_end = len(rest)
    for j, c in enumerate(rest):
        if c in "/\\?#":
            auth_end = j
            break
    authority = rest[:auth_end]
    after = rest[auth_end:]

    username = password = ""
    at = authority.rfind("@")
    hostport = authority
    if at != -1:
        userinfo = authority[:at]
        hostport = authority[at + 1 :]
        if ":" in userinfo:
            username, password = userinfo.split(":", 1)
        else:
            username = userinfo
    # split port (IPv6 literals not supported by the reference either)
    host_raw, port = hostport, ""
    colon = hostport.rfind(":")
    if colon != -1:
        maybe_port = hostport[colon + 1 :]
        if maybe_port.isdigit() or maybe_port == "":
            host_raw, port = hostport[:colon], maybe_port
    host = _canon_host(host_raw)
    if host is None:
        return UrlParts(False)
    if port:
        if int(port) > 65535:  # out of range => invalid URL (url_canon port rule)
            return UrlParts(False)
        port = str(int(port))  # strip leading zeros
        if port == _STANDARD_SCHEMES[scheme]:
            port = ""

    # split path / query / ref
    path, query, ref = after, "", ""
    h = path.find("#")
    if h != -1:
        ref = path[h + 1 :]
        path = path[:h]
    q = path.find("?")
    if q != -1:
        query = path[q + 1 :]
        path = path[:q]
    path = path.replace("\\", "/")
    if not path.startswith("/"):
        path = "/" + path
    path = _pct_normalize(path, _PATH_SAFE)
    path = _remove_dot_segments(path)
    query = _pct_normalize(query, _QUERY_SAFE) if query else query

    return UrlParts(True, scheme, username, password, host, port, path, query, ref)


def canonicalize_url(url: str, strip_www: bool = True) -> str | None:
    """URLUtils.canonicalizeURL (``URLUtils.java:355-434``).

    Returns the canonical URL string, or None for invalid URLs (the
    reference throws MalformedURLException).
    """
    parts = parse_url(url)
    if not parts.valid:
        return None
    return canonicalize_parts(parts, strip_www)


def canonicalize_parts(parts: UrlParts, strip_www: bool = True) -> str:
    out = [parts.scheme, "://"]
    if parts.username:
        out.append(parts.username)
        if parts.password:
            out.append(":")
            out.append(parts.password)
        out.append("@")
    host = parts.host
    if host.endswith("."):
        host = host[:-1]
    if strip_www and host.startswith("www."):
        root = extract_root_domain(host)
        # "nasty hack": strip www. unless host IS the root domain
        if root is None or root != host:
            host = host[4:]
    out.append(host)
    if parts.port and parts.port != "80":
        out.append(":")
        out.append(parts.port)
    if parts.path:
        semi = parts.path.find(";")
        if semi != -1:
            # the ;-param slice can expose a fresh dot segment ("/.;x"
            # -> "/."); re-normalize so canonicalization is idempotent
            out.append(_remove_dot_segments(parts.path[:semi]))
        else:
            out.append(parts.path)
    if parts.query:
        out.append("?")
        out.append(parts.query)
    canon = normalize_sessionid("".join(out))
    # a query emptied by session-id stripping (or a raw "?") must not
    # leave a dangling separator — canonicalization is idempotent
    return canon.rstrip("?&")


def host_from_canonical(canon_url: str) -> str | None:
    """URLUtils.fastGetHostFromURL (``URLUtils.java:438-470``): host
    slice of a canonical URL (may include a port-less host only)."""
    colon = canon_url.find(":")
    if colon == -1 or canon_url[colon : colon + 3] != "://":
        return None
    start = colon + 3
    at = canon_url.find("@", start)
    slash = canon_url.find("/", start)
    if at != -1 and (slash == -1 or at < slash):
        start = at + 1
    end = len(canon_url)
    for j in range(start, len(canon_url)):
        if canon_url[j] in ":/?#":
            end = j
            break
    host = canon_url[start:end]
    return host or None


@lru_cache(maxsize=65536)
def _domain_fps(host: str) -> tuple[int, int] | None:
    """(domain_fp, root_domain_fp) for a canonical host, applying the
    conditional www-strip of ``URLUtils.java:316-331``. Cached: the
    host pool is tiny relative to URL volume."""
    root = extract_root_domain(host)
    if root is None:
        return None
    if host.startswith("www.") and root != host:
        host = host[4:]
    return fp64(host), fp64(root)


def url_fpv2_from_canonical(canon_url: str) -> tuple[int, int, int] | None:
    """URLUtils.getURLFPV2FromCanonicalURL (``URLUtils.java:308-336``)
    -> (domain_fp, url_fp, root_domain_fp) or None."""
    host = host_from_canonical(canon_url)
    if host is None:
        return None
    fps = _domain_fps(host)
    if fps is None:
        return None
    return fps[0], fp64(canon_url), fps[1]


def url_fpv2(url: str) -> tuple[str, int, int, int] | None:
    """URLUtils.getURLFPV2FromURL: canonicalize then fingerprint.
    -> (canon_url, domain_fp, url_fp, root_domain_fp) or None."""
    canon = canonicalize_url(url, True)
    if canon is None:
        return None
    fps = url_fpv2_from_canonical(canon)
    if fps is None:
        return None
    return (canon, *fps)
