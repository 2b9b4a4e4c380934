"""SURT — Sort-friendly URI Reordering Transform.

The key scheme of web-archive capture indexes (CDX/CDXJ): the host is
reversed into most-significant-label-first order so that lexicographic
sort groups every capture of a site (and of a whole domain tree)
contiguously — ``http://www.example.com/a?x=1`` becomes
``com,example)/a?x=1``. Built from the PUBLIC spec and the de-facto
behavior of IA's webarchive-commons SURT / the pywb ``surt`` package
(the reference library predates CDX and has no counterpart; its
URL canonicalizer — functions/canonicalize.py, cited there to
``URLUtils.java:355-434`` — supplies the normalization SURT sits on).

Rules implemented (pywb-default profile):
- canonicalize first (lowercase scheme/host, strip default port and
  ``www.``, resolve dot segments, drop fragment, strip session ids);
- drop the scheme and any userinfo from the key;
- reverse host labels, join with ``,``; keep a non-default port as
  ``com,example:8080)``;
- append ``)`` then the path; query args are split on ``&``, sorted
  bytewise and re-joined, so equivalent capture URLs collide;
- IP-literal hosts are NOT reversed (reversing digits is meaningless
  for range scans — matches webarchive-commons ``SURT.java`` intent).
"""

from __future__ import annotations

from .canonicalize import canonicalize_url, parse_url


def _host_is_ipv4(host: str) -> bool:
    parts = host.split(".")
    return len(parts) == 4 and all(p.isdigit() for p in parts)


def surt(url: str) -> str | None:
    """URL -> SURT key, or None when the URL cannot be canonicalized.
    Deterministic, pure; the CDX writer sorts on this string."""
    canon = canonicalize_url(url)
    if canon is None:
        return None
    parts = parse_url(canon)
    if not parts.valid or not parts.host:
        return None
    host = parts.host.rstrip(".")
    if _host_is_ipv4(host) or host.startswith("["):
        key_host = host
    else:
        key_host = ",".join(reversed(host.split(".")))
    out = [key_host]
    if parts.port and parts.port != "80":
        out.append(":")
        out.append(parts.port)
    out.append(")")
    out.append(parts.path or "/")
    if parts.query:
        args = sorted(a for a in parts.query.split("&") if a)
        if args:
            out.append("?")
            out.append("&".join(args))
    return "".join(out)


def surt_host_prefix(host_or_url: str) -> str | None:
    """Host (or any URL of it) -> the SURT prefix that matches every
    capture of that exact host: ``com,example)``. Feed this to
    cdx_lookup for a per-site range scan; chop the trailing ``)`` to
    scan the whole registered-domain subtree instead."""
    h = host_or_url
    if "://" in h:
        canon = canonicalize_url(h)
        if canon is None:
            return None
        parts = parse_url(canon)
        if not parts.valid or not parts.host:
            return None
        h = parts.host
    h = h.lower().rstrip(".")
    if h.startswith("www."):
        h = h[4:]
    if not h:
        return None
    if _host_is_ipv4(h):
        return h + ")"
    return ",".join(reversed(h.split("."))) + ")"
