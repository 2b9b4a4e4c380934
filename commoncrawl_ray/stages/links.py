"""Out-link resolution — raw hrefs -> absolute candidate URLs.

The reference extracts anchors during metadata building (NodeWalker,
``util/shared/NodeWalker.java:21``; anchor fields in
``protocol/shared/protocol.jr:96-103``). Our frontier-discovery path
resolves each href against the page URL (honoring ``<base>``), then
canonicalizes + fingerprints (SURVEY §7 step 4).
"""

from __future__ import annotations

from urllib.parse import urljoin

_SKIP_PREFIXES = ("javascript:", "mailto:", "data:", "tel:", "#")


def resolve_links_aligned(
    page_url: str, hrefs: list[str], base: str | None = None
) -> list[str | None]:
    """Position-aligned variant of :func:`resolve_links` — same
    resolution and drop rules, but the output keeps one slot per input
    href (``None`` where dropped) and does NOT de-duplicate, so a
    caller can zip resolved targets with per-href payloads (anchor
    text)."""
    root = urljoin(page_url, base) if base else page_url
    out: list[str | None] = []
    for href in hrefs:
        h = href.strip()
        if not h or h.lower().startswith(_SKIP_PREFIXES):
            out.append(None)
            continue
        try:
            absu = urljoin(root, h)
        except ValueError:
            out.append(None)
            continue
        out.append(absu if absu.lower().startswith(("http://", "https://")) else None)
    return out


def resolve_links(page_url: str, hrefs: list[str], base: str | None = None) -> list[str]:
    """Resolve raw hrefs to absolute URLs (RFC 3986 reference
    resolution). Non-navigational schemes and bare fragments dropped.
    Order-preserving, per-page de-duplicated."""
    root = urljoin(page_url, base) if base else page_url
    out: list[str] = []
    seen: set[str] = set()
    for href in hrefs:
        h = href.strip()
        if not h or h.lower().startswith(_SKIP_PREFIXES):
            continue
        try:
            absu = urljoin(root, h)
        except ValueError:
            continue
        if not absu.lower().startswith(("http://", "https://")):
            continue
        if absu not in seen:
            seen.add(absu)
            out.append(absu)
    return out
