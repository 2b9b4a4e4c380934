"""Per-fetch-actor HTTP cookie store (SURVEY T4).

Implements the contract of the reference's cookie store
(`io/internal/NIOHttpCookieStore.java:11-28`: ``GetCookies(url)`` /
``setCookie(url, cookie)``) with RFC-6265-style matching: domain
suffix match (host-only cookies when no Domain attribute), path prefix
match, expiry via Max-Age / Expires (lenient date parse P18).

Plain object, not an actor: the reference scopes cookies to a fetch
connection; here the store lives inside whatever fetch worker holds
the HTTP client (the sandbox's simulated fetch doesn't use cookies,
but the store is real and tested — a live fetch stage instantiates one
per actor)."""

from __future__ import annotations

from dataclasses import dataclass

from ..functions.http import parse_http_date


def _split_url(url: str) -> tuple[str, str]:
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    if slash == -1:
        return rest.lower(), "/"
    host = rest[:slash].lower()
    path = rest[slash:]
    q = path.find("?")
    if q != -1:
        path = path[:q]
    return host, path or "/"


def _default_path(path: str) -> str:
    """RFC 6265 §5.1.4 default-path."""
    if not path.startswith("/") or path == "/":
        return "/"
    last = path.rfind("/")
    return path[:last] if last > 0 else "/"


def _domain_match(host: str, cookie_domain: str) -> bool:
    if host == cookie_domain:
        return True
    return host.endswith("." + cookie_domain)


def _path_match(req_path: str, cookie_path: str) -> bool:
    if req_path == cookie_path:
        return True
    if req_path.startswith(cookie_path):
        return cookie_path.endswith("/") or req_path[len(cookie_path)] == "/"
    return False


@dataclass
class _Cookie:
    name: str
    value: str
    domain: str
    host_only: bool
    path: str
    expires_ms: int | None  # None = session cookie


class CookieStore:
    """GetCookies / setCookie per the reference interface."""

    def __init__(self):
        self._jar: dict[tuple[str, str, str], _Cookie] = {}

    def set_cookie(self, url: str, set_cookie_header: str, now_ms: int = 0) -> bool:
        host, req_path = _split_url(url)
        parts = [p.strip() for p in set_cookie_header.split(";")]
        if not parts or "=" not in parts[0]:
            return False
        name, _, value = parts[0].partition("=")
        name = name.strip()
        if not name:
            return False
        domain, path, expires = None, None, None
        for attr in parts[1:]:
            k, _, v = attr.partition("=")
            k = k.strip().lower()
            v = v.strip()
            if k == "domain" and v:
                domain = v.lstrip(".").lower()
            elif k == "path" and v.startswith("/"):
                path = v
            elif k == "max-age":
                try:
                    expires = now_ms + int(v) * 1000
                except ValueError:
                    pass
            elif k == "expires" and expires is None:
                t = parse_http_date(v)
                if t != -1:
                    expires = t
        if domain is not None:
            if not _domain_match(host, domain):
                return False  # reject foreign-domain cookies
            host_only = False
        else:
            domain = host
            host_only = True
        if path is None:
            path = _default_path(req_path)
        self._jar[(domain, path, name)] = _Cookie(
            name, value.strip(), domain, host_only, path, expires
        )
        return True

    def get_cookies(self, url: str, now_ms: int = 0) -> str:
        """The Cookie header value for a request url ('' if none),
        longest path first (RFC 6265 §5.4 sort order)."""
        host, req_path = _split_url(url)
        out = []
        dead = []
        for key, c in self._jar.items():
            if c.expires_ms is not None and c.expires_ms <= now_ms:
                dead.append(key)
                continue
            if c.host_only:
                if host != c.domain:
                    continue
            elif not _domain_match(host, c.domain):
                continue
            if not _path_match(req_path, c.path):
                continue
            out.append(c)
        for key in dead:
            del self._jar[key]
        out.sort(key=lambda c: (-len(c.path), c.name))
        return "; ".join(f"{c.name}={c.value}" for c in out)

    def __len__(self) -> int:
        return len(self._jar)
