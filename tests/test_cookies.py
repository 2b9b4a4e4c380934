"""T4 cookie store: RFC-6265-ish domain/path/expiry matching."""

from __future__ import annotations

from commoncrawl_ray.state.cookies import CookieStore


def test_basic_set_get():
    s = CookieStore()
    assert s.set_cookie("http://a.com/x/y", "sid=abc123")
    assert s.get_cookies("http://a.com/x/z") == "sid=abc123"  # default path /x
    assert s.get_cookies("http://a.com/") == ""  # path mismatch
    assert s.get_cookies("http://b.com/x/z") == ""  # host mismatch


def test_domain_cookies_and_host_only():
    s = CookieStore()
    s.set_cookie("http://shop.a.com/", "d=1; Domain=a.com; Path=/")
    s.set_cookie("http://shop.a.com/", "h=2; Path=/")
    assert s.get_cookies("http://www.a.com/") == "d=1"  # domain cookie matches subdomains
    got = s.get_cookies("http://shop.a.com/")
    assert "d=1" in got and "h=2" in got
    # foreign-domain set is rejected
    assert not s.set_cookie("http://evil.com/", "x=1; Domain=a.com")


def test_path_sort_longest_first():
    s = CookieStore()
    s.set_cookie("http://a.com/", "root=1; Path=/")
    s.set_cookie("http://a.com/", "deep=2; Path=/x/y")
    assert s.get_cookies("http://a.com/x/y/z") == "deep=2; root=1"


def test_expiry_max_age_and_expires():
    s = CookieStore()
    now = 1_000_000_000_000
    s.set_cookie("http://a.com/", "t=1; Path=/; Max-Age=10", now_ms=now)
    assert s.get_cookies("http://a.com/", now_ms=now + 5_000) == "t=1"
    assert s.get_cookies("http://a.com/", now_ms=now + 11_000) == ""
    assert len(s) == 0  # expired entry evicted
    s.set_cookie("http://a.com/", "u=2; Path=/; Expires=Thu, 01 Jan 1970 00:00:10 GMT")
    assert s.get_cookies("http://a.com/", now_ms=20_000) == ""
    assert s.get_cookies("http://a.com/", now_ms=5_000) == ""  # already evicted? no: re-set
    s.set_cookie("http://a.com/", "v=3; Path=/; Expires=Thu, 01 Jan 1970 00:00:10 GMT")
    assert s.get_cookies("http://a.com/", now_ms=5_000) == "v=3"


def test_malformed_cookies_rejected():
    s = CookieStore()
    assert not s.set_cookie("http://a.com/", "")
    assert not s.set_cookie("http://a.com/", "noequals")
    assert not s.set_cookie("http://a.com/", "=bare")
