"""P18 http-date parse, P19 IPv4, P20 matchers."""

from __future__ import annotations

import pyarrow as pa

from commoncrawl_ray.functions.http import (
    ipv4_int_to_str,
    ipv4_str_to_int,
    parse_http_date,
)
from commoncrawl_ray.functions.matchers import PrefixMatcher, SuffixMatcher


def test_parse_http_date_reference_vectors():
    # vectors from the reference's embedded test (DateUtils.java:216-224)
    assert parse_http_date("Sun, 22 Nov 2009 01:37:06GMT") != -1
    assert parse_http_date("Sun, 22 Nov 2009 01:37:06 GMT") != -1
    assert parse_http_date("Thu, 26 May 2011 03:40:51 GMT") != -1
    # RFC-1123 well-known instant
    assert parse_http_date("Thu, 01 Jan 1970 00:00:00 GMT") == 0
    assert parse_http_date("Thu, 01 Jan 1970 00:00:01 GMT") == 1000
    # cookie-style abbreviated year: 17 -> 2017
    assert parse_http_date("Sat, 15-Apr-17 21:01:22 GMT") == 1492290082000
    # 2-digit year 99 -> 1999
    y99 = parse_http_date("01 Jan 99 00:00:00 GMT")
    assert y99 == parse_http_date("01 Jan 1999 00:00:00 GMT") != -1


def test_parse_http_date_malformed():
    assert parse_http_date(None) == -1
    assert parse_http_date("") == -1
    assert parse_http_date("not a date") == -1
    assert parse_http_date("32 Jan 2009 01:00:00") == -1  # day out of range
    assert parse_http_date("10 Jan 2009") == -1  # no time
    assert parse_http_date("10 Jan 2009 25:00:00") == -1  # hour out of range


def test_ipv4_roundtrip():
    for s, v in [("0.0.0.0", 0), ("255.255.255.255", 0xFFFFFFFF), ("10.1.2.7", (10 << 24) | (1 << 16) | (2 << 8) | 7)]:
        assert ipv4_str_to_int(s) == v
        assert ipv4_int_to_str(v) == s
    assert ipv4_str_to_int("256.1.1.1") is None
    assert ipv4_str_to_int("1.2.3") is None
    assert ipv4_str_to_int("a.b.c.d") is None


def test_prefix_suffix_matchers():
    pm = PrefixMatcher(["http://a.com/", "http://a.com/deep/", "http://b.com/"])
    assert pm.matches("http://a.com/deep/page")
    assert pm.shortest_match("http://a.com/deep/page") == "http://a.com/"
    assert pm.longest_match("http://a.com/deep/page") == "http://a.com/deep/"
    assert not pm.matches("http://c.com/")

    arr = pa.array(["http://a.com/x", "http://c.com/", "http://b.com/y"])
    assert pm.mask(arr).to_pylist() == [True, False, True]

    sm = SuffixMatcher([".html", ".htm"])
    assert sm.matches("index.html")
    assert sm.shortest_match("index.html") == ".html"  # .htm doesn't suffix-match
    assert not sm.matches("index.pdf")
    assert sm.mask(pa.array(["a.html", "b.pdf", "c.htm"])).to_pylist() == [True, False, True]


def test_filter_by_prefix_ds(ray_session):
    import ray.data as rd

    from commoncrawl_ray.functions.matchers import filter_by_prefix

    ds = rd.from_items(
        [{"url": "http://a.com/1"}, {"url": "http://b.com/2"}, {"url": "http://c.com/3"}]
    )
    kept = filter_by_prefix(ds, "url", ["http://a.com/", "http://c.com/"]).to_pandas()
    assert sorted(kept["url"]) == ["http://a.com/1", "http://c.com/3"]
