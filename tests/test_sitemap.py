"""Sitemap source tests: canonical writer bytes, namespace-tolerant
parser, index handling (sources/sitemap.py)."""

import pyarrow as pa

from commoncrawl_ray.sources.sitemap import (
    parse_sitemap,
    parse_sitemap_batch,
    universe_sitemap_rows,
    write_sitemapindex,
    write_urlset,
)


def test_urlset_roundtrip_and_escaping():
    rows = [
        ("http://a.com/?x=1&y=2", "2025-01-02"),
        ("http://b.com/<odd>", None),  # escaped loc, no lastmod
    ]
    data = write_urlset(rows)
    assert b"&amp;" in data and b"&lt;odd&gt;" in data
    kind, got = parse_sitemap(data)
    assert kind == "urlset"
    assert got == rows
    # writer is byte-deterministic
    assert write_urlset(rows) == data


def test_parser_tolerates_missing_namespace():
    data = b"""<?xml version="1.0"?>
<urlset><url><loc> http://x.org/p </loc></url>
<url><lastmod>2024-01-01</lastmod></url></urlset>"""
    kind, rows = parse_sitemap(data)
    assert kind == "urlset"
    # loc whitespace trimmed; entry with no loc dropped
    assert rows == [("http://x.org/p", None)]


def test_sitemapindex_kind_skipped_by_batch_stage():
    idx = write_sitemapindex(["sitemap-00000.xml", "sitemap-00001.xml"])
    kind, rows = parse_sitemap(idx)
    assert kind == "sitemapindex"
    assert [r[0] for r in rows] == ["sitemap-00000.xml", "sitemap-00001.xml"]
    t = pa.table(
        {
            "path": ["/tmp/sitemap-index.xml", "/tmp/sitemap-00000.xml"],
            "bytes": [idx, write_urlset([("http://a.com/", "2025-05-05")])],
        }
    )
    out = parse_sitemap_batch(t)
    assert out.column("url").to_pylist() == ["http://a.com/"]
    assert out.column("shard").to_pylist() == ["sitemap-00000.xml"]


def test_universe_rows_deterministic():
    a = universe_sitemap_rows(0.001)
    b = universe_sitemap_rows(0.001)
    assert a == b and len(a) >= 400
    assert all(0 <= s < 16 for s, _, _ in a)
