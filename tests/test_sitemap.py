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


def test_sitemap_seed_slice_complements_anchor_seeds():
    from commoncrawl_ray.functions.fingerprint import fp64
    from commoncrawl_ray.sources.sitemap import sitemap_seed_urls
    from commoncrawl_ray.sources.synth import get_universe

    uni = get_universe(0.001, 42)
    sm = sitemap_seed_urls(0.001, 42)
    assert sm == sorted(sm) and len(sm) == len(set(sm)) and len(sm) >= 10
    anchor_hosts = {h for h in uni.hosts if (fp64(h) % 10) < 8}
    for u in sm:
        host = u.split("/")[2]
        assert host not in anchor_hosts  # exact complement of seed_urls
    # deterministic
    assert sitemap_seed_urls(0.001, 42) == sm


def test_seed_cache_dir_roundtrips_through_real_xml(ray_session):
    import os
    import shutil

    from commoncrawl_ray.sources.sitemap import (
        read_sitemaps,
        sitemap_seed_cache_dir,
        sitemap_seed_urls,
    )

    path = f"/tmp/ccray_sitemap_seeds_v1_{0.001}_{42}"
    shutil.rmtree(path, ignore_errors=True)
    if os.path.isfile(path + ".complete"):
        os.remove(path + ".complete")
    d = sitemap_seed_cache_dir(0.001, 42)
    assert os.path.isfile(d + ".complete")
    names = sorted(os.listdir(d))
    assert names == [f"sitemap-{s:05d}.xml" for s in range(4)]
    got = sorted(read_sitemaps(d).to_pandas()["url"].tolist())
    assert got == sitemap_seed_urls(0.001, 42)
    # second call is a pure cache hit (byte-identical files untouched)
    before = {n: open(os.path.join(d, n), "rb").read() for n in names}
    assert sitemap_seed_cache_dir(0.001, 42) == d
    after = {n: open(os.path.join(d, n), "rb").read() for n in names}
    assert before == after


def test_inventory_cache_roundtrips_full_universe(ray_session):
    import os
    import shutil

    from commoncrawl_ray.sources.sitemap import (
        read_sitemaps,
        sitemap_inventory_cache_dir,
        universe_sitemap_rows,
    )

    path = f"/tmp/ccray_sitemap_inventory_v1_{0.001}_{7}"
    shutil.rmtree(path, ignore_errors=True)
    if os.path.isfile(path + ".complete"):
        os.remove(path + ".complete")
    d = sitemap_inventory_cache_dir(0.001, 7)
    got = read_sitemaps(d).to_pandas()
    want = universe_sitemap_rows(0.001, 7)
    assert sorted(zip(got["url"], got["lastmod"])) == sorted(
        (loc, lm) for _s, loc, lm in want
    )
