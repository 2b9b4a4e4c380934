"""XML sitemap source/sink (sitemaps.org protocol).

The crawl-discovery companion the anchor-link frontier misses: sites
publish their URL inventory as ``<urlset>`` sitemap files, sharded
under a ``<sitemapindex>``. The reference library has no sitemap
support (its discovery is anchor-based); a modern recrawl engine
seeds its frontier from both. This module gives the engine the XML
format layer: a deterministic writer (shard files of ``<url><loc>``
entries + one index) and a namespace-tolerant stdlib parser, wired
Ray-Data-first — ``read_binary_files`` over the shard directory, one
``flat``-shaped ``map_batches`` parse stage, (url, lastmod, shard)
rows out.

Scale shape: each sitemap shard file is one read task (the protocol
caps a shard at 50k URLs / 50 MB, so a shard is block-sized by
construction); parsing is per-shard-local with zero exchanges, and
frontier seeding from the parsed rows reuses the crawl's canonical
fingerprint + URL-seen machinery.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import pyarrow as pa

SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def write_urlset(rows: list[tuple[str, str | None]]) -> bytes:
    """(loc, lastmod|None) rows -> canonical ``<urlset>`` bytes.
    Hand-rendered (sorted attrs, LF lines, no timestamps) so the
    output is byte-deterministic across runs and platforms."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>']
    out.append(f'<urlset xmlns="{SITEMAP_NS}">')
    for loc, lastmod in rows:
        out.append("  <url>")
        out.append(f"    <loc>{escape(loc)}</loc>")
        if lastmod is not None:
            out.append(f"    <lastmod>{escape(lastmod)}</lastmod>")
        out.append("  </url>")
    out.append("</urlset>")
    return ("\n".join(out) + "\n").encode("utf-8")


def write_sitemapindex(locs: list[str]) -> bytes:
    """Shard locations -> canonical ``<sitemapindex>`` bytes."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>']
    out.append(f'<sitemapindex xmlns="{SITEMAP_NS}">')
    for loc in locs:
        out.append("  <sitemap>")
        out.append(f"    <loc>{escape(loc)}</loc>")
        out.append("  </sitemap>")
    out.append("</sitemapindex>")
    return ("\n".join(out) + "\n").encode("utf-8")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(data: bytes) -> tuple[str, list[tuple[str, str | None]]]:
    """Sitemap bytes -> (kind, rows). kind is ``"urlset"`` (rows =
    (loc, lastmod|None)) or ``"sitemapindex"`` (rows = (loc, None)).
    Namespace-tolerant: matches on local tag names, so files with a
    missing/alternate xmlns still parse (the live web's dominant
    sitemap defect)."""
    root = ET.fromstring(data)
    kind = _local(root.tag)
    rows: list[tuple[str, str | None]] = []
    child_tag = "url" if kind == "urlset" else "sitemap"
    for el in root:
        if _local(el.tag) != child_tag:
            continue
        loc: str | None = None
        lastmod: str | None = None
        for sub in el:
            t = _local(sub.tag)
            if t == "loc":
                loc = (sub.text or "").strip()
            elif t == "lastmod":
                lastmod = (sub.text or "").strip()
        if loc:
            rows.append((loc, lastmod))
    return kind, rows


def parse_sitemap_batch(t: pa.Table) -> pa.Table:
    """read_binary_files batch (path, bytes) -> (url, lastmod, shard)
    rows; one shard file = one urlset. Index files (kind
    'sitemapindex') contribute no URL rows — the reader enumerates
    shard files directly, the index is for external crawlers."""
    import os

    urls: list[str] = []
    lastmods: list[str | None] = []
    shards: list[str] = []
    for path, data in zip(
        t.column("path").to_pylist(), t.column("bytes").to_pylist()
    ):
        kind, rows = parse_sitemap(data)
        if kind != "urlset":
            continue
        shard = os.path.basename(path)
        for loc, lastmod in rows:
            urls.append(loc)
            lastmods.append(lastmod)
            shards.append(shard)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "lastmod": pa.array(lastmods, pa.string()),
            "shard": pa.array(shards, pa.string()),
        }
    )


def universe_sitemap_rows(
    sf: float, seed: int = 42, n_shards: int = 16
) -> list[tuple[int, str, str]]:
    """The synthetic universe's full URL inventory as deterministic
    sitemap rows (shard_id, loc, lastmod): shard and lastmod are pure
    functions of fp64(url), so the distributed writer, the reader
    round-trip, and the sequential oracle all derive the identical
    row set from (sf, seed) alone. Shared-kernel discipline of
    oracle_arc_roundtrip_table."""
    from ..functions.fingerprint import fp64
    from .synth import get_universe

    uni = get_universe(sf, seed)
    rows: list[tuple[int, str, str]] = []
    for host in uni.hosts:
        for k in range(uni.page_counts[host]):
            loc = uni.canon_page_url(host, k)
            fp = fp64(loc) & 0x7FFFFFFF
            lastmod = f"2025-{(fp % 12) + 1:02d}-{(fp % 28) + 1:02d}"
            rows.append((fp % n_shards, loc, lastmod))
    return rows


def sitemap_seed_urls(sf: float, seed: int = 42) -> list[str]:
    """The sitemap-discovered seed slice: the first two pages of every
    host the anchor seed list MISSES (``fp64(host) % 10 >= 8`` — the
    complement of Universe.seed_urls' 80% rule), sorted. This is what
    sitemap ingestion buys a crawl: coverage of sites nothing links
    to yet. Shared verbatim by the oracle crawler; the engine derives
    the same set through the real XML write->read->parse path
    (sitemap_seed_cache_dir), so crawl parity also validates the XML
    layer end to end."""
    from ..functions.fingerprint import fp64
    from .synth import get_universe

    uni = get_universe(sf, seed)
    out: list[str] = []
    for h in uni.hosts:
        if (fp64(h) % 10) >= 8:
            for k in range(min(2, uni.page_counts[h])):
                out.append(uni.canon_page_url(h, k))
    return sorted(out)


def sitemap_seed_cache_dir(sf: float, seed: int = 42, n_shards: int = 4) -> str:
    """Write-once /tmp cache of the seed slice as real XML urlset
    shards (atomic per-file tmp+rename, byte-deterministic writer) —
    the engine's crawl seeding reads THROUGH this XML, it never calls
    the row builder directly."""
    import os

    from ..functions.fingerprint import fp64

    path = f"/tmp/ccray_sitemap_seeds_v1_{sf}_{seed}"
    done = path + ".complete"  # sibling marker: the reader scans the dir
    if os.path.isfile(done):
        return path
    os.makedirs(path, exist_ok=True)
    urls = sitemap_seed_urls(sf, seed)
    shards: dict[int, list[tuple[str, str | None]]] = {
        s: [] for s in range(n_shards)
    }
    for u in urls:
        shards[(fp64(u) & 0x7FFFFFFF) % n_shards].append((u, None))
    for s, rows in shards.items():
        name = f"sitemap-{s:05d}.xml"
        tmp = os.path.join(path, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(write_urlset(rows))
        os.replace(tmp, os.path.join(path, name))
    with open(done, "w") as f:
        f.write("ok")
    return path


def sitemap_inventory_cache_dir(
    sf: float, seed: int = 42, n_shards: int = 16
) -> str:
    """Write-once /tmp cache of the universe's FULL URL inventory as
    real XML urlset shards (universe_sitemap_rows layout) — the
    coverage-audit query reads the inventory THROUGH this XML, never
    the row builder. Same marker discipline as
    sitemap_seed_cache_dir."""
    import os

    path = f"/tmp/ccray_sitemap_inventory_v1_{sf}_{seed}"
    done = path + ".complete"
    if os.path.isfile(done):
        return path
    os.makedirs(path, exist_ok=True)
    shards: dict[int, list[tuple[str, str | None]]] = {
        s: [] for s in range(n_shards)
    }
    for s, loc, lastmod in universe_sitemap_rows(sf, seed, n_shards):
        shards[s].append((loc, lastmod))
    for s, rows in shards.items():
        name = f"sitemap-{s:05d}.xml"
        tmp = os.path.join(path, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(write_urlset(rows))
        os.replace(tmp, os.path.join(path, name))
    with open(done, "w") as f:
        f.write("ok")
    return path


def read_sitemaps(dir_path: str):
    """Sitemap shard directory -> Dataset of (url, lastmod, shard).
    One read task per shard file; the index file is skipped by the
    parse stage."""
    import ray.data as rd

    return rd.read_binary_files(dir_path, include_paths=True).map_batches(
        parse_sitemap_batch, batch_format="pyarrow"
    )
