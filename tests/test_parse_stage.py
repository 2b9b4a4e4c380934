"""End-to-end parse/extract stage over the synthetic pages table via Ray
Data — the engine's text-parity invariant (BASELINE.json input_hint:
byte-identical extracted text per url at any parallelism)."""

import hashlib
import os

import pyarrow.parquet as pq
import pytest

from commoncrawl_ray.sources.synth import get_universe, write_pages_parquet
from commoncrawl_ray.stages.parse_extract import extract_record, parse_extract_batch

from commoncrawl_ray.sources.synth import PAGES_FIXTURE_VERSION

PAGES_PATH = f"/tmp/cc_ray_test_pages_v{PAGES_FIXTURE_VERSION}_sf0001.parquet"


@pytest.fixture(scope="module")
def pages_file():
    if not os.path.exists(PAGES_PATH):
        write_pages_parquet(PAGES_PATH, 0.001)
    return PAGES_PATH


def test_extract_deterministic(pages_file):
    uni = get_universe(0.001)
    url = uni.canon_page_url(uni.hosts[1], 0)
    rec = uni.synth_page(url)
    a = extract_record(url, rec)
    b = extract_record(url, rec)
    assert a["text"] == b["text"] and a["links"] == b["links"]


def test_parse_batch_matches_golden_column(pages_file):
    table = pq.read_table(pages_file)
    out = parse_extract_batch(table)
    got = out.column("text").to_pylist()
    want = table.column("text").to_pylist()
    assert got == want  # byte-identical text per url
    # sanity on the variant mix
    st = out.column("http_status").to_pylist()
    assert set(st) == {200}
    dispos = out.column("disposition").to_pylist()
    assert {0, 1, 2, 3} >= set(dispos) and 1 in dispos
    assert any(f != 0 for f in out.column("flags").to_pylist())  # truncated gzip present
    assert any(t is None for t in want)  # reject/junk mimes yield null text


def test_parse_stage_via_ray(ray_session, pages_file):
    import ray.data as rd

    ds = rd.read_parquet(pages_file)
    docs = ds.map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=256)
    out = docs.to_pandas()
    golden = pq.read_table(pages_file).to_pandas()
    merged = out.merge(golden[["url", "text"]], on="url", suffixes=("", "_golden"))
    assert len(merged) == len(golden)
    mismatch = merged[merged["text"].fillna("\0") != merged["text_golden"].fillna("\0")]
    assert len(mismatch) == 0
    # digests stable
    for _, row in merged.head(50).iterrows():
        if row["text"] is not None:
            assert row["text_digest"] == hashlib.md5(row["text"].encode()).digest()


def test_urls_fingerprinted(pages_file):
    table = pq.read_table(pages_file)
    out = parse_extract_batch(table.slice(0, 300))
    fps = out.column("url_fp").to_pylist()
    canons = out.column("canon_url").to_pylist()
    assert sum(c is not None for c in canons) > 250
    assert len(set(fps)) > 250


def test_arcfilemetadata_parity_fields():
    """ArcFileMetadata parity block (protocol/shared/protocol.jr:56-128):
    meta tags, anchor text, cache-control fields, declared+detected
    charset (VERDICT r1 #5)."""
    body = (
        '<html><head>'
        '<meta http-equiv="Content-Type" content="text/html; charset=utf-8">'
        '<meta name="keywords" content="alpha, beta">'
        '<meta name="description" content="a test page">'
        '<meta http-equiv="refresh" content="5; url=http://next.example.com/">'
        '<meta http-equiv="pragma" content="no-cache">'
        '<title>Hello Title</title><base href="http://ex.com/sub/">'
        '</head><body>'
        '<a href="/one">First Link</a> middle '
        '<a href="http://other.com/two">Second <b>bold</b> link</a>'
        '</body></html>'
    ).encode("utf-8")
    headers = "\r\n".join(
        [
            "HTTP/1.1 200 OK",
            "Content-Type: text/html; charset=utf-8",
            "Date: Sun, 01 Jul 2012 00:00:00 GMT",
            "Last-Modified: Sat, 30 Jun 2012 12:00:00 GMT",
            "Expires: Mon, 02 Jul 2012 00:00:00 GMT",
            'ETag: "abc123"',
            "Age: 70",
            "Cache-Control: private, no-store, max-age=3600, must-revalidate",
            "Vary: Accept-Encoding",
        ]
    )
    rec = headers.encode() + b"\r\n\r\n" + body
    r = extract_record("http://ex.com/page", rec)
    assert r["title"] == "Hello Title"
    assert r["base"] == "http://ex.com/sub/"
    # anchorTags href<LF>text<LF> stream
    assert r["anchors"] == "/one\nFirst Link\nhttp://other.com/two\nSecond bold link\n"
    # otherMetaTags name<LF>value<LF> stream (refresh/pragma extracted
    # separately per HTMLMetaTags)
    assert "keywords\nalpha, beta\n" in r["meta_tags"]
    assert "description\na test page\n" in r["meta_tags"]
    assert r["refresh_url"] == "http://next.example.com/"
    assert r["refresh_time"] == 5
    assert r["charset_declared"] == "utf-8"
    assert r["charset_detected"] is None  # declared => detector not run
    from commoncrawl_ray.stages.parse_extract import (
        CACHE_MUST_REVALIDATE,
        CACHE_NO_CACHE,
        CACHE_NO_STORE,
        CACHE_PRIVATE,
        CACHE_VARY,
    )

    assert r["cache_flags"] == (
        CACHE_NO_CACHE | CACHE_NO_STORE | CACHE_VARY | CACHE_MUST_REVALIDATE | CACHE_PRIVATE
    )
    assert r["max_age"] == 3600 and r["age"] == 70
    assert r["etag"] == '"abc123"'
    assert r["http_date"] == 1341100800000
    assert r["last_modified"] < r["http_date"] < r["expires"]


def test_detected_charset_field_populated():
    """Undeclared non-ASCII page: detectedCharset records the byte
    detector's verdict (protocol.jr:115)."""
    body = "Пример русского текста для определения кодировки и проверки поля.".encode("koi8-r")
    rec = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + (
        b"<html><body>" + body * 3 + b"</body></html>"
    )
    r = extract_record("http://ru.example.com/", rec)
    assert r["charset_declared"] is None
    assert r["charset_detected"] == "koi8-r"
    assert r["charset_used"] == "koi8-r"


def test_parity_fields_via_ray(ray_session, pages_file):
    """The synth universe's pages carry anchors + meta charset tags —
    the batch kernel must surface them over Ray."""
    import ray.data as rd

    ds = rd.read_parquet(pages_file)
    out = ds.map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=256).to_pandas()
    html_rows = out[out["disposition"] == 1]
    assert (html_rows["anchors"].notna()).sum() > 0.5 * len(html_rows)
    assert (html_rows["title"].notna()).sum() > 0.9 * len(html_rows)
    assert (out["meta_tags"].notna() | out["charset_declared"].notna()).sum() > 0


def test_hostile_cache_values_dont_kill_batch():
    """Overflowing Age/max-age/refresh declarations must clamp, not
    raise OverflowError in the numpy column assignment (a hostile page
    would otherwise fail the whole Ray parse task deterministically)."""
    import pyarrow as pa

    body = (
        '<html><head><meta http-equiv="refresh" content="99999999999999999999">'
        "<title>t</title></head><body>hi</body></html>"
    ).encode()
    rec = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Age: 99999999999999999999\r\n"
        b"Cache-Control: max-age=88888888888888888888\r\n\r\n" + body
    )
    batch = pa.table(
        {
            "url": pa.array(["http://evil.com/x"]),
            "warc_ts": pa.array([0], pa.timestamp("ms")),
            "html": pa.array([rec], pa.binary()),
        }
    )
    out = parse_extract_batch(batch)
    assert out.column("age")[0].as_py() == -1
    assert out.column("max_age")[0].as_py() == -1
    assert out.column("refresh_time")[0].as_py() == -1
    assert out.column("text")[0].as_py() == "t hi"  # title text is part of extracted text
