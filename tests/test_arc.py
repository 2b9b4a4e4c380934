"""ARC format round-trips, mirroring the reference's test strategy
(ArcFileReaderTests: synthesize a spec-compliant file from random
records — urls with spaces to hit the malformed-metadata fallback —
read it back, assert byte-exact equality, including a 1-byte-at-a-time
stream; then the same corpus through the higher layers)."""

from __future__ import annotations

import io
import random

import pytest

from commoncrawl_ray.sources.arc import (
    ArcRecord,
    iter_arc_records,
    iter_gzip_members,
    parse_metadata_line,
    read_arc_pages,
    write_arc,
    write_arc_file,
)

BASE_TS = 1341100800000


def _random_records(n=40, seed=42):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        if rng.random() < 0.15:
            # space in URL -> malformed metadata line fallback
            url = f"http://site{i}.com/it em{i}?q=a b"
        else:
            url = f"http://site{i}.com/page/{i}"
        body = bytes(rng.randrange(256) for _ in range(rng.randint(10, 400)))
        headers = "\r\n".join(
            [f"HTTP/1.1 200 OK", f"Content-Type: text/html", f"X-Rand: {rng.randrange(10**9)}"]
        )
        ip = f"10.0.{i % 250}.{rng.randrange(250)}"
        out.append((url, ip, BASE_TS + i * 1000, "text/html", headers, body))
    return out


class OneByteStream(io.RawIOBase):
    """Stress chunk boundaries like the reference's 1-byte stream test
    (ArcFileReaderTests.java:438-449)."""

    def __init__(self, data: bytes):
        self._d = data
        self._i = 0

    def read(self, n=-1):
        if self._i >= len(self._d):
            return b""
        b = self._d[self._i : self._i + 1]
        self._i += 1
        return b


def _write_corpus(records):
    buf = io.BytesIO()
    write_arc_file(buf, "test-000.arc.gz", records)
    return buf.getvalue()


def test_arc_roundtrip_byte_exact():
    records = _random_records()
    blob = _write_corpus(records)
    got = list(iter_arc_records(blob))
    assert len(got) == len(records)
    for (url, ip, ts, mime, header_text, body), rec in zip(records, got):
        assert rec.url == url
        assert rec.host_ip == ip
        assert rec.mime == mime
        assert rec.payload == body  # byte-exact
        assert rec.ts_ms == ts
        # original headers preserved in order
        keys = [k for k, _ in rec.headers]
        assert keys[0] == ""  # status line is key-less
        assert any(k == "Content-Type" for k in keys)


def test_arc_one_byte_at_a_time():
    records = _random_records(12, seed=7)
    blob = _write_corpus(records)
    got = list(iter_arc_records(OneByteStream(blob), chunk_size=1))
    assert [r.url for r in got] == [r[0] for r in records]
    assert [r.payload for r in got] == [r[5] for r in records]


def test_metadata_line_fallback():
    # well-formed
    assert parse_metadata_line("http://a.com/x 1.2.3.4 20120701000000 text/html 123") == [
        "http://a.com/x",
        "1.2.3.4",
        "20120701000000",
        "text/html",
        "123",
    ]
    # spaces in url -> right-split fallback (ARCFileReader.java:573-597)
    got = parse_metadata_line("http://a.com/it em x 1.2.3.4 20120701000000 text/html 9")
    assert got == ["http://a.com/it em x", "1.2.3.4", "20120701000000", "text/html", "9"]
    assert parse_metadata_line("nonsense") is None


def test_kv_value_injected_headers():
    records = _random_records(3, seed=9)
    blob = _write_corpus(records)
    rec = next(iter(iter_arc_records(blob)))
    kv = rec.kv_value()
    head, _, payload = kv.partition(b"\r\n\r\n")
    text = head.decode()
    assert "x_commoncrawl_HostIP: " in text
    assert "x_commoncrawl_ArcTimestamp: " in text
    assert "x_commoncrawl_ArcMimeType: text/html" in text
    assert f"x_commoncrawl_ArcPayloadLen: {len(rec.payload)}" in text
    assert payload == rec.payload


def test_not_an_arc_file():
    import gzip as g

    blob = g.compress(b"http://nope/ 1.2.3.4 20120701000000 text/html 5\r\n\r\nhello")
    with pytest.raises(ValueError, match="filedesc"):
        list(iter_arc_records(blob))


def test_truncated_member_raises():
    records = _random_records(4, seed=3)
    blob = _write_corpus(records)[:-20]  # chop the last member's tail
    with pytest.raises(EOFError):
        list(iter_arc_records(blob))


def test_gzip_member_iteration_counts():
    records = _random_records(5, seed=5)
    blob = _write_corpus(records)
    assert len(list(iter_gzip_members(blob))) == 6  # filedesc + 5


def test_ray_arc_source_sink_roundtrip(ray_session, tmp_path):
    """pages -> write_arc -> read_arc_pages -> parse: text parity with
    direct extraction (the S1/S11 layer under the P1 kernel)."""
    import pyarrow as pa
    import ray.data as rd

    from commoncrawl_ray.sources.synth import get_universe
    from commoncrawl_ray.stages.parse_extract import extract_record, parse_extract_batch

    uni = get_universe(0.001, 42)
    rows = []
    for host in uni.hosts[:6]:
        for k in range(min(10, uni.page_counts[host])):
            url, ts, rec, lang = uni.page_row(host, k)
            rows.append({"url": url, "warc_ts": ts, "html": rec})
    df = pa.table(
        {
            "url": pa.array([r["url"] for r in rows]),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("ms")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
        }
    )
    ds = rd.from_arrow(df)

    out = str(tmp_path / "arcs")
    res = write_arc(ds, out).to_pandas()
    assert res["records"].sum() == len(rows)

    import os

    paths = [os.path.join(out, f) for f in sorted(os.listdir(out)) if f.endswith(".arc.gz")]
    back = read_arc_pages(paths)
    parsed = back.map_batches(parse_extract_batch, batch_format="pyarrow").to_pandas()
    assert len(parsed) == len(rows)

    # text parity per url vs direct extraction of the original record
    want = {}
    for r in rows:
        want[r["url"]] = extract_record(r["url"], r["html"])["text"]
    got = dict(zip(parsed["url"], parsed["text"]))
    assert set(got) == set(want)
    mismatches = [u for u in want if got[u] != want[u]]
    assert not mismatches, mismatches[:3]


def test_headerless_record_roundtrip():
    """A record written with empty header_text must still round-trip
    byte-exactly: the writer emits an empty header + blank line
    ("\\r\\n\\r\\n") so the reader's terminator scan never runs into the
    payload (ADVICE r1)."""
    payload = bytes(range(256)) * 3  # binary payload containing \n\n etc.
    records = [
        ("http://h.com/raw", "10.0.0.1", BASE_TS, "application/octet-stream", "", payload),
        ("http://h.com/next", "10.0.0.2", BASE_TS + 1000, "text/html", "HTTP/1.1 200 OK", b"hi"),
    ]
    blob = _write_corpus(records)
    got = list(iter_arc_records(blob))
    assert [r.url for r in got] == [r[0] for r in records]
    assert got[0].payload == payload
    assert got[0].headers == []
    assert got[1].payload == b"hi"
