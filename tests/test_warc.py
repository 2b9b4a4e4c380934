"""WARC 1.0 format layer (sources/warc.py): record grammar, byte-exact
round trip, warcinfo handling, Ray source/sink."""

import gzip
import io

import pyarrow as pa
import pytest

from commoncrawl_ray.sources.warc import (
    iter_warc_records,
    parse_warc_member,
    response_record,
    warcinfo_record,
    write_warc_file,
)

MSG = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
    b"<html><body>hello warc</body></html>"
)


def test_response_record_grammar():
    rec = response_record("http://a.com/x", 1_700_000_000_000, MSG)
    assert rec.startswith(b"WARC/1.0\r\n")
    head, _, rest = rec.partition(b"\r\n\r\n")
    assert f"Content-Length: {len(MSG)}".encode() in head
    assert b"WARC-Type: response" in head
    assert b"WARC-Target-URI: http://a.com/x" in head
    assert b"WARC-Date: 2023-11-14T22:13:20Z" in head
    assert rest == MSG + b"\r\n\r\n"


def test_record_id_deterministic():
    a = response_record("http://a.com/x", 5, MSG)
    b = response_record("http://a.com/x", 5, MSG)
    c = response_record("http://a.com/y", 5, MSG)
    assert a == b
    assert a != c


def test_roundtrip_byte_exact():
    rows = [
        ("http://a.com/1", 1_000_000, MSG),
        ("http://b.com/2", 2_000_000, b"HTTP/1.0 404 Not Found\r\n\r\n"),
        ("http://c.com/3", 3_000_000, b""),  # empty block
    ]
    buf = io.BytesIO()
    n = write_warc_file(buf, "t.warc.gz", iter(rows))
    assert n == 3
    got = list(iter_warc_records(io.BytesIO(buf.getvalue())))
    assert [(r.url, r.ts_ms, r.block) for r in got] == rows


def test_warcinfo_member_skipped_by_reader():
    buf = io.BytesIO()
    write_warc_file(buf, "empty.warc.gz", iter(()))
    # the file holds exactly one warcinfo member and no responses
    raw = gzip.decompress(buf.getvalue())
    rec = parse_warc_member(raw)
    assert rec.rec_type == "warcinfo"
    assert list(iter_warc_records(io.BytesIO(buf.getvalue()))) == []


def test_parse_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        parse_warc_member(b"HTTP/1.1 200 OK\r\n\r\nnope")
    good = response_record("http://a.com", 1, MSG)
    with pytest.raises(ValueError):
        parse_warc_member(good[:-10])  # truncated block


def test_ray_source_sink_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from commoncrawl_ray.sources.warc import read_warc_pages, write_warc

    rows = [
        {"url": f"http://h{i}.com/p", "warc_ts": (i + 1) * 1000, "html": MSG}
        for i in range(10)
    ]
    t = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("ms")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
        }
    )
    out = str(tmp_path / "warc")
    res = write_warc(rd.from_arrow(t), out).to_pandas()
    assert res["records"].sum() == 10
    import os

    paths = [os.path.join(out, f) for f in sorted(os.listdir(out)) if f.endswith(".warc.gz")]
    back = read_warc_pages(paths).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(back) == 10
    assert back["url"].tolist() == sorted(r["url"] for r in rows)
    assert all(b == MSG for b in back["html"])
    assert (back["mime"] == "text/html").all()


def test_wet_roundtrip_byte_exact():
    import io

    from commoncrawl_ray.sources.warc import iter_warc_records, write_wet_file

    rows = [
        ("http://a.com/1", 1_000_000, "hello world".encode()),
        ("http://b.com/2", 2_000_000, "".encode()),
        ("http://c.com/3", 3_000_000, "héllo ünïcode 中文".encode()),
    ]
    buf = io.BytesIO()
    assert write_wet_file(buf, "t.wet.gz", iter(rows)) == 3
    got = list(iter_warc_records(io.BytesIO(buf.getvalue()), rec_type="conversion"))
    assert [(r.url, r.ts_ms, r.block) for r in got] == rows
    # response-type iteration sees nothing in a WET file
    assert list(iter_warc_records(io.BytesIO(buf.getvalue()))) == []


def test_wet_ray_source_sink(ray_session, tmp_path):
    import os

    import ray.data as rd

    from commoncrawl_ray.sources.warc import read_wet_pages, write_wet

    t = pa.table(
        {
            "url": pa.array([f"http://h{i}.com/p" for i in range(7)], pa.string()),
            "warc_ts": pa.array([(i + 1) * 1000 for i in range(7)], pa.timestamp("ms")),
            "text": pa.array([f"text {i} ünï" for i in range(6)] + [None], pa.string()),
        }
    )
    out = str(tmp_path / "wet")
    res = write_wet(rd.from_arrow(t), out).to_pandas()
    assert res["records"].sum() == 7
    paths = [os.path.join(out, f) for f in sorted(os.listdir(out)) if f.endswith(".wet.gz")]
    back = read_wet_pages(paths).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(back) == 7
    assert back.loc[back["url"] == "http://h6.com/p", "text"].iloc[0] == ""  # null -> empty
    assert back.loc[back["url"] == "http://h0.com/p", "text"].iloc[0] == "text 0 ünï"


def test_crawl_warc_archive(ray_session, tmp_path):
    """CrawlConfig.archive_format='warc': every 200-status fetch of
    every epoch lands in the WARC side-archive, byte-identical to what
    the fetcher saw, and the archive is deterministic across runs
    (content-hash file names, epoch clock dates)."""
    from commoncrawl_ray.pipelines.common import CrawlConfig
    from commoncrawl_ray.pipelines.crawl import crawl
    from commoncrawl_ray.sources.warc import read_warc_pages

    cfg = CrawlConfig(sf=0.001, seed=42, max_epochs=2, archive_format="warc")
    res = crawl(cfg, str(tmp_path / "ck1"))
    paths = res.archive_paths()
    assert paths, "no archive files written"
    back = read_warc_pages(paths).to_pandas()
    log = res.log_table().to_pandas()
    fetched_ok = log[(log["action"] == "fetched") & (log["http_status"] == 200)]
    assert len(back) == len(fetched_ok)
    assert set(back["url"]) == set(fetched_ok["canon_url"])
    # records are the synthetic web's bytes, verbatim
    from commoncrawl_ray.sources.synth import get_universe

    uni = get_universe(0.001, 42)
    sample = back.head(20)
    for u, rec in zip(sample["url"], sample["html"]):
        assert uni.synth_page(u) == rec
    # determinism: a second fresh run produces the identical file set
    res2 = crawl(cfg, str(tmp_path / "ck2"))
    names1 = [p.split("/")[-1] for p in res.archive_paths()]
    names2 = [p.split("/")[-1] for p in res2.archive_paths()]
    assert sorted(names1) == sorted(names2)


def test_cli_export_warc_wet(ray_session, tmp_path):
    """export-warc / export-wet CLI commands over a small pages
    parquet (in-process main(); the session-owning _init_ray no-ops
    inside the pytest fixture's session)."""
    import json
    import os

    import pyarrow.parquet as pq

    from commoncrawl_ray.cli import main
    from commoncrawl_ray.sources.synth import get_universe

    uni = get_universe(0.001, 42)
    rows = []
    for host in uni.hosts[:3]:
        for k in range(min(5, uni.page_counts[host])):
            url, ts, rec, _lang = uni.page_row(host, k)
            rows.append((url, ts, rec))
    src = str(tmp_path / "pages")
    os.makedirs(src)
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("ms")),
                "html": pa.array([r[2] for r in rows], pa.binary()),
            }
        ),
        os.path.join(src, "part-0.parquet"),
    )
    out_warc = str(tmp_path / "warc")
    out_wet = str(tmp_path / "wet")
    assert main(["export-warc", "--input", src, "--output", out_warc]) == 0
    assert main(["export-wet", "--input", src, "--output", out_wet]) == 0
    assert any(f.endswith(".warc.gz") for f in os.listdir(out_warc))
    assert any(f.endswith(".wet.gz") for f in os.listdir(out_wet))

    from commoncrawl_ray.sources.warc import read_warc_pages, read_wet_pages

    wpaths = [os.path.join(out_warc, f) for f in os.listdir(out_warc)]
    assert read_warc_pages(wpaths).count() == len(rows)
    tpaths = [os.path.join(out_wet, f) for f in os.listdir(out_wet)]
    assert read_wet_pages(tpaths).count() == len(rows)


# ------------------------------------------------------------------
# revisit records / archive dedup (WARC 1.0 §6.7.2,
# identical-payload-digest profile)
# ------------------------------------------------------------------


def _mk_msg(body: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )


def test_revisit_record_roundtrip():
    from commoncrawl_ray.sources.warc import (
        REVISIT_PROFILE,
        payload_digest,
        revisit_record,
    )

    msg = _mk_msg(b"dup body")
    dig = payload_digest(msg)
    assert dig.startswith("sha1:")
    head = msg[: msg.find(b"\r\n\r\n") + 4]
    rec = parse_warc_member(
        revisit_record(
            "http://b.com/x", 1_700_000_005_000, dig,
            "http://a.com/x", 1_700_000_000_000, head,
        )
    )
    assert rec.rec_type == "revisit"
    assert rec.url == "http://b.com/x"
    assert rec.fields["warc-profile"] == REVISIT_PROFILE
    assert rec.fields["warc-payload-digest"] == dig
    assert rec.fields["warc-refers-to-target-uri"] == "http://a.com/x"
    assert rec.fields["warc-refers-to-date"] == "2023-11-14T22:13:20Z"
    assert rec.block == head  # headers only, payload elided


def test_deduplicate_warc(ray_session, tmp_path):
    import ray.data as rd

    from commoncrawl_ray.sources.warc import (
        deduplicate_warc,
        read_warc_captures,
        write_warc,
    )

    # 3 urls; url a captured 3x (two files), url b 1x, url c shares
    # a's payload under a different url — 3 distinct payload digests
    # is wrong: a+c collapse, so 2 keepers + 3 revisits
    base = 1_700_000_000_000
    rows = [
        ("http://a.com/x", base + 0, _mk_msg(b"AAA")),
        ("http://a.com/x", base + 60_000, _mk_msg(b"AAA")),
        ("http://b.com/y", base + 1_000, _mk_msg(b"BBB")),
        ("http://a.com/x", base + 120_000, _mk_msg(b"AAA")),
        ("http://c.com/z", base + 2_000, _mk_msg(b"AAA")),
    ]
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("ms")),
            "html": pa.array([r[2] for r in rows], pa.binary()),
        }
    )
    src = tmp_path / "src"
    out = tmp_path / "out"
    write_warc(rd.from_arrow(t).repartition(2), str(src)).count()
    import os

    paths = sorted(str(src / f) for f in os.listdir(src) if f.endswith(".warc.gz"))
    stats = deduplicate_warc(paths, str(out)).to_pandas()
    assert int(stats.responses.sum()) == 2
    assert int(stats.revisits.sum()) == 3
    deduped = sorted(
        str(out / f) for f in os.listdir(out) if f.endswith(".warc.gz")
    )
    caps = read_warc_captures(deduped).to_pandas()
    assert len(caps) == 5
    resp = caps[caps.rec_type == "response"]
    revs = caps[caps.rec_type == "revisit"]
    # keeper of the AAA digest group is the earliest capture overall
    assert set(zip(resp.url, resp.ts_ms)) == {
        ("http://a.com/x", base), ("http://b.com/y", base + 1_000)
    }
    # every revisit resolves: its (refers_url, refers_ts) is a stored
    # response with the identical payload digest
    stored = {(r.url, r.ts_ms): r.digest for r in resp.itertuples()}
    for r in revs.itertuples():
        assert stored[(r.refers_url, r.refers_ts)] == r.digest
    # idempotent + byte-deterministic rewrite
    out2 = tmp_path / "out2"
    deduplicate_warc(paths, str(out2)).count()
    for f in os.listdir(out):
        a = (out / f).read_bytes()
        b = (out2 / f).read_bytes()
        assert a == b
