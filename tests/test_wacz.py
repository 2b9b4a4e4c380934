"""WACZ package source/sink (sources/wacz.py): byte determinism,
sha256 integrity chain (corruption fails loudly), member layout per
the public WACZ 1.1.1 spec, and the Ray shard write->read cycle for
all three readers (archive pages, CDX index, page list)."""

from __future__ import annotations

import gzip
import io
import json
import zipfile

import pyarrow as pa
import pytest

from commoncrawl_ray.sources.wacz import (
    ARCHIVE_PATH,
    DATAPACKAGE,
    DIGEST,
    INDEX_PATH,
    PAGES_PATH,
    verify_wacz,
    wacz_bytes,
)


def _pages_table(n_hosts: int = 3, per_host: int = 4) -> pa.Table:
    from commoncrawl_ray.sources.synth import get_universe

    uni = get_universe(0.001, 42)
    urls, tss, recs = [], [], []
    for host in uni.hosts[:n_hosts]:
        for k in range(min(per_host, uni.page_counts[host])):
            url, ts, rec, _lang = uni.page_row(host, k)
            urls.append(url)
            tss.append(ts)
            recs.append(rec)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("ms")),
            "html": pa.array(recs, pa.binary()),
        }
    )


def test_wacz_bytes_deterministic_and_layout():
    t = _pages_table()
    b1, b2 = wacz_bytes(t), wacz_bytes(t)
    assert b1 == b2  # DOS-epoch zip dates, mtime=0 gzip, sorted JSON

    zf = zipfile.ZipFile(io.BytesIO(b1))
    names = set(zf.namelist())
    assert {ARCHIVE_PATH, INDEX_PATH, PAGES_PATH, DATAPACKAGE, DIGEST} == names

    dp = json.loads(zf.read(DATAPACKAGE))
    assert dp["wacz_version"] == "1.1.1"
    assert {r["path"] for r in dp["resources"]} == {
        ARCHIVE_PATH,
        INDEX_PATH,
        PAGES_PATH,
    }

    # page list: header line then one JSON object per page
    lines = zf.read(PAGES_PATH).decode().splitlines()
    assert json.loads(lines[0])["format"] == "json-pages-1.0"
    assert len(lines) - 1 == len(t)

    # CDXJ index is sorted by key
    keys = [
        line.split(" ", 2)[0] + " " + line.split(" ", 2)[1]
        for line in gzip.decompress(zf.read(INDEX_PATH)).decode().splitlines()
    ]
    assert keys == sorted(keys)


def test_verify_wacz_catches_corruption():
    body = wacz_bytes(_pages_table(2, 2))
    assert set(verify_wacz(body)) == {ARCHIVE_PATH, INDEX_PATH, PAGES_PATH}

    # tamper CRC-consistently: rewrite the archive member through
    # zipfile (valid zip, valid CRC) without touching the manifest —
    # only the WACZ sha256 chain can catch this
    src = zipfile.ZipFile(io.BytesIO(body))
    orig = src.read(ARCHIVE_PATH)
    tampered = bytes([orig[0] ^ 0xFF]) + orig[1:]  # same length, new hash
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for name in src.namelist():
            out.writestr(name, tampered if name == ARCHIVE_PATH else src.read(name))
    with pytest.raises(ValueError, match="corrupt"):
        verify_wacz(buf.getvalue())

    # same rewrite but also swapping in a forged manifest whose own
    # digest file was not updated — the digest link must refuse it
    dp = json.loads(src.read(DATAPACKAGE))
    dp["software"] = "forged"
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as out:
        for name in src.namelist():
            data = (
                json.dumps(dp, sort_keys=True, indent=2).encode()
                if name == DATAPACKAGE
                else src.read(name)
            )
            out.writestr(name, data)
    with pytest.raises(ValueError, match="digest"):
        verify_wacz(buf2.getvalue())

    # a package missing its manifest is refused outright
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        out.writestr(ARCHIVE_PATH, b"x")
    with pytest.raises(ValueError, match="missing"):
        verify_wacz(buf.getvalue())


def test_ray_wacz_roundtrip(ray_session, tmp_path):
    import ray as _ray

    from commoncrawl_ray.sources.wacz import (
        read_wacz_cdx,
        read_wacz_page_list,
        read_wacz_pages,
        write_wacz,
    )

    t = _pages_table(4, 5)
    out = str(tmp_path / "wacz")
    manifest = write_wacz(
        _ray.data.from_arrow(t).repartition(3), out
    ).take_all()
    assert sum(m["records"] for m in manifest) == len(t)
    assert len(manifest) == 3  # one self-contained package per block

    back = read_wacz_pages(out).take_all()
    assert len(back) == len(t)
    want = dict(
        zip(t.column("url").to_pylist(), t.column("html").to_pylist())
    )
    for r in back:
        assert want[r["url"]] == r["html"]  # byte-lossless through the zip

    cdx = read_wacz_cdx(out).take_all()
    assert len(cdx) == len(t)
    assert all(r["shard"].endswith(".wacz") for r in cdx)

    pages = read_wacz_page_list(out).take_all()
    assert len(pages) == len(t)
    assert {r["url"] for r in pages} == set(t.column("url").to_pylist())
