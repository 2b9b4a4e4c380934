"""WACZ source/sink — Web Archive Collection Zipped (the package
format modern archive tooling ships: Webrecorder's public WACZ 1.1.1
spec, specs.webrecorder.net/wacz/1.1.1). One ``.wacz`` is a ZIP
holding a complete, independently-replayable collection:

  * ``archive/data.warc.gz``        — the captures (WARC 1.0,
    member-per-record gzip, sources/warc.py);
  * ``indexes/index.cdx.gz``        — CDXJ capture index sorted by
    SURT+TIMESTAMP14 (sources/cdx.py line format);
  * ``pages/pages.jsonl``           — page list (``json-pages-1.0``
    header line, then one JSON object per page with extracted title
    and text — what replay/search UIs consume);
  * ``datapackage.json``            — frictionless resource manifest,
    sha256 + byte size per member;
  * ``datapackage-digest.json``     — sha256 of the manifest itself,
    closing the integrity chain.

The reference predates WACZ entirely (its newest container is ARC,
sources/arc.py docstrings); this module is built from the public spec
only and composes the repo's own WARC/CDX kernels.

Ray-Data shape — ONE self-contained WACZ per block:
  A WACZ is a *collection unit*, not a corpus container, so the scale
  story is many shards, not one giant zip: the sink runs inside
  ``map_batches`` (shard-per-block like sources/columnar.py), each
  task parses its block ONCE (``parse_extract_batch``) and derives
  archive + index + page list from that single pass, then writes a
  content-hash-named ``.wacz`` via tmp+rename (idempotent under task
  retry). The source is ``read_binary_files`` over the shard tree,
  one stateless task per package; every read VERIFIES the sha256
  chain (datapackage-digest -> datapackage -> members) so torn or
  corrupted packages fail loudly — the avro/seqfile sync-marker
  discipline applied zip-wide.

Byte-determinism: zip entry timestamps pinned to the DOS epoch
(1980-01-01), gzip members mtime=0, JSON with sorted keys — re-runs
reproduce identical bytes, so a retried task's rename is a no-op.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import json
import os
import zipfile

import pyarrow as pa

WACZ_VERSION = "1.1.1"
_DOS_EPOCH = (1980, 1, 1, 0, 0, 0)

ARCHIVE_PATH = "archive/data.warc.gz"
INDEX_PATH = "indexes/index.cdx.gz"
PAGES_PATH = "pages/pages.jsonl"
DATAPACKAGE = "datapackage.json"
DIGEST = "datapackage-digest.json"

PAGES_HEADER = {"format": "json-pages-1.0", "id": "pages", "title": "All Pages"}


def _sha256(data: bytes) -> str:
    return "sha256:" + hashlib.sha256(data).hexdigest()


def _iso8601(ts_ms: int) -> str:
    from .warc import _warc_date

    return _warc_date(ts_ms)


def wacz_bytes(batch: pa.Table) -> bytes:
    """pages(url, warc_ts, html) -> one complete WACZ package in
    memory. The block is parsed ONCE; archive, CDXJ index and page
    list all derive from that pass."""
    from .cdx import cdx_rows_batch, format_cdxj_line
    from .warc import write_warc_file
    from ..stages.parse_extract import parse_extract_batch

    urls = batch.column("url").to_pylist()
    tss = batch.column("warc_ts").cast(pa.int64()).to_pylist()
    htmls = batch.column("html").to_pylist()

    # --- archive/data.warc.gz
    buf = io.BytesIO()
    write_warc_file(buf, "data.warc.gz", zip(urls, tss, htmls))
    warc_gz = buf.getvalue()

    # --- one parse feeds both the index and the page list
    parsed = parse_extract_batch(batch.select(["url", "warc_ts", "html"]))
    cdx = cdx_rows_batch(batch, parsed=parsed)
    lines = sorted(
        format_cdxj_line(
            {name: cdx.column(name)[i].as_py() for name in cdx.schema.names}
        )
        for i in range(len(cdx))
    )
    index_gz = gzip.compress(
        ("\n".join(lines) + "\n").encode("utf-8") if lines else b"",
        compresslevel=6,
        mtime=0,
    )

    # --- pages/pages.jsonl (replay/search page list: id, url, ts,
    # title, text — the extracted-text field WACZ full-text search
    # consumes)
    titles = parsed.column("title").to_pylist()
    texts = parsed.column("text").to_pylist()
    page_lines = [json.dumps(PAGES_HEADER, sort_keys=True, separators=(",", ":"))]
    for i, u in enumerate(urls):
        ts = _iso8601(tss[i])
        page_lines.append(
            json.dumps(
                {
                    "id": hashlib.md5(f"{u}|{ts}".encode()).hexdigest(),
                    "url": u,
                    "ts": ts,
                    "title": titles[i] or "",
                    "text": texts[i] or "",
                },
                sort_keys=True,
                separators=(",", ":"),
            )
        )
    pages_jsonl = ("\n".join(page_lines) + "\n").encode("utf-8")

    # --- manifest + digest (the integrity chain readers verify)
    members = [
        (ARCHIVE_PATH, warc_gz),
        (INDEX_PATH, index_gz),
        (PAGES_PATH, pages_jsonl),
    ]
    datapackage = json.dumps(
        {
            "profile": "data-package",
            "wacz_version": WACZ_VERSION,
            "software": "commoncrawl-ray wacz writer",
            "resources": [
                {
                    "name": os.path.basename(path),
                    "path": path,
                    "hash": _sha256(data),
                    "bytes": len(data),
                }
                for path, data in members
            ],
        },
        sort_keys=True,
        indent=2,
    ).encode("utf-8")
    digest = json.dumps(
        {"path": DATAPACKAGE, "hash": _sha256(datapackage)},
        sort_keys=True,
        separators=(",", ":"),
    ).encode("utf-8")

    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as zf:
        for path, data in members + [(DATAPACKAGE, datapackage), (DIGEST, digest)]:
            info = zipfile.ZipInfo(path, date_time=_DOS_EPOCH)
            info.external_attr = 0o644 << 16
            # .gz members are already compressed — store them; the
            # text members deflate (zlib level 6, deterministic)
            info.compress_type = (
                zipfile.ZIP_STORED if path.endswith(".gz") else zipfile.ZIP_DEFLATED
            )
            zf.writestr(info, data)
    return out.getvalue()


def verify_wacz(data: bytes) -> dict[str, bytes]:
    """Open one WACZ and verify its full integrity chain:
    datapackage-digest -> datapackage -> every resource's sha256 and
    byte size. Raises ``ValueError`` on any mismatch; returns
    {member path: bytes} for the verified resources."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = set(zf.namelist())
    for required in (DATAPACKAGE, DIGEST):
        if required not in names:
            raise ValueError(f"WACZ missing {required}")
    dp_bytes = zf.read(DATAPACKAGE)
    dig = json.loads(zf.read(DIGEST))
    if dig.get("hash") != _sha256(dp_bytes):
        raise ValueError("datapackage.json digest mismatch")
    dp = json.loads(dp_bytes)
    out: dict[str, bytes] = {}
    for res in dp.get("resources", []):
        path = res["path"]
        if path not in names:
            raise ValueError(f"WACZ resource missing: {path}")
        body = zf.read(path)
        if len(body) != res["bytes"] or _sha256(body) != res["hash"]:
            raise ValueError(f"WACZ resource corrupt: {path}")
        out[path] = body
    return out


# ---------------------------------------------------------------- sink


def write_wacz(ds, out_dir: str, prefix: str = "part"):
    """Sink a pages-shaped Dataset (url, warc_ts, html) as one
    self-contained ``.wacz`` per block (content-hash names,
    tmp+rename). Returns the slim (file, records, bytes) manifest
    Dataset."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        body = wacz_bytes(batch)
        name = f"{prefix}-{hashlib.md5(body).hexdigest()}.wacz"
        tmp = os.path.join(out_dir, f".{name}.tmp{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "file": pa.array([name]),
                "records": pa.array([len(batch)], pa.int64()),
                "bytes": pa.array([len(body)], pa.int64()),
            }
        )

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)


# -------------------------------------------------------------- source


def _binary_ds(paths):
    import ray.data as rd

    return rd.read_binary_files(paths, include_paths=True)


def read_wacz_pages(paths, chunk_size: int = 32 * 1024):
    """WACZ shard tree -> pages-shaped Dataset (url, warc_ts, html,
    mime) — identical shape to sources/warc.read_warc_pages, so the
    parse stage consumes either interchangeably. One stateless task
    per package; every package is sha256-verified before any record
    is yielded."""
    import numpy as np

    from .warc import _http_mime, iter_warc_records

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, blobs, mimes = [], [], [], []
        for raw in batch.column("bytes").to_pylist():
            members = verify_wacz(raw)
            for path, body in sorted(members.items()):
                if not (path.startswith("archive/") and path.endswith(".warc.gz")):
                    continue
                for rec in iter_warc_records(body, chunk_size):
                    urls.append(rec.url or "")
                    tss.append(rec.ts_ms)
                    blobs.append(rec.block)
                    mimes.append(_http_mime(rec.block))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(np.array(tss, dtype="int64"), pa.timestamp("ms")),
                "html": pa.array(blobs, pa.binary()),
                "mime": pa.array(mimes, pa.string()),
            }
        )

    return _binary_ds(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=None
    )


def read_wacz_cdx(paths):
    """WACZ shard tree -> capture-index Dataset (the sources/cdx.py
    schema, ``shard`` = the package filename). Verified read; one
    task per package."""
    from .cdx import _rows_to_table, parse_cdxj

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for raw, path in zip(
            batch.column("bytes").to_pylist(), batch.column("path").to_pylist()
        ):
            members = verify_wacz(raw)
            rows = parse_cdxj(members[INDEX_PATH])
            tables.append(_rows_to_table(rows, os.path.basename(path)))
        return pa.concat_tables(tables)

    return _binary_ds(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=None
    )


def read_wacz_page_list(paths):
    """WACZ shard tree -> the page list (id, url, ts, title, text) —
    what a replay UI's search box indexes. Verified read."""
    def parse(batch: pa.Table) -> pa.Table:
        ids, urls, tss, titles, texts = [], [], [], [], []
        for raw in batch.column("bytes").to_pylist():
            members = verify_wacz(raw)
            lines = members[PAGES_PATH].decode("utf-8").splitlines()
            for line in lines[1:]:  # line 0 is the json-pages header
                if not line.strip():
                    continue
                row = json.loads(line)
                ids.append(row["id"])
                urls.append(row["url"])
                tss.append(row["ts"])
                titles.append(row["title"])
                texts.append(row["text"])
        return pa.table(
            {
                "id": pa.array(ids, pa.string()),
                "url": pa.array(urls, pa.string()),
                "ts": pa.array(tss, pa.string()),
                "title": pa.array(titles, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return _binary_ds(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=None
    )
