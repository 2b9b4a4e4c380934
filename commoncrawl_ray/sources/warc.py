"""WARC 1.0 (ISO 28500) writer, streaming reader, and Ray Data
source/sink — the format modern Common Crawl publishes, added beside
the reference's ARC layer (``sources/arc.py``) so a user can run the
same parse pipeline over either archive generation.

Built from the PUBLIC format spec only (ISO 28500 / the WARC 1.0
specification; no reference counterpart exists — the reference
predates WARC):

- **Layout** — like Common Crawl's .warc.gz: each record is its own
  gzip member, so a file streams record-at-a-time and files split at
  member boundaries (the reader reuses ``arc.iter_gzip_members``,
  which CRC/ISIZE-checks every member during inflate).
- **Record grammar** — ``WARC/1.0 CRLF named-fields CRLF CRLF block
  CRLF CRLF`` with ``Content-Length`` giving the exact block size.
  The writer emits one ``warcinfo`` record (member 0) then one
  ``response`` record per page whose block is the full HTTP response
  message (status line + headers + CRLF CRLF + body) — exactly the
  bytes the parse/extract kernel consumes.
- **Determinism** — ``WARC-Record-ID`` is a urn:uuid derived from
  md5(url, timestamp) and ``WARC-Date`` from the row's own
  ``warc_ts`` (never the wall clock), so a write -> read -> parse
  round trip is value-hash-reproducible (the ``warc_roundtrip``
  registry row shares the ARC round-trip's no-format oracle).

Ray Data mapping mirrors the ARC source: a .warc.gz is unsplittable
(sequential member scan), so one file = one read task via
``read_binary_files``; the sink writes one file per block.
"""

from __future__ import annotations

import base64
import hashlib
from dataclasses import dataclass, field
from datetime import datetime, timezone

from .arc import iter_gzip_members, _gzip_member

_CRLF = b"\r\n"
WARC_VERSION = b"WARC/1.0"


def _warc_date(ts_ms: int) -> str:
    dt = datetime.fromtimestamp(ts_ms / 1000.0, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def _record_id(*parts) -> str:
    h = hashlib.md5("|".join(str(p) for p in parts).encode()).hexdigest()
    return (
        f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def _record(fields: list[tuple[str, str]], block: bytes) -> bytes:
    head = WARC_VERSION + _CRLF
    head += b"".join(
        f"{k}: {v}".encode("utf-8") + _CRLF for k, v in fields
    )
    head += f"Content-Length: {len(block)}".encode() + _CRLF + _CRLF
    return head + block + _CRLF + _CRLF


def warcinfo_record(filename: str, ts_ms: int) -> bytes:
    block = (
        b"software: commoncrawl-ray warc writer\r\n"
        b"format: WARC File Format 1.0\r\n"
    )
    return _record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", _record_id("warcinfo", filename, ts_ms)),
            ("WARC-Date", _warc_date(ts_ms)),
            ("WARC-Filename", filename),
            ("Content-Type", "application/warc-fields"),
        ],
        block,
    )


def response_record(url: str, ts_ms: int, http_message: bytes) -> bytes:
    return _record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", _record_id("response", url, ts_ms)),
            ("WARC-Date", _warc_date(ts_ms)),
            ("WARC-Target-URI", url),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        http_message,
    )


def write_warc_file_mixed(f, filename: str, records) -> tuple[int, int]:
    """``records``: iterable of (url, ts_ms, http_message_bytes,
    prev_ts_ms_or_None). ``prev_ts_ms`` None writes a normal response
    record; set, the capture's payload is already archived at
    (same url, prev_ts_ms) and an identical-payload-digest ``revisit``
    record is written instead (header section only — WARC 1.0 §6.7.2).
    The incremental-recrawl sink. Returns (responses, revisits)."""
    first = True
    n_resp = n_rev = 0
    for url, ts_ms, msg, prev_ts in records:
        if first:
            first = False
            f.write(_gzip_member(warcinfo_record(filename, ts_ms)))
        if prev_ts is None:
            f.write(_gzip_member(response_record(url, ts_ms, msg)))
            n_resp += 1
        else:
            head, _body = split_http_message(msg)
            f.write(
                _gzip_member(
                    revisit_record(
                        url, ts_ms, payload_digest(msg), url, prev_ts, head
                    )
                )
            )
            n_rev += 1
    if first:  # empty file still carries its warcinfo
        f.write(_gzip_member(warcinfo_record(filename, 0)))
    return n_resp, n_rev


def write_warc_file(f, filename: str, records) -> int:
    """``records``: iterable of (url, ts_ms, http_message_bytes).
    Returns the number of response records written."""
    first_ts = None
    n = 0
    for url, ts_ms, msg in records:
        if first_ts is None:
            first_ts = ts_ms
            f.write(_gzip_member(warcinfo_record(filename, ts_ms)))
        f.write(_gzip_member(response_record(url, ts_ms, msg)))
        n += 1
    if first_ts is None:  # empty file still carries its warcinfo
        f.write(_gzip_member(warcinfo_record(filename, 0)))
    return n


@dataclass
class WarcRecord:
    rec_type: str
    url: str | None
    ts_ms: int
    content_type: str | None
    block: bytes
    # full lowercased named-field map — revisit records carry their
    # keeper reference (WARC-Refers-To-*) and payload digest here
    fields: dict = field(default_factory=dict)


def parse_warc_member(data: bytes) -> WarcRecord:
    """One inflated gzip member -> WarcRecord. Strict on the version
    line and Content-Length (the framing WARC readers rely on);
    lenient on unknown fields."""
    end = data.find(_CRLF + _CRLF)
    if end == -1 or not data.startswith(WARC_VERSION):
        raise ValueError("not a WARC/1.0 record")
    fields: dict[str, str] = {}
    for line in data[len(WARC_VERSION) + 2 : end].split(_CRLF):
        k, _, v = line.decode("utf-8", errors="replace").partition(":")
        if _:
            fields[k.strip().lower()] = v.strip()
    length = int(fields["content-length"])
    block = data[end + 4 : end + 4 + length]
    if len(block) != length:
        raise ValueError("truncated WARC block")
    ts_ms = 0
    date = fields.get("warc-date")
    if date:
        dt = datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
        ts_ms = int(dt.timestamp() * 1000)
    return WarcRecord(
        rec_type=fields.get("warc-type", ""),
        url=fields.get("warc-target-uri"),
        ts_ms=ts_ms,
        content_type=fields.get("content-type"),
        block=block,
        fields=fields,
    )


def _http_mime(msg: bytes) -> str:
    """Content-Type of the HTTP message inside a response block
    (header section only), '' when absent."""
    end = msg.find(_CRLF + _CRLF)
    head = msg[: end if end != -1 else len(msg)]
    for line in head.split(_CRLF):
        if line.lower().startswith(b"content-type:"):
            return (
                line.split(b":", 1)[1].split(b";")[0].strip().decode(
                    "utf-8", errors="replace"
                )
            )
    return ""


def iter_warc_records_uncompressed(data: bytes):
    """Records of an UNCOMPRESSED (or transparently inflated) WARC
    stream: ``header CRLF CRLF block CRLF CRLF`` back to back — what a
    gunzip layer (e.g. Arrow's filename-inferred decompression)
    produces from member-per-record .warc.gz."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record CRLF padding
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        end = data.find(_CRLF + _CRLF, pos)
        if end == -1:
            raise ValueError("truncated WARC header")
        rec_end = end + 4
        # Content-Length bounds the block; reuse the strict parser on
        # the exact record slice
        head = data[pos:end].split(_CRLF)
        length = None
        for line in head:
            if line.lower().startswith(b"content-length:"):
                length = int(line.split(b":", 1)[1])
                break
        if length is None:
            raise ValueError("WARC record without Content-Length")
        yield parse_warc_member(data[pos : rec_end + length])
        pos = rec_end + length


def iter_warc_records(
    stream, chunk_size: int = 32 * 1024, rec_type: str = "response"
):
    """Yield WarcRecords of ``rec_type`` ('response' for .warc,
    'conversion' for .wet; ``None`` yields every record incl.
    warcinfo). Accepts the gzip member-per-record form (dispatched on
    the gzip magic) or an uncompressed/already-inflated stream (the
    ARC reader's dual dispatch — Arrow's read path may transparently
    gunzip .gz)."""
    if isinstance(stream, (bytes, bytearray)) and bytes(stream[:2]) != b"\x1f\x8b":
        members = iter_warc_records_uncompressed(bytes(stream))
    else:
        members = (
            parse_warc_member(m) for m in iter_gzip_members(stream, chunk_size)
        )
    for rec in members:
        if rec_type is None or rec.rec_type == rec_type:
            yield rec


def read_warc_pages(paths, chunk_size: int = 32 * 1024):
    """WARC files -> pages-shaped Dataset (url, warc_ts, html, mime);
    ``html`` is the verbatim HTTP response message, exactly what the
    parse stage consumes. One file = one read task (unsplittable gz)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(paths, arrow_open_stream_args={"compression": None})

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, blobs, mimes = [], [], [], []
        for raw in batch.column("bytes").to_pylist():
            for rec in iter_warc_records(raw, chunk_size):
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

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)


def conversion_record(url: str, ts_ms: int, text: bytes) -> bytes:
    """WET-style extracted-text record (WARC-Type: conversion, block =
    plain UTF-8 text) — the derived format Common Crawl publishes
    alongside .warc."""
    return _record(
        [
            ("WARC-Type", "conversion"),
            ("WARC-Record-ID", _record_id("conversion", url, ts_ms)),
            ("WARC-Date", _warc_date(ts_ms)),
            ("WARC-Target-URI", url),
            ("Content-Type", "text/plain"),
        ],
        text,
    )


def write_wet_file(f, filename: str, records) -> int:
    """``records``: iterable of (url, ts_ms, text_bytes)."""
    first_ts = None
    n = 0
    for url, ts_ms, text in records:
        if first_ts is None:
            first_ts = ts_ms
            f.write(_gzip_member(warcinfo_record(filename, ts_ms)))
        f.write(_gzip_member(conversion_record(url, ts_ms, text)))
        n += 1
    if first_ts is None:
        f.write(_gzip_member(warcinfo_record(filename, 0)))
    return n


def read_wet_pages(paths, chunk_size: int = 32 * 1024):
    """WET files -> Dataset of (url, warc_ts, text)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(paths, arrow_open_stream_args={"compression": None})

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, texts = [], [], []
        for raw in batch.column("bytes").to_pylist():
            for rec in iter_warc_records(raw, chunk_size, rec_type="conversion"):
                urls.append(rec.url or "")
                tss.append(rec.ts_ms)
                texts.append(rec.block.decode("utf-8", errors="replace"))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(np.array(tss, dtype="int64"), pa.timestamp("ms")),
                "text": pa.array(texts, pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)


def write_wet(ds, out_dir: str, prefix: str = "part"):
    """Sink a (url, warc_ts, text) Dataset as one ``.wet.gz`` per
    block (conversion records; null text becomes an empty block)."""
    import os
    import uuid

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        name = f"{prefix}-{uuid.uuid4().hex}.wet.gz"

        def gen():
            for url, ts, text in zip(
                batch.column("url").to_pylist(),
                batch.column("warc_ts").cast(pa.int64()).to_pylist(),
                batch.column("text").to_pylist(),
            ):
                yield url, ts, (text or "").encode("utf-8")

        tmp = os.path.join(out_dir, f".{name}.tmp{os.getpid()}")
        with open(tmp, "wb") as f:
            n = write_wet_file(f, name, gen())
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {"file": pa.array([name]), "records": pa.array([n], pa.int64())}
        )

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)


def metadata_record(url: str, ts_ms: int, payload: bytes) -> bytes:
    """WAT-style metadata record (WARC-Type: metadata, JSON block) —
    the derived per-page metadata format Common Crawl publishes."""
    return _record(
        [
            ("WARC-Type", "metadata"),
            ("WARC-Record-ID", _record_id("metadata", url, ts_ms)),
            ("WARC-Date", _warc_date(ts_ms)),
            ("WARC-Target-URI", url),
            ("Content-Type", "application/json"),
        ],
        payload,
    )


def write_wat_file(f, filename: str, records) -> int:
    """``records``: iterable of (url, ts_ms, json_bytes)."""
    first_ts = None
    n = 0
    for url, ts_ms, payload in records:
        if first_ts is None:
            first_ts = ts_ms
            f.write(_gzip_member(warcinfo_record(filename, ts_ms)))
        f.write(_gzip_member(metadata_record(url, ts_ms, payload)))
        n += 1
    if first_ts is None:
        f.write(_gzip_member(warcinfo_record(filename, 0)))
    return n


def read_wat_pages(paths, chunk_size: int = 32 * 1024):
    """WAT files -> Dataset of (url, warc_ts, meta_json)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(paths, arrow_open_stream_args={"compression": None})

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, metas = [], [], []
        for raw in batch.column("bytes").to_pylist():
            for rec in iter_warc_records(raw, chunk_size, rec_type="metadata"):
                urls.append(rec.url or "")
                tss.append(rec.ts_ms)
                metas.append(rec.block.decode("utf-8", errors="replace"))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(np.array(tss, dtype="int64"), pa.timestamp("ms")),
                "meta_json": pa.array(metas, pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)


def write_wat(ds, out_dir: str, prefix: str = "part"):
    """Sink a (url, warc_ts, meta_json) Dataset as one ``.wat.gz`` per
    block (metadata records; the JSON column is written verbatim)."""
    import os
    import uuid

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        name = f"{prefix}-{uuid.uuid4().hex}.wat.gz"

        def gen():
            for url, ts, meta in zip(
                batch.column("url").to_pylist(),
                batch.column("warc_ts").cast(pa.int64()).to_pylist(),
                batch.column("meta_json").to_pylist(),
            ):
                yield url, ts, (meta or "{}").encode("utf-8")

        tmp = os.path.join(out_dir, f".{name}.tmp{os.getpid()}")
        with open(tmp, "wb") as f:
            n = write_wat_file(f, name, gen())
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {"file": pa.array([name]), "records": pa.array([n], pa.int64())}
        )

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)


def write_warc(ds, out_dir: str, prefix: str = "part"):
    """Sink a pages-shaped Dataset (url, warc_ts, html) as one
    ``.warc.gz`` per block; rows pass through verbatim as response
    blocks."""
    import os
    import uuid

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        name = f"{prefix}-{uuid.uuid4().hex}.warc.gz"

        def gen():
            for url, ts, rec in zip(
                batch.column("url").to_pylist(),
                batch.column("warc_ts").cast(pa.int64()).to_pylist(),
                batch.column("html").to_pylist(),
            ):
                yield url, ts, rec

        tmp = os.path.join(out_dir, f".{name}.tmp{os.getpid()}")
        with open(tmp, "wb") as f:
            n = write_warc_file(f, name, gen())
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {"file": pa.array([name]), "records": pa.array([n], pa.int64())}
        )

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------
# revisit records — digest-based archive deduplication (what real web
# archives write on a re-crawl whose payload is already stored; WARC
# 1.0 §6.7.2, identical-payload-digest profile). No reference
# counterpart (the reference predates WARC); built from the public
# spec + the netpreserve profile URI.
# --------------------------------------------------------------------

REVISIT_PROFILE = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"


def split_http_message(msg: bytes) -> tuple[bytes, bytes]:
    """(header-section-incl-terminator, payload body). Tolerates the
    bare-LF header terminator real crawls encounter (and ~2% of the
    synthetic universe deliberately emits, sources/synth.py:298) —
    without the fallback every bare-LF page digests an EMPTY body and
    the whole class aliases as one identical payload."""
    end = msg.find(_CRLF + _CRLF)
    if end != -1:
        return msg[: end + 4], msg[end + 4 :]
    end = msg.find(b"\n\n")
    if end != -1:
        return msg[: end + 2], msg[end + 2 :]
    return msg, b""


def payload_digest(msg: bytes) -> str:
    """``sha1:<base32>`` of the HTTP payload body (bytes after the
    header terminator) — the convention real WARC/CDX tooling uses for
    WARC-Payload-Digest."""
    _head, body = split_http_message(msg)
    return "sha1:" + base64.b32encode(hashlib.sha1(body).digest()).decode()


def payload_digest64(msg: bytes) -> int:
    """Signed-int64 view of the SAME sha1 payload digest (first 8
    bytes, big-endian) — the slim wire/store form the recrawl digest
    actors hold; the full base32 string form is recomputed from the
    payload at WARC-write time, so both derive from one hash."""
    _head, body = split_http_message(msg)
    return int.from_bytes(hashlib.sha1(body).digest()[:8], "big", signed=True)


def revisit_record(
    url: str,
    ts_ms: int,
    digest: str,
    refers_url: str,
    refers_ts_ms: int,
    http_headers: bytes,
) -> bytes:
    """identical-payload-digest revisit: the block keeps only the HTTP
    header section of THIS capture (its payload is elsewhere — named by
    WARC-Refers-To-Target-URI/-Date + the shared payload digest)."""
    return _record(
        [
            ("WARC-Type", "revisit"),
            ("WARC-Record-ID", _record_id("revisit", url, ts_ms)),
            ("WARC-Date", _warc_date(ts_ms)),
            ("WARC-Target-URI", url),
            ("WARC-Profile", REVISIT_PROFILE),
            ("WARC-Payload-Digest", digest),
            ("WARC-Refers-To-Target-URI", refers_url),
            ("WARC-Refers-To-Date", _warc_date(refers_ts_ms)),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        http_headers,
    )


def index_warc_digests(paths):
    """WARC files -> slim capture index (file, url, ts_ms, digest) —
    ONE sequential scan per file (unsplittable gz), no payload bytes in
    the output. This is the only thing the dedup exchanges ever ship."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(
        paths, include_paths=True, arrow_open_stream_args={"compression": None}
    )

    def idx(batch: pa.Table) -> pa.Table:
        files, urls, tss, digs = [], [], [], []
        for path, raw in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            for rec in iter_warc_records(raw):
                files.append(path)
                urls.append(rec.url or "")
                tss.append(rec.ts_ms)
                digs.append(payload_digest(rec.block))
        return pa.table(
            {
                "file": pa.array(files, pa.string()),
                "url": pa.array(urls, pa.string()),
                "ts_ms": pa.array(tss, pa.int64()),
                "digest": pa.array(digs, pa.string()),
            }
        )

    return ds.map_batches(idx, batch_format="pyarrow", batch_size=None)


def deduplicate_warc(paths, out_dir: str, suffix: str = "dedup"):
    """Rewrite a WARC archive so each distinct payload is stored ONCE:
    the earliest capture (min (ts_ms, url, file) per digest) keeps its
    response record; every later capture becomes a ``revisit`` record
    pointing at the keeper. Returns a Dataset of per-file counts
    (file, responses, revisits).

    Scale shape: payload bytes NEVER ride an exchange. The pipeline is
    (1) slim digest index scan, (2) keeper selection via
    ``groupby(digest)`` — a group is one payload's duplicate set,
    bounded in practice, (3) ``groupby(file)`` routes each file's slim
    dup map to ONE rewrite task that re-reads its source file locally
    and streams the deduped copy out (deterministic gzip, mtime=0).
    Two all-to-all exchanges total, both over (file, url, ts, digest)
    rows only. A failed run re-runs per file idempotently (tmp+rename).
    """
    import os

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    idx = index_warc_digests(paths)

    def pick(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(
                group.column("ts_ms").to_pylist(),
                group.column("url").to_pylist(),
                group.column("file").to_pylist(),
            )
        )
        keep_ts, keep_url, _keep_file = rows[0]
        return pa.table(
            {
                "file": pa.array([r[2] for r in rows], pa.string()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "ts_ms": pa.array([r[0] for r in rows], pa.int64()),
                "is_dup": pa.array(
                    [i > 0 for i in range(len(rows))], pa.bool_()
                ),
                "ref_url": pa.array([keep_url] * len(rows), pa.string()),
                "ref_ts": pa.array([keep_ts] * len(rows), pa.int64()),
            }
        )

    marked = idx.groupby("digest").map_groups(pick, batch_format="pyarrow")

    def rewrite(group: pa.Table) -> pa.Table:
        src = group.column("file").to_pylist()[0]
        dup = {
            (u, t): (ru, rt)
            for u, t, d, ru, rt in zip(
                group.column("url").to_pylist(),
                group.column("ts_ms").to_pylist(),
                group.column("is_dup").to_pylist(),
                group.column("ref_url").to_pylist(),
                group.column("ref_ts").to_pylist(),
            )
            if d
        }
        base = os.path.basename(src)
        if base.endswith(".warc.gz"):
            base = base[: -len(".warc.gz")]
        name = f"{base}.{suffix}.warc.gz"
        tmp = os.path.join(out_dir, f".{name}.tmp{os.getpid()}")
        n_resp = n_rev = 0
        with open(src, "rb") as fin, open(tmp, "wb") as fout:
            for member in iter_gzip_members(fin):
                rec = parse_warc_member(member)
                key = (rec.url or "", rec.ts_ms)
                if rec.rec_type == "response" and key in dup:
                    ru, rt = dup[key]
                    head, _body = split_http_message(rec.block)
                    fout.write(
                        _gzip_member(
                            revisit_record(
                                rec.url or "",
                                rec.ts_ms,
                                payload_digest(rec.block),
                                ru,
                                rt,
                                head,
                            )
                        )
                    )
                    n_rev += 1
                else:
                    fout.write(_gzip_member(member))
                    if rec.rec_type == "response":
                        n_resp += 1
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "file": pa.array([name], pa.string()),
                "responses": pa.array([n_resp], pa.int64()),
                "revisits": pa.array([n_rev], pa.int64()),
            }
        )

    return marked.groupby("file").map_groups(rewrite, batch_format="pyarrow")


def read_warc_revisit_pages(paths):
    """Revisit records of a deduplicated archive -> Dataset of
    (url, warc_ts, html, payload_digest) where ``html`` is the stored
    HTTP header section (the identical-payload-digest profile keeps
    headers only). Feeds the CDX indexer so a deduplicated archive
    stays fully addressable capture-by-capture."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(paths, arrow_open_stream_args={"compression": None})

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, blobs, digs = [], [], [], []
        for raw in batch.column("bytes").to_pylist():
            for rec in iter_warc_records(raw, rec_type="revisit"):
                urls.append(rec.url or "")
                tss.append(rec.ts_ms)
                blobs.append(rec.block)
                digs.append(rec.fields.get("warc-payload-digest", ""))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(np.array(tss, dtype="int64"), pa.timestamp("ms")),
                "html": pa.array(blobs, pa.binary()),
                "payload_digest": pa.array(digs, pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)


def read_warc_captures(paths):
    """All response + revisit records of a (possibly deduplicated)
    archive -> Dataset of (url, ts_ms, rec_type, digest, refers_url,
    refers_ts) — the capture-level view a CDX consumer sees. For a
    response the digest is computed from the stored payload; for a
    revisit it is the record's own WARC-Payload-Digest field, and the
    refers_* columns carry the keeper reference (null on responses)."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(paths, arrow_open_stream_args={"compression": None})

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, types, digs, rurls, rtss = [], [], [], [], [], []
        for raw in batch.column("bytes").to_pylist():
            for rec in iter_warc_records(raw, rec_type=None):
                if rec.rec_type == "response":
                    dig = payload_digest(rec.block)
                    ru, rt = None, None
                elif rec.rec_type == "revisit":
                    dig = rec.fields.get("warc-payload-digest", "")
                    ru = rec.fields.get("warc-refers-to-target-uri")
                    rd_ = rec.fields.get("warc-refers-to-date")
                    rt = None
                    if rd_:
                        dt = datetime.strptime(
                            rd_, "%Y-%m-%dT%H:%M:%SZ"
                        ).replace(tzinfo=timezone.utc)
                        rt = int(dt.timestamp() * 1000)
                else:
                    continue
                urls.append(rec.url or "")
                tss.append(rec.ts_ms)
                types.append(rec.rec_type)
                digs.append(dig)
                rurls.append(ru)
                rtss.append(rt)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ts_ms": pa.array(tss, pa.int64()),
                "rec_type": pa.array(types, pa.string()),
                "digest": pa.array(digs, pa.string()),
                "refers_url": pa.array(rurls, pa.string()),
                "refers_ts": pa.array(rtss, pa.int64()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)
