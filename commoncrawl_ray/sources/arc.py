"""ARC file format: writer, streaming reader, and Ray Data source/sink.

Faithful Python reimplementation of the reference's ARC path (SURVEY
S1/S11/P1), from public format knowledge + the reference's own code:

- **Layout** — gzip *member per record*; member 0 is a
  ``filedesc://`` file-header record carrying the IA "LX" gzip extra
  field (FLG=4, OS=3, XLEN=8 — `ArcFileReaderTests.java:87-88,
  128-184`); each content record is ``metadata-line \\n http-headers
  (CRLF-terminated, blank line) payload \\n`` compressed as its own
  plain gzip member (`ArcFileReaderTests.java:218-339`).
- **Metadata line** — ``URL IP-address Archive-date Content-type
  Archive-length`` parsed with the reference's regex
  ``^(.*)\\s([0-9.]+)\\s([0-9]+)\\s([^\\s]+)\\s([0-9]+)$``
  (`ARCFileReader.java:557`) and, when that fails (URLs containing
  spaces), the right-to-left space-split fallback
  (`ARCFileReader.java:573-597`).
- **Header terminator** — the CRLF state machine accepts ``\\n\\n``
  and ``\\n\\r\\n`` endings (lenient LF-LF — `ARCFileReader.java:424-460`);
  the raw header size INCLUDES the terminator, and
  ``payload_len = max(0, record_len - raw_header_size)``
  (`ARCFileReader.java:654-656`).
- **Emitted KV** — key = URL; value = original headers + injected
  ``x_commoncrawl_{HostIP,ArcTimestamp,ArcMimeType,ArcPayloadLen}``
  headers + CRLF + payload (`ARCFileReader.java:602-616,660-676`;
  header names `crawl/common/shared/Constants.java:6-21`).
- **Integrity** — each member's CRC32 + ISIZE are validated during
  inflate (zlib verifies both, as `ARCFileReader.java:230-292` does).

Ray Data mapping: one ARC file is unsplittable (gzip members must be
scanned sequentially — `hadoop/io/mapreduce/ARCFileInputFormat.java:88`),
so :func:`read_arc_pages` maps one file → one read task via
``read_binary_files`` + a parse ``map_batches``; :func:`write_arc`
sinks a pages Dataset as one ``.arc.gz`` per block.
"""

from __future__ import annotations

import gzip
import io
import re
import zlib
from dataclasses import dataclass

from ..functions.http import format_timestamp14, parse_timestamp14

ARC_MAGIC = "filedesc://"
ARC_GZIP_EXTRA_FIELD = bytes([8, 0, ord("L"), ord("X"), 4, 0, 0, 0, 0, 0])
_HDR_HOST_IP = "x_commoncrawl_HostIP"
_HDR_ARC_TS = "x_commoncrawl_ArcTimestamp"
_HDR_ARC_MIME = "x_commoncrawl_ArcMimeType"
_HDR_PAYLOAD_LEN = "x_commoncrawl_ArcPayloadLen"

_METADATA_RE = re.compile(r"^(.*)\s([0-9.]+)\s([0-9]+)\s([^\s]+)\s([0-9]+)$")


# --------------------------------------------------------------------
# writer
# --------------------------------------------------------------------


def _gzip_member(data: bytes) -> bytes:
    return gzip.compress(data, compresslevel=6, mtime=0)


def _gzip_member_with_ia_extra(data: bytes) -> bytes:
    """Gzip member with the IA 'LX' extra field spliced into the header
    (FLG=4, OS=3), exactly as generateARCFileMetaData does
    (`ArcFileReaderTests.java:152-184`)."""
    raw = bytearray(_gzip_member(data))
    if raw[3] != 0:
        raise ValueError("unexpected non-zero GZIP FLG")
    raw[3] = 4  # FLG: FEXTRA
    raw[9] = 3  # OS: Unix
    return bytes(raw[:10]) + ARC_GZIP_EXTRA_FIELD + bytes(raw[10:])


def file_header_record(arc_file_name: str, ts_ms: int) -> bytes:
    """The ``filedesc://`` member-0 record."""
    lines23 = "\n1 0 CommonCrawl\nURL IP-address Archive-date Content-type Archive-length\n"
    record_len = len(lines23.encode("iso-8859-1"))
    header = (
        f"{ARC_MAGIC}{arc_file_name} 0.0.0.0 {format_timestamp14(ts_ms)} "
        f"text/plain {record_len}{lines23}"
    )
    return _gzip_member_with_ia_extra(header.encode("iso-8859-1") + b"\n")


def record_member(
    url: str, ip: str, ts_ms: int, mime: str, header_text: str, payload: bytes
) -> bytes:
    """One content record as a plain gzip member. ``header_text`` is
    the header lines joined by CRLF with NO trailing newline; the final
    line terminator + blank line are appended here (mirroring
    ``headers.toString()+"\\r\\n"`` of the reference writer, where
    toString() CRLF-terminates every line)."""
    # headerless records still get an empty header + blank line
    # ("\r\n\r\n") so the reader's terminator scan always finds an
    # accepting "\n\r\n" before the payload; bare "\r\n" is NOT a
    # terminator the CRLF state machine recognizes and would make the
    # scan run into binary payload bytes (ADVICE r1)
    header_bytes = (header_text + "\r\n\r\n").encode("utf-8") if header_text else b"\r\n\r\n"
    record_len = len(header_bytes) + len(payload)
    meta = f"{url} {ip} {format_timestamp14(ts_ms)} {mime} {record_len}\n"
    return _gzip_member(meta.encode("utf-8") + header_bytes + payload + b"\n")


def write_arc_file(
    fobj, arc_file_name: str, records, file_ts_ms: int = 1341100800000
) -> int:
    """records: iterable of (url, ip, ts_ms, mime, header_text,
    payload). Returns record count."""
    fobj.write(file_header_record(arc_file_name, file_ts_ms))
    n = 0
    for url, ip, ts_ms, mime, header_text, payload in records:
        fobj.write(record_member(url, ip, ts_ms, mime, header_text, payload))
        n += 1
    return n


# --------------------------------------------------------------------
# reader
# --------------------------------------------------------------------


@dataclass
class ArcRecord:
    url: str
    host_ip: str
    arc_timestamp: str  # TIMESTAMP14
    mime: str
    record_len: int
    headers: list  # [(key, value)] original order; key "" for keyless lines
    payload: bytes

    @property
    def ts_ms(self) -> int | None:
        return parse_timestamp14(self.arc_timestamp)

    def kv_value(self) -> bytes:
        """The reader's BytesWritable value: original + injected
        headers + CRLF + payload (`ARCFileReader.java:660-676`)."""
        lines = []
        for k, v in self.headers:
            lines.append(f"{k}: {v}" if k else str(v))
        lines.append(f"{_HDR_HOST_IP}: {self.host_ip}")
        lines.append(f"{_HDR_ARC_TS}: {self.arc_timestamp}")
        lines.append(f"{_HDR_ARC_MIME}: {self.mime}")
        lines.append(f"{_HDR_PAYLOAD_LEN}: {len(self.payload)}")
        return ("\r\n".join(lines) + "\r\n\r\n").encode("utf-8") + self.payload


def _parse_malformed_metadata(line: str) -> list | None:
    """Right-to-left space split: the last 4 fields are well-formed,
    everything left of them is the URL (spaces included) —
    `ARCFileReader.java:573-597`."""
    parts = [None] * 5
    last = len(line)
    count = 0
    for _ in range(5):
        nxt = line.rfind(" ", 0, last)
        if nxt != -1 or count == 4:
            count += 1
            if count == 5:
                parts[5 - count] = line[:last]
            else:
                parts[5 - count] = line[nxt + 1 : last]
            last = nxt
        else:
            break
    return parts if count == 5 else None


def parse_metadata_line(line: str) -> list | None:
    m = _METADATA_RE.match(line)
    if m:
        return list(m.groups())
    return _parse_malformed_metadata(line)


def _find_header_terminator(data: bytes) -> int:
    """End offset (exclusive) of the header terminator: first
    ``\\n\\n`` or ``\\n\\r\\n`` (the CRLF state machine's accepting
    paths). -1 if absent."""
    i1 = data.find(b"\n\n")
    i2 = data.find(b"\n\r\n")
    ends = []
    if i1 != -1:
        ends.append(i1 + 2)
    if i2 != -1 and (i1 == -1 or i2 < i1):
        ends.append(i2 + 3)
    return min(ends) if ends else -1


def parse_arc_record(member: bytes) -> ArcRecord:
    nl = member.find(b"\n")
    if nl == -1:
        raise ValueError("ARC record without metadata line")
    meta = member[:nl].decode("utf-8", errors="replace")
    parts = parse_metadata_line(meta)
    if parts is None:
        raise ValueError(f"Invalid ARC Metadata Line:{meta}")
    url, ip, ts14, mime, record_len_s = parts
    record_len = int(record_len_s)
    rest = member[nl + 1 :]
    # bound the terminator search to the declared record length so a
    # record whose header bytes lack a terminator can't have the scan
    # latch onto a \n\n occurring inside the NEXT record's bytes
    term = _find_header_terminator(rest[:record_len])
    if term == -1:
        term = min(len(rest), record_len)
    raw_header = rest[:term]
    payload_len = max(0, record_len - len(raw_header))
    payload = rest[term : term + payload_len]
    headers = []
    for line in raw_header.decode("utf-8", errors="replace").splitlines():
        if not line:
            continue
        colon = line.find(":")
        if colon != -1 and colon != len(line) - 1:
            headers.append((line[:colon], line[colon + 1 :]))
        else:
            headers.append(("", line))
    return ArcRecord(
        url=url,
        host_ip=ip,
        arc_timestamp=ts14,
        mime=mime,
        record_len=record_len,
        headers=headers,
        payload=payload,
    )


def iter_gzip_members(stream, chunk_size: int = 32 * 1024):
    """Sequentially inflate the gzip members of a stream (any read()
    granularity — chunk boundaries may fall anywhere, as the
    reference's 1-byte-at-a-time test demands). zlib verifies each
    member's CRC32 and ISIZE trailer, mirroring
    `ARCFileReader.java:230-292`."""
    if isinstance(stream, (bytes, bytearray)):
        stream = io.BytesIO(stream)
    buf = b""
    eof = False
    while True:
        # ensure at least some data to start a member
        while not buf and not eof:
            chunk = stream.read(chunk_size)
            if not chunk:
                eof = True
            else:
                buf = chunk
        if not buf:
            return
        d = zlib.decompressobj(wbits=47)  # gzip wrapper, CRC+ISIZE checked
        out = bytearray()
        while True:
            out += d.decompress(buf)
            if d.eof:
                buf = d.unused_data
                break
            chunk = stream.read(chunk_size)
            if not chunk:
                eof = True
                if not d.eof:
                    raise EOFError("truncated gzip member in ARC stream")
                break
            buf = chunk
        yield bytes(out)


def iter_arc_records_uncompressed(data: bytes):
    """Records of an UNCOMPRESSED (or already-inflated) ARC stream:
    ``metadata-line \\n <record_len bytes> [\\n]`` back to back — the
    classic .arc layout, and exactly what a transparent gunzip layer
    (e.g. Ray's binary datasource on ``.gz`` paths) hands us for a
    member-per-record file."""
    pos = 0
    n = len(data)
    first = True
    while pos < n:
        nl = data.find(b"\n", pos)
        if nl == -1:
            break
        meta = data[pos:nl].decode("utf-8", errors="replace")
        if not meta.strip():
            pos = nl + 1
            continue
        parts = parse_metadata_line(meta)
        if parts is None:
            raise ValueError(f"Invalid ARC Metadata Line:{meta}")
        record_len = int(parts[4])
        body_start = nl + 1
        body_end = min(n, body_start + record_len)
        if first:
            if not meta.startswith(ARC_MAGIC):
                raise ValueError("not an ARC file: missing filedesc:// header record")
            first = False
        else:
            yield parse_arc_record(data[pos:body_end])
        pos = body_end
        if pos < n and data[pos : pos + 1] == b"\n":
            pos += 1


def iter_arc_records(stream, chunk_size: int = 32 * 1024):
    """ArcRecord for every content record (member 0, the filedesc
    header, is validated and skipped). Accepts the gzip
    member-per-record form (dispatched on the gzip magic) or the
    uncompressed/inflated stream."""
    if isinstance(stream, (bytes, bytearray)) and not bytes(stream[:2]) == b"\x1f\x8b":
        yield from iter_arc_records_uncompressed(bytes(stream))
        return
    if not isinstance(stream, (bytes, bytearray)):
        head = b""
        while len(head) < 2:  # short reads allowed (1-byte streams)
            b = stream.read(2 - len(head))
            if not b:
                break
            head += b
        rest = stream
        if head != b"\x1f\x8b":
            data = head + rest.read()
            yield from iter_arc_records_uncompressed(data)
            return
        stream = _ConcatStream(head, rest)
    for i, member in enumerate(iter_gzip_members(stream, chunk_size)):
        if i == 0:
            if not member.startswith(ARC_MAGIC.encode()):
                raise ValueError("not an ARC file: missing filedesc:// header record")
            continue
        yield parse_arc_record(member)


class _ConcatStream:
    """Prefix bytes + underlying stream as one read() source."""

    def __init__(self, head: bytes, rest):
        self._head = head
        self._rest = rest

    def read(self, n=-1):
        if self._head:
            if n is None or n < 0 or n >= len(self._head):
                out, self._head = self._head, b""
                return out
            out, self._head = self._head[:n], self._head[n:]
            return out
        return self._rest.read(n)


# --------------------------------------------------------------------
# Ray Data source / sink
# --------------------------------------------------------------------


def read_arc_pages(paths, chunk_size: int = 32 * 1024):
    """ARC files -> pages-shaped Dataset (url, warc_ts, html, mime).

    ``html`` carries the reader's KV value (headers incl. injected
    x_commoncrawl_* + CRLF + payload), i.e. exactly what the parse
    stage consumes. One file = one read task (unsplittable gz)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    # compression=None: stop Arrow from transparently gunzipping .gz
    # paths — the member structure IS the record framing
    ds = rd.read_binary_files(paths, arrow_open_stream_args={"compression": None})

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, blobs, mimes = [], [], [], []
        for raw in batch.column("bytes").to_pylist():
            for rec in iter_arc_records(raw, chunk_size):
                urls.append(rec.url)
                tss.append(rec.ts_ms or 0)
                blobs.append(rec.kv_value())
                mimes.append(rec.mime)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(np.array(tss, dtype="int64"), pa.timestamp("ms")),
                "html": pa.array(blobs, pa.binary()),
                "mime": pa.array(mimes, pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)


def write_arc(ds, out_dir: str, prefix: str = "part"):
    """Sink a pages-shaped Dataset (url, warc_ts, html[, lang]) as one
    ``.arc.gz`` per block. ``html`` rows must be raw records
    (status-line headers + CRLF CRLF + body); they are split at the
    terminator to recover (headers, payload)."""
    import os
    import uuid

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        name = f"{prefix}-{uuid.uuid4().hex}.arc.gz"

        def gen():
            for url, ts, rec in zip(
                batch.column("url").to_pylist(),
                batch.column("warc_ts").cast(pa.int64()).to_pylist(),
                batch.column("html").to_pylist(),
            ):
                term = _find_header_terminator(rec)
                if term == -1:
                    header_text, payload = "", rec
                else:
                    # strip the blank line; record_member re-appends it
                    header_text = (
                        rec[:term].decode("utf-8", errors="replace").rstrip("\r\n")
                    )
                    payload = rec[term:]
                # content-type from headers if present
                mime = "text/html"
                for line in header_text.splitlines():
                    if line.lower().startswith("content-type:"):
                        mime = line.split(":", 1)[1].split(";")[0].strip() or mime
                        break
                yield url, "0.0.0.0", ts, mime, header_text, payload

        tmp = os.path.join(out_dir, f".{name}.tmp{os.getpid()}")
        with open(tmp, "wb") as f:
            n = write_arc_file(f, name, gen())
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"file": pa.array([name]), "records": pa.array([n], pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)
