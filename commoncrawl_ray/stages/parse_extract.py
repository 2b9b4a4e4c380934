"""Per-record parse/extract path — the ARC record kernel as a batch stage.

Reimplements the reference's record parse pipeline (SURVEY §2.2 P1-P8)
as a single ``map_batches`` kernel over the pages table:

- record split at the first CRLFCRLF (lenient LFLF fallback) — the
  ``ArcFileBuilder`` CRLF state machine (``ARCFileReader.java:424-460``)
  and ``ByteArrayUtils.indexOf`` header split
  (``ArcFileItemUtils.java:48``);
- header parse (``NIOHttpHeaders``), status line
  (``HttpHeaderUtils.parseStatusLine``), content-type/charset
  (``HttpHeaderUtils.parseContentType``);
- Content-Encoding: gzip best-effort inflate with truncation flag
  (``GZIPUtils.unzipBestEffort``);
- charset precedence decode (``CharsetUtils.bestEffortDecodeBytes``);
- mime disposition (``MimeTypeFilter.checkMimeTypeDisposition``);
- HTML tag-strip text extraction + out-link collection (the
  ``NodeWalker`` analogue, ``util/shared/NodeWalker.java:21``).

The per-url extracted ``text`` is the engine's parity invariant
(BASELINE.json input_hint: byte-identical text per url). The same
functions generate the golden ``text`` column of the synthetic pages
table, and the distributed pipeline must reproduce it at any
parallelism.
"""

from __future__ import annotations

import hashlib
import re
from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

from ..functions.canonicalize import url_fpv2
from ..functions.charset import best_effort_decode
from ..functions.gzip_util import (
    FLAG_TRUNCATED_IN_INFLATE,
    unzip_best_effort,
)
from ..functions.http import (
    parse_content_type,
    parse_headers,
    parse_status_line,
)
from ..functions.mime import MimeDisposition, check_mime_disposition, normalize_mime_type
from ..functions.simhash import simhash_text

_CRLFCRLF = b"\r\n\r\n"
_LFLF = b"\n\n"


def split_record(record: bytes) -> tuple[str, bytes, bool]:
    """Split a raw (headers + body) record at the first CRLFCRLF,
    falling back to LFLF (lenient terminator). -> (header_text, body,
    lenient_used)."""
    idx = record.find(_CRLFCRLF)
    if idx != -1:
        return record[:idx].decode("latin-1"), record[idx + 4 :], False
    idx = record.find(_LFLF)
    if idx != -1:
        return record[:idx].decode("latin-1"), record[idx + 2 :], True
    return record.decode("latin-1"), b"", True


class _HtmlWalker(HTMLParser):
    """Single-pass text + link + title + base extraction (NodeWalker
    analogue). Text of <script>/<style> is skipped."""

    _SKIP = {"script", "style"}

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.links: list[str] = []
        self.base: str | None = None
        self.title: str | None = None
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
        elif tag == "base" and self.base is None:
            for k, v in attrs:
                if k == "href" and v:
                    self.base = v
        elif tag == "title":
            self._in_title = True

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            if self._in_title and self.title is None:
                self.title = data.strip()
            self.chunks.append(data)


_WS = re.compile(r"\s+")


def html_to_text_and_links(html: str) -> tuple[str, list[str], str | None, str | None]:
    """-> (normalized_text, raw_hrefs, base_href, title)."""
    w = _HtmlWalker()
    try:
        w.feed(html)
        w.close()
    except Exception:
        pass
    text = _WS.sub(" ", " ".join(w.chunks)).strip()
    return text, w.links, w.base, w.title


def extract_record(url: str, record: bytes) -> dict:
    """Full per-record extraction -> dict of DOCS fields + 'links'."""
    header_text, body, lenient = split_record(record)
    headers = parse_headers(header_text)
    status = parse_status_line(headers.value_at(0))
    flags = 0
    enc = headers.find_value("content-encoding")
    if enc is not None and enc.strip().lower() == "gzip":
        inflated, truncated = unzip_best_effort(body)
        if inflated is not None:
            body = inflated
        if truncated:
            flags |= FLAG_TRUNCATED_IN_INFLATE
    ctype, charset = parse_content_type(headers.multi_values("content-type"))
    raw_ct = headers.find_value("content-type")
    mime_norm = normalize_mime_type(raw_ct)
    disposition = check_mime_disposition(raw_ct)
    decoded, charset_used = best_effort_decode(ctype, charset, body)

    text: str | None = None
    links: list[str] = []
    base: str | None = None
    title: str | None = None
    if decoded is not None:
        if disposition == MimeDisposition.ACCEPT_HTML:
            text, links, base, title = html_to_text_and_links(decoded)
        elif disposition == MimeDisposition.ACCEPT_TEXT:
            text = _WS.sub(" ", decoded).strip()
    return {
        "http_status": status,
        "mime_norm": mime_norm,
        "disposition": int(disposition),
        "charset_used": charset_used,
        "flags": flags,
        "text": text,
        "links": links,
        "base": base,
        "title": title,
    }


def parse_extract_batch(batch: pa.Table) -> pa.Table:
    """pages(url, warc_ts, html, ...) -> DOCS columns. Zero-copy Arrow
    in; per-row parse (headers/charsets vary per row) with the URL
    fingerprints vectorized."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()

    n = len(urls)
    status = np.zeros(n, dtype=np.int16)
    mime_norm: list[str] = [""] * n
    dispo = np.zeros(n, dtype=np.int8)
    charset_used: list[str | None] = [None] * n
    flags = np.zeros(n, dtype=np.int32)
    texts: list[str | None] = [None] * n
    digests: list[bytes | None] = [None] * n
    simhashes = np.zeros(n, dtype=np.int64)
    n_links = np.zeros(n, dtype=np.int32)
    canon: list[str | None] = [None] * n
    hosts: list[str | None] = [None] * n
    url_fp = np.zeros(n, dtype=np.int64)
    domain_fp = np.zeros(n, dtype=np.int64)
    root_fp = np.zeros(n, dtype=np.int64)

    from ..functions.canonicalize import host_from_canonical

    for i, (u, rec) in enumerate(zip(urls, htmls)):
        r = extract_record(u, rec or b"")
        status[i] = r["http_status"]
        mime_norm[i] = r["mime_norm"]
        dispo[i] = r["disposition"]
        charset_used[i] = r["charset_used"]
        flags[i] = r["flags"]
        texts[i] = r["text"]
        n_links[i] = len(r["links"])
        if r["text"] is not None:
            digests[i] = hashlib.md5(r["text"].encode("utf-8")).digest()
            simhashes[i] = simhash_text(r["text"])
        fp = url_fpv2(u)
        if fp is not None:
            canon[i], domain_fp[i], url_fp[i], root_fp[i] = fp
            hosts[i] = host_from_canonical(canon[i])

    out = pa.table(
        {
            "url": batch.column("url"),
            "canon_url": pa.array(canon, pa.string()),
            "url_fp": pa.array(url_fp),
            "domain_fp": pa.array(domain_fp),
            "root_domain_fp": pa.array(root_fp),
            "host": pa.array(hosts, pa.string()),
            "warc_ts": batch.column("warc_ts"),
            "http_status": pa.array(status),
            "mime_norm": pa.array(mime_norm, pa.string()),
            "disposition": pa.array(dispo),
            "charset_used": pa.array(charset_used, pa.string()),
            "flags": pa.array(flags),
            "text": pa.array(texts, pa.string()),
            "text_digest": pa.array(digests, pa.binary(16)),
            "simhash": pa.array(simhashes),
            "n_links": pa.array(n_links),
        }
    )
    return out
