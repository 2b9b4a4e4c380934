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
    """Single-pass text + link/anchor-text + title + base + meta-tag
    extraction (NodeWalker analogue feeding the HTMLMetaTags /
    anchorTags fields of ArcFileMetadata,
    ``protocol/shared/protocol.jr:30-53,120``). Text of
    <script>/<style> is skipped."""

    _SKIP = {"script", "style"}

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.links: list[str] = []
        self.anchor_texts: list[str] = []  # parallel to links
        self.base: str | None = None
        self.title: str | None = None
        self.meta_tags: list[tuple[str, str]] = []  # (name, value)
        self.refresh_url: str | None = None
        self.refresh_time: int | None = None
        self.pragma_no_cache = False
        self._skip_depth = 0
        self._in_title = False
        self._anchor_idx: int | None = None  # open <a> collecting text
        self._anchor_chunks: list[str] = []

    def _handle_meta(self, attrs):
        d = {k: v for k, v in attrs if v is not None}
        equiv = d.get("http-equiv")
        if equiv is not None:
            el = equiv.lower()
            content = d.get("content", "")
            if el == "refresh":
                # "N; url=..." (HTMLMetaTags optionalRefreshURL/Time)
                head, _, tail = content.partition(";")
                try:
                    t = int(float(head.strip() or "0"))
                    self.refresh_time = _clamp_i32(t)
                except (ValueError, OverflowError):
                    self.refresh_time = None
                m = re.search(r"url\s*=\s*(\S+)", tail, re.IGNORECASE)
                if m:
                    self.refresh_url = m.group(1)
            elif el == "pragma" and "no-cache" in content.lower():
                self.pragma_no_cache = True
            else:
                self.meta_tags.append((equiv, content))
        elif "name" in d:
            self.meta_tags.append((d["name"], d.get("content", "")))

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
                    self.anchor_texts.append("")
                    self._anchor_idx = len(self.links) - 1
                    self._anchor_chunks = []
                    break
        elif tag == "base" and self.base is None:
            for k, v in attrs:
                if k == "href" and v:
                    self.base = v
        elif tag == "title":
            self._in_title = True
        elif tag == "meta":
            self._handle_meta(attrs)

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False
        elif tag == "a" and self._anchor_idx is not None:
            self.anchor_texts[self._anchor_idx] = _WS.sub(
                " ", "".join(self._anchor_chunks)
            ).strip()
            self._anchor_idx = None
            self._anchor_chunks = []

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            if self._in_title and self.title is None:
                self.title = data.strip()
            if self._anchor_idx is not None:
                self._anchor_chunks.append(data)
            self.chunks.append(data)


_WS = re.compile(r"\s+")


def walk_html(html: str) -> _HtmlWalker:
    """Run the single-pass walker (exception-tolerant) over a page."""
    w = _HtmlWalker()
    try:
        w.feed(html)
        w.close()
    except Exception:
        pass
    return w


def html_to_text_and_links(html: str) -> tuple[str, list[str], str | None, str | None]:
    """-> (normalized_text, raw_hrefs, base_href, title)."""
    w = walk_html(html)
    text = _WS.sub(" ", " ".join(w.chunks)).strip()
    return text, w.links, w.base, w.title


# A hostile/buggy server can declare Age/max-age/refresh values beyond
# the output column ranges; unclamped they'd raise OverflowError in the
# numpy column assignment and kill the whole parse task on every retry
# (totality: any byte stream must parse)
_I32_MAX = (1 << 31) - 1
_I64_MAX = (1 << 63) - 1


def _clamp_i32(v: int) -> int:
    return v if -(_I32_MAX + 1) <= v <= _I32_MAX else -1


def _clamp_i64(v: int) -> int:
    return v if -(_I64_MAX + 1) <= v <= _I64_MAX else -1


# ArcFileMetadata CacheControlFlags (protocol/shared/protocol.jr:122-128)
CACHE_NO_CACHE = 1
CACHE_NO_STORE = 2
CACHE_VARY = 4
CACHE_MUST_REVALIDATE = 8
CACHE_PRIVATE = 16


def _cache_fields(headers) -> dict:
    """The cache-information block of ArcFileMetadata
    (``protocol.jr:104-128``): date headers in epoch millis (-1 when
    absent/unparseable), Cache-Control directives as the reference's
    flag byte + maxAge."""
    from ..functions.http import parse_http_date

    out = {
        "http_date": parse_http_date(headers.find_value("date")),
        "last_modified": parse_http_date(headers.find_value("last-modified")),
        "expires": parse_http_date(headers.find_value("expires")),
        "etag": headers.find_value("etag"),
        "age": -1,
        "max_age": -1,
        "cache_flags": 0,
    }
    age = headers.find_value("age")
    if age is not None:
        try:
            out["age"] = _clamp_i64(int(age.strip()))
        except ValueError:
            pass
    flags = 0
    cc = headers.find_value("cache-control")
    if cc is not None:
        for directive in cc.lower().split(","):
            directive = directive.strip()
            if directive == "no-cache":
                flags |= CACHE_NO_CACHE
            elif directive == "no-store":
                flags |= CACHE_NO_STORE
            elif directive == "must-revalidate":
                flags |= CACHE_MUST_REVALIDATE
            elif directive == "private":
                flags |= CACHE_PRIVATE
            elif directive.startswith("max-age"):
                _, _, v = directive.partition("=")
                try:
                    out["max_age"] = _clamp_i64(int(v.strip()))
                except ValueError:
                    pass
    pragma = headers.find_value("pragma")
    if pragma is not None and "no-cache" in pragma.lower():
        flags |= CACHE_NO_CACHE
    if headers.find_value("vary") is not None:
        flags |= CACHE_VARY
    out["cache_flags"] = flags
    return out


def extract_record(url: str, record: bytes) -> dict:
    """Full per-record extraction -> dict of DOCS fields + 'links' +
    the ArcFileMetadata parity block (meta tags, anchor text, cache
    info, declared+detected charset — protocol/shared/protocol.jr:
    56-128)."""
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
    from ..functions.charset import best_effort_decode_ex

    decoded, charset_used, charset_declared, charset_detected = best_effort_decode_ex(
        ctype, charset, body
    )

    text: str | None = None
    links: list[str] = []
    anchor_texts: list[str] = []
    base: str | None = None
    title: str | None = None
    meta_tags: str | None = None
    refresh_url: str | None = None
    refresh_time: int = -1
    cache = _cache_fields(headers)
    if decoded is not None:
        if disposition == MimeDisposition.ACCEPT_HTML:
            w = walk_html(decoded)
            text = _WS.sub(" ", " ".join(w.chunks)).strip()
            links, anchor_texts = w.links, w.anchor_texts
            base, title = w.base, w.title
            if w.meta_tags:
                # otherMetaTags name<LF>value<LF> format (protocol.jr:52)
                meta_tags = "".join(f"{k}\n{v}\n" for k, v in w.meta_tags)
            refresh_url = w.refresh_url
            refresh_time = w.refresh_time if w.refresh_time is not None else -1
            if w.pragma_no_cache:
                cache["cache_flags"] |= CACHE_NO_CACHE
        elif disposition == MimeDisposition.ACCEPT_TEXT:
            text = _WS.sub(" ", decoded).strip()
    # anchorTags: href + anchor text pairs separated by line feeds
    # (protocol.jr:120)
    anchors = (
        "".join(f"{h}\n{t}\n" for h, t in zip(links, anchor_texts)) if links else None
    )
    return {
        "http_status": status,
        "mime_norm": mime_norm,
        "disposition": int(disposition),
        "charset_used": charset_used,
        "charset_declared": charset_declared,
        "charset_detected": charset_detected,
        "flags": flags,
        "text": text,
        "links": links,
        "anchors": anchors,
        "base": base,
        "title": title,
        "meta_tags": meta_tags,
        "refresh_url": refresh_url,
        "refresh_time": refresh_time,
        **cache,
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
    charset_declared: list[str | None] = [None] * n
    charset_detected: list[str | None] = [None] * n
    flags = np.zeros(n, dtype=np.int32)
    texts: list[str | None] = [None] * n
    digests: list[bytes | None] = [None] * n
    simhashes = np.zeros(n, dtype=np.int64)
    n_links = np.zeros(n, dtype=np.int32)
    anchors: list[str | None] = [None] * n
    titles: list[str | None] = [None] * n
    bases: list[str | None] = [None] * n
    meta_tags: list[str | None] = [None] * n
    refresh_urls: list[str | None] = [None] * n
    refresh_time = np.full(n, -1, dtype=np.int32)
    http_date = np.full(n, -1, dtype=np.int64)
    last_modified = np.full(n, -1, dtype=np.int64)
    expires = np.full(n, -1, dtype=np.int64)
    etags: list[str | None] = [None] * n
    age = np.full(n, -1, dtype=np.int64)
    max_age = np.full(n, -1, dtype=np.int64)
    cache_flags = np.zeros(n, dtype=np.int8)
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
        charset_declared[i] = r["charset_declared"]
        charset_detected[i] = r["charset_detected"]
        flags[i] = r["flags"]
        texts[i] = r["text"]
        n_links[i] = len(r["links"])
        anchors[i] = r["anchors"]
        titles[i] = r["title"]
        bases[i] = r["base"]
        meta_tags[i] = r["meta_tags"]
        refresh_urls[i] = r["refresh_url"]
        refresh_time[i] = r["refresh_time"]
        http_date[i] = r["http_date"]
        last_modified[i] = r["last_modified"]
        expires[i] = r["expires"]
        etags[i] = r["etag"]
        age[i] = r["age"]
        max_age[i] = r["max_age"]
        cache_flags[i] = r["cache_flags"]
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
            "charset_declared": pa.array(charset_declared, pa.string()),
            "charset_detected": pa.array(charset_detected, pa.string()),
            "flags": pa.array(flags),
            "text": pa.array(texts, pa.string()),
            "text_digest": pa.array(digests, pa.binary(16)),
            "simhash": pa.array(simhashes),
            "n_links": pa.array(n_links),
            "anchors": pa.array(anchors, pa.string()),
            "title": pa.array(titles, pa.string()),
            "base_url": pa.array(bases, pa.string()),
            "meta_tags": pa.array(meta_tags, pa.string()),
            "refresh_url": pa.array(refresh_urls, pa.string()),
            "refresh_time": pa.array(refresh_time),
            "http_date": pa.array(http_date),
            "last_modified": pa.array(last_modified),
            "expires": pa.array(expires),
            "etag": pa.array(etags, pa.string()),
            "age": pa.array(age),
            "max_age": pa.array(max_age),
            "cache_flags": pa.array(cache_flags),
        }
    )
    return out
