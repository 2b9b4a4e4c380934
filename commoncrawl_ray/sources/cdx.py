"""CDXJ capture index source/sink (the URL index beside the archives).

Common Crawl (and every wayback-style archive) publishes, next to its
WARC/ARC shards, a *capture index*: one line per archived URL, keyed
by SURT + TIMESTAMP14, globally sorted, range-sharded, with a tiny
secondary index (``cluster.idx``) mapping key ranges to shard files so
a reader can binary-search 100 TB of captures while opening only the
shards its key range touches. The reference library predates CDX and
has no counterpart; this module is built from the public CDXJ line
format (``<surt-key> <ts14> <json>``) and the zipnum sharding idea.

Ray-Data shape:
- **build**: pages -> ``cdx_rows_batch`` (vectorized capture rows,
  sharing the parse kernel with the archives) -> ONE global
  ``sort("cdx_key")`` (the only exchange) -> one ``.cdxj.gz`` shard
  per sorted block, written content-addressed (md5 name, tmp+rename —
  idempotent under retries) -> ``cluster.idx`` from the per-shard
  (first_key, last_key) manifest, which is shard-count-sized, never
  corpus-sized.
- **read**: ``read_binary_files`` over shard files, one parse task per
  shard, zero exchanges.
- **lookup**: ``cluster.idx`` prunes to the shards whose key range
  intersects the query prefix — at 100 TB a per-site scan opens a
  handful of files, not the index. The pruning is asserted by tests.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

CLUSTER_IDX = "cluster.idx"


# ---------------------------------------------------------------- rows


def cdx_rows_batch(batch: pa.Table, parsed: pa.Table | None = None) -> pa.Table:
    """pages(url, warc_ts, html) -> capture rows (cdx_key, surt, ts14,
    url=canonical, http_status, mime_norm, digest_hex, length). Shares
    the parse kernel (stages/parse_extract.py) and the SURT transform
    with the sequential oracle; rows whose URL cannot be canonicalized
    to a SURT key are dropped (the archive still holds them — they are
    simply not addressable by key, as in wayback CDX practice).

    ``parsed`` lets a caller that already ran ``parse_extract_batch``
    on the identical batch (the WACZ sink builds index + page list +
    archive from ONE parse) skip the second parse."""
    from ..functions.http import format_timestamp14
    from ..functions.surt import surt
    from ..stages.parse_extract import parse_extract_batch

    if parsed is None:
        parsed = parse_extract_batch(batch)
    htmls = batch.column("html").to_pylist()
    tss = batch.column("warc_ts").cast(pa.int64()).to_pylist()
    canon = parsed.column("canon_url").to_pylist()
    status = parsed.column("http_status").to_pylist()
    mime = parsed.column("mime_norm").to_pylist()

    keys, surts, ts14s, urls, sts, mimes, digs, lens = (
        [], [], [], [], [], [], [], [],
    )
    for i, cu in enumerate(canon):
        s = surt(cu) if cu else None
        if s is None:
            continue
        t14 = format_timestamp14(tss[i])
        keys.append(s + " " + t14)
        surts.append(s)
        ts14s.append(t14)
        urls.append(cu)
        sts.append(status[i])
        mimes.append(mime[i])
        digs.append(hashlib.md5(htmls[i] or b"").hexdigest())
        lens.append(len(htmls[i] or b""))
    return pa.table(
        {
            "cdx_key": pa.array(keys, pa.string()),
            "surt": pa.array(surts, pa.string()),
            "ts14": pa.array(ts14s, pa.string()),
            "url": pa.array(urls, pa.string()),
            "http_status": pa.array(sts, pa.int32()),
            "mime_norm": pa.array(mimes, pa.string()),
            "digest_hex": pa.array(digs, pa.string()),
            "length": pa.array(lens, pa.int64()),
        }
    )


def revisit_cdx_rows_batch(batch: pa.Table) -> pa.Table:
    """revisit captures (url, warc_ts, html=stored HTTP headers,
    payload_digest) -> capture rows with mime ``warc/revisit`` —
    wayback CDX practice for deduplicated archives: the capture stays
    addressable, its digest names the payload stored under the keeper
    record, and length 0 marks the payload as elided. Shares the parse
    kernel (status/canon from the header section) and SURT transform
    with the response path."""
    from ..functions.http import format_timestamp14
    from ..functions.surt import surt
    from ..stages.parse_extract import parse_extract_batch

    parsed = parse_extract_batch(batch.select(["url", "warc_ts", "html"]))
    pdigs = batch.column("payload_digest").to_pylist()
    tss = batch.column("warc_ts").cast(pa.int64()).to_pylist()
    canon = parsed.column("canon_url").to_pylist()
    status = parsed.column("http_status").to_pylist()

    keys, surts, ts14s, urls, sts, mimes, digs, lens = (
        [], [], [], [], [], [], [], [],
    )
    for i, cu in enumerate(canon):
        s = surt(cu) if cu else None
        if s is None:
            continue
        t14 = format_timestamp14(tss[i])
        keys.append(s + " " + t14)
        surts.append(s)
        ts14s.append(t14)
        urls.append(cu)
        sts.append(status[i])
        mimes.append("warc/revisit")
        digs.append(pdigs[i])
        lens.append(0)
    return pa.table(
        {
            "cdx_key": pa.array(keys, pa.string()),
            "surt": pa.array(surts, pa.string()),
            "ts14": pa.array(ts14s, pa.string()),
            "url": pa.array(urls, pa.string()),
            "http_status": pa.array(sts, pa.int32()),
            "mime_norm": pa.array(mimes, pa.string()),
            "digest_hex": pa.array(digs, pa.string()),
            "length": pa.array(lens, pa.int64()),
        }
    )


# ---------------------------------------------------------------- lines


def format_cdxj_line(row: dict) -> str:
    """Capture row -> one CDXJ line. JSON field order is fixed
    (sort_keys) so the writer is byte-deterministic."""
    fields = {
        "digest": row["digest_hex"],
        "length": str(row["length"]),
        "mime": row["mime_norm"],
        "status": str(row["http_status"]),
        "url": row["url"],
    }
    return (
        f"{row['surt']} {row['ts14']} "
        f"{json.dumps(fields, sort_keys=True, separators=(',', ':'))}"
    )


def parse_cdxj(data: bytes) -> list[dict]:
    """CDXJ shard bytes (gzip or plain — dual dispatch: Ray's
    read_binary_files transparently gunzips ``.gz`` paths) -> capture
    rows. Tolerant of blank lines; the key is re-derived from the two
    leading space-separated tokens (JSON may itself contain spaces)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    rows: list[dict] = []
    for line in data.decode("utf-8").splitlines():
        if not line.strip():
            continue
        surt_key, ts14, js = line.split(" ", 2)
        f = json.loads(js)
        rows.append(
            {
                "cdx_key": surt_key + " " + ts14,
                "surt": surt_key,
                "ts14": ts14,
                "url": f["url"],
                "http_status": int(f["status"]),
                "mime_norm": f["mime"],
                "digest_hex": f["digest"],
                "length": int(f["length"]),
            }
        )
    return rows


_SCHEMA = pa.schema(
    [
        ("cdx_key", pa.string()),
        ("surt", pa.string()),
        ("ts14", pa.string()),
        ("url", pa.string()),
        ("http_status", pa.int32()),
        ("mime_norm", pa.string()),
        ("digest_hex", pa.string()),
        ("length", pa.int64()),
        ("shard", pa.string()),
    ]
)


def _rows_to_table(rows: list[dict], shard: str) -> pa.Table:
    cols = {name: [r[name] for r in rows] for name in _SCHEMA.names[:-1]}
    cols["shard"] = [shard] * len(rows)
    return pa.table(
        {n: pa.array(cols[n], _SCHEMA.field(n).type) for n in _SCHEMA.names}
    )


# ---------------------------------------------------------------- sink


def write_cdx_from_rows(rows_ds, out_dir: str):
    """capture-row Dataset (cdx_rows_batch schema, ``shard`` column
    ignored if present) -> sorted, sharded CDXJ index under
    ``out_dir`` (+ ``cluster.idx``). Returns the shard-manifest table
    (file, first_key, last_key, records) — shard-count-sized. ONE
    exchange (the global key sort); shard writes are content-addressed
    and idempotent (a retried block rewrites the identical file)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "file": pa.array([], pa.string()),
                    "first_key": pa.array([], pa.string()),
                    "last_key": pa.array([], pa.string()),
                    "records": pa.array([], pa.int64()),
                }
            )
        lines = [format_cdxj_line(r) for r in batch.to_pylist()]
        payload = ("\n".join(lines) + "\n").encode("utf-8")
        # mtime=0: byte-deterministic gzip across runs/retries
        blob = gzip.compress(payload, mtime=0)
        name = f"cdx-{hashlib.md5(blob).hexdigest()}.cdxj.gz"
        tmp = os.path.join(out_dir, f".{name}.tmp{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, os.path.join(out_dir, name))
        keys = batch.column("cdx_key")
        return pa.table(
            {
                "file": pa.array([name], pa.string()),
                "first_key": pa.array([keys[0].as_py()], pa.string()),
                "last_key": pa.array([keys[-1].as_py()], pa.string()),
                "records": pa.array([batch.num_rows], pa.int64()),
            }
        )

    def strip_shard(t: pa.Table) -> pa.Table:
        return t.drop_columns(["shard"]) if "shard" in t.schema.names else t

    rows = rows_ds.map_batches(strip_shard, batch_format="pyarrow")
    # materialize() so the side-effecting write stage executes EXACTLY
    # once (schema probes / to_arrow_refs on a lazy plan re-run the
    # lineage with a limit, double-writing shards)
    written = (
        rows.sort("cdx_key")
        .map_batches(write_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    import ray

    man = pa.concat_tables([ray.get(r) for r in written.to_arrow_refs()])
    man = man.sort_by("first_key")
    idx_lines = [
        f"{fk}\t{fn}\t{lk}\t{n}"
        for fk, fn, lk, n in zip(
            man.column("first_key").to_pylist(),
            man.column("file").to_pylist(),
            man.column("last_key").to_pylist(),
            man.column("records").to_pylist(),
        )
    ]
    tmp = os.path.join(out_dir, f".{CLUSTER_IDX}.tmp{os.getpid()}")
    with open(tmp, "w") as f:
        f.write("\n".join(idx_lines) + ("\n" if idx_lines else ""))
    os.replace(tmp, os.path.join(out_dir, CLUSTER_IDX))
    # the atomically-replaced cluster.idx is the index's manifest:
    # readers resolve shards through it, so orphans from an earlier
    # build (different sort boundaries -> different content hashes)
    # are unreachable — drop them
    live = set(man.column("file").to_pylist())
    for f in os.listdir(out_dir):
        if f.endswith(".cdxj.gz") and f not in live:
            os.remove(os.path.join(out_dir, f))
    return man


def build_cdx_index(pages_ds, out_dir: str):
    """pages Dataset (url, warc_ts, html) -> CDXJ index: the capture
    rows are derived with the shared parse kernel, then written via
    write_cdx_from_rows."""
    return write_cdx_from_rows(
        pages_ds.map_batches(
            cdx_rows_batch, batch_format="pyarrow", batch_size=None
        ),
        out_dir,
    )


def merge_cdx_indexes(index_dirs: list[str], out_dir: str):
    """Merge N sorted CDXJ indexes into one (the incremental-recrawl
    path: each crawl epoch/snapshot publishes its own index; readers
    want a single sorted view). Union of manifest-resolved shard reads
    -> ONE re-sort -> sharded write. No corpus-scale driver state —
    the merge is the same one-exchange shape as the build."""
    import ray.data as rd

    parts = [read_cdxj(d) for d in index_dirs]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return write_cdx_from_rows(ds, out_dir)


def index_warc_archive(archive, out_dir: str, include_revisits: bool = True):
    """WARC archive (a directory or an explicit ``.warc.gz`` path list,
    e.g. ``CrawlResult.archive_paths()``) -> CDXJ index over its
    captures: read every file back through the Ray WARC source and
    index the (url, warc_ts, html) rows — what the real Common Crawl
    does after each crawl (cdx-index beside the warc/ prefix).
    ``include_revisits``: also index revisit records (mime
    ``warc/revisit``, length 0, the referenced payload digest), so an
    archive rewritten by ``deduplicate_warc`` stays fully addressable
    capture-by-capture."""
    from .warc import read_warc_pages, read_warc_revisit_pages

    if isinstance(archive, str):
        paths = [
            os.path.join(archive, f)
            for f in sorted(os.listdir(archive))
            if f.endswith(".warc.gz")
        ]
    else:
        paths = list(archive)
    if not paths:
        raise FileNotFoundError(f"no .warc.gz in {archive}")
    pages = read_warc_pages(paths)

    def slim(t: pa.Table) -> pa.Table:
        return t.select(["url", "warc_ts", "html"])

    rows = pages.map_batches(slim, batch_format="pyarrow").map_batches(
        cdx_rows_batch, batch_format="pyarrow", batch_size=None
    )
    if include_revisits:
        rows = rows.union(
            read_warc_revisit_pages(paths).map_batches(
                revisit_cdx_rows_batch, batch_format="pyarrow", batch_size=None
            )
        )
    return write_cdx_from_rows(rows, out_dir)


# -------------------------------------------------------------- source


def _parse_batch(t: pa.Table) -> pa.Table:
    tables = []
    for path, data in zip(
        t.column("path").to_pylist(), t.column("bytes").to_pylist()
    ):
        tables.append(_rows_to_table(parse_cdxj(data), os.path.basename(path)))
    if not tables:
        return _SCHEMA.empty_table()
    return pa.concat_tables(tables)


def read_cdxj(dir_or_paths):
    """CDXJ shard dir (or explicit path list) -> Dataset of capture
    rows; one read+parse task per shard, zero exchanges."""
    import ray.data as rd

    paths = dir_or_paths
    if isinstance(paths, str):
        idx = os.path.join(paths, CLUSTER_IDX)
        if os.path.isfile(idx):
            # resolve shards through the manifest, never a dir glob —
            # orphans from interrupted builds are unreachable
            with open(idx) as f:
                names = [
                    line.rstrip("\n").split("\t")[1]
                    for line in f
                    if line.strip()
                ]
            paths = [os.path.join(paths, n) for n in names]
        else:
            paths = [
                os.path.join(paths, f)
                for f in sorted(os.listdir(paths))
                if f.endswith(".cdxj.gz")
            ]
    return rd.read_binary_files(paths, include_paths=True).map_batches(
        _parse_batch, batch_format="pyarrow"
    )


# -------------------------------------------------------------- lookup


def _prefix_upper(prefix: str) -> str:
    """Smallest string greater than every string with this prefix."""
    for i in range(len(prefix) - 1, -1, -1):
        c = ord(prefix[i])
        if c < 0x10FFFF:
            return prefix[:i] + chr(c + 1)
    return prefix + "\U0010ffff"


def cdx_files_for_prefix(index_dir: str, prefix: str) -> list[str]:
    """cluster.idx range intersection: the shard files that can hold
    keys starting with ``prefix`` — the pruning step that makes a
    per-site lookup open O(site) files, not O(corpus)."""
    upper = _prefix_upper(prefix)
    out = []
    with open(os.path.join(index_dir, CLUSTER_IDX)) as f:
        for line in f:
            if not line.strip():
                continue
            first_key, fname, last_key, _n = line.rstrip("\n").split("\t")
            if last_key >= prefix and first_key < upper:
                out.append(fname)
    return out


def cdx_lookup(index_dir: str, surt_prefix: str):
    """SURT prefix -> Dataset of matching capture rows, reading ONLY
    the shards cluster.idx admits (sorted-index range scan)."""
    import ray.data as rd

    files = cdx_files_for_prefix(index_dir, surt_prefix)
    if not files:
        return rd.from_arrow(_SCHEMA.empty_table())
    paths = [os.path.join(index_dir, f) for f in files]

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.starts_with(t.column("cdx_key"), surt_prefix))

    return read_cdxj(paths).map_batches(filt, batch_format="pyarrow")


def cdx_closest(index_dir: str, url: str, ts14: str) -> dict | None:
    """Wayback-machine-style time-travel lookup: the capture of
    ``url`` whose TIMESTAMP14 is closest to ``ts14`` (|delta| in
    seconds; earlier capture wins a tie — wayback replay convention).
    Returns one capture row dict or None.

    Point lookups should not spin up a Dataset: the cluster.idx range
    scan admits the O(1) shards covering this exact SURT key, which
    are read directly (the same pruning the distributed
    ``cdx_lookup`` path uses — a url's captures are contiguous in the
    global key order)."""
    from datetime import datetime, timezone

    from ..functions.surt import surt

    s = surt(url)
    if s is None:
        return None
    prefix = s + " "
    files = cdx_files_for_prefix(index_dir, prefix)
    if not files:
        return None

    def t14_secs(t14: str) -> int:
        # TIMESTAMP14 is UTC (functions/http.format_timestamp14 uses
        # gmtime) — parse it as such so deltas never cross a DST seam
        return int(
            datetime.strptime(t14, "%Y%m%d%H%M%S")
            .replace(tzinfo=timezone.utc)
            .timestamp()
        )

    want = t14_secs(ts14)
    best = None
    best_d = None
    for fname in files:
        with open(os.path.join(index_dir, fname), "rb") as f:
            for row in parse_cdxj(f.read()):
                if row["surt"] != s:
                    continue
                d = abs(t14_secs(row["ts14"]) - want)
                if (
                    best_d is None
                    or d < best_d
                    or (d == best_d and row["ts14"] < best["ts14"])
                ):
                    best, best_d = row, d
    return best
