"""Arrow schema constants — the engine's data model (SURVEY §1.3).

The reference declares record schemas in a custom ``.jr`` DDL compiled
to Java (``rpc/compiler/``, ``protocol/shared/protocol.jr``); here the
whole type system is explicit ``pyarrow.Schema`` constants.
"""

from __future__ import annotations

import pyarrow as pa

# Input pages table (BASELINE.json input_hint)
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("ms")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Parsed / extracted documents (ArcFileItem + ArcFileMetadata analogue,
# protocol/shared/protocol.jr:8-26,56-128)
DOCS = pa.schema(
    [
        ("url", pa.string()),
        ("canon_url", pa.string()),
        ("url_fp", pa.int64()),
        ("domain_fp", pa.int64()),
        ("root_domain_fp", pa.int64()),
        ("host", pa.string()),
        ("warc_ts", pa.timestamp("ms")),
        ("http_status", pa.int16()),
        ("mime_norm", pa.string()),
        ("disposition", pa.int8()),
        ("charset_used", pa.string()),
        ("charset_declared", pa.string()),  # protocol.jr:89 charset
        ("charset_detected", pa.string()),  # protocol.jr:115 detectedCharset
        ("flags", pa.int32()),
        ("text", pa.string()),
        ("text_digest", pa.binary(16)),
        ("simhash", pa.int64()),
        ("n_links", pa.int32()),
        # ArcFileMetadata parity block (protocol.jr:56-128)
        ("anchors", pa.string()),  # href<LF>text<LF>... (anchorTags)
        ("title", pa.string()),  # titleText
        ("base_url", pa.string()),  # baseURL
        ("meta_tags", pa.string()),  # name<LF>value<LF>... (otherMetaTags)
        ("refresh_url", pa.string()),  # HTMLMetaTags optionalRefreshURL
        ("refresh_time", pa.int32()),  # HTMLMetaTags optionalRefreshTime
        ("http_date", pa.int64()),  # epoch ms, -1 absent
        ("last_modified", pa.int64()),
        ("expires", pa.int64()),
        ("etag", pa.string()),
        ("age", pa.int64()),
        ("max_age", pa.int64()),
        ("cache_flags", pa.int8()),  # CacheControlFlags byte
    ]
)

# Crawl frontier (SURVEY §1.3)
FRONTIER = pa.schema(
    [
        ("canon_url", pa.string()),
        ("host", pa.string()),
        ("host_fp", pa.int64()),
        ("domain_fp", pa.int64()),
        ("url_fp", pa.int64()),
        ("root_domain_fp", pa.int64()),
        ("depth", pa.int32()),
        ("priority", pa.float64()),
        ("discovered_epoch", pa.int32()),
    ]
)

# Per-epoch crawl log (golden_crawl shape, FIXTURES.md §5)
FETCH_LOG = pa.schema(
    [
        ("epoch", pa.int32()),
        ("seq", pa.int64()),
        ("url_fp", pa.int64()),
        ("host_fp", pa.int64()),
        ("canon_url", pa.string()),
        ("action", pa.string()),  # fetched/robots_blocked/budget_deferred/dup_skipped
        ("http_status", pa.int16()),
        ("priority", pa.float64()),
        ("depth", pa.int32()),
    ]
)

URL_SEEN = pa.schema([("partition", pa.int32()), ("url_fp", pa.int64())])


def df_to_arrow(df) -> pa.Table:
    """pandas batch -> metadata-free Arrow table.

    Every ``batch_format="pandas"`` map stage must return through this:
    Ray's own pandas->Arrow conversion (``pa.Table.from_pandas``) embeds
    the pandas metadata dict in the schema, which makes ``pa.Schema``
    unhashable and spams Ray's "Failed to hash the schemas (for
    deduplication)" warning from every downstream concat while defeating
    its schema-dedup fast path (VERDICT r2 #4).
    """
    if isinstance(df, pa.Table):  # mixed-return fns (some paths Arrow)
        return df.replace_schema_metadata(None)
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def arrow_out(fn):
    """Decorator: route a pandas-in/pandas-out batch fn through
    :func:`df_to_arrow` so its blocks enter Ray metadata-free."""
    import functools

    @functools.wraps(fn)
    def wrapped(df):
        return df_to_arrow(fn(df))

    return wrapped
