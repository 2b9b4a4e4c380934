"""Query registry: Ray Data pipelines + matching DuckDB oracle SQL.

One entry per operator family from SURVEY §2 (and the added
training-data ops), exercised over the driver's star-schema tables
(TESTDATA.md) so the driver's correctness gate can hash-compare the
Ray result against ANSI SQL. Column names match the SQL aliases
exactly (the driver sorts columns by name before hashing).

Float discipline: aggregates that would be association-sensitive
(double sums) are either carried as exact integers (counts, BIGINT
sums of integer-valued columns, pre-rounded cent values) or avoided
(min/max are exact). Monetary sums replicate DuckDB ROUND's
half-away-from-zero before summing.

Crawl/parse/sketch pipelines that SQL can't express are registered
without oracle SQL — the driver records a weaker rows-only check and
their strong checks live in tests/ (oracle-crawler parity, golden
text digests).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _pq(sf_dir: str, table: str, columns=None, min_blocks: int = 1):
    """Pruned parquet read with DATA-SIZED block count. Ray's default
    split (~2 blocks/CPU regardless of size) turns a 2,000-row table
    into 64 tiny blocks and every downstream stage into pure task
    overhead (measured: 5x wall on knn_cosine at 32 cpus). Size by
    max(bytes/16MB, rows/32k) — the rows term matters because parquet
    compresses these tables ~10x, and a 600k-row aggregate on one
    block would serialize (measured: 10s vs 2s on lineitem). Clamped
    to [1, 256]: small tables collapse to one block, 100 TB inputs
    still fan out wide.

    ``min_blocks``: floor for stages whose PER-ROW compute dominates
    (text sketching, per-doc hashing) — a byte-small docs table must
    still fan out or the map stage serializes; bounded so blocks never
    drop below ~16 rows."""
    import os

    import pyarrow.parquet as _pqm

    path = f"{sf_dir}/{table}.parquet"
    try:
        size = os.path.getsize(path)
        rows = _pqm.read_metadata(path).num_rows
    except OSError:
        size, rows = 0, 0
    floor = min(min_blocks, max(1, rows // 16))
    blocks = min(256, max(1, floor, -(-size // (16 << 20)), -(-rows // 32768)))
    # metadata-free schema at the SOURCE: the driver's testdata files
    # carry a pandas metadata dict in the footer, and when SplitBlocks
    # keeps the read op from fusing with the strip stage the read's own
    # blocks would still trip Ray's unhashable-schema warning
    try:
        schema = _pqm.read_schema(path).remove_metadata()
        if columns is not None:
            # read_parquet requires the schema to match the pruned set
            schema = pa.schema([schema.field(c) for c in columns])
    except OSError:
        schema = None
    return strip_schema_metadata(
        rd.read_parquet(
            path, columns=columns, override_num_blocks=blocks, schema=schema
        )
    )


def _strip_meta_batch(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None)


def strip_schema_metadata(ds):
    """Drop parquet/pandas schema metadata from every block (zero-copy,
    fuses with the read task). Blocks carrying metadata make
    ``pa.Schema`` unhashable, which spams Ray's "Failed to hash the
    schemas (for deduplication)" warning from every concat in every
    map worker (VERDICT r2 #4) and defeats its schema-dedup fast path."""
    return ds.map_batches(
        _strip_meta_batch, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


# --------------------------------------------------------------------
# A2 histogram / groupby-count
# --------------------------------------------------------------------


def q_events_histogram(sf_dir: str):
    """Histogram over events.event_type (SURVEY A2: util/shared/Histogram.java:12)."""
    return (
        _pq(sf_dir, "events", ["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
    )


SQL_EVENTS_HISTOGRAM = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------
# O3 sort / top-k
# --------------------------------------------------------------------


def q_top_docs(sf_dir: str):
    """Top-20 documents by n_chars (sorted result + pagination analogue,
    query/QueryResultFileIndex.java:173-318)."""
    return (
        _pq(sf_dir, "documents", ["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(20)
    )


SQL_TOP_DOCS = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id ASC LIMIT 20
"""


# --------------------------------------------------------------------
# grouped aggregate with exact stats
# --------------------------------------------------------------------


def q_doc_lang_stats(sf_dir: str):
    return (
        _pq(sf_dir, "documents", ["lang", "n_chars"])
        .groupby("lang")
        .aggregate(
            Count(alias_name="n"),
            Min("n_chars", alias_name="min_chars"),
            Max("n_chars", alias_name="max_chars"),
            Sum("n_chars", alias_name="sum_chars"),
        )
    )


SQL_DOC_LANG_STATS = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------
# D1 exact dedup (content hash -> group first)
# --------------------------------------------------------------------


def q_exact_dedup(sf_dir: str):
    """Exact text dedup: md5 partition + min-doc_id keeper (SURVEY D1;
    hash-partition + per-group-first is the 10^10-scale shape)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        from ..functions.digests import md5_hex_column

        hashes = md5_hex_column(batch.column("text"))
        return batch.append_column("text_hash", pa.array(hashes, pa.string()))

    return (
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=32)
        .map_batches(add_hash, batch_format="pyarrow")
        .drop_columns(["text"])
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="keeper"), Count(alias_name="n"))
    )


SQL_EXACT_DEDUP = """
SELECT md5(text) AS text_hash, CAST(MIN(doc_id) AS BIGINT) AS keeper,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY md5(text)
"""


# --------------------------------------------------------------------
# text analysis: token counts (vectorized batch kernel)
# --------------------------------------------------------------------


def q_token_counts(sf_dir: str):
    """Token counting in pure Arrow kernels (VERDICT r1 #4): words =
    RE2 count of non-space runs, chars-no-space = utf8 length minus
    whitespace count. Zero Python per row."""
    import pyarrow.compute as pc

    def count_tokens(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_words = pc.count_substring_regex(text, pattern=r"\S+")
        nospace = pc.subtract(
            pc.utf8_length(text), pc.count_substring_regex(text, pattern=r"\s")
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pc.cast(n_words, pa.int64()),
                "n_chars_nospace": pc.cast(nospace, pa.int64()),
            }
        )

    return (
        _pq(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(count_tokens, batch_format="pyarrow")
    )


SQL_TOKEN_COUNTS = r"""
SELECT doc_id,
       CAST(CASE WHEN trim(text) = '' THEN 0
            ELSE length(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_words,
       CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_chars_nospace
FROM documents
"""


# --------------------------------------------------------------------
# streaming-shaped: tumbling window aggregate over events
# --------------------------------------------------------------------


def q_events_tumbling(sf_dir: str):
    """1-hour tumbling windows per event_type (SURVEY §2.9: windows =
    partition + floor(ts/size) groupby; oracle-SQL-expressible)."""

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()  # micros
        win = ts // (3600 * 1_000_000)
        return batch.append_column("window_id", pa.array(win.astype(np.int64)))

    return (
        _pq(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(add_window, batch_format="pyarrow")
        .drop_columns(["ts"])
        .groupby(["event_type", "window_id"])
        .aggregate(
            Count(alias_name="n"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
        )
    )


SQL_EVENTS_TUMBLING = """
SELECT event_type,
       CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS window_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------
# sessionization (gap > 30 min) per user — map_groups over sorted groups
# --------------------------------------------------------------------


def q_events_sessions(sf_dir: str):
    """Vectorized across users per sort partition: sort(user_id) alone
    (ties co-locate whole users; adding ts to the sort key could split
    a user across range partitions), then one numpy pass computes every
    user's session count in the block — no per-group Python."""

    def sessions_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                    "n_sessions": pd.Series([], dtype=np.int64),
                }
            )
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy()  # micros
        n = len(df)
        starts = np.r_[0, np.flatnonzero(uid[1:] != uid[:-1]) + 1]
        counts = np.diff(np.r_[starts, n])
        same_user = uid[1:] == uid[:-1]
        new_sess = ((ts[1:] - ts[:-1]) > 30 * 60 * 1_000_000) & same_user
        cs = np.r_[0, np.cumsum(new_sess)]
        n_sessions = 1 + (cs[starts + counts - 1] - cs[starts])
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_events": counts,
                "n_sessions": n_sessions.astype(np.int64),
            }
        )

    return (
        _pq(sf_dir, "events", ["user_id", "ts"])
        .sort("user_id")
        .map_batches(sessions_block, batch_format="pandas", batch_size=None)
    )


def q_events_sliding(sf_dir: str):
    """Hopping/sliding window aggregate (SURVEY §2.9 extension): 1-hour
    windows every 15 minutes. Each event explodes into the 4 windows
    covering it (vectorized repeat+arange), then one hash-aggregate
    shuffle — the standard distributed sliding-window shape (no
    windowed state, no ordering requirement)."""
    width = 3600 * 1_000_000
    hop = 900 * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        if len(ts) == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "window_id": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                }
            )
        w_hi = ts // hop
        w_lo = (ts - width) // hop + 1
        counts = (w_hi - w_lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(ts)), counts)
        # window ids: for each row, w_lo[i]..w_hi[i]
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        win = np.repeat(w_lo, counts) + (np.arange(counts.sum()) - np.repeat(offsets, counts))
        idx_arr = pa.array(idx)
        return pa.table(
            {
                "event_type": batch.column("event_type").take(idx_arr),
                "window_id": pa.array(win.astype(np.int64)),
                "value": batch.column("value").take(idx_arr),
            }
        )

    return (
        _pq(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "window_id"])
        .aggregate(
            Count(alias_name="n"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
        )
    )


SQL_EVENTS_SLIDING = """
SELECT event_type,
       CAST(h AS BIGINT) AS window_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events, LATERAL (
  SELECT unnest(generate_series(
    (epoch_us(ts) - 3600000000) // 900000000 + 1,
    epoch_us(ts) // 900000000)) AS h
) w
GROUP BY 1, 2
"""


def q_events_asof(sf_dir: str):
    """As-of join (custom operator, stages/joins.py): every purchase
    event picks up the user's most recent STRICTLY preceding click
    (ts and value; null when none). One union+sort(user_id) exchange;
    vectorized searchsorted merge per block."""
    from ..stages.joins import asof_join

    events = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    purchases = events.filter(expr="event_type == 'purchase'").drop_columns(
        ["event_type"]
    )
    clicks = events.filter(expr="event_type == 'click'").drop_columns(["event_type"])
    joined = asof_join(
        purchases, clicks, by="user_id", on="ts", right_cols=["ts", "value"]
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "ts_us": batch.column("ts").cast(pa.int64()),
                "value": batch.column("value"),
                "last_click_ts_us": batch.column("ts_asof").cast(pa.int64()),
                "last_click_value": batch.column("value_asof"),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


SQL_EVENTS_ASOF = """
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS ts_us, p.value,
       epoch_us(c.ts) AS last_click_ts_us,
       c.value AS last_click_value
FROM events p LEFT JOIN LATERAL (
  SELECT ts, value FROM events c
  WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
  ORDER BY c.ts DESC LIMIT 1
) c ON true
WHERE p.event_type = 'purchase'
"""


def q_events_interval_join(sf_dir: str):
    """Interval (range-band) join (custom operator, stages/joins.py):
    every purchase event picks up ALL of the user's clicks in the 24
    hours strictly before it (row expansion, inner semantics) — the
    range-join sibling of the as-of join. Same ONE union+sort(user_id)
    exchange; per-block the band match is two vectorized searchsorteds
    plus a repeat/cumsum pair expansion."""
    from ..stages.joins import interval_join

    events = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    def to_us(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("ts")
        return t.set_column(i, "ts_us", t.column("ts").cast(pa.int64()))

    purchases = (
        events.filter(expr="event_type == 'purchase'")
        .drop_columns(["event_type"])
        .map_batches(to_us, batch_format="pyarrow")
    )
    clicks = (
        events.filter(expr="event_type == 'click'")
        .drop_columns(["event_type", "event_id"])
        .map_batches(to_us, batch_format="pyarrow")
    )
    joined = interval_join(
        purchases,
        clicks,
        by="user_id",
        on="ts_us",
        lo=-86_400_000_000,
        hi=-1,
        right_cols=["ts_us", "value"],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "ts_us": batch.column("ts_us"),
                "value": batch.column("value"),
                "click_ts_us": batch.column("ts_us_r"),
                "click_value": batch.column("value_r"),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


SQL_EVENTS_INTERVAL_JOIN = """
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS ts_us, p.value,
       epoch_us(c.ts) AS click_ts_us,
       c.value AS click_value
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND epoch_us(c.ts) >= epoch_us(p.ts) - 86400000000
 AND epoch_us(c.ts) <= epoch_us(p.ts) - 1
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""


SQL_EVENTS_SESSIONS = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(1 + SUM(new_session) AS BIGINT) AS n_sessions
FROM gaps GROUP BY user_id
"""


# --------------------------------------------------------------------
# broadcast hash join (small side via ray.put)
# --------------------------------------------------------------------


def q_orders_by_segment(sf_dir: str):
    """orders ⋈ customer, customer broadcast once with ray.put and read
    per-task (SURVEY §2.4: broadcast small side instead of a shuffle
    join). Monetary sum in exact cents, DuckDB ROUND semantics."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    order = np.argsort(cust["c_custkey"].to_numpy(), kind="mergesort")
    seg_by_key = ray.put(
        (
            cust["c_custkey"].to_numpy()[order],
            cust["c_mktsegment"].to_numpy()[order],
        )
    )

    def join_batch(batch: pa.Table) -> pa.Table:
        # vectorized probe of the broadcast side: searchsorted against
        # the sorted key array (VERDICT r1 #3 — no per-row dict loop)
        keys, segs = ray.get(seg_by_key)
        k = batch.column("o_custkey").to_numpy()
        pos = np.minimum(np.searchsorted(keys, k), len(keys) - 1)
        hit = keys[pos] == k
        segments = np.where(hit, segs[pos], "UNKNOWN")
        price = batch.column("o_totalprice").to_numpy()
        # DuckDB ROUND = half away from zero (prices are positive)
        cents = np.floor(price * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "c_mktsegment": pa.array(segments, pa.string()),
                "cents": pa.array(cents),
            }
        )

    return (
        _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(join_batch, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="revenue_cents"))
    )


SQL_ORDERS_BY_SEGMENT = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


# --------------------------------------------------------------------
# multi-way broadcast join: supplier -> nation -> region
# --------------------------------------------------------------------


def q_suppliers_by_region(sf_dir: str):
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _pq(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    flat = {k: r2name[v] for k, v in n2r.items() if v in r2name}
    order = np.argsort(np.fromiter(flat.keys(), dtype=np.int64, count=len(flat)))
    keys_sorted = np.fromiter(flat.keys(), dtype=np.int64, count=len(flat))[order]
    names_sorted = np.array(list(flat.values()), dtype=object)[order]
    lookup = ray.put((keys_sorted, names_sorted))

    def join_batch(batch: pa.Table) -> pa.Table:
        # vectorized searchsorted probe (same discipline as
        # orders_by_segment — no per-row dict loop)
        keys, names = ray.get(lookup)
        nk = batch.column("s_nationkey").to_numpy()
        pos = np.minimum(np.searchsorted(keys, nk), len(keys) - 1)
        hit = keys[pos] == nk
        return pa.table(
            {
                "r_name": pa.array(np.where(hit, names[pos], "UNKNOWN"), pa.string()),
                "s_acctbal": batch.column("s_acctbal"),
            }
        )

    return (
        _pq(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .map_batches(join_batch, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Min("s_acctbal", alias_name="min_acctbal"),
            Max("s_acctbal", alias_name="max_acctbal"),
        )
    )


SQL_SUPPLIERS_BY_REGION = """
SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       MIN(s.s_acctbal) AS min_acctbal, MAX(s.s_acctbal) AS max_acctbal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


# --------------------------------------------------------------------
# TPC-H Q1-lite: pruned read + grouped exact aggregates
# --------------------------------------------------------------------


def q_lineitem_pricing(sf_dir: str):
    def to_exact(batch: pa.Table) -> pa.Table:
        qty = batch.column("l_quantity").to_numpy().astype(np.int64)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pa.array(qty),
                "price": batch.column("l_extendedprice"),
            }
        )

    return (
        _pq(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
        .map_batches(to_exact, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Count(alias_name="count_order"),
            Min("price", alias_name="min_price"),
            Max("price", alias_name="max_price"),
        )
    )


SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS count_order,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------
# filter + pruned read (predicate pushdown)
# --------------------------------------------------------------------


def q_lineitem_filter(sf_dir: str):
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.less(batch.column("l_shipdate"), pa.scalar(pd.Timestamp("1995-01-01"))),
            pc.greater(batch.column("l_quantity"), pa.scalar(45.0)),
        )
        t = batch.filter(mask)
        qty = t.column("l_quantity").to_numpy().astype(np.int64)
        return pa.table(
            {"qty": pa.array(qty), "l_orderkey": t.column("l_orderkey")}
        )

    agg = (
        _pq(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_shipdate"])
        .map_batches(f, batch_format="pyarrow")
        .aggregate(  # global aggregate -> dict
            Count(alias_name="n"),
            Sum("qty", alias_name="sum_qty"),
            Min("l_orderkey", alias_name="min_orderkey"),
        )
    )
    return pd.DataFrame([agg])


SQL_LINEITEM_FILTER = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(MIN(l_orderkey) AS BIGINT) AS min_orderkey
FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-01-01' AND l_quantity > 45
"""


# --------------------------------------------------------------------
# similarity search: brute-force cosine top-k over embeddings
# --------------------------------------------------------------------


def _query_vector(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t.column("vec_id").to_pylist().index(0)
    return np.array(t.column("embedding")[idx].as_py(), dtype=np.float64)


def q_knn_cosine(sf_dir: str):
    """Brute-force cosine top-10 to vec_id 0: numpy matmul per batch
    against a broadcast query vector; distributed top-k via
    sort+limit."""
    qv = _query_vector(sf_dir)
    qv = qv / np.linalg.norm(qv)
    qref = ray.put(qv)

    def score(batch: pa.Table) -> pa.Table:
        from ..functions.vec import list_to_matrix

        q = ray.get(qref)
        mat = list_to_matrix(batch.column("embedding"))
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ q) / norms
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "sim": pa.array(np.round(sims, 6)),
            }
        )

    return (
        _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(score, batch_format="pyarrow")
        .filter(expr="vec_id != 0")
        .sort(["sim", "vec_id"], descending=[True, False])
        .limit(10)
    )


SQL_KNN_COSINE = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])), 6) AS sim
FROM embeddings e, q WHERE e.vec_id <> 0
ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) DESC, e.vec_id ASC
LIMIT 10
"""


# --------------------------------------------------------------------
# embedding near-duplicate pairs (cosine > threshold)
# --------------------------------------------------------------------


def q_embedding_neardup(sf_dir: str):
    """All-pairs cosine near-dup: the SMALL-SF ORACLE BASELINE only
    (exact → SQL-hash-checkable against DuckDB's all-pairs join). The
    registered scale path is q_embedding_neardup_lsh below — this
    brute-force O(n²) broadcast must never run on a real corpus."""
    import pyarrow.parquet as pq

    from ..functions.vec import list_to_matrix

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = list_to_matrix(t.column("embedding"))
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    mat_ref = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        bmat = list_to_matrix(batch.column("embedding"))
        bn = np.linalg.norm(bmat, axis=1)
        bn[bn == 0] = 1.0
        bmat = bmat / bn[:, None]
        sims = bmat @ all_mat.T
        ii, jj = np.nonzero(sims > 0.45)
        a = bids[ii]
        b = all_ids[jj]
        keep = a < b
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
            }
        )

    return _pq(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        pairs, batch_format="pyarrow"
    )


SQL_EMBEDDING_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) > 0.45
"""


def q_embedding_neardup_lsh(sf_dir: str):
    """The SCALE path for embedding near-dup (VERDICT r1 #2):
    random-hyperplane LSH bucketing with an OR-construction over
    multiple tables + exact cosine verify inside buckets
    (stages/dedup.embedding_lsh_neardup) — SQL-checked against the
    DuckDB all-pairs oracle, which requires full recall at the test
    threshold: 24 tables × 5 planes retrieves every >0.45 pair of the
    driver's embeddings tables (verified at sf0.001 and sf0.01;
    asserted against the brute-force baseline in tests/test_stages.py).
    Note 0.45 is the synthetic data's planted-pair level; production
    near-dup thresholds (≥0.9) need far fewer tables for the same
    recall — miss prob = (1-(1-θ/π)^planes)^tables."""
    from ..stages.dedup import embedding_lsh_neardup

    return embedding_lsh_neardup(
        _pq(sf_dir, "embeddings", ["vec_id", "embedding"]),
        id_col="vec_id",
        vec_col="embedding",
        threshold=0.45,
        n_planes=5,
        n_tables=24,
    )


SQL_EMBEDDING_NEARDUP_LSH = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) > 0.45
"""


# --------------------------------------------------------------------
# window / quantile / sampling pipelines (historical banner said
# "non-SQL-expressible" — every entry below now carries a full DuckDB
# value-hash oracle; zero rows-only checks remain in the registry)
# --------------------------------------------------------------------


def q_events_quantiles(sf_dir: str):
    """Exact per-group quantiles (percentile_disc semantics) as a
    DISTRIBUTED rank-select: stages/rank.grouped_sorted_prefix_sum in
    row-count mode over sort(["event_type", "value", "event_id"]) gives
    every row its within-group value rank without co-locating a group
    (the key ends in unique event_id, so a dominant event_type spans
    many blocks); the fold's per-group totals pick the percentile_disc
    target ranks ceil(q*n), and a stateless filter + tiny G-row groupby
    assembles the answer. p50/p95 are exact copies of input doubles =>
    hash-safe against the DuckDB oracle. (Ties in value are harmless:
    any row at rank ceil(q*n) carries the right value.)"""
    import math

    from ray.data.aggregate import Max

    from ..stages.rank import grouped_sorted_prefix_sum

    base = _pq(sf_dir, "events", ["event_id", "event_type", "value"])
    ranked, totals = grouped_sorted_prefix_sum(
        base, ["event_type", "value", "event_id"], None, out_name="rnk"
    )
    r50 = {g: int(math.ceil(0.5 * n)) for g, n in totals.items()}
    r95 = {g: int(math.ceil(0.95 * n)) for g, n in totals.items()}

    def mark(t: pa.Table, _r50=r50, _r95=r95) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "p50": pa.array([], pa.float64()),
                    "p95": pa.array([], pa.float64()),
                }
            )
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(et, return_inverse=True)
        t50 = np.array([_r50[u] for u in uniq], np.int64)[inv]
        t95 = np.array([_r95[u] for u in uniq], np.int64)[inv]
        rnk = t.column("rnk").to_numpy(zero_copy_only=False)
        is50, is95 = rnk == t50, rnk == t95
        keep = is50 | is95
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": pa.array(et[keep]),
                "p50": pa.array(np.where(is50[keep], v[keep], -np.inf)),
                "p95": pa.array(np.where(is95[keep], v[keep], -np.inf)),
            }
        )

    hits = ranked.map_batches(mark, batch_format="pyarrow")
    agg = hits.groupby("event_type").aggregate(
        Max("p50", alias_name="p50"), Max("p95", alias_name="p95")
    )

    def finish(t: pa.Table, _n=totals) -> pa.Table:
        et = t.column("event_type").to_pylist()  # <= G rows
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n": pa.array([_n[g] for g in et], pa.int64()),
                "p50": t.column("p50"),
                "p95": t.column("p95"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_QUANTILES = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
       percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95
FROM events GROUP BY event_type
"""


def q_multimodal_resize(sf_dir: str):
    """Multimodal resize plumbing (the remaining op of the brief's
    decode/feature/resize/frame-sample list), deterministic fake
    kernel: synthetic media -> actor-pool block-mean resize to 16x16 ->
    (media_id, kind, width, height, payload digest). Hash-checked vs
    the single-process application of the same kernel
    (oracle_sketch.oracle_multimodal_resize_table)."""
    import hashlib

    from ..stages.multimodal import resize_images, synth_media_table
    from .oracle_sketch import oracle_multimodal_resize_table

    oracle_multimodal_resize_table()
    media = rd.from_arrow(synth_media_table(n=96, seed=42))
    resized = resize_images(media, width=16, height=16, fake=True)

    def digest(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": b.column("media_id"),
                "kind": b.column("kind"),
                "width": b.column("width"),
                "height": b.column("height"),
                "payload_hex": pa.array(
                    [
                        hashlib.md5(p).hexdigest()
                        for p in b.column("payload").to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )

    return resized.map_batches(digest, batch_format="pyarrow")


from .oracle_sketch import (  # noqa: E402
    MULTIMODAL_RESIZE_ORACLE_PATH as _MM_RESIZE_PATH,
)

SQL_MULTIMODAL_RESIZE = f"""
SELECT media_id, kind, width, height, payload_hex
FROM read_parquet('{_MM_RESIZE_PATH}')
"""


def q_multimodal_features(sf_dir: str):
    """Multimodal plumbing end-to-end (decode is the documented
    environment-gated stub run in deterministic fake mode): synthetic
    media table -> actor-pool feature extraction + video frame
    sampling, joined into one (media_id, kind, n_frames, feat_dim)
    summary. Hash-checked against the single-process oracle
    (oracle_sketch.oracle_multimodal_table: same fake kernels, plain
    dicts instead of actor pools + groupby + union+sort join)."""
    from .oracle_sketch import oracle_multimodal_table

    oracle_multimodal_table()
    from ray.data.aggregate import Count

    from ..stages.multimodal import (
        decode_features,
        sample_frames,
        synth_media_table,
    )

    media = rd.from_arrow(synth_media_table(n=96, seed=42))
    feats = decode_features(media, fake=True)

    def feat_summary(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feat_dim": pc.cast(
                    pc.list_value_length(batch.column("feat")), pa.int32()
                ),
            }
        )

    frames = (
        sample_frames(rd.from_arrow(synth_media_table(n=96, seed=42)), fake=True)
        .groupby("media_id")
        .aggregate(Count(alias_name="n_frames"))
    )

    # distributed left join on media_id — union+sort co-partition (the
    # stages/joins.py discipline; VERDICT r2 #3 removed the former
    # driver-side take_all lookup). _side=1 = summary row, 0 = count row.
    wire = pa.schema(
        [
            ("media_id", pa.int64()),
            ("kind", pa.string()),
            ("feat_dim", pa.int32()),
            ("n_frames", pa.int64()),
            ("_side", pa.int8()),
        ]
    )

    def summary_wire(batch: pa.Table) -> pa.Table:
        t = feat_summary(batch)
        n = len(t)
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "kind": t.column("kind"),
                "feat_dim": t.column("feat_dim"),
                "n_frames": pa.nulls(n, pa.int64()),
                "_side": pa.array(np.ones(n, dtype=np.int8)),
            },
            schema=wire,
        )

    def counts_wire(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": pa.nulls(n, pa.string()),
                "feat_dim": pa.nulls(n, pa.int32()),
                "n_frames": batch.column("n_frames").cast(pa.int64()),
                "_side": pa.array(np.zeros(n, dtype=np.int8)),
            },
            schema=wire,
        )

    def merge(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lefts = t.filter(pc.equal(t.column("_side"), 1))
        out_schema = pa.schema(
            [
                ("media_id", pa.int64()),
                ("kind", pa.string()),
                ("feat_dim", pa.int32()),
                ("n_frames", pa.int64()),
            ]
        )
        if len(lefts) == 0:
            return out_schema.empty_table()
        rights = t.filter(pc.equal(t.column("_side"), 0))
        rk = rights.column("media_id").to_numpy(zero_copy_only=False)
        lk = lefts.column("media_id").to_numpy(zero_copy_only=False)
        nf = np.zeros(len(lk), dtype=np.int64)
        if len(rk):
            rv = rights.column("n_frames").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(rk, lk)  # block sorted by media_id
            ok = (pos < len(rk)) & (rk[np.minimum(pos, len(rk) - 1)] == lk)
            nf[ok] = rv[pos[ok]]
        return pa.table(
            {
                "media_id": lefts.column("media_id"),
                "kind": lefts.column("kind"),
                "feat_dim": lefts.column("feat_dim"),
                "n_frames": pa.array(nf),
            },
            schema=out_schema,
        )

    return (
        feats.map_batches(summary_wire, batch_format="pyarrow")
        .union(frames.map_batches(counts_wire, batch_format="pyarrow"))
        .sort("media_id")
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )


def q_simhash_docs(sf_dir: str):
    """SimHash per document (SURVEY A8). Hash-checked against the
    single-process SCALAR simhash oracle (oracle_sketch.py) — the
    vectorized unpackbits kernel must match it bit for bit."""
    from ..functions.simhash import simhash_text_batch
    from .oracle_sketch import oracle_simhash_table

    oracle_simhash_table(sf_dir)

    def sh(batch: pa.Table) -> pa.Table:
        vals = simhash_text_batch(batch.column("text").to_pylist())
        return pa.table({"doc_id": batch.column("doc_id"), "simhash": pa.array(vals)})

    return _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=32).map_batches(
        sh, batch_format="pyarrow"
    )


def q_minhash_lsh_dedup(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs verified by true Jaccard
    (shingle→minhash→band→bucket-groupby→verify). Hash-checked against
    the single-process dict-bucket oracle (oracle_sketch.py), proving
    the distributed band/sort/union-verify exchanges lose no pair."""
    from ..stages.dedup import minhash_lsh_pairs
    from .oracle_sketch import oracle_minhash_pairs_table

    oracle_minhash_pairs_table(sf_dir)
    return minhash_lsh_pairs(
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=32),
        id_col="doc_id",
        text_col="text",
    )


def q_lsh_recall(sf_dir: str):
    """Recall/precision evaluation of the MinHash+LSH near-dup
    pipeline against the EXACT n-gram Jaccard pair set at the same
    0.8 threshold — the quality gate a dedup deployment monitors: a
    band/permutation change that silently starts missing clone pairs
    shows up here, not in the pair counts. Companion of ann_recall
    for the dedup stack.

    Both sides run as their registered distributed pipelines
    (stages/dedup.ngram_jaccard_pairs exact; minhash_lsh_pairs
    banded+verified); the overlap is ONE semi merge_join on a packed
    (id_a<<32 | id_b) int64 key, and only three scalar counts reach
    the driver. SQL oracle: the exact side re-derived with the
    real-SQL all-pairs gram query, the LSH side from the sequential
    dict-bucket oracle parquet."""
    from ..stages.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    from ..stages.joins import merge_join
    from .oracle_sketch import oracle_minhash_pairs_table

    oracle_minhash_pairs_table(sf_dir)
    docs = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=32)

    def packed(res):
        def key(b: pa.Table) -> pa.Table:
            a = b.column("id_a").cast(pa.int64()).to_numpy(zero_copy_only=False)
            bb = b.column("id_b").cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({"pk": pa.array((a << np.int64(32)) | bb)})

        return res.map_batches(key, batch_format="pyarrow")

    exact = packed(
        ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text")
    ).materialize()
    lsh = packed(
        minhash_lsh_pairs(docs, id_col="doc_id", text_col="text")
    ).materialize()
    n_exact = exact.count()
    n_lsh = lsh.count()
    n_common = merge_join(
        exact, lsh, left_on="pk", right_on="pk", right_cols=[], how="semi"
    ).count()
    recall = round(n_common / n_exact, 6) if n_exact else 0.0
    prec = round(n_common / n_lsh, 6) if n_lsh else 0.0
    return pd.DataFrame(
        {
            "n_exact": pd.array([n_exact], dtype="int64"),
            "n_lsh": pd.array([n_lsh], dtype="int64"),
            "n_common": pd.array([n_common], dtype="int64"),
            "recall": [recall + 0.0],
            "prec": [prec + 0.0],
        }
    )


SQL_LSH_RECALL = r"""
WITH w AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(trim(lower(text)), '\s+') END AS ws
  FROM documents
),
g AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i, i + 4), ' ') AS gram
  FROM w, LATERAL (
    SELECT unnest(generate_series(1, len(ws) - 4)) AS i
  ) s
  WHERE len(ws) >= 5
  UNION
  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS gram
  FROM w WHERE len(ws) BETWEEN 1 AND 4
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
exact AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE 5 * i.inter >= 4 * (sa.sz + sb.sz - i.inter)
),
lsh AS (
  SELECT id_a, id_b
  FROM read_parquet('/tmp/ccray_oracle_minhash_pairs.parquet')
),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_common
  FROM exact e JOIN lsh l ON l.id_a = e.id_a AND l.id_b = e.id_b
)
SELECT CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
       CAST((SELECT COUNT(*) FROM lsh) AS BIGINT) AS n_lsh,
       c.n_common,
       CASE WHEN (SELECT COUNT(*) FROM exact) = 0 THEN 0.0
            ELSE ROUND(c.n_common * 1.0 / (SELECT COUNT(*) FROM exact), 6)
       END + 0.0 AS recall,
       CASE WHEN (SELECT COUNT(*) FROM lsh) = 0 THEN 0.0
            ELSE ROUND(c.n_common * 1.0 / (SELECT COUNT(*) FROM lsh), 6)
       END + 0.0 AS prec
FROM c
"""


def q_lang_temperature_sampling(sf_dir: str):
    """Temperature-based language sampling weights — the multilingual
    mixture knob (Conneau et al. 2020 XLM-R / Xue et al. 2021 mT5:
    sample language l with p_l ~ (n_l / N)^alpha, alpha=0.3): per
    language, doc and token mass, the raw share, the temperature-
    flattened sampling share, and the resulting up/down-sampling
    factor low-resource languages get.

    Shape: one in-batch token-count pass (Arrow RE2 kernel) with
    per-(batch,lang) pre-aggregation, ONE lang-scale groupby; the
    weight arithmetic is a fixed double chain over exact integer
    masses, rounded to 6 dp. REAL SQL oracle (DuckDB POWER + window
    sums over the identical integer masses)."""
    import pyarrow.compute as pc

    ALPHA = 0.3

    def partials(t: pa.Table) -> pa.Table:
        n_words = pc.count_substring_regex(t.column("text"), pattern=r"\S+")
        df_ = pd.DataFrame(
            {
                "lang": t.column("lang").to_pylist(),
                "n_words": n_words.to_numpy(zero_copy_only=False),
            }
        )
        g = df_.groupby("lang", sort=True).agg(
            n_docs=("n_words", "size"), n_tokens=("n_words", "sum")
        )
        return pa.table(
            {
                "lang": pa.array(g.index.tolist(), pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(), pa.int64()),
                "n_tokens": pa.array(g["n_tokens"].to_numpy(), pa.int64()),
            }
        )

    agg = (
        _pq(sf_dir, "documents", ["lang", "text"], min_blocks=8)
        .map_batches(partials, batch_format="pyarrow")
        .groupby("lang")
        .sum(["n_docs", "n_tokens"])
    )

    def weights(t: pa.Table) -> pa.Table:
        nd = t.column("sum(n_docs)").to_numpy(zero_copy_only=False).astype(np.int64)
        nt = t.column("sum(n_tokens)").to_numpy(zero_copy_only=False).astype(np.int64)
        total = float(nt.sum())
        p_raw = nt.astype(np.float64) / total
        p_pow = p_raw**ALPHA
        p_alpha = p_pow / p_pow.sum()
        return pa.table(
            {
                "lang": t.column("lang"),
                "n_docs": pa.array(nd, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "p_raw": pa.array(np.round(p_raw, 6), pa.float64()),
                "p_alpha": pa.array(np.round(p_alpha, 6), pa.float64()),
                "boost": pa.array(np.round(p_alpha / p_raw, 6), pa.float64()),
            }
        )

    # lang-scale (a handful of rows): one block computes the shares
    return agg.repartition(1).map_batches(
        weights, batch_format="pyarrow", batch_size=None
    )


SQL_LANG_TEMPERATURE_SAMPLING = r"""
WITH m2 AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(array_length(list_filter(
             regexp_split_to_array(text, '\s+'), x -> x <> ''))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY lang
), shares AS (
  SELECT lang, n_docs, n_tokens,
         n_tokens / SUM(n_tokens) OVER () AS praw
  FROM m2
), flat AS (
  SELECT *, POWER(praw, 0.3) / SUM(POWER(praw, 0.3)) OVER () AS palpha
  FROM shares
)
SELECT lang, n_docs, n_tokens,
       ROUND(praw, 6) AS p_raw,
       ROUND(palpha, 6) AS p_alpha,
       ROUND(palpha / praw, 6) AS boost
FROM flat
"""


def q_winnow_neardup(sf_dir: str):
    """Winnowing fingerprint near-dup pairs (Schleimer et al. 2003 —
    the MOSS detector; stages/dedup.winnow_neardup_pairs): docs
    sharing >= 3 winnowed char-16-gram fingerprints (window 8 — any
    shared verbatim substring of >= 23 chars is guaranteed a shared
    fingerprint), with exact shared counts and per-doc fingerprint
    totals for containment scoring. Catches passage-level verbatim
    overlap whole-doc resemblance detectors dilute away. Hash-checked
    against a sequential posting-dict fold over the same kernel and
    cap rule."""
    from ..stages.dedup import winnow_neardup_pairs
    from .oracle_sketch import oracle_winnow_table

    oracle_winnow_table(sf_dir)
    return winnow_neardup_pairs(
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=32),
        id_col="doc_id",
        text_col="text",
    )


SQL_WINNOW_NEARDUP = """
SELECT id_a, id_b, n_common, sz_a, sz_b
FROM read_parquet('/tmp/ccray_oracle_winnow.parquet')
"""


def q_winnow_dup_fraction(sf_dir: str):
    """Soft-dedup duplication score per document: the fraction of its
    winnowed fingerprints shared with at least one other doc — the
    graded weight-instead-of-drop alternative to hard dedup
    (SlimPajama-style duplication-ratio reporting). Shape:
    stages/dedup.winnow_dup_fractions — ONE sort(fp) co-partition
    where the posting count and the shared-mark happen in the same
    block pass, then a doc-scale groupby. Hash-checked against a
    sequential Counter fold over the same kernel."""
    from ..stages.dedup import winnow_dup_fractions
    from .oracle_sketch import oracle_winnow_dup_frac_table

    oracle_winnow_dup_frac_table(sf_dir)
    return winnow_dup_fractions(
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=32)
    )


SQL_WINNOW_DUP_FRACTION = """
SELECT doc_id, n_fps, n_shared, dup_frac
FROM read_parquet('/tmp/ccray_oracle_winnow_dupfrac.parquet')
"""


def q_jaccard_neardup(sf_dir: str):
    """EXACT n-gram Jaccard near-dup pairs (inverted shingle index;
    stages/dedup.ngram_jaccard_pairs) at threshold 0.8 — integer
    (inter, union_n) output so the DuckDB all-pairs oracle hash-matches
    with no float rounding hazard."""
    from ..stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=32),
        id_col="doc_id",
        text_col="text",
    )


SQL_JACCARD_NEARDUP = r"""
WITH w AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(trim(lower(text)), '\s+') END AS ws
  FROM documents
),
g AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i, i + 4), ' ') AS gram
  FROM w, LATERAL (
    SELECT unnest(generate_series(1, len(ws) - 4)) AS i
  ) s
  WHERE len(ws) >= 5
  UNION
  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS gram
  FROM w WHERE len(ws) BETWEEN 1 AND 4
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.inter,
       CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS union_n
FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
WHERE 5 * i.inter >= 4 * (sa.sz + sb.sz - i.inter)
"""


def q_containment_neardup(sf_dir: str):
    """EXACT n-gram CONTAINMENT near-dup pairs
    (stages/dedup.ngram_containment_pairs) at threshold 0.9 — Broder's
    containment measure, catching partial copies (a small doc's
    shingle set sitting inside a bigger doc's) that the Jaccard union
    denominator dilutes. Integer (inter, min_sz) output so the DuckDB
    all-pairs oracle hash-matches with no float hazard."""
    from ..stages.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=32),
        id_col="doc_id",
        text_col="text",
    )


SQL_CONTAINMENT_NEARDUP = r"""
WITH w AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []
              ELSE string_split_regex(trim(lower(text)), '\s+') END AS ws
  FROM documents
),
g AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i, i + 4), ' ') AS gram
  FROM w, LATERAL (
    SELECT unnest(generate_series(1, len(ws) - 4)) AS i
  ) s
  WHERE len(ws) >= 5
  UNION
  SELECT DISTINCT doc_id, array_to_string(ws, ' ') AS gram
  FROM w WHERE len(ws) BETWEEN 1 AND 4
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.inter,
       CAST(LEAST(sa.sz, sb.sz) AS BIGINT) AS min_sz
FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
WHERE 10 * i.inter >= 9 * LEAST(sa.sz, sb.sz)
"""


def q_knn_ivf(sf_dir: str):
    """IVF ANN (kmeans coarse quantizer + nprobe inverted-list scan)
    top-10 neighbours for query vectors vec_id 0..3 — the scale path
    next to the brute-force baseline q_knn_cosine. Runs the
    sample_mode="hash" configuration: the quantizer sample is a
    deterministic hash-selected id set, so the whole APPROXIMATE
    result is a pure function of the input and hash-checks against
    the single-process oracle (oracle_sketch.oracle_knn_ivf_table —
    same numeric kernels, zero distribution machinery). Recall vs
    brute force additionally asserted in tests/test_ann.py."""
    import pyarrow.parquet as pq

    from ..stages.ann import knn_ivf
    from .oracle_sketch import oracle_knn_ivf_table

    oracle_knn_ivf_table(sf_dir)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    qmat = np.array(
        [t.column("embedding")[ids.index(qid)].as_py() for qid in range(4)],
        dtype=np.float64,
    )
    res = knn_ivf(
        _pq(sf_dir, "embeddings", ["vec_id", "embedding"]),
        qmat,
        k=10,
        n_centroids=32,
        nprobe=8,
        sample_mode="hash",
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": batch.column("query_id").cast(pa.int64()),
                "vec_id": batch.column("vec_id"),
                "cosine": pa.array(
                    np.round(batch.column("cosine").to_numpy(), 6), pa.float64()
                ),
                "rank": batch.column("rank").cast(pa.int64()),
            }
        )

    return res.map_batches(finalize, batch_format="pyarrow")



def q_knn_ivfpq(sf_dir: str):
    """IVF-PQ ANN (Jegou/Douze/Schmid 2011): coarse inverted lists +
    product-quantized residuals scored via per-query lookup tables —
    the memory-compressed scale path (m bytes/vector in the scan, m
    table lookups/score). Deterministic end to end (hash-sample
    training, shared kernels), hash-checked against the sequential
    oracle (oracle_sketch.oracle_knn_ivfpq_table); recall vs brute
    force asserted in tests/test_ann.py."""
    import pyarrow.parquet as pq

    from ..stages.ann import knn_ivfpq
    from .oracle_sketch import oracle_knn_ivfpq_table

    oracle_knn_ivfpq_table(sf_dir)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    qmat = np.array(
        [t.column("embedding")[ids.index(qid)].as_py() for qid in range(4)],
        dtype=np.float64,
    )
    res = knn_ivfpq(
        _pq(sf_dir, "embeddings", ["vec_id", "embedding"]),
        qmat,
        k=10,
        n_centroids=32,
        nprobe=8,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": batch.column("query_id").cast(pa.int64()),
                "vec_id": batch.column("vec_id"),
                "score": pa.array(
                    np.round(batch.column("score").to_numpy(), 6), pa.float64()
                ),
                "rank": batch.column("rank").cast(pa.int64()),
            }
        )

    return res.map_batches(finalize, batch_format="pyarrow")


def q_knn_ivf_exhaustive(sf_dir: str):
    """IVF with nprobe = n_centroids: every query probes every inverted
    list, so the result is EXACT top-k — which makes the whole IVF
    machinery (quantizer fit, broadcast, per-list scan, distributed
    top-k reduce) SQL-hash-checkable against a DuckDB all-pairs oracle.
    The approximate configuration stays registered rows-only as
    knn_ivf."""
    import pyarrow.parquet as pq

    from ..stages.ann import knn_ivf

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    qmat = np.array(
        [t.column("embedding")[ids.index(qid)].as_py() for qid in range(4)],
        dtype=np.float64,
    )
    res = knn_ivf(
        _pq(sf_dir, "embeddings", ["vec_id", "embedding"]),
        qmat,
        k=10,
        n_centroids=32,
        nprobe=32,  # == n_centroids: exhaustive => exact
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": batch.column("query_id").cast(pa.int64()),
                "vec_id": batch.column("vec_id"),
                "cosine": pa.array(
                    np.round(batch.column("cosine").to_numpy(), 6), pa.float64()
                ),
                "rank": batch.column("rank").cast(pa.int64()),
            }
        )

    return res.map_batches(finalize, batch_format="pyarrow")


SQL_KNN_IVF_EXHAUSTIVE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 4
),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS cos
  FROM embeddings e, q
),
ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) - 1 AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, vec_id,
       ROUND(cos, 6) AS cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank < 10
"""


def q_sharded_top_docs(sf_dir: str):
    """Sharded query layer (SURVEY §3.3): cached sorted result +
    manifest-indexed pagination; returns page 0 (50 rows) of documents
    by n_chars desc. Second run at the same sf is a pure cache read
    keyed by FP64(domain)+FP64(params) (query/Query.java:792-808)."""
    from .query_layer import ShardedQuery, run_query

    q = ShardedQuery(
        domain_id="top_docs_by_len",
        params=sf_dir,
        sort_by=(("n_chars", "descending"), ("doc_id", "ascending")),
    )
    h = run_query(q, lambda: _pq(sf_dir, "documents", ["doc_id", "n_chars"]))
    return h.page(50, 0)


SQL_SHARDED_TOP_DOCS = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id ASC
LIMIT 50
"""


def q_text_quality(sf_dir: str):
    """Quality scoring stage (actor pool), projected to its exact
    INTEGER sub-scores so the whole stage is oracle-hash-checkable
    (VERDICT r2 #10): word/stopword/punct/char/token counts straight
    from the per-actor QualityStage kernels. The full output (float
    ratios, quality_score, lang_pred, doc_fp) is pytest-golden-locked
    in tests/test_stages.py — DuckDB can't mirror the lang-ID heuristic
    or the rolling-hash fingerprint, and float round() semantics differ."""
    from ..stages.text_analysis import quality_stage

    return quality_stage(
        _pq(sf_dir, "documents", ["doc_id", "text", "lang"], min_blocks=32)
    ).select_columns(
        ["doc_id", "n_words", "n_chars", "n_stop", "n_punct", "tokens_ws", "tokens_bpeish"]
    )


# punctuation set of textstats._PUNCT, SQL-escaped ('' = literal quote)
_SQL_PUNCT = ".,;:!?''\"()[]{}-"
_SQL_STOPWORDS = ",".join(
    f"'{w}'"
    for w in (
        "the and of a to in is it that for on was with as be at by this have "
        "from or an are not but had his they you which one all were her she"
    ).split()
)

SQL_TEXT_QUALITY = f"""
SELECT
  doc_id,
  len(regexp_extract_all(text, '\\S+')) AS n_words,
  length(text) AS n_chars,
  len(list_filter(
        regexp_extract_all(lower(text), '\\S+'),
        w -> trim(w, '{_SQL_PUNCT}') IN ({_SQL_STOPWORDS})
  )) AS n_stop,
  length(text) - length(translate(text, '{_SQL_PUNCT}', '')) AS n_punct,
  len(regexp_extract_all(text, '\\S+')) AS tokens_ws,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS tokens_bpeish
FROM documents
"""


def q_text_stats(sf_dir: str):
    """SQL-checkable projection of the text-analysis family (VERDICT r1
    #9): exact INTEGER counts (no float-rounding hash hazards) computed
    with pure Arrow RE2 kernels — words, punctuation chars, total
    chars, BPE-ish tokens (the textstats token_count_bpeish
    pre-tokenizer shape)."""
    import pyarrow.compute as pc

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pc.cast(
                    pc.count_substring_regex(text, pattern=r"\S+"), pa.int64()
                ),
                "n_punct": pc.cast(
                    pc.count_substring_regex(
                        text, pattern=r"[.,;:!?'\"()\[\]{}\-]"
                    ),
                    pa.int64(),
                ),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "tokens_bpeish": pc.cast(
                    pc.count_substring_regex(
                        text, pattern=r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"
                    ),
                    pa.int64(),
                ),
            }
        )

    return _pq(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


SQL_TEXT_STATS = r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
       CAST(length(regexp_extract_all(text, '[.,;:!?''"()\[\]{}\-]')) AS BIGINT) AS n_punct,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS BIGINT) AS tokens_bpeish
FROM documents
"""


def q_pagerank_hosts(sf_dir: str):
    """PageRank over the crawl's host link graph — the iterative-
    algorithm pipeline on the engine's own pages universe: streaming
    parse -> anchor resolution -> distinct host edges (one sort
    exchange) -> 10 damped power iterations, each moving the edge
    table exactly once (stages/pagerank.py). Hash-checked against the
    sequential oracle (same parse + edge kernels, dense numpy
    iteration)."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import pagerank_hosts
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_pagerank_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_pagerank_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return pagerank_hosts(parsed, damping=0.85, iters=10)


def q_hits_hosts(sf_dir: str):
    """HITS hubs/authorities over the crawl host graph — the second
    iterative graph pipeline next to PageRank (stages/pagerank.py
    hits_hosts: two edge exchanges + two one-scalar L2 norms per
    iteration, distributed score table throughout). Hash-checked
    against the dense-numpy sequential oracle."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import hits_hosts
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_hits_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_hits_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return hits_hosts(parsed, iters=6)


def q_trustrank_hosts(sf_dir: str):
    """TrustRank over the crawl host graph (stages/pagerank.py
    trustrank_edges — Gyongyi et al. 2004): teleport restricted to a
    trusted seed set so link-spam clusters that inflate plain PageRank
    score near zero. Seeds = top-8 hosts by distinct-edge in-degree
    (host-asc tiebreak), the deterministic stand-in for a vetted
    whitelist — selected DISTRIBUTED (groupby(dst).count -> sort ->
    limit(8); only 8 rows reach the driver), then broadcast into the
    same one-edge-exchange-per-iteration power loop PageRank uses.
    The distinct edge table is built once and shared by seed selection
    and the iteration (dedup=False). Hash-checked against the
    dense-numpy sequential oracle."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import (
        _distinct_sorted,
        extract_host_edges_batch,
        trustrank_edges,
    )
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import TRUSTRANK_N_SEEDS, oracle_trustrank_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_trustrank_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    edges = _distinct_sorted(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow"),
        ["src", "dst"],
    ).materialize()
    seed_rows = (
        edges.groupby("dst")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "host": t.column("dst"),
                    "indeg": t.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["indeg", "host"], descending=[True, False])
        .limit(TRUSTRANK_N_SEEDS)
        .take_all()
    )
    seeds = {r["host"] for r in seed_rows}
    return trustrank_edges(edges, seeds, damping=0.85, iters=10, dedup=False)


SQL_TRUSTRANK_HOSTS = """
SELECT host, trust FROM read_parquet('/tmp/ccray_oracle_trustrank.parquet')
"""


def q_spam_mass_hosts(sf_dir: str):
    """Spam mass (Gyongyi et al. 2006): relative mass =
    (pr - trust) / pr per host — the share of a host's PageRank that
    does NOT flow from the trusted seed neighborhood; link-spam farms
    score ~1, seed-adjacent hosts ~0. Runs BOTH power loops over ONE
    shared distinct edge table (PageRank uniform teleport, TrustRank
    top-8-in-degree seeds) and combines them with a sort-merge join on
    host — node-scale, one exchange. Both inputs are the exact rounded
    vectors whose hashes the pagerank_hosts / trustrank_hosts rows
    already match, so the combine is value-exact vs the sequential
    oracle."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.joins import merge_join
    from ..stages.pagerank import (
        _distinct_sorted,
        extract_host_edges_batch,
        pagerank_edges,
        trustrank_edges,
    )
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import TRUSTRANK_N_SEEDS, oracle_spam_mass_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_spam_mass_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    edges = _distinct_sorted(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow"),
        ["src", "dst"],
    ).materialize()
    seed_rows = (
        edges.groupby("dst")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "host": t.column("dst"),
                    "indeg": t.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["indeg", "host"], descending=[True, False])
        .limit(TRUSTRANK_N_SEEDS)
        .take_all()
    )
    seeds = {r["host"] for r in seed_rows}
    pr = pagerank_edges(edges, damping=0.85, iters=10)
    tr = trustrank_edges(edges, seeds, damping=0.85, iters=10, dedup=False)
    joined = merge_join(pr, tr, "host", "host", ["trust"], how="left")

    def finalize(t: pa.Table) -> pa.Table:
        p = t.column("pr").to_numpy(zero_copy_only=False)
        tv = np.nan_to_num(
            t.column("trust").to_numpy(zero_copy_only=False).astype(np.float64),
            nan=0.0,
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            mass = np.where(
                p > 0, np.round((p - tv) / np.maximum(p, 1e-300), 6), 0.0
            )
        return pa.table(
            {
                "host": t.column("host"),
                "pr": t.column("pr"),
                "trust": pa.array(tv, pa.float64()),
                "spam_mass": pa.array(mass + 0.0, pa.float64()),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


SQL_SPAM_MASS_HOSTS = """
SELECT host, pr, trust, spam_mass
FROM read_parquet('/tmp/ccray_oracle_spam_mass.parquet')
"""


def q_reciprocal_links(sf_dir: str):
    """Reciprocal-link (link-exchange) detection: per host, how many
    of its distinct non-self out-edges are reciprocated — (a -> b)
    with (b -> a) also present — and the reciprocity ratio. Link
    farms trade links both ways, so near-1 ratios over non-trivial
    out-degree are the classic link-exchange spam signal (Gyongyi &
    Garcia-Molina, "Web spam taxonomy", AIRWeb 2005).

    Shape: stages/pagerank.py reciprocal_link_stats — the distinct
    (src, dst) edge table is built once and materialized (slim
    two-string rows); the reverse-edge test is a SEMI merge_join of
    the edge list against its own swapped key ("src\\tdst" vs
    "dst\\tsrc") — ONE union+sort exchange over edge-scale rows, no
    per-row Python; degree rollups are two node-scale groupbys joined
    back with a left merge_join. Hash-checked against a sequential
    set-membership oracle over the identical edge set."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import (
        extract_host_edges_batch,
        reciprocal_link_stats,
    )
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_recip_links_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_recip_links_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return reciprocal_link_stats(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow")
    )


SQL_RECIPROCAL_LINKS = """
SELECT host, out_deg, recip_deg, recip_ratio
FROM read_parquet('/tmp/ccray_oracle_recip_links.parquet')
"""


def q_kcore_hosts(sf_dir: str):
    """Coreness (k-core decomposition) per host over the crawl's link
    graph viewed undirected: core(v) = largest k such that v survives
    repeatedly deleting all nodes of degree < k — the standard web-graph
    density/robustness signal (dense link-farm cores score high, the
    periphery scores 1).

    Shape: stages/pagerank.py k_core_hosts — the h-index fixpoint
    (Lu et al. 2016): int64 FNV-1a hash wire (no string rides the
    loop), the undirected distinct edge table built ONCE and
    materialized, each round ONE union+sort merge_join shipping
    current values to neighbors plus a sort(u) co-partitioned
    block-local vectorized h-index; integer monotone values make the
    node-scale sum a sound fixpoint test. Hash-checked against a
    sequential Batagelj-Zaversnik peel over the identical edge set."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import extract_host_edges_batch, k_core_hosts
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_kcore_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_kcore_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return k_core_hosts(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow")
    )


SQL_KCORE_HOSTS = """
SELECT host, core
FROM read_parquet('/tmp/ccray_oracle_kcore.parquet')
"""


def q_ktruss_hosts(sf_dir: str):
    """Maximal 4-truss of the crawl's host graph viewed undirected
    (Cohen 2008): the largest subgraph where every edge closes >= 2
    triangles inside it — the cohesion census one level above
    triangle counting and strictly inside the 3-core (dense
    link-farm / community cores). Output (host, truss_deg) for every
    host in the truss.

    Shape: stages/pagerank.k_truss_hosts — batch peeling to fixpoint
    on the int64 FNV-1a hash wire; per round ONE sort(u) co-partition
    with capped np.triu_indices wedge emission, ONE union+sort semi
    merge_join closing wedges against the edge-key set, a
    triangle->3-edges explode + groupby support count, and a semi
    join keeping supported edges. Batch and sequential peeling
    converge to the same unique maximal truss, so the sequential
    Cohen peel (oracle_sketch.oracle_ktruss_table) is exact parity."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import extract_host_edges_batch, k_truss_hosts
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_ktruss_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_ktruss_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return k_truss_hosts(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow")
    )


SQL_KTRUSS_HOSTS = """
SELECT host, truss_deg
FROM read_parquet('/tmp/ccray_oracle_ktruss.parquet')
"""


def q_rwr_host_sample(sf_dir: str):
    """Random-walk-with-restart sample of the crawl's host graph
    (Leskovec & Faloutsos 2006 graph sampling; PPR by simulation):
    4 top-out-degree seed hosts x 25 walkers x 8 steps, restart
    p=0.15 — the frontier-seeding / hub-neighborhood census. Output
    (host, visits) over every visited host.

    Shape: stages/pagerank.random_walk_visits — adjacency on the
    int64 FNV-1a hash wire built once; per step ONE walker-scale LEFT
    merge_join against adjacency plus ONE sort(w) co-partitioned
    block-local argmin; every decision a SplitMix64 hash of (walker,
    step, neighbor) with a neighbor-id tiebreak, so the sequential
    oracle (oracle_sketch.oracle_rwr_table) replays the walk
    bit-for-bit."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import extract_host_edges_batch, random_walk_visits
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_rwr_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_rwr_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return random_walk_visits(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow")
    )


SQL_RWR_HOST_SAMPLE = """
SELECT host, visits
FROM read_parquet('/tmp/ccray_oracle_rwr.parquet')
"""


def q_collocations_pmi(sf_dir: str, min_count: int = 5, topk: int = 50):
    """Top-``topk`` collocations (adjacent word pairs) of the corpus by
    pointwise mutual information (Church & Hanks 1990, "Word
    association norms, mutual information, and lexicography") with
    ``n_pair >= min_count`` — the classic phrase-mining / tokenizer-
    merge-candidate signal an LLM data pipeline computes before vocab
    construction. Output (w1, w2, n_pair, pmi[6dp]), ties at equal
    rounded pmi broken on (w1, w2).

    Scale shape: ONE pass over text — the per-batch kernel tokenizes
    once and emits BOTH unigram and within-doc-adjacent bigram counts
    pre-aggregated per batch (the A4 combiner rule) on one fused
    string wire ("u <tok>" / "b <w1> <w2>" — whitespace tokens cannot
    contain the separator); ONE vocabulary-scale groupby folds them;
    the split-back tables are materialized once (fan-out >= 2 rule)
    and joined by two union+sort merge_joins; totals are exact int64
    dataset sums; the only float is the shared elementwise
    functions/textstats.pmi_scores kernel (identical bits on the
    sequential oracle side), rounded BEFORE the distributed
    sort+limit ranking."""
    import pyarrow.compute as pc

    from ..functions.textstats import pmi_scores
    from ..stages.joins import merge_join
    from .oracle_sketch import oracle_pmi_table

    oracle_pmi_table(sf_dir, min_count=min_count, topk=topk)

    def count_rows(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        doc_rep = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = flat != ""
        tok = flat[keep]
        did = doc_rep[keep]
        keys: list[np.ndarray] = []
        if len(tok):
            keys.append(np.char.add("u ", tok.astype("U")))
        if len(tok) > 1:
            same = did[:-1] == did[1:]
            b1 = tok[:-1][same].astype("U")
            b2 = tok[1:][same].astype("U")
            keys.append(
                np.char.add(np.char.add(np.char.add("b ", b1), " "), b2)
            )
        if not keys:
            return pa.table(
                {"key": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        allk = np.concatenate(keys)
        u, c = np.unique(allk, return_counts=True)
        return pa.table(
            {"key": pa.array(u, pa.string()), "n": pa.array(c.astype(np.int64))}
        )

    counts = (
        _pq(sf_dir, "documents", ["text"], min_blocks=8)
        .map_batches(count_rows, batch_format="pyarrow")
        .groupby("key")
        .sum("n")
        .materialize()
    )

    def split_uni(t: pa.Table) -> pa.Table:
        m = pc.starts_with(t.column("key"), "u ")
        f = t.filter(m)
        return pa.table(
            {
                "token": pc.utf8_replace_slice(f.column("key"), 0, 2, ""),
                "n_w": f.column("sum(n)").cast(pa.int64()),
            }
        )

    def split_big(t: pa.Table) -> pa.Table:
        m = pc.starts_with(t.column("key"), "b ")
        f = t.filter(m)
        body = pc.utf8_replace_slice(f.column("key"), 0, 2, "")
        parts = pc.split_pattern(body, " ")
        return pa.table(
            {
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
                "n_pair": f.column("sum(n)").cast(pa.int64()),
            }
        )

    uni = counts.map_batches(split_uni, batch_format="pyarrow").materialize()
    big = counts.map_batches(split_big, batch_format="pyarrow").materialize()
    n_tok = int(uni.sum("n_w") or 0)
    n_pairs = int(big.sum("n_pair") or 0)
    if n_pairs == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n_pair": pa.array([], pa.int64()),
                    "pmi": pa.array([], pa.float64()),
                }
            )
        )
    big = big.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n_pair"), min_count)),
        batch_format="pyarrow",
    )
    j = merge_join(big, uni, "w1", "token", ["n_w"], how="inner", suffix="1")
    j = merge_join(j, uni, "w2", "token", ["n_w"], how="inner", suffix="2")

    def score(t: pa.Table) -> pa.Table:
        pmi = pmi_scores(
            t.column("n_pair").to_numpy(zero_copy_only=False),
            t.column("n_w1").to_numpy(zero_copy_only=False),
            t.column("n_w2").to_numpy(zero_copy_only=False),
            n_pairs,
            n_tok,
        )
        return pa.table(
            {
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "n_pair": t.column("n_pair"),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return (
        j.map_batches(score, batch_format="pyarrow")
        .sort(["pmi", "w1", "w2"], descending=[True, False, False])
        .limit(topk)
    )


SQL_COLLOCATIONS_PMI = """
SELECT w1, w2, n_pair, pmi
FROM read_parquet('/tmp/ccray_oracle_pmi.parquet')
"""


def q_oov_census(sf_dir: str, vocab_k: int = 256):
    """Per-language out-of-vocabulary census against the corpus-global
    top-``vocab_k`` token vocabulary (ties at the cut broken on the
    token string) — the tokenizer-design metric that tells you which
    languages a fixed vocabulary underserves (the UNK-rate analysis
    every multilingual-tokenizer paper runs; cf. the fertility eval
    `q_bpe_fertility`). Output (lang, n_tokens, n_oov) — all-integer,
    so the REAL DuckDB oracle needs no rounding discipline.

    Scale shape: ONE text pass emits per-batch-preaggregated
    (lang, token, n) counts (A4 combiner; the wire is vocab x lang
    scale, never the token stream), materialized once (fan-out 2);
    the global vocabulary is a token-scale groupby + distributed
    two-key sort + LIMIT ``vocab_k`` whose 256 rows broadcast by
    closure into a stateless OOV map (the broadcast-small-side rule —
    no second exchange); per-language totals are one lang-scale
    groupby Sum."""
    import pyarrow.compute as pc

    def count_rows(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lang_rep = np.repeat(
            t.column("lang").to_numpy(zero_copy_only=False), lens
        )
        keep = flat != ""
        tok = flat[keep].astype("U")
        lang = lang_rep[keep].astype("U")
        fused = np.char.add(np.char.add(lang, " "), tok)
        u, c = np.unique(fused, return_counts=True)
        sp = np.char.partition(u, " ")
        return pa.table(
            {
                "lang": pa.array(sp[:, 0], pa.string()),
                "tok": pa.array(sp[:, 2], pa.string()),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    pairs = (
        _pq(sf_dir, "documents", ["lang", "text"], min_blocks=8)
        .map_batches(count_rows, batch_format="pyarrow")
        .materialize()
    )
    vocab_rows = (
        pairs.groupby("tok")
        .sum("n")
        .sort(["sum(n)", "tok"], descending=[True, False])
        .limit(vocab_k)
        .take_all()
    )
    vocab = np.array(sorted(r["tok"] for r in vocab_rows), dtype="U")

    def oov_map(t: pa.Table) -> pa.Table:
        tok = t.column("tok").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        inv = np.isin(tok.astype("U"), vocab)
        return pa.table(
            {
                "lang": t.column("lang"),
                "n_tokens": pa.array(n.astype(np.int64)),
                "n_oov": pa.array(np.where(inv, 0, n).astype(np.int64)),
            }
        )

    out = (
        pairs.map_batches(oov_map, batch_format="pyarrow")
        .groupby("lang")
        .sum(["n_tokens", "n_oov"])
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "lang": t.column("lang"),
                "n_tokens": t.column("sum(n_tokens)").cast(pa.int64()),
                "n_oov": t.column("sum(n_oov)").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_sq_recall(sf_dir: str, n_queries: int = 4, k: int = 10):
    """Recall@``k`` of int8 scalar-quantized embedding search against
    exact float cosine — the eval an embedding-compression rollout
    gates on (SQ cuts the vector store 4x/8x; faiss QT_8bit shape).
    Both sides rank with (score desc, vec_id asc); the quantized score
    is an exact int8xint8->int64 dot (functions/vec.sq_quantize_unit —
    NO float discipline on that side), the exact side is the standing
    round-6-before-rank cosine. Output (query_id, n_hits) all-integer.

    Scale shape: ONE scan scores BOTH sides (the slim (query_id,
    vec_id, sim, dot) table — 4 scalars/row, never the vectors — is
    materialized once for the two consumers, the BM25/fan-out rule);
    each side reduces via grouped_topk's pre-combined per-group top-k
    (exchange bounded by k x queries x blocks); overlap = ONE semi
    merge_join on the packed (query_id<<32 | vec_id) key + a
    query-scale groupby (the ann_recall discipline)."""
    import pyarrow.parquet as pq_mod
    from ray.data.aggregate import Count

    from ..functions.vec import list_to_matrix, sq_quantize_unit
    from ..stages.joins import merge_join
    from ..stages.rank import grouped_topk
    from .oracle_sketch import oracle_sq_recall_table

    oracle_sq_recall_table(sf_dir, n_queries=n_queries, k=k)
    t = pq_mod.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = t.column("vec_id").to_pylist()
    qmat = np.array(
        [
            t.column("embedding")[ids.index(qid)].as_py()
            for qid in range(n_queries)
        ],
        dtype=np.float64,
    )
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0] = 1.0
    qref = ray.put((qmat / qn[:, None], sq_quantize_unit(qmat).astype(np.int64)))

    def score(b: pa.Table) -> pa.Table:
        qunit, q8 = ray.get(qref)
        mat = list_to_matrix(b.column("embedding"))
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((mat @ qunit.T) / norms[:, None], 6)
        dots = sq_quantize_unit(mat).astype(np.int64) @ q8.T
        vid = b.column("vec_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        n, nq = sims.shape
        qid = np.tile(np.arange(nq, dtype=np.int64), n)
        vrep = np.repeat(vid, nq)
        keep = vrep != qid  # a query never scores itself
        return pa.table(
            {
                "query_id": pa.array(qid[keep]),
                "vec_id": pa.array(vrep[keep]),
                "sim": pa.array(sims.reshape(-1)[keep]),
                "dot": pa.array(dots.reshape(-1)[keep]),
            }
        )

    scored = (
        _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(score, batch_format="pyarrow")
        .materialize()
    )
    exact = grouped_topk(scored, "query_id", "sim", k, "vec_id")
    quant = grouped_topk(scored, "query_id", "dot", k, "vec_id")

    def packed(res):
        def keyf(b: pa.Table) -> pa.Table:
            q = b.column("query_id").to_numpy(zero_copy_only=False)
            v = b.column("vec_id").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "query_id": pa.array(q),
                    "pk": pa.array((q << np.int64(32)) | v),
                }
            )

        return res.map_batches(keyf, batch_format="pyarrow")

    hits = merge_join(
        packed(exact), packed(quant), left_on="pk", right_on="pk",
        right_cols=[], how="semi",
    )
    return hits.groupby("query_id").aggregate(Count(alias_name="n_hits"))


SQL_SQ_RECALL = """
SELECT query_id, n_hits
FROM read_parquet('/tmp/ccray_oracle_sq_recall.parquet')
"""


SQL_OOV_CENSUS = """
WITH toks AS (
  SELECT lang, t.tok
  FROM documents,
       LATERAL unnest(string_split_regex(text, '\\s+')) AS t(tok)
  WHERE t.tok <> ''
),
counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
vocab AS (SELECT tok FROM counts ORDER BY c DESC, tok LIMIT 256)
SELECT
  lang,
  COUNT(*) AS n_tokens,
  SUM(CASE WHEN toks.tok IN (SELECT tok FROM vocab) THEN 0 ELSE 1 END)::BIGINT
    AS n_oov
FROM toks
GROUP BY lang
"""


def q_bowtie_decomposition(sf_dir: str):
    """Bow-tie decomposition of the crawl's host graph (Broder et al.
    2000): every host labeled SCC / IN / OUT / OTHER relative to the
    hub pivot's strongly connected component — the classic web-census
    macrostructure. Shape: stages/pagerank.bowtie_decomposition (two
    reachability fixpoints on the int64 hash wire, one edge-scale
    semi merge_join per round, monotone reached-count fixpoint).
    Hash-checked against a sequential BFS oracle with the identical
    pivot rule."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import bowtie_decomposition, extract_host_edges_batch
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_bowtie_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_bowtie_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return bowtie_decomposition(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow")
    )


SQL_BOWTIE_DECOMPOSITION = """
SELECT host, bowtie
FROM read_parquet('/tmp/ccray_oracle_bowtie.parquet')
"""


def q_seed_distance(sf_dir: str):
    """Crawl-depth census: minimum link-hop distance from the crawl's
    seed host list to every host in the link graph (0 = seed, -1 =
    unreachable from any seed) — the frontier-depth curve that tells
    a crawl operator how many BFS rounds unlock how much of the web.
    Shape: stages/pagerank.seed_distance_hosts (layered multi-source
    BFS on the int64 hash wire: per layer ONE edge-scale semi
    merge_join + node-scale anti vs the reached set; empty frontier is
    the exact fixpoint). Hash-checked against a sequential BFS oracle
    from the identical seed list."""
    import os

    from ..sources.synth import (
        get_universe,
        pages_cache_dir,
        sf_from_dir,
        write_pages_parquet_ray,
    )
    from ..stages.pagerank import (
        _host_of,
        extract_host_edges_batch,
        seed_distance_hosts,
    )
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_seed_distance_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_seed_distance_table(sf_dir)
    seed_hosts = sorted(
        {h for h in (_host_of(u) for u in get_universe(sf).seed_urls()) if h}
    )
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return seed_distance_hosts(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow"),
        seed_hosts,
    )


SQL_SEED_DISTANCE = """
SELECT host, dist
FROM read_parquet('/tmp/ccray_oracle_seed_distance.parquet')
"""


def q_scc_hosts(sf_dir: str):
    """Full strongly-connected-component labeling of the crawl's host
    graph: every host tagged with its SCC's lexicographically smallest
    member and the component size — the exact decomposition the
    bow-tie census classifies against its pivot component, here for
    EVERY component (link rings, mirror clusters and isolated cliques
    all surface as their own labeled SCCs). Shape:
    stages/pagerank.scc_hosts — the distributed coloring algorithm
    (Orzan 2004): per outer peel one delta-propagated forward
    min-label fixpoint + one multi-source backward sweep, all on the
    int64 hash wire with explicit convergence caps. Hash-checked
    against a sequential iterative Tarjan oracle."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import extract_host_edges_batch, scc_hosts
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_scc_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_scc_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return scc_hosts(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow")
    )


SQL_SCC_HOSTS = """
SELECT host, scc, scc_size
FROM read_parquet('/tmp/ccray_oracle_scc.parquet')
"""


_TPL_W = 1  # template gram width (words); 1 = template vocabulary
_TPL_FRAC = 0.5  # a gram is template if it appears in >= this fraction of the host's pages
_TPL_MIN_PAGES = 3  # hosts with fewer pages get no template call
_TPL_PAGE_SENTINEL = np.int64(-(2**63))  # page-count rows on the gram wire


def q_host_template_grams(sf_dir: str, gram_w: int = _TPL_W):
    """Per-host boilerplate census: a word ``gram_w``-gram is a
    TEMPLATE gram of a host when it occurs in >= 50% of that host's
    pages (host must have >= 3 pages) — the repeated-across-pages
    chrome (nav bars, footers, legal blurbs) that boilerplate removal
    strips before training, detected at the host level where templates
    live. Output per host: page count, distinct grams, template grams,
    and the template ratio. Default ``gram_w=1`` is the template
    VOCABULARY (words shared by half the host's pages) — the synthetic
    corpus shuffles word order per page, so longer grams never recur
    and wider widths are exercised by the unit tests instead.

    Scale shape: ONE corpus-scale exchange — per-batch kernel emits
    per-doc-distinct (host, gram_fp, 1) rows pre-aggregated within the
    batch (the A4 combiner discipline) with grams as int64
    fingerprints (functions/minhash.gram_fp_rows — never gram strings,
    VERDICT r4 #1 discipline), plus one sentinel row per page riding
    the same wire so host page counts need no second pass over text;
    groupby(host, g) folds document frequencies; the per-host pages
    table that thresholds them is node-scale (one merge_join), and the
    final fold is a host-keyed groupby of constant-width int rows.
    Hash-checked against a sequential per-host dict fold applying the
    identical gram kernel and thresholds."""
    import os

    import pyarrow.compute as pc

    from ..functions.minhash import gram_fp_rows
    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.joins import merge_join
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_host_template_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_host_template_table(sf_dir)

    def gram_rows(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "host": pa.array([], pa.string()),
                "g": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        hosts = np.asarray(t.column("host").to_pylist(), dtype=object)
        d_idx, _pos, gfp = gram_fp_rows(toks, gram_w)
        if len(d_idx):
            order = np.lexsort((gfp, d_idx))
            dd, gg = d_idx[order], gfp[order]
            keep = np.r_[True, (dd[1:] != dd[:-1]) | (gg[1:] != gg[:-1])]
            dd, gg = dd[keep], gg[keep]
        else:
            dd = np.empty(0, np.int64)
            gg = np.empty(0, np.int64)
        sent_d = np.arange(len(t), dtype=np.int64)
        all_d = np.concatenate([dd.astype(np.int64), sent_d])
        all_g = np.concatenate(
            [gg.astype(np.int64), np.full(len(t), _TPL_PAGE_SENTINEL, np.int64)]
        )
        h = hosts[all_d]
        order = np.lexsort((all_g, h))
        hs, gs = h[order], all_g[order]
        starts = np.flatnonzero(
            np.r_[True, (hs[1:] != hs[:-1]) | (gs[1:] != gs[:-1])]
        )
        cnt = np.diff(np.r_[starts, len(hs)]).astype(np.int64)
        return pa.table(
            {
                "host": pa.array(hs[starts].tolist(), pa.string()),
                "g": pa.array(gs[starts]),
                "df": pa.array(cnt),
            }
        )

    agg = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["host", "text"]), batch_format="pyarrow"
        )
        .map_batches(gram_rows, batch_format="pyarrow")
        .groupby(["host", "g"])
        .sum("df")
        .map_batches(
            lambda t: pa.table(
                {
                    "host": t.column("host"),
                    "g": t.column("g"),
                    "df": t.column("sum(df)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    pages_tbl = agg.map_batches(
        lambda t: (
            lambda f: pa.table({"host": f.column("host"), "pages": f.column("df")})
        )(t.filter(pc.equal(t.column("g"), pa.scalar(int(_TPL_PAGE_SENTINEL), pa.int64())))),
        batch_format="pyarrow",
    ).materialize()
    grams = agg.map_batches(
        lambda t: t.filter(
            pc.not_equal(t.column("g"), pa.scalar(int(_TPL_PAGE_SENTINEL), pa.int64()))
        ),
        batch_format="pyarrow",
    )

    def indicator(t: pa.Table) -> pa.Table:
        df = t.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        pages = t.column("pages").to_numpy(zero_copy_only=False).astype(np.int64)
        thr = np.ceil(_TPL_FRAC * pages).astype(np.int64)
        is_tpl = ((pages >= _TPL_MIN_PAGES) & (df >= thr)).astype(np.int64)
        return pa.table(
            {
                "host": t.column("host"),
                "pages": pa.array(pages),
                "one": pa.array(np.ones(len(t), np.int64)),
                "is_tpl": pa.array(is_tpl),
            }
        )

    out = (
        merge_join(grams, pages_tbl, "host", "host", ["pages"])
        .map_batches(indicator, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Max("pages", alias_name="pages"),
            Sum("one", alias_name="n_grams"),
            Sum("is_tpl", alias_name="n_template"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n_grams").to_numpy(zero_copy_only=False).astype(np.int64)
        tpl = t.column("n_template").to_numpy(zero_copy_only=False).astype(np.int64)
        ratio = np.round(tpl / np.maximum(n, 1), 6)
        return pa.table(
            {
                "host": t.column("host"),
                "pages": t.column("pages").cast(pa.int64()),
                "n_grams": pa.array(n),
                "n_template": pa.array(tpl),
                "template_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


SQL_HOST_TEMPLATE_GRAMS = """
SELECT host, pages, n_grams, n_template, template_ratio
FROM read_parquet('/tmp/ccray_oracle_host_template.parquet')
"""


def q_salsa_hosts(sf_dir: str):
    """SALSA hub/authority ranking (Lempel & Moran 2001) over the
    crawl's host graph — HITS with random-walk degree normalization,
    the variant resistant to tightly-knit-community score capture.
    Ten fixed power-iteration steps from the uniform authority
    distribution, 6-decimal rounding. Shape:
    stages/pagerank.salsa_hosts (two edge-scale merge_join exchanges
    per iteration + node-scale degree joins, degree tables built
    once). Hash-checked against a sequential numpy power-iteration
    oracle applying the identical updates."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import salsa_hosts
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_salsa_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_salsa_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return salsa_hosts(parsed)


SQL_SALSA_HOSTS = """
SELECT host, salsa_authority, salsa_hub
FROM read_parquet('/tmp/ccray_oracle_salsa.parquet')
"""


def q_opic_hosts(sf_dir: str):
    """OPIC adaptive page importance (Abiteboul, Preda & Cobena, WWW
    2003) over the crawl's host graph — the classic crawl-frontier
    importance estimator: cash splits over out-links plus the virtual
    page each round, history accumulates, importance = normalized
    history. Ten synchronous rounds, 6-decimal rounding. Shape:
    stages/pagerank.opic_edges (one edge-scale merge_join exchange +
    groupby Sum per round over a bounded node-scale state table; only
    the virtual page's scalar mass touches the driver). Hash-checked
    against a sequential numpy oracle applying identical updates."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import opic_hosts
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_opic_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_opic_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return opic_hosts(parsed)


SQL_OPIC_HOSTS = """
SELECT host, opic
FROM read_parquet('/tmp/ccray_oracle_opic.parquet')
"""


def q_host_rank(sf_dir: str):
    """Host-rank export — the artifact Common Crawl itself publishes
    from its cc-webgraph project: every host scored AND globally
    ranked by PageRank and by harmonic centrality, in one table.
    Composes the two verified iterative stages over ONE materialized
    distinct edge table (fan-out >= 2 => materialize, the bm25
    discipline), joins node-scale score tables with a single merge
    per side, then assigns global row_number ranks via
    stages/rank.global_sorted_rank — a two-pass block-offset scheme
    whose driver traffic is O(num_blocks) summary rows, never the
    table (no whole-corpus-in-one-block rank). Hash-checked against
    row_number windows over the two stages' verified oracle tables."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.joins import merge_join
    from ..stages.pagerank import (
        extract_host_edges_batch,
        hyperball_harmonic,
        pagerank_edges,
    )
    from ..stages.parse_extract import parse_extract_batch
    from ..stages.rank import global_sorted_rank
    from .oracle_sketch import oracle_hyperball_table, oracle_pagerank_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_pagerank_table(sf_dir)
    oracle_hyperball_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    edges = parsed.map_batches(
        extract_host_edges_batch, batch_format="pyarrow"
    ).materialize()
    pr = pagerank_edges(edges)
    hc = hyperball_harmonic(edges)
    joined = merge_join(pr, hc, "host", "host", ["harmonic"], how="inner")

    def add_negs(t: pa.Table) -> pa.Table:
        prv = t.column("pr").to_numpy(zero_copy_only=False)
        hcv = t.column("harmonic").to_numpy(zero_copy_only=False)
        return t.append_column("_npr", pa.array(-prv, pa.float64())).append_column(
            "_nhc", pa.array(-hcv, pa.float64())
        )

    ranked = global_sorted_rank(
        joined.map_batches(add_negs, batch_format="pyarrow"),
        ["_npr", "host"],
        "pr_rank",
    )
    ranked = global_sorted_rank(ranked, ["_nhc", "host"], "harmonic_rank")
    return ranked.map_batches(
        lambda t: t.select(["host", "pr", "harmonic", "pr_rank", "harmonic_rank"]),
        batch_format="pyarrow",
    )


SQL_HOST_RANK = """
SELECT p.host, p.pr, h.harmonic,
       CAST(row_number() OVER (ORDER BY p.pr DESC, p.host) AS BIGINT) AS pr_rank,
       CAST(row_number() OVER (ORDER BY h.harmonic DESC, p.host) AS BIGINT)
           AS harmonic_rank
FROM read_parquet('/tmp/ccray_oracle_pagerank.parquet') p
JOIN read_parquet('/tmp/ccray_oracle_hyperball.parquet') h USING (host)
"""


def q_clustering_coefficients(sf_dir: str):
    """Per-host local clustering coefficient (Watts & Strogatz 1998)
    over the crawl's link graph viewed undirected: connected
    neighbor-pair fraction — dense link cliques score near 1, the
    hub-periphery web near 0. Shape:
    stages/pagerank.clustering_coefficients (per-apex wedge emission
    with the max-degree cap, ONE semi merge_join closure, node-scale
    degree join). REAL SQL oracle: DuckDB self-joins over the shared
    host-edges parquet computing the identical tri/deg integers and
    the same fixed double expression."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import clustering_coefficients, extract_host_edges_batch
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_host_edges_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_host_edges_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return clustering_coefficients(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow")
    )


SQL_CLUSTERING_COEFFICIENTS = """
WITH raw AS (
  SELECT DISTINCT src AS s, dst AS d
  FROM read_parquet('/tmp/ccray_oracle_host_edges.parquet')
  WHERE src <> dst
), und AS (
  SELECT DISTINCT LEAST(s, d) AS u, GREATEST(s, d) AS v FROM raw
), adj AS (
  SELECT u AS a, v AS b FROM und UNION ALL SELECT v AS a, u AS b FROM und
), deg AS (
  SELECT a AS host, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY a
), tri AS (
  SELECT x.a AS host, CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM adj x
  JOIN adj y ON x.a = y.a AND x.b < y.b
  JOIN und e ON e.u = x.b AND e.v = y.b
  GROUP BY x.a
)
SELECT deg.host, deg.deg,
       COALESCE(tri.n_tri, 0) AS n_tri,
       ROUND(CASE WHEN deg.deg >= 2
                  THEN 2.0 * COALESCE(tri.n_tri, 0) / (deg.deg * (deg.deg - 1))
                  ELSE 0.0 END, 6) AS clustering
FROM deg LEFT JOIN tri ON deg.host = tri.host
"""


def q_degree_assortativity(sf_dir: str):
    """Degree assortativity of the host link graph (Newman 2002,
    "Assortative mixing in networks"): Pearson correlation of
    (out-degree of source, in-degree of target) over the distinct
    non-self edge set. The web graph is famously DISassortative
    (hubs link to the periphery, r < 0); a strongly positive r in a
    crawl slice flags link-farm rings linking hub-to-hub.

    Shape: ONE distinct-edge build (materialized), two node-scale
    degree groupbys merge_joined back onto edge-scale rows, then
    exact int64 partial sums (n, Sx, Sy, Sxy, Sxx, Syy) reduced to a
    single row — the correlation is one fixed float expression over
    exact integers, so the REAL SQL oracle (same integer sums in
    DuckDB over the shared edge parquet) matches to the last bit
    before the 6 dp round."""
    import os

    import pyarrow.compute as pc

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.joins import merge_join
    from ..stages.pagerank import _distinct_sorted, extract_host_edges_batch
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_host_edges_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_host_edges_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    edges = (
        _distinct_sorted(
            parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow"),
            ["src", "dst"],
        )
        .map_batches(
            lambda t: t.filter(pc.not_equal(t.column("src"), t.column("dst"))),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def deg_of(col, name):
        return (
            edges.groupby(col)
            .count()
            .map_batches(
                lambda t, _c=col, _n=name: pa.table(
                    {
                        "h": t.column(_c),
                        _n: t.column("count()").cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        )

    with_out = merge_join(edges, deg_of("src", "outd"), "src", "h", ["outd"])
    with_both = merge_join(with_out, deg_of("dst", "ind"), "dst", "h", ["ind"])

    def partials(t: pa.Table) -> pa.Table:
        x = t.column("outd").to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column("ind").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        import math

        n = int(pa.compute.sum(t.column("n")).as_py())
        sx = int(pa.compute.sum(t.column("sx")).as_py())
        sy = int(pa.compute.sum(t.column("sy")).as_py())
        sxy = int(pa.compute.sum(t.column("sxy")).as_py())
        sxx = int(pa.compute.sum(t.column("sxx")).as_py())
        syy = int(pa.compute.sum(t.column("syy")).as_py())
        num = float(n * sxy - sx * sy)
        den = math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy))
        r = round(num / den, 6) if den > 0 else 0.0
        return pa.table(
            {
                "n_edges": pa.array([n], pa.int64()),
                "assortativity": pa.array([r], pa.float64()),
            }
        )

    return (
        with_both.map_batches(partials, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


SQL_DEGREE_ASSORTATIVITY = """
WITH e AS (
  SELECT DISTINCT src, dst
  FROM read_parquet('/tmp/ccray_oracle_host_edges.parquet')
  WHERE src <> dst
), od AS (
  SELECT src AS h, CAST(COUNT(*) AS BIGINT) AS outd FROM e GROUP BY src
), ind AS (
  SELECT dst AS h, CAST(COUNT(*) AS BIGINT) AS ind FROM e GROUP BY dst
), j AS (
  SELECT od.outd AS x, ind.ind AS y
  FROM e JOIN od ON e.src = od.h JOIN ind ON e.dst = ind.h
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*y) AS BIGINT) AS sxy,
         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy
  FROM j
)
SELECT n AS n_edges,
       ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
             / SQRT(CAST(n*sxx - sx*sx AS DOUBLE)
                    * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS assortativity
FROM s
"""


def q_hyperball_harmonic(sf_dir: str):
    """HyperBall harmonic centrality over the crawl's host graph
    (Boldi & Vigna 2013 — the algorithm that ranked the full
    hundred-billion-node web graph): per host, the harmonic
    centrality estimated by iterated HLL ball counters, plus the
    final in-ball size (hosts that can reach it).

    Shape: stages/pagerank.py hyperball_harmonic — int64 hash wire,
    one edge-scale register ship + sort(node) max-fold + node-scale
    accumulator join per round, integer-monotone register sum as the
    fixpoint test. Hash-checked against a sequential dense-matrix
    HyperBall sharing only the pure hash/estimate kernels (identical
    float trajectories by construction)."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import extract_host_edges_batch, hyperball_harmonic
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_hyperball_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_hyperball_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return hyperball_harmonic(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow")
    )


SQL_HYPERBALL_HARMONIC = """
SELECT host, harmonic, reach_in
FROM read_parquet('/tmp/ccray_oracle_hyperball.parquet')
"""


def q_distance_distribution(sf_dir: str):
    """HyperANF distance distribution of the host graph (Boldi, Rosa
    & Vigna 2011): per BFS radius t, the estimated number of (u, v)
    pairs within distance t and its fraction of the final reachable
    count — the effective diameter is the first t with frac >= 0.9.

    Shape: the hyperball_harmonic loop with per-round global sums
    collected in exact rint(est*1e6) integer units (order-free, so
    the sequential dense-matrix oracle reproduces every row
    bit-for-bit). One edge-scale exchange per round, output is
    rounds-scale (a handful of rows)."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import (
        extract_host_edges_batch,
        hyperanf_distance_distribution,
    )
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_hyperanf_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_hyperanf_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return hyperanf_distance_distribution(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow")
    )


SQL_DISTANCE_DISTRIBUTION = """
SELECT t, nreach, frac
FROM read_parquet('/tmp/ccray_oracle_hyperanf.parquet')
"""


def q_ip_colocation(sf_dir: str):
    """IP-colocation census: every host in the crawl's link graph
    resolved to IPv4 (the deterministic fingerprint resolver model
    the DNS cache pool serves — state/dns.py), with the number of
    hosts sharing that IP. Heavy co-hosting is the classic spam-farm
    aggregation signal (Fetterly, Manasse & Najork 2004).

    Shape: stages/pagerank.py ip_colocation_stats — node-scale only:
    distinct host table, one vectorized fp64 resolve pass, a
    groupby(ip) count joined back with ONE merge_join. Hash-checked
    against a sequential Counter fold over the identical host
    universe."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import extract_host_edges_batch, ip_colocation_stats
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_ip_colocation_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_ip_colocation_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return ip_colocation_stats(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow")
    )


SQL_IP_COLOCATION = """
SELECT host, ip, n_shared
FROM read_parquet('/tmp/ccray_oracle_ip_coloc.parquet')
"""


def q_zipf_fit(sf_dir: str):
    """Zipf's-law fit over the corpus token frequency distribution:
    least-squares slope of log(frequency) on log(rank) over the top-256
    tokens — freq ~ rank^(-alpha) with alpha ~ 1 for natural language
    (Zipf 1949; Piantadosi 2014 review). A corpus whose alpha drifts
    far from ~1 is a template/boilerplate red flag, so this is a cheap
    corpus-health gauge for training-data pipelines.

    Shape: per-batch vectorized token-count partials (np.unique over
    the whitespace split — the pre-shuffle combiner rule), ONE
    vocab-scale groupby(token) sum, a vocab-scale sort to the top-256
    (count desc, token asc — deterministic ties), then the regression
    over 256 rows in a single final block. The only all-to-alls touch
    vocab-scale rows, never the corpus. REAL SQL oracle: DuckDB
    regr_slope/regr_intercept over the identically-ranked top-256
    (both sides round to 6 dp; the regression inputs are exact
    integer counts and exact ranks, so ulp drift is ~1e-15 against a
    1e-6 grid)."""
    import pyarrow.compute as pc

    K = 256

    def count_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        flat = flat[flat != ""]
        u, c = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "token": pa.array(u, pa.string()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    counts = (
        _pq(sf_dir, "documents", ["text"], min_blocks=8)
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("token")
        .sum("n")
        .map_batches(
            lambda t: pa.table(
                {
                    "token": t.column("token"),
                    "n": t.column("sum(n)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    top = counts.sort(["n", "token"], descending=[True, False]).limit(K)

    def fit(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        tok = t.column("token").to_numpy(zero_copy_only=False)
        # re-derive rank in-block (count desc, token asc) rather than
        # trusting block concatenation order end-to-end
        n = n[np.lexsort((tok, -n))]
        r = np.arange(1, len(n) + 1, dtype=np.float64)
        x, y = np.log(r), np.log(n)
        xc, yc = x - x.mean(), y - y.mean()
        slope = float((xc * yc).sum() / (xc * xc).sum())
        intercept = float(y.mean() - slope * x.mean())
        return pa.table(
            {
                "k": pa.array([len(n)], pa.int64()),
                "alpha": pa.array([round(-slope, 6)], pa.float64()),
                "intercept": pa.array([round(intercept, 6)], pa.float64()),
            }
        )

    return top.repartition(1).map_batches(
        fit, batch_format="pyarrow", batch_size=None
    )


SQL_ZIPF_FIT = r"""
WITH toks AS (
  SELECT UNNEST(regexp_split_to_array(text, '\s+')) AS token FROM documents
), cnt AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n
  FROM toks WHERE token <> '' GROUP BY token
), top AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, token) AS r
  FROM cnt ORDER BY n DESC, token LIMIT 256
)
SELECT CAST(COUNT(*) AS BIGINT) AS k,
       ROUND(-regr_slope(ln(n), ln(r)), 6) AS alpha,
       ROUND(regr_intercept(ln(n), ln(r)), 6) AS intercept
FROM top
"""


def q_lpa_communities(sf_dir: str):
    """Host communities via synchronous label propagation
    (stages/components.py label_propagation — Raghavan et al. 2007
    with the deterministic min-label tie-break) over the crawl's
    undirected host graph: 5 fixed rounds, each moving the
    materialized distinct neighbor table exactly once through the
    union+sort merge_join, then a (node,label) groupby count and a
    sort(node) co-partitioned block-local argmax. Hash-checked
    against a sequential Counter-fold oracle with identical
    semantics."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.components import label_propagation
    from ..stages.pagerank import extract_host_edges_batch
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_lpa_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_lpa_table(sf_dir)
    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
    )
    return label_propagation(
        parsed.map_batches(extract_host_edges_batch, batch_format="pyarrow"),
        iters=5,
    )


SQL_LPA_COMMUNITIES = """
SELECT host, community
FROM read_parquet('/tmp/ccray_oracle_lpa.parquet')
"""


def q_crawl_trap_hosts(sf_dir: str):
    """Crawler-trap detection: flag hosts whose URL space explodes
    over duplicate content (calendar pages, session-id mazes — the
    classic unbounded-URL trap a frontier must throttle; Heydon &
    Najork's Mercator §3.2 describes the failure mode). Signal =
    URLs-per-distinct-payload ratio; a host serving >= 2 URLs per
    distinct digest is a trap. Runs over a shared deterministic shard
    with SIMULATED ?cal= traps on every 4th host
    (oracle_sketch.trap_universe_rows). Hash-checked against the
    sequential dict-fold oracle.

    Scale shape: captures reduce to slim (host, digest) rows in the
    first map; distinct (host, digest) is ONE groupby exchange whose
    output is content-scale, the host rollup is a second host-scale
    groupby (Sum of pair counts = n_urls, Count = n_distinct) — the
    raw pages never ride an exchange and no per-host group needs one
    block."""
    import hashlib

    from ..stages.pagerank import _host_of
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_crawl_trap_table, trap_universe_rows

    oracle_crawl_trap_table()
    rows = list(trap_universe_rows())
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("ms")),
            "html": pa.array([r[2] for r in rows], pa.binary()),
        }
    )

    def host_digest(b: pa.Table) -> pa.Table:
        htmls = b.column("html").to_pylist()
        parsed = parse_extract_batch(b)
        hosts, digests = [], []
        for cu, raw in zip(parsed.column("canon_url").to_pylist(), htmls):
            h = _host_of(cu) if cu else None
            if not h:
                continue
            hosts.append(h)
            digests.append(hashlib.md5(raw or b"").hexdigest())
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "digest": pa.array(digests, pa.string()),
            }
        )

    pairs = (
        rd.from_arrow(t)
        .repartition(4)
        .map_batches(host_digest, batch_format="pyarrow")
        .groupby(["host", "digest"])
        .count()  # distinct (host, digest) + URL multiplicity per pair
    )
    agg = pairs.groupby("host").aggregate(
        Sum("count()", alias_name="n_urls"),
        Count(alias_name="n_distinct"),
    )

    def finalize(b: pa.Table) -> pa.Table:
        u = b.column("n_urls").to_numpy(zero_copy_only=False).astype(np.float64)
        d = b.column("n_distinct").to_numpy(zero_copy_only=False).astype(np.float64)
        ratio = np.round(u / d, 6)
        return pa.table(
            {
                "host": b.column("host"),
                "n_urls": b.column("n_urls").cast(pa.int64()),
                "n_distinct": b.column("n_distinct").cast(pa.int64()),
                "dup_ratio": pa.array(ratio, pa.float64()),
                "is_trap": pa.array(ratio >= 2.0),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_mirror_hosts(
    sf_dir: str,
    min_shared: int = 2,
    jaccard_threshold: float = 0.5,
    max_hosts_per_digest: int = 64,
):
    """Mirror-site detection (Bharat & Broder, "Mirror, mirror on the
    web", WWW 1999): host pairs whose payload-digest sets overlap —
    ``m-<host>`` twins in the shared simulated shard serve
    byte-identical copies of 15/20 pages (set-Jaccard 0.75). A crawl
    engine dedups mirrors at the HOST level so the frontier skips the
    whole replica, not page by page.

    Scale shape: captures reduce to slim distinct (host, digest) rows
    (ONE groupby); digests owned by more than
    ``max_hosts_per_digest`` hosts are dropped BEFORE pair generation
    (driver-printed count — the no-silent-caps convention; a
    boilerplate asset shared by 10^5 hosts would otherwise explode
    the self-join quadratically); the pair table is ONE sort-merge
    self-join on digest with a vectorized in-block cross product,
    rolled up by a (host_a, host_b) groupby; per-host set sizes
    attach via two node-scale merge_joins. Hash-checked against the
    sequential set-fold oracle with the identical cap."""
    import hashlib

    import pyarrow.compute as pc

    from ..stages.joins import merge_join
    from ..stages.pagerank import _host_of
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import mirror_universe_rows, oracle_mirror_table

    oracle_mirror_table(
        min_shared=min_shared,
        jaccard_threshold=jaccard_threshold,
        max_hosts_per_digest=max_hosts_per_digest,
    )
    rows = list(mirror_universe_rows())
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("ms")),
            "html": pa.array([r[2] for r in rows], pa.binary()),
        }
    )

    def host_digest(b: pa.Table) -> pa.Table:
        htmls = b.column("html").to_pylist()
        parsed = parse_extract_batch(b)
        hosts, digests = [], []
        for cu, raw in zip(parsed.column("canon_url").to_pylist(), htmls):
            h = _host_of(cu) if cu else None
            if not h:
                continue
            hosts.append(h)
            digests.append(hashlib.md5(raw or b"").hexdigest())
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "digest": pa.array(digests, pa.string()),
            }
        )

    hd = (
        rd.from_arrow(t)
        .repartition(4)
        .map_batches(host_digest, batch_format="pyarrow")
        .groupby(["host", "digest"])
        .count()
        .map_batches(
            lambda b: b.select(["host", "digest"]), batch_format="pyarrow"
        )
    )
    hot = (
        hd.groupby("digest")
        .count()
        .map_batches(
            lambda b: b.filter(
                pc.greater(b.column("count()"), max_hosts_per_digest)
            ).select(["digest"]),
            batch_format="pyarrow",
        )
    )
    n_hot = hot.count()
    if n_hot:
        print(
            f"[mirror_hosts] dropped {n_hot} digests shared by more than "
            f"{max_hosts_per_digest} hosts before pair generation"
        )
    hd = merge_join(hd, hot, "digest", "digest", [], how="anti").materialize()

    sizes = hd.groupby("host").count()

    def size_col(name):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "host": b.column("host"),
                    name: b.column("count()").cast(pa.int64()),
                }
            )

        return f

    pairs = (
        merge_join(
            hd,
            hd.map_batches(
                lambda b: pa.table(
                    {"digest": b.column("digest"), "host_b": b.column("host")}
                ),
                batch_format="pyarrow",
            ),
            "digest",
            "digest",
            ["host_b"],
            how="inner",
        )
        .map_batches(
            lambda b: b.filter(pc.less(b.column("host"), b.column("host_b"))),
            batch_format="pyarrow",
        )
        .groupby(["host", "host_b"])
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "host_a": b.column("host"),
                    "host_b": b.column("host_b"),
                    "n_shared": b.column("count()").cast(pa.int64()),
                }
            ).filter(pc.greater_equal(b.column("count()"), min_shared)),
            batch_format="pyarrow",
        )
    )
    pairs = merge_join(
        pairs,
        sizes.map_batches(size_col("n_a"), batch_format="pyarrow"),
        "host_a",
        "host",
        ["n_a"],
        how="inner",
    )
    pairs = merge_join(
        pairs,
        sizes.map_batches(size_col("n_b"), batch_format="pyarrow"),
        "host_b",
        "host",
        ["n_b"],
        how="inner",
    )

    def finalize(b: pa.Table) -> pa.Table:
        sh = b.column("n_shared").to_numpy(zero_copy_only=False).astype(np.float64)
        na = b.column("n_a").to_numpy(zero_copy_only=False).astype(np.float64)
        nb = b.column("n_b").to_numpy(zero_copy_only=False).astype(np.float64)
        jac = np.round(sh / (na + nb - sh), 6)
        return pa.table(
            {
                "host_a": b.column("host_a"),
                "host_b": b.column("host_b"),
                "n_shared": b.column("n_shared"),
                "n_a": b.column("n_a"),
                "n_b": b.column("n_b"),
                "jaccard": pa.array(jac, pa.float64()),
                "is_mirror": pa.array(jac >= jaccard_threshold),
            }
        )

    return pairs.map_batches(finalize, batch_format="pyarrow")


SQL_MIRROR_HOSTS = """
SELECT host_a, host_b, n_shared, n_a, n_b, jaccard, is_mirror
FROM read_parquet('/tmp/ccray_oracle_mirror.parquet')
"""


SQL_CRAWL_TRAP_HOSTS = """
SELECT host, n_urls, n_distinct, dup_ratio, is_trap
FROM read_parquet('/tmp/ccray_oracle_crawl_trap.parquet')
"""


def q_parse_extract(sf_dir: str):
    """The flagship parse/extract pipeline over the engine's own pages
    universe at a matching scale (input_hint shape). Hash-checked
    against the single-process application of the same kernel
    (oracle_sketch.oracle_parse_extract_table — proves the distributed
    plan loses/duplicates/perturbs no row); byte-parity of the kernel
    itself is asserted in tests/test_parse_stage.py."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from .oracle_sketch import _parse_projection, oracle_parse_extract_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_parse_extract_table(sf_dir)
    from ..stages.parse_extract import parse_extract_batch

    ds = rd.read_parquet(path, columns=["url", "warc_ts", "html"])
    return ds.map_batches(
        parse_extract_batch, batch_format="pyarrow", batch_size=None
    ).map_batches(_parse_projection, batch_format="pyarrow")


# the exact deterministic column set the oracle crawler reproduces
# row-for-row (priority excluded: float, not part of the parity set)
_CRAWL_LOG_COLS = [
    "epoch",
    "seq",
    "url_fp",
    "host_fp",
    "canon_url",
    "action",
    "http_status",
    "depth",
]
_CRAWL_ORACLE_PATH = "/tmp/ccray_oracle_crawl_log.parquet"


def _crawl_cfg():
    from .common import CrawlConfig

    return CrawlConfig(sf=0.001, seed=42, max_epochs=2, num_seen_partitions=8)


def ensure_crawl_oracle_table(path: str = _CRAWL_ORACLE_PATH) -> str:
    """Materialize the single-process oracle crawler's fetch log as a
    parquet file DuckDB's ``read_parquet`` can see, so crawl_log /
    crawl_host_stats get a true value-hash oracle instead of a
    rows-only check (VERDICT r2 #10). Called from
    ``__ray_entry__.oracle_sql()`` (and idempotently from the crawl
    queries) so the file exists whichever side the driver runs first.
    Pure Python — no Ray session involved (~0.2 s at sf0.001)."""
    import os
    import tempfile

    import pyarrow.parquet as pqm

    from .oracle import oracle_crawl

    res = oracle_crawl(_crawl_cfg())
    t = pa.table(
        {
            c: pa.array(
                [r[c] for r in res.log],
                pa.string() if c in ("canon_url", "action") else pa.int64(),
            )
            for c in _CRAWL_LOG_COLS
        }
    )
    fd, tmp = tempfile.mkstemp(suffix=".parquet", dir=os.path.dirname(path))
    os.close(fd)
    pqm.write_table(t, tmp)
    os.replace(tmp, path)  # atomic: readers never see a partial file
    return path


_CRAWL_DELAY_ORACLE_PATH = "/tmp/ccray_oracle_crawl_delay_log.parquet"


def _crawl_delay_cfg():
    from ..state.politeness import PolitenessPolicy
    from .common import CrawlConfig

    return CrawlConfig(
        sf=0.001,
        seed=42,
        max_epochs=2,
        num_seen_partitions=8,
        policy=PolitenessPolicy(burst=4, refill=4, epoch_seconds=3.0),
    )


def ensure_crawl_delay_oracle_table(path: str = _CRAWL_DELAY_ORACLE_PATH) -> str:
    """Oracle log for the Crawl-delay-honoring crawl (same protocol as
    ensure_crawl_oracle_table, with policy.epoch_seconds set so
    delay-declaring hosts are budget-capped on both sides)."""
    import os
    import tempfile

    import pyarrow.parquet as pqm

    from .oracle import oracle_crawl

    res = oracle_crawl(_crawl_delay_cfg())
    t = pa.table(
        {
            c: pa.array(
                [r[c] for r in res.log],
                pa.string() if c in ("canon_url", "action") else pa.int64(),
            )
            for c in _CRAWL_LOG_COLS
        }
    )
    fd, tmp = tempfile.mkstemp(suffix=".parquet", dir=os.path.dirname(path))
    os.close(fd)
    pqm.write_table(t, tmp)
    os.replace(tmp, path)
    return path


def q_crawl_delay_log(sf_dir: str):
    """The Crawl-delay-honoring crawl (RFC 9309's de-facto rate
    extension wired into the politeness budget): same engine run as
    crawl_log but with ``PolitenessPolicy.epoch_seconds`` set, so each
    host declaring ``Crawl-delay: d`` (the deterministic sim model —
    state/robots.delay_from_fp; the http robots plane parses the same
    directive from real robots.txt bodies) is capped at
    max(1, floor(epoch_seconds/d)) fetches per epoch in BOTH the skew
    combiner and the sort-block select. Hash-checked row-for-row
    against the sequential oracle crawler under the same policy."""
    import tempfile

    from .crawl import crawl

    ensure_crawl_delay_oracle_table()
    with tempfile.TemporaryDirectory(prefix="cc_ray_crawl_cd_") as ckpt:
        res = crawl(_crawl_delay_cfg(), ckpt)
        return res.log_table().select(_CRAWL_LOG_COLS)


SQL_CRAWL_DELAY_LOG = f"""
SELECT epoch, seq, url_fp, host_fp, canon_url, action, http_status, depth
FROM read_parquet('{_CRAWL_DELAY_ORACLE_PATH}')
"""


_RECRAWL_ORACLE_PATH = "/tmp/ccray_oracle_recrawl_log.parquet"


def _recrawl_cfgs():
    from .common import CrawlConfig

    base = dict(sf=0.001, seed=42, max_epochs=2, num_seen_partitions=8)
    return CrawlConfig(**base), CrawlConfig(**base, snapshot=1)


def ensure_recrawl_oracle_table(path: str = _RECRAWL_ORACLE_PATH) -> str:
    """Oracle log of the snapshot-1 RECRAWL: the sequential crawler
    runs snapshot 0, keeps its (url_fp -> digest) map, then reruns at
    snapshot 1 with revisit detection — same two-run chain the engine
    query executes."""
    import os
    import tempfile

    import pyarrow.parquet as pqm

    from .oracle import oracle_crawl

    cfg0, cfg1 = _recrawl_cfgs()
    o0 = oracle_crawl(cfg0)
    o1 = oracle_crawl(cfg1, revisit_digests=o0.digests)
    t = pa.table(
        {
            c: pa.array(
                [r[c] for r in o1.log],
                pa.string() if c in ("canon_url", "action") else pa.int64(),
            )
            for c in _CRAWL_LOG_COLS
        }
    )
    fd, tmp = tempfile.mkstemp(suffix=".parquet", dir=os.path.dirname(path))
    os.close(fd)
    pqm.write_table(t, tmp)
    os.replace(tmp, path)
    return path


def q_recrawl_revisit_log(sf_dir: str):
    """Incremental recrawl with WARC-revisit semantics — the monthly
    Common-Crawl-snapshot pattern: crawl the snapshot-0 universe, then
    recrawl snapshot 1 (deterministic churn model,
    sources/synth.Universe.content_version) seeded with the first
    run's (url_fp, digest64, ts_ms) side-writes, loaded into the
    fp-range-partitioned DigestStorePool (state/digests.py — URL-seen
    routing, batched RPC lookups, never a driver-side broadcast).
    Re-fetched pages whose payload sha1 is unchanged log as
    ``revisit_unchanged`` (and, with archiving on, write WARC 1.0
    §6.7.2 identical-payload-digest revisit records instead of
    re-storing bytes). Returns the recrawl's full ordered log,
    hash-checked row-for-row vs the sequential two-run oracle."""
    import shutil
    import tempfile

    from .crawl import crawl

    ensure_recrawl_oracle_table()
    cfg0, cfg1 = _recrawl_cfgs()
    ck0 = tempfile.mkdtemp(prefix="cc_ray_recrawl0_")
    ck1 = tempfile.mkdtemp(prefix="cc_ray_recrawl1_")
    try:
        crawl(cfg0, ck0)
        from dataclasses import replace

        res = crawl(replace(cfg1, revisit_from=ck0), ck1)
        return res.log_table().select(_CRAWL_LOG_COLS)
    finally:
        shutil.rmtree(ck0, ignore_errors=True)
        shutil.rmtree(ck1, ignore_errors=True)


SQL_RECRAWL_REVISIT_LOG = f"""
SELECT epoch, seq, url_fp, host_fp, canon_url, action, http_status, depth
FROM read_parquet('{_RECRAWL_ORACLE_PATH}')
"""


SQL_CRAWL_LOG = f"""
SELECT epoch, seq, url_fp, host_fp, canon_url, action, http_status, depth
FROM read_parquet('{_CRAWL_ORACLE_PATH}')
"""

SQL_CRAWL_HOST_STATS = f"""
SELECT host_fp,
       COUNT(*) AS n_actions,
       AVG(CAST(depth AS DOUBLE)) AS mean_depth,
       MAX(seq) AS last_seq
FROM read_parquet('{_CRAWL_ORACLE_PATH}')
GROUP BY host_fp
ORDER BY n_actions DESC, host_fp
LIMIT 25
"""


from .oracle_sketch import (
    ARC_ORACLE_PATH,
    CDX_ORACLE_PATH,
    BPE_TRAIN_ORACLE_PATH,
    SITEMAP_INV_ORACLE_PATH,
    BPE_ENCODE_ORACLE_PATH,
    BPE_VOCAB_ORACLE_PATH,
    UNIGRAM_TRAIN_ORACLE_PATH,
    UNIGRAM_ENCODE_ORACLE_PATH,
    WP_VOCAB_ORACLE_PATH,
    WP_ENCODE_ORACLE_PATH,
    HLL_BY_TYPE_ORACLE_PATH,
    HLL_ORACLE_PATH,
    MINHASH_ORACLE_PATH,
    KNN_IVFPQ_ORACLE_PATH,
    HITS_ORACLE_PATH,
    PAGERANK_ORACLE_PATH,
    KNN_IVF_ORACLE_PATH,
    MULTIMODAL_ORACLE_PATH,
    PARSE_ORACLE_PATH,
    SIMHASH_ORACLE_PATH,
    WEBTEXT_ORACLE_PATH,
)

SQL_MULTIMODAL_FEATURES = f"""
SELECT media_id, kind, feat_dim, n_frames
FROM read_parquet('{MULTIMODAL_ORACLE_PATH}')
"""

SQL_KNN_IVF = f"""
SELECT query_id, vec_id, cosine, rank
FROM read_parquet('{KNN_IVF_ORACLE_PATH}')
"""

SQL_KNN_IVFPQ = f"""
SELECT query_id, vec_id, score, rank
FROM read_parquet('{KNN_IVFPQ_ORACLE_PATH}')
"""

SQL_PAGERANK_HOSTS = f"""
SELECT host, pr FROM read_parquet('{PAGERANK_ORACLE_PATH}')
"""

SQL_HITS_HOSTS = f"""
SELECT host, authority, hub FROM read_parquet('{HITS_ORACLE_PATH}')
"""


SQL_SIMHASH_DOCS = f"""
SELECT doc_id, simhash FROM read_parquet('{SIMHASH_ORACLE_PATH}')
"""

SQL_MINHASH_LSH_DEDUP = f"""
SELECT id_a, id_b, jaccard FROM read_parquet('{MINHASH_ORACLE_PATH}')
"""

SQL_PARSE_EXTRACT = f"""
SELECT url, canon_url, url_fp, http_status, mime_norm, digest_hex
FROM read_parquet('{PARSE_ORACLE_PATH}')
"""

SQL_ARC_ROUNDTRIP = f"""
SELECT url, url_fp, http_status, mime_norm, digest_hex
FROM read_parquet('{ARC_ORACLE_PATH}')
"""


def ensure_oracle_tables(sf_dir: str = "/root/testdata/sf0.01") -> None:
    """Materialize every read_parquet-backed oracle table (crawl +
    sketch + parse + arc) so ``__ray_entry__.oracle_sql()`` resolves no
    matter which side the driver runs first. The driver's correctness
    harness runs at sf0.01; callers at other scales pass their own
    sf_dir."""
    from .oracle_sketch import (
        oracle_anchor_terms_table,
        oracle_arc_roundtrip_table,
        oracle_cdx_table,
        oracle_bpe_train_table,
        oracle_sitemap_inventory_table,
        oracle_bpe_vocab_table,
        oracle_bpe_encode_table,
        oracle_unigram_train_table,
        oracle_unigram_encode_table,
        oracle_wordpiece_vocab_table,
        oracle_wordpiece_encode_table,
        oracle_host_components_table,
        oracle_doc_fp_table,
        oracle_dup_strip_table,
        oracle_hll_by_type_table,
        oracle_host_edges_table,
        oracle_compress_table,
        oracle_dsir_table,
        oracle_lang_id_table,
        oracle_logreg_table,
        oracle_shuffle_table,
        oracle_hll_table,
        oracle_knn_ivf_table,
        oracle_knn_ivfpq_table,
        oracle_hits_table,
        oracle_pagerank_table,
        oracle_lm_score_table,
        oracle_minhash_pairs_table,
        oracle_multimodal_resize_table,
        oracle_multimodal_table,
        oracle_parse_extract_table,
        oracle_semdedup_table,
        oracle_pca_table,
        oracle_bitext_table,
        oracle_hll_overlap_table,
        oracle_sitemap_table,
        oracle_simhash_table,
        oracle_wat_table,
    )

    ensure_crawl_oracle_table()
    ensure_crawl_delay_oracle_table()
    ensure_recrawl_oracle_table()
    oracle_simhash_table(sf_dir)
    oracle_minhash_pairs_table(sf_dir)
    oracle_parse_extract_table(sf_dir)
    oracle_arc_roundtrip_table()
    oracle_cdx_table()
    oracle_bpe_train_table(sf_dir)
    oracle_sitemap_inventory_table()
    oracle_bpe_vocab_table(sf_dir)
    oracle_bpe_encode_table(sf_dir)
    oracle_unigram_train_table(sf_dir)
    oracle_unigram_encode_table(sf_dir)
    oracle_wordpiece_vocab_table(sf_dir)
    oracle_wordpiece_encode_table(sf_dir)
    oracle_hll_table(sf_dir)
    oracle_hll_by_type_table(sf_dir)
    oracle_multimodal_table()
    oracle_knn_ivf_table(sf_dir)
    oracle_knn_ivfpq_table(sf_dir)
    oracle_pagerank_table(sf_dir)
    oracle_hits_table(sf_dir)
    oracle_lm_score_table(sf_dir)
    oracle_semdedup_table(sf_dir)
    oracle_pca_table(sf_dir)
    oracle_bitext_table(sf_dir)
    oracle_hll_overlap_table(sf_dir)
    oracle_wat_table(sf_dir)
    oracle_host_edges_table(sf_dir)
    oracle_dup_strip_table(sf_dir)
    oracle_multimodal_resize_table()
    oracle_lang_id_table(sf_dir)
    oracle_doc_fp_table(sf_dir)
    oracle_dsir_table(sf_dir)
    oracle_shuffle_table(sf_dir)
    oracle_logreg_table(sf_dir)
    oracle_compress_table(sf_dir)
    oracle_anchor_terms_table(sf_dir)
    oracle_host_components_table(sf_dir)
    oracle_sitemap_table(sf_dir)
    # round-5 additions (every read_parquet-backed oracle must appear
    # here so oracle_sql() resolves no matter which side runs first)
    from .oracle_sketch import (
        oracle_bowtie_table,
        oracle_cdc_table,
        oracle_host_template_table,
        oracle_cms_table,
        oracle_opic_table,
        oracle_salsa_table,
        oracle_scc_table,
        oracle_seed_distance_table,
        oracle_crawl_trap_table,
        oracle_freshness_table,
        oracle_diversity_sample_table,
        oracle_host_index_table,
        oracle_hyperanf_table,
        oracle_hyperball_table,
        oracle_ip_colocation_table,
        oracle_kcore_table,
        oracle_ktruss_table,
        oracle_rwr_table,
        oracle_pmi_table,
        oracle_sq_recall_table,
        oracle_lpa_table,
        oracle_mirror_table,
        oracle_orphan_table,
        oracle_recip_links_table,
        oracle_robots_audit_table,
        oracle_token_shards_table,
        oracle_winnow_dup_frac_table,
        oracle_winnow_table,
        oracle_spam_mass_table,
        oracle_trustrank_table,
        oracle_webtext_table,
    )

    oracle_webtext_table(sf_dir)
    oracle_trustrank_table(sf_dir)
    oracle_spam_mass_table(sf_dir)
    oracle_crawl_trap_table()
    oracle_recip_links_table(sf_dir)
    oracle_kcore_table(sf_dir)
    oracle_ktruss_table(sf_dir)
    oracle_rwr_table(sf_dir)
    oracle_pmi_table(sf_dir)
    oracle_sq_recall_table(sf_dir)
    oracle_ip_colocation_table(sf_dir)
    oracle_hyperball_table(sf_dir)
    oracle_hyperanf_table(sf_dir)
    oracle_bowtie_table(sf_dir)
    oracle_seed_distance_table(sf_dir)
    oracle_scc_table(sf_dir)
    oracle_host_template_table(sf_dir)
    oracle_salsa_table(sf_dir)
    oracle_opic_table(sf_dir)
    oracle_cms_table(sf_dir)
    oracle_diversity_sample_table(sf_dir)
    oracle_token_shards_table(sf_dir)
    oracle_winnow_table(sf_dir)
    oracle_winnow_dup_frac_table(sf_dir)
    oracle_lpa_table(sf_dir)
    oracle_mirror_table()
    oracle_cdc_table(sf_dir)
    oracle_host_index_table(sf_dir)
    oracle_freshness_table(sf_dir)
    oracle_robots_audit_table(sf_dir)
    oracle_orphan_table(sf_dir)
    ensure_phash_oracle_table(sf_dir)
    ensure_audio_fp_oracle_table(sf_dir)
    ensure_suffix_oracle_table(sf_dir)
    ensure_suffix_strip_oracle_table(sf_dir)


def q_crawl_log(sf_dir: str):
    """Small end-to-end crawl; returns the fetch log projected to the
    deterministic parity columns (crawl-order parity vs the
    single-process oracle asserted row-for-row in
    tests/test_crawl_parity.py and hash-checked against the oracle
    crawler's table via SQL_CRAWL_LOG)."""
    import tempfile

    from .crawl import crawl

    ensure_crawl_oracle_table()
    with tempfile.TemporaryDirectory(prefix="cc_ray_crawl_") as ckpt:
        res = crawl(_crawl_cfg(), ckpt)
        return res.log_table().select(_CRAWL_LOG_COLS)


def q_crawl_epoch_stats(sf_dir: str):
    """Per-epoch crawl progress report — action counts and frontier
    depth reach per epoch (the operational dashboard row a crawl
    operator watches: discovery rate collapsing or robots-denials
    spiking shows up here first). Consumed LAZILY from the epoch log
    files (one read task per file) into ONE (epoch, action) groupby;
    the result is epochs x actions rows. Hash-checked against the
    single-process oracle crawler's log via plain SQL."""
    import shutil
    import tempfile

    from ray.data.aggregate import Count, Max

    from .crawl import crawl

    ensure_crawl_oracle_table()
    ckpt = tempfile.mkdtemp(prefix="cc_ray_crawl_estats_")
    try:
        res = crawl(_crawl_cfg(), ckpt)
        return (
            res.log_dataset()
            .groupby(["epoch", "action"])
            .aggregate(
                Count(alias_name="n"),
                Max("depth", alias_name="max_depth"),
            )
            .to_pandas()  # epochs x actions rows; log dirs deletable after
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


SQL_CRAWL_EPOCH_STATS = f"""
SELECT epoch, action, CAST(COUNT(*) AS BIGINT) AS n,
       MAX(depth) AS max_depth
FROM read_parquet('{_CRAWL_ORACLE_PATH}')
GROUP BY epoch, action
"""


def q_sitemap_roundtrip(sf_dir: str):
    """XML sitemap source/sink round-trip (sitemaps.org protocol) —
    the frontier-seeding discovery channel the anchor-link crawl
    misses: write the universe's URL inventory as ``<urlset>`` shard
    files plus a ``<sitemapindex>`` (sources/sitemap.py — shard =
    fp64(url) % 16, canonical byte-deterministic XML), read the shard
    tree back via read_binary_files (one read task per shard, the
    protocol's 50k-URL shard cap makes shards block-sized by
    construction), parse with the namespace-tolerant stdlib stage,
    and return (url, lastmod, shard) rows. Hash-check vs the
    sequential shared-kernel row builder proves the XML write ->
    read -> parse cycle lossless (an escaping bug or dropped entry
    changes the row set)."""
    import os
    import shutil
    import tempfile

    from ..sources.sitemap import (
        read_sitemaps,
        universe_sitemap_rows,
        write_sitemapindex,
        write_urlset,
    )
    from ..sources.synth import sf_from_dir
    from .oracle_sketch import oracle_sitemap_table

    oracle_sitemap_table(sf_dir)
    sf = min(sf_from_dir(sf_dir), 0.01)
    n_shards = 16
    out = tempfile.mkdtemp(prefix="ccray_sitemap_", dir="/tmp")
    try:
        shard_ids = rd.from_items(
            [{"shard": s} for s in range(n_shards)]
        ).repartition(n_shards)

        def write_shard(t: pa.Table) -> pa.Table:
            # regenerate this shard's rows from (sf, seed) — pure
            # function, no driver-side URL list shipped to tasks
            written = []
            for s in t.column("shard").to_pylist():
                rows = [
                    (loc, lm)
                    for sh, loc, lm in universe_sitemap_rows(sf, n_shards=n_shards)
                    if sh == s
                ]
                name = f"sitemap-{s:05d}.xml"
                tmp = os.path.join(out, f".{name}.tmp")
                with open(tmp, "wb") as f:
                    f.write(write_urlset(rows))
                os.replace(tmp, os.path.join(out, name))  # idempotent
                written.append(len(rows))
            return pa.table(
                {"shard": t.column("shard"), "n": pa.array(written, pa.int64())}
            )

        n_urls = (
            shard_ids.map_batches(write_shard, batch_format="pyarrow")
            .sum("n")
        )
        index = write_sitemapindex(
            [f"sitemap-{s:05d}.xml" for s in range(n_shards)]
        )
        with open(os.path.join(out, "sitemap-index.xml"), "wb") as f:
            f.write(index)
        res = read_sitemaps(out).to_pandas()
        assert len(res) == n_urls, (len(res), n_urls)
        return res
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_SITEMAP_ROUNDTRIP = """
SELECT url, lastmod, shard
FROM read_parquet('/tmp/ccray_oracle_sitemap.parquet')
"""


def q_arc_roundtrip(sf_dir: str):
    """ARC format layer (SURVEY S1/S11/P1): write a shard of the pages
    universe as gzip-member-per-record .arc.gz files, read them back
    through the Ray Data ARC source, and run the parse/extract kernel —
    returns (url, url_fp, http_status, mime_norm, digest_hex) rows.
    Byte-parity of the payloads is asserted in tests/test_arc.py."""
    import hashlib
    import os
    import tempfile

    from ..sources.arc import read_arc_pages, write_arc
    from ..sources.synth import get_universe
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_arc_roundtrip_table

    oracle_arc_roundtrip_table()
    uni = get_universe(0.001, 42)
    rows = []
    for host in uni.hosts[:8]:
        for k in range(min(20, uni.page_counts[host])):
            url, ts, rec, _lang = uni.page_row(host, k)
            rows.append((url, ts, rec))
    tmp = tempfile.mkdtemp(prefix="cc_ray_arc_q_")
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("ms")),
            "html": pa.array([r[2] for r in rows], pa.binary()),
        }
    )
    write_arc(rd.from_arrow(t), tmp).count()
    paths = [os.path.join(tmp, f) for f in sorted(os.listdir(tmp)) if f.endswith(".arc.gz")]

    def digest(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": b.column("url"),
                "url_fp": b.column("url_fp"),
                "http_status": b.column("http_status"),
                "mime_norm": b.column("mime_norm"),
                "digest_hex": pa.array(
                    [
                        hashlib.md5((t_ or "").encode()).hexdigest()
                        for t_ in b.column("text").to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )

    return (
        read_arc_pages(paths)
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(digest, batch_format="pyarrow")
    )


def q_warc_roundtrip(sf_dir: str):
    """WARC 1.0 format layer (sources/warc.py — the format modern
    Common Crawl publishes; no reference counterpart, built from the
    public ISO 28500 spec): write the same 160-page shard as
    gzip-member-per-record .warc.gz, read it back through the Ray Data
    WARC source, parse — and hash-check against the SAME no-format
    oracle as arc_roundtrip (the expected rows are format-independent,
    so one oracle proves both archive layers byte-lossless)."""
    import hashlib
    import os
    import tempfile

    from ..sources.synth import get_universe
    from ..sources.warc import read_warc_pages, write_warc
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_arc_roundtrip_table

    oracle_arc_roundtrip_table()
    uni = get_universe(0.001, 42)
    rows = []
    for host in uni.hosts[:8]:
        for k in range(min(20, uni.page_counts[host])):
            url, ts, rec, _lang = uni.page_row(host, k)
            rows.append((url, ts, rec))
    tmp = tempfile.mkdtemp(prefix="cc_ray_warc_q_")
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("ms")),
            "html": pa.array([r[2] for r in rows], pa.binary()),
        }
    )
    write_warc(rd.from_arrow(t), tmp).count()
    paths = [
        os.path.join(tmp, f) for f in sorted(os.listdir(tmp)) if f.endswith(".warc.gz")
    ]

    def digest(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": b.column("url"),
                "url_fp": b.column("url_fp"),
                "http_status": b.column("http_status"),
                "mime_norm": b.column("mime_norm"),
                "digest_hex": pa.array(
                    [
                        hashlib.md5((t_ or "").encode()).hexdigest()
                        for t_ in b.column("text").to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )

    return (
        read_warc_pages(paths)
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(digest, batch_format="pyarrow")
    )


SQL_WARC_ROUNDTRIP = SQL_ARC_ROUNDTRIP


def q_warc_revisit_dedup(sf_dir: str):
    """WARC revisit-record archive dedup (sources/warc.py
    deduplicate_warc; WARC 1.0 §6.7.2 identical-payload-digest — no
    reference counterpart, the reference predates WARC): write the
    160-page universe shard TWICE (a re-crawl 7 days later — payloads
    are pure functions of (host, k), so every digest duplicates),
    rewrite the archive so each payload is stored once with later
    captures downgraded to revisit records, and read the capture table
    back. Hash-checked against a sequential dict-fold keeper oracle.

    Scale shape: payload bytes ride ZERO exchanges — a slim
    (file, url, ts, digest) index makes two all-to-all hops (keeper
    pick by digest, dup-map routing by file) and each source file is
    rewritten by one task reading it locally."""
    import os
    import tempfile

    from ..sources.synth import get_universe
    from ..sources.warc import (
        deduplicate_warc,
        read_warc_captures,
        write_warc,
    )
    from .oracle_sketch import oracle_warc_revisit_table

    oracle_warc_revisit_table()
    uni = get_universe(0.001, 42)
    rows = []
    for host in uni.hosts[:8]:
        for k in range(min(20, uni.page_counts[host])):
            url, ts, rec, _lang = uni.page_row(host, k)
            for dt in (0, 7 * 86400 * 1000):
                rows.append((url, ts + dt, rec))
    tmp = tempfile.mkdtemp(prefix="cc_ray_warc_rv_src_")
    out = tempfile.mkdtemp(prefix="cc_ray_warc_rv_out_")
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("ms")),
            "html": pa.array([r[2] for r in rows], pa.binary()),
        }
    )
    # 4 files so keeper/duplicate pairs cross file boundaries
    write_warc(rd.from_arrow(t).repartition(4), tmp).count()
    paths = [
        os.path.join(tmp, f) for f in sorted(os.listdir(tmp)) if f.endswith(".warc.gz")
    ]
    deduplicate_warc(paths, out).count()
    deduped = [
        os.path.join(out, f) for f in sorted(os.listdir(out)) if f.endswith(".warc.gz")
    ]
    return read_warc_captures(deduped)


SQL_WARC_REVISIT_DEDUP = """
SELECT url, ts_ms, rec_type, digest, refers_url, refers_ts
FROM read_parquet('/tmp/ccray_oracle_warc_revisit.parquet')
"""


def q_recrawl_schedule(sf_dir: str):
    """Adaptive recrawl scheduling (Cho & Garcia-Molina, "Estimating
    Frequency of Change", ACM TOIT 3(3) 2003): estimate each URL's
    change rate from its capture history and emit the priority the
    frontier scheduler feeds on. With n observed intervals at sync
    spacing I and X detected changes, the bias-corrected estimator is
    ``lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / I``.

    The capture history is synthesized deterministically from doc_id
    arithmetic (n_caps = 4 + id%4 captures, interval 1 + id%3 days,
    a change event at capture i iff (id + i*i) % 3 == 0) so DuckDB can
    rebuild the identical history with generate_series — the SQL
    oracle checks the whole distributed pipeline with real SQL logic,
    not a pinned parquet.

    Scale shape: capture rows ride as TWO int64s (shifted composite
    key doc_id*8+i, digest version); the consecutive-capture digest
    compare is a distributed sort-merge self-join on the +1-shifted
    key (stages/joins.merge_join — no per-URL capture group ever needs
    one block, no per-group Python), the per-URL fold is ONE groupby
    Sum, and the estimator finalize is stateless numpy (n_caps /
    interval are pure functions of doc_id, so they never ride an
    exchange)."""
    import pyarrow.compute as pc

    from ..stages.joins import merge_join

    docs = _pq(sf_dir, "documents", ["doc_id"], min_blocks=4)

    def expand(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(d) == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "dig": pa.array([], pa.int64())}
            )
        n = 4 + (d % 4)
        reps = np.repeat(d, n)
        starts = np.cumsum(n) - n
        i = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(starts, n)
        chg = ((reps + i * i) % 3 == 0) & (i >= 1)
        c = np.cumsum(chg)
        ver = c - np.repeat(c[starts], n)  # digest version per capture
        return pa.table(
            {
                "k": pa.array(reps * 8 + i),
                "dig": pa.array(ver.astype(np.int64)),
            }
        )

    caps = docs.map_batches(expand, batch_format="pyarrow")

    def shift(t: pa.Table) -> pa.Table:
        # capture i re-keyed to i+1: joins each capture to its
        # successor (n_caps <= 7 < 8, so the shift never crosses into
        # the next doc's key range)
        return pa.table(
            {"k1": pc.add(t.column("k"), 1), "dig": t.column("dig")}
        )

    prev = caps.map_batches(shift, batch_format="pyarrow")
    joined = merge_join(caps, prev, "k", "k1", ["dig"], how="inner", suffix="_prev")

    def to_changes(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        chg = (
            t.column("dig").to_numpy(zero_copy_only=False)
            != t.column("dig_prev").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array((k // 8).astype(np.int64)),
                "chg": pa.array(chg),
            }
        )

    agg = (
        joined.map_batches(to_changes, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("chg", alias_name="x_changes"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        x = t.column("x_changes").to_numpy(zero_copy_only=False).astype(np.float64)
        n = (3 + (d % 4)).astype(np.float64)  # observed intervals
        interval_days = (1 + (d % 3)).astype(np.float64)
        lam = -np.log((n - x + 0.5) / (n + 0.5)) / interval_days
        return pa.table(
            {
                "doc_id": pa.array(d),
                "n_caps": pa.array((n + 1).astype(np.int64)),
                "x_changes": pa.array(x.astype(np.int64)),
                # + 0.0 normalizes IEEE -0.0 (the X=0 case) so the
                # byte-level value hash agrees with the SQL side
                "change_rate": pa.array(np.round(lam, 6) + 0.0, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_RECRAWL_SCHEDULE = """
WITH caps AS (
  SELECT d.doc_id, g.i,
         CASE WHEN (d.doc_id + g.i * g.i) % 3 = 0 THEN 1 ELSE 0 END AS chg
  FROM documents d
  JOIN (SELECT UNNEST(generate_series(1, 7)) AS i) g
    ON g.i <= 3 + (d.doc_id % 4)
)
SELECT doc_id,
       CAST(4 + doc_id % 4 AS BIGINT) AS n_caps,
       CAST(SUM(chg) AS BIGINT) AS x_changes,
       ROUND(-LN((3 + doc_id % 4 - SUM(chg) + 0.5) / (3 + doc_id % 4 + 0.5))
             / (1 + doc_id % 3), 6) + 0.0 AS change_rate
FROM caps
GROUP BY doc_id
"""


def q_snapshot_churn(sf_dir: str):
    """Snapshot-over-snapshot URL churn census — per snapshot t, how
    many URLs were ADDED (first seen at t), GONE (present at t-1,
    absent at t), CHANGED (present at both with a different payload
    digest) and UNCHANGED. The crawl-planning counterpart of
    recrawl_schedule: Common Crawl publishes exactly this
    new/changed/gone breakdown between monthly snapshots, and a
    100 TB engine computes it without ever co-locating a URL's whole
    history.

    The capture universe is synthesized deterministically from doc_id
    arithmetic (present in snapshots [id%3, min(id%3 + 2 + id%5, 7)];
    digest version = running count of change events (id + t*t) % 4 ==
    0) so DuckDB rebuilds the identical history with generate_series
    + a window SUM — a real-SQL oracle, not a pinned parquet.

    Scale shape (the recrawl_schedule discipline): capture rows ride
    as TWO int64s (composite key doc_id*16 + t, digest version); the
    snapshot-pair compare is ONE distributed FULL OUTER sort-merge
    self-join on the +1-shifted key (left-only -> added, right-only
    -> gone, matched -> digest compare), then per-batch bincount
    partials (<= 8 snapshot rows per batch — the A4 combiner
    discipline) into a tiny groupby Sum. No per-URL group ever needs
    one block; the driver sees only the 8-row census."""
    import pyarrow.compute as pc

    from ..stages.joins import merge_join

    T = 8
    docs = _pq(sf_dir, "documents", ["doc_id"], min_blocks=4)

    def expand(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(d) == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "dig": pa.array([], pa.int64())}
            )
        first = d % 3
        last = np.minimum(first + 2 + (d % 5), T - 1)
        n = last - first + 1
        reps = np.repeat(d, n)
        starts = np.cumsum(n) - n
        offs = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(starts, n)
        snap = np.repeat(first, n) + offs
        chg = ((reps + snap * snap) % 4 == 0).astype(np.int64)
        c = np.cumsum(chg)
        dig = c - np.repeat(c[starts] - chg[starts], n)  # inclusive cumsum
        return pa.table(
            {
                "k": pa.array(reps * 16 + snap),
                "dig": pa.array(dig.astype(np.int64)),
            }
        )

    caps = docs.map_batches(expand, batch_format="pyarrow")

    def shift(t: pa.Table) -> pa.Table:
        # capture t re-keyed to t+1 (t <= 7 < 16: never crosses into
        # the next doc's key range)
        return pa.table(
            {"k1": pc.add(t.column("k"), 1), "dig": t.column("dig")}
        )

    prev = caps.map_batches(shift, batch_format="pyarrow")
    joined = merge_join(
        caps, prev, "k", "k1", ["dig"], how="outer", suffix="_prev"
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "snapshot": pa.array([], pa.int64()),
                    "added": pa.array([], pa.int64()),
                    "gone": pa.array([], pa.int64()),
                    "changed": pa.array([], pa.int64()),
                    "unchanged": pa.array([], pa.int64()),
                }
            )
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        snap = k % 16
        lnull = pc.is_null(t.column("dig")).to_numpy(zero_copy_only=False)
        rnull = pc.is_null(t.column("dig_prev")).to_numpy(zero_copy_only=False)
        dig = t.column("dig").to_numpy(zero_copy_only=False).astype(np.float64)
        digp = (
            t.column("dig_prev").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        keep = snap < T  # a last-snapshot capture's shift lands at t=8
        both = keep & ~lnull & ~rnull
        cats = {
            "added": keep & ~lnull & rnull,
            "gone": keep & lnull,
            "changed": both & (dig != digp),
            "unchanged": both & (dig == digp),
        }
        cols = {"snapshot": pa.array(np.arange(T, dtype=np.int64))}
        for name, mask in cats.items():
            cols[name] = pa.array(
                np.bincount(snap[mask], minlength=T)[:T].astype(np.int64)
            )
        return pa.table(cols)

    agg = (
        joined.map_batches(partials, batch_format="pyarrow")
        .groupby("snapshot")
        .aggregate(
            Sum("added", alias_name="added"),
            Sum("gone", alias_name="gone"),
            Sum("changed", alias_name="changed"),
            Sum("unchanged", alias_name="unchanged"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        # drop all-zero census rows: the SQL side only emits
        # snapshots that have at least one pair row
        total = None
        for c in ("added", "gone", "changed", "unchanged"):
            col = pc.cast(t.column(c), pa.int64())
            total = col if total is None else pc.add(total, col)
        out = pa.table(
            {
                "snapshot": pc.cast(t.column("snapshot"), pa.int64()),
                "added": pc.cast(t.column("added"), pa.int64()),
                "gone": pc.cast(t.column("gone"), pa.int64()),
                "changed": pc.cast(t.column("changed"), pa.int64()),
                "unchanged": pc.cast(t.column("unchanged"), pa.int64()),
            }
        )
        return out.filter(pc.greater(total, 0))

    return agg.map_batches(finalize, batch_format="pyarrow")


def q_redirect_resolution(sf_dir: str, max_hops: int = 8):
    """Redirect-chain resolution: collapse every 3xx chain to its
    final landing page (or flag it unresolved when it loops or runs
    past ``max_hops``) — the canonical-URL step a crawl engine runs
    before dedup so an alias chain contributes ONE frontier entry.

    The redirect table is synthesized deterministically from doc_id
    arithmetic (id%11==7 -> id+1 and id%11==8 -> id-1, a 2-cycle the
    resolver must detect; else id%5!=0 -> id-1, chains of <= 4 hops
    ending at multiples of 5; targets outside the universe terminate
    the walk) so DuckDB rebuilds the identical chains with a
    WITH RECURSIVE walk — a real-SQL oracle.

    Scale shape: POINTER DOUBLING (the distributed list-ranking
    classic — Wyllie 1979; each round composes the mapping with
    itself, so a length-L chain resolves in ceil(log2 L) rounds, not
    L): the (u, cur, hops) mapping table rides as three int64s
    through ONE left sort-merge join per round,
    ``ceil(log2(max_hops)) + 1`` rounds total, loop-carried table
    doc-scale and re-materialized per round. No per-chain group ever
    needs one block; a 100-hop chain costs 7 exchanges, not 100."""
    import pyarrow.compute as pc

    from ..stages.joins import merge_join

    docs = _pq(sf_dir, "documents", ["doc_id"], min_blocks=4)

    def base(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.where(
            d % 11 == 7,
            d + 1,
            np.where(d % 11 == 8, d - 1, np.where(d % 5 != 0, d - 1, d)),
        )
        isr = (d % 11 == 7) | (d % 11 == 8) | (d % 5 != 0)
        return pa.table(
            {
                "u": pa.array(d),
                "cur": pa.array(np.where(isr, v, d).astype(np.int64)),
                "hops": pa.array(isr.astype(np.int64)),
                "is_redirect": pa.array(isr),
            }
        )

    p = docs.map_batches(base, batch_format="pyarrow").materialize()
    rounds = max(1, int(np.ceil(np.log2(max_hops))) + 1)
    for _ in range(rounds):

        def as_mapping(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "u2": t.column("u"),
                    "cur2": t.column("cur"),
                    "hops2": t.column("hops"),
                }
            )

        joined = merge_join(
            p,
            p.map_batches(as_mapping, batch_format="pyarrow"),
            "cur",
            "u2",
            ["cur2", "hops2"],
            how="left",
        )

        def compose(t: pa.Table) -> pa.Table:
            cur = t.column("cur").to_numpy(zero_copy_only=False).astype(np.int64)
            hops = t.column("hops").to_numpy(zero_copy_only=False).astype(np.int64)
            c2 = t.column("cur2").to_numpy(zero_copy_only=False).astype(np.float64)
            h2 = t.column("hops2").to_numpy(zero_copy_only=False).astype(np.float64)
            miss = np.isnan(c2)  # target outside the universe: terminal
            return pa.table(
                {
                    "u": t.column("u"),
                    "cur": pa.array(
                        np.where(miss, cur, c2).astype(np.int64)
                    ),
                    "hops": pa.array(
                        (hops + np.where(miss, 0.0, h2)).astype(np.int64)
                    ),
                    "is_redirect": t.column("is_redirect"),
                }
            )

        p = joined.map_batches(compose, batch_format="pyarrow").materialize()

    # terminal test: cur still maps to a redirecting row -> loop /
    # over-budget; attach the redirect flag of cur with one left join
    redirect_keys = p.map_batches(
        lambda t: pa.table(
            {
                "rk": t.column("u"),
                "tgt_is_redirect": t.column("is_redirect"),
            }
        ),
        batch_format="pyarrow",
    )
    flagged = merge_join(
        p, redirect_keys, "cur", "rk", ["tgt_is_redirect"], how="left"
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("is_redirect"))
        cur = t.column("cur").to_numpy(zero_copy_only=False).astype(np.int64)
        hops = t.column("hops").to_numpy(zero_copy_only=False).astype(np.int64)
        tir = t.column("tgt_is_redirect").to_pylist()
        unresolved = np.array(
            [bool(x) for x in tir], dtype=bool
        ) | (hops > max_hops)
        return pa.table(
            {
                "url_id": t.column("u"),
                "final_id": pa.array(
                    np.where(unresolved, -1, cur).astype(np.int64)
                ),
                "hops": pa.array(
                    np.where(unresolved, -1, hops).astype(np.int64)
                ),
                "resolved": pa.array(~unresolved),
            }
        )

    return flagged.map_batches(finalize, batch_format="pyarrow")


SQL_REDIRECT_RESOLUTION = """
WITH RECURSIVE nxt AS (
  SELECT doc_id AS u,
         CASE WHEN doc_id % 11 = 7 THEN doc_id + 1
              WHEN doc_id % 11 = 8 THEN doc_id - 1
              WHEN doc_id % 5 <> 0 THEN doc_id - 1
              ELSE NULL END AS v
  FROM documents
),
walk AS (
  SELECT n.u AS u, n.v AS cur, 1 AS hops FROM nxt n WHERE n.v IS NOT NULL
  UNION ALL
  SELECT w.u, n2.v, w.hops + 1
  FROM walk w
  JOIN nxt n2 ON n2.u = w.cur AND n2.v IS NOT NULL
  WHERE w.hops <= 8
),
term AS (
  SELECT u, cur, hops,
         ROW_NUMBER() OVER (PARTITION BY u ORDER BY hops DESC) AS rn
  FROM walk
)
SELECT t.u AS url_id,
       CAST(CASE WHEN n3.v IS NOT NULL OR t.hops > 8
                 THEN -1 ELSE t.cur END AS BIGINT) AS final_id,
       CAST(CASE WHEN n3.v IS NOT NULL OR t.hops > 8
                 THEN -1 ELSE t.hops END AS BIGINT) AS hops,
       (n3.v IS NULL AND t.hops <= 8) AS resolved
FROM term t
LEFT JOIN nxt n3 ON n3.u = t.cur
WHERE t.rn = 1
"""


def q_cdx_collapse(sf_dir: str):
    """CDX capture collapse (the wayback/pywb ``collapse=digest``
    query feature): from a URL's capture history, keep only the
    captures whose payload digest DIFFERS from the immediately
    preceding capture — the canonical "unique captures" view replay
    tooling paginates. Shares the snapshot_churn capture universe so
    DuckDB rebuilds identical history with generate_series + LAG.

    Scale shape: capture rows ride as TWO int64s (composite key
    doc_id*16 + t, digest version); the previous-capture compare is
    ONE LEFT sort-merge self-join on the +1-shifted key (first
    capture keeps its null-prev row), then a stateless vectorized
    filter — row-level output, no groupby at all. No per-URL group
    ever needs one block."""
    import pyarrow.compute as pc

    from ..stages.joins import merge_join

    T = 8
    docs = _pq(sf_dir, "documents", ["doc_id"], min_blocks=4)

    def expand(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(d) == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "dig": pa.array([], pa.int64())}
            )
        first = d % 3
        last = np.minimum(first + 2 + (d % 5), T - 1)
        n = last - first + 1
        reps = np.repeat(d, n)
        starts = np.cumsum(n) - n
        offs = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(starts, n)
        snap = np.repeat(first, n) + offs
        chg = ((reps + snap * snap) % 4 == 0).astype(np.int64)
        c = np.cumsum(chg)
        dig = c - np.repeat(c[starts] - chg[starts], n)
        return pa.table(
            {
                "k": pa.array(reps * 16 + snap),
                "dig": pa.array(dig.astype(np.int64)),
            }
        )

    caps = docs.map_batches(expand, batch_format="pyarrow")

    def shift(t: pa.Table) -> pa.Table:
        return pa.table(
            {"k1": pc.add(t.column("k"), 1), "dig": t.column("dig")}
        )

    prev = caps.map_batches(shift, batch_format="pyarrow")
    joined = merge_join(
        caps, prev, "k", "k1", ["dig"], how="left", suffix="_prev"
    )

    def keep_unique(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        dig = t.column("dig").to_numpy(zero_copy_only=False).astype(np.float64)
        digp = (
            t.column("dig_prev").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        pnull = pc.is_null(t.column("dig_prev")).to_numpy(zero_copy_only=False)
        keep = pnull | (dig != digp)
        return pa.table(
            {
                "url_id": pa.array((k[keep] // 16).astype(np.int64)),
                "snapshot": pa.array((k[keep] % 16).astype(np.int64)),
            }
        )

    return joined.map_batches(keep_unique, batch_format="pyarrow")


SQL_CDX_COLLAPSE = """
WITH caps AS (
  SELECT d.doc_id AS url_id, g.t,
         SUM(CASE WHEN (d.doc_id + g.t * g.t) % 4 = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY d.doc_id ORDER BY g.t) AS dig
  FROM documents d
  JOIN (SELECT UNNEST(generate_series(0, 7)) AS t) g
    ON g.t >= d.doc_id % 3
   AND g.t <= LEAST(d.doc_id % 3 + 2 + d.doc_id % 5, 7)
),
lagged AS (
  SELECT url_id, t, dig,
         LAG(dig) OVER (PARTITION BY url_id ORDER BY t) AS pdig
  FROM caps
)
SELECT url_id, CAST(t AS BIGINT) AS snapshot
FROM lagged
WHERE pdig IS NULL OR dig <> pdig
"""


SQL_SNAPSHOT_CHURN = """
WITH caps AS (
  SELECT d.doc_id AS url_id, g.t,
         SUM(CASE WHEN (d.doc_id + g.t * g.t) % 4 = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY d.doc_id ORDER BY g.t) AS dig
  FROM documents d
  JOIN (SELECT UNNEST(generate_series(0, 7)) AS t) g
    ON g.t >= d.doc_id % 3
   AND g.t <= LEAST(d.doc_id % 3 + 2 + d.doc_id % 5, 7)
),
pairs AS (
  SELECT COALESCE(c.t, p.t + 1) AS snapshot,
         c.dig AS dig, p.dig AS dig_prev
  FROM caps c
  FULL OUTER JOIN caps p
    ON c.url_id = p.url_id AND c.t = p.t + 1
)
SELECT CAST(snapshot AS BIGINT) AS snapshot,
       CAST(SUM(CASE WHEN dig IS NOT NULL AND dig_prev IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS added,
       CAST(SUM(CASE WHEN dig IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS gone,
       CAST(SUM(CASE WHEN dig IS NOT NULL AND dig_prev IS NOT NULL
                 AND dig <> dig_prev THEN 1 ELSE 0 END) AS BIGINT) AS changed,
       CAST(SUM(CASE WHEN dig IS NOT NULL AND dig_prev IS NOT NULL
                 AND dig = dig_prev THEN 1 ELSE 0 END) AS BIGINT) AS unchanged
FROM pairs
WHERE snapshot <= 7
GROUP BY snapshot
"""


def _cdx_query_index_dir() -> str:
    """Write-once /tmp cache of the CDX index the two cdx_* queries
    share: the 160-page universe shard -> build_cdx_index (the real
    distributed sort + shard + cluster.idx path). Completeness marker
    mirrors sources/sitemap.sitemap_seed_cache_dir."""
    import os

    from ..sources.cdx import build_cdx_index
    from ..sources.synth import get_universe

    path = "/tmp/ccray_cdx_index_v1_0.001_42"
    done = path + ".complete"
    if os.path.isfile(done):
        return path
    uni = get_universe(0.001, 42)
    urls, tss, recs = [], [], []
    for host in uni.hosts[:8]:
        for k in range(min(20, uni.page_counts[host])):
            url, ts, rec, _lang = uni.page_row(host, k)
            urls.append(url)
            tss.append(ts)
            recs.append(rec)
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("ms")),
            "html": pa.array(recs, pa.binary()),
        }
    )
    build_cdx_index(rd.from_arrow(t).repartition(6), path)
    with open(done, "w") as f:
        f.write("ok")
    return path


def q_cdx_index(sf_dir: str):
    """CDXJ capture-index layer (sources/cdx.py — the URL index the
    real Common Crawl publishes beside its archives; the reference
    predates CDX, built from the public CDXJ/zipnum layout): derive
    capture rows from the 160-page shard, globally sort by
    SURT+TIMESTAMP14, write content-addressed .cdxj.gz shards + a
    cluster.idx manifest, read every shard back through the Ray
    source. Hash-checked against the no-index sequential kernel
    (oracle_cdx_table) — a match proves the line format, gzip
    sharding, and manifest-resolved read are lossless."""
    from ..sources.cdx import read_cdxj
    from .oracle_sketch import oracle_cdx_table

    oracle_cdx_table()
    d = _cdx_query_index_dir()
    return read_cdxj(d).drop_columns(["cdx_key", "shard"])


SQL_CDX_INDEX = f"""
SELECT surt, ts14, url, http_status, mime_norm, digest_hex, length
FROM read_parquet('{CDX_ORACLE_PATH}')
"""

# whole-TLD subtree scan: every .com capture (multi-shard range)
CDX_LOOKUP_PREFIX = "com,"


def q_cdx_prefix_lookup(sf_dir: str):
    """Pruned CDX range scan: cluster.idx admits only the shards whose
    key range intersects the SURT prefix — the lookup opens O(site)
    files, not O(corpus) (tests assert real pruning). Result is the
    exact capture slice, hash-checked vs the SQL LIKE filter over the
    sequential oracle rows."""
    from ..sources.cdx import cdx_lookup
    from .oracle_sketch import oracle_cdx_table

    oracle_cdx_table()
    d = _cdx_query_index_dir()
    return cdx_lookup(d, CDX_LOOKUP_PREFIX).drop_columns(
        ["cdx_key", "shard"]
    )


SQL_CDX_PREFIX_LOOKUP = f"""
SELECT surt, ts14, url, http_status, mime_norm, digest_hex, length
FROM read_parquet('{CDX_ORACLE_PATH}')
WHERE surt LIKE '{CDX_LOOKUP_PREFIX}%'
"""


# --------------------------------------------------------------------
# BPE tokenizer training + encoding (stages/bpe.py)
# --------------------------------------------------------------------


def _bpe_merges(sf_dir: str) -> list[tuple[str, str]]:
    """Distributed word-count -> shared merge-learning kernel. The
    corpus-scale half is Ray (within-batch Counter pre-agg, ONE
    groupby(word), distributed sort+limit cap); the merge loop is
    vocab-scale driver compute — the standard two-regime split every
    BPE trainer uses (Sennrich 2016)."""
    from .oracle_sketch import BPE_MAX_WORDS, BPE_N_MERGES
    from ..stages.bpe import corpus_word_counts, learn_bpe

    docs = _pq(sf_dir, "documents", ["text"], min_blocks=8)
    wc = corpus_word_counts(docs, max_words=BPE_MAX_WORDS)
    counts = dict(
        zip(wc.column("word").to_pylist(), wc.column("count").to_pylist())
    )
    return learn_bpe(counts, BPE_N_MERGES)


def q_bpe_train(sf_dir: str):
    """Learn a BPE merge table from the corpus (stages/bpe.py). The
    oracle runs the IDENTICAL pure merge kernel on sequentially-
    counted words, so the hash match isolates the distributed
    count + deterministic-cap path."""
    from .oracle_sketch import oracle_bpe_train_table
    from ..stages.bpe import merges_table

    oracle_bpe_train_table(sf_dir)
    return merges_table(_bpe_merges(sf_dir))


SQL_BPE_TRAIN = f"""
SELECT "rank", "left", "right", merged
FROM read_parquet('{BPE_TRAIN_ORACLE_PATH}')
"""


def q_bpe_encode(sf_dir: str):
    """Encode the corpus with the learned merges: ranks ray.put-
    broadcast once, actor-pool stage with a per-actor word memo
    (Zipf => ~1 hit rate), zero exchanges; (doc_id, n_bpe_tokens)
    out — the exact token budget q_bpe_token_counts estimates."""
    import ray

    from .oracle_sketch import oracle_bpe_encode_table
    from ..stages.bpe import BpeEncodeStage

    oracle_bpe_encode_table(sf_dir)
    ref = ray.put(_bpe_merges(sf_dir))
    return _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8).map_batches(
        BpeEncodeStage,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        # (min, max) like every other pool: a FIXED concurrency=4
        # reserves every CPU of a 4-cpu cluster for the actors and
        # starves the upstream read — the executor then crawls at one
        # effective worker (observed: the 4-cpu test session wedged
        # here for an hour; 32-cpu runs masked it)
        concurrency=(1, 4),
    )


SQL_BPE_ENCODE = f"""
SELECT doc_id, n_bpe_tokens
FROM read_parquet('{BPE_ENCODE_ORACLE_PATH}')
"""


def q_bpe_fertility(sf_dir: str):
    """Tokenizer fertility evaluation by language: BPE tokens per
    whitespace word and UTF-8 bytes per BPE token — the metric a
    multilingual tokenizer is judged on (a vocab trained on one
    language over-fragments the others; fertility spikes flag it
    before any training run burns compute on a 3x token bill).

    Scale shape: the encode actor pool streams (broadcast ranks,
    per-actor word memo — the q_bpe_encode stage); per-doc word and
    byte counts are zero-Python Arrow kernels; lang attaches with ONE
    doc-scale merge_join and the rollup is one lang-scale groupby.
    SQL oracle: documents joined to the sequential-encode oracle
    parquet with the same integer formulas."""
    import pyarrow.compute as pc

    from ..stages.bpe import BpeEncodeStage
    from ..stages.joins import merge_join
    from .oracle_sketch import oracle_bpe_encode_table

    oracle_bpe_encode_table(sf_dir)
    ref = ray.put(_bpe_merges(sf_dir))
    enc = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8).map_batches(
        BpeEncodeStage,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def meta(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "n_words": pc.cast(
                    pc.count_substring_regex(text, pattern=r"\S+"), pa.int64()
                ),
                "n_bytes": pc.cast(pc.binary_length(text), pa.int64()),
            }
        )

    docs = _pq(sf_dir, "documents", ["doc_id", "lang", "text"], min_blocks=8)
    joined = merge_join(
        docs.map_batches(meta, batch_format="pyarrow"),
        enc,
        "doc_id",
        "doc_id",
        ["n_bpe_tokens"],
        how="inner",
    )
    agg = joined.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_words", alias_name="n_words"),
        Sum("n_bytes", alias_name="n_bytes"),
        Sum("n_bpe_tokens", alias_name="n_bpe_tokens"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        w = t.column("n_words").to_numpy(zero_copy_only=False).astype(np.float64)
        b = t.column("n_bytes").to_numpy(zero_copy_only=False).astype(np.float64)
        k = (
            t.column("n_bpe_tokens")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        fert = np.where(w > 0, np.round(k / np.maximum(w, 1), 6), 0.0)
        bpt = np.where(k > 0, np.round(b / np.maximum(k, 1), 6), 0.0)
        return pa.table(
            {
                "lang": t.column("lang"),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "n_words": t.column("n_words").cast(pa.int64()),
                "n_bytes": t.column("n_bytes").cast(pa.int64()),
                "n_bpe_tokens": t.column("n_bpe_tokens").cast(pa.int64()),
                "fertility": pa.array(fert + 0.0, pa.float64()),
                "bytes_per_token": pa.array(bpt + 0.0, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_BPE_FERTILITY = rf"""
WITH e AS (
  SELECT doc_id, n_bpe_tokens
  FROM read_parquet('{BPE_ENCODE_ORACLE_PATH}')
),
m AS (
  SELECT d.lang,
         CASE WHEN trim(d.text) = '' THEN 0
              ELSE length(string_split_regex(trim(d.text), '\s+')) END AS w,
         strlen(d.text) AS b,
         e.n_bpe_tokens AS k
  FROM documents d JOIN e ON e.doc_id = d.doc_id
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS n_words,
       CAST(SUM(b) AS BIGINT) AS n_bytes,
       CAST(SUM(k) AS BIGINT) AS n_bpe_tokens,
       CASE WHEN SUM(w) > 0
            THEN ROUND(SUM(k) * 1.0 / SUM(w), 6) ELSE 0.0 END + 0.0
         AS fertility,
       CASE WHEN SUM(k) > 0
            THEN ROUND(SUM(b) * 1.0 / SUM(k), 6) ELSE 0.0 END + 0.0
         AS bytes_per_token
FROM m GROUP BY lang
"""


def q_bpe_vocab(sf_dir: str):
    """Tokenizer vocabulary export (token, token_id): distributed word
    counts -> shared merge + vocab kernels. The shippable artifact of
    bpe_train."""
    from .oracle_sketch import BPE_MAX_WORDS, BPE_N_MERGES, oracle_bpe_vocab_table
    from ..stages.bpe import corpus_word_counts, learn_bpe, vocab_table

    oracle_bpe_vocab_table(sf_dir)
    docs = _pq(sf_dir, "documents", ["text"], min_blocks=8)
    wc = corpus_word_counts(docs, max_words=BPE_MAX_WORDS)
    counts = dict(
        zip(wc.column("word").to_pylist(), wc.column("count").to_pylist())
    )
    return vocab_table(counts, learn_bpe(counts, BPE_N_MERGES))


SQL_BPE_VOCAB = f"""
SELECT token, token_id
FROM read_parquet('{BPE_VOCAB_ORACLE_PATH}')
"""


# --------------------------------------------------------------------
# Unigram-LM tokenizer training + encoding (stages/unigram.py)
# --------------------------------------------------------------------

# fitted model cache keyed by sf_dir: train and encode share one
# distributed fit per scale factor (the fit is the expensive half —
# 5 EM Ray jobs over the capped word table)
_UNIGRAM_FIT_CACHE: dict[str, dict] = {}


def _unigram_model(sf_dir: str) -> dict[str, float]:
    """Distributed unigram-LM fit (stages/unigram.py): distributed
    word count + cap, distributed substring seed, then EM where every
    E-step is ONE map_batches pass over the word Dataset with the
    model ray.put-broadcast and ONE piece-scale groupby merging
    QUANTIZED integer partials — bit-identical to the sequential
    oracle fit under any sharding (integer sums are order-free)."""
    import os as _os

    from .oracle_sketch import (
        UNI_MAX_PIECE_LEN,
        UNI_MAX_WORDS,
        UNI_SEED_SIZE,
        UNI_VOCAB_SIZE,
    )
    from ..stages.unigram import (
        capped_word_counts_ds,
        distributed_qcounts_fn,
        run_unigram_em,
        seed_logp_distributed,
    )

    key = _os.path.abspath(sf_dir)
    hit = _UNIGRAM_FIT_CACHE.get(key)
    if hit is not None:
        return hit
    docs = _pq(sf_dir, "documents", ["text"], min_blocks=8)
    words, _total = capped_word_counts_ds(docs, UNI_MAX_WORDS)
    seed, chars = seed_logp_distributed(
        words, UNI_MAX_PIECE_LEN, UNI_SEED_SIZE
    )
    logp = run_unigram_em(
        distributed_qcounts_fn(words, UNI_MAX_PIECE_LEN),
        seed,
        chars,
        UNI_VOCAB_SIZE,
        UNI_MAX_PIECE_LEN,
    )
    _UNIGRAM_FIT_CACHE[key] = logp
    return logp


def q_unigram_train(sf_dir: str):
    """Fit a unigram-LM (SentencePiece-default) tokenizer on the
    corpus and export the (piece, logprob) model. The oracle runs the
    IDENTICAL pure EM/prune kernels on a sequential fold, so the hash
    match isolates the distributed count/seed/E-step plumbing."""
    from .oracle_sketch import oracle_unigram_train_table
    from ..stages.unigram import pieces_logp_table

    oracle_unigram_train_table(sf_dir)
    return pieces_logp_table(_unigram_model(sf_dir))


SQL_UNIGRAM_TRAIN = f"""
SELECT piece, logprob
FROM read_parquet('{UNIGRAM_TRAIN_ORACLE_PATH}')
"""


def q_unigram_encode(sf_dir: str):
    """Viterbi-encode the corpus under the fitted unigram model:
    model ray.put-broadcast once, actor-pool stage with a per-actor
    word memo (Zipf => ~1 hit rate), zero exchanges;
    (doc_id, n_unigram_tokens) out."""
    import ray

    from .oracle_sketch import UNI_MAX_PIECE_LEN, oracle_unigram_encode_table
    from ..stages.unigram import UnigramEncodeStage

    oracle_unigram_encode_table(sf_dir)
    ref = ray.put(_unigram_model(sf_dir))
    return _pq(
        sf_dir, "documents", ["doc_id", "text"], min_blocks=8
    ).map_batches(
        UnigramEncodeStage,
        fn_constructor_args=(ref, UNI_MAX_PIECE_LEN),
        batch_format="pyarrow",
        # (min,max) pool — a fixed pool this wide starves the read on
        # small clusters (see q_bpe_encode's note)
        concurrency=(1, 4),
    )


SQL_UNIGRAM_ENCODE = f"""
SELECT doc_id, n_unigram_tokens
FROM read_parquet('{UNIGRAM_ENCODE_ORACLE_PATH}')
"""


# --------------------------------------------------------------------
# WordPiece tokenizer training + encoding (stages/wordpiece.py)
# --------------------------------------------------------------------


def _wordpiece_vocab(sf_dir: str) -> list[str]:
    """Distributed word-count -> shared likelihood-scored merge kernel
    (the bpe two-regime split with WordPiece's score: exact-integer
    cross-product comparison, never floats)."""
    from .oracle_sketch import WP_MAX_WORDS, WP_N_MERGES
    from ..stages.bpe import corpus_word_counts
    from ..stages.wordpiece import learn_wordpiece, wordpiece_vocab

    docs = _pq(sf_dir, "documents", ["text"], min_blocks=8)
    wc = corpus_word_counts(docs, max_words=WP_MAX_WORDS)
    counts = dict(
        zip(wc.column("word").to_pylist(), wc.column("count").to_pylist())
    )
    return wordpiece_vocab(counts, learn_wordpiece(counts, WP_N_MERGES))


def q_wordpiece_vocab(sf_dir: str):
    """Train a WordPiece (BERT) tokenizer — likelihood-scored merges
    over distributed word counts — and export the (token, token_id)
    vocabulary. Hash-checked vs the sequential-count oracle sharing
    the pure merge kernel."""
    from .oracle_sketch import oracle_wordpiece_vocab_table
    from ..stages.wordpiece import vocab_to_table

    oracle_wordpiece_vocab_table(sf_dir)
    return vocab_to_table(_wordpiece_vocab(sf_dir))


SQL_WORDPIECE_VOCAB = f"""
SELECT token, token_id
FROM read_parquet('{WP_VOCAB_ORACLE_PATH}')
"""


def q_wordpiece_encode(sf_dir: str):
    """Greedy longest-match WordPiece encode of the corpus: vocab
    ray.put-broadcast once, actor-pool stage with per-actor word memo,
    zero exchanges; (doc_id, n_wordpiece_tokens) out."""
    import ray

    from .oracle_sketch import oracle_wordpiece_encode_table
    from ..stages.wordpiece import WordPieceEncodeStage

    oracle_wordpiece_encode_table(sf_dir)
    ref = ray.put(sorted(_wordpiece_vocab(sf_dir)))
    return _pq(
        sf_dir, "documents", ["doc_id", "text"], min_blocks=8
    ).map_batches(
        WordPieceEncodeStage,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


SQL_WORDPIECE_ENCODE = f"""
SELECT doc_id, n_wordpiece_tokens
FROM read_parquet('{WP_ENCODE_ORACLE_PATH}')
"""


class _TokenizerCompareStage:
    """Fused three-tokenizer encode: BPE merges, unigram model and
    WordPiece vocab all ray.put-broadcast once per actor; ONE text
    pass pre-tokenizes each doc ONCE (all three tokenizers consume the
    same word stream), per-actor word memos for each tokenizer, and
    the batch output is pre-aggregated per (batch, lang) — the wire
    carries lang-scale partial sums, never per-doc rows."""

    def __init__(self, bpe_ref, uni_ref, uni_maxlen: int, wp_ref):
        import ray

        from ..stages.bpe import encode_word

        self._ranks = {m: i for i, m in enumerate(ray.get(bpe_ref))}
        self._logp = ray.get(uni_ref)
        self._maxlen = uni_maxlen
        self._vocab = set(ray.get(wp_ref))
        self._encode_word = encode_word
        self._memo_b: dict[str, int] = {}
        self._memo_u: dict[str, int] = {}
        self._memo_w: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.bpe import pretokenize
        from ..stages.unigram import viterbi_n_pieces
        from ..stages.wordpiece import encode_word_wordpiece

        n_words = (
            pc.cast(
                pc.count_substring_regex(batch.column("text"), pattern=r"\S+"),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
        )
        acc: dict[str, list[int]] = {}
        for lang, txt, w in zip(
            batch.column("lang").to_pylist(),
            batch.column("text").to_pylist(),
            n_words,
        ):
            nb = nu = nw = 0
            for word in pretokenize(txt or ""):
                kb = self._memo_b.get(word)
                if kb is None:
                    kb = len(self._encode_word(word, self._ranks))
                    self._memo_b[word] = kb
                ku = self._memo_u.get(word)
                if ku is None:
                    ku = viterbi_n_pieces(word, self._logp, self._maxlen)
                    self._memo_u[word] = ku
                kw = self._memo_w.get(word)
                if kw is None:
                    kw = len(encode_word_wordpiece(word, self._vocab))
                    self._memo_w[word] = kw
                nb += kb
                nu += ku
                nw += kw
            a = acc.get(lang)
            if a is None:
                acc[lang] = [1, int(w), nb, nu, nw]
            else:
                a[0] += 1
                a[1] += int(w)
                a[2] += nb
                a[3] += nu
                a[4] += nw
        langs = sorted(acc)
        cols = list(zip(*(acc[l] for l in langs))) if langs else [[]] * 5
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_docs": pa.array(cols[0], pa.int64()),
                "n_words": pa.array(cols[1], pa.int64()),
                "n_bpe_tokens": pa.array(cols[2], pa.int64()),
                "n_unigram_tokens": pa.array(cols[3], pa.int64()),
                "n_wordpiece_tokens": pa.array(cols[4], pa.int64()),
            }
        )


def q_tokenizer_compare(sf_dir: str):
    """Head-to-head tokenizer evaluation — per-language fertility
    (tokens per whitespace word) of all three trainers (BPE, unigram
    LM, WordPiece) fitted on THIS corpus: the eval a team runs to pick
    a tokenizer before burning training compute.

    Scale shape: the three fitted models are ray.put-broadcast into
    ONE fused actor-pool stage that pre-tokenizes each document ONCE
    (the three tokenizers share the word stream and per-actor word
    memos), pre-aggregates per (batch, lang), and ships only
    lang-scale partial sums; ONE lang-scale groupby + a float
    finalize. Zero corpus-scale exchanges, one text pass — strictly
    cheaper than running the three encode queries separately.

    SQL oracle: documents joined to the three sequential-encode
    oracle parquets with the same integer/ROUND(6) formulas."""
    import ray

    from .oracle_sketch import (
        UNI_MAX_PIECE_LEN,
        oracle_bpe_encode_table,
        oracle_unigram_encode_table,
        oracle_wordpiece_encode_table,
    )

    oracle_bpe_encode_table(sf_dir)
    oracle_unigram_encode_table(sf_dir)
    oracle_wordpiece_encode_table(sf_dir)

    bpe_ref = ray.put(_bpe_merges(sf_dir))
    uni_ref = ray.put(_unigram_model(sf_dir))
    wp_ref = ray.put(sorted(_wordpiece_vocab(sf_dir)))

    partials = _pq(
        sf_dir, "documents", ["lang", "text"], min_blocks=8
    ).map_batches(
        _TokenizerCompareStage,
        fn_constructor_args=(bpe_ref, uni_ref, UNI_MAX_PIECE_LEN, wp_ref),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    agg = partials.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_words", alias_name="n_words"),
        Sum("n_bpe_tokens", alias_name="n_bpe_tokens"),
        Sum("n_unigram_tokens", alias_name="n_unigram_tokens"),
        Sum("n_wordpiece_tokens", alias_name="n_wordpiece_tokens"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        w = t.column("n_words").to_numpy(zero_copy_only=False).astype(np.float64)
        safe_w = np.maximum(w, 1)
        out = {
            "lang": t.column("lang"),
            "n_docs": t.column("n_docs").cast(pa.int64()),
            "n_words": t.column("n_words").cast(pa.int64()),
        }
        for col, fert in (
            ("n_bpe_tokens", "fert_bpe"),
            ("n_unigram_tokens", "fert_unigram"),
            ("n_wordpiece_tokens", "fert_wordpiece"),
        ):
            k = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            out[col] = t.column(col).cast(pa.int64())
            out[fert] = pa.array(
                np.where(w > 0, np.round(k / safe_w, 6), 0.0) + 0.0,
                pa.float64(),
            )
        return pa.table(out)

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_TOKENIZER_COMPARE = rf"""
WITH m AS (
  SELECT d.lang,
         CASE WHEN trim(d.text) = '' THEN 0
              ELSE length(string_split_regex(trim(d.text), '\s+')) END AS w,
         b.n_bpe_tokens AS kb,
         u.n_unigram_tokens AS ku,
         p.n_wordpiece_tokens AS kp
  FROM documents d
  JOIN read_parquet('{BPE_ENCODE_ORACLE_PATH}') b ON b.doc_id = d.doc_id
  JOIN read_parquet('{UNIGRAM_ENCODE_ORACLE_PATH}') u ON u.doc_id = d.doc_id
  JOIN read_parquet('{WP_ENCODE_ORACLE_PATH}') p ON p.doc_id = d.doc_id
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS n_words,
       CAST(SUM(kb) AS BIGINT) AS n_bpe_tokens,
       CASE WHEN SUM(w) > 0
            THEN ROUND(SUM(kb) * 1.0 / SUM(w), 6) ELSE 0.0 END + 0.0
         AS fert_bpe,
       CAST(SUM(ku) AS BIGINT) AS n_unigram_tokens,
       CASE WHEN SUM(w) > 0
            THEN ROUND(SUM(ku) * 1.0 / SUM(w), 6) ELSE 0.0 END + 0.0
         AS fert_unigram,
       CAST(SUM(kp) AS BIGINT) AS n_wordpiece_tokens,
       CASE WHEN SUM(w) > 0
            THEN ROUND(SUM(kp) * 1.0 / SUM(w), 6) ELSE 0.0 END + 0.0
         AS fert_wordpiece
FROM m GROUP BY lang
"""


def q_token_shard_export(sf_dir: str):
    """Token-shard binary export — the pipeline's last mile to a
    training job: BPE-encode the corpus to uint32 id streams
    (EOD-terminated per doc) and pack them into flat little-endian
    binary shard files, the Megatron-LM `.bin` layout trainers mmap.
    Returns per-shard (shard, n_docs, n_tokens, nbytes, digest_hex) —
    the digest locks the exact shard BYTES against the sequential
    oracle, so the whole train->encode->pack path is value-checked,
    not just row counts.

    Shape: stages/bpe.py TokenIdEncodeStage (ranks+vocab ray.put
    broadcast, per-actor word memo) -> pack_token_shards (ONE
    sort(shard) exchange carrying the ~4 B/token id stream — text
    never rides it; atomic tmp+rename writes keep retries
    idempotent). Shard count scales with the corpus
    (corpus_tokens/n_shards * 4 B per block); n_shards=8 is the test
    configuration."""
    from .oracle_sketch import (
        BPE_MAX_WORDS,
        BPE_N_MERGES,
        oracle_token_shards_table,
    )
    from ..stages.bpe import (
        TokenIdEncodeStage,
        corpus_word_counts,
        learn_bpe,
        pack_token_shards,
        vocab_table,
    )

    oracle_token_shards_table(sf_dir)
    docs = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8)
    wc = corpus_word_counts(docs, max_words=BPE_MAX_WORDS)
    counts = dict(
        zip(wc.column("word").to_pylist(), wc.column("count").to_pylist())
    )
    merges = learn_bpe(counts, BPE_N_MERGES)
    vt = vocab_table(counts, merges)
    vocab_id = dict(
        zip(vt.column("token").to_pylist(), vt.column("token_id").to_pylist())
    )
    enc = docs.map_batches(
        TokenIdEncodeStage,
        fn_constructor_args=(ray.put(merges), ray.put(vocab_id), 8),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return pack_token_shards(enc, out_dir="/tmp/ccray_token_shards")


SQL_TOKEN_SHARD_EXPORT = """
SELECT shard, n_docs, n_tokens, nbytes, digest_hex
FROM read_parquet('/tmp/ccray_oracle_token_shards.parquet')
"""


def q_stale_pages(sf_dir: str):
    """Stale-page recrawl list — the incremental-crawl scheduler's
    work queue: every sitemap-PUBLISHED URL whose ``lastmod`` is newer
    than its latest archive capture (or that was never captured at
    all) needs a refetch. Joins the two real sources end to end: the
    XML sitemap inventory (read through the shard cache) LEFT
    sort-merge-joined to the CDXJ capture index's per-URL max TS14.
    All-integer staleness arithmetic (lastmod -> TS14 integer, 0 for
    never-captured), so the DuckDB two-table oracle hash-matches.

    Shape: captures pre-aggregated per URL (groupby max) BEFORE the
    join, so the exchange carries one row per URL per side; nothing
    corpus-wide materializes."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    from ..sources.cdx import read_cdxj
    from ..sources.sitemap import read_sitemaps, sitemap_inventory_cache_dir
    from ..stages.joins import merge_join
    from .oracle_sketch import oracle_cdx_table, oracle_sitemap_inventory_table

    oracle_cdx_table()
    oracle_sitemap_inventory_table()
    sm = read_sitemaps(sitemap_inventory_cache_dir(0.001, 42)).select_columns(
        ["url", "lastmod"]
    )
    caps = (
        read_cdxj(_cdx_query_index_dir())
        .map_batches(
            lambda t: pa.table(
                {
                    "url": t.column("url"),
                    "ts_i": pc.cast(t.column("ts14"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("url")
        .aggregate(Max("ts_i", alias_name="last_ts14"))
    )
    j = merge_join(sm, caps, "url", "url", ["last_ts14"], how="left")

    def finalize(t: pa.Table) -> pa.Table:
        last = pc.coalesce(t.column("last_ts14"), pa.scalar(0, pa.int64()))
        lm_ts = pc.cast(
            pc.binary_join_element_wise(
                pc.replace_substring(t.column("lastmod"), "-", ""), "000000", ""
            ),
            pa.int64(),
        )
        stale = pc.cast(pc.less(last, lm_ts), pa.int64())
        return pa.table(
            {
                "url": t.column("url"),
                "lastmod": t.column("lastmod"),
                "last_ts14": last,
                "stale": stale,
            }
        )

    return j.map_batches(finalize, batch_format="pyarrow")


SQL_STALE_PAGES = f"""
WITH caps AS (
  SELECT url, MAX(CAST(ts14 AS BIGINT)) AS last_ts14
  FROM read_parquet('{CDX_ORACLE_PATH}') GROUP BY url
)
SELECT s.url, s.lastmod,
       CAST(COALESCE(c.last_ts14, 0) AS BIGINT) AS last_ts14,
       CAST(CASE WHEN COALESCE(c.last_ts14, 0)
                      < CAST(replace(s.lastmod, '-', '') || '000000' AS BIGINT)
                 THEN 1 ELSE 0 END AS BIGINT) AS stale
FROM read_parquet('{SITEMAP_INV_ORACLE_PATH}') s
LEFT JOIN caps c USING (url)
"""


_BLOCK_SUFFIXES = [".com", ".org", ".co.jp", "portal.com"]


def q_url_host_blocklist(sf_dir: str):
    """URL blocklist census — the C4/CCNet-style domain-filter step
    (both drop documents by host blocklists before any content work):
    per host, page count plus which blocklist suffix (LONGEST match,
    the functions/matchers.SuffixMatcher rule the reference's
    prefix/suffix matchers implement — P20) would block it. The
    deliberately overlapping list (``portal.com`` inside ``.com``)
    exercises the longest-match tie against the SQL CASE ordered by
    suffix length.

    Shape: host extracted vectorized from the canonical URL, per-batch
    (host, n) pre-agg so the ONE groupby exchange carries host-scale
    rows, then a node-scale vectorized suffix pass (mask per suffix,
    ascending length, longer overwrites). SQL-checked against the
    pinned URL-inventory oracle parquet with LIKE logic."""
    import os

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from .oracle_sketch import oracle_sitemap_inventory_table

    oracle_sitemap_inventory_table()
    sf = min(sf_from_dir(sf_dir), 0.001)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)

    def pre(t: pa.Table) -> pa.Table:
        # raw URLs carry case variants the canonicalizer collapses —
        # lowercase the authority (P9 host rule) before the census
        hosts = pc.utf8_lower(
            pc.list_element(
                pc.split_pattern(pc.utf8_slice_codeunits(t.column("url"), 7), "/"), 0
            )
        )
        return (
            pa.table({"host": hosts, "n": pa.array([1] * len(t), pa.int64())})
            .group_by("host")
            .aggregate([("n", "sum")])
            .rename_columns(["host", "n"])
        )

    agg = (
        rd.read_parquet(path, columns=["url"])
        .map_batches(pre, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n", alias_name="n_pages"))
    )

    def attribute(t: pa.Table) -> pa.Table:
        hosts = t.column("host")
        blocked_by = pa.array([""] * len(t), pa.string())
        for s in sorted(set(_BLOCK_SUFFIXES), key=lambda x: (len(x), x)):
            m = pc.ends_with(hosts, pattern=s)
            blocked_by = pc.if_else(m, pa.scalar(s, pa.string()), blocked_by)
        return pa.table(
            {
                "host": hosts,
                "n_pages": t.column("n_pages").cast(pa.int64()),
                "blocked_by": blocked_by,
                "blocked": pc.cast(pc.not_equal(blocked_by, ""), pa.int64()),
            }
        )

    return agg.map_batches(attribute, batch_format="pyarrow")


SQL_URL_HOST_BLOCKLIST = f"""
WITH h AS (
  SELECT split_part(substr(url, 8), '/', 1) AS host
  FROM read_parquet('{SITEMAP_INV_ORACLE_PATH}')
),
c AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages FROM h GROUP BY host)
SELECT host, n_pages,
       CASE WHEN host LIKE '%portal.com' THEN 'portal.com'
            WHEN host LIKE '%.co.jp' THEN '.co.jp'
            WHEN host LIKE '%.com' THEN '.com'
            WHEN host LIKE '%.org' THEN '.org'
            ELSE '' END AS blocked_by,
       CAST(CASE WHEN host LIKE '%portal.com' OR host LIKE '%.co.jp'
                      OR host LIKE '%.com' OR host LIKE '%.org'
                 THEN 1 ELSE 0 END AS BIGINT) AS blocked
FROM c
"""


def q_sitemap_coverage(sf_dir: str):
    """Sitemap-vs-archive coverage audit: which of the URLs a site
    PUBLISHES (its sitemap inventory, read through the real XML shard
    cache) does the archive actually HOLD (the CDXJ capture index)?
    Per host: published count, captured count, latest capture TS14.
    The staple completeness report of a wayback-style archive, and the
    op that ties the two new discovery/index sources together.

    Shape: both sides slim (url + one attribute), ONE sort-merge LEFT
    join on the url string (stages/joins.merge_join — union + single
    sort exchange), per-batch host pre-aggregation, then a host-scale
    groupby. Nothing corpus-wide materializes."""
    from ray.data.aggregate import Max, Sum

    from ..sources.cdx import read_cdxj
    from ..sources.sitemap import sitemap_inventory_cache_dir, read_sitemaps
    from ..stages.joins import merge_join
    from .oracle_sketch import oracle_cdx_table, oracle_sitemap_inventory_table

    oracle_cdx_table()
    oracle_sitemap_inventory_table()
    sm = read_sitemaps(sitemap_inventory_cache_dir(0.001, 42)).select_columns(
        ["url"]
    )
    cdx = read_cdxj(_cdx_query_index_dir()).select_columns(["url", "ts14"])
    j = merge_join(sm, cdx, "url", "url", ["ts14"], how="left")

    def pre(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        urls = b.column("url")
        # host of a canonical url == split_part(substr(url, 8), '/', 1)
        hosts = pc.list_element(
            pc.split_pattern(pc.utf8_slice_codeunits(urls, 7), "/"), 0
        )
        ts = b.column("ts14")
        cap = pc.is_valid(ts)
        tsi = pc.if_else(
            cap, pc.cast(pc.coalesce(ts, "0"), pa.int64()), pa.scalar(0, pa.int64())
        )
        t = pa.table(
            {
                "host": hosts,
                "n1": pa.array([1] * b.num_rows, pa.int64()),
                "nc": cap.cast(pa.int64()),
                "ts": tsi,
            }
        )
        # within-batch pre-agg: the exchange carries host-scale rows
        return (
            t.group_by("host")
            .aggregate([("n1", "sum"), ("nc", "sum"), ("ts", "max")])
            .rename_columns(["host", "n1", "nc", "ts"])
        )

    agg = (
        j.map_batches(pre, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n1"), Sum("nc"), Max("ts"))
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["host", "n_sitemap_urls", "n_captured", "latest_capture"]
        )

    return agg.map_batches(rename, batch_format="pyarrow")


SQL_SITEMAP_COVERAGE = f"""
SELECT split_part(substr(s.url, 8), '/', 1) AS host,
       CAST(COUNT(*) AS BIGINT) AS n_sitemap_urls,
       CAST(COUNT(c.url) AS BIGINT) AS n_captured,
       COALESCE(MAX(CAST(c.ts14 AS BIGINT)), 0) AS latest_capture
FROM read_parquet('{SITEMAP_INV_ORACLE_PATH}') s
LEFT JOIN read_parquet('{CDX_ORACLE_PATH}') c ON s.url = c.url
GROUP BY 1
"""





def q_wet_export(sf_dir: str):
    """WET export round trip (the derived extracted-text format Common
    Crawl publishes): parse the pages universe, sink (url, warc_ts,
    text) as .wet.gz conversion records, read them back through the
    Ray WET source, and digest — hash-checked against the parse
    oracle's (url, digest_hex), which proves the WET write -> read
    cycle preserves every extracted text byte."""
    import hashlib
    import os
    import tempfile

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..sources.warc import read_wet_pages, write_wet
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_parse_extract_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_parse_extract_table(sf_dir)

    parsed = rd.read_parquet(path, columns=["url", "warc_ts", "html"]).map_batches(
        parse_extract_batch, batch_format="pyarrow", batch_size=None
    )
    tmp = tempfile.mkdtemp(prefix="cc_ray_wet_q_")
    write_wet(parsed.select_columns(["url", "warc_ts", "text"]), tmp).count()
    paths = [
        os.path.join(tmp, f) for f in sorted(os.listdir(tmp)) if f.endswith(".wet.gz")
    ]

    def digest(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": b.column("url"),
                "digest_hex": pa.array(
                    [
                        hashlib.md5((t_ or "").encode()).hexdigest()
                        for t_ in b.column("text").to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )

    return read_wet_pages(paths).map_batches(digest, batch_format="pyarrow")


SQL_WET_EXPORT = f"""
-- WET has no null-text notion: a doc without extracted text is an
-- empty conversion block, so the no-text oracle rows (NULL digest)
-- map to md5('')
SELECT url, COALESCE(digest_hex, md5('')) AS digest_hex
FROM read_parquet('{PARSE_ORACLE_PATH}')
"""


def q_host_triangles(sf_dir: str):
    """Triangle count of the crawl's host link graph (the graph-family
    closure beside PageRank/HITS/components): distributed node-order
    wedge-check (stages/pagerank.triangle_count) over the same
    streaming parse -> host-edge extraction. The oracle is PLAIN SQL —
    a three-way self-join over the sequential edge parquet — so the
    check is fully independent of the wedge machinery."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import extract_host_edges_batch, triangle_count
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_host_edges_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_host_edges_table(sf_dir)
    edges = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(extract_host_edges_batch, batch_format="pyarrow")
    )
    return triangle_count(edges)


from .oracle_sketch import HOST_EDGES_ORACLE_PATH as _EDGES_ORACLE_PATH  # noqa: E402

SQL_HOST_TRIANGLES = f"""
WITH e AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM read_parquet('{_EDGES_ORACLE_PATH}') WHERE src <> dst
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.u = e1.v
JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
"""


def q_wat_export(sf_dir: str):
    """WAT metadata export round trip: parse the pages universe, build
    the per-page JSON envelope (status, mime, link count, title),
    sink .wat.gz metadata records, read them back, re-project from the
    JSON — hash-checked against a sequential no-WAT oracle
    (oracle_sketch.oracle_wat_table), proving the JSON build -> write
    -> read -> parse cycle preserves every field."""
    import hashlib
    import json as _json
    import os
    import tempfile

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..sources.warc import read_wat_pages, write_wat
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_wat_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_wat_table(sf_dir)

    def envelope(b: pa.Table) -> pa.Table:
        metas = [
            _json.dumps(
                {"status": int(s), "mime": m, "n_links": int(n), "title": t},
                sort_keys=True,
            )
            for s, m, n, t in zip(
                b.column("http_status").to_pylist(),
                b.column("mime_norm").to_pylist(),
                b.column("n_links").to_pylist(),
                b.column("title").to_pylist(),
            )
        ]
        return pa.table(
            {
                "url": b.column("url"),
                "warc_ts": b.column("warc_ts"),
                "meta_json": pa.array(metas, pa.string()),
            }
        )

    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(envelope, batch_format="pyarrow")
    )
    tmp = tempfile.mkdtemp(prefix="cc_ray_wat_q_")
    write_wat(parsed, tmp).count()
    paths = [
        os.path.join(tmp, f) for f in sorted(os.listdir(tmp)) if f.endswith(".wat.gz")
    ]

    def reproject(b: pa.Table) -> pa.Table:
        metas = [_json.loads(m) for m in b.column("meta_json").to_pylist()]
        return pa.table(
            {
                "url": b.column("url"),
                "http_status": pa.array(
                    np.asarray([m["status"] for m in metas], dtype=np.int16)
                ),
                "mime_norm": pa.array([m["mime"] for m in metas], pa.string()),
                "n_links": pa.array(
                    np.asarray([m["n_links"] for m in metas], dtype=np.int32)
                ),
                "title_hex": pa.array(
                    [
                        hashlib.md5((m["title"] or "").encode()).hexdigest()
                        for m in metas
                    ],
                    pa.string(),
                ),
            }
        )

    return read_wat_pages(paths).map_batches(reproject, batch_format="pyarrow")


from .oracle_sketch import WAT_ORACLE_PATH as _WAT_ORACLE_PATH  # noqa: E402

SQL_WAT_EXPORT = f"""
SELECT url, http_status, mime_norm, n_links, title_hex
FROM read_parquet('{_WAT_ORACLE_PATH}')
"""


def q_crawl_host_stats(sf_dir: str):
    """Crawl analytics (SURVEY A2 histogram + §3.3 report shape): per
    host_fp action counts + mean depth over a short crawl's fetch log,
    computed distributed (groupby shuffle keyed by host_fp). The log is
    consumed LAZILY via CrawlRunResult.log_dataset() — one read task
    per log file, seq from footer offsets, no driver concat (VERDICT
    r1 #5); only the 25-row result materializes."""
    import shutil
    import tempfile

    from ray.data.aggregate import Count, Max, Mean

    from .crawl import crawl

    ensure_crawl_oracle_table()
    ckpt = tempfile.mkdtemp(prefix="cc_ray_crawl_stats_")
    try:
        res = crawl(_crawl_cfg(), ckpt)
        return (
            res.log_dataset()
            .groupby("host_fp")
            .aggregate(
                Count(alias_name="n_actions"),
                Mean("depth", alias_name="mean_depth"),
                Max("seq", alias_name="last_seq"),
            )
            # host_fp tie-break => the 25-row cut is a total order (the
            # SQL oracle must select the same SET under equal n_actions)
            .sort(["n_actions", "host_fp"], descending=[True, False])
            .limit(25)
            .to_pandas()  # 25 rows; the log dirs can now be deleted
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


# --------------------------------------------------------------------
# distributed sort-merge equi-join / grouped top-k / LLM-prep composite
# --------------------------------------------------------------------


def q_orders_customer_join(sf_dir: str):
    """General distributed equi-join (stages/joins.merge_join): every
    order picks up its customer's segment + nation via ONE union +
    sort(custkey) exchange — no driver materialization, no pandas
    float64 decay on int64 keys."""
    from ..stages.joins import merge_join

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    customer = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_mktsegment"])
    return merge_join(
        orders,
        customer,
        left_on="o_custkey",
        right_on="c_custkey",
        right_cols=["c_mktsegment", "c_nationkey"],
        how="inner",
    )


SQL_ORDERS_CUSTOMER_JOIN = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_mktsegment, c.c_nationkey
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


def q_orders_of_rich_customers_bloom(sf_dir: str):
    """Bloom-prefiltered SEMI join — the shuffle-volume reducer for
    asymmetric joins at 100 TB: build a bloom over the (filtered)
    small side's keys driver-side, ray.put it ONCE, and drop
    non-matching big-side rows inside map_batches BEFORE the exact
    merge_join exchange. The bloom pass is lossy-but-safe (false
    positives only), so the exact semi join after it makes the final
    result EXACT — which is what keeps this SQL-checkable while still
    exercising the bloom probe on every row. Reuses the crawl's
    state/bloom.py filter (reference BloomFilter.java semantics)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as _pqm

    from ..stages.joins import merge_join
    from ..state.bloom import BloomFilter

    rich = _pqm.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).filter(pc.greater(pc.field("c_acctbal"), 5000.0))
    keys = rich.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    bloom = BloomFilter(max(len(keys), 1))
    bloom.add_batch(keys)
    blob = ray.put(bloom.to_bytes())

    blob_key = blob.hex()

    def prefilter(t: pa.Table) -> pa.Table:
        # deserialize once per worker process, not per batch: from_bytes
        # copies the bit array, and at 10^8 small-side keys that's a
        # ~100 MB memcpy a per-batch path would repeat endlessly
        bf = _WORKER_BLOOM_CACHE.get(blob_key)
        if bf is None:
            bf = BloomFilter.from_bytes(ray.get(blob))
            _WORKER_BLOOM_CACHE.clear()  # one resident filter per worker
            _WORKER_BLOOM_CACHE[blob_key] = bf
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(bf.maybe_present_batch(ck)))

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        prefilter, batch_format="pyarrow"
    )
    rich_ds = rd.from_arrow(rich.select(["c_custkey"]))
    return merge_join(
        orders, rich_ds, left_on="o_custkey", right_on="c_custkey",
        right_cols=[], how="semi",
    )


SQL_ORDERS_OF_RICH_CUSTOMERS_BLOOM = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
WHERE EXISTS (
  SELECT 1 FROM customer c
  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000
)
"""


def q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape — the multi-way join composition test: revenue
    by nation for one region where supplier and customer share the
    nation. Physical plan (the 100 TB discipline, one decision per
    table size):

    - region/nation/supplier are BROADCAST (ray.put once, numpy
      searchsorted probes inside map_batches) — never shuffled;
    - customer x orders and (that result) x lineitem are the two
      genuinely big exchanges, each a merge_join union+sort on ONE
      key (custkey, then orderkey), with the region filter applied to
      customers BEFORE the first exchange so non-ASIA rows never ship;
    - revenue is summed in integer 1e-4 units (exact associative
      aggregation — float SUM order would diverge from the oracle).
    """
    import pyarrow.compute as pc

    from ..stages.joins import merge_join

    import pyarrow.parquet as _pqm

    nat = _pqm.read_table(f"{sf_dir}/nation.parquet")
    reg = _pqm.read_table(f"{sf_dir}/region.parquet")
    sup = _pqm.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    region_of = dict(
        zip(reg.column("r_regionkey").to_pylist(), reg.column("r_name").to_pylist())
    )
    nat_keys = np.array(nat.column("n_nationkey").to_pylist(), dtype=np.int64)
    nat_order = np.argsort(nat_keys)
    nat_keys = nat_keys[nat_order]
    nat_names = np.array(nat.column("n_name").to_pylist(), dtype=object)[nat_order]
    nat_region = np.array(
        [region_of[rk] for rk in nat.column("n_regionkey").to_pylist()], dtype=object
    )[nat_order]
    asia_nations = set(nat_keys[nat_region == "ASIA"].tolist())
    sup_keys = np.array(sup.column("s_suppkey").to_pylist(), dtype=np.int64)
    sup_order = np.argsort(sup_keys)
    sup_keys = sup_keys[sup_order]
    sup_nation = np.array(sup.column("s_nationkey").to_pylist(), dtype=np.int64)[
        sup_order
    ]
    shared = ray.put((sorted(asia_nations), sup_keys, sup_nation))

    def cust_in_region(t: pa.Table) -> pa.Table:
        asia, _, _ = ray.get(shared)
        keys = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        mask = np.isin(keys, np.array(asia, dtype=np.int64))
        return t.filter(pa.array(mask))

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_in_region, batch_format="pyarrow"
    )
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    o_cust = merge_join(
        orders, cust, left_on="o_custkey", right_on="c_custkey",
        right_cols=["c_nationkey"], how="inner",
    ).select_columns(["o_orderkey", "c_nationkey"])

    def line_prep(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.rint(price * (1.0 - disc) * 10000.0).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "revenue_e4": pa.array(rev),
            }
        )

    line = _pq(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(line_prep, batch_format="pyarrow")
    joined = merge_join(
        line, o_cust, left_on="l_orderkey", right_on="o_orderkey",
        right_cols=["c_nationkey"], how="inner",
    )

    def local_only(t: pa.Table) -> pa.Table:
        _, sk, sn = ray.get(shared)
        lsk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk, lsk)
        pos = np.minimum(pos, len(sk) - 1)
        supp_nat = np.where(sk[pos] == lsk, sn[pos], -1)
        cn = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(supp_nat == cn))

    agg = (
        joined.map_batches(local_only, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("revenue_e4", alias_name="revenue_e4"))
    )

    def name_of(t: pa.Table) -> pa.Table:
        keys = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nat_keys, keys)
        return pa.table(
            {
                "n_name": pa.array(nat_names[pos].tolist(), pa.string()),
                "revenue_e4": t.column("revenue_e4"),
            }
        )

    return agg.map_batches(name_of, batch_format="pyarrow")


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                AS BIGINT)) AS BIGINT) AS revenue_e4
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


def q_unshipped_orders_revenue(sf_dir: str):
    """TPC-H Q3 shape (shipping-priority top-10): BUILDING-segment
    orders placed before the cutoff whose lineitems ship after it,
    ranked by outstanding revenue. Three stages, every exchange on a
    single key: (1) semi merge_join filters orders by the
    customer-segment key set (key-only wire); (2) inner merge_join
    attaches (o_orderdate, o_orderpriority) to the date-filtered,
    integer-revenue lineitems on orderkey; (3) groupby(orderkey) sum of
    exact e4 units -> sort desc -> limit 10. Integer revenue units =
    the repo's float-free distributed SUM discipline."""
    import pyarrow.compute as pc

    from ..stages.joins import merge_join

    import datetime as _dt

    cutoff = _dt.datetime(1998, 6, 1)

    bld = (
        _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"])
    )
    def placed_before(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("o_orderdate"), pa.scalar(cutoff)))

    orders = _pq(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(placed_before, batch_format="pyarrow")
    orders_bld = merge_join(
        orders,
        bld,
        left_on="o_custkey",
        right_on="c_custkey",
        right_cols=[],
        how="semi",
    )

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), pa.scalar(cutoff)))
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        e4 = np.round(price * (1 - disc) * 10000).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev_e4": pa.array(e4),
            }
        )

    items = _pq(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(rev, batch_format="pyarrow")
    joined = merge_join(
        items,
        orders_bld.select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"]),
        left_on="l_orderkey",
        right_on="o_orderkey",
        right_cols=["o_orderdate", "o_orderpriority"],
        how="inner",
    )
    agg = joined.groupby(
        ["l_orderkey", "o_orderdate", "o_orderpriority"]
    ).sum("rev_e4")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "o_orderdate_us": t.column("o_orderdate")
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "o_orderpriority": t.column("o_orderpriority"),
                "revenue_e4": t.column("sum(rev_e4)").cast(pa.int64()),
            }
        )

    return (
        agg.map_batches(rename, batch_format="pyarrow")
        .sort(
            ["revenue_e4", "o_orderdate_us", "l_orderkey"],
            descending=[True, False, False],
        )
        .limit(10)
    )


SQL_UNSHIPPED_ORDERS_REVENUE = """
SELECT l.l_orderkey,
       epoch_us(o.o_orderdate) AS o_orderdate_us,
       o.o_orderpriority,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                AS BIGINT)) AS BIGINT) AS revenue_e4
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_e4 DESC, o_orderdate_us, l.l_orderkey
LIMIT 10
"""


def q_top_docs_per_lang(sf_dir: str):
    """Grouped top-k window rank (stages/rank.grouped_topk): the 3
    longest documents per language, rank 1-based, doc_id tiebreak."""
    from ..stages.rank import grouped_topk

    docs = _pq(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return grouped_topk(
        docs, group_col="lang", order_col="n_chars", k=3, tiebreak_col="doc_id"
    )


SQL_TOP_DOCS_PER_LANG = """
SELECT doc_id, lang, n_chars, rank FROM (
  SELECT doc_id, lang, n_chars,
         CAST(row_number() OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id
         ) AS BIGINT) AS rank
  FROM documents
) WHERE rank <= 3
"""


def q_llm_prep(sf_dir: str):
    """The headline LLM training-data prep composite, one streaming
    pipeline: quality gate (>= 20 words) -> exact dedup (keep the
    lowest doc_id per identical text) -> token counts. Every stage is
    the engine's own operator (text_stats kernels, md5 exact-dedup
    discipline, Arrow token counting); output is the per-surviving-doc
    (doc_id, lang, n_words, tokens_bpeish) manifest."""
    import hashlib

    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    def score(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_words = pc.count_substring_regex(text, pattern=r"\S+")
        keep = pc.greater_equal(n_words, 20)
        batch = batch.append_column("n_words", n_words.cast(pa.int64()))
        batch = batch.filter(keep)
        return batch.append_column(
            "text_hash",
            pa.array(
                [
                    hashlib.md5((t or "").encode()).hexdigest()
                    for t in batch.column("text").to_pylist()
                ],
                pa.string(),
            ),
        )

    docs = _pq(sf_dir, "documents", ["doc_id", "text", "lang"], min_blocks=16)
    scored = docs.map_batches(score, batch_format="pyarrow")
    keepers = scored.groupby("text_hash").aggregate(Min("doc_id", alias_name="keeper"))

    # co-partition scored rows with their hash's keeper id: the same
    # single-key union+sort discipline as every join in this repo
    from ..stages.joins import merge_join

    joined = merge_join(
        scored.select_columns(["doc_id", "lang", "n_words", "text", "text_hash"]),
        keepers,
        left_on="text_hash",
        right_on="text_hash",
        right_cols=["keeper"],
        how="inner",
    )
    survivors = joined.filter(
        expr="doc_id == keeper"
    ).select_columns(["doc_id", "lang", "n_words", "text"])

    def tokens(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        bpeish = pc.count_substring_regex(
            text, pattern=r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "n_words": batch.column("n_words"),
                "tokens_bpeish": bpeish.cast(pa.int64()),
            }
        )

    return survivors.map_batches(tokens, batch_format="pyarrow")


SQL_LLM_PREP = r"""
WITH scored AS (
  SELECT doc_id, lang, text,
         len(regexp_extract_all(text, '\S+')) AS n_words,
         md5(text) AS text_hash
  FROM documents
),
gated AS (SELECT * FROM scored WHERE n_words >= 20),
keepers AS (
  SELECT text_hash, MIN(doc_id) AS keeper FROM gated GROUP BY text_hash
)
SELECT g.doc_id,
       g.lang,
       CAST(g.n_words AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(g.text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))
            AS BIGINT) AS tokens_bpeish
FROM gated g JOIN keepers k
  ON g.text_hash = k.text_hash AND g.doc_id = k.keeper
"""


def q_neardup_clusters(sf_dir: str):
    """Near-dup CLUSTERS: MinHash+LSH verified pairs -> distributed
    connected components (stages/components.py hash-to-min).
    Dedup keeps one doc per component, not per pair — a∼b, b∼c must
    collapse {a,b,c}. Hash-checked against a DuckDB recursive-CTE
    transitive closure over the minhash oracle's pair table."""
    from ..stages.components import connected_components
    from ..stages.dedup import minhash_lsh_pairs
    from .oracle_sketch import oracle_minhash_pairs_table

    oracle_minhash_pairs_table(sf_dir)
    pairs = minhash_lsh_pairs(
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=32),
        id_col="doc_id",
        text_col="text",
    )
    return connected_components(pairs)


SQL_NEARDUP_CLUSTERS = f"""
WITH RECURSIVE
edges AS (
  SELECT id_a AS u, id_b AS v FROM read_parquet('{MINHASH_ORACLE_PATH}')
  UNION
  SELECT id_b AS u, id_a AS v FROM read_parquet('{MINHASH_ORACLE_PATH}')
),
walk(u, label) AS (
    SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
  UNION
    SELECT e.u, w.label FROM edges e JOIN walk w ON w.u = e.v
)
SELECT u AS doc_id, CAST(MIN(label) AS BIGINT) AS component_id
FROM walk GROUP BY u
"""


def q_neardup_dedup_docs(sf_dir: str):
    """End-to-end near-dup DEDUP: MinHash+LSH pairs -> connected
    components -> keep ONE document per component (the min doc_id)
    plus every untouched document. The corpus side is projected to
    (doc_id, n_chars) BEFORE the join so the one all-to-all exchange
    moves two int columns, never text; the components side is
    pair-scale. merge_join(how='left') + a vectorized Arrow filter is
    the anti-join — no driver-side membership set."""
    import pyarrow.compute as pc

    from ..stages.components import connected_components
    from ..stages.dedup import minhash_lsh_pairs
    from ..stages.joins import merge_join
    from .oracle_sketch import oracle_minhash_pairs_table

    oracle_minhash_pairs_table(sf_dir)
    docs = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=32)
    pairs = minhash_lsh_pairs(docs, id_col="doc_id", text_col="text")
    comps = connected_components(pairs)

    slim = docs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars": pc.cast(
                    pc.utf8_length(t.column("text")), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def keep_reps(t: pa.Table) -> pa.Table:
        comp = t.column("component_id")
        mask = pc.or_kleene(
            pc.is_null(comp), pc.equal(comp, t.column("doc_id"))
        )
        return t.filter(pc.fill_null(mask, True)).drop_columns(
            ["component_id"]
        )

    return merge_join(
        slim, comps, left_on="doc_id", right_on="doc_id",
        right_cols=["component_id"], how="left",
    ).map_batches(keep_reps, batch_format="pyarrow")


SQL_NEARDUP_DEDUP_DOCS = f"""
WITH RECURSIVE
edges AS (
  SELECT id_a AS u, id_b AS v FROM read_parquet('{MINHASH_ORACLE_PATH}')
  UNION
  SELECT id_b AS u, id_a AS v FROM read_parquet('{MINHASH_ORACLE_PATH}')
),
walk(u, label) AS (
    SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
  UNION
    SELECT e.u, w.label FROM edges e JOIN walk w ON w.u = e.v
),
comp AS (
  SELECT u AS doc_id, MIN(label) AS component_id FROM walk GROUP BY u
)
SELECT d.doc_id, CAST(LENGTH(d.text) AS BIGINT) AS n_chars
FROM documents d LEFT JOIN comp c USING (doc_id)
WHERE c.component_id IS NULL OR c.component_id = d.doc_id
"""


def q_neardup_keep_best(sf_dir: str):
    """Quality-aware near-dup dedup (the FineWeb-style "keep the best
    copy, not the first"): MinHash+LSH pairs -> connected components
    -> keep the HIGHEST-quality document per component (quality =
    whitespace word count, ties broken by min doc_id) plus every
    untouched document.

    Scale shape: the corpus is projected to (doc_id, n_words) before
    the ONE corpus-scale merge_join exchange (two int columns, never
    text); component members are pair-scale, so the per-component
    argmax is a tiny three-key sort + vectorized first-of-run scan —
    no groupby over the full corpus, no driver-side membership set."""
    import pyarrow.compute as pc

    from ..stages.components import connected_components
    from ..stages.dedup import minhash_lsh_pairs
    from ..stages.joins import merge_join
    from .oracle_sketch import oracle_minhash_pairs_table

    oracle_minhash_pairs_table(sf_dir)
    docs = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=32)
    pairs = minhash_lsh_pairs(docs, id_col="doc_id", text_col="text")
    comps = connected_components(pairs)

    slim = docs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_words": pc.cast(
                    pc.count_substring_regex(t.column("text"), pattern=r"\S+"),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    joined = merge_join(
        slim, comps, left_on="doc_id", right_on="doc_id",
        right_cols=["component_id"], how="left",
    )

    def untouched(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column("component_id"))).drop_columns(
            ["component_id"]
        )

    def members(t: pa.Table) -> pa.Table:
        # pack the argmax key so "max n_words, tie min doc_id" is ONE
        # Max aggregate: (n_words << 43) | (2**43 - 1 - doc_id).
        # Bounds asserted: doc_id < 2**43, n_words < 2**20.
        t = t.filter(pc.is_valid(t.column("component_id")))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        nw = t.column("n_words").to_numpy(zero_copy_only=False)
        assert ids.max(initial=0) < (1 << 43) and nw.max(initial=0) < (1 << 20)
        key = (nw.astype(np.int64) << 43) | ((1 << 43) - 1 - ids.astype(np.int64))
        return pa.table(
            {"component_id": t.column("component_id"), "key": pa.array(key)}
        )

    def unpack(t: pa.Table) -> pa.Table:
        key = t.column("best_key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(((1 << 43) - 1) - (key & ((1 << 43) - 1))),
                "n_words": pa.array(key >> 43),
            }
        )

    winners = (
        joined.map_batches(members, batch_format="pyarrow")
        .groupby("component_id")
        .aggregate(Max("key", alias_name="best_key"))
        .map_batches(unpack, batch_format="pyarrow")
    )
    return joined.map_batches(untouched, batch_format="pyarrow").union(winners)


SQL_NEARDUP_KEEP_BEST = f"""
WITH RECURSIVE
edges AS (
  SELECT id_a AS u, id_b AS v FROM read_parquet('{MINHASH_ORACLE_PATH}')
  UNION
  SELECT id_b AS u, id_a AS v FROM read_parquet('{MINHASH_ORACLE_PATH}')
),
walk(u, label) AS (
    SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
  UNION
    SELECT e.u, w.label FROM edges e JOIN walk w ON w.u = e.v
),
comp AS (
  SELECT u AS doc_id, MIN(label) AS component_id FROM walk GROUP BY u
),
q AS (
  SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_words
  FROM documents
),
best AS (
  SELECT doc_id, n_words FROM (
    SELECT m.doc_id, m.n_words,
           ROW_NUMBER() OVER (
             PARTITION BY c.component_id
             ORDER BY m.n_words DESC, m.doc_id
           ) AS rn
    FROM q m JOIN comp c USING (doc_id)
  ) WHERE rn = 1
)
SELECT q.doc_id, q.n_words
FROM q LEFT JOIN comp c USING (doc_id) WHERE c.doc_id IS NULL
UNION ALL
SELECT doc_id, n_words FROM best
"""


def q_events_running_total(sf_dir: str):
    """Per-user cumulative sum (SQL running-total window:
    SUM OVER PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED
    PRECEDING). Shape: sort(user_id) co-locates each user's rows in
    one range partition, then a single vectorized block pass — lexsort
    within the block, one np.cumsum, per-group offset subtraction.
    Partitioning assumption: ONE USER's events fit a sort block — safe
    for a high-cardinality user key (unlike the former low-cardinality
    event_type/lang sorts, now on grouped_sorted_prefix_sum); the float
    chain must also stay per-user for bit-identical sums, which is why
    this one keeps the in-block cumsum rather than the int64 fold."""

    def running(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "running_total": pd.Series([], dtype=np.float64),
                }
            )
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy()
        eid = df["event_id"].to_numpy()
        val = df["value"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, eid, val = uid[order], eid[order], val[order]
        # per-group cumsum (fresh accumulator per user) so the float
        # addition chain matches the SQL window's per-partition scan —
        # a global cumsum minus group base is a DIFFERENT float chain
        # and only coincidentally hash-matches (ADVICE r3)
        run = (
            pd.Series(val).groupby(pd.Series(uid), sort=False).cumsum().to_numpy()
        )
        return pd.DataFrame(
            {"event_id": eid, "user_id": uid, "running_total": run}
        )

    return (
        _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        .sort("user_id")
        .map_batches(running, batch_format="pandas", batch_size=None)
    )


SQL_EVENTS_RUNNING_TOTAL = """
SELECT event_id, user_id,
       SUM(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING
       ) AS running_total
FROM events
"""


def q_events_percent_rank(sf_dir: str):
    """percent_rank window per event_type over (value, event_id) —
    with event_id in the ORDER BY every row's peer group is itself, so
    percent_rank = (rank-1)/(n-1) with rank = 1-based position, and
    the float arithmetic is identical on both sides. Shape: distributed
    rank via stages/rank.grouped_sorted_prefix_sum (high-cardinality
    sort key ending in unique event_id — no whole-group block), with
    the fold's per-group totals broadcast for the (n-1) denominator."""

    from ..stages.rank import grouped_sorted_prefix_sum

    base = _pq(sf_dir, "events", ["event_id", "event_type", "value"])
    ranked, totals = grouped_sorted_prefix_sum(
        base, ["event_type", "value", "event_id"], None, out_name="rnk"
    )
    denom = {g: float(max(n - 1, 1)) for g, n in totals.items()}

    def prank(t: pa.Table, _d=denom) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "pr": pa.array([], pa.float64()),
                }
            )
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(et, return_inverse=True)
        d = np.array([_d[u] for u in uniq], np.float64)[inv]
        pos = t.column("rnk").to_numpy(zero_copy_only=False) - 1
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "pr": pa.array(pos.astype(np.float64) / d),
            }
        )

    return ranked.map_batches(prank, batch_format="pyarrow")


SQL_EVENTS_PERCENT_RANK = """
SELECT event_id, event_type,
       percent_rank() OVER (
         PARTITION BY event_type ORDER BY value, event_id
       ) AS pr
FROM events
"""


def q_events_value_delta(sf_dir: str):
    """LAG window: per-user delta of value vs the previous event
    (ts, event_id order), first event per user coalesced to 0.0 on
    both sides so null semantics never enter the hash compare. Same
    sort(user_id) + lexsort block-pass shape as the running total."""

    def delta(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "delta": pd.Series([], dtype=np.float64),
                }
            )
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy()
        eid = df["event_id"].to_numpy()
        val = df["value"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, eid, val = uid[order], eid[order], val[order]
        d = np.empty(len(val), dtype=np.float64)
        d[1:] = val[1:] - val[:-1]
        d[0] = 0.0
        starts = np.r_[0, np.flatnonzero(uid[1:] != uid[:-1]) + 1]
        d[starts] = 0.0  # first event of each user
        return pd.DataFrame({"event_id": eid, "user_id": uid, "delta": d})

    return (
        _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        .sort("user_id")
        .map_batches(delta, batch_format="pandas", batch_size=None)
    )


SQL_EVENTS_VALUE_DELTA = """
SELECT event_id, user_id,
       COALESCE(
         value - LAG(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ), 0.0
       ) AS delta
FROM events
"""


def q_events_rolling_avg(sf_dir: str):
    """Rolling mean over the last 4 events per user (ROWS 3 PRECEDING)
    — the windowed-aggregate form of the reference's MovingAverage
    (functions/stats.py ports the kernel; this is the set-oriented
    version). The frame sum is built from explicit shifted adds
    (v + lag1 + lag2 + lag3, left to right) rather than cumsum
    differences: same 4-term float addition a row-at-a-time engine
    performs, so the hash compare sees identical doubles."""

    def rolling(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "avg4": pd.Series([], dtype=np.float64),
                }
            )
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy()
        eid = df["event_id"].to_numpy()
        val = df["value"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, eid, val = uid[order], eid[order], val[order]
        starts = np.r_[0, np.flatnonzero(uid[1:] != uid[:-1]) + 1]
        pos = np.arange(len(uid)) - np.repeat(starts, np.diff(np.r_[starts, len(uid)]))
        # ascending frame order (v[-3]+v[-2]+v[-1]+v[0]) — the same
        # left-to-right chain a scan over the frame performs
        total = np.zeros(len(val), dtype=np.float64)
        count = np.ones(len(val), dtype=np.float64)
        for k in (3, 2, 1):
            in_frame = pos >= k
            shifted = np.zeros(len(val))
            shifted[k:] = val[:-k]
            total = np.where(in_frame, total + shifted, total)
            count += in_frame
        total += val
        return pd.DataFrame(
            {"event_id": eid, "user_id": uid, "avg4": total / count}
        )

    return (
        _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        .sort("user_id")
        .map_batches(rolling, batch_format="pandas", batch_size=None)
    )


SQL_EVENTS_ROLLING_AVG = """
SELECT event_id, user_id,
       AVG(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
       ) AS avg4
FROM events
"""


def q_signup_to_purchase_funnel(sf_dir: str):
    """Funnel: for each user, microseconds from FIRST signup to the
    first purchase at-or-after it (users who never convert are
    dropped). One sort(user_id) range co-partition, then a fully
    vectorized block pass: first-signup per user via unique(return
    index) on the (user, ts)-sorted signup rows, qualifying purchases
    via a searchsorted map back to each user's signup floor. The
    ordered-scan-per-entity pattern behind retention/attribution at
    corpus scale."""

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype=np.int64),
                "us_to_purchase": pd.Series([], dtype=np.int64),
            }
        )
        if len(df) == 0:
            return empty
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        s_mask = et == "signup"
        if not s_mask.any():
            return empty
        s_users, s_first = np.unique(uid[s_mask], return_index=True)
        s_min = ts[s_mask][s_first]  # first signup ts per user
        p_mask = et == "purchase"
        p_uid, p_ts = uid[p_mask], ts[p_mask]
        pos = np.searchsorted(s_users, p_uid)
        pos_c = np.minimum(pos, len(s_users) - 1)
        ok = (s_users[pos_c] == p_uid) & (p_ts >= s_min[pos_c])
        p_uid, p_ts = p_uid[ok], p_ts[ok]
        if len(p_uid) == 0:
            return empty
        c_users, c_first = np.unique(p_uid, return_index=True)
        first_p = p_ts[c_first]  # first qualifying purchase per user
        smin = s_min[np.searchsorted(s_users, c_users)]
        return pd.DataFrame(
            {"user_id": c_users, "us_to_purchase": first_p - smin}
        )

    return (
        _pq(sf_dir, "events", ["user_id", "ts", "event_type"])
        .sort("user_id")
        .map_batches(funnel, batch_format="pandas", batch_size=None)
    )


SQL_SIGNUP_TO_PURCHASE_FUNNEL = """
WITH s AS (
  SELECT user_id, MIN(ts) AS st FROM events
  WHERE event_type = 'signup' GROUP BY user_id
)
SELECT s.user_id,
       CAST(date_diff('microsecond', s.st, MIN(e.ts)) AS BIGINT)
         AS us_to_purchase
FROM events e JOIN s ON e.user_id = s.user_id
WHERE e.event_type = 'purchase' AND e.ts >= s.st
GROUP BY s.user_id, s.st
"""


def q_customers_with_orders(sf_dir: str):
    """Distributed SEMI join (EXISTS): customers having at least one
    order, each exactly once however many orders they have. Both
    sides prune to the key (+payload) columns at the read; the
    existence check is the one union+sort(c_custkey) exchange of
    stages/joins.merge_join — the right side ships ONLY its key
    column, never order payloads."""
    from ..stages.joins import merge_join

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    orders = _pq(sf_dir, "orders", ["o_custkey"])
    return merge_join(
        cust, orders, left_on="c_custkey", right_on="o_custkey",
        right_cols=[], how="semi",
    )


SQL_CUSTOMERS_WITH_ORDERS = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q_customers_without_orders(sf_dir: str):
    """Distributed ANTI join (NOT EXISTS): customers with no
    large order (o_totalprice > 300000) — same exchange as the semi
    join, inverted emit rule. The right-side predicate is pushed into
    its read stage BEFORE the exchange, so only qualifying order keys
    ever ship (and it keeps the result non-degenerate at every test
    scale: with no predicate every customer has some order)."""
    import pyarrow.compute as pc

    from ..stages.joins import merge_join

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    big = (
        _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: t.filter(
                pc.greater(t.column("o_totalprice"), 300000.0)
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        )
    )
    return merge_join(
        cust, big, left_on="c_custkey", right_on="o_custkey",
        right_cols=[], how="anti",
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
"""


def q_cms_token_counts(sf_dir: str):
    """Count-Min sketch token-frequency census — the third classic
    mergeable sketch beside HLL (distinct) and Space-Saving (top-k):
    CMS answers POINT frequency queries in O(d*w) memory with
    one-sided error, the bounded-state substitute for a corpus-scale
    token groupby. Probes: the exact top-30 vocabulary (the
    vocab_top_tokens census re-run here with the same kernels).
    Shape: per-batch exact value_counts folded into 64 KB CMS
    partials, two-level tree merge (stages/approx._reduce_sketches);
    elementwise-integer-add merge is order-free, so the distributed
    table is bit-identical to the sequential oracle fold — a full
    value-hash check of the reduce path."""
    import pyarrow.compute as pc

    from ..stages.approx import cms_counts, heavy_hitters
    from .oracle_sketch import oracle_cms_table

    oracle_cms_table(sf_dir)

    def tokenize(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        )
        return pa.table({"token": flat.filter(pc.not_equal(flat, ""))})

    def toks():
        return _pq(sf_dir, "documents", ["text"], min_blocks=8).map_batches(
            tokenize, batch_format="pyarrow"
        )

    # probe set: exact top-30 (capacity >= global distinct => exact);
    # tokenized twice rather than materializing a corpus-scale token
    # stream between the two bounded-state reduces
    top = heavy_hitters(toks(), "token", k=30, capacity=4096, fanin=8)
    probes = top.column("token").to_pylist()
    return cms_counts(toks(), "token", probes, depth=4, width=2048, fanin=8)


SQL_CMS_TOKEN_COUNTS = """
SELECT token, cms_count FROM read_parquet('/tmp/ccray_oracle_cms.parquet')
"""


def q_approx_distinct_users(sf_dir: str):
    """HyperLogLog (p=14) distinct user_id estimate over events — the
    sketch path a 100 TB census uses instead of COUNT(DISTINCT)'s
    all-to-all shuffle: per-batch register partials, bounded tree
    merge, driver sees <= fanin 16 KB rows. Registers combine by max
    (order-free), so the distributed estimate is bit-identical to the
    single-process oracle fold — a full value-hash check of the whole
    reduce path (pytest additionally asserts ~1.5% error vs the exact
    count). Sketch family parity: extends the reference's bloom-math
    sketch lineage (util/BloomFilterUtils -> state/bloom.py) with
    Flajolet et al. 2007."""
    from ..stages.approx import approx_distinct
    from .oracle_sketch import oracle_hll_table

    oracle_hll_table(sf_dir)
    ds = _pq(sf_dir, "events", ["user_id"], min_blocks=8)
    est = approx_distinct(ds, "user_id", p=14, fanin=8)
    return pa.table({"distinct_estimate": pa.array([est], pa.float64())})


SQL_APPROX_DISTINCT_USERS = f"""
SELECT distinct_estimate FROM read_parquet('{HLL_ORACLE_PATH}')
"""


def q_approx_distinct_users_by_type(sf_dir: str):
    """Per-event-type HLL distinct-user estimates — the groupby form
    of the sketch census: map-side per-(batch,key) register partials
    (the combiner discipline), groupby shuffle of 4 KB sketch rows
    only, register-max merge per group. Hash-checked against the
    single-process per-group fold (same determinism argument as
    approx_distinct_users)."""
    from ..stages.approx import approx_distinct_by_key
    from .oracle_sketch import oracle_hll_by_type_table

    oracle_hll_by_type_table(sf_dir)
    ds = _pq(sf_dir, "events", ["event_type", "user_id"], min_blocks=8)
    return approx_distinct_by_key(ds, "event_type", "user_id", p=12)


SQL_APPROX_DISTINCT_USERS_BY_TYPE = f"""
SELECT event_type, distinct_estimate
FROM read_parquet('{HLL_BY_TYPE_ORACLE_PATH}')
"""


def q_audience_overlap(sf_dir: str):
    """Pairwise audience overlap between event types via HLL set
    algebra (stages/approx.hll_overlap_by_key): per-(batch,key)
    register combiners, sketch-rows-only shuffle, key-cardinality
    blobs to the driver, then |A∪B| from register max and |A∩B| by
    inclusion-exclusion — the "shared users across surfaces" census
    that would otherwise need a distinct-pairs self-join shuffle.
    Register merges are order-free, so estimates match the
    single-process fold bit-for-bit
    (oracle_sketch.oracle_hll_overlap_table, shared pairwise
    kernel)."""
    from ..stages.approx import hll_overlap_by_key
    from .oracle_sketch import oracle_hll_overlap_table

    oracle_hll_overlap_table(sf_dir)
    ds = _pq(sf_dir, "events", ["event_type", "user_id"], min_blocks=8)
    return hll_overlap_by_key(ds, "event_type", "user_id", p=12)


SQL_AUDIENCE_OVERLAP = """
SELECT key_a, key_b, distinct_a, distinct_b, union_est,
       intersection_est, jaccard_est
FROM read_parquet('/tmp/ccray_oracle_hll_overlap.parquet')
"""


def q_heavy_hitters_langs(sf_dir: str):
    """Space-Saving top-8 languages over documents (Metwally et al.
    2005; weighted-replay merge per Agarwal et al. 2012). Partials
    are exact in-batch value_counts, so the summary folds per-batch
    DISTINCT keys, not rows. capacity=64 >= global distinct langs =>
    exact mode (zero error, merge-order free), which is what makes
    the plain GROUP BY oracle valid; the under-capacity bounds are
    pytest-tested in tests/test_sketches.py."""
    from ..stages.approx import heavy_hitters

    ds = _pq(sf_dir, "documents", ["lang"], min_blocks=8)
    t = heavy_hitters(ds, "lang", k=8, capacity=64, fanin=8)
    return t.drop_columns(["err"])  # exact mode: err is identically 0


SQL_HEAVY_HITTERS_LANGS = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt
FROM documents GROUP BY lang
ORDER BY cnt DESC, lang LIMIT 8
"""


def q_events_value_sketch_quantiles(sf_dir: str):
    """KLL quantile sketch (Karnin/Lang/Liberty 2016, deterministic
    compaction) over events.value, capacity 32768 >= the sf0.01 row
    count => exact mode: level 0 never compacts, quantiles are exact
    percentile_disc values regardless of merge-tree shape — the
    SQL-checkable configuration (the knn_ivf_exhaustive pattern: the
    exact config hash-checks the whole partial/merge/query machinery;
    the approximate config's rank-error bound is pytest-tested)."""
    from ..stages.approx import sketch_quantiles

    ds = _pq(sf_dir, "events", ["value"], min_blocks=8)
    return sketch_quantiles(
        ds, "value", qs=[0.1, 0.5, 0.9, 0.99], capacity=32768, fanin=8
    )


SQL_EVENTS_VALUE_SKETCH_QUANTILES = """
SELECT CAST(0.1 AS DOUBLE) AS q,
       percentile_disc(0.1) WITHIN GROUP (ORDER BY value) AS value FROM events
UNION ALL SELECT CAST(0.5 AS DOUBLE),
       percentile_disc(0.5) WITHIN GROUP (ORDER BY value) FROM events
UNION ALL SELECT CAST(0.9 AS DOUBLE),
       percentile_disc(0.9) WITHIN GROUP (ORDER BY value) FROM events
UNION ALL SELECT CAST(0.99 AS DOUBLE),
       percentile_disc(0.99) WITHIN GROUP (ORDER BY value) FROM events
"""


_WORKER_BLOOM_CACHE: dict = {}  # per-worker-process broadcast-filter cache


from ..functions.sketches import knuth32 as _knuth32_np  # SQL-expressible hash


def q_doc_length_quantiles_by_lang(sf_dir: str):
    """Per-language doc-length distribution (p50/p90) via the
    per-group KLL aggregate — the giant-group scale path for grouped
    quantiles: only each group's SKETCH must fit in memory, never the
    group itself (the exact q_events_quantiles needs a group to fit a
    sort block). Exact-capacity configuration => percentile_disc
    parity, SQL-checked."""
    from ..stages.approx import sketch_quantiles_by_key

    ds = _pq(sf_dir, "documents", ["lang", "n_chars"], min_blocks=8)
    return sketch_quantiles_by_key(
        ds, "lang", "n_chars", qs=[0.5, 0.9], capacity=8192
    )


SQL_DOC_LENGTH_QUANTILES_BY_LANG = """
SELECT lang, CAST(0.5 AS DOUBLE) AS q,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS DOUBLE)
         AS value
FROM documents GROUP BY lang
UNION ALL
SELECT lang, CAST(0.9 AS DOUBLE),
       CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars) AS DOUBLE)
FROM documents GROUP BY lang
"""


def q_docs_partitioned_write(sf_dir: str):
    """Hive-partitioned parquet sink round-trip — the resumable-output
    discipline as a tested operator: write documents partitioned by
    lang (one directory per key, so a failed 100 TB run skips finished
    partitions on retry and downstream readers prune by directory),
    then read the partitioned tree back and count per partition. The
    result hash-checks the WHOLE write+read path: a dropped/duplicated
    row or a row filed under the wrong partition changes the counts."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="ccray_part_write_", dir="/tmp")
    try:
        _pq(sf_dir, "documents", ["doc_id", "lang"]).write_parquet(
            out, partition_cols=["lang"]
        )
        back = rd.read_parquet(out)
        return (
            back.groupby("lang")
            .count()
            .rename_columns({"count()": "n_docs"})
            .to_pandas()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_DOCS_PARTITIONED_WRITE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang
"""


def q_host_index(sf_dir: str):
    """Per-host index export — the Common Crawl "host index" product
    re-expressed: one row per host with page count, 200-status count,
    distinct normalized mime count, and total extracted-text bytes —
    what a crawl operator publishes so downstream users can pick
    hosts before touching any WARC.

    Scale shape: parse streams per batch; batches reduce to slim
    (host, mime_norm, n, ok, bytes) partials IN the map (the A4
    combiner discipline — page text contributes only its byte count
    to the wire), then one (host, mime) groupby and a host-scale
    rollup where the distinct-mime count is a Count over the pair
    rows. Hash-checked against the shared-parse sequential fold."""
    import os

    import pyarrow.compute as pc

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_host_index_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_host_index_table(sf_dir)

    def partials(t: pa.Table) -> pa.Table:
        p = parse_extract_batch(t)
        df = pd.DataFrame(
            {
                "host": p.column("host").to_pylist(),
                "mime_norm": [m or "" for m in p.column("mime_norm").to_pylist()],
                "ok": np.asarray(
                    pc.equal(p.column("http_status"), 200).to_pylist(),
                    dtype=object,
                ),
                "bytes": pc.binary_length(
                    pc.coalesce(p.column("text"), "")
                ).to_numpy(zero_copy_only=False),
            }
        )
        df = df[df["host"].notna() & (df["host"] != "")]
        df["ok"] = df["ok"].fillna(False).astype(int)
        g = (
            df.groupby(["host", "mime_norm"], sort=False)
            .agg(n=("ok", "size"), ok=("ok", "sum"), bytes=("bytes", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "host": pa.array(g["host"], pa.string()),
                "mime_norm": pa.array(g["mime_norm"], pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
                "ok": pa.array(g["ok"].to_numpy(), pa.int64()),
                "bytes": pa.array(g["bytes"].to_numpy(), pa.int64()),
            }
        )

    pairs = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(partials, batch_format="pyarrow", batch_size=None)
        .groupby(["host", "mime_norm"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("ok", alias_name="ok"),
            Sum("bytes", alias_name="bytes"),
        )
    )
    agg = pairs.groupby("host").aggregate(
        Sum("n", alias_name="n_pages"),
        Sum("ok", alias_name="n_ok"),
        Count(alias_name="n_mimes"),
        Sum("bytes", alias_name="text_bytes"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": t.column("host"),
                "n_pages": t.column("n_pages").cast(pa.int64()),
                "n_ok": t.column("n_ok").cast(pa.int64()),
                "n_mimes": t.column("n_mimes").cast(pa.int64()),
                "text_bytes": t.column("text_bytes").cast(pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_HOST_INDEX = """
SELECT host, n_pages, n_ok, n_mimes, text_bytes
FROM read_parquet('/tmp/ccray_oracle_host_index.parquet')
"""


def q_orphan_pages(sf_dir: str):
    """Orphan-page detection: per host, how many of its pages NO
    other page in the corpus links to (self-links don't count) — the
    webgraph-hygiene census a site-health or crawl-completeness
    review starts from (an orphan is only reachable via sitemap or
    direct seed, never by following links).

    Scale shape: pages reduce to slim (host, url_fp) rows; link
    targets resolve through the crawl's memoized
    canonicalize+fp64 parity kernel into a per-batch-distinct int64
    fp stream; the orphan test is ONE ANTI sort-merge join on
    url_fp (the J5 frontier-minus-seen operator re-aimed at the link
    graph), then two host-scale groupbys merged with a left join.
    Hash-checked against the shared-kernel sequential fold."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.joins import merge_join
    from ..stages.links import resolve_links
    from ..stages.parse_extract import parse_extract_batch
    from .crawl import _canon_memo_lookup
    from .oracle_sketch import oracle_orphan_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_orphan_table(sf_dir)

    parsed = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url", "host", "url_fp"]),
            batch_format="pyarrow",
        )
        .materialize()  # slim parse projection feeds BOTH sides below
    )
    pages = parsed.map_batches(
        lambda t: t.select(["host", "url_fp"]), batch_format="pyarrow"
    )

    def target_fps(t: pa.Table) -> pa.Table:
        out: set[int] = set()
        for u, a, b, fp in zip(
            t.column("url").to_pylist(),
            t.column("anchors").to_pylist(),
            t.column("base_url").to_pylist(),
            t.column("url_fp").to_pylist(),
        ):
            if not a:
                continue
            hrefs = a.split("\n")[0::2]
            for link in resolve_links(u, hrefs, b):
                hit = _canon_memo_lookup(link)
                if hit == () or hit[2] == fp:  # self-links don't count
                    continue
                out.add(hit[2])
        return pa.table({"tfp": pa.array(sorted(out), pa.int64())})

    targets = parsed.map_batches(target_fps, batch_format="pyarrow")
    orphans = merge_join(pages, targets, "url_fp", "tfp", [], how="anti")

    def count_col(name):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "host": t.column("host"),
                    name: t.column("count()").cast(pa.int64()),
                }
            )

        return f

    per_host = pages.groupby("host").count().map_batches(
        count_col("n_pages"), batch_format="pyarrow"
    )
    per_orph = orphans.groupby("host").count().map_batches(
        count_col("n_orphans"), batch_format="pyarrow"
    )
    joined = merge_join(
        per_host, per_orph, "host", "host", ["n_orphans"], how="left"
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n_pages").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.nan_to_num(
            t.column("n_orphans").to_numpy(zero_copy_only=False).astype(
                np.float64
            ),
            nan=0.0,
        ).astype(np.int64)
        return pa.table(
            {
                "host": t.column("host"),
                "n_pages": pa.array(n, pa.int64()),
                "n_orphans": pa.array(o, pa.int64()),
                "orphan_frac": pa.array(
                    np.round(o / np.maximum(n, 1), 6) + 0.0, pa.float64()
                ),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


SQL_ORPHAN_PAGES = """
SELECT host, n_pages, n_orphans, orphan_frac
FROM read_parquet('/tmp/ccray_oracle_orphans.parquet')
"""


def q_robots_audit(sf_dir: str):
    """Robots-compliance audit: per host, how many of its archived
    URLs the host's robots.txt disallows for our agent, plus the
    declared Crawl-delay — the report a crawl operator runs over an
    EXISTING archive after a policy change ("which holdings would
    today's robots have blocked?"). Exercises the real RFC 9309
    parser (state/robots.parse_robots_txt: wildcard + $ patterns,
    longest-match with Allow-wins tie, per-agent group selection
    ignoring the badbot group) over a deterministic per-host
    robots.txt BODY (oracle_sketch.robots_body_for_host).

    Scale shape: pages reduce to (host, blocked) partials in the map
    — rules parse ONCE per distinct host per batch behind a
    worker-local memo (T1 singleton discipline), the per-URL check is
    a compiled-regex match; ONE host-scale groupby; crawl_delay is a
    pure function of host re-derived in finalize (never rides an
    exchange). Hash-checked against the shared-kernel sequential
    fold."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.parse_extract import parse_extract_batch
    from ..state.robots import parse_robots_txt, path_of
    from .oracle_sketch import oracle_robots_audit_table, robots_body_for_host

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_robots_audit_table(sf_dir)
    _memo: dict[str, object] = {}

    def rules_of(h: str):
        r = _memo.get(h)
        if r is None:
            r = parse_robots_txt(robots_body_for_host(h), agent="ccray")
            _memo[h] = r
        return r

    def partials(t: pa.Table) -> pa.Table:
        p = parse_extract_batch(t)
        acc: dict[str, list] = {}
        for h, cu in zip(
            p.column("host").to_pylist(), p.column("canon_url").to_pylist()
        ):
            if not h or not cu:
                continue
            a = acc.setdefault(h, [0, 0])
            a[0] += 1
            if not rules_of(h).allowed(path_of(cu)):
                a[1] += 1
        hosts = list(acc)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n": pa.array([acc[h][0] for h in hosts], pa.int64()),
                "blocked": pa.array([acc[h][1] for h in hosts], pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(partials, batch_format="pyarrow", batch_size=None)
        .groupby("host")
        .aggregate(
            Sum("n", alias_name="n_urls"),
            Sum("blocked", alias_name="n_blocked"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        hosts = t.column("host").to_pylist()
        delays = []
        for h in hosts:
            cd = rules_of(h).crawl_delay
            delays.append(float(cd) if cd is not None else -1.0)
        return pa.table(
            {
                "host": t.column("host"),
                "n_urls": t.column("n_urls").cast(pa.int64()),
                "n_blocked": t.column("n_blocked").cast(pa.int64()),
                "crawl_delay": pa.array(delays, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_ROBOTS_AUDIT = """
SELECT host, n_urls, n_blocked, crawl_delay
FROM read_parquet('/tmp/ccray_oracle_robots_audit.parquet')
"""


def q_cache_freshness(sf_dir: str):
    """HTTP cache-freshness census (RFC 9111): per host, how many
    responses are cacheable and their total/average freshness
    lifetime — max-age first, then Expires - Date, then the §4.2.2
    heuristic 10% of (Date - Last-Modified); no-cache/no-store
    excluded. Freshness drives recrawl economics: a host serving
    long-lived responses can be revisited from cache.

    Scale shape: the shared freshness_seconds integer kernel
    (oracle_sketch.py) runs vectorized-per-batch right after parse;
    pages reduce to (host, n, cacheable, total_s) partials in the
    map, ONE host-scale groupby. Hash-checked vs the shared-parse
    sequential fold using the identical kernel."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_freshness_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_freshness_table(sf_dir)

    def partials(t: pa.Table) -> pa.Table:
        p = parse_extract_batch(t)
        hosts = p.column("host").to_pylist()
        ma = p.column("max_age").to_numpy(zero_copy_only=False).astype(np.int64)
        ex = p.column("expires").to_numpy(zero_copy_only=False).astype(np.int64)
        hd = p.column("http_date").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        lm = p.column("last_modified").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        fl = p.column("cache_flags").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # vectorized freshness_seconds (same precedence as the shared
        # integer kernel, replicated branch-free)
        by_age = ma
        by_exp = np.maximum(ex - hd, 0) // 1000
        by_heu = ((hd - lm) // 1000) // 10
        fs = np.where(
            (fl & 3) != 0,
            -1,
            np.where(
                ma >= 0,
                by_age,
                np.where(
                    (ex >= 0) & (hd >= 0),
                    by_exp,
                    np.where(
                        (lm >= 0) & (hd >= 0) & (hd >= lm), by_heu, -1
                    ),
                ),
            ),
        )
        df = pd.DataFrame(
            {
                "host": hosts,
                "n": 1,
                "cacheable": (fs >= 0).astype(np.int64),
                "total_s": np.where(fs >= 0, fs, 0),
            }
        )
        df = df[[bool(h) for h in df["host"]]]
        g = df.groupby("host", sort=False).sum().reset_index()
        return pa.table(
            {
                "host": pa.array(g["host"], pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
                "cacheable": pa.array(g["cacheable"].to_numpy(), pa.int64()),
                "total_s": pa.array(g["total_s"].to_numpy(), pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(partials, batch_format="pyarrow", batch_size=None)
        .groupby("host")
        .aggregate(
            Sum("n", alias_name="n_pages"),
            Sum("cacheable", alias_name="n_cacheable"),
            Sum("total_s", alias_name="total_freshness_s"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        n_c = (
            t.column("n_cacheable").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
        )
        tot = (
            t.column("total_freshness_s")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        avg = np.where(n_c > 0, np.round(tot / np.maximum(n_c, 1), 6), 0.0)
        return pa.table(
            {
                "host": t.column("host"),
                "n_pages": t.column("n_pages").cast(pa.int64()),
                "n_cacheable": t.column("n_cacheable").cast(pa.int64()),
                "total_freshness_s": t.column("total_freshness_s").cast(
                    pa.int64()
                ),
                "avg_freshness_s": pa.array(avg + 0.0, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_CACHE_FRESHNESS = """
SELECT host, n_pages, n_cacheable, total_freshness_s, avg_freshness_s
FROM read_parquet('/tmp/ccray_oracle_freshness.parquet')
"""


def q_phrase_search(sf_dir: str, phrase: tuple = ("table", "hash")):
    """Positional phrase search — the retrieval feature BM25 can't
    express: find every document where the query terms appear as a
    CONSECUTIVE run, and count the occurrences. The inverted-index
    companion op (an index with positions answers this from postings;
    here the scan builds only the queried terms' postings on the
    fly — a single-phrase query never needs the full index).

    Scale shape: ONE tokenize pass emits (term_idx, k) rows for the
    phrase terms ONLY (filter-at-source — postings-scale, not
    corpus-scale), composite key k = doc_id * 2^20 + position; each
    adjacency is a SEMI sort-merge join of term_i's postings against
    term_{i-1}'s shifted key (the recrawl_schedule +1-shift
    discipline), len(phrase) - 1 joins total; the doc rollup is one
    postings-scale groupby. Real-SQL oracle: DuckDB rebuilds
    positions with generate_subscripts and self-joins on pos + 1."""
    import pyarrow.compute as pc

    from ..stages.joins import merge_join

    M = 1 << 20  # position space per doc; synth docs are far shorter
    docs = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4)
    terms = list(phrase)

    def postings(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        toks = (
            toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        )
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        flat = toks.flatten()
        n_per = np.diff(offsets)
        assert int(n_per.max(initial=0)) < M, "doc longer than position space"
        doc_rep = np.repeat(d, n_per)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offsets[:-1], n_per
        )
        out_idx, out_k = [], []
        for i, term in enumerate(terms):
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            out_idx.append(np.full(int(m.sum()), i, dtype=np.int64))
            out_k.append(doc_rep[m] * M + pos[m])
        return pa.table(
            {
                "term_idx": pa.array(np.concatenate(out_idx)),
                "k": pa.array(np.concatenate(out_k)),
            }
        )

    tp = docs.map_batches(postings, batch_format="pyarrow").materialize()

    def pos_of(i):
        return tp.map_batches(
            lambda t, i=i: t.filter(
                pc.equal(t.column("term_idx"), i)
            ).select(["k"]),
            batch_format="pyarrow",
        )

    occ = pos_of(0)
    for i in range(1, len(terms)):
        shifted = occ.map_batches(
            lambda t: pa.table({"k1": pc.add(t.column("k"), 1)}),
            batch_format="pyarrow",
        )
        occ = merge_join(pos_of(i), shifted, "k", "k1", [], how="semi")

    def to_doc(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(k // M)})

    return (
        occ.map_batches(to_doc, batch_format="pyarrow")
        .groupby("doc_id")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "n_occurrences": t.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


SQL_PHRASE_SEARCH = """
WITH toks AS (
  SELECT doc_id,
         UNNEST(regexp_split_to_array(text, '\\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(text, '\\s+'), 1) AS pos
  FROM documents
),
hits AS (SELECT doc_id, tok, pos FROM toks WHERE tok IN ('table', 'hash'))
SELECT a.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM hits a
JOIN hits b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
WHERE a.tok = 'table' AND b.tok = 'hash'
GROUP BY a.doc_id
"""


def q_cdc_dedup(sf_dir: str):
    """Content-defined-chunking dedup census (Muthitacharoen et al.,
    LBFS, SOSP 2001 — the technique web archives apply to WARC
    payload streams): per source, chunk every document's UTF-8 bytes
    at rolling-hash boundaries (functions/cdc.py, ~64 B average,
    vectorized window hash) and report chunk-level dedup potential —
    total vs distinct chunks and bytes, and the byte dedup ratio a
    storage planner reads before enabling chunk-store dedup.

    Scale shape: chunks ride the wire as (source, fp:int64, len)
    with per-batch pair pre-aggregation (the A4 combiner discipline),
    ONE (source, fp, len) groupby exchange — chunk-scale, never the
    text — then a source-scale rollup; only #sources rows reach the
    driver. Hash-checked against the sequential dict fold sharing
    the same chunking kernel."""
    from ..functions.cdc import cdc_chunk_fps
    from .oracle_sketch import oracle_cdc_table

    oracle_cdc_table(sf_dir)
    docs = _pq(sf_dir, "documents", ["source", "text"], min_blocks=4)

    def chunk_rows(t: pa.Table) -> pa.Table:
        agg: dict[tuple, int] = {}
        for src, text in zip(
            t.column("source").to_pylist(), t.column("text").to_pylist()
        ):
            for fp, ln in cdc_chunk_fps((text or "").encode("utf-8")):
                k = (src, fp, ln)
                agg[k] = agg.get(k, 0) + 1
        keys = list(agg)
        return pa.table(
            {
                "source": pa.array([k[0] for k in keys], pa.string()),
                "fp": pa.array([k[1] for k in keys], pa.int64()),
                "len": pa.array([k[2] for k in keys], pa.int64()),
                "cnt": pa.array([agg[k] for k in keys], pa.int64()),
            }
        )

    pairs = (
        docs.map_batches(chunk_rows, batch_format="pyarrow")
        .groupby(["source", "fp", "len"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def to_partials(t: pa.Table) -> pa.Table:
        ln = t.column("len").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": t.column("source"),
                "n_chunks": pa.array(cnt),
                "n_distinct": pa.array(np.ones(len(cnt), dtype=np.int64)),
                "total_bytes": pa.array(cnt * ln),
                "distinct_bytes": pa.array(ln),
            }
        )

    agg = (
        pairs.map_batches(to_partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_chunks", alias_name="n_chunks"),
            Sum("n_distinct", alias_name="n_distinct"),
            Sum("total_bytes", alias_name="total_bytes"),
            Sum("distinct_bytes", alias_name="distinct_bytes"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        tb = t.column("total_bytes").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        db = t.column("distinct_bytes").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        ratio = np.where(tb > 0, np.round(1.0 - db / np.maximum(tb, 1), 6), 0.0)
        return pa.table(
            {
                "source": t.column("source"),
                "n_chunks": t.column("n_chunks").cast(pa.int64()),
                "n_distinct": t.column("n_distinct").cast(pa.int64()),
                "total_bytes": t.column("total_bytes").cast(pa.int64()),
                "distinct_bytes": t.column("distinct_bytes").cast(pa.int64()),
                "dedup_ratio": pa.array(ratio + 0.0, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_CDC_DEDUP = """
SELECT source, n_chunks, n_distinct, total_bytes, distinct_bytes, dedup_ratio
FROM read_parquet('/tmp/ccray_oracle_cdc.parquet')
"""


def q_compression_ratio(sf_dir: str, level: int = 6):
    """Compression-ratio quality signal: per document, UTF-8 byte
    length and zlib(level=6) compressed length, plus an integer-exact
    repetitiveness flag (10*n_gz < 3*n_raw — compressing below ~0.3
    marks boilerplate/templated text; highly repetitive pages
    compress far better than natural prose, the heuristic web-corpus
    cleanrooms use alongside the Gopher gram rules). zlib at a fixed
    level is bit-deterministic for a given input, so both counts are
    exact ints — no rounding discipline. Stateless one-pass map, the
    compression runs in C per row off the Arrow UTF-8 buffer.
    Hash-checked vs a sequential scan sharing only the zlib call."""
    import zlib

    from .oracle_sketch import oracle_compress_table

    oracle_compress_table(sf_dir, level)

    def comp(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = len(texts)
        n_raw = np.zeros(n, dtype=np.int64)
        n_gz = np.zeros(n, dtype=np.int64)
        for i, s in enumerate(texts):
            b = (s or "").encode("utf-8")
            n_raw[i] = len(b)
            n_gz[i] = len(zlib.compress(b, level))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_raw": pa.array(n_raw),
                "n_gz": pa.array(n_gz),
                "repetitive": pa.array((10 * n_gz < 3 * n_raw).astype(np.int64)),
            }
        )

    return _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8).map_batches(
        comp, batch_format="pyarrow"
    )


SQL_COMPRESSION_RATIO = """
SELECT doc_id, n_raw, n_gz,
       CAST(10 * n_gz < 3 * n_raw AS BIGINT) AS repetitive
FROM read_parquet('/tmp/ccray_oracle_compress.parquet')
"""


def q_incremental_dedup(sf_dir: str, cutoff: str = "src5"):
    """Incremental snapshot dedup — the production pattern when a new
    crawl lands next to an already-curated corpus: keep only NEW-slice
    documents (source >= cutoff) whose content fingerprint does not
    appear anywhere in the OLD slice (source < cutoff). Content
    identity is the 64-bit Rabin fp of the text (the crawl URL-seen
    convention: a fp collision counts as a dup — documented, ~n/2^64).

    Scale shape — the full asymmetric-dedup discipline in one op:
    (1) the fp table is computed ONCE and materialized slim
    (doc_id, source, text_fp ~30 B/row);
    (2) a corpus-scale bloom over the OLD fps is built as a
    distributed OR-merge reduce (stages/dedup.build_bloom_distributed
    — no driver-side key collection);
    (3) the bloom broadcast drops definitely-new rows from the join
    entirely — ONLY maybe-dup suspects enter the exact sort-merge
    ANTI join, so the exchange is bounded by true dups + the filter's
    false-positive rate, not the new-slice size;
    (4) definite-new rows union the anti-join survivors. Exact
    despite the lossy prefilter (false positives only). SQL-checked
    via the shared fp oracle table + NOT IN."""
    import pyarrow.parquet as _pqm

    from ..functions.fingerprint import fp64
    from ..stages.dedup import build_bloom_distributed
    from ..stages.joins import merge_join
    from ..state.bloom import BloomFilter
    from .oracle_sketch import oracle_doc_fp_table

    oracle_doc_fp_table(sf_dir)

    def fp_batch(t: pa.Table) -> pa.Table:
        fps = np.fromiter(
            (fp64(x or "") for x in t.column("text").to_pylist()),
            dtype=np.int64,
            count=len(t),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "text_fp": pa.array(fps),
            }
        )

    fps = (
        _pq(sf_dir, "documents", ["doc_id", "source", "text"], min_blocks=8)
        .map_batches(fp_batch, batch_format="pyarrow")
        .materialize()  # slim; feeds the bloom build, the join, both slices
    )
    old = fps.filter(expr=f"source < '{cutoff}'").select_columns(["text_fp"])
    n_upper = _pqm.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    bloom = build_bloom_distributed(old, "text_fp", num_elements=max(n_upper, 1))
    blob = ray.put(bloom.to_bytes())
    blob_key = blob.hex()

    def split(t: pa.Table, want_suspect: bool) -> pa.Table:
        bf = _WORKER_BLOOM_CACHE.get(blob_key)
        if bf is None:
            bf = BloomFilter.from_bytes(ray.get(blob))
            _WORKER_BLOOM_CACHE.clear()
            _WORKER_BLOOM_CACHE[blob_key] = bf
        keys = t.column("text_fp").to_numpy(zero_copy_only=False)
        maybe = bf.maybe_present_batch(keys)
        return t.filter(pa.array(maybe if want_suspect else ~maybe))

    new = fps.filter(expr=f"source >= '{cutoff}'")
    definite = new.map_batches(
        lambda t: split(t, want_suspect=False), batch_format="pyarrow"
    )
    suspects = new.map_batches(
        lambda t: split(t, want_suspect=True), batch_format="pyarrow"
    )
    survivors = merge_join(
        suspects,
        old,
        left_on="text_fp",
        right_on="text_fp",
        right_cols=[],
        how="anti",
    )
    return definite.union(survivors).select_columns(["doc_id", "source", "text_fp"])


SQL_INCREMENTAL_DEDUP = """
WITH fp AS (
  SELECT f.doc_id, d.source, f.text_fp
  FROM read_parquet('/tmp/ccray_oracle_doc_fp.parquet') f
  JOIN documents d USING (doc_id)
)
SELECT doc_id, source, text_fp FROM fp
WHERE source >= 'src5'
  AND text_fp NOT IN (SELECT text_fp FROM fp WHERE source < 'src5')
"""


def q_jsonl_roundtrip(sf_dir: str):
    """JSONL source/sink round-trip — the interchange format modern
    LLM data stacks actually exchange (one JSON object per line,
    sharded): write the documents table as JSONL shards with Ray's
    native json sink, read the shard tree back with the native
    source, and emit per-document md5 digests of the text. The hash
    check proves BYTE fidelity through JSON string escaping both ways
    — a mangled escape, lost row, or re-encoded character changes a
    digest. Scale: the sink/source stream shard-per-block; nothing
    materializes beyond the returned slim digest rows."""
    import shutil
    import tempfile

    from ..functions.digests import md5_hex_column

    out = tempfile.mkdtemp(prefix="ccray_jsonl_", dir="/tmp")
    try:
        _pq(sf_dir, "documents", ["doc_id", "lang", "source", "text"],
            min_blocks=8).write_json(out)

        def digest(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t.column("doc_id").cast(pa.int64()),
                    "lang": t.column("lang"),
                    "source": t.column("source"),
                    "text_md5": pa.array(
                        md5_hex_column(t.column("text")), pa.string()
                    ),
                }
            )

        return rd.read_json(out).map_batches(
            digest, batch_format="pyarrow"
        ).to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_JSONL_ROUNDTRIP = """
SELECT doc_id, lang, source, md5(text) AS text_md5 FROM documents
"""


def q_csv_roundtrip(sf_dir: str):
    """CSV source/sink round-trip (the spreadsheet-adjacent sibling of
    q_jsonl_roundtrip): write the documents table as sharded CSV with
    Ray's native sink (Arrow CSV writer: RFC-4180 quoting), read the
    shard tree back with the native source, and emit per-document md5
    text digests — the hash proves byte fidelity through CSV quoting/
    escaping both ways, which is exactly where naive CSV pipelines
    corrupt corpora (embedded quotes, commas, newlines)."""
    import shutil
    import tempfile

    from ..functions.digests import md5_hex_column

    out = tempfile.mkdtemp(prefix="ccray_csv_", dir="/tmp")
    try:
        _pq(sf_dir, "documents", ["doc_id", "lang", "source", "text"],
            min_blocks=8).write_csv(out)

        def digest(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t.column("doc_id").cast(pa.int64()),
                    "lang": t.column("lang"),
                    "source": t.column("source"),
                    "text_md5": pa.array(
                        md5_hex_column(t.column("text")), pa.string()
                    ),
                }
            )

        return rd.read_csv(out).map_batches(
            digest, batch_format="pyarrow"
        ).to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_CSV_ROUNDTRIP = """
SELECT doc_id, lang, source, md5(text) AS text_md5 FROM documents
"""


def q_shuffle_export(sf_dir: str, seed: int = 42, num_shards: int = 8):
    """Deterministic seeded global shuffle + sharded export — the
    training-data publication step: every document gets a
    splitmix64(doc_id, seed) shuffle key, is routed to shard
    (key mod num_shards, unsigned), and the corpus is written
    hive-partitioned by shard (one directory per shard: a failed
    100 TB export resumes by skipping finished shard directories, and
    the loader reads shards independently in skey order). Unlike
    ds.random_shuffle this is reproducible across runs/cluster sizes
    and needs NO all-to-all exchange here — routing is a stateless
    map; the partitioned sink does the grouping. The returned
    (shard, doc_id, skey) rows hash-check the whole key+write+read
    path against a sequential scalar-kernel oracle."""
    import shutil
    import tempfile

    from ..functions.fingerprint import splitmix64_batch
    from .oracle_sketch import oracle_shuffle_table

    oracle_shuffle_table(sf_dir, seed, num_shards)

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sk = splitmix64_batch(ids.astype(np.int64), seed)
        shard = (sk.view(np.uint64) % np.uint64(num_shards)).astype(np.int64)
        return pa.table(
            {
                "shard": pa.array(shard),
                "doc_id": pa.array(ids.astype(np.int64)),
                "skey": pa.array(sk),
            }
        )

    out = tempfile.mkdtemp(prefix="ccray_shuffle_export_", dir="/tmp")
    try:
        _pq(sf_dir, "documents", ["doc_id"], min_blocks=8).map_batches(
            keyed, batch_format="pyarrow"
        ).write_parquet(out, partition_cols=["shard"])
        back = rd.read_parquet(out)

        def norm(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "shard": t.column("shard").cast(pa.int64()),
                    "doc_id": t.column("doc_id").cast(pa.int64()),
                    "skey": t.column("skey").cast(pa.int64()),
                }
            )

        return back.map_batches(norm, batch_format="pyarrow").to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_SHUFFLE_EXPORT = """
SELECT shard, doc_id, skey
FROM read_parquet('/tmp/ccray_oracle_shuffle.parquet')
"""


def q_docs_reservoir_per_lang(sf_dir: str, k: int = 5, seed: int = 42):
    """Deterministic per-group reservoir sample: the k docs per
    language with the SMALLEST splitmix64(doc_id, seed) keys — a
    uniform-without-replacement group sample that is reproducible
    across runs and cluster sizes (the property driver-side
    random.sample and ds.random_shuffle both lack), the standard
    inspect-a-slice tool for per-language curation QA.

    Scale shape: key assignment is a stateless map;
    stages/rank.grouped_topk pre-combines a per-block top-k before
    the ONE sort(lang) exchange, so the wire carries at most
    k * langs * blocks slim rows, never the corpus. Hash-checked via
    the shared splitmix64 oracle table (scalar kernel) + a window
    rank in SQL."""
    from ..functions.fingerprint import splitmix64_batch
    from ..stages.rank import grouped_topk
    from .oracle_sketch import oracle_shuffle_table

    oracle_shuffle_table(sf_dir, seed)  # skey depends only on (doc_id, seed)

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "lang": t.column("lang"),
                "doc_id": pa.array(ids),
                "skey": pa.array(splitmix64_batch(ids, seed)),
            }
        )

    ds = _pq(sf_dir, "documents", ["doc_id", "lang"], min_blocks=8).map_batches(
        keyed, batch_format="pyarrow"
    )
    return grouped_topk(
        ds, group_col="lang", order_col="skey", k=k,
        tiebreak_col="doc_id", descending=False,
    )


SQL_DOCS_RESERVOIR_PER_LANG = """
SELECT lang, doc_id, skey, rank FROM (
  SELECT d.lang, d.doc_id, o.skey,
         ROW_NUMBER() OVER (
           PARTITION BY d.lang ORDER BY o.skey, d.doc_id
         ) AS rank
  FROM documents d
  JOIN read_parquet('/tmp/ccray_oracle_shuffle.parquet') o USING (doc_id)
) WHERE rank <= 5
"""


def q_source_contamination(sf_dir: str, n: int = 8):
    """Cross-source contamination matrix: for every source pair, how
    many DISTINCT word n-grams they share — the pairwise overlap scan
    run before mixing corpora (a benchmark slice leaking into a crawl
    slice shows up as an outlier cell; the all-pairs generalization of
    q_decontaminate's one-eval-set check).

    Scale shape: gram keys ride as int64 fingerprints
    (functions/minhash.gram_fp_rows), never strings; (gram, source)
    rows are deduplicated in-batch, made globally distinct by one
    groupby, then OR-folded into a per-gram source BITMASK (sum of
    distinct per-source bits == OR; sources bounded <= 62, asserted,
    collected once from a tiny distributed distinct). Pair counts are
    accumulated per batch over the mask column's unique values (at
    most 2^S distinct masks, in practice a handful) and folded by a
    final S^2-row groupby. Gram keys never appear in the output, so
    the fp-keyed run is hash-comparable to the string-keyed SQL
    oracle (fingerprint collisions ~V^2/2^64, negligible)."""
    import pyarrow.compute as pc

    from ..functions.minhash import gram_fp_rows

    src_names = sorted(
        r["source"]
        for r in _pq(sf_dir, "documents", ["source"], min_blocks=4)
        .groupby("source")
        .count()
        .take_all()
    )
    assert len(src_names) <= 62, "bitmask packing needs <= 62 sources"
    smap = {s: i for i, s in enumerate(src_names)}

    def gram_src_rows(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"g": pa.array([], pa.int64()), "bit": pa.array([], pa.int64())}
        )
        if len(t) == 0:
            return empty
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        d_idx, _pos, gfp = gram_fp_rows(toks, n)
        if len(d_idx) == 0:
            return empty
        src = np.array(
            [smap[s] for s in t.column("source").to_pylist()], dtype=np.int64
        )[d_idx]
        order = np.lexsort((src, gfp))
        g2, s2 = gfp[order], src[order]
        keep = np.r_[True, (g2[1:] != g2[:-1]) | (s2[1:] != s2[:-1])]
        return pa.table(
            {
                "g": pa.array(g2[keep]),
                "bit": pa.array(np.int64(1) << s2[keep]),
            }
        )

    masks = (
        _pq(sf_dir, "documents", ["source", "text"], min_blocks=8)
        .map_batches(gram_src_rows, batch_format="pyarrow")
        .groupby(["g", "bit"])
        .count()  # global distinct (gram, source)
        .groupby("g")
        .aggregate(Sum("bit", alias_name="mask"))  # sum of distinct bits == OR
    )

    S = len(src_names)

    def pair_counts(t: pa.Table) -> pa.Table:
        mat = np.zeros((S, S), dtype=np.int64)
        m = t.column("mask").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(m, return_counts=True)
        for mask, c in zip(uniq.tolist(), cnt.tolist()):
            bits = [i for i in range(S) if mask >> i & 1]
            for ai in range(len(bits)):
                for bi in range(ai + 1, len(bits)):
                    mat[bits[ai], bits[bi]] += c
        a, b = np.nonzero(mat)
        return pa.table(
            {
                "ai": pa.array(a.astype(np.int64)),
                "bi": pa.array(b.astype(np.int64)),
                "n": pa.array(mat[a, b]),
            }
        )

    folded = (
        masks.map_batches(pair_counts, batch_format="pyarrow")
        .groupby(["ai", "bi"])
        .aggregate(Sum("n", alias_name="n_shared"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        names = pa.array(src_names)
        return pa.table(
            {
                "source_a": names.take(t.column("ai")),
                "source_b": names.take(t.column("bi")),
                "n_shared": t.column("n_shared").cast(pa.int64()),
            }
        )

    return folded.map_batches(finalize, batch_format="pyarrow")


SQL_SOURCE_CONTAMINATION = """
WITH toks AS (
  SELECT source, regexp_split_to_array(text, '\\s+') AS arr FROM documents
), g AS (
  SELECT DISTINCT source, array_to_string(arr[i:i+7], ' ') AS gram
  FROM toks, LATERAL UNNEST(generate_series(1, len(arr) - 7, 1)) t(i)
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2
"""


def q_source_kl_divergence(sf_dir: str):
    """Per-source token-distribution drift: KL(source || corpus) in
    bits over whitespace-token unigrams — the corpus statistic behind
    domain-mixture design (how far each source's language sits from
    the pooled distribution; used to spot over/under-weighted slices
    next to q_source_mixture_weights).

    Scale shape: tokens are per-batch dictionary-encoded and
    pre-aggregated to (token_fp64, source, cnt) rows — the wire
    carries int64 fingerprints and counts, never token strings (fp64
    collisions merging two tokens are ~V²/2⁶⁵, negligible corpus
    statistics noise; documented, not eliminated). One slim
    groupby(tfp, source), one groupby(tfp) for corpus totals, one
    merge_join(tfp), then the per-source totals ride to the driver
    (bounded by the number of sources) and broadcast into the term
    pass; final fold is a tiny groupby(source). Exact integer token
    counts per source are emitted alongside so the hash pins more
    than the rounded float."""
    import pyarrow.compute as pc

    from ..functions.fingerprint import fp64_batch
    from ..stages.joins import merge_join

    def tok_rows(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tfp": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        keep = pc.not_equal(pc.utf8_length(flat), 0)  # \S+ semantics
        row_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        row_idx = row_idx[keep.to_numpy(zero_copy_only=False)]
        flat = flat.filter(keep)
        if len(flat) == 0:
            return empty
        tok_dic = flat.dictionary_encode()
        src_dic = t.column("source").dictionary_encode()
        if isinstance(src_dic, pa.ChunkedArray):
            src_dic = src_dic.combine_chunks()
        n_src = len(src_dic.dictionary)
        tok_idx = tok_dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        src_idx = src_dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        combined = tok_idx * n_src + src_idx[row_idx]
        uniq, cnt = np.unique(combined, return_counts=True)
        tfp_by_dic = fp64_batch(tok_dic.dictionary.to_pylist())
        return pa.table(
            {
                "tfp": pa.array(tfp_by_dic[uniq // n_src]),
                "source": src_dic.dictionary.take(pa.array(uniq % n_src)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    docs = _pq(sf_dir, "documents", ["source", "text"], min_blocks=8)
    # materialized: cs feeds THREE consumers (corpus totals, per-source
    # totals, the join) — without this the corpus is tokenized three
    # times; the materialized table is vocabulary-scale (V x S slim
    # int/str rows), not corpus-scale.
    cs = (
        docs.map_batches(tok_rows, batch_format="pyarrow")
        .groupby(["tfp", "source"])
        .aggregate(Sum("cnt", alias_name="c"))
        .materialize()
    )
    cc = cs.groupby("tfp").aggregate(Sum("c", alias_name="c_all"))
    # per-source totals: bounded by the number of sources — driver-safe
    ns = {
        r["source"]: r["n_s"]
        for r in cs.groupby("source")
        .aggregate(Sum("c", alias_name="n_s"))
        .take_all()
    }
    n_all = float(sum(ns.values()))

    def terms(t: pa.Table) -> pa.Table:
        src = t.column("source").to_pylist()
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        c_all = t.column("c_all").to_numpy(zero_copy_only=False).astype(np.float64)
        n_s = np.array([float(ns[s]) for s in src])
        p_s = c / n_s
        term = p_s * np.log2(p_s / (c_all / n_all))
        return pa.table({"source": t.column("source"), "term": pa.array(term)})

    out = (
        merge_join(cs, cc, left_on="tfp", right_on="tfp", right_cols=["c_all"])
        .map_batches(terms, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("term", alias_name="kl"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        src = t.column("source")
        return pa.table(
            {
                "source": src,
                "n_tokens": pa.array(
                    [int(ns[s]) for s in src.to_pylist()], pa.int64()
                ),
                "kl_bits": pc.round(t.column("kl"), ndigits=6),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


SQL_SOURCE_KL_DIVERGENCE = """
WITH tok AS (
  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents
), cs AS (
  SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
), cc AS (
  SELECT t, SUM(c) AS c_all FROM cs GROUP BY 1
), ns AS (
  SELECT source, SUM(c) AS n_s FROM cs GROUP BY 1
), n AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS n_all FROM cs
)
SELECT cs.source,
       CAST(ns.n_s AS BIGINT) AS n_tokens,
       ROUND(SUM((cs.c / ns.n_s) * log2((cs.c / ns.n_s) / (cc.c_all / n.n_all))), 6)
         AS kl_bits
FROM cs
JOIN cc USING (t)
JOIN ns USING (source)
CROSS JOIN n
GROUP BY cs.source, ns.n_s
"""


def q_tfidf_top_terms(sf_dir: str):
    """TF-IDF top-3 terms per document — the IR/LLM feature pipeline:
    per-doc term frequencies computed IN-BATCH (a document lives in
    one row, so tf needs no shuffle), document frequency via one
    groupby(token), idf attached by the union+sort(token) merge_join,
    ranking via grouped_topk's pre-combined per-group top-k. The
    score is ROUNDED to 6 decimals BEFORE ranking on both sides so
    libm-vs-DuckDB ln() ulp differences can never reorder the top-k;
    ties at equal rounded scores break on the token string."""
    import pyarrow.compute as pc

    from ..stages.joins import merge_join
    from ..stages.rank import grouped_topk

    n_docs = float(
        __import__("pyarrow.parquet", fromlist=["read_metadata"]).read_metadata(
            f"{sf_dir}/documents.parquet"
        ).num_rows
    )

    def tf_rows(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        doc_rep = np.repeat(
            t.column("doc_id").to_numpy(zero_copy_only=False),
            pc.list_value_length(toks).to_numpy(zero_copy_only=False),
        )
        tok = flat.to_numpy(zero_copy_only=False)
        keep = tok != ""
        df_ = pd.DataFrame({"doc_id": doc_rep[keep], "token": tok[keep]})
        g = df_.groupby(["doc_id", "token"], sort=True).size().reset_index(name="tf")
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                "token": pa.array(g["token"].tolist(), pa.string()),
                "tf": pa.array(g["tf"].to_numpy(), pa.int64()),
            }
        )

    tf = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8).map_batches(
        tf_rows, batch_format="pyarrow"
    )
    df_counts = (
        tf.groupby("token")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "token": t.column("token"),
                    "df": t.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    scored = merge_join(
        tf, df_counts, left_on="token", right_on="token",
        right_cols=["df"], how="inner",
    )

    def score(t: pa.Table) -> pa.Table:
        tfv = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        tfidf = np.round(tfv * np.log(n_docs / dfv), 6)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "token": t.column("token"),
                "tf": t.column("tf"),
                "tfidf": pa.array(tfidf, pa.float64()),
            }
        )

    ranked = grouped_topk(
        scored.map_batches(score, batch_format="pyarrow"),
        group_col="doc_id",
        order_col="tfidf",
        k=3,
        tiebreak_col="token",
    )
    return ranked.map_batches(
        lambda t: t.rename_columns(
            [{"rank": "rk"}.get(c, c) for c in t.schema.names]
        ),
        batch_format="pyarrow",
    )


SQL_TFIDF_TOP_TERMS = """
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE token <> '' GROUP BY doc_id, token
), df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
), n AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents
), scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         ROUND(tf.tf * LN(n.n / df.df), 6) AS tfidf
  FROM tf JOIN df USING (token), n
)
SELECT doc_id, token, tf, tfidf, rk FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, token
  ) AS rk FROM scored
) WHERE rk <= 3
"""


def q_docs_hash_sample(sf_dir: str):
    """Deterministic 20%% consistent sample of documents by key hash —
    the sampling discipline a 100 TB pipeline needs (the same doc is
    in/out of the sample on every run and every table that shares the
    key; `ds.random_sample` can't give either). Pure streaming filter:
    no shuffle, no state, prunes to three columns at the read."""
    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (_knuth32_np(ids) % np.uint64(1000)) < np.uint64(200)
        return t.filter(pa.array(mask))

    return _pq(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        keep, batch_format="pyarrow"
    )


SQL_DOCS_HASH_SAMPLE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE ((doc_id * 2654435761) % 4294967296) % 1000 < 200
"""


def q_docs_stratified_sample(sf_dir: str):
    """Stratified 10%% sample: per-language, the ceil(0.1*n) docs with
    the smallest (knuth32(doc_id), doc_id) — deterministic, so the
    sample is reproducible AND proportionally balanced across strata
    (plain hash sampling under-represents small languages). Shape: a
    distributed exact rank-select — stages/rank.grouped_sorted_prefix_sum
    in row-count mode over sort(["lang", h, doc_id]) gives every row its
    1-based within-language rank WITHOUT co-locating a stratum (the sort
    key ends in unique doc_id, so a dominant language spans many blocks),
    and the same bounded summary fold hands back per-language totals for
    the ceil(0.1*n) cut; the keep mask is then a stateless compare."""
    import math

    from ..stages.rank import grouped_sorted_prefix_sum

    def with_hash(t: pa.Table) -> pa.Table:
        h = _knuth32_np(t.column("doc_id").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "h": pa.array(h.astype(np.int64)),
            }
        )

    base = _pq(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        with_hash, batch_format="pyarrow"
    )
    ranked, totals = grouped_sorted_prefix_sum(
        base, ["lang", "h", "doc_id"], None, out_name="rnk"
    )
    take = {lg: int(math.ceil(0.1 * n)) for lg, n in totals.items()}

    def pick(t: pa.Table, _take=take) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                }
            )
        la = t.column("lang").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(la, return_inverse=True)
        thr = np.array([_take[u] for u in uniq], np.int64)[inv]
        rnk = t.column("rnk").to_numpy(zero_copy_only=False)
        keep = rnk <= thr
        kept = t.filter(pa.array(keep))
        return pa.table({"doc_id": kept.column("doc_id"), "lang": kept.column("lang")})

    return ranked.map_batches(pick, batch_format="pyarrow")


SQL_DOCS_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
         ) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
) WHERE rn <= CEIL(0.1 * n)
"""


def q_docs_weighted_sample(sf_dir: str):
    """Deterministic size-BIASED sample: keep doc iff
    knuth32(doc_id) < n_chars * 2^32 / 4096 — inclusion probability
    proportional to document length (capped at 1), the standard
    pps-style subsample for length-balanced corpus slices, with the
    hash-sample determinism guarantees (same doc in/out on every run).
    Pure streaming filter, SQL-expressible end to end."""

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.uint64)
        thresh = n * np.uint64((1 << 32) // 4096)
        return t.filter(pa.array(_knuth32_np(ids) < thresh))

    return _pq(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        keep, batch_format="pyarrow"
    )


SQL_DOCS_WEIGHTED_SAMPLE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE (doc_id * 2654435761) % 4294967296 < n_chars * 1048576
"""


def q_vocab_top_tokens(sf_dir: str):
    """Corpus vocabulary census — top-30 whitespace tokens by
    frequency: an Arrow RE2 split/flatten tokenize stage feeding the
    SAME stages/approx.heavy_hitters reduce the language census uses
    (one operator, two callers — no duplicated reduce tail). The
    tokenize stage is zero Python in the token path; capacity=4096 >=
    global distinct here => exact counts (the SQL-oracle
    configuration); at real corpus vocabularies the same query is the
    bounded-memory approximate heavy-hitter census."""
    import pyarrow.compute as pc

    from ..stages.approx import heavy_hitters

    def tokenize(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        )
        return pa.table({"token": flat.filter(pc.not_equal(flat, ""))})

    ds = _pq(sf_dir, "documents", ["text"], min_blocks=8).map_batches(
        tokenize, batch_format="pyarrow"
    )
    return heavy_hitters(ds, "token", k=30, capacity=4096, fanin=8).drop_columns(
        ["err"]
    )


SQL_VOCAB_TOP_TOKENS = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
  SELECT UNNEST(regexp_split_to_array(text, '\\s+')) AS token FROM documents
) WHERE token <> ''
GROUP BY token ORDER BY cnt DESC, token LIMIT 30
"""


def q_vocab_growth(sf_dir: str, n_buckets: int = 10):
    """Vocabulary-growth census (Heaps' law V(n) ~ K·n^beta — Heaps
    1978): split the corpus into ``n_buckets`` doc_id ranges and
    count, EXACTLY, how many distinct tokens first appear in each —
    the curve a tokenizer-vocabulary or dedup planner reads before
    committing to a vocab size at 100 TB.

    Scale shape: tokens ride the wire as int64 FNV-1a fingerprints
    (functions/minhash.fnv1a_batch — the dup_passages hash-wire
    discipline; output counts are invariant to the keying up to
    ~V^2/2^64 collisions, so the string-token SQL oracle still
    value-checks the run), first-appearance is ONE
    groupby(token).min(bucket) exchange with per-batch (token,
    bucket)-distinct pre-aggregation, and only ``n_buckets`` rows
    reach the driver for the cumulative sum."""
    import pyarrow.compute as pc

    from ..functions.minhash import fnv1a_batch

    docs = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4)
    mx = int(_pq(sf_dir, "documents", ["doc_id"]).max("doc_id")) + 1

    def tokenize(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        toks = (
            toks.combine_chunks()
            if isinstance(toks, pa.ChunkedArray)
            else toks
        )
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        flat = toks.flatten()
        n_per = np.diff(offsets)
        bucket = np.minimum(d * n_buckets // mx, n_buckets - 1)
        tok_bucket = np.repeat(bucket, n_per)
        mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        fps = fnv1a_batch(flat.filter(pa.array(mask))).view(np.int64)
        tb = tok_bucket[mask]
        # per-batch (token, bucket)-pair distinct combiner: ship each
        # pair at most once per batch
        order = np.lexsort((tb, fps))
        f_s, b_s = fps[order], tb[order]
        first = np.ones(len(f_s), dtype=bool)
        first[1:] = (f_s[1:] != f_s[:-1]) | (b_s[1:] != b_s[:-1])
        return pa.table(
            {
                "tok": pa.array(f_s[first], pa.int64()),
                "bucket": pa.array(b_s[first], pa.int64()),
            }
        )

    tok_bucket = (
        docs.map_batches(tokenize, batch_format="pyarrow")
        .groupby(["tok", "bucket"])
        .count()  # global (token, bucket) distinct
        .map_batches(
            lambda t: t.select(["tok", "bucket"]), batch_format="pyarrow"
        )
        .materialize()  # consumed twice below; (V x buckets)-scale
    )
    seen = (
        tok_bucket.groupby("bucket").count().to_pandas()  # <= n_buckets rows
    )
    firsts = (
        tok_bucket.groupby("tok")
        .min("bucket")
        .map_batches(
            lambda t: pa.table({"bucket": t.column("min(bucket)")}),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .count()
        .to_pandas()  # <= n_buckets rows
    )
    seen = seen.sort_values("bucket").reset_index(drop=True)
    new_map = dict(zip(firsts["bucket"], firsts["count()"]))
    new_tokens = seen["bucket"].map(lambda b: new_map.get(b, 0)).astype("int64")
    return pd.DataFrame(
        {
            "bucket": seen["bucket"].astype("int64"),
            "tokens_seen": seen["count()"].astype("int64"),
            "new_tokens": new_tokens,
            "cum_vocab": new_tokens.cumsum().astype("int64"),
        }
    )


SQL_VOCAB_GROWTH = """
WITH n AS (SELECT MAX(doc_id) + 1 AS mx FROM documents),
toks AS (
  SELECT LEAST((d.doc_id * 10) // n.mx, 9) AS bucket,
         UNNEST(regexp_split_to_array(d.text, '\\s+')) AS token
  FROM documents d, n
),
tb AS (SELECT DISTINCT bucket, token FROM toks WHERE token <> ''),
seen AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS tokens_seen
  FROM tb GROUP BY bucket
),
firsts AS (
  SELECT token, MIN(bucket) AS b FROM tb GROUP BY token
),
per AS (
  SELECT b AS bucket, CAST(COUNT(*) AS BIGINT) AS new_tokens
  FROM firsts GROUP BY b
)
SELECT CAST(s.bucket AS BIGINT) AS bucket, s.tokens_seen,
       CAST(COALESCE(p.new_tokens, 0) AS BIGINT) AS new_tokens,
       CAST(SUM(COALESCE(p.new_tokens, 0))
            OVER (ORDER BY s.bucket) AS BIGINT) AS cum_vocab
FROM seen s LEFT JOIN per p ON p.bucket = s.bucket
"""


# KLL capacity for the per-language tercile thresholds: >= the largest
# per-language group at every test sf (sf0.1 max: 2,059 'en' docs) =>
# the sketch never compacts and its quantile() is exactly
# percentile_disc, keeping the SQL oracle hash; at production scale the
# same code degrades gracefully to eps-rank (eps ~ 1.7/capacity) in
# capacity*8 bytes per language instead of a whole-language block.
_TERCILE_KLL_CAP = 4096


def q_ccnet_buckets(sf_dir: str):
    """CCNet's head/middle/tail corpus split (Wenzek et al. 2020 §4.4):
    documents bucketed by PER-LANGUAGE perplexity terciles of the
    reference-corpus LM. Fully distributed: the char-trigram LM fit +
    scoring of q_lm_perplexity, then per-lang tercile thresholds via
    the KLL per-group sketch (stages/approx.sketch_quantiles_by_key —
    one partial sketch per (batch, lang), a sketch-rows-only shuffle,
    per-lang merge; VERDICT r4 #2: no stage ever needs a language's
    whole nll column in one block). With capacity >= the largest
    language (true at every test sf) the sketch's quantile IS
    percentile_disc, so the SQL oracle still value-hash-matches; at
    10^10 docs the same query runs with eps-rank error in
    capacity*8 bytes per language — CCNet's tercile cut is a
    statistical threshold, exactly the regime KLL is built for.
    The oracle recomputes the terciles in SQL over the
    sequential-scoring parquet."""
    from ..stages.approx import sketch_quantiles_by_key
    from ..stages.lm_score import lm_score, train_char_lm
    from .oracle_sketch import oracle_lm_score_table

    oracle_lm_score_table(sf_dir)
    train = (
        _pq(sf_dir, "documents", ["lang", "text"], min_blocks=4)
        .filter(expr="lang == 'en'")
        .select_columns(["text"])
    )
    logp = train_char_lm(train)
    docs = _pq(sf_dir, "documents", ["doc_id", "lang", "text"], min_blocks=4)
    scored = lm_score(docs, logp)

    th = sketch_quantiles_by_key(
        scored.select_columns(["lang", "nll"]),
        "lang",
        "nll",
        [1 / 3, 2 / 3],
        capacity=_TERCILE_KLL_CAP,
    ).to_pandas()
    t1 = dict(zip(th.loc[th["q"] == 1 / 3, "lang"], th.loc[th["q"] == 1 / 3, "value"]))
    t2 = dict(zip(th.loc[th["q"] == 2 / 3, "lang"], th.loc[th["q"] == 2 / 3, "value"]))

    def bucketize(t: pa.Table) -> pa.Table:
        langs = t.column("lang").to_pylist()
        nll = t.column("nll").to_numpy(zero_copy_only=False)
        a = np.array([t1[lg] for lg in langs])
        b = np.array([t2[lg] for lg in langs])
        bucket = np.where(nll <= a, "head", np.where(nll <= b, "middle", "tail"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "nll": t.column("nll"),
                "bucket": pa.array(bucket.tolist(), pa.string()),
            }
        )

    return scored.map_batches(bucketize, batch_format="pyarrow")


SQL_CCNET_BUCKETS = """
WITH s AS (
  SELECT doc_id, lang, nll
  FROM read_parquet('/tmp/ccray_oracle_lm_score.parquet')
), th AS (
  SELECT lang,
         percentile_disc(0.3333333333333333) WITHIN GROUP (ORDER BY nll) AS t1,
         percentile_disc(0.6666666666666666) WITHIN GROUP (ORDER BY nll) AS t2
  FROM s GROUP BY lang
)
SELECT s.doc_id, s.lang, s.nll,
       CASE WHEN s.nll <= th.t1 THEN 'head'
            WHEN s.nll <= th.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM s JOIN th USING (lang)
"""


def q_source_mixture_weights(sf_dir: str):
    """Domain-mixture reweighting (the DoReMi/Pile-style knob): per
    source, token mass and the sampling weight that would equalize
    token share across sources. One in-batch token-count pass
    (Arrow RE2 kernel, the token_counts discipline) + one tiny
    groupby(source); the weight arithmetic is a fixed double chain
    over exact integers."""
    import pyarrow.compute as pc

    def partials(t: pa.Table) -> pa.Table:
        n_words = pc.count_substring_regex(t.column("text"), pattern=r"\S+")
        df_ = pd.DataFrame(
            {
                "source": t.column("source").to_pylist(),
                "n_words": n_words.to_numpy(zero_copy_only=False),
            }
        )
        g = df_.groupby("source", sort=True).agg(
            n_docs=("n_words", "size"), n_tokens=("n_words", "sum")
        )
        return pa.table(
            {
                "source": pa.array(g.index.tolist(), pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(), pa.int64()),
                "n_tokens": pa.array(g["n_tokens"].to_numpy(), pa.int64()),
            }
        )

    agg = (
        _pq(sf_dir, "documents", ["source", "text"], min_blocks=4)
        .map_batches(partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs"), Sum("n_tokens"))
        .to_pandas()
    )
    total = float(agg["sum(n_tokens)"].sum())
    s_count = len(agg)
    return pd.DataFrame(
        {
            "source": agg["source"],
            "n_docs": agg["sum(n_docs)"].astype(np.int64),
            "n_tokens": agg["sum(n_tokens)"].astype(np.int64),
            "weight": np.round(
                total / s_count / agg["sum(n_tokens)"].to_numpy(np.float64), 6
            ),
        }
    )


SQL_SOURCE_MIXTURE_WEIGHTS = r"""
WITH pd AS (
  SELECT source,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE length(string_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS n_words
  FROM documents
), agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_words) AS BIGINT) AS n_tokens
  FROM pd GROUP BY source
)
SELECT source, n_docs, n_tokens,
       ROUND(CAST((SELECT SUM(n_tokens) FROM agg) AS DOUBLE)
             / (SELECT COUNT(*) FROM agg) / n_tokens, 6) AS weight
FROM agg
"""


def q_curate_corpus(sf_dir: str):
    """The FULL LLM corpus-curation DAG in one distributed run — every
    gate an engine operator, chained the way a production cleanroom
    runs them (CCNet + the dedup literature):

      quality gate (>= 20 words)
      -> exact dedup (min doc_id per md5)
      -> near-dup dedup (MinHash+LSH pairs -> connected components,
         keep each component's min doc_id)
      -> LM perplexity gate (drop the per-language tail tercile of the
         char-trigram reference LM)

    Survivors emerge as (doc_id, lang, n_words, nll). Text never rides
    an exchange: gates join on doc_id / text_hash with slim payloads.
    The oracle recomposes the same gates in SQL from the
    already-verified pieces (llm_prep CTEs, the recursive-CTE
    component closure over the minhash-pairs parquet, percentile_disc
    terciles over the sequential-LM parquet)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from ..stages.components import connected_components
    from ..stages.dedup import minhash_lsh_pairs
    from ..stages.joins import merge_join
    from ..stages.lm_score import lm_score, train_char_lm
    from .oracle_sketch import oracle_lm_score_table, oracle_minhash_pairs_table

    oracle_minhash_pairs_table(sf_dir)
    oracle_lm_score_table(sf_dir)

    docs = _pq(sf_dir, "documents", ["doc_id", "lang", "text"], min_blocks=16)

    # gates 1+2: quality + exact dedup (the llm_prep discipline)
    def score(batch: pa.Table) -> pa.Table:
        from ..functions.digests import md5_hex_column

        text = batch.column("text")
        n_words = pc.count_substring_regex(text, pattern=r"\S+")
        batch = batch.append_column("n_words", n_words.cast(pa.int64()))
        batch = batch.filter(pc.greater_equal(n_words, 20))
        # digest straight off the filtered column's UTF-8 buffer — no
        # per-row Python string materialization in the DAG's first
        # full-text pass (VERDICT r4 #10)
        return batch.append_column(
            "text_hash",
            pa.array(md5_hex_column(batch.column("text")), pa.string()),
        )

    # materialized: the md5 full-text pass feeds TWO consumers (the
    # keeper groupby and the join's left side) — without this the
    # corpus text is read and digested twice. The materialized table
    # is slim (doc_id, lang, n_words, text_hash ~50 B/row), never text.
    scored = (
        docs.map_batches(score, batch_format="pyarrow")
        .select_columns(["doc_id", "lang", "n_words", "text_hash"])
        .materialize()
    )
    keepers = scored.groupby("text_hash").aggregate(Min("doc_id", alias_name="keeper"))
    exact = (
        merge_join(
            scored,
            keepers,
            left_on="text_hash",
            right_on="text_hash",
            right_cols=["keeper"],
            how="inner",
        )
        .filter(expr="doc_id == keeper")
        .select_columns(["doc_id", "lang", "n_words"])
    )

    # gate 3: near-dup components over the full corpus (pairs are
    # corpus-defined, not survivor-defined, matching neardup_dedup_docs)
    pairs = minhash_lsh_pairs(
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=32),
        id_col="doc_id",
        text_col="text",
    )
    comps = connected_components(pairs)

    def keep_reps(t: pa.Table) -> pa.Table:
        comp = t.column("component_id")
        mask = pc.or_kleene(pc.is_null(comp), pc.equal(comp, t.column("doc_id")))
        return t.filter(pc.fill_null(mask, True)).drop_columns(["component_id"])

    neardup_kept = merge_join(
        exact,
        comps,
        left_on="doc_id",
        right_on="doc_id",
        right_cols=["component_id"],
        how="left",
    ).map_batches(keep_reps, batch_format="pyarrow")

    # gate 4: per-lang LM perplexity tail cut (t2 tercile, CCNet rule)
    train = (
        _pq(sf_dir, "documents", ["lang", "text"], min_blocks=4)
        .filter(expr="lang == 'en'")
        .select_columns(["text"])
    )
    logp = train_char_lm(train)
    # materialized: the LM scoring full-text pass feeds TWO consumers
    # (the per-lang tercile sketch and the survivor join) — without
    # this the corpus is scored twice. Slim (doc_id, lang, nll) rows.
    lm = lm_score(
        _pq(sf_dir, "documents", ["doc_id", "lang", "text"], min_blocks=4), logp
    ).select_columns(["doc_id", "lang", "nll"]).materialize()

    # per-lang t2 tercile via the KLL per-group sketch (VERDICT r4 #2:
    # sketch rows on the wire, never a whole language's nll column in
    # one block; exact percentile_disc while capacity >= group size)
    from ..stages.approx import sketch_quantiles_by_key

    th = sketch_quantiles_by_key(
        lm.select_columns(["lang", "nll"]),
        "lang",
        "nll",
        [2 / 3],
        capacity=_TERCILE_KLL_CAP,
    ).to_pandas()
    t2 = dict(zip(th["lang"], th["value"]))

    with_nll = merge_join(
        neardup_kept,
        lm.select_columns(["doc_id", "nll"]),
        left_on="doc_id",
        right_on="doc_id",
        right_cols=["nll"],
        how="inner",
    )

    def lm_gate(t: pa.Table) -> pa.Table:
        langs = t.column("lang").to_pylist()
        nll = t.column("nll").to_numpy(zero_copy_only=False)
        thr = np.array([t2[lg] for lg in langs]) if langs else np.empty(0)
        return t.filter(pa.array(nll <= thr))

    return with_nll.map_batches(lm_gate, batch_format="pyarrow")


from .oracle_sketch import (  # noqa: E402 — needed by the f-string below
    LM_SCORE_ORACLE_PATH as _LM_ORACLE_PATH,
    MINHASH_ORACLE_PATH as _MINHASH_ORACLE_PATH,
)

SQL_CURATE_CORPUS = f"""
WITH RECURSIVE
scored AS (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,
         md5(text) AS text_hash
  FROM documents
),
gated AS (SELECT * FROM scored WHERE n_words >= 20),
keepers AS (
  SELECT text_hash, MIN(doc_id) AS keeper FROM gated GROUP BY text_hash
),
exact AS (
  SELECT g.doc_id, g.lang, g.n_words
  FROM gated g JOIN keepers k
    ON g.text_hash = k.text_hash AND g.doc_id = k.keeper
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM read_parquet('{_MINHASH_ORACLE_PATH}')
  UNION
  SELECT id_b AS u, id_a AS v FROM read_parquet('{_MINHASH_ORACLE_PATH}')
),
walk(u, label) AS (
    SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
  UNION
    SELECT e.u, w.label FROM edges e JOIN walk w ON w.u = e.v
),
comp AS (
  SELECT u AS doc_id, MIN(label) AS component_id FROM walk GROUP BY u
),
neardup_kept AS (
  SELECT e.* FROM exact e LEFT JOIN comp c USING (doc_id)
  WHERE c.component_id IS NULL OR c.component_id = e.doc_id
),
lm AS (
  SELECT doc_id, lang, nll FROM read_parquet('{_LM_ORACLE_PATH}')
),
th AS (
  SELECT lang,
         percentile_disc(0.6666666666666666) WITHIN GROUP (ORDER BY nll) AS t2
  FROM lm GROUP BY lang
)
SELECT k.doc_id, k.lang, k.n_words, l.nll
FROM neardup_kept k
JOIN lm l ON l.doc_id = k.doc_id
JOIN th ON th.lang = k.lang
WHERE l.nll <= th.t2
"""


def q_curation_report(sf_dir: str):
    """The data card: per-language corpus accounting AFTER the full
    curation DAG — total documents, survivors, and surviving word
    mass (the numbers every dataset release publishes, and the
    regression canary for any gate: a threshold drift moves a
    kept_docs cell). Runs the whole q_curate_corpus DAG, folds
    survivors with one tiny groupby(lang), and left-joins the
    per-lang totals (a language-bounded second groupby) — all-integer
    output, no rounding discipline. The SQL oracle nests the entire
    already-verified SQL_CURATE_CORPUS as a CTE, so this row also
    cross-checks the DAG's composition end to end."""
    kept = (
        q_curate_corpus(sf_dir)
        .groupby("lang")
        .aggregate(
            Count(alias_name="kept_docs"),
            Sum("n_words", alias_name="kept_words"),
        )
    )
    totals = (
        _pq(sf_dir, "documents", ["lang"], min_blocks=4)
        .groupby("lang")
        .count()
        .rename_columns({"count()": "total_docs"})
    )
    from ..stages.joins import merge_join

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "lang": t.column("lang"),
                "total_docs": t.column("total_docs").cast(pa.int64()),
                "kept_docs": pc.fill_null(t.column("kept_docs"), 0).cast(pa.int64()),
                "kept_words": pc.fill_null(t.column("kept_words"), 0).cast(pa.int64()),
            }
        )

    return merge_join(
        totals, kept, left_on="lang", right_on="lang",
        right_cols=["kept_docs", "kept_words"], how="left",
    ).map_batches(finalize, batch_format="pyarrow")


SQL_CURATION_REPORT = f"""
WITH kept AS ({SQL_CURATE_CORPUS})
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS total_docs,
       CAST(COUNT(k.doc_id) AS BIGINT) AS kept_docs,
       CAST(COALESCE(SUM(k.n_words), 0) AS BIGINT) AS kept_words
FROM documents d LEFT JOIN kept k USING (doc_id)
GROUP BY d.lang
"""


_PACK_BUCKETS = 8
_PACK_SEQ_TOKENS = 512


def q_pack_sequences(sf_dir: str):
    """GPT-style training-sequence packing (concat-and-chunk): docs are
    hash-bucketed into 8 independent packing streams, concatenated in
    doc_id order within each stream, and chunked into 512-token
    sequences — each doc's (tok_start, seq_first, seq_last) span is
    pure integer arithmetic over a per-bucket exclusive cumsum.

    Shape: one in-batch token-count pass, then the per-bucket running
    token offset comes from stages/rank.grouped_sorted_prefix_sum —
    sort(["bucket", "doc_id"]) is HIGH-cardinality (doc_id last), so a
    bucket splits across as many blocks as its size needs and no block
    ever holds a whole packing stream; the bounded (block, bucket-run)
    summaries fold to exact exclusive offsets on the driver. All-int64,
    so the distributed cumsum is exact; the span math is a stateless
    vectorized pass on top."""
    import pyarrow.compute as pc

    from ..stages.rank import grouped_sorted_prefix_sum

    def tokens_and_bucket(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n_words = pc.count_substring_regex(t.column("text"), pattern=r"\S+")
        bucket = _knuth32_np(ids) % np.uint64(_PACK_BUCKETS)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "bucket": pa.array(bucket.astype(np.int64)),
                "n_words": n_words.cast(pa.int64()),
            }
        )

    base = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4).map_batches(
        tokens_and_bucket, batch_format="pyarrow"
    )
    cum, _totals = grouped_sorted_prefix_sum(
        base, ["bucket", "doc_id"], "n_words", out_name="cum"
    )

    def spans(t: pa.Table) -> pa.Table:
        n = t.column("n_words").to_numpy(zero_copy_only=False)
        tok_start = t.column("cum").to_numpy(zero_copy_only=False) - n
        seq_first = tok_start // _PACK_SEQ_TOKENS
        seq_last = np.where(
            n == 0, seq_first, (tok_start + n - 1) // _PACK_SEQ_TOKENS
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "bucket": t.column("bucket"),
                "n_words": t.column("n_words"),
                "tok_start": pa.array(tok_start, pa.int64()),
                "seq_first": pa.array(seq_first, pa.int64()),
                "seq_last": pa.array(seq_last, pa.int64()),
            }
        )

    return cum.map_batches(spans, batch_format="pyarrow")


SQL_PACK_SEQUENCES = r"""
WITH d AS (
  SELECT doc_id,
         CAST(((doc_id * 2654435761) % 4294967296) % 8 AS BIGINT) AS bucket,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE length(string_split_regex(trim(text), '\s+')) END AS BIGINT)
           AS n_words
  FROM documents
), c AS (
  SELECT doc_id, bucket, n_words,
         CAST(COALESCE(SUM(n_words) OVER (
           PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_start
  FROM d
)
SELECT doc_id, bucket, n_words, tok_start,
       tok_start // 512 AS seq_first,
       CASE WHEN n_words = 0 THEN tok_start // 512
            ELSE (tok_start + n_words - 1) // 512 END AS seq_last
FROM c
"""


_DUP_N = 8  # word n-gram width for duplicate-passage detection


def q_dup_passage_strip(sf_dir: str, gram_key: str = "hash"):
    """Duplicate-passage REMOVAL (Lee et al. 2022's actual transform,
    not just the detection signal): every token covered by a word
    8-gram that also appears in another document is cut; the cleaned
    text is digest-checked. Three exchanges, text moves exactly once:

    1. occurrence-level gram rows (doc_id, gram, pos) built in-batch;
    2. ONE sort(gram) co-partition: a vectorized (gram, doc) run pass
       computes each gram's DISTINCT-doc count and keeps only
       cross-document occurrences -> (doc_id, pos);
    3. ONE sort(doc_id) pass folds positions into one list row per
       doc, then the single union+sort(doc_id) merge_join attaches the
       list to the text (text rides this one exchange), and the strip
       map drops tokens covered by any [pos, pos+8) window.

    ``gram_key`` (VERDICT r4 #1): the DEFAULT wire key is ``"hash"`` —
    each gram rides the sort(g) exchange as ONE int64 (vectorized FNV
    token hashes + position-weighted polynomial window combine,
    functions/minhash.gram_fp_rows; no per-position Python join), so
    the exchange carries ~8 bytes/gram instead of ~8x the document
    text. ``gram_key="str"`` keeps the materialized ``" ".join`` gram
    strings for collision-free verbatim comparison; a test asserts
    both modes produce identical output at test scale.

    Output (doc_id, n_tokens, n_kept, clean_digest); oracle =
    sequential same-kernel fold (oracle_sketch.oracle_dup_strip_table).
    """
    import hashlib

    import pyarrow.compute as pc

    from ..functions.minhash import gram_fp_rows
    from ..stages.joins import merge_join
    from .oracle_sketch import oracle_dup_strip_table

    oracle_dup_strip_table(sf_dir)
    docs = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4)

    def gram_occurrences_hash(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        d_idx, pos, gfp = gram_fp_rows(toks, _DUP_N)
        return pa.table(
            {
                "g": pa.array(gfp),
                "doc_id": pa.array(ids[d_idx]),
                "pos": pa.array(pos, pa.int32()),
            }
        )

    def gram_occurrences_str(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        doc_col, g_col, pos_col = [], [], []
        for did, lst in zip(ids, toks.to_pylist()):
            for i in range(len(lst) - _DUP_N + 1):
                doc_col.append(did)
                g_col.append(" ".join(lst[i : i + _DUP_N]))
                pos_col.append(i)
        return pa.table(
            {
                "g": pa.array(g_col, pa.string()),
                "doc_id": pa.array(np.asarray(doc_col, dtype=np.int64)),
                "pos": pa.array(np.asarray(pos_col, dtype=np.int32)),
            }
        )

    gram_occurrences = (
        gram_occurrences_hash if gram_key == "hash" else gram_occurrences_str
    )

    def mark_cross_doc(t: pa.Table) -> pa.Table:
        # sorted by g: distinct-doc count per gram via (g, doc) runs
        if len(t) == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("pos", pa.int32())]
            ).empty_table()
        g = t.column("g").to_numpy(zero_copy_only=False)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, g))
        g, d = g[order], d[order]
        new_g = np.r_[True, g[1:] != g[:-1]]
        new_doc = new_g | np.r_[True, d[1:] != d[:-1]]
        starts = np.flatnonzero(new_g)
        nd = np.add.reduceat(new_doc.astype(np.int64), starts)
        runs = np.r_[starts[1:], len(g)] - starts
        keep = np.repeat(nd >= 2, runs)
        sel = pa.array(order[keep])
        return pa.table(
            {
                "doc_id": t.column("doc_id").combine_chunks().take(sel),
                "pos": t.column("pos").combine_chunks().take(sel),
            }
        )

    def fold_positions(t: pa.Table) -> pa.Table:
        # sorted by doc_id: one (doc_id, positions) list row per doc
        if len(t) == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("positions", pa.list_(pa.int32()))]
            ).empty_table()
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        p = t.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        offsets = np.r_[starts, len(d)].astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(d[starts]),
                "positions": pa.ListArray.from_arrays(
                    pa.array(offsets), pa.array(p, pa.int32())
                ),
            }
        )

    dup_pos = (
        docs.map_batches(gram_occurrences, batch_format="pyarrow")
        .sort("g")
        .map_batches(mark_cross_doc, batch_format="pyarrow", batch_size=None)
        .sort("doc_id")
        .map_batches(fold_positions, batch_format="pyarrow", batch_size=None)
    )

    joined = merge_join(
        docs,
        dup_pos,
        left_on="doc_id",
        right_on="doc_id",
        right_cols=["positions"],
        how="left",
    )

    def strip(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        toks = pc_.split_pattern_regex(t.column("text"), pattern=r"\s+")
        out_n, out_kept, out_digest = [], [], []
        for lst, pos in zip(toks.to_pylist(), t.column("positions").to_pylist()):
            n = len(lst)
            cover = np.zeros(n, dtype=bool)
            if pos:
                for i in pos:
                    cover[i : i + _DUP_N] = True
            kept = [w for w, c in zip(lst, cover) if not c]
            out_n.append(n)
            out_kept.append(len(kept))
            out_digest.append(hashlib.md5(" ".join(kept).encode()).hexdigest())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(np.asarray(out_n, dtype=np.int64)),
                "n_kept": pa.array(np.asarray(out_kept, dtype=np.int64)),
                "clean_digest": pa.array(out_digest, pa.string()),
            }
        )

    return joined.map_batches(strip, batch_format="pyarrow")


from .oracle_sketch import DUP_STRIP_ORACLE_PATH as _DUP_STRIP_PATH  # noqa: E402

SQL_DUP_PASSAGE_STRIP = f"""
SELECT doc_id, n_tokens, n_kept, clean_digest
FROM read_parquet('{_DUP_STRIP_PATH}')
"""


def q_doc_fingerprints(sf_dir: str):
    """Document fingerprinting by the Rabin rolling hash (the brief's
    'document fingerprinting (rolling hash)' op as a first-class
    registry row): per document, the reference's 64-bit polynomial
    fingerprint of the text's UTF-16 code units
    (functions/fingerprint.fp64, bit-parity-tested against
    FPGenerator.java vectors) plus the text length. Stateless one-pass
    map; hash-checked against the sequential application of the same
    kernel (oracle_sketch.oracle_doc_fp_table)."""
    import pyarrow.compute as pc

    from ..functions.fingerprint import fp64
    from .oracle_sketch import oracle_doc_fp_table

    oracle_doc_fp_table(sf_dir)

    def fp_batch(t: pa.Table) -> pa.Table:
        fps = np.fromiter(
            (fp64(x or "") for x in t.column("text").to_pylist()),
            dtype=np.int64,
            count=len(t),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text_fp": pa.array(fps),
                "n_chars": pc.utf8_length(t.column("text")).cast(pa.int64()),
            }
        )

    return _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4).map_batches(
        fp_batch, batch_format="pyarrow"
    )


from .oracle_sketch import DOC_FP_ORACLE_PATH as _DOC_FP_PATH  # noqa: E402

SQL_DOC_FINGERPRINTS = f"""
SELECT doc_id, text_fp, n_chars FROM read_parquet('{_DOC_FP_PATH}')
"""


_CHUNK_TOKENS, _CHUNK_STRIDE = 128, 96  # 32-token overlap


def q_chunk_documents(sf_dir: str):
    """RAG/training-prep chunking: every document split into
    overlapping 128-token windows on a 96-token stride (row expansion
    — the flat_map shape). Pure in-batch transform, zero exchanges;
    chunk identity is (doc_id, 1-based start) and content is digest-
    checked, so the SQL oracle (LATERAL generate_series + array slice)
    verifies both the windowing arithmetic and the chunk text."""
    import hashlib

    import pyarrow.compute as pc

    def chunks(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        d_col, s_col, n_col, h_col = [], [], [], []
        for did, lst in zip(ids, toks.to_pylist()):
            n = len(lst)
            for start in range(1, n + 1, _CHUNK_STRIDE):
                piece = lst[start - 1 : start - 1 + _CHUNK_TOKENS]
                d_col.append(did)
                s_col.append(start)
                n_col.append(len(piece))
                h_col.append(hashlib.md5(" ".join(piece).encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(d_col, dtype=np.int64)),
                "start": pa.array(np.asarray(s_col, dtype=np.int64)),
                "n_chunk_tokens": pa.array(np.asarray(n_col, dtype=np.int64)),
                "chunk_digest": pa.array(h_col, pa.string()),
            }
        )

    return _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4).map_batches(
        chunks, batch_format="pyarrow"
    )


SQL_CHUNK_DOCUMENTS = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS arr FROM documents
)
SELECT doc_id,
       CAST(i AS BIGINT) AS start,
       CAST(len(arr[i:i+127]) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(arr[i:i+127], ' ')) AS chunk_digest
FROM toks, LATERAL UNNEST(generate_series(1, len(arr), 96)) t(i)
"""


def q_lang_id_lm(sf_dir: str):
    """Language-ID by per-language trigram LMs (the statistical
    langid the brief lists, upgraded from heuristic to model-based):
    ONE streaming pass fits every language's LM (per-batch per-lang
    partial bincounts -> one bounded groupby((lang, gram_id)).sum),
    the (L, 39^3) log-prob matrix is ray.put-broadcast, and a
    stateless actor-pool pass classifies each document with the
    shared score_langs kernel (round-6 argmax, alphabetical
    tie-break). Output (doc_id, lang, lang_pred) hash-checked vs a
    sequential fit+classify oracle sharing only the numeric kernels.

    Honesty note: the synthetic corpus's languages share one
    vocabulary (avg per-lang nll spread < 1%), so predictions collapse
    to the dominant class here — the check proves the distributed
    fit/broadcast/classify plumbing, not linguistic skill; on real
    multilingual text the same trigram statistics separate scripts and
    languages sharply (Cavnar & Trenkle 1994)."""
    from ..stages.lm_score import lang_id_lm, train_char_lm_by_lang
    from .oracle_sketch import oracle_lang_id_table

    oracle_lang_id_table(sf_dir)
    docs = _pq(sf_dir, "documents", ["doc_id", "lang", "text"], min_blocks=4)
    langs, mat = train_char_lm_by_lang(docs.select_columns(["lang", "text"]))
    return lang_id_lm(docs, langs, mat)


from .oracle_sketch import LANG_ID_ORACLE_PATH as _LANG_ID_PATH  # noqa: E402

SQL_LANG_ID_LM = f"""
SELECT doc_id, lang, lang_pred FROM read_parquet('{_LANG_ID_PATH}')
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (the eval-set hygiene step of every
    LLM data pipeline): flag the word 8-grams each corpus document
    shares with a held-out evaluation slice (here: the deterministic
    2% doc_id hash sample standing in for a benchmark suite).

    The BROADCAST-side counterpart of q_dup_passages' shuffle
    approach — an eval suite is tiny, so its gram set is collected
    once, ``ray.put`` once, and the corpus pass is a single stateless
    map with zero exchanges (the small-side-broadcast rule)."""
    import pyarrow.compute as pc

    def gram_counts(t: pa.Table) -> pa.Table:
        from collections import Counter

        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        doc_col, g_col, occ_col = [], [], []
        for did, lst in zip(ids, toks.to_pylist()):
            if len(lst) < _DUP_N:
                continue
            c = Counter(
                " ".join(lst[i : i + _DUP_N]) for i in range(len(lst) - _DUP_N + 1)
            )
            doc_col.append(did)
            g_col.append(list(c.keys()))
            occ_col.append(list(c.values()))
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(doc_col, dtype=np.int64)),
                "grams": pa.array(g_col, pa.list_(pa.string())),
                "occs": pa.array(occ_col, pa.list_(pa.int64())),
            }
        )

    docs = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4)
    per_doc = docs.map_batches(gram_counts, batch_format="pyarrow")

    # eval slice: 2% hash sample; its gram set is benchmark-suite-sized
    def eval_grams_batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (_knuth32_np(ids) % np.uint64(1000)) < np.uint64(20)
        t = t.filter(pa.array(keep))
        import pyarrow.compute as pc_

        return pa.table({"g": pc_.list_flatten(t.column("grams")).unique()})

    eval_set = frozenset(
        g
        for batch in per_doc.map_batches(
            eval_grams_batch, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
        for g in batch.column("g").to_pylist()
    )
    ref = ray.put(eval_set)

    def score(t: pa.Table) -> pa.Table:
        ev = ray.get(ref)
        n_grams = np.zeros(len(t), dtype=np.int64)
        n_cont = np.zeros(len(t), dtype=np.int64)
        for i, (gs, os_) in enumerate(
            zip(t.column("grams").to_pylist(), t.column("occs").to_pylist())
        ):
            n_grams[i] = sum(os_)
            n_cont[i] = sum(o for g, o in zip(gs, os_) if g in ev)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": pa.array(n_grams),
                "n_contaminated": pa.array(n_cont),
            }
        )

    return per_doc.map_batches(score, batch_format="pyarrow")


SQL_DECONTAMINATE = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS arr FROM documents
), grams AS (
  SELECT doc_id, array_to_string(arr[i:i+7], ' ') AS g
  FROM toks, LATERAL UNNEST(generate_series(1, len(arr) - 7)) t(i)
), pg AS (
  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS occ FROM grams GROUP BY doc_id, g
), eval_grams AS (
  SELECT DISTINCT g FROM grams
  WHERE ((doc_id * 2654435761) % 4294967296) % 1000 < 20
)
SELECT p.doc_id,
       CAST(SUM(p.occ) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN e.g IS NOT NULL THEN p.occ ELSE 0 END) AS BIGINT)
         AS n_contaminated
FROM pg p LEFT JOIN eval_grams e USING (g)
GROUP BY p.doc_id
"""


def q_dup_passages(sf_dir: str, gram_key: str = "hash"):
    """Substring-level duplicate-passage detection (the signal behind
    Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): for every document, how many of its word 8-grams
    also appear in ANOTHER document. Two exchanges total:

    1. in-batch per-(doc, gram) occurrence counts (a document lives in
       one row, so the count is complete without a shuffle — the
       tfidf_top_terms discipline);
    2. ONE sort(gram) co-partition, then a vectorized run-length block
       pass marks grams whose run spans >= 2 documents (no df table,
       no join — equal grams are adjacent after the sort);
    3. ONE groupby(doc_id) two-sum aggregate -> (n_grams, n_dup_grams,
       dup_frac).

    ``gram_key`` (VERDICT r4 #1): DEFAULT ``"hash"`` puts ONE int64 per
    gram on the sort(g) wire (functions/minhash.gram_fp_rows — FNV
    token hashes + polynomial window combine, zero per-position Python
    work) instead of the ~8x-text-sized gram strings; ``"str"`` keeps
    the literal strings so the DuckDB oracle's key space is shared
    verbatim, and a test asserts both modes agree at test scale."""
    import pyarrow.compute as pc

    from ..functions.minhash import gram_fp_rows

    def gram_rows_hash(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        d_idx, _pos, gfp = gram_fp_rows(toks, _DUP_N)
        if len(d_idx) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "g": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                }
            )
        # per-(doc, gram) occurrence counts via one lexsort + run scan
        order = np.lexsort((gfp, d_idx))
        d2, g2 = d_idx[order], gfp[order]
        new = np.r_[True, (d2[1:] != d2[:-1]) | (g2[1:] != g2[:-1])]
        starts = np.flatnonzero(new)
        occ = (np.r_[starts[1:], len(d2)] - starts).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[d2[starts]]),
                "g": pa.array(g2[starts]),
                "occ": pa.array(occ),
            }
        )

    def gram_rows_str(t: pa.Table) -> pa.Table:
        from collections import Counter

        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        doc_col, g_col, occ_col = [], [], []
        for did, lst in zip(ids, toks.to_pylist()):
            if len(lst) < _DUP_N:
                continue
            c = Counter(
                " ".join(lst[i : i + _DUP_N]) for i in range(len(lst) - _DUP_N + 1)
            )
            doc_col.extend([did] * len(c))
            g_col.extend(c.keys())
            occ_col.extend(c.values())
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(doc_col, dtype=np.int64)),
                "g": pa.array(g_col, pa.string()),
                "occ": pa.array(np.asarray(occ_col, dtype=np.int64)),
            }
        )

    gram_rows = gram_rows_hash if gram_key == "hash" else gram_rows_str

    def mark_dups(t: pa.Table) -> pa.Table:
        # sorted by g: a gram's run length == its distinct-doc count
        # (rows are unique per (doc_id, g))
        if len(t) == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("occ", pa.int64()), ("dup_occ", pa.int64())]
            ).empty_table()
        g = t.column("g").to_numpy(zero_copy_only=False)
        occ = t.column("occ").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        runs = np.r_[starts[1:], len(g)] - starts
        nd = np.repeat(runs, runs)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "occ": t.column("occ"),
                "dup_occ": pa.array(np.where(nd >= 2, occ, 0)),
            }
        )

    marked = (
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4)
        .map_batches(gram_rows, batch_format="pyarrow")
        .sort("g")
        .map_batches(mark_dups, batch_format="pyarrow", batch_size=None)
    )
    agg = marked.groupby("doc_id").aggregate(Sum("occ"), Sum("dup_occ"))

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("sum(occ)").to_numpy(zero_copy_only=False).astype(np.float64)
        d = t.column("sum(dup_occ)").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": t.column("sum(occ)").cast(pa.int64()),
                "n_dup_grams": t.column("sum(dup_occ)").cast(pa.int64()),
                "dup_frac": pa.array(np.round(d / n, 6)),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_DUP_PASSAGES = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS arr FROM documents
), grams AS (
  SELECT doc_id, array_to_string(arr[i:i+7], ' ') AS g
  FROM toks, LATERAL UNNEST(generate_series(1, len(arr) - 7)) t(i)
), pg AS (
  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS occ FROM grams GROUP BY doc_id, g
), df AS (
  SELECT g, COUNT(*) AS nd FROM pg GROUP BY g
)
SELECT p.doc_id,
       CAST(SUM(p.occ) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN df.nd >= 2 THEN p.occ ELSE 0 END) AS BIGINT) AS n_dup_grams,
       ROUND(SUM(CASE WHEN df.nd >= 2 THEN p.occ ELSE 0 END)
             / CAST(SUM(p.occ) AS DOUBLE), 6) AS dup_frac
FROM pg p JOIN df USING (g) GROUP BY p.doc_id
"""


def q_semdedup_embeddings(sf_dir: str):
    """SemDeDup (Abbas et al. 2023) over the embeddings table:
    full-corpus distributed spherical k-means (integer-unit partial
    sums -> exact under any reduction order; one bounded exchange per
    iteration, <= k rows to the driver) then within-cluster cosine
    prune keeping the lowest vec_id of each near-dup pair. Returns
    (vec_id, cluster, keep) for every vector; hash-checked against a
    sequential fit+assign+prune oracle sharing only the numeric
    kernels (oracle_sketch.oracle_semdedup_table)."""
    from ..stages.semdedup import semdedup
    from .oracle_sketch import oracle_semdedup_table

    oracle_semdedup_table(sf_dir)
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"], min_blocks=4)
    return semdedup(ds, dim=64, k=16, iters=4, threshold=0.45)


SQL_SEMDEDUP_EMBEDDINGS = """
SELECT vec_id, cluster, keep
FROM read_parquet('/tmp/ccray_oracle_semdedup.parquet')
"""


def q_embedding_pca(sf_dir: str):
    """Distributed PCA over the embeddings table (stages/pca.py):
    one streaming scan to EXACT integer moment partials (in-block
    int64, arbitrary-precision decimal-string merges — bit-exact
    under any reduction order at any corpus size), driver-side d×d
    eigendecomposition with a deterministic sign convention, then a
    broadcast stateless projection scan whose per-row output comes
    from exact int64 dot products. Returns (vec_id, pc1..pc4);
    hash-checked against a sequential oracle sharing only the
    numeric kernels (oracle_sketch.oracle_pca_table)."""
    from ..stages.pca import pca
    from .oracle_sketch import oracle_pca_table

    oracle_pca_table(sf_dir)
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"], min_blocks=4)
    return pca(ds, k=4)


SQL_EMBEDDING_PCA = """
SELECT vec_id, pc1, pc2, pc3, pc4
FROM read_parquet('/tmp/ccray_oracle_embedding_pca.parquet')
"""


def q_bitext_mining(sf_dir: str):
    """Margin-based bitext mining (Artetxe & Schwenk 2019 — the
    CCMatrix recipe; stages/bitext.py): the embeddings table split
    into two "language" sides by label parity, one shared distributed
    k-means fit, per-cluster cross-side cosine + avgNN_k margin
    scoring, mutual-best pairs above threshold. Every ranking rounds
    to 6 dp first with ties to the lowest vec_id; hash-checked against
    a sequential oracle sharing the fit kernels and the whole
    per-cluster miner (oracle_sketch.oracle_bitext_table)."""
    from ..stages.bitext import mine_bitext
    from .oracle_sketch import oracle_bitext_table

    oracle_bitext_table(sf_dir)

    def add_side(t: pa.Table) -> pa.Table:
        import numpy as np

        labels = t.column("label").to_numpy(zero_copy_only=False)
        side = pa.array((labels.astype(np.int64) % 2).astype(np.int8))
        return t.drop_columns(["label"]).append_column("side", side)

    ds = _pq(
        sf_dir, "embeddings", ["vec_id", "embedding", "label"], min_blocks=4
    ).map_batches(add_side, batch_format="pyarrow")
    return mine_bitext(ds, dim=64, k_neighbors=4, threshold=1.0, n_clusters=8)


SQL_BITEXT_MINING = """
SELECT src_id, tgt_id, margin
FROM read_parquet('/tmp/ccray_oracle_bitext.parquet')
"""


def q_diversity_sample(sf_dir: str):
    """Cluster-balanced diversity sampling (the keep-easy end of
    Sorscher et al. 2022's prototypicality pruning): distributed
    spherical k-means over the embeddings table, then per cluster the
    ceil(n/k) most prototypical vectors (cosine to own centroid, 6 dp,
    ties to lowest vec_id) with a 1-based within-cluster rank — the
    balanced-across-clusters training-subset selector.

    Shape: stages/semdedup.py diversity_sample — NO corpus-scale
    exchange: one streaming assign pass emits <= k x quota candidate
    rows per batch (pre-shuffle top-k combiner), the only all-to-all
    is a sort of the sample-budget-scale candidate table. Hash-checked
    against a sequential fit+select oracle sharing only the numeric
    kernels (oracle_sketch.oracle_diversity_sample_table)."""
    from ..stages.semdedup import diversity_sample
    from .oracle_sketch import oracle_diversity_sample_table

    oracle_diversity_sample_table(sf_dir)
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"], min_blocks=4)
    return diversity_sample(ds, dim=64, n=120, k=16, iters=4)


SQL_DIVERSITY_SAMPLE = """
SELECT vec_id, cluster, sim, rank
FROM read_parquet('/tmp/ccray_oracle_diversity.parquet')
"""


def q_events_hourly_outer(sf_dir: str):
    """FULL OUTER sort-merge join (stages/joins.merge_join
    how='outer'): high-value signup counts per hour joined with
    high-value purchase counts per hour — hours present on only one
    side survive with a null for the other (the reconciliation-report
    shape: compare two event streams without losing either side's
    rows). Two small pre-aggregations, then the ONE union+sort(h)
    exchange; unmatched-right rows ride their own wire representation
    (key + payload, null left columns)."""
    import pyarrow.compute as pc

    from ..stages.joins import merge_join

    def hourly(event_type: str, out_name: str):
        events = _pq(sf_dir, "events", ["ts", "event_type", "value"]).filter(
            expr=f"event_type == '{event_type}' and value > 90"
        )

        def to_hour(t: pa.Table) -> pa.Table:
            h = pc.divide(t.column("ts").cast(pa.int64()), 3_600_000_000)
            return pa.table({"h": h})

        counted = events.map_batches(to_hour, batch_format="pyarrow").groupby(
            "h"
        ).count()

        def rename(t: pa.Table) -> pa.Table:
            return pa.table(
                {"h": t.column("h"), out_name: t.column("count()").cast(pa.int64())}
            )

        return counted.map_batches(rename, batch_format="pyarrow")

    signups = hourly("signup", "signups")
    purchases = hourly("purchase", "purchases")
    return merge_join(
        signups,
        purchases,
        left_on="h",
        right_on="h",
        right_cols=["purchases"],
        how="outer",
    )


SQL_EVENTS_HOURLY_OUTER = """
WITH s AS (
  SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS signups
  FROM events WHERE event_type = 'signup' AND value > 90 GROUP BY 1
), p AS (
  SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS purchases
  FROM events WHERE event_type = 'purchase' AND value > 90 GROUP BY 1
)
SELECT COALESCE(s.h, p.h) AS h, s.signups, p.purchases
FROM s FULL OUTER JOIN p ON s.h = p.h
"""


_BM25_TERMS = ["hash", "join", "merge", "sort", "stream"]
_BM25_K1, _BM25_B = 1.2, 0.75


def q_bm25_topk(sf_dir: str):
    """BM25 top-20 retrieval (Robertson/Spärck Jones probabilistic
    ranking) for a fixed 5-term query — the IR scoring sibling of
    tfidf_top_terms. Two streaming passes, zero all-to-all shuffles:

    1. per-doc pass: tokenize in-batch, emit one row per document with
       dl (token count) and tf per query term (term count is fixed, so
       the row is constant-width regardless of corpus size);
    2. corpus stats via ``ds.sum`` over dl + per-term match indicators
       (exact integers -> avgdl and df are bit-deterministic), then a
       stateless re-scan scores every doc with the idf/avgdl constants
       captured in the closure (5 doubles — no broadcast needed) and
       ``sort(score desc, doc_id).limit(20)`` keeps only K rows.

    Scores are ROUNDED to 6 decimals BEFORE ranking (the
    tfidf_top_terms discipline) so libm-vs-DuckDB ln() ulps can never
    reorder the top-k; ties break on doc_id. The per-(doc,term) sum
    runs in fixed term order on both sides so the float addition
    chains match."""
    import pyarrow.compute as pc

    n_docs = float(
        __import__("pyarrow.parquet", fromlist=["read_metadata"]).read_metadata(
            f"{sf_dir}/documents.parquet"
        ).num_rows
    )

    def tf_cols(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "dl": pa.array([], pa.int64())}
                | {
                    p + term: pa.array([], pa.int64())
                    for term in _BM25_TERMS
                    for p in ("tf_", "m_")
                }
            )
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        tok = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        cols = {
            "doc_id": t.column("doc_id"),
            "dl": pa.array(np.add.reduceat((tok != "").astype(np.int64), starts)),
        }
        for term in _BM25_TERMS:
            tf = np.add.reduceat((tok == term).astype(np.int64), starts)
            cols["tf_" + term] = pa.array(tf)
            cols["m_" + term] = pa.array((tf > 0).astype(np.int64))
        return pa.table(cols)

    # materialize the constant-width per-doc rows (doc_id + 11 int64
    # cols — tiny vs the text) so the corpus is tokenized ONCE: the
    # stats pass and the scoring re-scan both read these blocks instead
    # of re-executing the read+tokenize lineage (VERDICT r4 #4/#6)
    per_doc = (
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4)
        .map_batches(tf_cols, batch_format="pyarrow")
        .materialize()
    )
    stats = per_doc.sum(on=["dl"] + ["m_" + term for term in _BM25_TERMS])
    avgdl = stats["sum(dl)"] / n_docs
    idf = {
        term: math.log(1.0 + (n_docs - stats["sum(m_" + term + ")"] + 0.5)
                       / (stats["sum(m_" + term + ")"] + 0.5))
        for term in _BM25_TERMS
    }

    def score(t: pa.Table) -> pa.Table:
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        norm = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl)
        s = np.zeros(len(t), dtype=np.float64)
        for term in _BM25_TERMS:  # fixed order: float chain matches SQL
            tf = t.column("tf_" + term).to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            s = s + idf[term] * (tf * (_BM25_K1 + 1.0)) / (tf + norm)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "dl": t.column("dl"),
                "score": pa.array(np.round(s, 6)),
            }
        )

    return (
        per_doc.map_batches(score, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(20)
    )


SQL_BM25_TOPK = """
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
  FROM documents
), per_doc AS (
  SELECT doc_id,
         COUNT(*) FILTER (WHERE tok <> '') AS dl,
         COUNT(*) FILTER (WHERE tok = 'hash')   AS tf_hash,
         COUNT(*) FILTER (WHERE tok = 'join')   AS tf_join,
         COUNT(*) FILTER (WHERE tok = 'merge')  AS tf_merge,
         COUNT(*) FILTER (WHERE tok = 'sort')   AS tf_sort,
         COUNT(*) FILTER (WHERE tok = 'stream') AS tf_stream
  FROM toks GROUP BY doc_id
), n AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents
), stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) AS sum_dl,
         CAST(COUNT(*) FILTER (WHERE tf_hash > 0) AS DOUBLE)   AS df_hash,
         CAST(COUNT(*) FILTER (WHERE tf_join > 0) AS DOUBLE)   AS df_join,
         CAST(COUNT(*) FILTER (WHERE tf_merge > 0) AS DOUBLE)  AS df_merge,
         CAST(COUNT(*) FILTER (WHERE tf_sort > 0) AS DOUBLE)   AS df_sort,
         CAST(COUNT(*) FILTER (WHERE tf_stream > 0) AS DOUBLE) AS df_stream
  FROM per_doc
)
SELECT doc_id, dl, score FROM (
  SELECT p.doc_id, p.dl, ROUND(
      LN(1.0 + (n.n - s.df_hash + 0.5) / (s.df_hash + 0.5))
        * (p.tf_hash * 2.2) / (p.tf_hash + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / (s.sum_dl / n.n)))
    + LN(1.0 + (n.n - s.df_join + 0.5) / (s.df_join + 0.5))
        * (p.tf_join * 2.2) / (p.tf_join + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / (s.sum_dl / n.n)))
    + LN(1.0 + (n.n - s.df_merge + 0.5) / (s.df_merge + 0.5))
        * (p.tf_merge * 2.2) / (p.tf_merge + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / (s.sum_dl / n.n)))
    + LN(1.0 + (n.n - s.df_sort + 0.5) / (s.df_sort + 0.5))
        * (p.tf_sort * 2.2) / (p.tf_sort + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / (s.sum_dl / n.n)))
    + LN(1.0 + (n.n - s.df_stream + 0.5) / (s.df_stream + 0.5))
        * (p.tf_stream * 2.2) / (p.tf_stream + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / (s.sum_dl / n.n)))
    , 6) AS score
  FROM per_doc p, stats s, n
) ORDER BY score DESC, doc_id LIMIT 20
"""


def q_lm_perplexity(sf_dir: str):
    """CCNet-style LM quality scoring (Wenzek et al. 2020): fit a
    char-trigram LM on the English reference slice with ONE bounded
    groupby(gram_id) exchange (per-batch partial bincounts cap the
    shuffle at 39^3 rows/batch), broadcast the ~475 KB log-prob table
    via ray.put, then score every document in a stateless actor-pool
    map_batches pass. Hash-checked against a sequential fit+score
    oracle (pipelines/oracle_sketch.oracle_lm_score_table) sharing
    only the numeric kernels — the parity proven is the distributed
    count merge + broadcast plumbing."""
    from ..stages.lm_score import lm_score, train_char_lm
    from .oracle_sketch import oracle_lm_score_table

    oracle_lm_score_table(sf_dir)
    train = (
        _pq(sf_dir, "documents", ["lang", "text"], min_blocks=4)
        .filter(expr="lang == 'en'")
        .select_columns(["text"])
    )
    logp = train_char_lm(train)
    docs = _pq(sf_dir, "documents", ["doc_id", "lang", "text"], min_blocks=4)
    return lm_score(docs, logp)


SQL_LM_PERPLEXITY = """
SELECT doc_id, lang, n_grams, nll
FROM read_parquet('/tmp/ccray_oracle_lm_score.parquet')
"""


def q_lm_perplexity_kn(sf_dir: str):
    """CCNet quality scoring under interpolated Kneser–Ney smoothing —
    the smoothing the production pipeline actually runs (CCNet scores
    with a KenLM 5-gram; KenLM implements interpolated modified KN,
    Chen & Goodman 1999). Beside the add-α ``lm_perplexity`` this is
    the drop-in upgrade: IDENTICAL scale shape (ONE bounded
    groupby(gram_id) exchange capped at 39^3 rows/batch, ~475 KB
    log-prob table ray.put-broadcast once, stateless actor-pool
    scoring) — only the driver-side smoothing expression changes
    (stages/lm_score.kn_logprob_table: continuation counts for the
    lower orders, fixed 0.75 absolute discount). Hash-checked against
    a sequential KN fit+score oracle sharing only the numeric
    kernels."""
    from ..stages.lm_score import lm_score, train_char_lm_kn
    from .oracle_sketch import oracle_lm_score_kn_table

    oracle_lm_score_kn_table(sf_dir)
    train = (
        _pq(sf_dir, "documents", ["lang", "text"], min_blocks=4)
        .filter(expr="lang == 'en'")
        .select_columns(["text"])
    )
    logp = train_char_lm_kn(train)
    docs = _pq(sf_dir, "documents", ["doc_id", "lang", "text"], min_blocks=4)
    return lm_score(docs, logp)


SQL_LM_PERPLEXITY_KN = """
SELECT doc_id, lang, n_grams, nll
FROM read_parquet('/tmp/ccray_oracle_lm_score_kn.parquet')
"""


# --------------------------------------------------------------------
# DSIR importance resampling (target-domain data selection)
# --------------------------------------------------------------------


def q_dsir_importance(sf_dir: str, target_source: str = "src0", frac: float = 0.25):
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): estimate per-document
    importance log p_target(x) - log p_raw(x) with two LMs — the
    target fit on the curated ``source == target_source`` slice, the
    raw fit on the whole corpus (the repo's deterministic char-trigram
    LM stands in for the paper's hashed n-gram bag models) — and keep
    the top ``frac`` of documents (deterministic rank selection in
    place of the paper's Gumbel sampling, so the result is
    value-hash-checkable; ties break on doc_id).

    Scale shape: both fits are the bounded train_char_lm exchange
    (<= 39^3 partial-count rows per batch), both tables are ray.put
    broadcast and read once per scoring actor, scoring is one
    stateless pass, and the final top-k is a sort+limit over slim
    (doc_id, n_grams, logratio) rows — text never rides an exchange.
    Hash-checked against a sequential two-model fit+score oracle
    (oracle_sketch.oracle_dsir_table) sharing only the numeric
    kernels."""
    import pyarrow.parquet as _pqmod

    from ..stages.lm_score import lm_logratio, train_char_lm
    from .oracle_sketch import oracle_dsir_table

    oracle_dsir_table(sf_dir, target_source)
    target = (
        _pq(sf_dir, "documents", ["source", "text"], min_blocks=4)
        .filter(expr=f"source == '{target_source}'")
        .select_columns(["text"])
    )
    logp_t = train_char_lm(target)
    raw = _pq(sf_dir, "documents", ["text"], min_blocks=4)
    logp_s = train_char_lm(raw)
    docs = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4)
    scored = lm_logratio(docs, logp_t, logp_s)
    n_docs = _pqmod.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    k = int(math.ceil(n_docs * frac))
    return scored.sort(["logratio", "doc_id"], descending=[True, False]).limit(k)


SQL_DSIR_IMPORTANCE = """
WITH s AS (
  SELECT doc_id, n_grams, logratio
  FROM read_parquet('/tmp/ccray_oracle_dsir.parquet')
), r AS (
  SELECT doc_id, n_grams, logratio,
         ROW_NUMBER() OVER (ORDER BY logratio DESC, doc_id) AS rn,
         COUNT(*) OVER () AS cnt
  FROM s
)
SELECT doc_id, n_grams, logratio
FROM r WHERE rn <= CAST(CEIL(cnt * 0.25) AS BIGINT)
"""


# --------------------------------------------------------------------
# C4-style corpus-level line dedup (fixed-width segment analog)
# --------------------------------------------------------------------

_SEG_W = 16  # words per segment ("line" stand-in: the synthetic docs
# are single-line, so C4's three-sentence/line unit maps to fixed
# non-overlapping 16-word windows; the ragged tail (<16 words) is
# always kept and excluded from dedup, which keeps both engine and SQL
# over full windows only)


def q_c4_line_dedup(sf_dir: str):
    """C4-style corpus-level line dedup (Raffel et al. 2020, §2.2:
    "we discarded all but one of any three-sentence span occurring
    more than once in the data set"): every non-overlapping 16-word
    segment is kept iff its (doc_id, seg_idx) is the globally minimal
    instance of that segment text; all later occurrences anywhere in
    the corpus are dropped.

    Scale shape (the dup_passages discipline): the sort("g") wire
    carries ONE int64 fingerprint per segment (functions/minhash.
    gram_fp_rows — never the segment strings, so text is never
    amplified through the exchange) plus a packed (doc_id, seg_idx)
    int64; a vectorized run-scan block pass picks each fingerprint's
    minimum instance (equal keys are adjacent after the sort), and one
    tiny groupby(doc_id) aggregate folds per-doc keep counts. Packing
    assumes seg_idx < 2**20 (a 16 M-word document) and doc_id <
    2**43 — documented, asserted."""
    import pyarrow.compute as pc

    from ..functions.minhash import gram_fp_rows

    def seg_rows(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], pa.int64()),
                "packed": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "seglen": pa.array([], pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        d_idx, pos, gfp = gram_fp_rows(toks, _SEG_W)
        if len(d_idx) == 0:
            return empty
        m = (pos % _SEG_W) == 0  # non-overlapping full windows only
        d_idx, pos, gfp = d_idx[m], pos[m], gfp[m]
        # segment char length = sum(token lens) + (W-1) joining spaces
        tl = pc.utf8_length(toks.flatten()).to_numpy(zero_copy_only=False)
        cum = np.r_[0, np.cumsum(tl.astype(np.int64))]
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        start = offsets[d_idx] + pos
        seglen = cum[start + _SEG_W] - cum[start] + (_SEG_W - 1)
        doc = ids[d_idx]
        seg_idx = (pos // _SEG_W).astype(np.int64)
        assert doc.max(initial=0) < (1 << 43) and seg_idx.max(initial=0) < (1 << 20)
        packed = (doc << 20) | seg_idx
        return pa.table(
            {
                "g": pa.array(gfp),
                "packed": pa.array(packed),
                "doc_id": pa.array(doc),
                "seglen": pa.array(seglen),
            }
        )

    def keep_block(t: pa.Table) -> pa.Table:
        # sorted by g: each fingerprint's instances are adjacent; the
        # run's min packed (doc_id, seg_idx) is the kept occurrence
        if len(t) == 0:
            return pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("kept", pa.int64()),
                    ("kept_chars", pa.int64()),
                ]
            ).empty_table()
        g = t.column("g").to_numpy(zero_copy_only=False)
        p = t.column("packed").to_numpy(zero_copy_only=False)
        seglen = t.column("seglen").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        runs = np.r_[starts[1:], len(g)] - starts
        minp = np.repeat(np.minimum.reduceat(p, starts), runs)
        kept = (p == minp).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "kept": pa.array(kept),
                "kept_chars": pa.array(kept * seglen),
            }
        )

    agg = (
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4)
        .map_batches(seg_rows, batch_format="pyarrow")
        .sort("g")
        .map_batches(keep_block, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id")
        .aggregate(
            Count(alias_name="n_segs"),
            Sum("kept", alias_name="n_kept"),
            Sum("kept_chars", alias_name="kept_chars"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_segs": t.column("n_segs").cast(pa.int64()),
                "n_kept": t.column("n_kept").cast(pa.int64()),
                "kept_chars": t.column("kept_chars").cast(pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_C4_LINE_DEDUP = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS arr FROM documents
), segs AS (
  SELECT doc_id, (i - 1) // 16 AS seg_idx, array_to_string(arr[i:i+15], ' ') AS seg
  FROM toks, LATERAL UNNEST(generate_series(1, len(arr) - 15, 16)) t(i)
), ranked AS (
  SELECT doc_id, seg,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
  FROM segs
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn = 1 THEN LENGTH(seg) ELSE 0 END) AS BIGINT)
         AS kept_chars
FROM ranked GROUP BY doc_id
"""


# --------------------------------------------------------------------
# Gopher repetition filters (within-document quality signals)
# --------------------------------------------------------------------


def q_quality_classifier(sf_dir: str, pos_lang: str = "en"):
    """Distributed quality/language classifier training — the
    fastText-style scorer real curation stacks fit (CCNet §3.2,
    FineWeb-edu) as an engine primitive: full-batch logistic
    regression where EVERY iteration is one streaming pass over a
    slim materialized feature table and the gradient aggregates as
    EXACT int64 sums (per-document 2^-24 quantization — the semdedup
    centroid discipline), so the distributed fit is bit-identical to
    a sequential fold under any block order. Weights broadcast per
    iteration in the task closure ((k+1) floats); the feature table
    is ~40 B/row. Output is all-integer (label, 2^24-quantized
    score), so the hash check needs no rounding discipline.
    Hash-checked vs oracle_sketch.oracle_logreg_table (same kernels,
    sequential fold).

    Honesty note (the lang_id_lm discipline): the synthetic corpus
    draws every language from a shared vocabulary generator, so the
    surface features (stop-word ratio, mean word length) carry no
    en-vs-rest signal and the fitted scores do not separate the
    classes here (mean p ~0.44 both sides). What this op proves —
    and what the hash pins — is the distributed training loop
    itself: bit-exact streaming gradient aggregation, per-iteration
    weight broadcast, and deterministic scoring. On a real corpus
    the same loop fits the same model fastText-style scorers fit."""
    from ..stages.classifier import (
        Q,
        count_features,
        doc_features,
        fit_logreg,
    )
    from .oracle_sketch import oracle_logreg_table

    oracle_logreg_table(sf_dir, pos_lang)

    def feats(t: pa.Table) -> pa.Table:
        n_words, word_chars, n_stop = count_features(t.column("text"))
        y = np.array(
            [1 if v == pos_lang else 0 for v in t.column("lang").to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_words": pa.array(n_words),
                "word_chars": pa.array(word_chars),
                "n_stop": pa.array(n_stop),
                "label": pa.array(y),
            }
        )

    feat_ds = (
        _pq(sf_dir, "documents", ["doc_id", "lang", "text"], min_blocks=8)
        .map_batches(feats, batch_format="pyarrow")
        .materialize()  # 10 GD iterations re-scan this slim table
    )

    def feature_fn(t: pa.Table):
        x = doc_features(
            t.column("n_words").to_numpy(zero_copy_only=False),
            t.column("word_chars").to_numpy(zero_copy_only=False),
            t.column("n_stop").to_numpy(zero_copy_only=False),
        )
        y = t.column("label").to_numpy(zero_copy_only=False).astype(np.float64)
        return x, y

    w = fit_logreg(feat_ds, feature_fn, n_features=3, lr=1.0, iters=10)

    def score(t: pa.Table) -> pa.Table:
        x, _ = feature_fn(t)
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "label": t.column("label"),
                "score_q": pa.array(np.round(p * float(Q)).astype(np.int64)),
            }
        )

    return feat_ds.map_batches(score, batch_format="pyarrow")


SQL_QUALITY_CLASSIFIER = """
SELECT doc_id, label, score_q
FROM read_parquet('/tmp/ccray_oracle_logreg.parquet')
"""


_GOPHER_STOP8 = ("the", "be", "to", "of", "and", "that", "have", "with")


def q_gopher_quality(sf_dir: str):
    """Gopher quality rules (Rae et al. 2021, appendix A1.1 — the
    non-repetition document filters): word-count bounds, mean word
    length 3..10, symbol-to-word ratio for '#'/'...', >=80% words
    containing an alphabetic char, >=2 of the 8 canonical stop words,
    <=90% bullet-started and <=30% ellipsis-ended lines. Every rule
    is evaluated in EXACT integer arithmetic (3*wc <= word_chars
    instead of a float mean), so the pass flag and all sub-counts are
    hash-comparable with no rounding discipline needed. Stop-word
    matching is exact lowercase token equality (no punctuation strip
    — documented divergence from the repo's wider stopword list in
    text_quality). Zero exchanges: one stateless vectorized batch
    pass, Arrow RE2 kernels + reduceat line folds."""
    import pyarrow.compute as pc

    def rules(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(t)
        n_words = pc.count_substring_regex(text, pattern=r"\S+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        n_ws = pc.count_substring_regex(text, pattern=r"\s").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        word_chars = n_chars - n_ws
        n_hash = pc.count_substring(text, pattern="#").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_ell = pc.count_substring(text, pattern="...").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_alpha = pc.count_substring_regex(
            text, pattern=r"\S*[A-Za-z]\S*"
        ).to_numpy(zero_copy_only=False).astype(np.int64)

        # stop-word count: exact lowercase token equality over the
        # canonical 8 (per-row fold via reduceat over the token list)
        toks = pc.split_pattern_regex(pc.utf8_lower(text), pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        is_stop = pc.is_in(flat, value_set=pa.array(_GOPHER_STOP8)).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        starts = np.r_[0, np.cumsum(lens)[:-1]]
        n_stop8 = np.zeros(n, dtype=np.int64)
        nz = lens > 0
        if nz.any():
            sums = np.add.reduceat(is_stop, starts[nz])
            n_stop8[nz] = sums

        # line rules
        lines = pc.split_pattern(text, pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        llens = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
        lflat = lines.flatten()
        bullet = pc.or_(
            pc.or_(
                pc.starts_with(lflat, pattern="-"),
                pc.starts_with(lflat, pattern="*"),
            ),
            pc.starts_with(lflat, pattern="•"),
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        ell_end = pc.ends_with(lflat, pattern="...").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        lstarts = np.r_[0, np.cumsum(llens)[:-1]]
        n_lines = llens
        n_bullet = np.add.reduceat(bullet, lstarts) if len(lflat) else np.zeros(n, np.int64)
        n_ell_end = np.add.reduceat(ell_end, lstarts) if len(lflat) else np.zeros(n, np.int64)

        ok = (
            (n_words >= 50)
            & (n_words <= 100_000)
            & (3 * n_words <= word_chars)
            & (word_chars <= 10 * n_words)
            & (10 * (n_hash + n_ell) <= n_words)
            & (5 * n_alpha >= 4 * n_words)
            & (n_stop8 >= 2)
            & (10 * n_bullet <= 9 * n_lines)
            & (10 * n_ell_end <= 3 * n_lines)
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_words": pa.array(n_words),
                "word_chars": pa.array(word_chars),
                "n_symbol": pa.array(n_hash + n_ell),
                "n_alpha_words": pa.array(n_alpha),
                "n_stop8": pa.array(n_stop8),
                "n_lines": pa.array(n_lines),
                "n_bullet": pa.array(n_bullet),
                "n_ellipsis_end": pa.array(n_ell_end),
                "passed": pa.array(ok.astype(np.int64)),
            }
        )

    return _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8).map_batches(
        rules, batch_format="pyarrow"
    )


SQL_GOPHER_QUALITY = """
WITH base AS (
  SELECT
    doc_id,
    len(regexp_extract_all(text, '\\S+')) AS n_words,
    length(regexp_replace(text, '\\s', '', 'g')) AS word_chars,
    (length(text) - length(replace(text, '#', '')))
      + (length(text) - length(replace(text, '...', ''))) // 3 AS n_symbol,
    len(list_filter(regexp_extract_all(text, '\\S+'),
                    w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha_words,
    len(list_filter(regexp_extract_all(lower(text), '\\S+'),
                    w -> w IN ('the','be','to','of','and','that','have','with')))
      AS n_stop8,
    len(string_split(text, chr(10))) AS n_lines,
    len(list_filter(string_split(text, chr(10)),
                    l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%'))
      AS n_bullet,
    len(list_filter(string_split(text, chr(10)), l -> l LIKE '%...'))
      AS n_ellipsis_end
  FROM documents
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(word_chars AS BIGINT) AS word_chars,
       CAST(n_symbol AS BIGINT) AS n_symbol,
       CAST(n_alpha_words AS BIGINT) AS n_alpha_words,
       CAST(n_stop8 AS BIGINT) AS n_stop8,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_bullet AS BIGINT) AS n_bullet,
       CAST(n_ellipsis_end AS BIGINT) AS n_ellipsis_end,
       CAST(
         n_words >= 50 AND n_words <= 100000
         AND 3 * n_words <= word_chars AND word_chars <= 10 * n_words
         AND 10 * n_symbol <= n_words
         AND 5 * n_alpha_words >= 4 * n_words
         AND n_stop8 >= 2
         AND 10 * n_bullet <= 9 * n_lines
         AND 10 * n_ellipsis_end <= 3 * n_lines
       AS BIGINT) AS passed
FROM base
"""


def q_gopher_repetition(sf_dir: str):
    """Gopher-style repetition quality filters (Rae et al. 2021, table
    A1): per document, the fraction of characters covered by the most
    frequent word 2-gram (occurrences x gram chars / doc chars) and
    the fraction of characters in duplicated word 5-grams (all
    occurrences beyond the first). ``keep`` applies Gopher's
    thresholds: top-2-gram fraction <= 0.20 AND dup-5-gram fraction
    <= 0.15 (on the 6dp-rounded values, matching the SQL oracle's
    ROUND).

    Zero exchanges: a document lives in one row, so both signals are
    complete per batch — per-(doc, gram) counts via one lexsort run
    scan over the vectorized int64 gram fingerprints
    (functions/minhash.gram_fp_rows; gram strings are never
    materialized, in-doc 64-bit collisions are the only approximation
    and are ~1e-13 at 10^3 grams/doc). Most-frequent tie-break is
    (count DESC, count*gram_chars DESC) — cover value is identical
    across remaining ties, so the output is deterministic."""
    import pyarrow.compute as pc

    from ..functions.minhash import gram_fp_rows

    def per_doc(t: pa.Table) -> pa.Table:
        n = len(t)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        total_chars = pc.utf8_length(t.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        toks = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        n_words = np.diff(offsets)
        tl = pc.utf8_length(toks.flatten()).to_numpy(zero_copy_only=False)
        cum = np.r_[0, np.cumsum(tl.astype(np.int64))]

        def gram_count_rows(width: int):
            """(doc, gram) -> (count, gram_chars), vectorized."""
            d_idx, pos, gfp = gram_fp_rows(toks, width)
            if len(d_idx) == 0:
                z = np.empty(0, np.int64)
                return z, z, z
            start = offsets[d_idx] + pos
            glen = cum[start + width] - cum[start] + (width - 1)
            order = np.lexsort((gfp, d_idx))
            d2, g2, l2 = d_idx[order], gfp[order], glen[order]
            new = np.r_[True, (d2[1:] != d2[:-1]) | (g2[1:] != g2[:-1])]
            starts = np.flatnonzero(new)
            cnt = np.r_[starts[1:], len(d2)] - starts
            return d2[starts], cnt.astype(np.int64), l2[starts]

        # top 2-gram char coverage per doc: max by (cnt, cnt*glen)
        d2, cnt2, glen2 = gram_count_rows(2)
        cover2 = np.zeros(n, dtype=np.int64)
        if len(d2):
            cov = cnt2 * glen2
            order = np.lexsort((cov, cnt2, d2))
            ds, cs = d2[order], cov[order]
            last = np.r_[ds[1:] != ds[:-1], True]  # last row per doc = max
            cover2[ds[last]] = cs[last]

        # duplicated 5-gram char mass per doc: sum (cnt-1)*glen, cnt>=2
        d5, cnt5, glen5 = gram_count_rows(5)
        dup5 = np.zeros(n, dtype=np.int64)
        if len(d5):
            mass = (cnt5 - 1) * glen5
            mask = cnt5 >= 2
            np.add.at(dup5, d5[mask], mass[mask])

        # DuckDB ROUND = half away from zero (fractions are positive);
        # the quotients hit exact binary halves (e.g. 9/128), where
        # np.round's half-to-even would differ in the 6th decimal
        top2_frac = np.floor(cover2 / total_chars * 1e6 + 0.5) / 1e6
        dup5_frac = np.floor(dup5 / total_chars * 1e6 + 0.5) / 1e6
        keep = ((top2_frac <= 0.20) & (dup5_frac <= 0.15)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_words": pa.array(n_words),
                "top2_frac": pa.array(top2_frac),
                "dup5_frac": pa.array(dup5_frac),
                "keep": pa.array(keep),
            }
        )

    return _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4).map_batches(
        per_doc, batch_format="pyarrow"
    )


SQL_GOPHER_REPETITION = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS arr,
         LENGTH(text) AS total_chars
  FROM documents
), g2 AS (
  SELECT doc_id, array_to_string(arr[i:i+1], ' ') AS g
  FROM toks, LATERAL UNNEST(generate_series(1, len(arr) - 1)) t(i)
), c2 AS (
  SELECT doc_id, COUNT(*) AS cnt, LENGTH(g) AS glen FROM g2 GROUP BY doc_id, g
), top2 AS (
  SELECT doc_id, cnt * glen AS cover,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY cnt DESC, cnt * glen DESC
         ) AS rn
  FROM c2
), g5 AS (
  SELECT doc_id, array_to_string(arr[i:i+4], ' ') AS g
  FROM toks, LATERAL UNNEST(generate_series(1, len(arr) - 4)) t(i)
), c5 AS (
  SELECT doc_id, COUNT(*) AS cnt, LENGTH(g) AS glen FROM g5 GROUP BY doc_id, g
), dup5 AS (
  SELECT doc_id, SUM(CASE WHEN cnt >= 2 THEN (cnt - 1) * glen ELSE 0 END)
           AS dupchars
  FROM c5 GROUP BY doc_id
)
SELECT tk.doc_id,
       CAST(len(tk.arr) AS BIGINT) AS n_words,
       ROUND(COALESCE(t2.cover, 0) / CAST(tk.total_chars AS DOUBLE), 6)
         AS top2_frac,
       ROUND(COALESCE(d5.dupchars, 0) / CAST(tk.total_chars AS DOUBLE), 6)
         AS dup5_frac,
       CAST(CASE WHEN
         ROUND(COALESCE(t2.cover, 0) / CAST(tk.total_chars AS DOUBLE), 6) <= 0.20
         AND
         ROUND(COALESCE(d5.dupchars, 0) / CAST(tk.total_chars AS DOUBLE), 6) <= 0.15
       THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM toks tk
LEFT JOIN (SELECT doc_id, cover FROM top2 WHERE rn = 1) t2 USING (doc_id)
LEFT JOIN dup5 d5 USING (doc_id)
"""


# --------------------------------------------------------------------
# PII redaction gate (emails / IPv4 / phone numbers)
# --------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def q_pii_redact(sf_dir: str):
    """PII redaction — the scrub pass every published text corpus runs
    before release (emails, IPv4 addresses, phone numbers replaced by
    typed placeholders, with per-doc hit counts for the data card).

    The synthetic corpus carries no natural PII, so the query PLANTS a
    deterministic specimen of each type derived from doc_id (the SQL
    oracle builds the identical string), then runs the real kernel:
    three chained RE2 ``replace_substring_regex`` passes plus
    ``count_substring_regex`` hit counters, all vectorized over the
    Arrow column — zero Python per row in the scrub itself.

    Scale shape: ONE streaming map over a pruned (doc_id, text) read,
    zero exchanges; the output is slim (ids + int counts + a 32-char
    digest of the redacted text) so the scrubbed text itself never
    rides the wire — a real pipeline would side-write it partitioned,
    as docs_partitioned_write demonstrates."""
    import pyarrow.compute as pc

    from ..functions.digests import md5_hex_column

    def scrub(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy()
        id_s = pa.array(ids.astype("U20"))
        a_s = pa.array((ids % 256).astype("U3"))
        b_s = pa.array((ids % 100).astype("U3"))
        p1_s = pa.array((ids % 900 + 100).astype("U3"))
        p4_s = pa.array(np.char.zfill((ids % 10000).astype("U4"), 4))
        aug = pc.binary_join_element_wise(
            batch.column("text").cast(pa.string()),
            " Contact user", id_s, "@example.com at 10.0.", a_s, ".", b_s,
            " tel ", p1_s, "-555-", p4_s, ".",
            "",
        )
        n_emails = pc.count_substring_regex(aug, pattern=_PII_EMAIL)
        n_ipv4 = pc.count_substring_regex(aug, pattern=_PII_IPV4)
        n_phones = pc.count_substring_regex(aug, pattern=_PII_PHONE)
        red = pc.replace_substring_regex(aug, pattern=_PII_EMAIL, replacement="<EMAIL>")
        red = pc.replace_substring_regex(red, pattern=_PII_IPV4, replacement="<IP>")
        red = pc.replace_substring_regex(red, pattern=_PII_PHONE, replacement="<PHONE>")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_emails": n_emails.cast(pa.int64()),
                "n_ipv4": n_ipv4.cast(pa.int64()),
                "n_phones": n_phones.cast(pa.int64()),
                "red_md5": pa.array(md5_hex_column(red), pa.string()),
            }
        )

    return _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8).map_batches(
        scrub, batch_format="pyarrow"
    )


SQL_PII_REDACT = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' Contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.' || CAST(doc_id % 100 AS VARCHAR)
              || ' tel ' || CAST(doc_id % 900 + 100 AS VARCHAR)
              || '-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || '.' AS t
  FROM documents
)
SELECT doc_id,
       CAST(length(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(length(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
       CAST(length(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
           '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS red_md5
FROM aug
"""


# --------------------------------------------------------------------
# CCNet-style text normalization
# --------------------------------------------------------------------


def q_text_normalize(sf_dir: str):
    """CCNet-style normalization pass (lowercase + whitespace collapse
    + trim) — the canonical form fed to dedup hashing and LM scoring so
    cosmetic variants collide. All-Arrow: one RE2 collapse, one trim,
    one lowercase, digest off the UTF-8 buffer; zero exchanges, slim
    (doc_id, n_words, norm_md5) output."""
    import pyarrow.compute as pc

    from ..functions.digests import md5_hex_column

    def norm(batch: pa.Table) -> pa.Table:
        text = batch.column("text").cast(pa.string())
        collapsed = pc.replace_substring_regex(text, pattern=r"\s+", replacement=" ")
        normed = pc.utf8_lower(pc.utf8_trim_whitespace(collapsed))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pc.count_substring_regex(
                    normed, pattern=r"\S+"
                ).cast(pa.int64()),
                "norm_md5": pa.array(md5_hex_column(normed), pa.string()),
            }
        )

    return _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8).map_batches(
        norm, batch_format="pyarrow"
    )


SQL_TEXT_NORMALIZE = r"""
WITH n AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
  FROM documents
)
SELECT doc_id,
       CAST(length(regexp_extract_all(t, '\S+')) AS BIGINT) AS n_words,
       md5(t) AS norm_md5
FROM n
"""


# --------------------------------------------------------------------
# source spam filter: drop sources with above-average duplicate mass
# --------------------------------------------------------------------


def q_source_spam_filter(sf_dir: str):
    """Source-level template-spam gate: drop every document from a
    source whose lexical diversity (distinct tokens / total tokens)
    falls strictly below the corpus-wide ratio — the source-granular
    cousin of the Gopher repetition rules (a feed that keeps emitting
    the same few templates has a collapsed type/token ratio long
    before any page-level dup fires). The verdict is the exact integer
    cross-multiplication n_types_s * sum(n_toks) >= sum(n_types) *
    n_toks_s, so no float ratio rides the decision.

    Scale shape: tokenize explode -> WITHIN-BATCH (source, token)
    dedup (Arrow group_by, C++-speed) so the exchange carries each
    batch's vocabulary, not its token stream -> one global
    (source, token) distinct exchange -> per-source type counts
    (#sources rows). Token totals ride a separate counter pass whose
    wire is per-batch partials. Both verdict inputs are
    driver-collected at #sources rows and the keep-set is ray.put
    BROADCAST into a final streaming filter — the corpus never joins,
    it probes a set. At a real corpus the token wire stays bounded by
    per-batch vocab; hashing tokens to int64 fp64 (as the passage ops
    do) would shrink it further at the cost of the verbatim-SQL
    oracle."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def tok_pairs(t: pa.Table) -> pa.Table:
        split = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        n = pc.list_value_length(split).cast(pa.int64())
        src = t.column("source").combine_chunks()
        idx = np.repeat(np.arange(len(t)), n.to_numpy(zero_copy_only=False))
        flat = pc.list_flatten(split)
        pairs = pa.table({"source": src.take(pa.array(idx)), "token": flat})
        pairs = pairs.filter(pc.not_equal(pairs.column("token"), ""))
        # per-batch vocabulary dedup BEFORE the exchange
        return pairs.group_by(["source", "token"]).aggregate([])

    docs = _pq(sf_dir, "documents", ["doc_id", "source", "text"], min_blocks=8)
    types = (
        docs.map_batches(tok_pairs, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Count(alias_name="_n"))  # global distinct (source, token)
        .groupby("source")
        .aggregate(Count(alias_name="n_types"))
    )

    def tok_counts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t.column("source"),
                "n": pc.count_substring_regex(
                    t.column("text"), pattern=r"\S+"
                ).cast(pa.int64()),
            }
        )

    toks = (
        docs.map_batches(tok_counts, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n_toks"))
    )

    ty = {r["source"]: r["n_types"] for r in types.take_all()}  # #sources rows
    tk = {r["source"]: r["n_toks"] for r in toks.take_all()}
    st, sk = sum(ty.values()), sum(tk.values())
    keep = sorted(s for s in ty if ty[s] * sk >= st * tk[s])
    keep_ref = ray.put(keep)

    def gate(batch: pa.Table) -> pa.Table:
        ok = ray.get(keep_ref)
        mask = pc.is_in(batch.column("source"), value_set=pa.array(ok, pa.string()))
        return batch.filter(mask)

    return _pq(sf_dir, "documents", ["doc_id", "source"], min_blocks=4).map_batches(
        gate, batch_format="pyarrow"
    )


SQL_SOURCE_SPAM_FILTER = r"""
WITH tok AS (
  SELECT source, UNNEST(regexp_split_to_array(text, '\s+')) AS token
  FROM documents
),
stats AS (
  SELECT source, COUNT(DISTINCT token) AS n_types, COUNT(*) AS n_toks
  FROM tok WHERE token <> '' GROUP BY source
),
tot AS (SELECT SUM(n_types) AS st, SUM(n_toks) AS sk FROM stats)
SELECT d.doc_id, d.source
FROM documents d JOIN stats s USING (source), tot
WHERE s.n_types * tot.sk >= tot.st * s.n_toks
"""


# --------------------------------------------------------------------
# anchor-text aggregation per target host
# --------------------------------------------------------------------


def q_anchor_text(sf_dir: str):
    """Anchor-text aggregation — the top-5 anchor terms pointing AT
    each host, with occurrence counts: how the web describes a site,
    the classic link-description signal (the reference stores raw
    anchorTags per page, protocol.jr:96-103; this is the corpus-level
    aggregate built from them). Streaming parse -> shared
    ``extract_anchor_terms_batch`` kernel -> WITHIN-BATCH (dst, term)
    count pre-aggregation (Arrow group_by) so the exchange carries
    per-batch term vocabularies, not occurrence streams -> one global
    (dst, term) groupby -> grouped_topk per host (pre-shuffle partial
    top-k + ONE single-key sort exchange; stages/rank.py). Oracle:
    plain SQL count+window over the sequential-kernel pairs parquet."""
    import os

    from ray.data.aggregate import Sum

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import extract_anchor_terms_batch
    from ..stages.parse_extract import parse_extract_batch
    from ..stages.rank import grouped_topk
    from .oracle_sketch import oracle_anchor_terms_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_anchor_terms_table(sf_dir)

    def batch_counts(t: pa.Table) -> pa.Table:
        pairs = extract_anchor_terms_batch(t)
        agg = pairs.group_by(["dst", "term"]).aggregate([([], "count_all")])
        return agg.rename_columns(["dst", "term", "n"])

    pairs = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
        .map_batches(batch_counts, batch_format="pyarrow")
    )
    counts = pairs.groupby(["dst", "term"]).aggregate(Sum("n", alias_name="cnt"))
    return grouped_topk(
        counts, group_col="dst", order_col="cnt", k=5,
        tiebreak_col="term", descending=True,
    )


SQL_ANCHOR_TEXT = """
SELECT dst, term, cnt, rank FROM (
  SELECT dst, term, CAST(COUNT(*) AS BIGINT) AS cnt,
         ROW_NUMBER() OVER (
           PARTITION BY dst ORDER BY COUNT(*) DESC, term
         ) AS rank
  FROM read_parquet('/tmp/ccray_oracle_anchor_terms.parquet')
  GROUP BY dst, term
) WHERE rank <= 5
"""


# --------------------------------------------------------------------
# inverted index build (token -> postings)
# --------------------------------------------------------------------


def q_inverted_index(sf_dir: str):
    """Inverted-index build: the (token, doc_id, tf) postings table a
    retrieval system materializes over the corpus (BM25's runtime data
    structure — q_bm25_topk recomputes scores per query; this op
    EXPORTS the index once). Tokenize explode with WITHIN-BATCH
    (doc_id, token) tf pre-aggregation (Arrow group_by — the wire
    carries per-doc tf rows, not the token stream), then ONE global
    (token, doc_id) groupby sum. Token-partitioned output is exactly
    how a sharded index wants it: all postings of a term co-located.
    At a real corpus the postings table would write partitioned by
    hash(token) (docs_partitioned_write's layout) for resumable
    shard-at-a-time serving."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def tf_pairs(t: pa.Table) -> pa.Table:
        split = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
        n = pc.list_value_length(split).cast(pa.int64())
        ids = t.column("doc_id").combine_chunks()
        idx = np.repeat(np.arange(len(t)), n.to_numpy(zero_copy_only=False))
        pairs = pa.table(
            {"doc_id": ids.take(pa.array(idx)), "token": pc.list_flatten(split)}
        )
        pairs = pairs.filter(pc.not_equal(pairs.column("token"), ""))
        agg = pairs.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
        return agg.rename_columns(["doc_id", "token", "tf"])

    return (
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8)
        .map_batches(tf_pairs, batch_format="pyarrow")
        .groupby(["token", "doc_id"])
        .aggregate(Sum("tf", alias_name="tf"))
    )


SQL_INVERTED_INDEX = r"""
SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM (
  SELECT doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS token
  FROM documents
) WHERE token <> '' GROUP BY token, doc_id
"""


# --------------------------------------------------------------------
# weakly-connected components of the host link graph
# --------------------------------------------------------------------


def q_host_components(sf_dir: str):
    """Weakly-connected components of the crawl's host graph — the
    web-graph partition every crawl scheduler and seed-selection pass
    wants (which sites form one connected neighborhood; the undirected
    cousin of pagerank_hosts over the same edges). Streaming parse ->
    shared edge kernel -> distinct host edges, hosts keyed to int64
    via the engine's fp64 fingerprint (functions/fingerprint.py — the
    same key the URL dedup path ships, so no string ids ride the
    hash-to-min rounds), then stages/components.connected_components
    (Hash-to-Min, O(log n) all-to-alls), then ONE merge_join maps the
    winning min-fp back to its host string. Component rep = the
    member host with the smallest fp64 — arbitrary but deterministic,
    replicated exactly by the sequential union-find oracle."""
    import os

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.components import connected_components
    from ..stages.joins import merge_join
    from ..stages.pagerank import extract_host_edges_batch
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_host_components_table

    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_host_components_table(sf_dir)

    def fp_edges(t: pa.Table) -> pa.Table:
        from ..functions.fingerprint import fp64_batch

        et = extract_host_edges_batch(t)
        src = et.column("src").to_pylist()
        dst = et.column("dst").to_pylist()
        return pa.table(
            {
                "id_a": pa.array(fp64_batch(src), pa.int64()),
                "id_b": pa.array(fp64_batch(dst), pa.int64()),
                "src": et.column("src"),
                "dst": et.column("dst"),
            }
        )

    edges = (
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
        .map_batches(fp_edges, batch_format="pyarrow")
    ).materialize()  # feeds the components loop AND the two name maps

    comps = connected_components(
        edges.select_columns(["id_a", "id_b"]), id_a="id_a", id_b="id_b"
    )
    # (fp -> host) name map: union both endpoints, distinct
    names = (
        edges.map_batches(
            lambda t: pa.table(
                {
                    "fp": pa.concat_arrays(
                        [
                            t.column("id_a").combine_chunks(),
                            t.column("id_b").combine_chunks(),
                        ]
                    ),
                    "host": pa.concat_arrays(
                        [
                            t.column("src").combine_chunks().cast(pa.string()),
                            t.column("dst").combine_chunks().cast(pa.string()),
                        ]
                    ),
                }
            ).group_by(["fp", "host"]).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby(["fp", "host"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    ).materialize()  # vocabulary-scale (#hosts), two join consumers
    with_host = merge_join(
        comps, names, left_on="doc_id", right_on="fp",
        right_cols=["host"], how="inner",
    )
    return merge_join(
        with_host, names, left_on="component_id", right_on="fp",
        right_cols=["host"], how="inner", suffix="_comp",
    ).map_batches(
        lambda t: pa.table(
            {"host": t.column("host"), "comp_host": t.column("host_comp")}
        ),
        batch_format="pyarrow",
    )


SQL_HOST_COMPONENTS = """
SELECT host, comp_host
FROM read_parquet('/tmp/ccray_oracle_host_components.parquet')
"""


# --------------------------------------------------------------------
# BPE-ish subword token counting
# --------------------------------------------------------------------

# GPT-2's pre-tokenizer split, minus the one lookahead RE2 forbids
# (`\s+(?!\S)`): contractions, space-prefixed letter runs, digit runs,
# punctuation runs, residual whitespace. Counting matches of this
# pattern approximates BPE sequence length far better than whitespace
# words (punctuation and number boundaries count), which is what
# packing/budget estimates need BEFORE paying for a real tokenizer.
_BPE_SPLIT = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def q_bpe_token_counts(sf_dir: str):
    """Per-doc BPE-ish token counts (the GPT-2 pre-tokenizer regex,
    RE2-compatible) next to the whitespace word count — the
    token-budget estimator for sequence packing and mixture math.
    One vectorized RE2 count per batch, zero Python per row, zero
    exchanges."""
    import pyarrow.compute as pc

    def count(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pc.count_substring_regex(
                    text, pattern=_BPE_SPLIT
                ).cast(pa.int64()),
                "n_words": pc.count_substring_regex(
                    text, pattern=r"\S+"
                ).cast(pa.int64()),
            }
        )

    return _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8).map_batches(
        count, batch_format="pyarrow"
    )


SQL_BPE_TOKEN_COUNTS = r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
       )) AS BIGINT) AS n_bpe_tokens,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words
FROM documents
"""


# --------------------------------------------------------------------
# embedding topic mixture (k-means cluster census)
# --------------------------------------------------------------------


def q_topic_mixture(sf_dir: str):
    """Topic-mixture census over the embedding space: fit the SAME
    distributed spherical k-means SemDeDup runs (integer-unit partial
    sums, broadcast centroids, <= k rows/iter to the driver), then ONE
    streaming assign pass with per-batch cluster-count pre-aggregation
    and a k-row groupby — the cluster-size report a mixture designer
    reads before reweighting (semantic counterpart of
    source_mixture_weights). Identical (k, iters, init) to
    q_semdedup_embeddings, so the verified sequential oracle's
    assignment column doubles as this census's ground truth."""
    from ray.data.aggregate import Sum

    from ..functions.vec import list_to_matrix
    from ..stages.semdedup import _norm_rows, assign_rounded, kmeans_fit_distributed
    from .oracle_sketch import oracle_semdedup_table

    oracle_semdedup_table(sf_dir)
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"], min_blocks=4)
    centroids = kmeans_fit_distributed(ds, dim=64, k=16, iters=4)
    cref = ray.put(centroids)

    def census(t: pa.Table) -> pa.Table:
        cent = ray.get(cref)
        if len(t) == 0:
            return pa.table(
                {"cluster": pa.array([], pa.int64()), "n_vecs": pa.array([], pa.int64())}
            )
        xn = _norm_rows(list_to_matrix(t.column("embedding")))
        cl = assign_rounded(xn, cent)
        counts = np.bincount(cl, minlength=0)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "cluster": pa.array(nz.astype(np.int64)),
                "n_vecs": pa.array(counts[nz].astype(np.int64)),
            }
        )

    return (
        ds.map_batches(census, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("n_vecs", alias_name="n_vecs"))
    )


SQL_TOPIC_MIXTURE = """
SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM read_parquet('/tmp/ccray_oracle_semdedup.parquet')
GROUP BY cluster
"""


# --------------------------------------------------------------------
# ANN recall evaluation (IVF vs exact)
# --------------------------------------------------------------------


def q_ann_recall(sf_dir: str):
    """Recall@10 evaluation of the approximate IVF index against exact
    search — the quality gate an ANN deployment monitors (an index
    rebuild that silently tanks recall shows up here, not in the
    latency graphs). Both sides run as their registered distributed
    pipelines (q_knn_ivf's nprobe=8 approximate scan; the nprobe=32
    exhaustive exact scan); hits are counted with ONE semi merge_join
    on a packed (query_id<<32 | vec_id) int64 key plus a 4-row
    groupby. Output = per-query hit count out of 10, all-integer."""
    import pyarrow.parquet as pq_mod
    from ray.data.aggregate import Count

    from ..stages.ann import knn_ivf
    from ..stages.joins import merge_join
    from .oracle_sketch import oracle_knn_ivf_table

    oracle_knn_ivf_table(sf_dir)
    t = pq_mod.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = t.column("vec_id").to_pylist()
    qmat = np.array(
        [t.column("embedding")[ids.index(qid)].as_py() for qid in range(4)],
        dtype=np.float64,
    )
    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])

    def packed(res):
        def key(b: pa.Table) -> pa.Table:
            q = b.column("query_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
            v = b.column("vec_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "query_id": pa.array(q),
                    "pk": pa.array((q << np.int64(32)) | v),
                }
            )

        return res.map_batches(key, batch_format="pyarrow")

    exact = packed(knn_ivf(emb, qmat, k=10, n_centroids=32, nprobe=32))
    approx = packed(
        knn_ivf(emb, qmat, k=10, n_centroids=32, nprobe=8, sample_mode="hash")
    )
    hits = merge_join(
        exact, approx, left_on="pk", right_on="pk", right_cols=[], how="semi"
    )
    return hits.groupby("query_id").aggregate(Count(alias_name="n_hits"))


SQL_ANN_RECALL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 4
),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS cos
  FROM embeddings e, q
),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) - 1 AS rank
    FROM scored
  ) WHERE rank < 10
)
SELECT CAST(e.query_id AS BIGINT) AS query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM exact e
JOIN read_parquet('/tmp/ccray_oracle_knn_ivf.parquet') a
  ON a.query_id = e.query_id AND a.vec_id = e.vec_id
GROUP BY e.query_id
"""


def _c4_rules(t: pa.Table) -> pa.Table:
    """Vectorized C4 cleaning kernel (Raffel et al. 2020 §2.2 — the
    line/page filters a plain-text pass can express): a line is KEPT
    iff it ends in a terminal punctuation mark ('.', '!', '?', '"'),
    has >= 3 whitespace words, and does not contain ``javascript``
    (case-insensitive); the DOC is kept iff its kept lines carry >= 5
    sentence-terminal marks and the original text contains neither
    ``lorem ipsum`` nor an opening brace. All-integer outputs, Arrow
    RE2 kernels + reduceat per-doc folds, zero exchanges — the
    gopher_quality kernel discipline. (The C4 bad-words list is out of
    scope: it is an external resource this repo cannot ship.)"""
    import pyarrow.compute as pc

    if len(t) == 0:
        e = pa.array([], pa.int64())
        return pa.table(
            {
                "doc_id": e,
                "n_lines": e,
                "n_kept_lines": e,
                "kept_chars": e,
                "n_sentences": e,
                "doc_kept": e,
            }
        )
    text = t.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lorem = pc.match_substring(
        pc.utf8_lower(text), pattern="lorem ipsum"
    ).to_numpy(zero_copy_only=False)
    brace = pc.match_substring(text, pattern="{").to_numpy(zero_copy_only=False)
    lines = pc.split_pattern(text, pattern="\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    # split_pattern always yields >= 1 element per row, so lstarts is
    # strictly increasing and reduceat is well-defined.
    llens = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
    lflat = lines.flatten()
    term = (
        pc.ends_with(lflat, pattern=".").to_numpy(zero_copy_only=False)
        | pc.ends_with(lflat, pattern="!").to_numpy(zero_copy_only=False)
        | pc.ends_with(lflat, pattern="?").to_numpy(zero_copy_only=False)
        | pc.ends_with(lflat, pattern='"').to_numpy(zero_copy_only=False)
    )
    w3 = (
        pc.count_substring_regex(lflat, pattern=r"\S+").to_numpy(
            zero_copy_only=False
        )
        >= 3
    )
    js = pc.match_substring(
        pc.utf8_lower(lflat), pattern="javascript"
    ).to_numpy(zero_copy_only=False)
    keep = (term & w3 & ~js).astype(np.int64)
    chars = pc.utf8_length(lflat).to_numpy(zero_copy_only=False).astype(np.int64)
    sents = pc.count_substring_regex(lflat, pattern=r"[.!?]").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    lstarts = np.r_[0, np.cumsum(llens)[:-1]]
    n_kept = np.add.reduceat(keep, lstarts)
    kept_chars = np.add.reduceat(chars * keep, lstarts)
    n_sent = np.add.reduceat(sents * keep, lstarts)
    doc_kept = ((n_sent >= 5) & ~lorem & ~brace).astype(np.int64)
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_lines": pa.array(llens),
            "n_kept_lines": pa.array(n_kept),
            "kept_chars": pa.array(kept_chars),
            "n_sentences": pa.array(n_sent),
            "doc_kept": pa.array(doc_kept),
        }
    )


def q_c4_clean(sf_dir: str):
    """C4 document cleaning pass (Raffel et al. 2020 §2.2) over the
    pinned deterministic webtext corpus (oracle_sketch.
    oracle_webtext_table — the sf documents are single-line
    punctuation-free streams, so the line rules need a line-structured
    input; at production this stage runs on the real extracted-text
    corpus instead). Complements gopher_quality (document-statistic
    gates) with C4's LINE-level retention rules.

    Scale shape: ONE stateless vectorized batch pass (_c4_rules),
    zero exchanges; the input read fans out via override_num_blocks
    so the map stage parallelizes regardless of file count."""
    from .oracle_sketch import oracle_webtext_table

    path = oracle_webtext_table(sf_dir)
    return ray.data.read_parquet(path, override_num_blocks=8).map_batches(
        _c4_rules, batch_format="pyarrow"
    )


SQL_C4_CLEAN = f"""
WITH per AS (
  SELECT doc_id,
    string_split(text, chr(10)) AS ls,
    (lower(text) LIKE '%lorem ipsum%') AS lorem,
    (contains(text, '{{')) AS brace
  FROM read_parquet('{WEBTEXT_ORACLE_PATH}')
), kept AS (
  SELECT doc_id, len(ls) AS n_lines, lorem, brace,
    list_filter(ls, l -> (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%"')
        AND len(regexp_extract_all(l, '\\S+')) >= 3
        AND NOT contains(lower(l), 'javascript')) AS kl
  FROM per
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(n_lines AS BIGINT) AS n_lines,
  CAST(len(kl) AS BIGINT) AS n_kept_lines,
  CAST(COALESCE(list_sum(list_transform(kl, l -> length(l))), 0) AS BIGINT)
    AS kept_chars,
  CAST(COALESCE(list_sum(list_transform(kl,
        l -> len(regexp_extract_all(l, '[.!?]')))), 0) AS BIGINT)
    AS n_sentences,
  CAST(CASE WHEN COALESCE(list_sum(list_transform(kl,
        l -> len(regexp_extract_all(l, '[.!?]')))), 0) >= 5
        AND NOT lorem AND NOT brace THEN 1 ELSE 0 END AS BIGINT) AS doc_kept
FROM kept
"""


def q_packing_efficiency(sf_dir: str, seq_len: int = 512, batch_docs: int = 16):
    """Padding-waste eval of training-batch construction — naive
    arrival-order batching vs length-sorted batching (the standard
    sort-by-length bucketing trick of seq2seq data loaders): docs are
    truncated to ``seq_len`` tokens, grouped ``batch_docs`` per batch
    in each ordering, and every batch pads to its own max length.
    Output: one all-integer row per strategy (n_batches, real_tokens,
    padded_tokens) — padding efficiency = real/padded derivable
    exactly, so the win of sorting is measured, not assumed.

    Scale shape: ONE text pass emits slim (doc_id, l) int64 rows,
    materialized once for the two ordering consumers (the BM25
    fan-out rule); each ordering uses stages/rank.global_sorted_rank
    (distributed sort + O(num_blocks) bounded summary fan-in — row
    data never reaches the driver) and a batch-id groupby over int
    rows; the final fold is a bounded 3-scalar ds.aggregate per
    strategy."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Sum

    from ..stages.rank import global_sorted_rank

    def lens(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            t.column("text"), pattern=r"\S+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = n > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "l": pa.array(np.minimum(n[keep], seq_len), pa.int64()),
            }
        )

    base = (
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8)
        .map_batches(lens, batch_format="pyarrow")
        .materialize()
    )

    def to_batches(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "b": pa.array((r - 1) // batch_docs, pa.int64()),
                "l": t.column("l"),
            }
        )

    def batch_cost(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s": t.column("s"),
                "p": pc.multiply(t.column("m"), t.column("c")),
            }
        )

    rows = []
    for strategy, cols in (("arrival", ["doc_id"]), ("sorted", ["l", "doc_id"])):
        per = (
            global_sorted_rank(base, cols, rank_name="rank")
            .map_batches(to_batches, batch_format="pyarrow")
            .groupby("b")
            .aggregate(
                Max("l", alias_name="m"),
                Sum("l", alias_name="s"),
                Count(alias_name="c"),
            )
            .map_batches(batch_cost, batch_format="pyarrow")
        )
        agg = per.aggregate(
            Sum("s", alias_name="real"),
            Sum("p", alias_name="padded"),
            Count(alias_name="nb"),
        )
        rows.append((strategy, agg["nb"], agg["real"], agg["padded"]))

    return pa.table(
        {
            "strategy": pa.array([r[0] for r in rows], pa.string()),
            "n_batches": pa.array([int(r[1]) for r in rows], pa.int64()),
            "real_tokens": pa.array([int(r[2]) for r in rows], pa.int64()),
            "padded_tokens": pa.array([int(r[3]) for r in rows], pa.int64()),
        }
    )


SQL_PACKING_EFFICIENCY = """
WITH lens AS (
  SELECT doc_id, LEAST(len(regexp_extract_all(text, '\\S+')), 512) AS l
  FROM documents
  WHERE len(regexp_extract_all(text, '\\S+')) > 0
),
arrival AS (
  SELECT l, (row_number() OVER (ORDER BY doc_id) - 1) // 16 AS b FROM lens
),
srt AS (
  SELECT l, (row_number() OVER (ORDER BY l, doc_id) - 1) // 16 AS b FROM lens
),
aa AS (SELECT b, MAX(l) AS m, SUM(l) AS s, COUNT(*) AS c FROM arrival GROUP BY b),
sa AS (SELECT b, MAX(l) AS m, SUM(l) AS s, COUNT(*) AS c FROM srt GROUP BY b)
SELECT 'arrival' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_batches,
       CAST(SUM(s) AS BIGINT) AS real_tokens,
       CAST(SUM(m * c) AS BIGINT) AS padded_tokens
FROM aa
UNION ALL
SELECT 'sorted', CAST(COUNT(*) AS BIGINT), CAST(SUM(s) AS BIGINT),
       CAST(SUM(m * c) AS BIGINT)
FROM sa
"""


def q_semantic_decontaminate(sf_dir: str, n_eval: int = 8, tau: float = 0.3):
    """Embedding-space benchmark decontamination — the semantic
    counterpart of q_decontaminate's verbatim n-gram pass (modern
    model cards audit contamination in BOTH spaces: exact-overlap
    hits AND near-paraphrase embedding hits). Eval set = vec_id <
    ``n_eval`` (the knn-family query discipline); every training
    vector reports its closest eval item by cosine plus a
    ``contaminated`` flag at ``tau`` — cosine rounded to 6 dp BEFORE
    both the argmax and the threshold compare (the repo's standing
    round-before-rank float discipline), with eval-id ascending
    tie-break, so the row set is hash-stable vs DuckDB.

    Scale shape: the eval matrix is tiny and broadcast via ray.put
    (read once per task, never re-shipped per row); scoring is ONE
    stateless vectorized matmul pass with zero exchanges; the wire
    carries slim (vec_id, best_eval_id, best_cos, contaminated) rows,
    never the vectors."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_mod

    from ..functions.vec import list_to_matrix

    t = pq_mod.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    evt = t.filter(pc.less(t.column("vec_id"), n_eval)).sort_by("vec_id")
    eval_ids = evt.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    emat = list_to_matrix(evt.column("embedding"))
    en = np.linalg.norm(emat, axis=1)
    en[en == 0] = 1.0
    eref = ray.put(emat / en[:, None])

    def score(batch: pa.Table) -> pa.Table:
        e = ray.get(eref)
        mat = list_to_matrix(batch.column("embedding"))
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((mat / norms[:, None]) @ e.T, 6)
        # first max = smallest eval_id (rows of e are eval_id-ascending)
        best = np.argmax(sims, axis=1)
        bc = sims[np.arange(len(best)), best]
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "best_eval_id": pa.array(eval_ids[best]),
                "best_cos": pa.array(bc),
                "contaminated": pa.array((bc >= tau).astype(np.int64)),
            }
        )

    return (
        _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(expr=f"vec_id >= {n_eval}")
        .map_batches(score, batch_format="pyarrow")
    )


SQL_SEMANTIC_DECONTAMINATE = """
WITH ev AS (
  SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id < 8
),
tr AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 8
),
scored AS (
  SELECT tr.vec_id, ev.eval_id,
         ROUND(list_cosine_similarity(tr.v, ev.e), 6) AS cos
  FROM tr, ev
),
best AS (
  SELECT vec_id, eval_id, cos,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY cos DESC, eval_id ASC
         ) AS rn
  FROM scored
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(eval_id AS BIGINT) AS best_eval_id,
       cos AS best_cos,
       CAST(CASE WHEN cos >= 0.3 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM best WHERE rn = 1
"""


def q_hard_negatives(
    sf_dir: str, n_queries: int = 4, k: int = 10, pos_tau: float = 0.45
):
    """Hard-negative mining for retrieval-model training — the
    contrastive-training corpus step (BGE/E5/DPR pipelines): for each
    query, the most-similar corpus items that are NOT positives make
    the best negatives. Query set = vec_id < ``n_queries`` (the
    knn-family discipline); candidates are all other vectors whose
    round-6 cosine is strictly below ``pos_tau`` (the near-positive
    band is excluded as unlabeled-positive risk, the standard mining
    margin); output = top-``k`` per query by (cos desc, vec_id asc).

    Scale shape: broadcast query matrix (ray.put once, never
    re-shipped per row); ONE stateless scan emits slim (query_id,
    vec_id, cos) rows pre-filtered below ``pos_tau``; the reduce is
    stages/rank.grouped_topk's pre-combined per-group top-k, so the
    exchange is bounded by k x queries x blocks — never corpus
    scale."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_mod

    from ..functions.vec import list_to_matrix
    from ..stages.rank import grouped_topk

    t = pq_mod.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qt = t.filter(pc.less(t.column("vec_id"), n_queries)).sort_by("vec_id")
    qids = qt.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    qmat = list_to_matrix(qt.column("embedding"))
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0] = 1.0
    qref = ray.put(qmat / qn[:, None])

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        mat = list_to_matrix(batch.column("embedding"))
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((mat / norms[:, None]) @ q.T, 6)  # (b, Q)
        b = len(batch)
        vids = np.repeat(
            batch.column("vec_id").to_numpy(zero_copy_only=False), len(qids)
        )
        qcol = np.tile(qids, b)
        cos = sims.ravel()
        keep = cos < pos_tau
        return pa.table(
            {
                "query_id": pa.array(qcol[keep], pa.int64()),
                "vec_id": pa.array(vids[keep].astype(np.int64)),
                "cos": pa.array(cos[keep]),
            }
        )

    pairs = (
        _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(expr=f"vec_id >= {n_queries}")
        .map_batches(score, batch_format="pyarrow")
    )
    return grouped_topk(
        pairs, "query_id", "cos", k, tiebreak_col="vec_id", descending=True
    )


SQL_HARD_NEGATIVES = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 4
),
c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 4
),
scored AS (
  SELECT q.query_id, c.vec_id,
         ROUND(list_cosine_similarity(c.v, q.qe), 6) AS cos
  FROM c, q
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos DESC, vec_id ASC
         ) AS rank
  FROM scored WHERE cos < 0.45
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(vec_id AS BIGINT) AS vec_id,
       cos,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


def q_dataset_split(sf_dir: str):
    """Deterministic train/val/test split census — the dataset-release
    step every corpus card publishes: docs assigned 90/5/5 by the
    repo's consistent Knuth multiplicative hash of doc_id (the
    docs_hash_sample discipline — the same doc lands in the same split
    on every run, every shard layout, every table sharing the key;
    row order and block boundaries can't move it), reported per
    (lang, split) with doc and char mass so stratification skew is
    visible. Shape: per-batch (lang, split) pre-aggregation (A4
    combiner) then ONE tiny lang x 3 groupby — zero corpus-scale
    exchanges."""
    from ray.data.aggregate import Sum

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = (_knuth32_np(ids) % np.uint64(1000)).astype(np.int64)
        split = np.where(h < 900, "train", np.where(h < 950, "val", "test"))
        tb = pa.table(
            {
                "lang": t.column("lang"),
                "split": pa.array(split, pa.string()),
                "n_docs": pa.array(np.ones(len(t), np.int64)),
                "n_chars": t.column("n_chars"),
            }
        )
        # pre-aggregate within the batch: the wire carries lang x 3
        return tb.group_by(["lang", "split"]).aggregate(
            [("n_docs", "sum"), ("n_chars", "sum")]
        ).rename_columns(["lang", "split", "n_docs", "n_chars"])

    return (
        _pq(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby(["lang", "split"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chars", alias_name="n_chars"),
        )
    )


SQL_DATASET_SPLIT = """
WITH s AS (
  SELECT lang, n_chars,
         ((doc_id * 2654435761) % 4294967296) % 1000 AS h
  FROM documents
)
SELECT lang,
       CASE WHEN h < 900 THEN 'train'
            WHEN h < 950 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM s
GROUP BY 1, 2
"""


def q_token_budget_select(sf_dir: str, budget: int = 15_000):
    """Score-ordered corpus selection under a token budget — the
    "best data first until the budget is spent" step of
    budget-constrained pretraining mixes (data-constrained scaling
    recipes): docs ranked by (score desc, doc_id), kept while the
    RUNNING token total stays within ``budget``. The score column here
    is n_chars (any integer quality score plugs into the same wire);
    output carries the exact cumulative token count per doc so the cut
    is auditable.

    Shape: ONE text pass emits slim (doc_id, n_tokens, score) int64
    rows; the running total is stages/rank.global_sorted_prefix_sum —
    distributed sort + O(num_blocks) bounded (first-key, block-sum)
    summaries, all-integer so the fold is exact; the kept flag is a
    stateless vectorized compare. Row data never reaches the driver."""
    import pyarrow.compute as pc

    from ..stages.rank import global_sorted_prefix_sum

    def lens(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            t.column("text"), pattern=r"\S+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n),
                "_neg_score": pa.array(
                    -t.column("n_chars").to_numpy(zero_copy_only=False).astype(
                        np.int64
                    )
                ),
            }
        )

    base = _pq(
        sf_dir, "documents", ["doc_id", "text", "n_chars"], min_blocks=8
    ).map_batches(lens, batch_format="pyarrow")
    cum = global_sorted_prefix_sum(
        base, ["_neg_score", "doc_id"], "n_tokens", out_name="cum_tokens"
    )

    def finish(t: pa.Table, _b=budget) -> pa.Table:
        c = t.column("cum_tokens").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "cum_tokens": t.column("cum_tokens"),
                "kept": pa.array((c <= _b).astype(np.int64)),
            }
        )

    return cum.map_batches(finish, batch_format="pyarrow")


SQL_TOKEN_BUDGET_SELECT = """
WITH lens AS (
  SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS l, n_chars
  FROM documents
),
c AS (
  SELECT doc_id, l,
         SUM(l) OVER (
           ORDER BY n_chars DESC, doc_id ROWS UNBOUNDED PRECEDING
         ) AS cum
  FROM lens
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(l AS BIGINT) AS n_tokens,
       CAST(cum AS BIGINT) AS cum_tokens,
       CAST(CASE WHEN cum <= 15000 THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM c
"""


def q_jsonl_gz_roundtrip(sf_dir: str):
    """Gzip-compressed JSONL round-trip — the interchange layout
    100 TB corpora actually ship (sharded ``.jsonl`` with whole-file
    gzip members; cf. the WET/WARC members of sources/warc.py): write
    the documents table through Ray's json sink with Arrow gzip
    compression, read the gzip shard tree back, and emit per-document
    md5 digests. The hash check proves byte fidelity through JSON
    escaping AND the compress->decompress cycle — a mangled member or
    re-encoded char changes a digest. Scale: shard-per-block streaming
    both ways, like q_jsonl_roundtrip; only slim digest rows return."""
    import shutil
    import tempfile

    from ..functions.digests import md5_hex_column

    out = tempfile.mkdtemp(prefix="ccray_jsonlgz_", dir="/tmp")
    try:
        _pq(sf_dir, "documents", ["doc_id", "lang", "source", "text"],
            min_blocks=8).write_json(
            out, arrow_open_stream_args={"compression": "gzip"}
        )

        def digest(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t.column("doc_id").cast(pa.int64()),
                    "lang": t.column("lang"),
                    "source": t.column("source"),
                    "text_md5": pa.array(
                        md5_hex_column(t.column("text")), pa.string()
                    ),
                }
            )

        return rd.read_json(
            out,
            arrow_open_stream_args={"compression": "gzip"},
            file_extensions=None,
        ).map_batches(digest, batch_format="pyarrow").to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_JSONL_GZ_ROUNDTRIP = """
SELECT doc_id, lang, source, md5(text) AS text_md5 FROM documents
"""


def q_tfrecord_roundtrip(sf_dir: str):
    """TFRecord source/sink round-trip — the TF/TPU training-shard
    interchange format, spoken from the public on-disk spec with no
    tensorflow/protobuf dependency (sources/tfrecord.py: hand-rolled
    tf.train.Example proto wire + masked-CRC32C record framing, both
    CRCs verified on every read). Write the documents table as
    sharded .tfrecord (one shard per block, content-hash names,
    tmp+rename), read the shard tree back (one parse task per shard),
    and emit per-document md5 digests — the hash check proves byte
    fidelity through the proto encode->frame->parse cycle exactly as
    q_jsonl_roundtrip proves JSON escaping."""
    import shutil
    import tempfile

    from ..functions.digests import md5_hex_column
    from ..sources.tfrecord import read_tfrecord, write_tfrecord

    out = tempfile.mkdtemp(prefix="ccray_tfrec_", dir="/tmp")
    try:
        write_tfrecord(
            _pq(sf_dir, "documents", ["doc_id", "lang", "source", "text"],
                min_blocks=8),
            out,
        ).materialize()  # side-writes must finish before the read

        def digest(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "lang": t.column("lang"),
                    "source": t.column("source"),
                    "text_md5": pa.array(
                        md5_hex_column(t.column("text")), pa.string()
                    ),
                }
            )

        return read_tfrecord(
            out,
            int64_cols=("doc_id",),
            bytes_cols=("lang", "source", "text"),
        ).map_batches(digest, batch_format="pyarrow").to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_TFRECORD_ROUNDTRIP = """
SELECT doc_id, lang, source, md5(text) AS text_md5 FROM documents
"""


def q_seqfile_roundtrip(sf_dir: str):
    """Hadoop SequenceFile source/sink round-trip — the reference
    engine's ACTUAL spill/sink container (SequenceFileSpillWriter.java
    :100-103, SequenceFileReader/Merger), spoken from the public
    on-disk format with no JVM (sources/seqfile.py: SEQ v6 header,
    Text/BytesWritable serialization, Hadoop vints, verified sync
    escapes every 2000 bytes). Write the documents table as sharded
    .seq (Text key = doc_id, BytesWritable value = utf-8 text; one
    content-hash shard per block, tmp+rename), read the tree back
    (one parse task per shard), emit per-document md5 digests — byte
    fidelity through the vint/Text/sync cycle, the
    q_tfrecord_roundtrip discipline."""
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from ..functions.digests import md5_hex_column
    from ..sources.seqfile import read_seqfile, write_seqfile

    out = tempfile.mkdtemp(prefix="ccray_seq_", dir="/tmp")
    try:
        src = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8)
        keyed = src.map_batches(
            lambda t: pa.table(
                {
                    "k": pc.cast(t.column("doc_id"), pa.string()),
                    "text": t.column("text"),
                }
            ),
            batch_format="pyarrow",
        )
        write_seqfile(keyed, out, key_col="k", value_col="text").materialize()

        def digest(t: pa.Table) -> pa.Table:
            txt = pc.cast(t.column("value"), pa.string())
            return pa.table(
                {
                    "doc_id": pc.cast(t.column("key"), pa.int64()),
                    "text_md5": pa.array(md5_hex_column(txt), pa.string()),
                }
            )

        return read_seqfile(out).map_batches(
            digest, batch_format="pyarrow"
        ).to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_SEQFILE_ROUNDTRIP = """
SELECT doc_id, md5(text) AS text_md5 FROM documents
"""


def q_avro_roundtrip(sf_dir: str):
    """Avro Object Container File source/sink round-trip — the classic
    Kafka/Hadoop interchange container, spoken from the public Avro
    binary spec with no avro library (sources/avro.py: zigzag-varint
    primitives, embedded JSON schema, per-block verified sync markers,
    RAW-deflate codec via zlib). Write the documents table as sharded
    deflate-compressed .avro (one content-hash shard per block,
    tmp+rename), read the tree back (one parse task per shard), emit
    per-document md5 digests — byte fidelity through the zigzag/
    deflate/sync cycle, the q_tfrecord_roundtrip discipline."""
    import shutil
    import tempfile

    from ..functions.digests import md5_hex_column
    from ..sources.avro import read_avro, write_avro

    fields = [("doc_id", "long"), ("lang", "string"), ("text", "string")]
    out = tempfile.mkdtemp(prefix="ccray_avro_", dir="/tmp")
    try:
        write_avro(
            _pq(sf_dir, "documents", ["doc_id", "lang", "text"], min_blocks=8),
            out,
            fields,
            codec="deflate",
        ).materialize()

        def digest(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "lang": t.column("lang"),
                    "text_md5": pa.array(
                        md5_hex_column(t.column("text")), pa.string()
                    ),
                }
            )

        return read_avro(out, fields).map_batches(
            digest, batch_format="pyarrow"
        ).to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_AVRO_ROUNDTRIP = """
SELECT doc_id, lang, md5(text) AS text_md5 FROM documents
"""


def _columnar_roundtrip(sf_dir: str, write_fn, read_fn, prefix: str):
    """Shared body of the ORC / Arrow-IPC round-trips (the
    q_avro_roundtrip discipline): write the documents table as one
    content-hash shard per block, read the tree back with one parse
    task per shard, return per-document md5 text digests — the hash
    check proves byte fidelity through the columnar encode/compress
    cycle, and schema fidelity falls out of the typed digest columns
    (an int64 that came back float64 would fail the driver's schema
    compare)."""
    import shutil
    import tempfile

    from ..functions.digests import md5_hex_column

    out = tempfile.mkdtemp(prefix=prefix, dir="/tmp")
    try:
        write_fn(
            _pq(sf_dir, "documents", ["doc_id", "lang", "text"], min_blocks=8),
            out,
        ).materialize()

        def digest(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t.column("doc_id").cast(pa.int64()),
                    "lang": t.column("lang"),
                    "text_md5": pa.array(
                        md5_hex_column(t.column("text")), pa.string()
                    ),
                }
            )

        return read_fn(out).map_batches(
            digest, batch_format="pyarrow"
        ).to_pandas()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_orc_roundtrip(sf_dir: str):
    """ORC source/sink round-trip — the Hive/Presto warehouse column
    format (sources/columnar.py via pyarrow's native ORC writer, zlib
    stripe codec; no JVM): sharded write, shard-tree read-back,
    per-document md5 digests prove byte+schema fidelity through the
    encode/compress cycle."""
    from ..sources.columnar import read_orc, write_orc

    return _columnar_roundtrip(sf_dir, write_orc, read_orc, "ccray_orc_")


SQL_ORC_ROUNDTRIP = """
SELECT doc_id, lang, md5(text) AS text_md5 FROM documents
"""


def q_ipc_roundtrip(sf_dir: str):
    """Arrow IPC (Feather v2) source/sink round-trip — Arrow's own
    zero-copy on-disk framing, the natural spill/interchange format
    for an Arrow-native engine (sources/columnar.py, zstd buffer
    codec): sharded write, shard-tree read-back, per-document md5
    digests prove byte+schema fidelity."""
    from ..sources.columnar import read_ipc, write_ipc

    return _columnar_roundtrip(sf_dir, write_ipc, read_ipc, "ccray_ipc_")


SQL_IPC_ROUNDTRIP = """
SELECT doc_id, lang, md5(text) AS text_md5 FROM documents
"""


def _wacz_pages_table():
    """The q_warc_roundtrip 160-page shard as an Arrow pages table
    (8 hosts x 20 pages of the deterministic universe — the same rows
    the ARC/CDX oracles are built from)."""
    from ..sources.synth import get_universe

    uni = get_universe(0.001, 42)
    urls, tss, recs = [], [], []
    for host in uni.hosts[:8]:
        for k in range(min(20, uni.page_counts[host])):
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


def _wacz_shard_dir() -> str:
    """Write (once per process) the 160-page universe shard as three
    self-contained WACZ packages under /tmp; content-hash names make
    the re-write a no-op when the directory already holds them."""
    import os

    from ..sources.wacz import write_wacz

    d = "/tmp/ccray_wacz_shards"
    if not (os.path.isdir(d) and any(f.endswith(".wacz") for f in os.listdir(d))):
        write_wacz(rd.from_arrow(_wacz_pages_table()).repartition(3), d).count()
    return d


def q_wacz_roundtrip(sf_dir: str):
    """WACZ package layer (sources/wacz.py — Webrecorder's public
    WACZ 1.1.1 spec; the reference predates the format entirely):
    write the same 160-page shard as three self-contained packages
    (WARC archive + CDXJ index + page list + sha256 manifest chain,
    one package per block), read the archive members back through the
    verified Ray source, parse — and hash-check against the SAME
    no-format oracle as arc_roundtrip/warc_roundtrip, proving the
    whole zip+manifest cycle byte-lossless."""
    import hashlib

    from ..sources.wacz import read_wacz_pages
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_arc_roundtrip_table

    oracle_arc_roundtrip_table()

    def digest(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": b.column("url"),
                "url_fp": b.column("url_fp"),
                "http_status": b.column("http_status"),
                "mime_norm": b.column("mime_norm"),
                "digest_hex": pa.array(
                    [
                        hashlib.md5((t_ or "").encode()).hexdigest()
                        for t_ in b.column("text").to_pylist()
                    ],
                    pa.string(),
                ),
            }
        )

    return (
        read_wacz_pages(_wacz_shard_dir())
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(digest, batch_format="pyarrow")
    )


SQL_WACZ_ROUNDTRIP = SQL_ARC_ROUNDTRIP


def q_wacz_cdx(sf_dir: str):
    """The embedded CDXJ index of the WACZ packages, read back through
    the verified source and hash-checked against the no-index
    sequential CDX oracle — the per-package indexes union to exactly
    the corpus capture set (the compare sorts rows), proving the
    in-package index derivation + sorted CDXJ write + zip cycle
    lossless."""
    from ..sources.wacz import read_wacz_cdx
    from .oracle_sketch import oracle_cdx_table

    oracle_cdx_table()
    return read_wacz_cdx(_wacz_shard_dir()).drop_columns(["cdx_key", "shard"])


SQL_WACZ_CDX = f"""
SELECT surt, ts14, url, http_status, mime_norm, digest_hex, length
FROM read_parquet('{CDX_ORACLE_PATH}')
"""


def q_docs_lang_join_skew(sf_dir: str, hot_threshold: int = 100):
    """Per-language doc-count attach through the SKEW-RESILIENT join
    (stages/joins.skew_join — the mega-key broadcast fix-up the plain
    merge_join docstrings defer to): the corpus' zipf-dominant
    language crosses ``hot_threshold`` and takes the broadcast-probe
    path while every other language takes the normal one-exchange
    sort-merge path, so BOTH routes are exercised and hash-checked in
    one query against the plain SQL join (path choice must be
    invisible in the result). Output (doc_id, lang, lang_docs) —
    all-integer."""
    from ray.data.aggregate import Count

    from ..stages.joins import skew_join

    docs = _pq(sf_dir, "documents", ["doc_id", "lang"])
    dim = docs.groupby("lang").aggregate(Count(alias_name="lang_docs"))
    return skew_join(
        docs,
        dim,
        "lang",
        "lang",
        ["lang_docs"],
        how="inner",
        hot_threshold=hot_threshold,
    )


SQL_DOCS_LANG_JOIN_SKEW = """
WITH dim AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS lang_docs
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, dim.lang_docs
FROM documents d JOIN dim ON d.lang = dim.lang
"""


# --------------------------------------------------------------------
# boilerplate removal + structured-data extraction (stages/boilerplate)
# --------------------------------------------------------------------


def q_boilerplate_extract(sf_dir: str):
    """JusText-style main-content extraction (Pomikálek 2011) over the
    deterministic boilerplate-wrapped documents universe. GENUINE
    independent oracle: the wrapper guarantees the content paragraphs
    reassemble to exactly ``documents.text`` and that the good-block
    count equals ceil(words/12), both pure SQL — the classifier must
    actually separate nav/sidebar/related/footer junk from content to
    match. Stateless map stage, zero exchange; at 100 TB the input is
    the pages html column and the shape is identical."""
    from ..stages.boilerplate import boilerplate_batch

    return (
        _pq(sf_dir, "documents", ["doc_id", "text", "lang", "source"], min_blocks=8)
        .map_batches(boilerplate_batch, batch_format="pyarrow")
        .map_batches(
            lambda b: b.drop_columns(["n_blocks"]), batch_format="pyarrow"
        )
    )


SQL_BOILERPLATE_EXTRACT = """
SELECT doc_id,
       text AS main_text,
       CAST(length(text) AS BIGINT) AS main_len,
       CAST(ceil((length(text) - length(replace(text, ' ', '')) + 1) / 12.0)
            AS BIGINT) AS n_good
FROM documents
"""


def q_structured_data(sf_dir: str):
    """JSON-LD / OpenGraph / microdata extraction exploded to
    (doc_id, kind, key, value) rows. The wrapper embeds each field as
    a pure SQL function of the documents columns, so DuckDB
    reconstructs the expected rows independently — the extractor must
    parse real script-JSON, og: meta and itemprop spans to match."""
    from ..stages.boilerplate import structured_batch

    return _pq(
        sf_dir, "documents", ["doc_id", "text", "lang", "source"], min_blocks=8
    ).map_batches(structured_batch, batch_format="pyarrow")


SQL_STRUCTURED_DATA = """
WITH d AS (
  SELECT doc_id, text, lang, source,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_words
  FROM documents
)
SELECT doc_id, 'jsonld' AS kind, '@type' AS key, 'Article' AS value FROM d
UNION ALL SELECT doc_id, 'jsonld', 'identifier', CAST(doc_id AS VARCHAR) FROM d
UNION ALL SELECT doc_id, 'jsonld', 'inLanguage', lang FROM d
UNION ALL SELECT doc_id, 'jsonld', 'publisher', source FROM d
UNION ALL SELECT doc_id, 'jsonld', 'wordCount', CAST(n_words AS VARCHAR) FROM d
UNION ALL SELECT doc_id, 'og', 'og:title', 'Doc ' || doc_id FROM d
UNION ALL SELECT doc_id, 'og', 'og:locale', lang FROM d
UNION ALL SELECT doc_id, 'og', 'og:site_name', source FROM d
UNION ALL SELECT doc_id, 'microdata', 'name', 'doc-' || doc_id FROM d
UNION ALL SELECT doc_id, 'microdata', 'genre', lang FROM d
"""


def q_dust_rules(sf_dir: str):
    """DUST URL-rewrite-rule mining (Bar-Yossef et al., WWW 2007) over
    the deterministic alias universe: every document is served under
    four systematic URL aliases (php-query, bare, /index.html,
    ?print=1) with a doc-unique content digest; the miner must recover
    exactly the four site-wide substitution rules at full support from
    the same-digest pair evidence, while the ~2·|docs| id-specific
    coincidence rules fall under min_support. GENUINE independent
    oracle: the planted rules and their supports are pure SQL over the
    documents table. One sort(digest) exchange, capped groups with
    skip counters, rule-scale groupby."""
    from ..stages.dust import alias_rows, mine_dust_rules

    docs = _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8)

    def to_aliases(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        us: list[str] = []
        dg: list[str] = []
        for i, x in zip(ids, texts):
            u, d = alias_rows(i, x or "")
            us.extend(u)
            dg.extend(d)
        return pa.table(
            {
                "url": pa.array(us, pa.string()),
                "digest": pa.array(dg, pa.string()),
            }
        )

    return mine_dust_rules(
        docs.map_batches(to_aliases, batch_format="pyarrow"), min_support=3
    )


SQL_DUST_RULES = """
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents)
SELECT '' AS alpha, '/index.html' AS beta, c AS support FROM n
UNION ALL SELECT '', '?print=1', c FROM n
UNION ALL SELECT '.php?id=', '/', c FROM n
UNION ALL SELECT '/index.html', '?print=1', c FROM n
"""


_PHASH_ORACLE_PATH = "/tmp/ccray_oracle_phash.parquet"
_PHASH_MAX_HAMMING = 4


def _phash_corpus_n(sf_dir: str) -> int:
    # sf capped at 0.1 (n <= 2000): the brute-force all-pairs oracle
    # is O(n^2) — the q_cocitation_hosts min(sf, ...) discipline
    from ..sources.synth import sf_from_dir

    return max(64, int(min(sf_from_dir(sf_dir), 0.1) * 20000))


def ensure_phash_oracle_table(sf_dir: str, path: str = _PHASH_ORACLE_PATH) -> str:
    """Brute-force all-pairs pHash hamming oracle — INDEPENDENT of the
    distributed path's band-LSH candidate generation (it enumerates
    every pair, so an LSH recall bug or bucket-cap mistake surfaces as
    a hash mismatch, not just a plan-integrity miss). Pure numpy, no
    Ray session; freshness-cached + atomic (the oracle_sketch
    discipline)."""
    from ..stages.multimodal import _dct_basis_int, phash_grid, synth_image_corpus
    from .oracle_sketch import _is_fresh, _write_atomic

    n = _phash_corpus_n(sf_dir)
    src_key = f"phash|v1|{n}|{_PHASH_MAX_HAMMING}"
    if _is_fresh(path, src_key):
        return path
    t = synth_image_corpus(n)
    basis = _dct_basis_int()
    hs = np.array(
        [
            phash_grid(
                np.frombuffer(p, np.uint8).reshape(
                    m["height"], m["width"]
                ),
                basis,
            )
            for p, m in zip(
                t.column("payload").to_pylist(), t.column("meta").to_pylist()
            )
        ],
        dtype=np.int64,
    ).view(np.uint64)
    iu, ju = np.triu_indices(n, k=1)
    x = hs[iu] ^ hs[ju]
    ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(
        axis=1, dtype=np.int64
    )
    hit = ham <= _PHASH_MAX_HAMMING
    out = pa.table(
        {
            "id_a": pa.array(iu[hit].astype(np.int64)),
            "id_b": pa.array(ju[hit].astype(np.int64)),
            "hamming": pa.array(ham[hit]),
        }
    )
    return _write_atomic(out, path, src_key)


def q_phash_neardup(sf_dir: str):
    """Perceptual-hash image near-dup (the LAION-style multimodal
    dedup): pHash per image on an actor pool (exact fixed-point DCT),
    8x8-bit band LSH bucketing + exact hamming verify, distinct pairs
    — stages/multimodal.phash_near_dup. Input is the deterministic
    planted-near-dup image corpus scaled by sf (at 100 TB the media
    table arrives from parquet; the pipeline shape is identical).
    Oracle: brute-force ALL-PAIRS hamming (independent of the LSH
    candidate path) written to parquet for DuckDB."""
    from ..stages.multimodal import phash_near_dup, synth_image_corpus

    ensure_phash_oracle_table(sf_dir)
    media = rd.from_arrow(synth_image_corpus(_phash_corpus_n(sf_dir))).repartition(8)
    return phash_near_dup(media, max_hamming=_PHASH_MAX_HAMMING, fake=True)


SQL_PHASH_NEARDUP = f"""
SELECT id_a, id_b, hamming
FROM read_parquet('{_PHASH_ORACLE_PATH}')
"""


def q_search_snippets(sf_dir: str, term: str = "data", width: int = 5):
    """KWIC snippet generation — the serving-side last mile after
    bm25_topk/phrase_search: for every document containing ``term``,
    the ±``width``-word window around its FIRST occurrence (exact
    whitespace tokens). Stateless single-pass map, zero exchange;
    GENUINE SQL oracle via DuckDB list kernels (string_split +
    list_position + inclusive slice — semantics matched exactly)."""

    def snip(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        out_id: list[int] = []
        out_pos: list[int] = []
        out_sn: list[str] = []
        for d, x in zip(ids, texts):
            ws = (x or "").split(" ")
            try:
                i0 = ws.index(term)
            except ValueError:
                continue
            out_id.append(d)
            out_pos.append(i0 + 1)  # 1-based, the SQL list_position
            out_sn.append(" ".join(ws[max(0, i0 - width) : i0 + width + 1]))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "pos": pa.array(out_pos, pa.int64()),
                "snippet": pa.array(out_sn, pa.string()),
            }
        )

    return _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=8).map_batches(
        snip, batch_format="pyarrow"
    )


SQL_SEARCH_SNIPPETS = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
m AS (
  SELECT doc_id, ws, list_position(ws, 'data') AS i FROM t
)
SELECT doc_id,
       CAST(i AS BIGINT) AS pos,
       array_to_string(ws[greatest(1, i - 5) : least(len(ws), i + 5)], ' ')
         AS snippet
FROM m WHERE i > 0
"""


def q_lang_id_confusion(sf_dir: str):
    """Language-ID confusion matrix — the standard eval artifact over
    the lang_id_lm predictions: (true lang, predicted lang, n). Same
    distributed prediction pipeline, one lang-square-scale groupby.
    Oracle: SQL GROUP BY over the sequential lang-id oracle table."""
    from ray.data.aggregate import Count

    from ..stages.lm_score import lang_id_lm, train_char_lm_by_lang
    from .oracle_sketch import oracle_lang_id_table

    oracle_lang_id_table(sf_dir)
    docs = _pq(sf_dir, "documents", ["doc_id", "lang", "text"], min_blocks=4)
    langs, mat = train_char_lm_by_lang(docs.select_columns(["lang", "text"]))
    preds = lang_id_lm(docs, langs, mat)
    return (
        preds.groupby(["lang", "lang_pred"])
        .aggregate(Count(alias_name="n"))
        .map_batches(
            lambda t: pa.table(
                {
                    "lang": t.column("lang"),
                    "lang_pred": t.column("lang_pred"),
                    "n": t.column("n").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


from .oracle_sketch import LANG_ID_ORACLE_PATH as _LANG_ID_PATH_  # noqa: E402

SQL_LANG_ID_CONFUSION = f"""
SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
FROM read_parquet('{_LANG_ID_PATH_}')
GROUP BY 1, 2
"""


def q_crawl_fairness(sf_dir: str):
    """Crawl fairness audit: the Gini coefficient of per-host fetched
    counts over a short crawl's log — the crawl-ops metric for 'is the
    politeness scheduler starving the tail while mega-hosts eat the
    budget'. G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n with x ascending
    (i = 1-based rank): 0 = perfectly even, ->1 = one host dominates.

    Shape: log consumed lazily, one host-scale groupby, the ascending
    rank via stages/rank.global_sorted_rank (O(blocks) driver
    summaries), then ONE three-scalar aggregate — integer sums
    throughout, a single float expression at the end, written in the
    same operation order as the SQL oracle so the 6-dp rounds agree
    bit-for-bit."""
    import shutil
    import tempfile

    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from ..stages.rank import global_sorted_rank
    from .crawl import crawl

    ensure_crawl_oracle_table()
    ckpt = tempfile.mkdtemp(prefix="cc_ray_crawl_fair_")
    try:
        res = crawl(_crawl_cfg(), ckpt)
        counts = (
            res.log_dataset()
            .map_batches(
                lambda t: t.filter(
                    pc.equal(t.column("action"), "fetched")
                ).select(["host_fp"]),
                batch_format="pyarrow",
            )
            .groupby("host_fp")
            .count()
            .map_batches(
                lambda t: pa.table(
                    {
                        "host_fp": t.column("host_fp"),
                        "x": t.column("count()").cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        ranked = global_sorted_rank(counts, ["x", "host_fp"], rank_name="i")
        parts = ranked.map_batches(
            lambda t: pa.table(
                {
                    "x": t.column("x"),
                    "ix": pa.array(
                        t.column("i").to_numpy(zero_copy_only=False)
                        * t.column("x").to_numpy(zero_copy_only=False),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        agg = parts.aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"),
            Sum("ix", alias_name="six"),
        )
        n, sx, six = int(agg["n"]), int(agg["sx"]), int(agg["six"])
        gini = round(2.0 * six / (n * sx) - (n + 1.0) / n, 6)
        return pa.table(
            {
                "n_hosts": pa.array([n], pa.int64()),
                "total_fetched": pa.array([sx], pa.int64()),
                "gini": pa.array([gini], pa.float64()),
            }
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


SQL_CRAWL_FAIRNESS = f"""
WITH c AS (
  SELECT host_fp, CAST(count(*) AS BIGINT) AS x
  FROM read_parquet('{_CRAWL_ORACLE_PATH}')
  WHERE action = 'fetched' GROUP BY host_fp
),
r AS (SELECT x, row_number() OVER (ORDER BY x, host_fp) AS i FROM c)
SELECT CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(sum(x) AS BIGINT) AS total_fetched,
       round(2.0 * sum(i * x) / (count(*) * sum(x))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM r
"""


def _copair_block(
    t: pa.Table, key_col: str, val_col: str, max_out: int, op: str
) -> pa.Table:
    """Block kernel shared by co-citation and bibliographic coupling:
    per distinct ``key_col`` value (the block is key-co-partitioned by
    the upstream sort), all ordered pairs of its distinct ``val_col``
    neighbors, pre-aggregated with one np.unique over the fused pair
    strings — no per-pair Python. Keys wider than ``max_out`` are
    skipped with counters."""
    from ..state.counters import count_skip

    empty = pa.table(
        {
            "host_a": pa.array([], pa.string()),
            "host_b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )
    if len(t) == 0:
        return empty
    key = t.column(key_col).to_numpy(zero_copy_only=False)
    val = np.asarray(t.column(val_col).to_pylist(), dtype=object)
    order = np.lexsort((val, key))
    key_s, val_s = key[order], val[order]
    starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
    ends = np.r_[starts[1:], len(key_s)]
    a_parts: list[np.ndarray] = []
    b_parts: list[np.ndarray] = []
    skipped = 0
    for s, e in zip(starts, ends):
        nb = val_s[s:e]
        nb = nb[np.r_[True, nb[1:] != nb[:-1]]]  # distinct (sorted)
        k = len(nb)
        if k < 2:
            continue
        if k > max_out:
            skipped += 1
            continue
        ii, jj = np.triu_indices(k, 1)
        a_parts.append(nb[ii])
        b_parts.append(nb[jj])
    if skipped:
        count_skip(op, buckets=skipped)
    if not a_parts:
        return empty
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    fused = np.char.add(np.char.add(a.astype("U"), "\t"), b.astype("U"))
    uniq, counts = np.unique(fused, return_counts=True)
    split = np.char.partition(uniq, "\t")
    return pa.table(
        {
            "host_a": pa.array(split[:, 0], pa.string()),
            "host_b": pa.array(split[:, 2], pa.string()),
            "n": pa.array(counts.astype(np.int64)),
        }
    )


def _host_pair_query(sf_dir: str, sort_cols: list, key_col: str, val_col: str, op: str):
    """Shared pipeline of q_cocitation_hosts / q_coupling_hosts: build
    the host edge table from the pages universe, ONE _distinct_sorted
    exchange on ``sort_cols`` (whose blocks are then key-co-partitioned
    for free), the vectorized _copair_block pair emission, ONE
    pair-scale groupby, n>=2 cut."""
    import os

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..sources.synth import pages_cache_dir, sf_from_dir, write_pages_parquet_ray
    from ..stages.pagerank import _distinct_sorted, extract_host_edges_batch
    from ..stages.parse_extract import parse_extract_batch
    from .oracle_sketch import oracle_host_edges_table

    max_out = 4096
    sf = min(sf_from_dir(sf_dir), 0.01)
    path = pages_cache_dir(sf)
    if not os.path.isdir(path) or not os.listdir(path):
        write_pages_parquet_ray(path, sf)
    oracle_host_edges_table(sf_dir)
    edges = _distinct_sorted(
        rd.read_parquet(path, columns=["url", "warc_ts", "html"])
        .map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["url", "anchors", "base_url"]),
            batch_format="pyarrow",
        )
        .map_batches(extract_host_edges_batch, batch_format="pyarrow"),
        sort_cols,
    )
    sums = (
        edges.map_batches(
            lambda t: _copair_block(t, key_col, val_col, max_out, op),
            batch_format="pyarrow",
            batch_size=None,
        )
        .groupby(["host_a", "host_b"])
        .aggregate(Sum("n", alias_name="n_common"))
    )
    return sums.map_batches(
        lambda t: pa.table(
            {
                "host_a": t.column("host_a"),
                "host_b": t.column("host_b"),
                "n_common": t.column("n_common").cast(pa.int64()),
            }
        ).filter(pc.greater_equal(t.column("n_common"), 2)),
        batch_format="pyarrow",
    )


def q_cocitation_hosts(sf_dir: str):
    """Host co-citation similarity (Small 1973 — two hosts are related
    when the same pages link BOTH): for every src host, its distinct
    out-neighbor pairs, counted across all srcs; pairs co-cited >= 2
    times survive. The IR-classic related-sites signal beside HITS/
    SALSA on the same host graph. Shape + oracle notes:
    _host_pair_query (the capped per-key np.triu wedge discipline;
    the SQL oracle is the uncapped plain self-join over the
    sequential edge table — cap never hit at test scale)."""
    return _host_pair_query(sf_dir, ["src", "dst"], "src", "dst", "cocitation")


SQL_COCITATION_HOSTS = """
WITH e AS (
  SELECT DISTINCT src, dst
  FROM read_parquet('/tmp/ccray_oracle_host_edges.parquet')
)
SELECT a.dst AS host_a, b.dst AS host_b, CAST(count(*) AS BIGINT) AS n_common
FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
GROUP BY 1, 2
HAVING count(*) >= 2
"""


def q_coupling_hosts(sf_dir: str):
    """Bibliographic coupling (Kessler 1963 — the dual of co-citation:
    two hosts are related when they link to the SAME targets): per dst
    host, all ordered pairs of its distinct in-linker srcs, counted
    across dsts, n>=2 cut. Identical shape to q_cocitation_hosts with
    the roles swapped — the co-partitioning sort runs on dst."""
    return _host_pair_query(sf_dir, ["dst", "src"], "dst", "src", "coupling")


SQL_COUPLING_HOSTS = """
WITH e AS (
  SELECT DISTINCT src, dst
  FROM read_parquet('/tmp/ccray_oracle_host_edges.parquet')
)
SELECT a.src AS host_a, b.src AS host_b, CAST(count(*) AS BIGINT) AS n_common
FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
GROUP BY 1, 2
HAVING count(*) >= 2
"""


_AFP_ORACLE_PATH = "/tmp/ccray_oracle_audiofp.parquet"
_AFP_MAX_HAMMING = 6


def ensure_audio_fp_oracle_table(sf_dir: str, path: str = _AFP_ORACLE_PATH) -> str:
    """Brute-force all-pairs audio-fingerprint hamming oracle —
    independent of the distributed band-LSH candidate path (the
    phash oracle discipline). Pure numpy, freshness-cached +
    atomic."""
    from ..stages.multimodal import audio_fp_samples, synth_audio_corpus
    from .oracle_sketch import _is_fresh, _write_atomic

    n = _phash_corpus_n(sf_dir)
    src_key = f"audiofp|v1|{n}|{_AFP_MAX_HAMMING}"
    if _is_fresh(path, src_key):
        return path
    t = synth_audio_corpus(n)
    hs = np.array(
        [
            audio_fp_samples(np.frombuffer(p, np.uint8).astype(np.int64) - 128)
            for p in t.column("payload").to_pylist()
        ],
        dtype=np.int64,
    ).view(np.uint64)
    iu, ju = np.triu_indices(n, k=1)
    x = hs[iu] ^ hs[ju]
    ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(
        axis=1, dtype=np.int64
    )
    hit = ham <= _AFP_MAX_HAMMING
    out = pa.table(
        {
            "id_a": pa.array(iu[hit].astype(np.int64)),
            "id_b": pa.array(ju[hit].astype(np.int64)),
            "hamming": pa.array(ham[hit]),
        }
    )
    return _write_atomic(out, path, src_key)


def q_audio_fp_neardup(sf_dir: str):
    """Audio near-dup via Haitsma-Kalker band-energy fingerprints
    (stages/multimodal.audio_fp_near_dup — exact integer energies,
    actor-pool hashing, shared banded-hamming reduction). Oracle:
    brute-force all-pairs hamming, independent of the LSH path."""
    from ..stages.multimodal import audio_fp_near_dup, synth_audio_corpus

    ensure_audio_fp_oracle_table(sf_dir)
    media = rd.from_arrow(synth_audio_corpus(_phash_corpus_n(sf_dir))).repartition(8)
    return audio_fp_near_dup(media, max_hamming=_AFP_MAX_HAMMING, fake=True)


SQL_AUDIO_FP_NEARDUP = f"""
SELECT id_a, id_b, hamming
FROM read_parquet('{_AFP_ORACLE_PATH}')
"""


_SUFFIX_ORACLE_PATH = "/tmp/ccray_oracle_suffix_census.parquet"


def ensure_suffix_oracle_table(sf_dir: str, path: str = _SUFFIX_ORACLE_PATH) -> str:
    """Sequential duplicated-window census oracle — an INDEPENDENT
    algorithm (per-level Counter over actual token tuples) computing
    the same definition the distributed prefix-doubling ranks compute
    (no shared kernels beyond the tokenize+truncate guard).
    Freshness-cached + atomic."""
    import os

    import pyarrow.parquet as pqm

    from ..stages.suffix import sequential_dup_window_census
    from .oracle_sketch import _is_fresh, _write_atomic

    src_key = f"suffix_census|v1|{os.path.abspath(sf_dir)}"
    if _is_fresh(path, src_key):
        return path
    t = pqm.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    res = sequential_dup_window_census(t.to_pylist())
    ids = sorted(res)
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "max_dup_len": pa.array([res[d][0] for d in ids], pa.int64()),
            "n_dup_1": pa.array([res[d][1] for d in ids], pa.int64()),
            "n_dup_8": pa.array([res[d][2] for d in ids], pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


def q_dup_window_census(sf_dir: str):
    """Exact-substring duplication census via distributed suffix
    ranking (prefix doubling — the Lee et al. 2021 suffix-array
    dedup primitive; stages/suffix.py): per doc, the longest
    power-of-2 token window duplicated anywhere in the corpus and the
    duplicated-position counts at window sizes 1 and 8. Oracle: a
    sequential per-level token-tuple Counter — a DIFFERENT algorithm
    for the same definition, so a ranking/join/fuse bug anywhere in
    the doubling lattice breaks the hash."""
    from ..stages.suffix import dup_window_census

    ensure_suffix_oracle_table(sf_dir)
    return dup_window_census(
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4)
    )


SQL_DUP_WINDOW_CENSUS = f"""
SELECT doc_id, max_dup_len, n_dup_1, n_dup_8
FROM read_parquet('{_SUFFIX_ORACLE_PATH}')
"""


_SUFFIX_STRIP_ORACLE_PATH = "/tmp/ccray_oracle_suffix_strip.parquet"


def ensure_suffix_strip_oracle_table(
    sf_dir: str, path: str = _SUFFIX_STRIP_ORACLE_PATH
) -> str:
    """Sequential strip oracle (Counter + coverage mask — independent
    of the doubling lattice). Freshness-cached + atomic."""
    import os

    import pyarrow.parquet as pqm

    from ..stages.suffix import sequential_dup_window_strip
    from .oracle_sketch import _is_fresh, _write_atomic

    src_key = f"suffix_strip|v1|{os.path.abspath(sf_dir)}"
    if _is_fresh(path, src_key):
        return path
    t = pqm.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    res = sequential_dup_window_strip(t.to_pylist())
    ids = sorted(res)
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "stripped_text": pa.array([res[d][0] for d in ids], pa.string()),
            "n_kept": pa.array([res[d][1] for d in ids], pa.int64()),
            "n_stripped": pa.array([res[d][2] for d in ids], pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


def q_dup_window_strip(sf_dir: str):
    """The Lee-et-al dedup step: strip every token covered by a
    duplicated 8-token window found by exact distributed suffix
    ranking (stages/suffix.dup_window_strip) — the suffix-array
    counterpart of the fixed-gram dup_passage_strip. Oracle: the
    independent sequential Counter+mask fold."""
    from ..stages.suffix import dup_window_strip

    ensure_suffix_strip_oracle_table(sf_dir)
    return dup_window_strip(
        _pq(sf_dir, "documents", ["doc_id", "text"], min_blocks=4)
    )


SQL_DUP_WINDOW_STRIP = f"""
SELECT doc_id, stripped_text, n_kept, n_stripped
FROM read_parquet('{_SUFFIX_STRIP_ORACLE_PATH}')
"""


REGISTRY: dict[str, tuple] = {
    "boilerplate_extract": (q_boilerplate_extract, SQL_BOILERPLATE_EXTRACT),
    "structured_data": (q_structured_data, SQL_STRUCTURED_DATA),
    "dust_rules": (q_dust_rules, SQL_DUST_RULES),
    "phash_neardup": (q_phash_neardup, SQL_PHASH_NEARDUP),
    "audio_fp_neardup": (q_audio_fp_neardup, SQL_AUDIO_FP_NEARDUP),
    "crawl_fairness": (q_crawl_fairness, SQL_CRAWL_FAIRNESS),
    "search_snippets": (q_search_snippets, SQL_SEARCH_SNIPPETS),
    "lang_id_confusion": (q_lang_id_confusion, SQL_LANG_ID_CONFUSION),
    "cocitation_hosts": (q_cocitation_hosts, SQL_COCITATION_HOSTS),
    "coupling_hosts": (q_coupling_hosts, SQL_COUPLING_HOSTS),
    "dup_window_census": (q_dup_window_census, SQL_DUP_WINDOW_CENSUS),
    "dup_window_strip": (q_dup_window_strip, SQL_DUP_WINDOW_STRIP),
    # name -> (ray_fn, oracle_sql | None)
    "events_histogram": (q_events_histogram, SQL_EVENTS_HISTOGRAM),
    "top_docs": (q_top_docs, SQL_TOP_DOCS),
    "doc_lang_stats": (q_doc_lang_stats, SQL_DOC_LANG_STATS),
    "exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
    "token_counts": (q_token_counts, SQL_TOKEN_COUNTS),
    "events_tumbling": (q_events_tumbling, SQL_EVENTS_TUMBLING),
    "events_sessions": (q_events_sessions, SQL_EVENTS_SESSIONS),
    "events_sliding": (q_events_sliding, SQL_EVENTS_SLIDING),
    "events_asof": (q_events_asof, SQL_EVENTS_ASOF),
    "events_interval_join": (q_events_interval_join, SQL_EVENTS_INTERVAL_JOIN),
    "events_quantiles": (q_events_quantiles, SQL_EVENTS_QUANTILES),
    "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL_FEATURES),
    "multimodal_resize": (q_multimodal_resize, SQL_MULTIMODAL_RESIZE),
    "orders_by_segment": (q_orders_by_segment, SQL_ORDERS_BY_SEGMENT),
    "orders_customer_join": (q_orders_customer_join, SQL_ORDERS_CUSTOMER_JOIN),
    "top_docs_per_lang": (q_top_docs_per_lang, SQL_TOP_DOCS_PER_LANG),
    "llm_prep": (q_llm_prep, SQL_LLM_PREP),
    "suppliers_by_region": (q_suppliers_by_region, SQL_SUPPLIERS_BY_REGION),
    "lineitem_pricing": (q_lineitem_pricing, SQL_LINEITEM_PRICING),
    "lineitem_filter": (q_lineitem_filter, SQL_LINEITEM_FILTER),
    "knn_cosine": (q_knn_cosine, SQL_KNN_COSINE),
    "embedding_neardup": (q_embedding_neardup, SQL_EMBEDDING_NEARDUP),
    "embedding_neardup_lsh": (q_embedding_neardup_lsh, SQL_EMBEDDING_NEARDUP_LSH),
    "sharded_top_docs": (q_sharded_top_docs, SQL_SHARDED_TOP_DOCS),
    "knn_ivf": (q_knn_ivf, SQL_KNN_IVF),
    "knn_ivfpq": (q_knn_ivfpq, SQL_KNN_IVFPQ),
    "pagerank_hosts": (q_pagerank_hosts, SQL_PAGERANK_HOSTS),
    "hits_hosts": (q_hits_hosts, SQL_HITS_HOSTS),
    "trustrank_hosts": (q_trustrank_hosts, SQL_TRUSTRANK_HOSTS),
    "crawl_trap_hosts": (q_crawl_trap_hosts, SQL_CRAWL_TRAP_HOSTS),
    "mirror_hosts": (q_mirror_hosts, SQL_MIRROR_HOSTS),
    "spam_mass_hosts": (q_spam_mass_hosts, SQL_SPAM_MASS_HOSTS),
    "reciprocal_links": (q_reciprocal_links, SQL_RECIPROCAL_LINKS),
    "kcore_hosts": (q_kcore_hosts, SQL_KCORE_HOSTS),
    "ktruss_hosts": (q_ktruss_hosts, SQL_KTRUSS_HOSTS),
    "rwr_host_sample": (q_rwr_host_sample, SQL_RWR_HOST_SAMPLE),
    "collocations_pmi": (q_collocations_pmi, SQL_COLLOCATIONS_PMI),
    "oov_census": (q_oov_census, SQL_OOV_CENSUS),
    "sq_recall": (q_sq_recall, SQL_SQ_RECALL),
    "ip_colocation": (q_ip_colocation, SQL_IP_COLOCATION),
    "hyperball_harmonic": (q_hyperball_harmonic, SQL_HYPERBALL_HARMONIC),
    "degree_assortativity": (q_degree_assortativity, SQL_DEGREE_ASSORTATIVITY),
    "distance_distribution": (q_distance_distribution, SQL_DISTANCE_DISTRIBUTION),
    "clustering_coefficients": (
        q_clustering_coefficients,
        SQL_CLUSTERING_COEFFICIENTS,
    ),
    "bowtie_decomposition": (q_bowtie_decomposition, SQL_BOWTIE_DECOMPOSITION),
    "seed_distance": (q_seed_distance, SQL_SEED_DISTANCE),
    "scc_hosts": (q_scc_hosts, SQL_SCC_HOSTS),
    "host_template_grams": (q_host_template_grams, SQL_HOST_TEMPLATE_GRAMS),
    "salsa_hosts": (q_salsa_hosts, SQL_SALSA_HOSTS),
    "opic_hosts": (q_opic_hosts, SQL_OPIC_HOSTS),
    "host_rank": (q_host_rank, SQL_HOST_RANK),
    "zipf_fit": (q_zipf_fit, SQL_ZIPF_FIT),
    "lpa_communities": (q_lpa_communities, SQL_LPA_COMMUNITIES),
    "knn_ivf_exhaustive": (q_knn_ivf_exhaustive, SQL_KNN_IVF_EXHAUSTIVE),
    "simhash_docs": (q_simhash_docs, SQL_SIMHASH_DOCS),
    "minhash_lsh_dedup": (q_minhash_lsh_dedup, SQL_MINHASH_LSH_DEDUP),
    "neardup_clusters": (q_neardup_clusters, SQL_NEARDUP_CLUSTERS),
    "neardup_dedup_docs": (q_neardup_dedup_docs, SQL_NEARDUP_DEDUP_DOCS),
    "neardup_keep_best": (q_neardup_keep_best, SQL_NEARDUP_KEEP_BEST),
    "approx_distinct_users": (q_approx_distinct_users, SQL_APPROX_DISTINCT_USERS),
    "cms_token_counts": (q_cms_token_counts, SQL_CMS_TOKEN_COUNTS),
    "audience_overlap": (q_audience_overlap, SQL_AUDIENCE_OVERLAP),
    "approx_distinct_users_by_type": (
        q_approx_distinct_users_by_type,
        SQL_APPROX_DISTINCT_USERS_BY_TYPE,
    ),
    "heavy_hitters_langs": (q_heavy_hitters_langs, SQL_HEAVY_HITTERS_LANGS),
    "events_value_sketch_quantiles": (
        q_events_value_sketch_quantiles,
        SQL_EVENTS_VALUE_SKETCH_QUANTILES,
    ),
    "events_running_total": (q_events_running_total, SQL_EVENTS_RUNNING_TOTAL),
    "events_percent_rank": (q_events_percent_rank, SQL_EVENTS_PERCENT_RANK),
    "events_value_delta": (q_events_value_delta, SQL_EVENTS_VALUE_DELTA),
    "events_rolling_avg": (q_events_rolling_avg, SQL_EVENTS_ROLLING_AVG),
    "signup_to_purchase_funnel": (
        q_signup_to_purchase_funnel,
        SQL_SIGNUP_TO_PURCHASE_FUNNEL,
    ),
    "customers_with_orders": (q_customers_with_orders, SQL_CUSTOMERS_WITH_ORDERS),
    "local_supplier_volume": (q_local_supplier_volume, SQL_LOCAL_SUPPLIER_VOLUME),
    "unshipped_orders_revenue": (
        q_unshipped_orders_revenue,
        SQL_UNSHIPPED_ORDERS_REVENUE,
    ),
    "orders_of_rich_customers_bloom": (
        q_orders_of_rich_customers_bloom,
        SQL_ORDERS_OF_RICH_CUSTOMERS_BLOOM,
    ),
    "customers_without_orders": (
        q_customers_without_orders,
        SQL_CUSTOMERS_WITHOUT_ORDERS,
    ),
    "docs_partitioned_write": (
        q_docs_partitioned_write,
        SQL_DOCS_PARTITIONED_WRITE,
    ),
    "shuffle_export": (q_shuffle_export, SQL_SHUFFLE_EXPORT),
    "jsonl_roundtrip": (q_jsonl_roundtrip, SQL_JSONL_ROUNDTRIP),
    "csv_roundtrip": (q_csv_roundtrip, SQL_CSV_ROUNDTRIP),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "text_normalize": (q_text_normalize, SQL_TEXT_NORMALIZE),
    "source_spam_filter": (q_source_spam_filter, SQL_SOURCE_SPAM_FILTER),
    "anchor_text": (q_anchor_text, SQL_ANCHOR_TEXT),
    "inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
    "host_components": (q_host_components, SQL_HOST_COMPONENTS),
    "bpe_token_counts": (q_bpe_token_counts, SQL_BPE_TOKEN_COUNTS),
    "topic_mixture": (q_topic_mixture, SQL_TOPIC_MIXTURE),
    "ann_recall": (q_ann_recall, SQL_ANN_RECALL),
    "crawl_epoch_stats": (q_crawl_epoch_stats, SQL_CRAWL_EPOCH_STATS),
    "sitemap_roundtrip": (q_sitemap_roundtrip, SQL_SITEMAP_ROUNDTRIP),
    "incremental_dedup": (q_incremental_dedup, SQL_INCREMENTAL_DEDUP),
    "compression_ratio": (q_compression_ratio, SQL_COMPRESSION_RATIO),
    "cdc_dedup": (q_cdc_dedup, SQL_CDC_DEDUP),
    "phrase_search": (q_phrase_search, SQL_PHRASE_SEARCH),
    "host_index": (q_host_index, SQL_HOST_INDEX),
    "cache_freshness": (q_cache_freshness, SQL_CACHE_FRESHNESS),
    "robots_audit": (q_robots_audit, SQL_ROBOTS_AUDIT),
    "orphan_pages": (q_orphan_pages, SQL_ORPHAN_PAGES),
    "source_kl_divergence": (q_source_kl_divergence, SQL_SOURCE_KL_DIVERGENCE),
    "source_contamination": (q_source_contamination, SQL_SOURCE_CONTAMINATION),
    "docs_reservoir_per_lang": (q_docs_reservoir_per_lang, SQL_DOCS_RESERVOIR_PER_LANG),
    "doc_length_quantiles_by_lang": (
        q_doc_length_quantiles_by_lang,
        SQL_DOC_LENGTH_QUANTILES_BY_LANG,
    ),
    "docs_hash_sample": (q_docs_hash_sample, SQL_DOCS_HASH_SAMPLE),
    "docs_stratified_sample": (
        q_docs_stratified_sample,
        SQL_DOCS_STRATIFIED_SAMPLE,
    ),
    "docs_weighted_sample": (q_docs_weighted_sample, SQL_DOCS_WEIGHTED_SAMPLE),
    "vocab_top_tokens": (q_vocab_top_tokens, SQL_VOCAB_TOP_TOKENS),
    "vocab_growth": (q_vocab_growth, SQL_VOCAB_GROWTH),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    "lm_perplexity": (q_lm_perplexity, SQL_LM_PERPLEXITY),
    "lm_perplexity_kn": (q_lm_perplexity_kn, SQL_LM_PERPLEXITY_KN),
    "c4_line_dedup": (q_c4_line_dedup, SQL_C4_LINE_DEDUP),
    "gopher_repetition": (q_gopher_repetition, SQL_GOPHER_REPETITION),
    "gopher_quality": (q_gopher_quality, SQL_GOPHER_QUALITY),
    "c4_clean": (q_c4_clean, SQL_C4_CLEAN),
    "packing_efficiency": (q_packing_efficiency, SQL_PACKING_EFFICIENCY),
    "semantic_decontaminate": (
        q_semantic_decontaminate,
        SQL_SEMANTIC_DECONTAMINATE,
    ),
    "hard_negatives": (q_hard_negatives, SQL_HARD_NEGATIVES),
    "dataset_split": (q_dataset_split, SQL_DATASET_SPLIT),
    "token_budget_select": (q_token_budget_select, SQL_TOKEN_BUDGET_SELECT),
    "jsonl_gz_roundtrip": (q_jsonl_gz_roundtrip, SQL_JSONL_GZ_ROUNDTRIP),
    "tfrecord_roundtrip": (q_tfrecord_roundtrip, SQL_TFRECORD_ROUNDTRIP),
    "seqfile_roundtrip": (q_seqfile_roundtrip, SQL_SEQFILE_ROUNDTRIP),
    "avro_roundtrip": (q_avro_roundtrip, SQL_AVRO_ROUNDTRIP),
    "orc_roundtrip": (q_orc_roundtrip, SQL_ORC_ROUNDTRIP),
    "ipc_roundtrip": (q_ipc_roundtrip, SQL_IPC_ROUNDTRIP),
    "wacz_roundtrip": (q_wacz_roundtrip, SQL_WACZ_ROUNDTRIP),
    "wacz_cdx": (q_wacz_cdx, SQL_WACZ_CDX),
    "docs_lang_join_skew": (q_docs_lang_join_skew, SQL_DOCS_LANG_JOIN_SKEW),
    "quality_classifier": (q_quality_classifier, SQL_QUALITY_CLASSIFIER),
    "dsir_importance": (q_dsir_importance, SQL_DSIR_IMPORTANCE),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "events_hourly_outer": (q_events_hourly_outer, SQL_EVENTS_HOURLY_OUTER),
    "semdedup_embeddings": (q_semdedup_embeddings, SQL_SEMDEDUP_EMBEDDINGS),
    "embedding_pca": (q_embedding_pca, SQL_EMBEDDING_PCA),
    "bitext_mining": (q_bitext_mining, SQL_BITEXT_MINING),
    "diversity_sample": (q_diversity_sample, SQL_DIVERSITY_SAMPLE),
    "dup_passages": (q_dup_passages, SQL_DUP_PASSAGES),
    "dup_passage_strip": (q_dup_passage_strip, SQL_DUP_PASSAGE_STRIP),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "lang_id_lm": (q_lang_id_lm, SQL_LANG_ID_LM),
    "chunk_documents": (q_chunk_documents, SQL_CHUNK_DOCUMENTS),
    "doc_fingerprints": (q_doc_fingerprints, SQL_DOC_FINGERPRINTS),
    "ccnet_buckets": (q_ccnet_buckets, SQL_CCNET_BUCKETS),
    "source_mixture_weights": (q_source_mixture_weights, SQL_SOURCE_MIXTURE_WEIGHTS),
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "curate_corpus": (q_curate_corpus, SQL_CURATE_CORPUS),
    "curation_report": (q_curation_report, SQL_CURATION_REPORT),
    "jaccard_neardup": (q_jaccard_neardup, SQL_JACCARD_NEARDUP),
    "containment_neardup": (q_containment_neardup, SQL_CONTAINMENT_NEARDUP),
    "winnow_neardup": (q_winnow_neardup, SQL_WINNOW_NEARDUP),
    "winnow_dup_fraction": (q_winnow_dup_fraction, SQL_WINNOW_DUP_FRACTION),
    "lang_temperature_sampling": (
        q_lang_temperature_sampling,
        SQL_LANG_TEMPERATURE_SAMPLING,
    ),
    "lsh_recall": (q_lsh_recall, SQL_LSH_RECALL),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "text_stats": (q_text_stats, SQL_TEXT_STATS),
    "parse_extract": (q_parse_extract, SQL_PARSE_EXTRACT),
    "crawl_log": (q_crawl_log, SQL_CRAWL_LOG),
    "crawl_delay_log": (q_crawl_delay_log, SQL_CRAWL_DELAY_LOG),
    "recrawl_revisit_log": (q_recrawl_revisit_log, SQL_RECRAWL_REVISIT_LOG),
    "crawl_host_stats": (q_crawl_host_stats, SQL_CRAWL_HOST_STATS),
    "arc_roundtrip": (q_arc_roundtrip, SQL_ARC_ROUNDTRIP),
    "warc_roundtrip": (q_warc_roundtrip, SQL_WARC_ROUNDTRIP),
    "warc_revisit_dedup": (q_warc_revisit_dedup, SQL_WARC_REVISIT_DEDUP),
    "recrawl_schedule": (q_recrawl_schedule, SQL_RECRAWL_SCHEDULE),
    "snapshot_churn": (q_snapshot_churn, SQL_SNAPSHOT_CHURN),
    "cdx_collapse": (q_cdx_collapse, SQL_CDX_COLLAPSE),
    "redirect_resolution": (q_redirect_resolution, SQL_REDIRECT_RESOLUTION),
    "wet_export": (q_wet_export, SQL_WET_EXPORT),
    "wat_export": (q_wat_export, SQL_WAT_EXPORT),
    "cdx_index": (q_cdx_index, SQL_CDX_INDEX),
    "cdx_prefix_lookup": (q_cdx_prefix_lookup, SQL_CDX_PREFIX_LOOKUP),
    "bpe_train": (q_bpe_train, SQL_BPE_TRAIN),
    "bpe_encode": (q_bpe_encode, SQL_BPE_ENCODE),
    "bpe_fertility": (q_bpe_fertility, SQL_BPE_FERTILITY),
    "sitemap_coverage": (q_sitemap_coverage, SQL_SITEMAP_COVERAGE),
    "stale_pages": (q_stale_pages, SQL_STALE_PAGES),
    "url_host_blocklist": (q_url_host_blocklist, SQL_URL_HOST_BLOCKLIST),
    "bpe_vocab": (q_bpe_vocab, SQL_BPE_VOCAB),
    "unigram_train": (q_unigram_train, SQL_UNIGRAM_TRAIN),
    "unigram_encode": (q_unigram_encode, SQL_UNIGRAM_ENCODE),
    "wordpiece_vocab": (q_wordpiece_vocab, SQL_WORDPIECE_VOCAB),
    "wordpiece_encode": (q_wordpiece_encode, SQL_WORDPIECE_ENCODE),
    "tokenizer_compare": (q_tokenizer_compare, SQL_TOKENIZER_COMPARE),
    "token_shard_export": (q_token_shard_export, SQL_TOKEN_SHARD_EXPORT),
    "host_triangles": (q_host_triangles, SQL_HOST_TRIANGLES),
}
