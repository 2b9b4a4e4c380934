"""Distributed PageRank over the crawl's host link graph.

The iterative-algorithm showcase on the engine's own data: pages ->
parse (anchors) -> resolve -> host-to-host edge table -> power
iteration. Reference contact point: the reference extracts exactly
these anchors during metadata building (``NodeWalker.java:21``,
anchorTags in ``protocol.jr:120``); ranking the discovered host graph
is the canonical downstream consumer of that data (Page/Brin 1998,
"The PageRank citation ranking").

Scale shape:

- **Edge build streams**: parse kernel per batch, href resolution per
  page, host projection; edge dedup via one sort(src) range exchange
  with block-local adjacent-dedup (equal keys co-locate in one sort
  block — the repo's standing co-partition guarantee).
- **Each power iteration moves the edge table once**: the rank/degree
  table attaches to edges via the union+sort(src) merge_join,
  contributions groupby(dst).sum, then a left merge_join back onto
  the node table so sink-only hosts keep receiving teleport mass.
  The edge table and node/degree table are built and materialized
  ONCE; the loop-carried rank table is node-sized, stays a
  DISTRIBUTED dataset throughout (components.py discipline), and is
  materialized per round. The driver sees two scalars per iteration
  (node count once, dangling mass each round) — never a node or edge
  table.
- Dangling mass (hosts with no out-links) is redistributed uniformly.

Determinism: every step is a pure function of the edge set; float
summation order varies with partitioning only at the ulp level, and
the oracle comparison rounds ranks to 6 decimals (the established
absorption bound for reduction reassociation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _host_of(url: str) -> str | None:
    from urllib.parse import urlsplit

    try:
        h = urlsplit(url).hostname
    except ValueError:
        return None
    return h.lower() if h else None


def extract_host_edges_batch(t: pa.Table) -> pa.Table:
    """Parse-output batch (url, anchors, base) -> (src, dst) host
    pairs, per-page de-duplicated, self-loops dropped. The anchors
    column is the reference's anchorTags wire format: href/text pairs
    separated by line feeds (protocol.jr:120)."""
    from .links import resolve_links

    urls = t.column("url").to_pylist()
    anchors = t.column("anchors").to_pylist()
    bases = t.column("base_url").to_pylist()
    src_out: list[str] = []
    dst_out: list[str] = []
    for u, a, b in zip(urls, anchors, bases):
        if not a:
            continue
        src = _host_of(u)
        if not src:
            continue
        hrefs = a.split("\n")[0::2]
        seen: set[str] = set()
        for link in resolve_links(u, hrefs, b):
            dst = _host_of(link)
            if dst and dst != src and dst not in seen:
                seen.add(dst)
                src_out.append(src)
                dst_out.append(dst)
    return pa.table(
        {
            "src": pa.array(src_out, pa.string()),
            "dst": pa.array(dst_out, pa.string()),
        }
    )


def extract_anchor_terms_batch(t: pa.Table) -> pa.Table:
    """Parse-output batch (url, anchors, base_url) -> (dst, term)
    anchor-term occurrences: every resolved off-host link contributes
    its anchor text's lowercased whitespace tokens against the TARGET
    host — the link-description signal web search builds doc vectors
    from (the reference stores the raw pairs as ArcFileMetadata
    anchorTags, protocol.jr:120; aggregation by target is the query
    this engine adds). Shared verbatim by the distributed query and
    the sequential oracle so a hash match checks only the plan."""
    from .links import resolve_links_aligned

    urls = t.column("url").to_pylist()
    anchors = t.column("anchors").to_pylist()
    bases = t.column("base_url").to_pylist()
    dst_out: list[str] = []
    term_out: list[str] = []
    for u, a, b in zip(urls, anchors, bases):
        if not a:
            continue
        src = _host_of(u)
        parts = a.split("\n")
        hrefs = parts[0::2]
        texts = parts[1::2]
        resolved = resolve_links_aligned(u, hrefs, b)
        for link, text in zip(resolved, texts):
            dst = _host_of(link) if link else None
            if not dst or dst == src or not text:
                continue
            for term in text.lower().split():
                dst_out.append(dst)
                term_out.append(term)
    return pa.table(
        {
            "dst": pa.array(dst_out, pa.string()),
            "term": pa.array(term_out, pa.string()),
        }
    )


def _distinct_sorted(ds, cols: list[str]):
    """Global distinct of a (string...) tuple dataset: one sort range
    exchange + vectorized adjacent-dedup per block (equal first-key
    rows never split across sort blocks)."""

    def dedup_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        arrs = [
            t.column(c).to_numpy(zero_copy_only=False) for c in cols
        ]
        order = np.lexsort(arrs[::-1])  # last key primary for lexsort
        keep = np.ones(len(order), dtype=bool)
        same = np.ones(len(order) - 1, dtype=bool)
        for v in arrs:
            vs = v[order]
            same &= vs[1:] == vs[:-1]
        keep[1:] = ~same
        # pyarrow in/out keeps the Arrow schema intact even for empty
        # results (a pandas stage here reports Python dtypes upstream
        # and breaks merge_join's wire-schema construction)
        return t.take(pa.array(order[keep], pa.int64()))

    return ds.sort(cols[0]).map_batches(
        dedup_block, batch_format="pyarrow", batch_size=None
    )


def pagerank_hosts(parse_ds, damping: float = 0.85, iters: int = 10, parts: int = 8):
    """parse_ds: parse-output Dataset carrying (url, anchors, base).
    -> Dataset (host, pr), pr rounded to 6 decimals."""
    return pagerank_edges(
        parse_ds.map_batches(extract_host_edges_batch, batch_format="pyarrow"),
        damping=damping,
        iters=iters,
        parts=parts,
    )


def pagerank_edges(edge_ds, damping: float = 0.85, iters: int = 10, parts: int = 8):
    """PageRank over a raw (src, dst) edge Dataset (duplicates fine —
    a global distinct runs first). -> Dataset (host, pr), pr rounded
    to 6 decimals. Entry point for callers that already hold an edge
    table — e.g. the crawl's pagerank frontier priority, which feeds
    the host edges accumulated from prior epochs' fetch logs back in."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .joins import merge_join

    edges = _distinct_sorted(edge_ds, ["src", "dst"]).repartition(parts).materialize()

    # node table = distinct(src) ∪ distinct(dst); degree via groupby
    nodes = _distinct_sorted(
        edges.select_columns(["src"])
        .map_batches(
            lambda t: pa.table({"node": t.column("src")}), batch_format="pyarrow"
        )
        .union(
            edges.select_columns(["dst"]).map_batches(
                lambda t: pa.table({"node": t.column("dst")}),
                batch_format="pyarrow",
            )
        ),
        ["node"],
    )
    degrees = edges.groupby("src").count()  # (src, count())
    node_deg = merge_join(
        nodes,
        degrees.map_batches(
            lambda t: pa.table(
                {
                    "src": t.column("src"),
                    "deg": t.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        left_on="node",
        right_on="src",
        right_cols=["deg"],
        how="left",
    ).repartition(parts).materialize()
    n = node_deg.count()
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {"host": pa.array([], pa.string()), "pr": pa.array([], pa.float64())}
            )
        )

    def init_rank(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pr", pa.array(np.full(len(t), 1.0 / n), pa.float64())
        )

    ranks = node_deg.map_batches(init_rank, batch_format="pyarrow").materialize()

    for _ in range(iters):
        # dangling mass: one scalar leaves the cluster per iteration
        dang_row = ranks.map_batches(
            lambda t: t.filter(pc.is_null(t.column("deg"))),
            batch_format="pyarrow",
        ).aggregate(Sum("pr", alias_name="s"))
        dangling = float(dang_row["s"] or 0.0)

        def to_weight(t: pa.Table) -> pa.Table:
            pr = t.column("pr").to_numpy(zero_copy_only=False)
            deg = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                w = np.where(np.isnan(deg) | (deg == 0), 0.0, pr / deg)
            return pa.table({"node": t.column("node"), "w": pa.array(w)})

        weights = ranks.map_batches(to_weight, batch_format="pyarrow")
        contribs = merge_join(
            edges, weights, left_on="src", right_on="node",
            right_cols=["w"], how="inner",
        )
        sums = contribs.groupby("dst").aggregate(Sum("w", alias_name="s"))
        new_ranks = merge_join(
            node_deg, sums, left_on="node", right_on="dst",
            right_cols=["s"], how="left",
        )

        def apply_rank(t: pa.Table) -> pa.Table:
            s = t.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
            s = np.nan_to_num(s, nan=0.0)
            pr = (1.0 - damping) / n + damping * (s + dangling / n)
            return pa.table(
                {
                    "node": t.column("node"),
                    "deg": t.column("deg"),
                    "pr": pa.array(pr, pa.float64()),
                }
            )

        # bound the loop-carried block count: sorts/joins otherwise
        # MULTIPLY blocks round over round until per-task overhead
        # dominates (the components.py lesson; its ``parts`` knob)
        ranks = (
            new_ranks.map_batches(apply_rank, batch_format="pyarrow")
            .repartition(parts)
            .materialize()
        )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": t.column("node"),
                "pr": pa.array(
                    np.round(t.column("pr").to_numpy(zero_copy_only=False), 6),
                    pa.float64(),
                ),
            }
        )

    return ranks.map_batches(finalize, batch_format="pyarrow")


def trustrank_edges(
    edge_ds,
    seeds: set,
    damping: float = 0.85,
    iters: int = 10,
    parts: int = 8,
    dedup: bool = True,
):
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB 2004:
    "Combating web spam with TrustRank") over a (src, dst) host edge
    Dataset: PageRank with the teleport vector restricted to a trusted
    seed set — trust flows out of the seeds along links, so link-spam
    farms that inflate plain PageRank score near zero here.

    ``t = (1 - a) * d + a * (T t + dangling * d)`` with ``d`` uniform
    over the seed hosts present in the graph (dangling mass returns to
    the seeds, keeping t a distribution). -> Dataset (host, trust),
    rounded to 6 decimals.

    Scale shape: identical to :func:`pagerank_edges` — the edge table
    moves once per iteration, the loop-carried rank table stays
    distributed, one dangling scalar reaches the driver per round.
    The teleport vector never materializes as a table: ``seeds`` is a
    SMALL broadcast set (task-closure at the typical 10^1..10^4 seed
    scale; ship via ray.put if ever larger) and the per-node tele
    value is recomputed statelessly inside each map. ``dedup=False``
    skips the global edge distinct for callers that already hold a
    distinct edge table (e.g. a query that used it for seed
    selection)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .joins import merge_join

    edges = _distinct_sorted(edge_ds, ["src", "dst"]) if dedup else edge_ds
    edges = edges.repartition(parts).materialize()

    nodes = _distinct_sorted(
        edges.select_columns(["src"])
        .map_batches(
            lambda t: pa.table({"node": t.column("src")}), batch_format="pyarrow"
        )
        .union(
            edges.select_columns(["dst"]).map_batches(
                lambda t: pa.table({"node": t.column("dst")}),
                batch_format="pyarrow",
            )
        ),
        ["node"],
    )
    degrees = edges.groupby("src").count()
    node_deg = merge_join(
        nodes,
        degrees.map_batches(
            lambda t: pa.table(
                {
                    "src": t.column("src"),
                    "deg": t.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        left_on="node",
        right_on="src",
        right_cols=["deg"],
        how="left",
    ).repartition(parts).materialize()

    seed_set = frozenset(seeds)
    empty = rd.from_arrow(
        pa.table(
            {"host": pa.array([], pa.string()), "trust": pa.array([], pa.float64())}
        )
    )
    if node_deg.count() == 0:
        return empty
    # |seeds ∩ nodes| — one scalar to the driver, like n in pagerank
    n_s_row = node_deg.map_batches(
        lambda t: pa.table(
            {
                "c": pa.array(
                    [sum(x in seed_set for x in t.column("node").to_pylist())],
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("c", alias_name="s"))
    n_s = int(n_s_row["s"] or 0)
    if n_s == 0:
        return empty

    def tele_of(node_col: pa.ChunkedArray) -> np.ndarray:
        return np.array(
            [1.0 / n_s if x in seed_set else 0.0 for x in node_col.to_pylist()],
            dtype=np.float64,
        )

    def init_rank(t: pa.Table) -> pa.Table:
        return t.append_column("pr", pa.array(tele_of(t.column("node"))))

    ranks = node_deg.map_batches(init_rank, batch_format="pyarrow").materialize()

    for _ in range(iters):
        dang_row = ranks.map_batches(
            lambda t: t.filter(pc.is_null(t.column("deg"))),
            batch_format="pyarrow",
        ).aggregate(Sum("pr", alias_name="s"))
        dangling = float(dang_row["s"] or 0.0)

        def to_weight(t: pa.Table) -> pa.Table:
            pr = t.column("pr").to_numpy(zero_copy_only=False)
            deg = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                w = np.where(np.isnan(deg) | (deg == 0), 0.0, pr / deg)
            return pa.table({"node": t.column("node"), "w": pa.array(w)})

        weights = ranks.map_batches(to_weight, batch_format="pyarrow")
        contribs = merge_join(
            edges, weights, left_on="src", right_on="node",
            right_cols=["w"], how="inner",
        )
        sums = contribs.groupby("dst").aggregate(Sum("w", alias_name="s"))
        new_ranks = merge_join(
            node_deg, sums, left_on="node", right_on="dst",
            right_cols=["s"], how="left",
        )

        def apply_rank(t: pa.Table) -> pa.Table:
            s = t.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
            s = np.nan_to_num(s, nan=0.0)
            tele = tele_of(t.column("node"))
            pr = (1.0 - damping) * tele + damping * (s + dangling * tele)
            return pa.table(
                {
                    "node": t.column("node"),
                    "deg": t.column("deg"),
                    "pr": pa.array(pr, pa.float64()),
                }
            )

        ranks = (
            new_ranks.map_batches(apply_rank, batch_format="pyarrow")
            .repartition(parts)
            .materialize()
        )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": t.column("node"),
                "trust": pa.array(
                    np.round(t.column("pr").to_numpy(zero_copy_only=False), 6),
                    pa.float64(),
                ),
            }
        )

    return ranks.map_batches(finalize, batch_format="pyarrow")


def hits_hosts(parse_ds, iters: int = 10, parts: int = 8):
    """HITS hubs/authorities (Kleinberg 1999, "Authoritative sources
    in a hyperlinked environment") over the same host graph ->
    Dataset (host, authority, hub), rounded to 6 decimals.

    Per iteration, two edge-table exchanges (a = E^T h, then
    h = E a) and two one-scalar L2-norm aggregates; the score table
    stays a distributed node-sized dataset with the same bounded
    block count as pagerank_hosts."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .joins import merge_join

    edges = (
        _distinct_sorted(
            parse_ds.map_batches(extract_host_edges_batch, batch_format="pyarrow"),
            ["src", "dst"],
        )
        .repartition(parts)
        .materialize()
    )
    nodes = (
        _distinct_sorted(
            edges.select_columns(["src"])
            .map_batches(
                lambda t: pa.table({"node": t.column("src")}),
                batch_format="pyarrow",
            )
            .union(
                edges.select_columns(["dst"]).map_batches(
                    lambda t: pa.table({"node": t.column("dst")}),
                    batch_format="pyarrow",
                )
            ),
            ["node"],
        )
        .repartition(parts)
        .materialize()
    )
    if nodes.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "authority": pa.array([], pa.float64()),
                    "hub": pa.array([], pa.float64()),
                }
            )
        )

    def with_const(name, value):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t.column("node"),
                    name: pa.array(np.full(len(t), value), pa.float64()),
                }
            )

        return f

    def half_step(scores, score_col, join_key, group_key, out_col):
        """One HITS half-update: propagate ``score_col`` across edges
        joined on ``join_key``, sum per ``group_key``, left-join onto
        the node table (zeros for isolated sides), L2-normalize."""
        contribs = merge_join(
            edges, scores, left_on=join_key, right_on="node",
            right_cols=[score_col], how="inner",
        )
        sums = contribs.groupby(group_key).aggregate(
            Sum(score_col, alias_name="s")
        ).materialize()

        # L2 norm from the pre-join sums: nodes absent from `sums`
        # are exact zeros and contribute nothing — computing the norm
        # here saves a whole materialize + node-table pass per half
        # step (4 fewer Ray jobs per HITS iteration)
        def sq(t: pa.Table) -> pa.Table:
            v = t.column("s").to_numpy(zero_copy_only=False)
            return pa.table({"v2": pa.array(v * v)})

        total = sums.map_batches(sq, batch_format="pyarrow").aggregate(
            Sum("v2", alias_name="s")
        )
        norm = float(np.sqrt(total["s"] or 0.0))

        joined = merge_join(
            nodes, sums, left_on="node", right_on=group_key,
            right_cols=["s"], how="left",
        )

        def fill_scale(t: pa.Table) -> pa.Table:
            v = np.nan_to_num(
                t.column("s").to_numpy(zero_copy_only=False).astype(np.float64),
                nan=0.0,
            )
            return pa.table(
                {
                    "node": t.column("node"),
                    out_col: pa.array(v / norm if norm else v),
                }
            )

        return (
            joined.map_batches(fill_scale, batch_format="pyarrow")
            .repartition(parts)
            .materialize()
        )

    hub = nodes.map_batches(with_const("hub", 1.0), batch_format="pyarrow").materialize()
    auth = None
    for _ in range(iters):
        # a = E^T h : hub scores flow src -> dst
        auth = half_step(hub, "hub", "src", "dst", "authority")
        # h = E a : authority scores flow dst -> src
        hub = half_step(auth, "authority", "dst", "src", "hub")

    combined = merge_join(
        auth, hub, left_on="node", right_on="node",
        right_cols=["hub"], how="left",
    )

    def finalize(t: pa.Table) -> pa.Table:
        a = np.round(
            t.column("authority").to_numpy(zero_copy_only=False), 6
        )
        h = np.round(
            np.nan_to_num(
                t.column("hub").to_numpy(zero_copy_only=False).astype(np.float64),
                nan=0.0,
            ),
            6,
        )
        return pa.table(
            {
                "host": t.column("node"),
                "authority": pa.array(a, pa.float64()),
                "hub": pa.array(h, pa.float64()),
            }
        )

    return combined.map_batches(finalize, batch_format="pyarrow")


def triangle_count(edge_ds, max_degree: int | None = 4096):
    """Distributed triangle counting over a raw (src, dst) edge
    Dataset — the node-order wedge-check algorithm (each triangle
    {a < b < c} found exactly once, at its smallest vertex):

    1. canonicalize to undirected a<b edges, global distinct (ONE sort
       exchange — the pagerank_edges discipline);
    2. sort(u) co-partition, per-apex vectorized wedge emission: apex
       ``a``'s higher neighbors [b1 < b2 < ...] yield candidate closing
       edges via ``np.triu_indices`` — apexes wider than ``max_degree``
       are SKIPPED and counted (the dedup-family cap rule: wedge
       volume is sum(deg²), and one mega-hub must not quadratically
       explode a block);
    3. ONE union+sort exchange matching wedges against the edge set on
       the fused "v|w" key (merge_join how='semi' — a wedge row
       survives iff its closing edge exists; distinct apexes emit
       distinct rows, so the survivor COUNT is the triangle count).

    Returns a 1-row Dataset (n_triangles int64).

    Wire: hosts are FNV-1a-hashed to int64 at the canonicalize step
    (the k_core_hosts hash-wire discipline — r5 upgrade from the
    earlier host-string wedge keys), so the wedge exchange carries one
    vectorized "<b>|<c>" decimal fusion per candidate instead of two
    host strings; collisions ~V²/2^64, negligible (the standing
    hash-wire bound).
    """
    import ray.data as rd

    from ..functions.minhash import fnv1a_batch
    from ..state.counters import count_skip
    from .joins import merge_join

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src")
        d = t.column("dst")
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        d = d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d
        si = fnv1a_batch(s).view(np.int64)
        di = fnv1a_batch(d).view(np.int64)
        keep = si != di
        si, di = si[keep], di[keep]
        lo = np.minimum(si, di)
        hi = np.maximum(si, di)
        return pa.table({"u": pa.array(lo), "v": pa.array(hi)})

    edges = _distinct_sorted(
        edge_ds.map_batches(canon, batch_format="pyarrow"), ["u", "v"]
    ).materialize()

    def wedges_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([("key", pa.string())]).empty_table()
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        bs: list[np.ndarray] = []
        cs: list[np.ndarray] = []
        skipped = 0
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            if max_degree is not None and k > max_degree:
                skipped += 1
                continue
            nb = v[s:e]  # already sorted (lexsort secondary key)
            ii, jj = np.triu_indices(k, 1)
            bs.append(nb[ii])
            cs.append(nb[jj])
        if skipped:
            count_skip("triangles", buckets=skipped)
        if not bs:
            return pa.schema([("key", pa.string())]).empty_table()
        return pa.table(
            {"key": pa.array(_fuse_int_keys(np.concatenate(bs), np.concatenate(cs)))}
        )

    wedges = edges.sort("u").map_batches(
        wedges_block, batch_format="pyarrow", batch_size=None
    )

    def edge_keys(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"key": pa.array(_fuse_int_keys(u, v))})

    closed = merge_join(
        wedges,
        edges.map_batches(edge_keys, batch_format="pyarrow"),
        left_on="key",
        right_on="key",
        right_cols=[],
        how="semi",
    )
    n = closed.count()
    return rd.from_arrow(
        pa.table({"n_triangles": pa.array([n], pa.int64())})
    )


def reciprocal_link_stats(edge_ds):
    """Per-host reciprocity over a raw (src, dst) edge Dataset: global
    distinct, self-loops dropped, then the reverse-edge test as a SEMI
    merge_join of the edge list against its own swapped key
    ("src\\tdst" vs "dst\\tsrc") — ONE union+sort exchange over
    edge-scale rows, no per-row Python. Degree rollups are two
    node-scale groupbys joined back with a left merge_join. Output:
    (host, out_deg, recip_deg, recip_ratio[6dp]) for every host with
    >= 1 non-self out-edge. Link farms trade links both ways, so
    near-1 ratios over non-trivial out-degree are the classic
    link-exchange spam signal (Gyongyi & Garcia-Molina, "Web spam
    taxonomy", AIRWeb 2005)."""
    from .joins import merge_join

    def drop_self(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t.column("src"), t.column("dst")))

    edges = (
        _distinct_sorted(edge_ds, ["src", "dst"])
        .map_batches(drop_self, batch_format="pyarrow")
        .materialize()
    )

    def fwd(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.binary_join_element_wise(
                    t.column("src"), t.column("dst"), "\t"
                ),
                "src": t.column("src"),
            }
        )

    def rev(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.binary_join_element_wise(
                    t.column("dst"), t.column("src"), "\t"
                )
            }
        )

    recip_edges = merge_join(
        edges.map_batches(fwd, batch_format="pyarrow"),
        edges.map_batches(rev, batch_format="pyarrow"),
        "k",
        "k",
        [],
        how="semi",
    )

    def count_col(name):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "host": t.column("src"),
                    name: t.column("count()").cast(pa.int64()),
                }
            )

        return f

    outd = edges.groupby("src").count().map_batches(
        count_col("out_deg"), batch_format="pyarrow"
    )
    rec = recip_edges.groupby("src").count().map_batches(
        count_col("recip_deg"), batch_format="pyarrow"
    )
    joined = merge_join(outd, rec, "host", "host", ["recip_deg"], how="left")

    def finalize(t: pa.Table) -> pa.Table:
        od = t.column("out_deg").to_numpy(zero_copy_only=False).astype(np.int64)
        rc = np.nan_to_num(
            t.column("recip_deg")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64),
            nan=0.0,
        ).astype(np.int64)
        return pa.table(
            {
                "host": t.column("host"),
                "out_deg": pa.array(od, pa.int64()),
                "recip_deg": pa.array(rc, pa.int64()),
                "recip_ratio": pa.array(
                    np.round(rc / np.maximum(od, 1), 6), pa.float64()
                ),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def _h_index_block(t: pa.Table) -> pa.Table:
    """Block-local per-node h-index over (u, val) rows: for each u,
    the largest h such that >= h of its vals are >= h. Requires all
    rows of one u in the block (sort(u) co-partition guarantee).
    Vectorized: lexsort by (u, -val), 1-based rank within group,
    h = segmented max of min(rank, val)."""
    if len(t) == 0:
        return pa.table(
            {
                "node": pa.array([], pa.int64()),
                "h": pa.array([], pa.int64()),
            }
        )
    u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
    v = t.column("val").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((-v, u))
    u_s, v_s = u[order], v[order]
    starts = np.ones(len(u_s), dtype=bool)
    starts[1:] = u_s[1:] != u_s[:-1]
    idx = np.arange(len(u_s), dtype=np.int64)
    grp_start = np.maximum.accumulate(np.where(starts, idx, 0))
    rank = idx - grp_start + 1  # 1-based within group, val descending
    cand = np.minimum(rank, v_s)
    bounds = np.flatnonzero(starts)
    h = np.maximum.reduceat(cand, bounds)
    return pa.table(
        {
            "node": pa.array(u_s[bounds], pa.int64()),
            "h": pa.array(h, pa.int64()),
        }
    )


def k_core_hosts(edge_ds, max_iters: int = 64, parts: int = 8):
    """Coreness (k-core decomposition) of every host in a raw directed
    (src, dst) string edge Dataset, viewed undirected: core(v) is the
    largest k such that v survives repeatedly deleting all nodes of
    degree < k. Implemented as the h-index fixpoint (Lu, Zhou, Zhang &
    Stanley 2016, "The H-index of a network node and its relation to
    degree and coreness", Nature Communications 7:10168): start every
    node at its degree; each round replace c(v) with the h-index of
    its neighbors' current values; the sequence decreases monotonically
    to exact coreness on every finite graph.

    Scale shape (the label_propagation discipline): hosts are
    FNV-1a-hashed to int64 at the edge build so the loop carries ONLY
    int64 pairs; the undirected distinct non-self neighbor table is
    built ONCE and materialized (edge-scale, two int64 columns). Each
    round is ONE union+sort merge_join shipping current values to
    neighbors plus a sort(u) co-partitioned block-local vectorized
    h-index (partitioning assumption: one node's neighbor rows fit a
    block — max-degree bound, same as LPA/hash-to-min). Fixpoint test
    is a node-scale dataset sum: values are integer and monotone
    non-increasing, so an unchanged sum IS elementwise convergence —
    no fingerprint needed. Host strings come back only in the final
    node-scale translation join. Collisions: ~V^2/2^64, negligible
    (the standing hash-wire bound)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.minhash import fnv1a_batch
    from .joins import merge_join

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src")
        d = t.column("dst")
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        d = d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d
        si = fnv1a_batch(s).view(np.int64)
        di = fnv1a_batch(d).view(np.int64)
        return pa.table(
            {
                "u": pa.array(np.concatenate([si, di])),
                "v": pa.array(np.concatenate([di, si])),
                "u_host": pa.concat_arrays([s, d]),
            }
        )

    def drop_self(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t.column("u"), t.column("v")))

    hashed = edge_ds.map_batches(both_dirs, batch_format="pyarrow")
    und = (
        _distinct_sorted(
            hashed.map_batches(
                lambda t: t.select(["u", "v"]), batch_format="pyarrow"
            ),
            ["u", "v"],
        )
        .map_batches(drop_self, batch_format="pyarrow")
        .repartition(parts)
        .materialize()
    )
    id_host = (
        _distinct_sorted(
            hashed.map_batches(
                lambda t: pa.table(
                    {"id": t.column("u"), "host": t.column("u_host")}
                ),
                batch_format="pyarrow",
            ),
            ["id"],
        )
        .repartition(parts)
        .materialize()
    )

    # c_0 = degree over the undirected distinct non-self edge set
    core = (
        und.groupby("u")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("u"),
                    "core": t.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    if und.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "core": pa.array([], pa.int64()),
                }
            )
        )
    prev_sum = core.sum("core")
    for _ in range(max_iters):
        nb = merge_join(und, core, "v", "node", ["core"], how="inner")
        core = (
            nb.map_batches(
                lambda t: pa.table(
                    {"u": t.column("u"), "val": t.column("core")}
                ),
                batch_format="pyarrow",
            )
            .sort("u")
            .map_batches(_h_index_block, batch_format="pyarrow", batch_size=None)
            .map_batches(
                lambda t: pa.table(
                    {"node": t.column("node"), "core": t.column("h")}
                ),
                batch_format="pyarrow",
            )
            # clamp the loop-carried block count (the hyperball rule:
            # union/sort grows blocks every round; node-scale rows in
            # ever-more tiny blocks turn task overhead superlinear)
            .repartition(parts)
            .materialize()
        )
        cur_sum = core.sum("core")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    out = merge_join(core, id_host, "node", "id", ["host"], how="inner")
    return out.map_batches(
        lambda t: pa.table(
            {"host": t.column("host"), "core": t.column("core")}
        ),
        batch_format="pyarrow",
    )


def _fuse_int_keys(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized decimal-string fusion of two int64 arrays into one
    unique, sortable join key ("<a>|<b>"). U20 holds any int64 incl.
    the sign. Decimal strings keep the key exact (no hash-combine
    collision risk inside an iterative peel); a 100 TB graph would
    pack the pair into one int128/fixed-binary column instead."""
    return np.char.add(np.char.add(a.astype("U20"), "|"), b.astype("U20"))


def k_truss_hosts(
    edge_ds,
    k: int = 4,
    max_degree: int | None = 4096,
    parts: int = 8,
    max_iters: int = 64,
):
    """Maximal k-truss of the host graph viewed undirected (Cohen
    2008, "Trusses: cohesive subgraphs for social network analysis"):
    the largest subgraph in which EVERY edge closes >= k-2 triangles
    within the subgraph — a strictly denser cohesion signal than
    k-core (every k-truss is inside the (k-1)-core), the standard
    link-farm/community-core detector one level above triangles.

    Batch peeling to fixpoint: each round recomputes per-edge support
    from scratch and drops ALL under-supported edges at once; batch
    and sequential peeling converge to the same unique maximal
    k-truss, so the sequential oracle (oracle_sketch.py
    oracle_ktruss_table) is exact parity.

    Scale shape (the k_core_hosts discipline): FNV-1a int64 hash wire
    (host strings only in the final translation join); the canonical
    undirected distinct edge table materialized per round (edge-scale,
    two int64 columns); support via the triangle_count node-order
    wedge check — sort(u) co-partition, per-apex ``np.triu_indices``
    wedge emission capped at ``max_degree`` with skip counters, ONE
    union+sort semi merge_join against the edge-key set, then a
    triangle->3-edges explode + groupby count. Every per-round
    exchange is edge/wedge-scale; nothing corpus-scale ever sits in
    one block. Rounds are bounded by ``max_iters`` (the truss peel
    removes >= 1 edge per non-final round, and real host graphs
    settle in a handful).

    Returns (host, truss_deg): hosts in the k-truss with their
    incident truss-edge count.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.minhash import fnv1a_batch
    from ..state.counters import count_skip
    from .joins import merge_join

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src")
        d = t.column("dst")
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        d = d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d
        si = fnv1a_batch(s).view(np.int64)
        di = fnv1a_batch(d).view(np.int64)
        return pa.table(
            {
                "u": pa.array(np.concatenate([si, di])),
                "v": pa.array(np.concatenate([di, si])),
                "u_host": pa.concat_arrays([s, d]),
            }
        )

    hashed = edge_ds.map_batches(both_dirs, batch_format="pyarrow")

    def canon(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        keep = u < v  # one canonical direction; also drops self-loops
        return pa.table({"u": pa.array(u[keep]), "v": pa.array(v[keep])})

    edges = (
        _distinct_sorted(
            hashed.map_batches(canon, batch_format="pyarrow"), ["u", "v"]
        )
        .repartition(parts)
        .materialize()
    )
    id_host = (
        _distinct_sorted(
            hashed.map_batches(
                lambda t: pa.table(
                    {"id": t.column("u"), "host": t.column("u_host")}
                ),
                batch_format="pyarrow",
            ),
            ["id"],
        )
        .repartition(parts)
        .materialize()
    )

    empty_out = rd.from_arrow(
        pa.table(
            {
                "host": pa.array([], pa.string()),
                "truss_deg": pa.array([], pa.int64()),
            }
        )
    )
    n_edges = edges.count()
    if n_edges == 0:
        return empty_out

    # wedges from apex a over its higher neighbors b<c close at edge
    # (b,c); each closed wedge IS the triangle {a<b<c}, whose three
    # canonical edges (a,b), (a,c), (b,c) each gain 1 support — so the
    # apex rides along for the explode.
    wedge_schema = pa.schema(
        [("key", pa.string()), ("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64())]
    )

    def wedges_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return wedge_schema.empty_table()
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        az: list[np.ndarray] = []
        bs: list[np.ndarray] = []
        cs: list[np.ndarray] = []
        skipped = 0
        for s, e in zip(starts, ends):
            deg = e - s
            if deg < 2:
                continue
            if max_degree is not None and deg > max_degree:
                skipped += 1
                continue
            nb = v[s:e]  # sorted ascending (lexsort secondary key)
            ii, jj = np.triu_indices(deg, 1)
            az.append(np.full(len(ii), u[s], dtype=np.int64))
            bs.append(nb[ii])
            cs.append(nb[jj])
        if skipped:
            count_skip("ktruss", buckets=skipped)
        if not bs:
            return wedge_schema.empty_table()
        a = np.concatenate(az)
        b = np.concatenate(bs)
        c = np.concatenate(cs)
        return pa.table(
            {
                "key": pa.array(_fuse_int_keys(b, c)),
                "a": pa.array(a),
                "b": pa.array(b),
                "c": pa.array(c),
            },
            schema=wedge_schema,
        )

    def edge_with_key(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(_fuse_int_keys(u, v)),
                "u": t.column("u"),
                "v": t.column("v"),
            }
        )

    def explode_triangle_edges(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        # a < b < c, so (a,b), (a,c), (b,c) are already canonical
        eu = np.concatenate([a, a, b])
        ev = np.concatenate([b, c, c])
        return pa.table({"ekey": pa.array(_fuse_int_keys(eu, ev))})

    thresh = k - 2
    for _ in range(max_iters):
        wedges = edges.sort("u").map_batches(
            wedges_block, batch_format="pyarrow", batch_size=None
        )
        ekeys = edges.map_batches(
            lambda t: edge_with_key(t).select(["key"]), batch_format="pyarrow"
        )
        tris = merge_join(wedges, ekeys, "key", "key", [], how="semi")
        supports = (
            tris.map_batches(explode_triangle_edges, batch_format="pyarrow")
            .groupby("ekey")
            .count()
        )
        ok = supports.map_batches(
            lambda t: pa.table(
                {
                    "key": t.filter(
                        pc.greater_equal(t.column("count()"), thresh)
                    ).column("ekey")
                }
            ),
            batch_format="pyarrow",
        )
        survivors = (
            merge_join(
                edges.map_batches(edge_with_key, batch_format="pyarrow"),
                ok,
                "key",
                "key",
                [],
                how="semi",
            )
            .map_batches(
                lambda t: t.select(["u", "v"]), batch_format="pyarrow"
            )
            .repartition(parts)
            .materialize()
        )
        m = survivors.count()
        edges = survivors
        if m == 0:
            return empty_out
        if m == n_edges:
            break
        n_edges = m

    def explode_nodes(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([u, v]))})

    deg = (
        edges.map_batches(explode_nodes, batch_format="pyarrow")
        .groupby("node")
        .count()
    )
    out = merge_join(deg, id_host, "node", "id", ["host"], how="inner")
    return out.map_batches(
        lambda t: pa.table(
            {
                "host": t.column("host"),
                "truss_deg": t.column("count()").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


_MIX_K1 = np.uint64(0x9E3779B97F4A7C15)
_MIX_K2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX_K3 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer over uint64 — the walk's only randomness
    source, so distributed and sequential replays agree bit-for-bit
    (no wall clock, no RNG state; the determinism toolkit rule)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= _MIX_K2
    x ^= x >> np.uint64(27)
    x *= _MIX_K3
    x ^= x >> np.uint64(31)
    return x


def rwr_choice_score(w, step: int, v) -> np.ndarray:
    """Per-(walker, step, neighbor) uniform score; the walker moves to
    the neighbor minimizing (score, v) — argmin of an i.i.d. uniform
    hash IS a uniform choice, and the v tiebreak makes the pick
    independent of row order on either side."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        return _mix64(
            (np.asarray(w, np.uint64) * _MIX_K1)
            ^ (np.uint64(step) * _MIX_K2)
            ^ np.asarray(v, np.uint64)
        )


def rwr_restarts(w, step: int, restart_p: float) -> np.ndarray:
    """Per-(walker, step) restart decision: mix < p * 2^64."""
    thr = np.uint64(int(restart_p * 2.0**64))
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        return (
            _mix64(
                (np.asarray(w, np.uint64) * _MIX_K1) ^ (np.uint64(step) * _MIX_K3)
            )
            < thr
        )


def random_walk_visits(
    edge_ds,
    n_seeds: int = 4,
    walks_per_seed: int = 25,
    steps: int = 8,
    restart_p: float = 0.15,
    seeds: list | None = None,
    parts: int = 4,
):
    """Random-walk-with-restart sampling of the directed host graph
    (the PPR-by-simulation / graph-sampling primitive — Leskovec &
    Faloutsos 2006, "Sampling from large graphs"; crawl use: frontier
    seeding and neighborhood census around hub hosts). ``n_seeds``
    top-out-degree hosts (ties to the lexicographically smallest host)
    each launch ``walks_per_seed`` walkers; per step a walker restarts
    to its seed with probability ``restart_p`` (always, on a dead
    end), else moves to a uniformly chosen out-neighbor. Returns
    (host, visits): total node visits over all walkers and steps,
    including each walker's step-0 seed visit.

    Determinism: every decision is a SplitMix64 hash of (walker id,
    step, neighbor hash) — argmin of the per-neighbor scores with a
    neighbor-id tiebreak is a uniform pick that no row order, block
    boundary or reduction order can perturb, so the sequential oracle
    (oracle_sketch.oracle_rwr_table) replays the walk bit-for-bit.

    Scale shape: adjacency is the distinct directed non-self edge
    table on the int64 FNV-1a hash wire, built ONCE and materialized;
    each step is ONE walker-scale merge_join (walkers against
    adjacency on the current node, LEFT so dead ends surface as null
    neighbors) plus ONE sort(w) co-partitioned block-local argmin —
    exchanges carry walker-rows (three int64s × fan-out), never the
    graph. 10^7 walkers over a 10^9-node graph stream through the
    same two exchanges per step; the per-run Python loop inside a
    block is bounded by walkers-per-block, with the argmin itself
    vectorized."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.minhash import fnv1a_batch
    from .joins import merge_join

    def hash_edges(t: pa.Table) -> pa.Table:
        s = t.column("src")
        d = t.column("dst")
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        d = d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d
        si = fnv1a_batch(s).view(np.int64)
        di = fnv1a_batch(d).view(np.int64)
        keep = si != di
        return pa.table(
            {
                "u": pa.array(si[keep]),
                "v": pa.array(di[keep]),
                "u_host": s.filter(pa.array(keep)),
            }
        )

    hashed = edge_ds.map_batches(hash_edges, batch_format="pyarrow")
    adj = (
        _distinct_sorted(
            hashed.map_batches(lambda t: t.select(["u", "v"]), batch_format="pyarrow"),
            ["u", "v"],
        )
        .repartition(parts)
        .materialize()
    )
    # id -> host over the full universe (dst hosts included so visit
    # rows always translate)
    def both_ids(t: pa.Table) -> pa.Table:
        s = t.column("src")
        d = t.column("dst")
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        d = d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d
        si = fnv1a_batch(s).view(np.int64)
        di = fnv1a_batch(d).view(np.int64)
        return pa.table(
            {
                "id": pa.array(np.concatenate([si, di])),
                "host": pa.concat_arrays([s, d]),
            }
        )

    id_host = (
        _distinct_sorted(
            edge_ds.map_batches(both_ids, batch_format="pyarrow"), ["id"]
        )
        .repartition(parts)
        .materialize()
    )

    empty_out = rd.from_arrow(
        pa.table(
            {
                "host": pa.array([], pa.string()),
                "visits": pa.array([], pa.int64()),
            }
        )
    )
    if adj.count() == 0:
        return empty_out

    if seeds is None:
        deg = adj.groupby("u").count()
        deg_named = merge_join(deg, id_host, "u", "id", ["host"], how="inner")
        # node-scale top-k: distributed two-key sort, tiny limit
        top = deg_named.sort(["count()", "host"], descending=[True, False]).limit(
            n_seeds
        )
        seed_hosts = [r["host"] for r in top.take_all()]
    else:
        seed_hosts = list(seeds)[:n_seeds]
    if not seed_hosts:
        return empty_out
    seed_ids = fnv1a_batch(pa.array(seed_hosts, pa.string())).view(np.int64)

    n_walk = len(seed_hosts) * walks_per_seed
    w_ids = np.arange(n_walk, dtype=np.int64)
    seed_col = np.repeat(seed_ids, walks_per_seed)
    walkers = rd.from_arrow(
        pa.table(
            {
                "w": pa.array(w_ids),
                "seed": pa.array(seed_col),
                "cur": pa.array(seed_col),
            }
        )
    ).materialize()
    visit_parts = [
        pa.table({"node": pa.array(seed_col)})  # step-0 seed visits
    ]
    visit_dses = []

    def make_step_block(step: int):
        out_schema = pa.schema(
            [("w", pa.int64()), ("seed", pa.int64()), ("cur", pa.int64())]
        )

        def step_block(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return out_schema.empty_table()
            w = t.column("w").to_numpy(zero_copy_only=False)
            seed = t.column("seed").to_numpy(zero_copy_only=False)
            vcol = t.column("v")
            vnull = pc.is_null(vcol).to_numpy(zero_copy_only=False)
            v = pc.fill_null(vcol, 0).to_numpy(zero_copy_only=False)
            order = np.argsort(w, kind="stable")
            w, seed, v, vnull = w[order], seed[order], v[order], vnull[order]
            starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
            ends = np.r_[starts[1:], len(w)]
            out_w = w[starts]
            out_seed = seed[starts]
            restart = rwr_restarts(out_w, step, restart_p)
            out_cur = np.empty(len(starts), dtype=np.int64)
            for i, (s, e) in enumerate(zip(starts, ends)):
                cand = v[s:e][~vnull[s:e]]
                if restart[i] or len(cand) == 0:
                    out_cur[i] = out_seed[i]
                    continue
                score = rwr_choice_score(out_w[i], step, cand)
                out_cur[i] = cand[np.lexsort((cand, score))[0]]
            return pa.table(
                {
                    "w": pa.array(out_w),
                    "seed": pa.array(out_seed),
                    "cur": pa.array(out_cur),
                },
                schema=out_schema,
            )

        return step_block

    for step in range(1, steps + 1):
        expanded = merge_join(walkers, adj, "cur", "u", ["v"], how="left")
        walkers = (
            expanded.sort("w")
            .map_batches(
                make_step_block(step), batch_format="pyarrow", batch_size=None
            )
            .materialize()
        )
        visit_dses.append(
            walkers.map_batches(
                lambda t: pa.table({"node": t.column("cur")}),
                batch_format="pyarrow",
            )
        )

    visits = rd.from_arrow(pa.concat_tables(visit_parts))
    for d in visit_dses:
        visits = visits.union(d)
    counts = visits.groupby("node").count()
    out = merge_join(counts, id_host, "node", "id", ["host"], how="inner")
    return out.map_batches(
        lambda t: pa.table(
            {
                "host": t.column("host"),
                "visits": t.column("count()").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def ip_colocation_stats(edge_ds):
    """IP-colocation census over the link graph's host universe:
    every host resolved to its IPv4 (the same deterministic
    fingerprint resolver model the DNS cache pool serves —
    state/dns.py _resolve_host; a real deployment resolves live and
    the shapes below are unchanged), then per host the number of
    hosts sharing its IP. Many-hosts-one-IP is the classic
    shared-hosting / spam-farm aggregation signal (Fetterly,
    Manasse & Najork 2004, "Spam, damn spam, and statistics":
    heavily co-hosted IPs are dominated by machine-generated spam).

    Shape: node-scale only — distinct host table from the edge set,
    one vectorized fp64 resolve pass, a groupby(ip) count and ONE
    merge_join attaching the share-count back. Output (host, ip,
    n_shared), n_shared >= 1."""
    from ..functions.fingerprint import fp64_batch
    from .joins import merge_join

    def nodes_of(col):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"host": t.column(col)})

        return f

    hosts = _distinct_sorted(
        edge_ds.map_batches(nodes_of("src"), batch_format="pyarrow").union(
            edge_ds.map_batches(nodes_of("dst"), batch_format="pyarrow")
        ),
        ["host"],
    )

    def resolve(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "ip": pa.array([], pa.string()),
                }
            )
        hs = t.column("host").to_pylist()
        fps = fp64_batch(hs).view(np.uint64)
        ips = (np.uint64(10 << 24) | (fps & np.uint64(0xFFFFFF))).astype(np.int64)
        quads = [
            f"{(v >> 24) & 0xFF}.{(v >> 16) & 0xFF}.{(v >> 8) & 0xFF}.{v & 0xFF}"
            for v in ips.tolist()
        ]
        return pa.table(
            {
                "host": t.column("host"),
                "ip": pa.array(quads, pa.string()),
            }
        )

    resolved = hosts.map_batches(resolve, batch_format="pyarrow").materialize()
    counts = resolved.groupby("ip").count().map_batches(
        lambda t: pa.table(
            {
                "ip": t.column("ip"),
                "n_shared": t.column("count()").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    out = merge_join(resolved, counts, "ip", "ip", ["n_shared"], how="inner")
    return out.map_batches(
        lambda t: t.select(["host", "ip", "n_shared"]), batch_format="pyarrow"
    )


def hyperball_harmonic(
    edge_ds,
    p: int = 8,
    max_rounds: int = 32,
    parts: int = 8,
    round_units: list | None = None,
):
    """HyperBall harmonic centrality (Boldi & Vigna 2013, "In-Core
    Computation of Geometric Centralities with HyperBall: A Hundred
    Billion Nodes and Beyond"): per host, harmonic centrality
    H(v) = sum over u != v of 1/d(u, v) estimated by iterating HLL
    counters — B_t(v) = B_{t-1}(v) merged with B_{t-1}(u) for every
    in-edge (u, v); the per-round estimate increment approximates the
    number of nodes at distance exactly t, contributing inc/t. Also
    returns the final ball size (nodes that can REACH v).

    Scale shape (the pagerank/LPA loop discipline): int64 FNV-1a hash
    wire; the distinct directed edge table is built ONCE and
    materialized. Per round: ONE edge-scale merge_join ships each
    node's 2^p-byte register blob along its out-edges, a sort(node)
    co-partitioned block pass folds them with np.maximum.reduceat
    (elementwise-max register merge — associative, order-free), and
    one node-scale merge_join re-attaches the running harmonic
    accumulator. Register sums are integer and monotone
    non-decreasing, so an unchanged dataset sum IS convergence (the
    k-core argument, flipped to max). Wire cost: edges x 2^p bytes
    per round — HyperBall's own cost model (p=8 -> 256 B, rse ~6.5%).
    Estimates use the shared hll_estimate_rows kernel; per-round
    increments clamp at >= 0 (the HyperANF monotonicity fix for the
    linear-counting/raw estimator switch). Deterministic end-to-end:
    splitmix64 node hashing, order-free register folds, per-node
    float accumulation in round order — the sequential oracle walks
    identical floats.

    ``round_units``: pass a list to ALSO collect the HyperANF
    neighborhood function — after init and after every round it
    appends (t, sum over nodes of rint(est * 1e6) as int) — exact
    integer units, so the sum is order-free and the distance
    distribution is oracle-checkable (hyperanf_distance_distribution
    builds on this)."""
    import ray.data as rd

    from ..functions.minhash import fnv1a_batch
    from ..functions.sketches import HyperLogLog, hll_estimate_rows, splitmix64
    from .joins import merge_join

    m = 1 << p

    def hash_edges(t: pa.Table) -> pa.Table:
        s = t.column("src")
        d = t.column("dst")
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        d = d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d
        si = fnv1a_batch(s).view(np.int64)
        di = fnv1a_batch(d).view(np.int64)
        return pa.table(
            {
                "u": pa.array(si),
                "v": pa.array(di),
                "u_host": s,
                "v_host": d,
            }
        )

    hashed = edge_ds.map_batches(hash_edges, batch_format="pyarrow")
    edges = (
        _distinct_sorted(
            hashed.map_batches(
                lambda t: t.select(["u", "v"]), batch_format="pyarrow"
            ),
            ["u", "v"],
        )
        .map_batches(
            lambda t: t.filter(pc.not_equal(t.column("u"), t.column("v"))),
            batch_format="pyarrow",
        )
        .repartition(parts)
        .materialize()
    )
    id_host = (
        _distinct_sorted(
            hashed.map_batches(
                lambda t: pa.table(
                    {
                        "id": pa.array(
                            np.concatenate(
                                [
                                    t.column("u").to_numpy(zero_copy_only=False),
                                    t.column("v").to_numpy(zero_copy_only=False),
                                ]
                            )
                        ),
                        "host": pa.concat_arrays(
                            [
                                t.column("u_host").combine_chunks()
                                if isinstance(t.column("u_host"), pa.ChunkedArray)
                                else t.column("u_host"),
                                t.column("v_host").combine_chunks()
                                if isinstance(t.column("v_host"), pa.ChunkedArray)
                                else t.column("v_host"),
                            ]
                        ),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["id"],
        )
        .repartition(parts)
        .materialize()
    )

    def init_state(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = []
        for i in ids.tolist():
            h = HyperLogLog(p=p).add_hashes(
                splitmix64(np.array([i], dtype=np.int64))
            )
            blobs.append(h.registers.tobytes())
        est = hll_estimate_rows(
            np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(-1, m)
        ) if blobs else np.empty(0)
        return pa.table(
            {
                "node": pa.array(ids),
                "regs": pa.array(blobs, pa.binary()),
                "harm": pa.array(np.zeros(len(ids)), pa.float64()),
                "prev": pa.array(est, pa.float64()),
            }
        )

    state = (
        id_host.map_batches(
            lambda t: pa.table({"id": t.column("id")}), batch_format="pyarrow"
        )
        .map_batches(init_state, batch_format="pyarrow")
        .materialize()
    )

    def reg_sum(t: pa.Table) -> pa.Table:
        blobs = t.column("regs").to_pylist()
        tot = (
            int(
                np.frombuffer(b"".join(blobs), dtype=np.uint8)
                .astype(np.int64)
                .sum()
            )
            if blobs
            else 0
        )
        return pa.table({"s": pa.array([tot], pa.int64())})

    def total_regs(st) -> int:
        return st.map_batches(reg_sum, batch_format="pyarrow").sum("s")

    def units_row(t: pa.Table) -> pa.Table:
        est = t.column("prev").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s": pa.array(
                    [int(np.rint(est * 1e6).astype(np.int64).sum())], pa.int64()
                )
            }
        )

    def units_sum(st) -> int:
        return int(st.map_batches(units_row, batch_format="pyarrow").sum("s"))

    def fold_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(
                [("node", pa.int64()), ("regs", pa.binary())]
            ).empty_table()
        nodes = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = t.column("regs").to_pylist()
        mat = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(-1, m)
        order = np.argsort(nodes, kind="mergesort")
        nodes_s, mat_s = nodes[order], mat[order]
        starts = np.flatnonzero(np.r_[True, nodes_s[1:] != nodes_s[:-1]])
        merged = np.maximum.reduceat(mat_s, starts, axis=0)
        return pa.table(
            {
                "node": pa.array(nodes_s[starts]),
                "regs": pa.array(
                    [merged[i].tobytes() for i in range(len(starts))], pa.binary()
                ),
            }
        )

    import os as _os
    import time as _time

    _dbg = bool(_os.environ.get("CCRAY_HYPERBALL_DEBUG"))
    if round_units is not None:
        round_units.append((0, units_sum(state)))
    prev_total = total_regs(state)
    for t_round in range(1, max_rounds + 1):
        _t0 = _time.time()
        shipped = merge_join(
            edges,
            state.map_batches(
                lambda t: t.select(["node", "regs"]), batch_format="pyarrow"
            ),
            "u",
            "node",
            ["regs"],
            how="inner",
        ).map_batches(
            lambda t: pa.table({"node": t.column("v"), "regs": t.column("regs")}),
            batch_format="pyarrow",
        )
        own = state.map_batches(
            lambda t: t.select(["node", "regs"]), batch_format="pyarrow"
        )
        new_regs = (
            own.union(shipped)
            .sort("node")
            .map_batches(fold_block, batch_format="pyarrow", batch_size=None)
        )
        joined = merge_join(
            new_regs,
            state.map_batches(
                lambda t: t.select(["node", "harm", "prev"]),
                batch_format="pyarrow",
            ),
            "node",
            "node",
            ["harm", "prev"],
            how="inner",
        )

        def advance(t: pa.Table, _t=t_round) -> pa.Table:
            if len(t) == 0:
                return pa.schema(
                    [
                        ("node", pa.int64()),
                        ("regs", pa.binary()),
                        ("harm", pa.float64()),
                        ("prev", pa.float64()),
                    ]
                ).empty_table()
            blobs = t.column("regs").to_pylist()
            mat = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(-1, m)
            est = hll_estimate_rows(mat)
            prev = t.column("prev").to_numpy(zero_copy_only=False)
            harm = t.column("harm").to_numpy(zero_copy_only=False)
            inc = np.maximum(est - prev, 0.0)
            return pa.table(
                {
                    "node": t.column("node"),
                    "regs": t.column("regs"),
                    "harm": pa.array(harm + inc / float(_t), pa.float64()),
                    "prev": pa.array(est, pa.float64()),
                }
            )

        _t1 = _time.time()
        # repartition clamps the loop-carried block count: the round's
        # join/union/sort pipeline multiplies blocks (~3x/round), and
        # node-scale rows spread over thousands of tiny blocks turn
        # per-block task overhead into quadratic round times
        state = (
            joined.map_batches(advance, batch_format="pyarrow")
            .repartition(parts)
            .materialize()
        )
        _t2 = _time.time()
        cur_total = total_regs(state)
        if round_units is not None:
            round_units.append((t_round, units_sum(state)))
        if _dbg:
            print(
                f"[hyperball] round {t_round}: {_time.time() - _t0:.1f}s "
                f"(mat {_t2 - _t1:.1f}s, regsum {_time.time() - _t2:.1f}s, "
                f"nblocks {state.num_blocks()}) reg_sum {cur_total}",
                flush=True,
            )
        if cur_total == prev_total:
            break
        prev_total = cur_total

    out = merge_join(state, id_host, "node", "id", ["host"], how="inner")
    return out.map_batches(
        lambda t: pa.table(
            {
                "host": t.column("host"),
                "harmonic": pa.array(
                    np.round(
                        t.column("harm").to_numpy(zero_copy_only=False), 6
                    ),
                    pa.float64(),
                ),
                "reach_in": pa.array(
                    np.round(
                        t.column("prev").to_numpy(zero_copy_only=False), 6
                    ),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def hyperanf_distance_distribution(
    edge_ds, p: int = 8, max_rounds: int = 32, parts: int = 8
):
    """HyperANF distance distribution (Boldi, Rosa & Vigna 2011,
    "HyperANF: Approximating the Neighbourhood Function of Very Large
    Graphs on a Budget"): the neighborhood function N(t) = number of
    (u, v) pairs with d(u, v) <= t (self-pairs included), per round of
    the HyperBall iteration, as a fraction of the final reachable
    count. The effective diameter is the first t with frac >= 0.9 —
    directly derivable from the output rows.

    Built ON the hyperball_harmonic loop (same wire, same exchanges):
    the per-round global sum is collected in exact rint(est * 1e6)
    integer units, so it is order-free and the sequential oracle
    reproduces it bit-for-bit. Output rows: (t, nreach, frac), one per
    executed round including round 0."""
    import ray.data as rd

    units: list[tuple[int, int]] = []
    # the loop runs eagerly (each round materializes); the returned
    # dataset itself is not needed, only the collected sums
    hyperball_harmonic(
        edge_ds, p=p, max_rounds=max_rounds, parts=parts, round_units=units
    )
    final = units[-1][1] if units else 0
    return rd.from_arrow(
        pa.table(
            {
                "t": pa.array([t for t, _ in units], pa.int64()),
                "nreach": pa.array(
                    [round(u / 1e6, 6) for _, u in units], pa.float64()
                ),
                "frac": pa.array(
                    [round(u / final, 6) if final else 0.0 for _, u in units],
                    pa.float64(),
                ),
            }
        )
    )


def clustering_coefficients(edge_ds, max_degree: int | None = 4096):
    """Per-host local clustering coefficient (Watts & Strogatz 1998)
    over the undirected distinct non-self edge set: C(v) =
    2 * tri(v) / (deg(v) * (deg(v) - 1)), where tri(v) counts
    CONNECTED neighbor pairs of v. High-C dense neighborhoods flag
    link cliques; the hub-periphery web sits near 0.

    Shape (the triangle_count discipline, per-apex variant): ONE
    distinct canonical edge build; a sort(apex) block pass emits each
    node's neighbor-pair wedges (apexes wider than ``max_degree`` are
    skipped and counted — wedge volume is sum(deg^2)); ONE semi
    merge_join closes wedges against the edge set; survivors count per
    apex (every triangle counts once at EACH of its three vertices —
    exactly tri(v)); degrees are one node-scale groupby over both
    directions; a final left merge_join computes the coefficient in a
    fixed double expression, 6 dp. Wedge keys are the same bounded
    "b|c" strings the triangle op uses (hash-at-scale note there)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..state.counters import count_skip
    from .joins import merge_join

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pa.table(
            {"u": pa.array(lo, pa.string()), "v": pa.array(hi, pa.string())}
        )

    edges = _distinct_sorted(
        edge_ds.map_batches(canon, batch_format="pyarrow"), ["u", "v"]
    ).materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        u = t.column("u")
        v = t.column("v")
        u = u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u
        v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        return pa.table(
            {
                "a": pa.concat_arrays([u, v]),
                "b": pa.concat_arrays([v, u]),
            }
        )

    adj = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def wedges_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(
                [("apex", pa.string()), ("key", pa.string())]
            ).empty_table()
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        ends = np.r_[starts[1:], len(a)]
        apexes: list[str] = []
        keys: list[str] = []
        skipped = 0
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            if max_degree is not None and k > max_degree:
                skipped += 1
                continue
            nb = b[s:e]  # sorted by the lexsort secondary key
            ii, jj = np.triu_indices(k, 1)
            apexes.extend([a[s]] * len(ii))
            keys.extend(x + "|" + y for x, y in zip(nb[ii], nb[jj]))
        if skipped:
            count_skip("clustering_coeff", buckets=skipped)
        return pa.table(
            {
                "apex": pa.array(apexes, pa.string()),
                "key": pa.array(keys, pa.string()),
            }
        )

    wedges = adj.sort("a").map_batches(
        wedges_block, batch_format="pyarrow", batch_size=None
    )

    def edge_keys(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": pc.binary_join_element_wise(t.column("u"), t.column("v"), "|")}
        )

    closed = merge_join(
        wedges,
        edges.map_batches(edge_keys, batch_format="pyarrow"),
        left_on="key",
        right_on="key",
        right_cols=[],
        how="semi",
    )
    tri = closed.groupby("apex").count().map_batches(
        lambda t: pa.table(
            {
                "h": t.column("apex"),
                "n_tri": t.column("count()").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    deg = adj.groupby("a").count().map_batches(
        lambda t: pa.table(
            {
                "host": t.column("a"),
                "deg": t.column("count()").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = merge_join(deg, tri, "host", "h", ["n_tri"], how="left")

    def finalize(t: pa.Table) -> pa.Table:
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        nt = np.nan_to_num(
            t.column("n_tri").to_numpy(zero_copy_only=False).astype(np.float64),
            nan=0.0,
        ).astype(np.int64)
        denom = d * (d - 1)
        c = np.where(d >= 2, 2.0 * nt / np.maximum(denom, 1), 0.0)
        return pa.table(
            {
                "host": t.column("host"),
                "deg": pa.array(d, pa.int64()),
                "n_tri": pa.array(nt, pa.int64()),
                "clustering": pa.array(np.round(c, 6), pa.float64()),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def _hashed_host_graph(edge_ds, parts: int = 8):
    """Shared hash-wire graph build for the reachability-family ops
    (bow-tie, seed distance, SCC): (src, dst) host-string edges ->
    (edges, id_host) where ``edges`` is the distinct self-loop-free
    directed edge table on int64 FNV-1a ids and ``id_host`` the
    id -> host translation table, both repartitioned and materialized
    so every downstream fixpoint iterates over settled blocks without
    re-running the parse lineage."""
    from ..functions.minhash import fnv1a_batch

    def hash_edges(t: pa.Table) -> pa.Table:
        s = t.column("src")
        d = t.column("dst")
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        d = d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d
        si = fnv1a_batch(s).view(np.int64)
        di = fnv1a_batch(d).view(np.int64)
        return pa.table(
            {"u": pa.array(si), "v": pa.array(di), "u_host": s, "v_host": d}
        )

    hashed = edge_ds.map_batches(hash_edges, batch_format="pyarrow")
    edges = (
        _distinct_sorted(
            hashed.map_batches(lambda t: t.select(["u", "v"]), batch_format="pyarrow"),
            ["u", "v"],
        )
        .map_batches(
            lambda t: t.filter(pc.not_equal(t.column("u"), t.column("v"))),
            batch_format="pyarrow",
        )
        .repartition(parts)
        .materialize()
    )
    id_host = (
        _distinct_sorted(
            hashed.map_batches(
                lambda t: pa.table(
                    {
                        "id": pa.array(
                            np.concatenate(
                                [
                                    t.column("u").to_numpy(zero_copy_only=False),
                                    t.column("v").to_numpy(zero_copy_only=False),
                                ]
                            )
                        ),
                        "host": pa.concat_arrays(
                            [
                                t.column("u_host").combine_chunks()
                                if isinstance(t.column("u_host"), pa.ChunkedArray)
                                else t.column("u_host"),
                                t.column("v_host").combine_chunks()
                                if isinstance(t.column("v_host"), pa.ChunkedArray)
                                else t.column("v_host"),
                            ]
                        ),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["id"],
        )
        .repartition(parts)
        .materialize()
    )
    return edges, id_host


def bowtie_decomposition(edge_ds, max_rounds: int = 64, parts: int = 8):
    """Bow-tie decomposition of the directed host graph (Broder et
    al. 2000, "Graph structure in the Web"): pick the hub pivot
    (max in+out degree, ties to the lexicographically smallest
    host), compute its forward set F and backward set B by two
    reachability fixpoints, and label every host SCC (F and B — the
    pivot's strongly connected component), OUT (F only), IN (B
    only), or OTHER (tendrils/tubes/disconnected relative to the
    pivot component) — the pivot-based decomposition the paper's
    web-census popularized.

    Shape: the k-core loop discipline — int64 hash wire, distinct
    directed edge table built once; each reachability round is ONE
    edge-scale merge_join (semi: which edges leave the reached set)
    + a node-scale distinct-union, block-clamped and materialized,
    with the monotone reached-count as the fixpoint test. Labels are
    two node-scale semi/anti merge_joins. Host strings return only
    in the final translation join."""
    import ray.data as rd

    from .joins import merge_join

    edges, id_host = _hashed_host_graph(edge_ds, parts)
    rev = edges.map_batches(
        lambda t: pa.table({"u": t.column("v"), "v": t.column("u")}),
        batch_format="pyarrow",
    ).materialize()

    # pivot: max total degree over the distinct edge set, host tiebreak
    def deg_rows(ds_, col):
        return ds_.groupby(col).count().map_batches(
            lambda t, _c=col: pa.table(
                {
                    "id": t.column(_c),
                    "deg": t.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    total_deg = (
        deg_rows(edges, "u")
        .union(deg_rows(edges, "v"))
        .groupby("id")
        .sum("deg")
        .map_batches(
            lambda t: pa.table(
                {
                    "id": t.column("id"),
                    "deg": t.column("sum(deg)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    top = (
        merge_join(total_deg, id_host, "id", "id", ["host"], how="inner")
        .sort(["deg", "host"], descending=[True, False])
        .limit(1)
        .take_all()
    )
    if not top:
        return rd.from_arrow(
            pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "bowtie": pa.array([], pa.string()),
                }
            )
        )
    pivot = int(top[0]["id"])

    def reach(adj) -> "rd.Dataset":
        reached = rd.from_arrow(
            pa.table({"node": pa.array([pivot], pa.int64())})
        ).materialize()
        prev_n = 1
        for _ in range(max_rounds):
            new = merge_join(adj, reached, "u", "node", [], how="semi").map_batches(
                lambda t: pa.table({"node": t.column("v")}), batch_format="pyarrow"
            )
            reached = (
                _distinct_sorted(reached.union(new), ["node"])
                .repartition(parts)
                .materialize()
            )
            n = reached.count()
            if n == prev_n:
                break
            prev_n = n
        return reached

    F = reach(edges)
    B = reach(rev)
    in_f = merge_join(id_host, F, "id", "node", [], how="semi")
    labeled_f = in_f.map_batches(
        lambda t: pa.table({"id": t.column("id"), "f": pa.array(np.ones(len(t), dtype=np.int64))}),
        batch_format="pyarrow",
    )
    in_b = merge_join(id_host, B, "id", "node", [], how="semi")
    labeled_b = in_b.map_batches(
        lambda t: pa.table({"id": t.column("id"), "b": pa.array(np.ones(len(t), dtype=np.int64))}),
        batch_format="pyarrow",
    )
    both = merge_join(
        merge_join(id_host, labeled_f, "id", "id", ["f"], how="left"),
        labeled_b,
        "id",
        "id",
        ["b"],
        how="left",
    )

    def label(t: pa.Table) -> pa.Table:
        f = np.nan_to_num(
            t.column("f").to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
        ).astype(bool)
        b = np.nan_to_num(
            t.column("b").to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0
        ).astype(bool)
        lab = np.where(f & b, "SCC", np.where(f, "OUT", np.where(b, "IN", "OTHER")))
        return pa.table(
            {
                "host": t.column("host"),
                "bowtie": pa.array(lab.tolist(), pa.string()),
            }
        )

    return both.map_batches(label, batch_format="pyarrow")


def seed_distance_hosts(edge_ds, seed_hosts: list, max_rounds: int = 64, parts: int = 8):
    """Multi-source BFS hop distance from the crawl's seed hosts over
    the directed host graph — the crawl-depth census: dist(v) = the
    minimum number of link hops a frontier starting at the seed list
    needs to reach host v (0 for seeds themselves, -1 for hosts no
    crawl from those seeds can ever reach). The classic frontier-depth
    curve (how much of the web each additional crawl round unlocks)
    reads straight off ``GROUP BY dist``.

    Shape: the bow-tie reach() discipline specialised to layered BFS —
    int64 FNV-1a hash wire, distinct edge table built once and
    materialized; each layer is ONE edge-scale semi merge_join (edges
    leaving the current frontier) + a node-scale distinct + ONE
    node-scale anti merge_join against the reached set, so a layer
    ships edges touching the frontier, never the whole reached
    history. The frontier count hitting zero is the exact fixpoint.
    Host strings ride only the final translation join."""
    import ray.data as rd

    from ..functions.minhash import fnv1a_batch
    from .joins import merge_join

    edges, id_host = _hashed_host_graph(edge_ds, parts)

    # seed ids present in the graph (dead seed hosts have no edges)
    seed_arr = pa.array(sorted(set(seed_hosts)), pa.string())
    seed_ids = np.unique(fnv1a_batch(seed_arr).view(np.int64))
    seeds_ds = rd.from_arrow(pa.table({"node": pa.array(seed_ids, pa.int64())}))
    frontier = (
        merge_join(seeds_ds, id_host, "node", "id", [], how="semi")
        .materialize()
    )
    if frontier.count() == 0:
        # no seed host exists in the graph: everything is unreachable
        return id_host.map_batches(
            lambda t: pa.table(
                {
                    "host": t.column("host"),
                    "dist": pa.array(np.full(len(t), -1, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
    reached = frontier.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "dist": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for d in range(1, max_rounds + 1):
        cand = _distinct_sorted(
            merge_join(edges, frontier, "u", "node", [], how="semi").map_batches(
                lambda t: pa.table({"node": t.column("v")}), batch_format="pyarrow"
            ),
            ["node"],
        ).materialize()
        if cand.count() == 0:
            # frontier has no outgoing edges: exact fixpoint (an empty
            # sorted dataset also carries no schema for the anti join)
            break
        new = (
            merge_join(cand, reached, "node", "node", [], how="anti")
            .repartition(parts)
            .materialize()
        )
        if new.count() == 0:
            break
        reached = (
            reached.union(
                new.map_batches(
                    lambda t, _d=d: pa.table(
                        {
                            "node": t.column("node"),
                            "dist": pa.array(np.full(len(t), _d, dtype=np.int64)),
                        }
                    ),
                    batch_format="pyarrow",
                )
            )
            .repartition(parts)
            .materialize()
        )
        frontier = new

    joined = merge_join(id_host, reached, "id", "node", ["dist"], how="left")

    def finalize(t: pa.Table) -> pa.Table:
        dist = t.column("dist").to_numpy(zero_copy_only=False)
        dist = np.where(np.isnan(dist.astype(np.float64)), -1, dist).astype(np.int64)
        return pa.table({"host": t.column("host"), "dist": pa.array(dist)})

    return joined.map_batches(finalize, batch_format="pyarrow")


def scc_hosts(edge_ds, max_outer: int = 32, max_inner: int = 256, parts: int = 8):
    """Full strongly-connected-component labeling of the directed host
    graph via the distributed coloring algorithm (Orzan 2004; the
    Pregel/graph-frame SCC of Slota et al.): repeat { (1) propagate the
    minimum node id forward to a fixpoint over the still-active
    subgraph — color(v) = min id over v's active ancestors (and v);
    (2) nodes with color(v) == v are roots, and the SCC of root r is
    exactly the set of nodes colored r that can reach r, found by one
    multi-source BACKWARD reachability fixpoint from all roots at once,
    restricted to same-colored nodes; (3) retire those SCCs and their
    incident edges } until no active node remains. Isolated-by-removal
    nodes label themselves on the next outer round (their color is
    their own id and they are their own root).

    Output: (host, scc, scc_size) where ``scc`` is the
    lexicographically smallest host of the component — hash-order free,
    so a sequential Tarjan oracle reproduces it exactly.

    Scale shape: int64 FNV-1a hash wire end to end; the forward pass is
    DELTA propagation (each inner round ships only edges leaving nodes
    whose color changed — one edge-scale merge_join — plus node-scale
    sort-min and change-detection joins); the backward pass grows
    per-root frontiers the same way with a same-color filter join. The
    active subgraph shrinks monotonically (each outer round retires at
    least every current root), and on web graphs the giant SCC falls in
    outer round 1, leaving small periphery components. ``max_outer`` /
    ``max_inner`` are explicit convergence caps — hitting one raises
    (never a silently partial labeling)."""
    import ray.data as rd

    from .joins import merge_join

    edges_all, id_host = _hashed_host_graph(edge_ds, parts)

    def _min_by_node(ds_, val: str):
        # (node, val) rows -> per-node min(val): ONE sort + block scan
        # (equal keys never split across sort blocks)
        def block_min(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.schema(
                    [("node", pa.int64()), (val, pa.int64())]
                ).empty_table()
            n = t.column("node").to_numpy(zero_copy_only=False)
            c = t.column(val).to_numpy(zero_copy_only=False)
            order = np.lexsort((c, n))
            n, c = n[order], c[order]
            starts = np.flatnonzero(np.r_[True, n[1:] != n[:-1]])
            return pa.table(
                {"node": pa.array(n[starts]), val: pa.array(c[starts])}
            )

        return ds_.sort("node").map_batches(
            block_min, batch_format="pyarrow", batch_size=None
        )

    assigned = None  # (node, scc) rows, grown per outer round
    active_nodes = id_host.map_batches(
        lambda t: pa.table({"node": t.column("id")}), batch_format="pyarrow"
    ).materialize()
    edges = edges_all

    for outer in range(max_outer):
        if active_nodes.count() == 0:
            break

        # ---- forward min-label fixpoint (delta propagation) --------
        color = active_nodes.map_batches(
            lambda t: pa.table({"node": t.column("node"), "color": t.column("node")}),
            batch_format="pyarrow",
        ).materialize()
        frontier = color
        for _ in range(max_inner):
            if frontier.count() == 0:
                break
            msgs = merge_join(
                edges, frontier, "u", "node", ["color"], how="inner"
            ).map_batches(
                lambda t: pa.table(
                    {"node": t.column("v"), "color": t.column("color")}
                ),
                batch_format="pyarrow",
            )
            new_color = (
                _min_by_node(color.union(msgs), "color")
                .repartition(parts)
                .materialize()
            )
            changed = merge_join(
                new_color, color, "node", "node", ["color"], suffix="_old"
            ).map_batches(
                lambda t: t.filter(
                    pc.not_equal(t.column("color"), t.column("color_old"))
                ).select(["node", "color"]),
                batch_format="pyarrow",
            ).materialize()
            color = new_color
            frontier = changed
        else:
            raise RuntimeError(
                f"scc_hosts: forward pass did not converge in {max_inner} rounds"
            )

        # ---- backward sweep from all roots at once ------------------
        roots = color.map_batches(
            lambda t: t.filter(pc.equal(t.column("node"), t.column("color"))),
            batch_format="pyarrow",
        ).materialize()
        scc = roots.map_batches(
            lambda t: pa.table({"node": t.column("node"), "scc": t.column("color")}),
            batch_format="pyarrow",
        ).materialize()
        frontier = scc
        for _ in range(max_inner):
            if frontier.count() == 0:
                break
            # reverse step: edge u->v, walk v -> u, keep same-color u
            cand = merge_join(
                edges, frontier, "v", "node", ["scc"], how="inner"
            ).map_batches(
                lambda t: pa.table({"node": t.column("u"), "scc": t.column("scc")}),
                batch_format="pyarrow",
            )
            cand = merge_join(
                _min_by_node(cand, "scc"), color, "node", "node", ["color"]
            ).map_batches(
                lambda t: t.filter(
                    pc.equal(t.column("scc"), t.column("color"))
                ).select(["node", "scc"]),
                batch_format="pyarrow",
            ).materialize()
            if cand.count() == 0:
                break
            new = (
                merge_join(cand, scc, "node", "node", [], how="anti")
                .repartition(parts)
                .materialize()
            )
            if new.count() == 0:
                break
            scc = scc.union(new).repartition(parts).materialize()
            frontier = new
        else:
            raise RuntimeError(
                f"scc_hosts: backward pass did not converge in {max_inner} rounds"
            )

        assigned = scc if assigned is None else (
            assigned.union(scc).repartition(parts).materialize()
        )

        # ---- retire labeled nodes and their incident edges ----------
        active_nodes = (
            merge_join(active_nodes, scc, "node", "node", [], how="anti")
            .repartition(parts)
            .materialize()
        )
        if active_nodes.count() == 0:
            break
        kept_u = merge_join(edges, active_nodes, "u", "node", [], how="semi")
        edges_next = merge_join(
            kept_u, active_nodes, "v", "node", [], how="semi"
        ).repartition(parts).materialize()
        if edges_next.count() == 0:
            # remaining nodes are edge-free within the active set:
            # each is its own singleton SCC
            singles = active_nodes.map_batches(
                lambda t: pa.table(
                    {"node": t.column("node"), "scc": t.column("node")}
                ),
                batch_format="pyarrow",
            ).materialize()
            assigned = assigned.union(singles).repartition(parts).materialize()
            active_nodes = merge_join(
                active_nodes, singles, "node", "node", [], how="anti"
            ).materialize()
            break
        edges = edges_next
    else:
        raise RuntimeError(
            f"scc_hosts: outer peel did not converge in {max_outer} rounds"
        )

    # ---- translate: scc id hash -> lexicographically smallest host --
    with_host = merge_join(
        assigned, id_host, "node", "id", ["host"], how="inner"
    ).materialize()

    def scc_host_rows(t: pa.Table) -> pa.Table:
        return pa.table({"scc_id": t.column("scc"), "host": t.column("host")})

    def block_min_host(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(
                [("scc_id", pa.int64()), ("rep", pa.string()), ("scc_size", pa.int64())]
            ).empty_table()
        sid = t.column("scc_id").to_numpy(zero_copy_only=False)
        host = np.asarray(t.column("host").to_pylist(), dtype=object)
        order = np.lexsort((host, sid))
        sid, host = sid[order], host[order]
        starts = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]])
        sizes = np.diff(np.r_[starts, len(sid)])
        return pa.table(
            {
                "scc_id": pa.array(sid[starts]),
                "rep": pa.array(host[starts].tolist(), pa.string()),
                "scc_size": pa.array(sizes.astype(np.int64)),
            }
        )

    reps = (
        with_host.map_batches(scc_host_rows, batch_format="pyarrow")
        .sort("scc_id")
        .map_batches(block_min_host, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    out = merge_join(
        with_host.map_batches(
            lambda t: pa.table({"scc_id": t.column("scc"), "host": t.column("host")}),
            batch_format="pyarrow",
        ),
        reps,
        "scc_id",
        "scc_id",
        ["rep", "scc_size"],
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "host": t.column("host"),
                "scc": t.column("rep"),
                "scc_size": t.column("scc_size"),
            }
        ),
        batch_format="pyarrow",
    )


def salsa_hosts(parse_ds, iters: int = 10, parts: int = 8):
    """SALSA link ranking (Lempel & Moran 2001, "SALSA: the stochastic
    approach for link-structure analysis") over the host graph ->
    Dataset (host, salsa_authority, salsa_hub), 6-decimal rounded.
    SALSA is HITS with random-walk normalization: authority mass flows
    BACKWARD over in-links split by in-degree, then FORWARD over
    out-links split by out-degree — a doubly-stochastic two-step walk
    on the hub/authority bipartite graph, which famously resists the
    tightly-knit-community (TKC) score capture that inflates HITS.
    Run as ``iters`` fixed power-iteration steps from the uniform
    authority distribution (total mass is conserved exactly by the
    degree splits, so no renormalization step is needed); the
    sequential oracle iterates the identical updates.

    Scale shape: identical to hits_hosts — per iteration two
    edge-table merge_join exchanges and node-scale degree joins; the
    in/out-degree tables are built ONCE (two groupby counts,
    materialized) and the score table stays a bounded node-scale
    dataset."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .joins import merge_join

    edges = (
        _distinct_sorted(
            parse_ds.map_batches(extract_host_edges_batch, batch_format="pyarrow"),
            ["src", "dst"],
        )
        .repartition(parts)
        .materialize()
    )
    nodes = (
        _distinct_sorted(
            edges.select_columns(["src"])
            .map_batches(
                lambda t: pa.table({"node": t.column("src")}),
                batch_format="pyarrow",
            )
            .union(
                edges.select_columns(["dst"]).map_batches(
                    lambda t: pa.table({"node": t.column("dst")}),
                    batch_format="pyarrow",
                )
            ),
            ["node"],
        )
        .repartition(parts)
        .materialize()
    )
    if nodes.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "salsa_authority": pa.array([], pa.float64()),
                    "salsa_hub": pa.array([], pa.float64()),
                }
            )
        )

    def deg_table(key: str, name: str):
        return (
            edges.groupby(key)
            .count()
            .map_batches(
                lambda t, _k=key, _n=name: pa.table(
                    {
                        "node": t.column(_k),
                        _n: t.column("count()").cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )

    outdeg = deg_table("src", "outdeg")  # hub side
    indeg = deg_table("dst", "indeg")  # authority side
    n_auth = indeg.count()

    # uniform start over authority nodes
    auth = indeg.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "a": pa.array(np.full(len(t), 1.0 / n_auth), pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def half_step(scores, score_col, deg_tbl, deg_col, join_key, group_key, out_col):
        """Split ``score_col`` mass by ``deg_col`` and push it across
        edges joined on ``join_key``, summing per ``group_key``."""
        weighted = merge_join(
            scores, deg_tbl, "node", "node", [deg_col]
        ).map_batches(
            lambda t, _s=score_col, _d=deg_col: pa.table(
                {
                    "node": t.column("node"),
                    "w": pa.array(
                        t.column(_s).to_numpy(zero_copy_only=False)
                        / t.column(_d).to_numpy(zero_copy_only=False)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        contribs = merge_join(
            edges, weighted, left_on=join_key, right_on="node",
            right_cols=["w"], how="inner",
        )
        return (
            contribs.groupby(group_key)
            .aggregate(Sum("w", alias_name="s"))
            .map_batches(
                lambda t, _g=group_key, _o=out_col: pa.table(
                    {
                        "node": t.column(_g),
                        _o: t.column("s").cast(pa.float64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .repartition(parts)
            .materialize()
        )

    hub = None
    for _ in range(iters):
        # backward: authority mass returns to hubs over in-links
        hub = half_step(auth, "a", indeg, "indeg", "dst", "src", "h")
        # forward: hub mass spreads to authorities over out-links
        auth = half_step(hub, "h", outdeg, "outdeg", "src", "dst", "a")

    both = merge_join(
        merge_join(nodes, auth, "node", "node", ["a"], how="left"),
        hub,
        "node",
        "node",
        ["h"],
        how="left",
    )

    def finalize(t: pa.Table) -> pa.Table:
        a = np.round(
            np.nan_to_num(
                t.column("a").to_numpy(zero_copy_only=False).astype(np.float64),
                nan=0.0,
            ),
            6,
        )
        h = np.round(
            np.nan_to_num(
                t.column("h").to_numpy(zero_copy_only=False).astype(np.float64),
                nan=0.0,
            ),
            6,
        )
        return pa.table(
            {
                "host": t.column("node"),
                "salsa_authority": pa.array(a, pa.float64()),
                "salsa_hub": pa.array(h, pa.float64()),
            }
        )

    return both.map_batches(finalize, batch_format="pyarrow")


def opic_hosts(parse_ds, iters: int = 10, parts: int = 8):
    """OPIC page importance (Abiteboul, Preda & Cobena, WWW 2003,
    "Adaptive on-line page importance computation") over the host
    graph -> Dataset (host, opic), 6-decimal rounded normalized cash
    history. Parity counterpart of the reference's crawl-priority
    signals (SURVEY §2 crawl control plane); see pagerank_hosts for
    the shared edge extraction."""
    return opic_edges(
        parse_ds.map_batches(extract_host_edges_batch, batch_format="pyarrow"),
        iters=iters,
        parts=parts,
    )


def opic_edges(edge_ds, iters: int = 10, parts: int = 8):
    """Synchronous batch OPIC over a (src, dst) edge Dataset.

    Every node starts with cash 1/n and empty history. Each round,
    history += cash; a node's cash is split over outdeg+1 links — its
    real out-links plus one implicit link to the OPIC *virtual page*
    (the paper's strong-connectivity device, §3.1: the virtual page
    links to and from every page, so dangling cash and a teleport
    path both flow through it). The virtual page's cash from the
    previous round returns uniformly to all n real nodes. After
    ``iters`` rounds the importance estimate is history / total
    history over real nodes.

    Scale shape: identical to pagerank_edges — the loop-carried state
    is a bounded node-scale (node, deg, cash, hist) table repartitioned
    to ``parts`` blocks per round; each round costs ONE edge-scale
    merge_join exchange + a groupby Sum; the virtual page's mass is
    the only scalar that touches the driver per iteration."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .joins import merge_join

    edges = _distinct_sorted(edge_ds, ["src", "dst"]).repartition(parts).materialize()
    nodes = _distinct_sorted(
        edges.select_columns(["src"])
        .map_batches(
            lambda t: pa.table({"node": t.column("src")}), batch_format="pyarrow"
        )
        .union(
            edges.select_columns(["dst"]).map_batches(
                lambda t: pa.table({"node": t.column("dst")}),
                batch_format="pyarrow",
            )
        ),
        ["node"],
    )
    degrees = edges.groupby("src").count()
    node_deg = merge_join(
        nodes,
        degrees.map_batches(
            lambda t: pa.table(
                {
                    "src": t.column("src"),
                    "deg": t.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        left_on="node",
        right_on="src",
        right_cols=["deg"],
        how="left",
    ).repartition(parts).materialize()
    n = node_deg.count()
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {"host": pa.array([], pa.string()), "opic": pa.array([], pa.float64())}
            )
        )

    state = node_deg.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "deg": t.column("deg"),
                "cash": pa.array(np.full(len(t), 1.0 / n), pa.float64()),
                "hist": pa.array(np.zeros(len(t)), pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    virtual_cash = 0.0

    for _ in range(iters):
        # the virtual page's share of every node's split this round
        def to_virtual(t: pa.Table) -> pa.Table:
            cash = t.column("cash").to_numpy(zero_copy_only=False)
            deg = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
            deg = np.nan_to_num(deg, nan=0.0)
            return pa.table({"v": pa.array(cash / (deg + 1.0), pa.float64())})

        v_row = state.map_batches(to_virtual, batch_format="pyarrow").aggregate(
            Sum("v", alias_name="s")
        )
        virtual_in = float(v_row["s"] or 0.0)

        def to_weight(t: pa.Table) -> pa.Table:
            cash = t.column("cash").to_numpy(zero_copy_only=False)
            deg = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
            deg = np.nan_to_num(deg, nan=0.0)
            return pa.table(
                {
                    "node": t.column("node"),
                    "w": pa.array(cash / (deg + 1.0), pa.float64()),
                }
            )

        weights = state.map_batches(to_weight, batch_format="pyarrow")
        contribs = merge_join(
            edges, weights, left_on="src", right_on="node",
            right_cols=["w"], how="inner",
        )
        sums = contribs.groupby("dst").aggregate(Sum("w", alias_name="s"))
        joined = merge_join(
            state, sums, left_on="node", right_on="dst",
            right_cols=["s"], how="left",
        )

        def advance(t: pa.Table, _vc=virtual_cash) -> pa.Table:
            cash = t.column("cash").to_numpy(zero_copy_only=False)
            hist = t.column("hist").to_numpy(zero_copy_only=False)
            s = np.nan_to_num(
                t.column("s").to_numpy(zero_copy_only=False).astype(np.float64),
                nan=0.0,
            )
            return pa.table(
                {
                    "node": t.column("node"),
                    "deg": t.column("deg"),
                    "cash": pa.array(s + _vc / n, pa.float64()),
                    "hist": pa.array(hist + cash, pa.float64()),
                }
            )

        state = (
            joined.map_batches(advance, batch_format="pyarrow")
            .repartition(parts)
            .materialize()
        )
        virtual_cash = virtual_in

    tot_row = state.aggregate(Sum("hist", alias_name="s"))
    total = float(tot_row["s"] or 0.0)

    def finalize(t: pa.Table) -> pa.Table:
        h = t.column("hist").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "host": t.column("node"),
                "opic": pa.array(
                    np.round(h / total if total > 0 else h, 6), pa.float64()
                ),
            }
        )

    return state.map_batches(finalize, batch_format="pyarrow")
