"""Single-process oracle crawler — the golden-order reference.

Runs the exact crawl semantics of the distributed engine (same seed
list, same politeness budget, same robots rules, same dedup) in one
thread with plain dicts/sets (SURVEY §5: "run the single-process oracle
crawler → golden crawl_order table; distributed engine must match it
row-for-row and match the final URL-seen set exactly").
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..functions.canonicalize import url_fpv2
from ..functions.fingerprint import fp64
from ..sources.synth import get_universe
from ..state.robots import delay_from_fp, is_blocked, robots_rules_for_host
from .common import CrawlConfig, discover_links, log_sort_key


def dense_pagerank(edges: set, damping: float, iters: int) -> dict:
    """Dense-numpy PageRank over a (src_host, dst_host) edge set —
    the single-process twin of ``stages.pagerank.pagerank_edges`` (same
    init, dangling redistribution, damping and final 6-decimal
    rounding; reassociation differences are absorbed by the rounding,
    the bound the pagerank oracle check established). -> host -> pr."""
    nodes = sorted({h for e in edges for h in e})
    n = len(nodes)
    if n == 0:
        return {}
    idx = {h: i for i, h in enumerate(nodes)}
    src_i = np.array([idx[s] for s, _ in edges], dtype=np.int64)
    dst_i = np.array([idx[d] for _, d in edges], dtype=np.int64)
    deg = np.bincount(src_i, minlength=n).astype(np.float64)
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = pr[deg == 0].sum()
        w = np.where(deg > 0, pr / np.maximum(deg, 1.0), 0.0)
        s = np.bincount(dst_i, weights=w[src_i], minlength=n)
        pr = (1.0 - damping) / n + damping * (s + dangling / n)
    pr = np.round(pr, 6)
    return {h: float(pr[i]) for i, h in enumerate(nodes)}


@dataclass
class _Candidate:
    canon_url: str
    host: str
    host_fp: int
    url_fp: int
    depth: int
    priority: float
    discovered_epoch: int


@dataclass
class OracleResult:
    log: list[dict] = field(default_factory=list)  # FETCH_LOG rows
    seen: set = field(default_factory=set)
    epochs_run: int = 0
    frontier_left: int = 0
    # url_fp -> (payload digest64, capture ts_ms) of every 200 fetch —
    # the revisit state a later oracle recrawl consumes (mirrors the
    # engine's digests_<epoch>/ side-writes)
    digests: dict = field(default_factory=dict)


def _admit(url: str, depth: int, epoch: int, cfg: CrawlConfig) -> _Candidate | None:
    fps = url_fpv2(url)
    if fps is None:
        return None
    canon, domain_fp, url_fp, root_fp = fps
    from ..functions.canonicalize import host_from_canonical

    host = host_from_canonical(canon)
    if host is None:
        return None
    return _Candidate(
        canon_url=canon,
        host=host,
        host_fp=fp64(host),
        url_fp=url_fp,
        depth=depth,
        priority=cfg.priority_for_depth(depth),
        discovered_epoch=epoch,
    )


def oracle_crawl(
    cfg: CrawlConfig, revisit_digests: dict | None = None
) -> OracleResult:
    """``revisit_digests``: a previous oracle run's ``.digests`` map
    (url_fp -> (digest64, ts_ms)) — same semantics as the engine's
    ``cfg.revisit_from``: a 200 fetch whose payload digest matches is
    logged ``revisit_unchanged``. Overrides cfg.revisit_from (the
    oracle never reads engine checkpoints)."""
    uni = get_universe(cfg.sf, cfg.seed)
    res = OracleResult()
    frontier: list[_Candidate] = []
    pagerank_mode = getattr(cfg, "priority_kind", "depth") == "pagerank"
    edge_set: set[tuple[str, str]] = set()

    seed_list = list(uni.seed_urls())
    if getattr(cfg, "seed_source", "list") == "list+sitemap":
        # shared kernel — the engine reads the same set through the
        # real XML shards, so parity validates the XML layer too
        from ..sources.sitemap import sitemap_seed_urls

        seed_list += sitemap_seed_urls(cfg.sf, cfg.seed)
    for url in seed_list:
        c = _admit(url, 0, 0, cfg)
        if c is not None and c.url_fp not in res.seen:
            res.seen.add(c.url_fp)
            frontier.append(c)

    for epoch in range(cfg.max_epochs):
        if not frontier:
            break
        res.epochs_run = epoch + 1
        epoch_rows: list[dict] = []

        # --- pagerank frontier priority (same rule as the engine) ----
        if pagerank_mode and edge_set:
            ranks = dense_pagerank(edge_set, cfg.pr_damping, cfg.pr_iters)
            for c in frontier:
                c.priority = cfg.priority_for_depth(c.depth) + ranks.get(
                    c.host, 0.0
                )

        # --- robots ---------------------------------------------------
        allowed: list[_Candidate] = []
        for c in frontier:
            if is_blocked(c.canon_url, robots_rules_for_host(c.host)):
                epoch_rows.append(_row(epoch, c, "robots_blocked", 0))
            else:
                allowed.append(c)

        # --- per-host budget selection --------------------------------
        by_host: dict[int, list[_Candidate]] = {}
        for c in allowed:
            by_host.setdefault(c.host_fp, []).append(c)
        budget = cfg.policy.budget_for_epoch(0)
        selected: list[_Candidate] = []
        deferred: list[_Candidate] = []
        for host_fp, rows in by_host.items():
            rows.sort(key=lambda c: (-c.priority, c.url_fp))
            b = budget
            if cfg.policy.epoch_seconds is not None:
                # same Crawl-delay cap rule as the engine's robots stage
                d = delay_from_fp(host_fp)
                if d is not None:
                    b = min(b, max(1, int(cfg.policy.epoch_seconds // d)))
            selected.extend(rows[:b])
            deferred.extend(rows[b:])
        for c in deferred:
            epoch_rows.append(_row(epoch, c, "budget_deferred", 0))

        # --- fetch + discover -----------------------------------------
        discovered: dict[int, _Candidate] = {}
        snapshot = getattr(cfg, "snapshot", 0)
        for c in selected:
            rec = uni.synth_page(c.canon_url, snapshot)
            status = 200 if rec is not None else 404
            action = "fetched"
            if rec is not None:
                from ..sources.warc import payload_digest64

                d64 = payload_digest64(rec)
                if revisit_digests is not None:
                    prev = revisit_digests.get(c.url_fp)
                    if prev is not None and prev[0] == d64:
                        action = "revisit_unchanged"
                res.digests[c.url_fp] = (d64, epoch * 1000)
            epoch_rows.append(_row(epoch, c, action, status))
            if rec is None:
                continue
            for link in discover_links(c.canon_url, rec):
                nc = _admit(link, c.depth + 1, epoch + 1, cfg)
                if nc is None:
                    continue
                if pagerank_mode and nc.host != c.host:
                    edge_set.add((c.host, nc.host))
                prev = discovered.get(nc.url_fp)
                if prev is None or (nc.depth, nc.host_fp) < (prev.depth, prev.host_fp):
                    discovered[nc.url_fp] = nc

        # --- seen check ----------------------------------------------
        new_frontier: list[_Candidate] = list(deferred)
        for url_fp in discovered:
            nc = discovered[url_fp]
            if url_fp in res.seen:
                if cfg.log_dups:
                    epoch_rows.append(_row(epoch, nc, "dup_skipped", 0))
            else:
                res.seen.add(url_fp)
                new_frontier.append(nc)

        # --- deterministic sequencing ---------------------------------
        epoch_rows.sort(
            key=lambda r: log_sort_key(r["action"], r["priority"], r["host_fp"], r["url_fp"])
        )
        for seq, r in enumerate(epoch_rows):
            r["seq"] = seq
        res.log.extend(epoch_rows)
        frontier = new_frontier

    res.frontier_left = len(frontier)
    return res


def _row(epoch: int, c: _Candidate, action: str, status: int) -> dict:
    return {
        "epoch": epoch,
        "seq": -1,
        "url_fp": c.url_fp,
        "host_fp": c.host_fp,
        "canon_url": c.canon_url,
        "action": action,
        "http_status": status,
        "priority": c.priority,
        "depth": c.depth,
    }
