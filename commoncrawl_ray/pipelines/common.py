"""Shared crawl semantics: config, ordering keys, link discovery.

The determinism contract (SURVEY §7 hard-parts 3): ALL ordering is by
explicit sort keys, never task-completion order.

- selection within a host: (priority desc, url_fp asc);
- global sequence within an epoch:
  (action_rank, priority desc, host_fp, url_fp) with
  action_rank = fetched:0, robots_blocked:1, budget_deferred:2,
  dup_skipped:3;
- intra-epoch duplicate discoveries reduce to min (depth, host_fp,
  url_fp) — i.e. the shallowest discovery wins, deterministically.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..state.politeness import PolitenessPolicy

ACTION_RANK = {
    "fetched": 0,
    "revisit_unchanged": 1,  # recrawl: payload digest matched the previous snapshot
    "robots_blocked": 2,
    "budget_deferred": 3,
    "dup_skipped": 4,
}


@dataclass(frozen=True)
class CrawlConfig:
    sf: float = 0.001
    seed: int = 42
    max_epochs: int = 4
    num_seen_partitions: int = 8
    policy: PolitenessPolicy = field(default_factory=PolitenessPolicy)
    log_dups: bool = True
    priority_decay: str = "inverse_depth"  # priority = 1/(depth+1)
    # URL-seen fast-path filter: "bloom" (default) or "cuckoo"
    # (deletable; state/cuckoo.py). The exact per-partition set stays
    # authoritative either way, so this cannot change crawl parity.
    seen_filter_kind: str = "bloom"
    # fetch backend: "sim" (synthetic web, pure function of the URL) or
    # "http" (real sockets via stages/fetch_http.AsyncHttpFetcher; the
    # record row contract is identical, so everything downstream —
    # parse, link discovery, logging — is shared). http_opts are the
    # AsyncHttpFetcher kwargs (timeouts, dns_override, max_in_flight).
    fetch_kind: str = "sim"
    http_opts: dict | None = None
    # robots backend: "sim" (rules are a pure function of the host
    # fingerprint — the deterministic sandbox model) or "http" (fetch
    # /robots.txt per host through the same AsyncHttpFetcher and parse
    # it per RFC 9309 — state/robots.parse_robots_txt). The cache/TTL/
    # host_fp-partitioned actor pool is shared by both.
    robots_kind: str = "sim"
    # frontier priority: "depth" (priority = 1/(depth+1)) or "pagerank"
    # (priority = 1/(depth+1) + PR(host), where PR is PageRank over the
    # host edges accumulated from all PRIOR epochs' fetches, rounded to
    # 6 decimals — epoch-k ranks feed epoch k+1 selection). Both the
    # distributed engine (stages/pagerank.pagerank_edges) and the
    # single-process oracle (dense numpy) compute the same iteration;
    # the 6-decimal rounding is the established reassociation bound, so
    # the priority floats — and hence crawl order — match exactly.
    priority_kind: str = "depth"
    pr_damping: float = 0.85
    pr_iters: int = 4
    # fetched-page archiving: None (off) or "warc" — every epoch
    # side-writes its 200-status fetches as gzip-member-per-record
    # .warc.gz under <ckpt>/archive_<epoch>/ (sources/warc.py), one
    # file per fetch batch, content-hash named so a retried task
    # rewrites the identical file (the _side_write idempotency rule).
    # WARC-Date is the deterministic epoch clock (epoch seconds), never
    # the wall clock — resume/retry parity demands it.
    archive_format: str | None = None
    # frontier seeding: "list" (the universe's anchor seed list) or
    # "list+sitemap" (additionally ingest the sitemap-published URL
    # slice — the hosts the anchor list misses. The engine reads the
    # seeds THROUGH the real XML shard files, sources/sitemap.py; the
    # oracle crawler derives the same set from the shared kernel, so
    # crawl parity also validates the XML path end to end).
    seed_source: str = "list"
    # incremental recrawl: ``snapshot`` selects the synthetic web's
    # content version under the deterministic churn model
    # (sources/synth.Universe.content_version; 0 = the original
    # universe). ``revisit_from`` points at a PREVIOUS crawl's
    # checkpoint dir; its (url_fp, digest64, ts_ms) side-writes load
    # into a fp-range-partitioned DigestStorePool (state/digests.py)
    # and every 200-fetch whose payload digest matches the previous
    # capture is logged as ``revisit_unchanged`` and archived as a
    # WARC revisit record (WARC 1.0 §6.7.2) instead of re-storing the
    # payload bytes — the monthly-snapshot dedup real archives run.
    snapshot: int = 0
    revisit_from: str | None = None

    def priority_for_depth(self, depth: int) -> float:
        return 1.0 / (depth + 1)


def log_sort_key(action: str, priority: float, host_fp: int, url_fp: int):
    return (ACTION_RANK[action], -priority, host_fp, url_fp)


def discover_links(canon_url: str, record: bytes) -> list[str]:
    """Extract + resolve out-links of a fetched record (absolute URLs,
    pre-canonicalization)."""
    from ..stages.links import resolve_links
    from ..stages.parse_extract import extract_record

    r = extract_record(canon_url, record)
    return resolve_links(canon_url, r["links"], r["base"])
