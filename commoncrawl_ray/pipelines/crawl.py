"""Distributed crawl engine — the Ray-Data epoch loop.

Each epoch is a bounded batch (SURVEY §2.9): select → robots → fetch →
extract → discover → merge, expressed as ONE streaming Ray Data job
plus a small distributed log-sort job — fixed job/shuffle overhead is
what caps scaling efficiency on short epochs, so everything else is
fused into the epoch pipeline:

read frontier (block count sized to data) →
robots ``map_batches`` (consulting the ``RobotsCacheActor`` pool, J6;
vectorized host hashing) →
**skew combiner** (per-block per-host top-budget trim: trimmed rows
are provably deferred globally and leave as side-written frontier/log
parts — host shuffle volume is bounded at budget×blocks per host, the
north rule's mega-host salting, strengthened) →
``sort(host_fp)`` range shuffle (whole host groups per block — the
per-host priority queue realized as a shuffle) →
vectorized per-block politeness selection (cumsum ranks, no per-group
Python; deferred rows side-written) →
``repartition`` (rebalance the uneven selected set before the heavy
stage) →
fused fetch+discover (simulated fetch — the synthetic web is a pure
function of the URL; a real deployment swaps in an async-HTTP client
with the same row contract — 'fetched' log side-writes, then link
explode+canonicalize+fingerprint with in-batch combining) →
``sort(url_fp)`` range shuffle + first-of-run dedup (min depth wins;
equal fps co-located) →
URL-seen anti-join against the range-routed ``UrlSeenActor`` pool
(partitioned bloom + exact set, J5/T5; a sorted block spans a
contiguous fp range so each batch touches ~P/num_blocks actors) →
side-write newly-admitted frontier rows + dup-skipped log rows.

The epoch log is then sorted by a small distributed job on
(action_rank, priority desc, host_fp, url_fp); ``seq`` is implied by
(file order, row order) of the sorted output and materialized lazily
on read — no driver-side row processing anywhere (a driver pandas sort
was the serial Amdahl fraction at high parallelism). Per-action
counters come from writer sidecar jsons.

Side-output files are named by a content hash of their rows, so a
retried task rewrites the identical file under the same name
(tmp+rename): retries are idempotent, and a crashed epoch's partial
dirs are deleted on restart (the manifest, written LAST, is the only
completeness marker — mirroring the attempt-dir→rename pattern of
query/Query.java:246-260).

Determinism: all ordering via explicit sort keys (pipelines.common);
log sort keys are unique per row (a url_fp appears at most once per
action per epoch), so the distributed sort yields one total order.
State between epochs lives ONLY in parquet checkpoints + the
seen-actor pool, so a killed run resumes from the last complete
manifest with an identical frontier.

Scale notes (10^10 frontier): the frontier and logs stream through
parquet each epoch; nothing is driver-materialized except per-epoch
counter sums (tiny sidecars) and the bounded seed/result tables.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.fingerprint import fp64, fp64_batch
from ..schemas import FETCH_LOG, arrow_out
from ..state.robots import RobotsCachePool, is_blocked
from ..state.url_seen import ROUTING_SCHEME as _ROUTING_SCHEME
from ..state.url_seen import UrlSeenPool
from .common import ACTION_RANK, CrawlConfig

_LOG_COLS = [f.name for f in FETCH_LOG]


# --------------------------------------------------------------------
# batch kernels
# --------------------------------------------------------------------


def make_robots_fn(
    robots_actors,
    epoch: int,
    policy=None,
    base_budget: int | None = None,
    robots_kind: str = "sim",
):
    """Adds 'blocked' via the robots cache pool. Stateless task fn (the
    durable cache state lives in the shared actor pool, not the stage):
    task-pool workers are reused across epochs, so there is no per-epoch
    actor-spawn cost. Hosts are deduped per batch before the fan-out, so
    each batch costs one round-trip per touched pool partition.

    When ``policy.epoch_seconds`` is set, also appends ``host_budget``
    (int64): the politeness budget capped by each host's declared
    Crawl-delay — from the parsed RFC 9309 rules object in http mode,
    from the deterministic fp model (state/robots.delays_from_fps) in
    sim mode. Downstream (combine + select) enforce it per host."""
    num_actors = len(robots_actors)
    delays_on = policy is not None and policy.epoch_seconds is not None

    def robots_check(batch: pa.Table) -> pa.Table:
        hosts = batch.column("host").to_pylist()
        n = len(hosts)
        missing = sorted(set(hosts))
        host_fps = fp64_batch(missing)  # vectorized Rabin (NOT per-char Python)
        parts = host_fps.view(np.uint64) % np.uint64(num_actors)
        refs, groups = [], []
        for a in range(num_actors):
            sel = [missing[i] for i in np.nonzero(parts == a)[0]]
            if sel:
                refs.append(robots_actors[a].rules_for.remote(sel, epoch))
                groups.append(sel)
        # only hosts WITH rules need the per-URL path check — the vast
        # majority of hosts have an empty rule set and short-circuit
        hosts_with_rules: dict[str, tuple] = {}
        host_delay: dict[str, float] = {}
        for sel, rules_list in zip(groups, ray.get(refs)):
            for h, rules in zip(sel, rules_list):
                if rules:  # sim: non-empty prefix tuple; http: RobotsRules.__bool__
                    hosts_with_rules[h] = (
                        tuple(rules) if isinstance(rules, (list, tuple)) else rules
                    )
                if delays_on and robots_kind == "http":
                    cd = getattr(rules, "crawl_delay", None)
                    if cd is not None:
                        host_delay[h] = cd
        blocked = np.zeros(n, dtype=bool)
        if hosts_with_rules:
            urls = batch.column("canon_url").to_pylist()
            for i, (u, h) in enumerate(zip(urls, hosts)):
                r = hosts_with_rules.get(h)
                if r is not None:
                    blocked[i] = is_blocked(u, r)
        batch = batch.append_column("blocked", pa.array(blocked))
        if delays_on:
            from ..state.robots import delays_from_fps

            if robots_kind == "http":
                uniq_delays = np.array(
                    [host_delay.get(h, np.nan) for h in missing], np.float64
                )
            else:
                uniq_delays = delays_from_fps(host_fps)
            uniq_budget = policy.host_budgets(base_budget, uniq_delays)
            lut = dict(zip(missing, uniq_budget.tolist()))
            per_row = np.fromiter(
                (lut[h] for h in hosts), dtype=np.int64, count=n
            )
            batch = batch.append_column("host_budget", pa.array(per_row))
        return batch

    return robots_check


def make_combine_fn(budget: int, epoch: int, raw_log_dir: str, next_frontier_dir: str):
    """Pre-shuffle skew combiner (the engine's answer to the north
    rule's mega-host salting): within each INPUT block, rows that are
    not in their host's per-block top-``budget`` (priority desc,
    url_fp) provably cannot be in the host's global top-``budget``
    either (global top-B ⊆ union of per-block top-Bs), so they are
    deferred AT SOURCE — side-written as next-epoch frontier rows +
    'budget_deferred' log rows — and robots-blocked rows are logged and
    dropped here too. The sort(host_fp) exchange then moves at most
    budget × num_blocks rows per host no matter how skewed the
    frontier is: a 10^7-URL mega-host costs the shuffle the same as a
    small host. Selection downstream stays EXACT (same fetched set,
    same deferred set, same log).

    With Crawl-delay honoring on, the robots stage attached a per-row
    ``host_budget`` (<= the scalar budget); the per-block trim uses it
    instead — the containment argument (global top-B_h ⊆ union of
    per-block top-B_h) holds per host for any per-host B_h."""

    def run(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.drop(columns=["blocked"])
        blocked_df = df[df["blocked"]]
        if len(blocked_df):
            _side_write(
                _log_table(epoch, blocked_df, None, "robots_blocked"),
                raw_log_dir,
                "b",
            )
        df = (
            df[~df["blocked"]]
            .drop(columns=["blocked"])
            .sort_values(
                ["host_fp", "priority", "url_fp"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .reset_index(drop=True)
        )
        if len(df) == 0:
            return df
        host = df["host_fp"].to_numpy()
        n = len(df)
        starts = np.r_[0, np.flatnonzero(host[1:] != host[:-1]) + 1]
        counts = np.diff(np.r_[starts, n])
        rank = np.arange(n) - np.repeat(starts, counts)
        eff = (
            df["host_budget"].to_numpy()
            if "host_budget" in df.columns
            else budget
        )
        keep = rank < eff
        deferred = df[~keep]
        if len(deferred):
            _side_write(_log_table(epoch, deferred, None, "budget_deferred"), raw_log_dir, "bd")
            _side_write(_frontier_table(deferred), next_frontier_dir, "cdef")
        return df[keep]

    return run


def _frontier_table(df: pd.DataFrame) -> pa.Table:
    return pa.table(
        {
            "canon_url": pa.array(df["canon_url"].tolist(), pa.string()),
            "host": pa.array(df["host"].tolist(), pa.string()),
            "host_fp": pa.array(df["host_fp"].to_numpy(), pa.int64()),
            "domain_fp": pa.array(df["domain_fp"].to_numpy(), pa.int64()),
            "url_fp": pa.array(df["url_fp"].to_numpy(), pa.int64()),
            "root_domain_fp": pa.array(df["root_domain_fp"].to_numpy(), pa.int64()),
            "depth": pa.array(df["depth"].to_numpy().astype(np.int32), pa.int32()),
            "priority": pa.array(df["priority"].to_numpy(), pa.float64()),
            "discovered_epoch": pa.array(
                df["discovered_epoch"].to_numpy().astype(np.int32), pa.int32()
            ),
        }
    )


def _archive_warc(
    archive_dir: str, epoch: int, urls: list, recs: list, prev_ts=None
) -> None:
    """Idempotent WARC side-archive of one fetch batch's 200-status
    records (the production 'keep what you crawled' sink): the file
    name is a content hash of (epoch, fetched urls), so a RETRIED task
    rewrites the identical file (the _side_write rule). WARC-Date uses
    the deterministic epoch clock — epoch seconds since epoch 0 —
    never the wall clock, so resumed and fresh runs produce identical
    archives. ``prev_ts[i]`` non-None marks a recrawl capture whose
    payload already sits in the previous snapshot's archive at that
    ts — written as a WARC revisit record (headers only) instead of
    re-storing the payload."""
    import hashlib

    from ..sources.warc import write_warc_file_mixed

    if prev_ts is None:
        prev_ts = [None] * len(urls)
    fetched = [
        (u, r, pt) for u, r, pt in zip(urls, recs, prev_ts) if r is not None
    ]
    if not fetched:
        return
    os.makedirs(archive_dir, exist_ok=True)
    h = hashlib.blake2b(digest_size=12)
    h.update(str(epoch).encode())
    for u, _, _ in fetched:
        h.update(u.encode())
    name = f"a{h.hexdigest()}.warc.gz"
    tmp = os.path.join(archive_dir, f".{name}.tmp{os.getpid()}")
    with open(tmp, "wb") as f:
        write_warc_file_mixed(
            f, name, ((u, epoch * 1000, r, pt) for u, r, pt in fetched)
        )
    os.replace(tmp, os.path.join(archive_dir, name))


def _side_write(table: pa.Table, directory: str, prefix: str) -> None:
    """Idempotent side-output write from inside a map task: the file
    name is a content hash of the rows, so a RETRIED task rewrites the
    identical file under the same name (tmp+rename = atomic). Partial
    dirs from a crashed epoch are deleted on restart; the epoch
    manifest (written last) is the only completeness marker.

    Log tables (any table with an 'action' column) also get a
    ``<name>.counts.json`` sidecar with per-action row counts, so the
    driver can build epoch counters by summing tiny jsons instead of
    scanning log rows."""
    if table.num_rows == 0:
        return
    import hashlib

    import pyarrow.parquet as pq

    h = hashlib.blake2b(digest_size=12)
    h.update(str(table.num_rows).encode())
    for col in ("url_fp", "action", "src", "dst"):
        if col in table.column_names:
            chunk = table.column(col)
            h.update(str(chunk.to_pylist()[:64]).encode())
            if col == "url_fp":
                h.update(chunk.cast(pa.int64()).to_numpy(zero_copy_only=False).tobytes())
            elif col in ("src", "dst"):
                # host-edge tables carry neither url_fp nor action; a
                # rows-only hash would collide across same-sized batches
                h.update("\x00".join(chunk.to_pylist()).encode())
    name = f"{prefix}-{h.hexdigest()}.parquet"
    os.makedirs(directory, exist_ok=True)
    tmp = os.path.join(directory, f".{name}.tmp{os.getpid()}")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(directory, name))
    if "action" in table.column_names:
        import collections
        import json as _json

        counts = collections.Counter(table.column("action").to_pylist())
        ctmp = os.path.join(directory, f".{name}.counts.tmp{os.getpid()}")
        with open(ctmp, "w") as f:
            _json.dump(dict(counts), f)
        os.replace(ctmp, os.path.join(directory, f"{name}.counts.json"))


def _log_table(epoch: int, df: pd.DataFrame, action_mask, action: str, status=None) -> pa.Table:
    sel = df[action_mask] if action_mask is not None else df
    n = len(sel)
    return pa.table(
        {
            "epoch": pa.array(np.full(n, epoch, dtype=np.int32)),
            "seq": pa.array(np.full(n, -1, dtype=np.int64)),
            "url_fp": pa.array(sel["url_fp"].to_numpy(), pa.int64()),
            "host_fp": pa.array(sel["host_fp"].to_numpy(), pa.int64()),
            "canon_url": pa.array(sel["canon_url"].tolist(), pa.string()),
            "action": pa.array([action] * n, pa.string()),
            "http_status": pa.array(
                status if status is not None else np.zeros(n, dtype=np.int16), pa.int16()
            ),
            "priority": pa.array(sel["priority"].to_numpy(), pa.float64()),
            "depth": pa.array(sel["depth"].to_numpy().astype(np.int32), pa.int32()),
        }
    )


def make_select_fn(budget: int, epoch: int, raw_log_dir: str, next_frontier_dir: str):
    """Per-block politeness selection after the sort(host_fp) shuffle
    (vectorized across ALL hosts in the block — range partitioning puts
    every row of a host in one block). Side-writes deferred log +
    frontier rows; returns the selected rows (light columns only) for
    the fetch stage. Fetch is deliberately NOT fused here: selected
    rows per sort block are uneven (Zipf hosts), so the caller
    rebalances them with a cheap ``repartition`` before the heavy
    fetch+discover pass."""

    def run(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["canon_url", "url_fp", "host_fp", "priority", "depth"]
        if len(df) == 0:
            return df[cols]
        df = df.sort_values(
            ["host_fp", "priority", "url_fp"],
            ascending=[True, False, True],
            kind="mergesort",
        ).reset_index(drop=True)
        host = df["host_fp"].to_numpy()
        n = len(df)
        starts = np.r_[0, np.flatnonzero(host[1:] != host[:-1]) + 1]
        counts = np.diff(np.r_[starts, n])
        rank = np.arange(n) - np.repeat(starts, counts)
        # per-host Crawl-delay cap when the robots stage attached one
        eff = (
            df["host_budget"].to_numpy()
            if "host_budget" in df.columns
            else budget
        )
        deferred = df[rank >= eff]
        if len(deferred):
            _side_write(_log_table(epoch, deferred, None, "budget_deferred"), raw_log_dir, "a")
            _side_write(_frontier_table(deferred), next_frontier_dir, "def")
        return df[rank < eff][cols]

    return run


def make_fetch_discover_fn(
    epoch: int,
    sf: float,
    seed: int,
    raw_log_dir: str,
    fetch_kind: str = "sim",
    http_opts: dict | None = None,
    edges_dir: str | None = None,
    archive_dir: str | None = None,
    snapshot: int = 0,
    digests_dir: str | None = None,
    revisit_pool=None,
):
    """Fused fetch + parse + link-explosion over REBALANCED blocks of
    selected rows: fetch (simulated synthetic web, or real sockets via
    stages/fetch_http when ``fetch_kind="http"`` — same record row
    contract either way), 'fetched' log side-write (the only stage
    that knows http_status), then link canonicalize+fingerprint
    straight into candidate rows (in-batch combiner semantics of
    :func:`candidates_batch`).

    The Universe / the AsyncHttpFetcher are cheap read-only structures
    cached per worker process (``get_universe`` lru_cache /
    ``get_fetcher`` — SURVEY §2.3 T1 pattern); task-pool workers reuse
    them across batches AND epochs.

    Incremental-recrawl hooks: ``digests_dir`` side-writes every
    200-fetch's slim (url_fp, digest64, ts_ms) row (the next crawl's
    revisit state); ``revisit_pool`` (state/digests.DigestStorePool,
    loaded from the PREVIOUS crawl's digest side-writes) turns fetches
    whose payload digest matches the previous capture into
    ``revisit_unchanged`` log rows + WARC revisit records — link
    discovery is unaffected (revisit dedups the ARCHIVE, not the
    frontier)."""

    def run(batch: pa.Table) -> pa.Table:
        from ..sources.synth import get_universe
        from .common import discover_links

        n = batch.num_rows
        if n == 0:
            return candidates_batch(
                pa.table(
                    {
                        "depth": pa.array([], pa.int32()),
                        "links": pa.array([], pa.list_(pa.string())),
                    }
                )
            )
        urls = batch.column("canon_url").to_pylist()
        status = np.zeros(n, dtype=np.int16)
        links_col: list[list[str]] = []
        recs: list[bytes | None] = []
        if fetch_kind == "http":
            from ..stages.fetch_http import get_fetcher

            results = get_fetcher(http_opts).fetch_many(urls)
            for i, (u, (st, rec)) in enumerate(zip(urls, results)):
                status[i] = st
                ok = st == 200 and rec
                recs.append(rec if ok else None)
                links_col.append(discover_links(u, rec) if ok else [])
        else:
            uni = get_universe(sf, seed)
            for i, u in enumerate(urls):
                rec = uni.synth_page(u, snapshot)
                recs.append(rec)
                if rec is None:
                    status[i] = 404
                    links_col.append([])
                else:
                    status[i] = 200
                    links_col.append(discover_links(u, rec))
        # --- recrawl digests + revisit detection ----------------------
        prev_ts: list[int | None] = [None] * n
        if digests_dir is not None or revisit_pool is not None:
            from ..sources.warc import payload_digest64

            dig64 = np.zeros(n, dtype=np.int64)
            ok_idx = [i for i, r in enumerate(recs) if r is not None]
            for i in ok_idx:
                dig64[i] = payload_digest64(recs[i])
            fps_all = batch.column("url_fp").to_numpy(zero_copy_only=False)
            if revisit_pool is not None and ok_idx:
                sel = np.array(ok_idx, dtype=np.int64)
                prev, prev_t = revisit_pool.lookup(fps_all[sel])
                same = (prev != 0) & (prev == dig64[sel])
                for j, i in enumerate(sel.tolist()):
                    if same[j]:
                        prev_ts[i] = int(prev_t[j])
            if digests_dir is not None and ok_idx:
                sel = np.array(ok_idx, dtype=np.int64)
                _side_write(
                    pa.table(
                        {
                            "url_fp": pa.array(fps_all[sel], pa.int64()),
                            "digest64": pa.array(dig64[sel], pa.int64()),
                            "ts_ms": pa.array(
                                np.full(len(sel), epoch * 1000, np.int64)
                            ),
                        }
                    ),
                    digests_dir,
                    "dg",
                )
        if archive_dir is not None:
            _archive_warc(archive_dir, epoch, urls, recs, prev_ts)
        df = batch.to_pandas()
        if revisit_pool is not None:
            revisit_mask = np.array([t is not None for t in prev_ts], bool)
            if revisit_mask.any():
                _side_write(
                    _log_table(
                        epoch,
                        df,
                        revisit_mask,
                        "revisit_unchanged",
                        status[revisit_mask],
                    ),
                    raw_log_dir,
                    "rv",
                )
            if (~revisit_mask).any():
                _side_write(
                    _log_table(
                        epoch, df, ~revisit_mask, "fetched", status[~revisit_mask]
                    ),
                    raw_log_dir,
                    "f",
                )
        else:
            _side_write(
                _log_table(epoch, df, np.ones(n, dtype=bool), "fetched", status),
                raw_log_dir,
                "f",
            )
        if edges_dir is not None:
            # host-edge side-write for pagerank frontier priority:
            # (fetched page's host -> host of each canonicalizable
            # out-link), per-page distinct, self-loops dropped — same
            # projection as stages/pagerank.extract_host_edges_batch,
            # built from the crawl's own link discovery (memoized
            # canonicalization shared with candidates_batch below).
            # Duplicates across retries/epochs are fine: pagerank_edges
            # runs a global distinct first.
            from ..functions.canonicalize import host_from_canonical

            e_src: list[str] = []
            e_dst: list[str] = []
            for u, links in zip(urls, links_col):
                if not links:
                    continue
                src_h = host_from_canonical(u)
                if src_h is None:
                    continue
                seen_d: set[str] = set()
                for link in links:
                    hit = _canon_memo_lookup(link)
                    if hit == ():
                        continue
                    h = hit[1]
                    if h != src_h and h not in seen_d:
                        seen_d.add(h)
                        e_src.append(src_h)
                        e_dst.append(h)
            if e_src:
                _side_write(
                    pa.table(
                        {
                            "src": pa.array(e_src, pa.string()),
                            "dst": pa.array(e_dst, pa.string()),
                        }
                    ),
                    edges_dir,
                    "e",
                )
        return candidates_batch(
            pa.table(
                {
                    "depth": pa.array(df["depth"].to_numpy().astype(np.int32), pa.int32()),
                    "links": pa.array(links_col, pa.list_(pa.string())),
                }
            )
        )

    return run


def make_discover_writer_fn(
    epoch: int, raw_log_dir: str, next_frontier_dir: str, log_dups: bool
):
    """Final per-block pass of the discovery job: split on the URL-seen
    verdict, side-write newly-admitted frontier rows (priority =
    1/(depth+1), discovered next epoch) and dup-skipped log rows;
    return per-block admit/dup counts only."""

    def run(batch: pa.Table) -> pa.Table:
        is_new = batch.column("is_new").to_numpy(zero_copy_only=False)
        new_t = batch.filter(pa.array(is_new))
        dup_t = batch.filter(pa.array(~is_new))
        if new_t.num_rows:
            depth = new_t.column("depth").to_numpy().astype(np.int32)
            _side_write(
                pa.table(
                    {
                        "canon_url": new_t.column("canon_url"),
                        "host": new_t.column("host"),
                        "host_fp": new_t.column("host_fp"),
                        "domain_fp": new_t.column("domain_fp"),
                        "url_fp": new_t.column("url_fp"),
                        "root_domain_fp": new_t.column("root_domain_fp"),
                        "depth": pa.array(depth, pa.int32()),
                        "priority": pa.array(1.0 / (depth + 1.0), pa.float64()),
                        "discovered_epoch": pa.array(
                            np.full(new_t.num_rows, epoch + 1, dtype=np.int32), pa.int32()
                        ),
                    }
                ),
                next_frontier_dir,
                "new",
            )
        if log_dups and dup_t.num_rows:
            ddepth = dup_t.column("depth").to_numpy().astype(np.int32)
            n = dup_t.num_rows
            _side_write(
                pa.table(
                    {
                        "epoch": pa.array(np.full(n, epoch, dtype=np.int32)),
                        "seq": pa.array(np.full(n, -1, dtype=np.int64)),
                        "url_fp": dup_t.column("url_fp"),
                        "host_fp": dup_t.column("host_fp"),
                        "canon_url": dup_t.column("canon_url"),
                        "action": pa.array(["dup_skipped"] * n, pa.string()),
                        "http_status": pa.array(np.zeros(n, dtype=np.int16), pa.int16()),
                        "priority": pa.array(1.0 / (ddepth + 1.0), pa.float64()),
                        "depth": pa.array(ddepth, pa.int32()),
                    }
                ),
                raw_log_dir,
                "c",
            )
        return pa.table(
            {
                "admitted": pa.array([new_t.num_rows], pa.int64()),
                "dups": pa.array([dup_t.num_rows], pa.int64()),
            }
        )

    return run


_CANON_MEMO: dict[str, tuple] = {}
_CANON_MEMO_CAP = 500_000


def _canon_memo_lookup(u: str) -> tuple:
    """Memoized canonicalize+fingerprint of one raw link -> (canon,
    host, url_fp, domain_fp, root_domain_fp), or () for a link that
    doesn't canonicalize. Shared by candidate building and host-edge
    extraction so the parity kernel runs once per distinct link per
    worker process."""
    from ..functions.canonicalize import host_from_canonical, url_fpv2

    hit = _CANON_MEMO.get(u)
    if hit is not None:
        return hit
    if len(_CANON_MEMO) > _CANON_MEMO_CAP:
        _CANON_MEMO.clear()
    fps = url_fpv2(u)
    if fps is None:
        _CANON_MEMO[u] = ()
        return ()
    c, dfp, ufp, rfp = fps
    h = host_from_canonical(c)
    if h is None:
        _CANON_MEMO[u] = ()
        return ()
    hit = (c, h, ufp, dfp, rfp)
    _CANON_MEMO[u] = hit
    return hit


def candidates_batch(batch: pa.Table) -> pa.Table:
    """Explode links -> canonicalize+fingerprint candidate rows.

    Combiner semantics: within the batch, duplicate URLs reduce to
    their min depth BEFORE the cross-batch shuffle (partial aggregation
    ahead of the groupby — SURVEY §2.5 A4 / ray_guide pre-aggregate
    pattern). Canonicalization results are memoized in a bounded
    per-worker-process dict (nav links repeat across pages and
    batches; canonicalize+FP64 is the parity kernel and the costliest
    per-link step)."""
    parent_depth = batch.column("depth").to_pylist()
    links_lists = batch.column("links").to_pylist()
    best: dict[int, tuple] = {}  # url_fp -> (depth, canon, host, dfp, rfp)
    for d0, links in zip(parent_depth, links_lists):
        d = d0 + 1
        for u in links:
            hit = _canon_memo_lookup(u)
            if hit == ():
                continue
            c, h, ufp, dfp, rfp = hit
            prev = best.get(ufp)
            if prev is None or d < prev[0]:
                best[ufp] = (d, c, h, dfp, rfp)
    url_fp = list(best.keys())
    vals = list(best.values())
    hosts = [v[2] for v in vals]
    host_fps = fp64_batch(hosts)
    return pa.table(
        {
            "canon_url": pa.array([v[1] for v in vals], pa.string()),
            "host": pa.array(hosts, pa.string()),
            "host_fp": pa.array(host_fps),
            "domain_fp": pa.array([v[3] for v in vals], pa.int64()),
            "url_fp": pa.array(url_fp, pa.int64()),
            "root_domain_fp": pa.array([v[4] for v in vals], pa.int64()),
            "depth": pa.array([v[0] for v in vals], pa.int32()),
        }
    )


def dedup_candidates(candidates):
    """Intra-epoch duplicate discoveries: shallowest wins (common.py).

    ``sort(url_fp)`` range shuffle + a vectorized first-of-run pass per
    block (equal fps are co-located by range partitioning; every column
    except ``depth`` is a pure function of ``url_fp``, so keeping the
    min-depth row of each run IS the min-reduce). Chosen over a hash
    aggregate because the output blocks then hold CONTIGUOUS fp ranges,
    co-partitioned with the range-routed URL-seen pool — the downstream
    anti-join touches ~P/num_blocks actors per batch instead of all P.
    """

    def first_of_run(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values(["url_fp", "depth"], kind="mergesort").reset_index(drop=True)
        fp = df["url_fp"].to_numpy()
        keep = np.r_[True, fp[1:] != fp[:-1]]
        return df[keep]

    return candidates.sort("url_fp").map_batches(
        arrow_out(first_of_run), batch_format="pandas", batch_size=None
    )


def make_seen_fn(seen_actors, num_partitions: int):
    """URL-seen anti-join: routes url_fps to the UrlSeenActor pool;
    marks newly-admitted rows. Stateless task fn — the seen state lives
    in the partitioned actor pool (J5/T5). Routing is the RANGE scheme
    of ``state.url_seen.partition_of``, co-partitioned with the
    discovery job's ``sort(url_fp)`` shuffle: each sorted block spans a
    contiguous fp range, so a batch touches ~P/num_blocks partitions —
    the fan-out stays constant as the pool scales out."""
    from ..state.url_seen import partition_of

    def seen_check(batch: pa.Table) -> pa.Table:
        fps = batch.column("url_fp").to_numpy()
        parts = partition_of(fps, num_partitions)
        new_mask = np.zeros(len(fps), dtype=bool)
        refs, idxs = [], []
        for p in np.unique(parts):
            sel = np.nonzero(parts == p)[0]
            refs.append(seen_actors[int(p)].check_and_add.remote(fps[sel]))
            idxs.append(sel)
        for sel, res in zip(idxs, ray.get(refs)):
            new_mask[sel] = res
        return batch.append_column("is_new", pa.array(new_mask))

    return seen_check


# --------------------------------------------------------------------
# checkpoint helpers
# --------------------------------------------------------------------


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def _manifest_path(ckpt: str, epoch: int) -> str:
    return os.path.join(ckpt, f"manifest_{epoch}.json")


def latest_complete_epoch(ckpt: str) -> int | None:
    """Largest e with manifest_e.json present, or None."""
    best = None
    if not os.path.isdir(ckpt):
        return None
    for name in os.listdir(ckpt):
        if name.startswith("manifest_") and name.endswith(".json"):
            try:
                e = int(name[len("manifest_") : -len(".json")])
            except ValueError:
                continue
            best = e if best is None else max(best, e)
    return best


# --------------------------------------------------------------------
# the engine
# --------------------------------------------------------------------


@dataclass
class CrawlRunResult:
    ckpt_dir: str
    epochs_run: int = 0
    counters: list[dict] = field(default_factory=list)
    seen_total: int = 0
    frontier_left: int = 0

    def archive_paths(self) -> list:
        """All .warc.gz files the run archived (archive_format='warc'),
        sorted — feed them to sources/warc.read_warc_pages."""
        out = []
        for d in sorted(os.listdir(self.ckpt_dir)):
            if d.startswith("archive_"):
                full = os.path.join(self.ckpt_dir, d)
                out.extend(
                    os.path.join(full, f)
                    for f in sorted(os.listdir(full))
                    if f.endswith(".warc.gz")
                )
        return out

    def log_table(self) -> pa.Table:
        """Global crawl log in (epoch, seq) order. Log files are
        written pre-sorted by the per-epoch distributed sort, and
        lexicographic filename order == global sort order within an
        epoch, so ``seq`` is materialized here as the row offset."""
        import pyarrow.parquet as pq

        dirs = sorted(
            (
                int(d[len("fetch_log_") :]),
                os.path.join(self.ckpt_dir, d),
            )
            for d in os.listdir(self.ckpt_dir)
            if d.startswith("fetch_log_")
        )
        tables = []
        for _e, d in dirs:
            files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
            parts = [pq.read_table(os.path.join(d, f)) for f in files]
            if not parts:
                continue
            t = pa.concat_tables(parts)
            t = t.set_column(
                t.column_names.index("seq"),
                "seq",
                pa.array(np.arange(t.num_rows, dtype=np.int64)),
            )
            tables.append(t)
        if not tables:
            return pa.table({c: [] for c in _LOG_COLS})
        return pa.concat_tables(tables)

    def log_dataset(self):
        """Lazy DISTRIBUTED view of the crawl log — identical rows to
        :meth:`log_table` (seq = within-epoch row offset) with no
        driver-side assembly (VERDICT r1 #5): the driver reads only
        parquet FOOTERS (O(files)) to compute each file's epoch offset;
        one Ray task then reads each file and attaches its seq range.
        The log is the biggest table of a real crawl — analytics
        (e.g. q_crawl_host_stats) must consume this, not log_table()."""
        import pyarrow.parquet as pq
        import ray.data as rd

        dirs = sorted(
            (
                int(d[len("fetch_log_") :]),
                os.path.join(self.ckpt_dir, d),
            )
            for d in os.listdir(self.ckpt_dir)
            if d.startswith("fetch_log_")
        )
        items = []
        for _e, d in dirs:
            offset = 0
            for f in sorted(x for x in os.listdir(d) if x.endswith(".parquet")):
                path = os.path.join(d, f)
                n = pq.read_metadata(path).num_rows
                if n:
                    items.append({"path": path, "offset": offset})
                offset += n
        if not items:
            return rd.from_arrow(pa.table({c: [] for c in _LOG_COLS}))

        def load(batch: pa.Table) -> pa.Table:
            out = []
            for path, off in zip(
                batch.column("path").to_pylist(), batch.column("offset").to_pylist()
            ):
                t = pq.read_table(path)
                t = t.set_column(
                    t.column_names.index("seq"),
                    "seq",
                    pa.array(off + np.arange(t.num_rows, dtype=np.int64)),
                )
                out.append(t)
            return pa.concat_tables(out)

        return rd.from_items(items).map_batches(load, batch_format="pyarrow")

    def seen_table(self) -> pa.Table:
        import pyarrow.dataset as pads

        e = self.epochs_run - 1
        d = os.path.join(self.ckpt_dir, f"url_seen_{e}")
        return pads.dataset(
            [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        ).to_table()


def _canonicalize_seed_batch(batch: pa.Table) -> pa.Table:
    """Batch kernel for distributed seed admission: raw URL ->
    candidate row (same kernel chain as discovery: P9-P13)."""
    from ..functions.canonicalize import host_from_canonical, url_fpv2

    out: dict[int, tuple] = {}
    for url in batch.column("url").to_pylist():
        fps = url_fpv2(url)
        if fps is None:
            continue
        canon, dfp, ufp, rfp = fps
        host = host_from_canonical(canon)
        if host is None or ufp in out:
            continue
        out[ufp] = (canon, host, dfp, rfp)
    ufps = list(out.keys())
    vals = list(out.values())
    hosts = [v[1] for v in vals]
    return pa.table(
        {
            "canon_url": pa.array([v[0] for v in vals], pa.string()),
            "host": pa.array(hosts, pa.string()),
            "host_fp": pa.array(fp64_batch(hosts) if hosts else [], pa.int64()),
            "domain_fp": pa.array([v[2] for v in vals], pa.int64()),
            "url_fp": pa.array(ufps, pa.int64()),
            "root_domain_fp": pa.array([v[3] for v in vals], pa.int64()),
        }
    )


def _seed_frontier_table(cfg: CrawlConfig) -> pa.Table:
    """Admit the seed list. Canonicalize+fingerprint runs DISTRIBUTED
    (one small Ray job — the per-URL kernel is Python and a 10^5-seed
    list would serialize the driver for seconds); the dedup + final
    assembly of the small result stays driver-side."""
    from ..sources.synth import get_universe

    uni = get_universe(cfg.sf, cfg.seed)
    seeds = uni.seed_urls()
    if getattr(cfg, "seed_source", "list") == "list+sitemap":
        # sitemap ingestion through the REAL XML path: shard files in a
        # write-once cache, one read task per shard, stdlib parse stage
        from ..sources.sitemap import read_sitemaps, sitemap_seed_cache_dir

        sm_dir = sitemap_seed_cache_dir(cfg.sf, cfg.seed)
        sm = read_sitemaps(sm_dir).to_pandas()  # seed-scale, bounded
        seeds = seeds + sorted(sm["url"].tolist())
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    cand = (
        rd.from_items([{"url": u} for u in seeds], override_num_blocks=min(ncpu, max(1, len(seeds) // 256)))
        .map_batches(_canonicalize_seed_batch, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    rows: dict[int, tuple] = {}
    for r in cand.itertuples(index=False):
        if r.url_fp in rows:
            continue
        rows[r.url_fp] = (
            r.canon_url,
            r.host,
            r.host_fp,
            r.domain_fp,
            r.url_fp,
            r.root_domain_fp,
            0,
            cfg.priority_for_depth(0),
            0,
        )
    cols = list(zip(*rows.values())) if rows else [[]] * 9
    return pa.table(
        {
            "canon_url": pa.array(cols[0], pa.string()),
            "host": pa.array(cols[1], pa.string()),
            "host_fp": pa.array(cols[2], pa.int64()),
            "domain_fp": pa.array(cols[3], pa.int64()),
            "url_fp": pa.array(cols[4], pa.int64()),
            "root_domain_fp": pa.array(cols[5], pa.int64()),
            "depth": pa.array(cols[6], pa.int32()),
            "priority": pa.array(cols[7], pa.float64()),
            "discovered_epoch": pa.array(cols[8], pa.int32()),
        }
    )


def crawl(
    cfg: CrawlConfig,
    ckpt_dir: str,
    resume: bool = False,
    fetch_concurrency: int | tuple | None = None,  # kept for API compat; unused (task pool)
) -> CrawlRunResult:
    """Run (or resume) the epoch loop. Owns no ray.init."""
    os.makedirs(ckpt_dir, exist_ok=True)
    res = CrawlRunResult(ckpt_dir=ckpt_dir)

    seen_pool = UrlSeenPool(
        cfg.num_seen_partitions, filter_kind=getattr(cfg, "seen_filter_kind", "bloom")
    )
    robots_pool = RobotsCachePool(
        num_actors=max(2, cfg.num_seen_partitions // 4),
        kind=getattr(cfg, "robots_kind", "sim"),
        http_opts=cfg.http_opts,
    )

    revisit_pool = None
    if getattr(cfg, "revisit_from", None):
        from ..state.digests import DigestStorePool

        dig_dirs = sorted(
            os.path.join(cfg.revisit_from, d)
            for d in os.listdir(cfg.revisit_from)
            if d.startswith("digests_")
        )
        if dig_dirs:
            revisit_pool = DigestStorePool(cfg.num_seen_partitions)
            revisit_pool.load_from_parquet(dig_dirs)

    start_epoch = 0
    if resume:
        last = latest_complete_epoch(ckpt_dir)
        if last is not None:
            start_epoch = last + 1
            with open(_manifest_path(ckpt_dir, last)) as f:
                man = json.load(f)
            ckpt_scheme = man.get("seen_routing_scheme", _ROUTING_SCHEME)
            if ckpt_scheme != _ROUTING_SCHEME:
                raise ValueError(
                    f"url_seen checkpoint uses routing scheme {ckpt_scheme!r} but "
                    f"this build routes with {_ROUTING_SCHEME!r}; resuming would "
                    "silently re-admit seen URLs. Re-crawl or migrate the checkpoint."
                )
            if man.get("num_seen_partitions", cfg.num_seen_partitions) != cfg.num_seen_partitions:
                raise ValueError(
                    "num_seen_partitions mismatch between checkpoint "
                    f"({man.get('num_seen_partitions')}) and config "
                    f"({cfg.num_seen_partitions}); resume would misroute seen fps."
                )
            cfg_kind = getattr(cfg, "seen_filter_kind", "bloom")
            ckpt_kind = man.get("seen_filter_kind", cfg_kind)
            if ckpt_kind != cfg_kind:
                raise ValueError(
                    f"url_seen checkpoint was written with seen_filter_kind="
                    f"{ckpt_kind!r} but this config uses {cfg_kind!r}; "
                    "restoring the filter blob with the other class would "
                    "misparse it (ADVICE r2). Re-crawl or keep the kind."
                )
            cfg_prio = getattr(cfg, "priority_kind", "depth")
            ckpt_prio = man.get("priority_kind", cfg_prio)
            if ckpt_prio != cfg_prio:
                raise ValueError(
                    f"checkpoint was crawled with priority_kind={ckpt_prio!r} "
                    f"but this config uses {cfg_prio!r}; resuming would "
                    "silently change crawl order mid-run. Re-crawl or keep "
                    "the kind."
                )
            seen_pool.restore(os.path.join(ckpt_dir, f"url_seen_{last}"))
            res.counters = man.get("all_counters", [])

    if start_epoch == 0:
        seed_table = _seed_frontier_table(cfg)
        admitted = seen_pool.check_and_add(seed_table.column("url_fp").to_numpy())
        seed_table = seed_table.filter(pa.array(admitted))
        frontier_dir = os.path.join(ckpt_dir, "frontier_0")
        os.makedirs(frontier_dir, exist_ok=True)
        import pyarrow.parquet as pq

        pq.write_table(seed_table, os.path.join(frontier_dir, "part-00000.parquet"))

    budget = cfg.policy.budget_for_epoch(0)

    import pyarrow.dataset as pads

    ncpu = int(ray.cluster_resources().get("CPU", 8))

    for epoch in range(start_epoch, cfg.max_epochs):
        frontier_dir = os.path.join(ckpt_dir, f"frontier_{epoch}")
        if not os.path.isdir(frontier_dir) or not any(
            f.endswith(".parquet") for f in os.listdir(frontier_dir)
        ):
            break
        # row check from parquet metadata (no Ray job)
        frontier_rows = pads.dataset(frontier_dir).count_rows()
        if frontier_rows == 0:
            break
        # Size the partition count to the data: Ray Data's default read
        # splitting (~200 blocks regardless of size) would turn every
        # downstream groupby into a 200x200 tiny-object shuffle and
        # every map stage into hundreds of ms-scale tasks. One knob
        # bounds the whole epoch's shuffle width because sort/groupby
        # inherit the input block count. ~64k frontier rows per
        # partition keeps a partition's slice well under worker heap
        # even with discovered-link fan-out; floor of 2 CPUs/partition
        # keeps the cluster busy at small frontiers.
        n_part = max(
            int(os.environ.get("CCRAY_PART_MULT", "1")) * ncpu,
            frontier_rows // 65536 + 1,
        )
        frontier = rd.read_parquet(frontier_dir, override_num_blocks=n_part)
        res.epochs_run = epoch + 1

        import shutil as _shutil
        import time as _time

        # crash hygiene: no manifest for this epoch => any partial
        # side-output dirs from a previous attempt are garbage
        raw_log_dir = os.path.join(ckpt_dir, f".rawlog_{epoch}")
        log_dir = os.path.join(ckpt_dir, f"fetch_log_{epoch}")
        next_dir = os.path.join(ckpt_dir, f"frontier_{epoch + 1}")
        seen_dir = os.path.join(ckpt_dir, f"url_seen_{epoch}")
        edges_dir = os.path.join(ckpt_dir, f"host_edges_{epoch}")
        archive_dir = (
            os.path.join(ckpt_dir, f"archive_{epoch}")
            if cfg.archive_format == "warc"
            else None
        )
        digests_dir = os.path.join(ckpt_dir, f"digests_{epoch}")
        for d in (
            raw_log_dir,
            log_dir,
            next_dir,
            seen_dir,
            edges_dir,
            digests_dir,
        ) + ((archive_dir,) if archive_dir else ()):
            _shutil.rmtree(d, ignore_errors=True)

        stage_t: dict[str, float] = {}

        # --- pagerank frontier priority (VERDICT r3 #8) ---------------
        # epoch-k host ranks over the edges accumulated from ALL prior
        # epochs' fetches feed epoch-k selection: priority =
        # 1/(depth+1) + PR(host). The rank table is host-level (tiny vs
        # the frontier) but joined DISTRIBUTED (one merge_join exchange
        # on host) — at web scale the host table itself outgrows a
        # broadcast. Ranks are rounded to 6 decimals inside
        # pagerank_edges, the same reassociation bound the pagerank
        # oracle check relies on, so the single-process oracle computes
        # bit-identical priorities.
        if cfg.priority_kind == "pagerank":
            _t0 = _time.time()
            prior_edge_dirs = [
                d
                for d in (
                    os.path.join(ckpt_dir, f"host_edges_{e}") for e in range(epoch)
                )
                if os.path.isdir(d)
                and any(f.endswith(".parquet") for f in os.listdir(d))
            ]
            edge_files = [
                os.path.join(d, f)
                for d in prior_edge_dirs
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            ]
            if edge_files:
                from ..stages.joins import merge_join
                from ..stages.pagerank import pagerank_edges

                ranks = pagerank_edges(
                    rd.read_parquet(edge_files),
                    damping=cfg.pr_damping,
                    iters=cfg.pr_iters,
                    parts=min(8, ncpu),
                )

                def reprioritize(t: pa.Table) -> pa.Table:
                    depth = t.column("depth").to_numpy(zero_copy_only=False)
                    pr = np.nan_to_num(
                        t.column("pr").to_numpy(zero_copy_only=False).astype(np.float64),
                        nan=0.0,
                    )
                    prio = 1.0 / (depth + 1.0) + pr
                    t = t.set_column(
                        t.column_names.index("priority"),
                        "priority",
                        pa.array(prio, pa.float64()),
                    )
                    return t.drop_columns(["pr"])

                frontier = (
                    merge_join(
                        frontier,
                        ranks,
                        left_on="host",
                        right_on="host",
                        right_cols=["pr"],
                        how="left",
                    )
                    .map_batches(reprioritize, batch_format="pyarrow")
                    .repartition(n_part)
                )
            stage_t["pagerank_priority"] = round(_time.time() - _t0, 2)

        # --- the epoch job: ONE streaming pipeline with two all-to-all
        # exchanges (sort(host_fp) for politeness, groupby(url_fp) for
        # discovery dedup). The select+fetch output has exactly one
        # consumer, so no mid-epoch materialize: blocks stream from the
        # host shuffle straight into link explosion with backpressure.
        # Log/frontier rows leave via idempotent side-writes.
        _t0 = _time.time()
        epoch_job = (
            dedup_candidates(
                frontier.map_batches(
                    make_robots_fn(
                        robots_pool.actors,
                        epoch,
                        policy=cfg.policy,
                        base_budget=budget,
                        robots_kind=getattr(cfg, "robots_kind", "sim"),
                    ),
                    batch_format="pyarrow",
                    batch_size=None,  # preserve input blocks -> keep shuffle width
                )
                .map_batches(
                    # skew combiner: blocked rows logged+dropped and
                    # per-block non-top-budget rows deferred AT SOURCE,
                    # so the host shuffle moves <= budget*blocks rows
                    # per host regardless of mega-host skew
                    arrow_out(make_combine_fn(budget, epoch, raw_log_dir, next_dir)),
                    batch_format="pandas",
                    batch_size=None,
                )
                .sort("host_fp")  # range shuffle: whole host groups per block
                .map_batches(
                    arrow_out(make_select_fn(budget, epoch, raw_log_dir, next_dir)),
                    batch_format="pandas",
                    batch_size=None,
                )
                # rebalance: selected rows per sort block are uneven
                # (Zipf hosts); an even split removes the straggler
                # tail of the heavy fetch stage (split-only, no
                # all-to-all exchange of any size that matters — the
                # selected set is budget*hosts light rows)
                .repartition(n_part)
                .map_batches(
                    make_fetch_discover_fn(
                        epoch,
                        cfg.sf,
                        cfg.seed,
                        raw_log_dir,
                        fetch_kind=cfg.fetch_kind,
                        http_opts=cfg.http_opts,
                        edges_dir=(
                            edges_dir if cfg.priority_kind == "pagerank" else None
                        ),
                        archive_dir=archive_dir,
                        snapshot=cfg.snapshot,
                        digests_dir=digests_dir,
                        revisit_pool=revisit_pool,
                    ),
                    batch_format="pyarrow",
                    batch_size=None,
                )
            )
            .map_batches(
                make_seen_fn(seen_pool.actors, cfg.num_seen_partitions),
                batch_format="pyarrow",
                batch_size=8192,
            )
            .map_batches(
                make_discover_writer_fn(epoch, raw_log_dir, next_dir, cfg.log_dups),
                batch_format="pyarrow",
                batch_size=None,
            )
            .materialize()
        )
        if os.environ.get("CCRAY_STAGE_STATS"):
            print(f"=== epoch {epoch} stats ===\n{epoch_job.stats()}", flush=True)
        stage_t["epoch_job"] = round(_time.time() - _t0, 2)

        # --- epoch log: DISTRIBUTED sort + file-offset seq -----------
        # A driver-side pandas sort was the serial Amdahl fraction at
        # high parallelism (22% of 32-cpu wall at heavy budgets). The
        # log is now sorted by a small Ray job; ``seq`` is implied by
        # (file order, row order) — files of a sorted dataset hold the
        # global order (verified) — and is materialized lazily by
        # ``CrawlRunResult.log_table`` from the per-file row counts.
        # Per-action counters come from the writers' sidecar jsons.
        _t0 = _time.time()
        epoch_counts: dict[str, int] = {}
        log_rows_total = 0
        if os.path.isdir(raw_log_dir):
            for name in os.listdir(raw_log_dir):
                if name.endswith(".counts.json"):
                    with open(os.path.join(raw_log_dir, name)) as f:
                        for k, v in json.load(f).items():
                            epoch_counts[k] = epoch_counts.get(k, 0) + v
            log_rows_total = sum(epoch_counts.values())
        if log_rows_total:
            rank_map = pd.Series(ACTION_RANK)


            def add_rank(df: pd.DataFrame) -> pd.DataFrame:
                return df.assign(action_rank=df["action"].map(rank_map).astype(np.int32))

            raw_files = sorted(
                os.path.join(raw_log_dir, f)
                for f in os.listdir(raw_log_dir)
                if f.endswith(".parquet")
            )
            # seq is derived from write_parquet FILE ORDER, so the job
            # between sort() and the writer must preserve block order.
            # With the default preserve_order=False the drop_columns
            # map stage hands blocks to the writer in task-COMPLETION
            # order, which only coincidentally matches sorted order at
            # small scale (ADVICE r1, high). Force ordered execution
            # for this one job and restore the executor default after.
            exec_opts = rd.DataContext.get_current().execution_options
            prev_preserve = exec_opts.preserve_order
            exec_opts.preserve_order = True
            try:
                (
                    rd.read_parquet(
                        raw_files,
                        override_num_blocks=max(ncpu, log_rows_total // 262144 + 1),
                    )
                    .map_batches(
                        arrow_out(add_rank), batch_format="pandas", batch_size=None
                    )
                    .sort(
                        ["action_rank", "priority", "host_fp", "url_fp"],
                        descending=[False, True, False, False],
                    )
                    .drop_columns(["action_rank"])
                    .write_parquet(log_dir)
                )
            finally:
                exec_opts.preserve_order = prev_preserve
        else:
            os.makedirs(log_dir, exist_ok=True)
        _shutil.rmtree(raw_log_dir, ignore_errors=True)
        os.makedirs(next_dir, exist_ok=True)  # may be empty (frontier drained)
        stage_t["log_sort"] = round(_time.time() - _t0, 2)

        # 9. url_seen checkpoint + manifest (manifest LAST => epoch complete)
        seen_dir = os.path.join(ckpt_dir, f"url_seen_{epoch}")
        seen_total = seen_pool.checkpoint(seen_dir)
        from ..state import counters as _skew

        counters = {
            "epoch": epoch,
            "fetched": epoch_counts.get("fetched", 0),
            "revisit_unchanged": epoch_counts.get("revisit_unchanged", 0),
            "robots_blocked": epoch_counts.get("robots_blocked", 0),
            "budget_deferred": epoch_counts.get("budget_deferred", 0),
            "dup_skipped": epoch_counts.get("dup_skipped", 0),
            "seen_total": seen_total,
            "stage_seconds": stage_t,
            # "no silent caps": cumulative skipped-bucket counters from
            # capped operators in this session (state/counters.py)
            "skew_counters": _skew.snapshot(),
        }
        res.counters.append(counters)
        _atomic_write_json(
            _manifest_path(ckpt_dir, epoch),
            {
                "epoch": epoch,
                "config": {**asdict(cfg), "policy": asdict(cfg.policy)},
                "counters": counters,
                "all_counters": res.counters,
                "num_seen_partitions": cfg.num_seen_partitions,
                "seen_routing_scheme": _ROUTING_SCHEME,
                "seen_filter_kind": getattr(cfg, "seen_filter_kind", "bloom"),
                "priority_kind": getattr(cfg, "priority_kind", "depth"),
            },
        )
        res.seen_total = seen_total

    # frontier remaining after the final epoch
    final_dir = os.path.join(ckpt_dir, f"frontier_{res.epochs_run}")
    if os.path.isdir(final_dir):
        res.frontier_left = pads.dataset(final_dir).count_rows()
    return res


from ..schemas import FRONTIER as _FRONTIER_SCHEMA  # noqa: E402

_FRONTIER_FIELDS = list(_FRONTIER_SCHEMA)
