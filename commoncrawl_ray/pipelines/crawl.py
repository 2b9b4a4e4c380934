"""Distributed crawl engine — the Ray-Data epoch loop.

Each epoch is a bounded batch (SURVEY §2.9): select → robots → fetch →
extract → discover → merge, expressed as Dataset stages:

- robots check: ``map_batches`` consulting the ``RobotsCacheActor``
  pool (host-partitioned cache, J6);
- politeness selection: ``sort(host_fp)`` range shuffle (whole host
  groups land in one block) + a vectorized per-block ranking pass —
  the per-host priority queue realized as a shuffle (north rule), with
  no per-group Python; key salting not needed for selection because
  budget-per-host caps each group's output and group input is bounded
  by the frontier slice;
- fetch+parse+discover: stateless ``map_batches`` task (the synthetic
  web is a pure function of the URL — no page-table join; a real
  deployment swaps in an async-HTTP actor pool with the same row
  contract);
- candidate canonicalize+fingerprint: vectorized ``map_batches``;
- cross-batch dedup: ``groupby(url_fp)`` min-depth reduce;
- URL-seen anti-join: batched ``check_and_add`` against the
  ``UrlSeenActor`` pool (partitioned bloom + exact set, J5/T5).

Determinism: all ordering via explicit sort keys (pipelines.common);
the per-epoch log is sorted by (action_rank, priority desc, host_fp,
url_fp) and sequence-stamped. State between epochs lives ONLY in
parquet checkpoints + the seen-actor pool, so a killed run resumes
from the last complete manifest with an identical frontier
(SURVEY §4 checkpoint/resume; manifests written atomically tmp+rename
mirroring query/Query.java:246-260's attempt-dir pattern).

Scale notes (10^10 frontier): the frontier and logs stream through
parquet each epoch (never driver-materialized); the one driver-side
materialization is the per-epoch log *sequence stamping*, which is
bounded by hosts×budget + robots/deferred/dup rows per epoch — for
truly unbounded logs, stamp seq from per-file row offsets recorded in
the manifest instead (same total order, no materialization).
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
from ..schemas import FETCH_LOG
from ..state.robots import RobotsCachePool, is_blocked
from ..state.url_seen import UrlSeenPool
from .common import ACTION_RANK, CrawlConfig

_LOG_COLS = [f.name for f in FETCH_LOG]


# --------------------------------------------------------------------
# batch kernels
# --------------------------------------------------------------------


def make_robots_fn(robots_actors, epoch: int):
    """Adds 'blocked' via the robots cache pool. Stateless task fn (the
    durable cache state lives in the shared actor pool, not the stage):
    task-pool workers are reused across epochs, so there is no per-epoch
    actor-spawn cost. Hosts are deduped per batch before the fan-out, so
    each batch costs one round-trip per touched pool partition."""
    num_actors = len(robots_actors)

    def robots_check(batch: pa.Table) -> pa.Table:
        hosts = batch.column("host").to_pylist()
        urls = batch.column("canon_url").to_pylist()
        n = len(hosts)
        missing = sorted(set(hosts))
        host_fps = np.fromiter((fp64(h) for h in missing), dtype=np.int64, count=len(missing))
        parts = host_fps.view(np.uint64) % np.uint64(num_actors)
        refs, groups = [], []
        for a in range(num_actors):
            sel = [missing[i] for i in np.nonzero(parts == a)[0]]
            if sel:
                refs.append(robots_actors[a].rules_for.remote(sel, epoch))
                groups.append(sel)
        rules_by_host: dict[str, tuple] = {}
        for sel, rules_list in zip(groups, ray.get(refs)):
            for h, rules in zip(sel, rules_list):
                rules_by_host[h] = tuple(rules)
        blocked = np.fromiter(
            (is_blocked(u, rules_by_host[h]) for u, h in zip(urls, hosts)),
            dtype=bool,
            count=n,
        )
        return batch.append_column("blocked", pa.array(blocked))

    return robots_check


def make_select_fn(budget: int):
    """Per-host politeness selection -> 'action' column, vectorized
    across ALL hosts in a sort partition.

    Runs after ``sort("host_fp")``: range partitioning puts every row
    of a host in one block, so a per-block ``map_batches`` sees whole
    host groups. Selection is a single vectorized pass (no per-group
    Python): sort rows by (host_fp, priority desc, url_fp), compute
    each row's rank among its host's non-blocked rows with cumsums,
    fetch the top ``budget``. Per-group ``map_groups`` at ~ms of
    pandas overhead per host would dominate epochs with millions of
    hosts; this is O(n log n) numpy per partition.

    Handles the robots verdict in the same pass: blocked rows become
    'robots_blocked' and don't consume budget."""

    def select(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.drop(columns=["blocked"]).assign(action=pd.Series([], dtype=str))
        df = df.sort_values(
            ["host_fp", "priority", "url_fp"],
            ascending=[True, False, True],
            kind="mergesort",
        ).reset_index(drop=True)
        host = df["host_fp"].to_numpy()
        blocked = df["blocked"].to_numpy()
        n = len(df)
        starts = np.r_[0, np.flatnonzero(host[1:] != host[:-1]) + 1]
        counts = np.diff(np.r_[starts, n])
        nb = (~blocked).astype(np.int64)
        c = np.cumsum(nb)
        # eligible-rank of each row within its host (0-based, valid where nb==1)
        base = np.repeat(c[starts] - nb[starts], counts)
        rank = c - base - 1
        action = np.where(
            blocked, "robots_blocked", np.where(rank < budget, "fetched", "budget_deferred")
        )
        return df.drop(columns=["blocked"]).assign(action=action)

    return select


def make_fetch_fn(sf: float, seed: int):
    """Simulated fetch + parse + link discovery. Stateless task fn: the
    Universe is a cheap read-only structure cached per worker process
    (``get_universe`` lru_cache — SURVEY §2.3 T1 pattern), so task-pool
    workers reuse it across batches AND epochs with no actor-spawn
    cost. Real deployments replace ``synth_page`` with an async HTTP
    client actor pool; the row contract stays identical."""

    def fetch(batch: pa.Table) -> pa.Table:
        from ..sources.synth import get_universe
        from .common import discover_links

        uni = get_universe(sf, seed)
        urls = batch.column("canon_url").to_pylist()
        status = np.zeros(len(urls), dtype=np.int16)
        links_col: list[list[str]] = []
        for i, u in enumerate(urls):
            rec = uni.synth_page(u)
            if rec is None:
                status[i] = 404
                links_col.append([])
            else:
                status[i] = 200
                links_col.append(discover_links(u, rec))
        return batch.append_column("http_status", pa.array(status)).append_column(
            "links", pa.array(links_col, pa.list_(pa.string()))
        )

    return fetch


def candidates_batch(batch: pa.Table) -> pa.Table:
    """Explode links -> canonicalize+fingerprint candidate rows.

    Combiner semantics: within the batch, duplicate URLs reduce to
    their min depth BEFORE the cross-batch shuffle (partial aggregation
    ahead of the groupby — SURVEY §2.5 A4 / ray_guide pre-aggregate
    pattern), and canonicalization results are memoized per distinct
    raw URL."""
    from ..functions.canonicalize import host_from_canonical, url_fpv2

    parent_depth = batch.column("depth").to_pylist()
    links_lists = batch.column("links").to_pylist()
    cache: dict[str, tuple] = {}
    best: dict[int, tuple] = {}  # url_fp -> (depth, canon, host, dfp, rfp)
    for d0, links in zip(parent_depth, links_lists):
        d = d0 + 1
        for u in links:
            hit = cache.get(u)
            if hit is None:
                fps = url_fpv2(u)
                if fps is None:
                    cache[u] = ()
                    continue
                c, dfp, ufp, rfp = fps
                h = host_from_canonical(c)
                if h is None:
                    cache[u] = ()
                    continue
                hit = (c, h, ufp, dfp, rfp)
                cache[u] = hit
            elif hit == ():
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

    Every column except ``depth`` is a pure function of ``url_fp``
    (same canon_url/host/fps for every duplicate), so the reduce is a
    vectorized hash aggregate (Min over each column) rather than a
    per-group Python call — per-group ``map_groups`` over millions of
    1-row groups would dominate epoch wall time.
    """
    from ray.data.aggregate import Min

    return candidates.groupby("url_fp").aggregate(
        Min("depth", alias_name="depth"),
        Min("canon_url", alias_name="canon_url"),
        Min("host", alias_name="host"),
        Min("host_fp", alias_name="host_fp"),
        Min("domain_fp", alias_name="domain_fp"),
        Min("root_domain_fp", alias_name="root_domain_fp"),
    )


def make_seen_fn(seen_actors, num_partitions: int):
    """URL-seen anti-join: routes url_fps to the UrlSeenActor pool;
    marks newly-admitted rows. Stateless task fn — the seen state lives
    in the partitioned actor pool (J5/T5); each batch costs one
    round-trip per touched partition."""

    def seen_check(batch: pa.Table) -> pa.Table:
        fps = batch.column("url_fp").to_numpy()
        parts = fps.view(np.uint64) % np.uint64(num_partitions)
        new_mask = np.zeros(len(fps), dtype=bool)
        refs, idxs = [], []
        for p in range(num_partitions):
            sel = np.nonzero(parts == p)[0]
            if len(sel):
                refs.append(seen_actors[p].check_and_add.remote(fps[sel]))
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

    def log_table(self) -> pa.Table:
        import pyarrow.dataset as pads

        dirs = sorted(
            os.path.join(self.ckpt_dir, d)
            for d in os.listdir(self.ckpt_dir)
            if d.startswith("fetch_log_")
        )
        tables = [pads.dataset(d).to_table() for d in dirs]
        t = pa.concat_tables(tables) if tables else pa.table({c: [] for c in _LOG_COLS})
        return t.sort_by([("epoch", "ascending"), ("seq", "ascending")])

    def seen_table(self) -> pa.Table:
        import pyarrow.dataset as pads

        e = self.epochs_run - 1
        d = os.path.join(self.ckpt_dir, f"url_seen_{e}")
        return pads.dataset(
            [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        ).to_table()


def _seed_frontier_table(cfg: CrawlConfig) -> pa.Table:
    """Admit the seed list (driver-side; seed lists are small)."""
    from ..functions.canonicalize import host_from_canonical, url_fpv2
    from ..sources.synth import get_universe

    uni = get_universe(cfg.sf, cfg.seed)
    rows: dict[int, tuple] = {}
    for url in uni.seed_urls():
        fps = url_fpv2(url)
        if fps is None:
            continue
        canon, dfp, ufp, rfp = fps
        host = host_from_canonical(canon)
        if host is None or ufp in rows:
            continue
        rows[ufp] = (canon, host, fp64(host), dfp, ufp, rfp, 0, cfg.priority_for_depth(0), 0)
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

    seen_pool = UrlSeenPool(cfg.num_seen_partitions)
    robots_pool = RobotsCachePool(num_actors=max(2, cfg.num_seen_partitions // 4))

    start_epoch = 0
    if resume:
        last = latest_complete_epoch(ckpt_dir)
        if last is not None:
            start_epoch = last + 1
            seen_pool.restore(os.path.join(ckpt_dir, f"url_seen_{last}"))
            with open(_manifest_path(ckpt_dir, last)) as f:
                man = json.load(f)
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
        n_part = max(ncpu, frontier_rows // 65536 + 1)
        frontier = rd.read_parquet(frontier_dir, override_num_blocks=n_part)
        res.epochs_run = epoch + 1

        # 1+2. robots check fused into the politeness shuffle: one Ray
        # job does map(robots) -> groupby(host_fp) -> select. The
        # result is materialized because three branches (fetch,
        # deferred, log) consume it — unpinned, every branch would
        # re-run the shuffle.
        import time as _time

        stage_t: dict[str, float] = {}
        _t0 = _time.time()
        selected_all = (
            frontier.map_batches(
                make_robots_fn(robots_pool.actors, epoch),
                batch_format="pyarrow",
                batch_size=None,  # preserve input blocks -> keep shuffle width
            )
            .sort("host_fp")  # range shuffle: whole host groups per block
            .map_batches(make_select_fn(budget), batch_format="pandas", batch_size=None)
            .materialize()
        )
        stage_t["select"] = round(_time.time() - _t0, 2)
        blocked = selected_all.filter(expr="action == 'robots_blocked'")
        to_fetch = selected_all.filter(expr="action == 'fetched'")
        deferred = selected_all.filter(expr="action == 'budget_deferred'")

        # 3. fetch + discover (stateless task pool; universe cached per
        # worker process across batches and epochs)
        _t0 = _time.time()
        fetched = to_fetch.drop_columns(["action"]).map_batches(
            make_fetch_fn(cfg.sf, cfg.seed),
            batch_format="pyarrow",
            batch_size=256,
        ).materialize()
        stage_t["fetch"] = round(_time.time() - _t0, 2)

        # 4. candidate links: explode + canonicalize + fingerprint
        candidates = fetched.map_batches(
            candidates_batch, batch_format="pyarrow", batch_size=256
        )
        # 5. cross-batch intra-epoch dedup (shallowest discovery wins)
        candidates = dedup_candidates(candidates)
        # 6. URL-seen anti-join via the partitioned actor pool
        _t0 = _time.time()
        checked_cand = candidates.map_batches(
            make_seen_fn(seen_pool.actors, cfg.num_seen_partitions),
            batch_format="pyarrow",
            batch_size=8192,
        ).materialize()
        stage_t["candidates"] = round(_time.time() - _t0, 2)
        new_cand = checked_cand.filter(expr="is_new == True").drop_columns(["is_new"])
        dup_cand = checked_cand.filter(expr="is_new == False").drop_columns(["is_new"])

        # 7. epoch log: union all actions, deterministic global order
        def _log_rows(ds, action: str, with_status: bool = False):
            def to_log(b: pa.Table) -> pa.Table:
                n = b.num_rows
                status = (
                    b.column("http_status")
                    if with_status
                    else pa.array(np.zeros(n, dtype=np.int16))
                )
                prio = (
                    b.column("priority")
                    if "priority" in b.column_names
                    else pa.array(1.0 / (b.column("depth").to_numpy() + 1.0))
                )
                return pa.table(
                    {
                        "epoch": pa.array(np.full(n, epoch, dtype=np.int32)),
                        "seq": pa.array(np.full(n, -1, dtype=np.int64)),
                        "url_fp": b.column("url_fp"),
                        "host_fp": b.column("host_fp"),
                        "canon_url": b.column("canon_url"),
                        "action": pa.array([action] * n, pa.string()),
                        "http_status": status,
                        "priority": prio,
                        "depth": b.column("depth"),
                        "action_rank": pa.array(
                            np.full(n, ACTION_RANK[action], dtype=np.int32)
                        ),
                    }
                )

            return ds.map_batches(to_log, batch_format="pyarrow")

        log_parts = [
            _log_rows(fetched.drop_columns(["links"]), "fetched", with_status=True),
            _log_rows(blocked, "robots_blocked"),
            _log_rows(deferred, "budget_deferred"),
        ]
        if cfg.log_dups:
            log_parts.append(_log_rows(dup_cand, "dup_skipped"))
        epoch_log = log_parts[0].union(*log_parts[1:])
        # seq stamping: driver-side sort of the bounded per-epoch log
        # (cheaper than a distributed sort at this log volume; at truly
        # unbounded log sizes switch to ds.sort + per-file row offsets
        # recorded in the manifest — same total order)
        _t0 = _time.time()
        log_df = epoch_log.to_pandas()
        stage_t["log_collect"] = round(_time.time() - _t0, 2)
        log_df = log_df.sort_values(
            ["action_rank", "priority", "host_fp", "url_fp"],
            ascending=[True, False, True, True],
            kind="mergesort",
        ).reset_index(drop=True)
        log_tbl = pa.Table.from_pandas(log_df, preserve_index=False)
        log_tbl = log_tbl.drop_columns(["action_rank"])
        log_tbl = log_tbl.set_column(
            log_tbl.column_names.index("seq"),
            "seq",
            pa.array(np.arange(log_tbl.num_rows, dtype=np.int64)),
        )
        log_dir = os.path.join(ckpt_dir, f"fetch_log_{epoch}")
        os.makedirs(log_dir, exist_ok=True)
        import pyarrow.parquet as pq

        pq.write_table(log_tbl, os.path.join(log_dir, "part-00000.parquet"))

        # 8. next frontier = deferred + newly admitted
        next_frontier = deferred.drop_columns(["action"])
        new_rows = new_cand.map_batches(
            lambda b: b.append_column(
                "priority", pa.array(1.0 / (b.column("depth").to_numpy() + 1.0))
            ).append_column(
                "discovered_epoch",
                pa.array(np.full(b.num_rows, epoch + 1, dtype=np.int32)),
            ),
            batch_format="pyarrow",
        )
        next_dir = os.path.join(ckpt_dir, f"frontier_{epoch + 1}")
        cols = [f.name for f in _FRONTIER_FIELDS]
        _t0 = _time.time()
        nf = next_frontier.select_columns(cols).union(new_rows.select_columns(cols))
        nf.write_parquet(next_dir)
        stage_t["frontier_write"] = round(_time.time() - _t0, 2)

        # 9. url_seen checkpoint + manifest (manifest LAST => epoch complete)
        seen_dir = os.path.join(ckpt_dir, f"url_seen_{epoch}")
        seen_total = seen_pool.checkpoint(seen_dir)
        counters = {
            "epoch": epoch,
            "fetched": int(log_tbl.filter(pa.compute.equal(log_tbl["action"], "fetched")).num_rows),
            "robots_blocked": int(
                log_tbl.filter(pa.compute.equal(log_tbl["action"], "robots_blocked")).num_rows
            ),
            "budget_deferred": int(
                log_tbl.filter(pa.compute.equal(log_tbl["action"], "budget_deferred")).num_rows
            ),
            "dup_skipped": int(
                log_tbl.filter(pa.compute.equal(log_tbl["action"], "dup_skipped")).num_rows
            ),
            "seen_total": seen_total,
            "stage_seconds": stage_t,
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
