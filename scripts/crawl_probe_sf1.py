"""Crawl-scale probe at sf1 (VERDICT r4 ask #9).

One recorded run of the bench crawl suite on the sf1 universe
(crawl cfg sf = 5 x relational sf = 5.0, the bench's established 5x
rule) in a fresh 32-cpu session — 10x the data the sf0.1 bench crawl
carries. Purpose: verify the epoch loop's memory behavior off the
bench's comfort zone — the per-host top-budget skew combiner, the
URL-seen partition pool, and (optionally) the WARC archive sink — with
no OOM and no spill collapse.

Reports wall time, fetched/s, discovered/s, and peak object-store
usage (sampled from ray.available_resources() at 0.25 s cadence,
cross-checked against ray memory_summary spill counters at the end).

Usage:  python scripts/crawl_probe_sf1.py [--sf 1.0] [--cpus 32]
                                          [--epochs 5] [--archive]
Writes one JSON line to stdout; record the result in BASELINE.md §G.
(owns its Ray session; never run while a bench is running)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class ObjectStorePeak:
    """Samples object-store usage in a daemon thread; keeps the max."""

    def __init__(self, interval: float = 0.25):
        self.interval = interval
        self.peak_bytes = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        import ray

        total = ray.cluster_resources().get("object_store_memory", 0.0)
        while not self._stop.is_set():
            try:
                avail = ray.available_resources().get("object_store_memory", total)
            except Exception:
                avail = total
            used = max(0.0, total - avail)
            if used > self.peak_bytes:
                self.peak_bytes = used
            self._stop.wait(self.interval)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5)
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0, help="relational sf (crawl sf = 5x)")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--seen-partitions", type=int, default=16)
    ap.add_argument("--archive", action="store_true", help="also exercise the WARC archive sink")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )

    from commoncrawl_ray.pipelines.common import CrawlConfig
    from commoncrawl_ray.pipelines.crawl import crawl
    from commoncrawl_ray.state.politeness import PolitenessPolicy

    # Same shape as the bench crawl phase (bench.py), scaled: crawl
    # universe sf = 5 x relational sf; seen partitions sized by DATA
    # scale (bench note: partition state must fit one actor) — 16 at
    # sf1 vs 8 at sf0.1.
    cfg = CrawlConfig(
        sf=args.sf * 5,
        seed=42,
        max_epochs=args.epochs,
        num_seen_partitions=args.seen_partitions,
        policy=PolitenessPolicy(burst=128, refill=128),
        archive_format="warc" if args.archive else None,
    )

    ckpt = tempfile.mkdtemp(prefix="cc_ray_probe_sf1_")
    try:
        with ObjectStorePeak() as peak:
            t0 = time.perf_counter()
            res = crawl(cfg, ckpt)
            wall = time.perf_counter() - t0
        fetched = sum(c["fetched"] for c in res.counters)
        discovered = res.seen_total

        spilled_mb = restored_mb = None
        try:
            from ray._private.internal_api import memory_summary

            summ = memory_summary(stats_only=True)
            for line in summ.splitlines():
                if "Spilled" in line and "MiB" in line:
                    spilled_mb = float(line.split("Spilled")[1].split("MiB")[0].strip())
                if "Restored" in line and "MiB" in line:
                    restored_mb = float(line.split("Restored")[1].split("MiB")[0].strip())
        except Exception:
            pass

        out = {
            "probe": "crawl_sf1",
            "sf_relational": args.sf,
            "sf_crawl_universe": cfg.sf,
            "num_cpus": args.cpus,
            "epochs": args.epochs,
            "num_seen_partitions": args.seen_partitions,
            "archive_format": cfg.archive_format,
            "wall_sec": round(wall, 1),
            "fetched_pages": fetched,
            "discovered_urls": discovered,
            "fetched_pages_per_sec": round(fetched / wall, 1),
            "discovered_urls_per_sec": round(discovered / wall, 1),
            "peak_object_store_mb": round(peak.peak_bytes / 2**20, 1),
            "object_store_total_mb": round(
                ray.cluster_resources().get("object_store_memory", 0) / 2**20, 1
            ),
            "spilled_mb": spilled_mb,
            "restored_mb": restored_mb,
        }
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
