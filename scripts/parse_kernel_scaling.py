"""No-Ray parse-kernel scaling microbenchmark (BASELINE.md §C/§E note).

Measures the pure ``parse_extract_batch`` kernel cost per page when 1,
4 and 16 copies run concurrently on this box — isolating HARDWARE
contention (memory bandwidth / allocator / cache) from anything Ray
does.  Each worker process parses its own private slice of the pages
cache (loaded BEFORE the timed region; no IO in the measurement), so
the only shared resource is the socket.

Usage:  python scripts/parse_kernel_scaling.py [sf]   (default 0.1)

Prints one JSON line:
  {"ms_per_page": {"1": .., "4": .., "16": ..},
   "hw_ceiling_4_to_16": <= (ms@4 / ms@16 ratio as an efficiency>}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _worker(args):
    (paths, lo, hi, batch) = args
    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from commoncrawl_ray.stages.parse_extract import parse_extract_batch

    t = pq.read_table(paths, columns=["url", "warc_ts", "html"]).slice(lo, hi - lo)
    # warm one batch (imports, regex compile, TLD table) untimed
    parse_extract_batch(t.slice(0, min(64, len(t))))
    t0 = time.time()
    n = 0
    for off in range(0, len(t), batch):
        b = t.slice(off, batch)
        parse_extract_batch(b)
        n += len(b)
    return n, time.time() - t0


def measure(paths: list[str], total_rows: int, width: int, pages_per_worker: int) -> float:
    """ms/page with ``width`` concurrent kernel processes."""
    span = min(pages_per_worker, total_rows // max(1, width))
    jobs = []
    for w in range(width):
        lo = (w * span) % max(1, total_rows - span)
        jobs.append((paths, lo, lo + span, 256))
    with mp.get_context("spawn").Pool(width) as pool:
        res = pool.map(_worker, jobs)
    n = sum(r[0] for r in res)
    wall = sum(r[1] for r in res)  # sum of per-process parse seconds
    return 1000.0 * wall / n


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from commoncrawl_ray.sources.synth import pages_cache_dir

    d = pages_cache_dir(sf)
    if not os.path.isdir(d) or not os.listdir(d):
        raise SystemExit(f"pages cache missing at {d}; run bench.py once first")
    paths = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    import pyarrow.parquet as pq

    total = sum(pq.read_metadata(p).num_rows for p in paths)
    per_worker = min(12000, total)
    out = {}
    for width in (1, 4, 16):
        out[str(width)] = round(measure(paths, total, width, per_worker), 3)
    # efficiency a 4->16 Ray run could AT BEST reach given kernel-level
    # contention alone: per-page cost ratio 4-wide vs 16-wide
    ceiling = round(out["4"] / out["16"], 3)
    print(
        json.dumps(
            {
                "sf": sf,
                "pages_per_worker": per_worker,
                "ms_per_page": out,
                "hw_ceiling_4_to_16": ceiling,
            }
        )
    )


if __name__ == "__main__":
    main()
