"""CDX index-build scale probe: synthesize a pages universe at --sf,
build the sorted CDXJ index end to end (capture-row derivation ->
global key sort -> sharded content-addressed write -> cluster.idx),
and report wall time + captures/s + a pruned-lookup latency sample.

Run in a quiet window (no other Ray session):
    python scripts/cdx_probe.py --sf 0.1 --num-cpus 32
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--out", default="/tmp/ccray_cdx_probe")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import pyarrow as pa
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from commoncrawl_ray.functions.surt import surt_host_prefix
    from commoncrawl_ray.sources.cdx import build_cdx_index, cdx_files_for_prefix, cdx_lookup
    from commoncrawl_ray.sources.synth import get_universe

    uni = get_universe(args.sf, args.seed)
    rows = [
        (host, k) for host in uni.hosts for k in range(uni.page_counts[host])
    ]
    n_pages = len(rows)

    def build_pages(batch: pa.Table) -> pa.Table:
        urls, tss, recs = [], [], []
        for h, k in zip(
            batch.column("host").to_pylist(), batch.column("k").to_pylist()
        ):
            url, ts, rec, _lang = uni.page_row(h, k)
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

    src = rd.from_arrow(
        pa.table(
            {
                "host": pa.array([r[0] for r in rows], pa.string()),
                "k": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    ).repartition(max(args.num_cpus * 2, 8)).map_batches(
        build_pages, batch_format="pyarrow", batch_size=None
    )

    shutil.rmtree(args.out, ignore_errors=True)
    t0 = time.time()
    man = build_cdx_index(src, args.out)
    build_s = time.time() - t0
    n_caps = int(sum(man.column("records").to_pylist()))

    # pruned lookup sample: one mid-alphabet host
    prefix = surt_host_prefix(sorted(uni.hosts)[len(uni.hosts) // 2])
    t1 = time.time()
    files = cdx_files_for_prefix(args.out, prefix)
    n_hit = cdx_lookup(args.out, prefix).count()
    lookup_s = time.time() - t1

    print(
        json.dumps(
            {
                "sf": args.sf,
                "num_cpus": args.num_cpus,
                "pages": n_pages,
                "captures": n_caps,
                "shards": man.num_rows,
                "build_seconds": round(build_s, 2),
                "captures_per_sec": round(n_caps / build_s, 1),
                "lookup_prefix": prefix,
                "lookup_files_opened": len(files),
                "lookup_rows": n_hit,
                "lookup_seconds": round(lookup_s, 3),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
