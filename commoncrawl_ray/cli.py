"""Command-line entry point — the ``ray job submit`` surface.

The north rule runs the engine on a fixed-size cluster via
``ray job submit -- python -m commoncrawl_ray <cmd> ...``. On a
cluster, ``ray.init(address="auto")`` attaches to the running Ray; in
the sandbox it falls back to a local session. This module (together
with bench.py and the test fixture) is the ONLY place that owns a Ray
session — the library never calls ray.init.

Commands:
  crawl   — run/resume the epoch crawl loop against a checkpoint dir
  parse   — parse/extract a pages parquet table to a docs table
  query   — run a registry query (see ``queries --list``) to parquet/stdout
  compact — coalesce a directory of small parquet files to ~target size
  synth   — generate a synthetic pages universe parquet table
  export-warc — pages parquet -> gzip-member-per-record .warc.gz
  export-wet  — pages parquet -> parse -> .wet.gz extracted text
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None):
    import ray

    owned = False
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        addr = os.environ.get("RAY_ADDRESS", "local")
        if num_cpus is not None and addr == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(address=addr, **kwargs)
        owned = True
    return _RayHandle(ray, owned)


class _RayHandle:
    """Shutdown-only-if-owned wrapper: a command run inside an
    existing session (pytest fixture, a calling driver) must not tear
    that session down when it finishes. Ownership is captured per
    handle at init time — a process-global latch would make a later
    command that merely ATTACHED to someone else's session shut that
    session down."""

    def __init__(self, ray_mod, owned: bool):
        self._ray = ray_mod
        self._owned = owned

    def __getattr__(self, name):
        return getattr(self._ray, name)

    def shutdown(self):
        if self._owned:
            self._ray.shutdown()


def _cmd_crawl(args) -> int:
    ray = _init_ray(args.num_cpus)
    from .pipelines.common import CrawlConfig
    from .pipelines.crawl import crawl
    from .state.politeness import PolitenessPolicy

    cfg = CrawlConfig(
        sf=args.sf,
        seed=args.seed,
        max_epochs=args.epochs,
        num_seen_partitions=args.seen_partitions,
        policy=PolitenessPolicy(
            burst=args.burst,
            refill=args.burst,
            epoch_seconds=args.epoch_seconds,
        ),
        snapshot=args.snapshot,
        revisit_from=args.revisit_from,
        archive_format="warc" if args.archive else None,
    )
    res = crawl(cfg, args.ckpt, resume=args.resume)
    print(
        json.dumps(
            {
                "epochs_run": res.epochs_run,
                "seen_total": res.seen_total,
                "frontier_left": res.frontier_left,
                "counters": res.counters,
            },
            default=str,
        )
    )
    ray.shutdown()
    return 0


def _cmd_parse(args) -> int:
    ray = _init_ray(args.num_cpus)
    import ray.data as rd

    from .stages.parse_extract import parse_extract_batch

    if os.path.isdir(args.output) and any(
        f.endswith(".parquet") for f in os.listdir(args.output)
    ):
        # write_parquet appends; stale files would both pollute the
        # output dataset and inflate the footer-based count (ADVICE r2)
        print(
            f"error: output dir {args.output} already contains parquet files; "
            "use a fresh directory",
            file=sys.stderr,
        )
        ray.shutdown()
        return 2
    ds = rd.read_parquet(args.input, columns=["url", "warc_ts", "html"])
    docs = ds.map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=None)
    docs.write_parquet(args.output)
    # row count from the written files' footers — re-running the parse
    # pipeline just to count would double the job's dominant cost
    import pyarrow.parquet as pq

    rows = sum(
        pq.read_metadata(os.path.join(args.output, f)).num_rows
        for f in os.listdir(args.output)
        if f.endswith(".parquet")
    )
    print(json.dumps({"rows": rows, "output": args.output}))
    ray.shutdown()
    return 0


def _cmd_index_cdx(args) -> int:
    """WARC archive dir -> sorted CDXJ capture index + cluster.idx."""
    ray = _init_ray(args.num_cpus)
    from .sources.cdx import index_warc_archive

    man = index_warc_archive(args.input, args.output)
    print(
        json.dumps(
            {
                "shards": man.num_rows,
                "records": int(sum(man.column("records").to_pylist())),
                "output": args.output,
            }
        )
    )
    ray.shutdown()
    return 0


def _cmd_export_warc(args) -> int:
    """pages parquet -> gzip-member-per-record .warc.gz files."""
    ray = _init_ray(args.num_cpus)
    import ray.data as rd

    from .sources.warc import write_warc

    ds = rd.read_parquet(args.input, columns=["url", "warc_ts", "html"])
    res = write_warc(ds, args.output).to_pandas()
    print(
        json.dumps(
            {"files": len(res), "records": int(res["records"].sum()), "output": args.output}
        )
    )
    ray.shutdown()
    return 0


def _cmd_export_wacz(args) -> int:
    """pages parquet -> self-contained .wacz packages (WARC archive +
    CDXJ index + page list + sha256 manifest chain per block;
    sources/wacz.py)."""
    ray = _init_ray(args.num_cpus)
    import ray.data as rd

    from .sources.wacz import write_wacz

    ds = rd.read_parquet(args.input, columns=["url", "warc_ts", "html"])
    res = write_wacz(ds, args.output).to_pandas()
    print(
        json.dumps(
            {"files": len(res), "records": int(res["records"].sum()), "output": args.output}
        )
    )
    ray.shutdown()
    return 0


def _cmd_export_wet(args) -> int:
    """pages parquet -> parse/extract -> .wet.gz extracted-text files."""
    ray = _init_ray(args.num_cpus)
    import ray.data as rd

    from .sources.warc import write_wet
    from .stages.parse_extract import parse_extract_batch

    ds = rd.read_parquet(args.input, columns=["url", "warc_ts", "html"])
    parsed = ds.map_batches(
        parse_extract_batch, batch_format="pyarrow", batch_size=None
    ).select_columns(["url", "warc_ts", "text"])
    res = write_wet(parsed, args.output).to_pandas()
    print(
        json.dumps(
            {"files": len(res), "records": int(res["records"].sum()), "output": args.output}
        )
    )
    ray.shutdown()
    return 0


def _cmd_export_tfrecord(args) -> int:
    """docs parquet -> sharded .tfrecord training shards (string cols
    as bytes_list, int cols as int64_list; sources/tfrecord.py)."""
    ray = _init_ray(args.num_cpus)
    import ray.data as rd

    from .sources.tfrecord import write_tfrecord

    ds = rd.read_parquet(args.input)
    res = write_tfrecord(ds, args.output).to_pandas()
    print(
        json.dumps(
            {"files": len(res), "records": int(res["records"].sum()), "output": args.output}
        )
    )
    ray.shutdown()
    return 0


def _cmd_export_avro(args) -> int:
    """docs parquet -> sharded Avro OCF (long/string columns inferred
    from the parquet schema; deflate codec; sources/avro.py)."""
    ray = _init_ray(args.num_cpus)
    import pyarrow as pa
    import ray.data as rd

    from .sources.avro import write_avro

    ds = rd.read_parquet(args.input)
    schema = ds.schema()
    fields = []
    for n, t in zip(schema.names, schema.types):
        if pa.types.is_integer(t):
            fields.append((n, "long"))
        elif pa.types.is_string(t):
            fields.append((n, "string"))
        elif pa.types.is_binary(t):
            fields.append((n, "bytes"))
        else:
            raise SystemExit(f"unsupported avro export type {t} for {n!r}")
    res = write_avro(ds, args.output, fields, codec=args.codec).to_pandas()
    print(
        json.dumps(
            {"files": len(res), "records": int(res["records"].sum()), "output": args.output}
        )
    )
    ray.shutdown()
    return 0


def _cmd_export_columnar(args) -> int:
    """docs parquet -> sharded ORC or Arrow IPC (full Arrow schema
    carried as-is; sources/columnar.py)."""
    ray = _init_ray(args.num_cpus)
    import ray.data as rd

    from .sources.columnar import write_ipc, write_orc

    ds = rd.read_parquet(args.input)
    write_fn = write_orc if args.fmt == "orc" else write_ipc
    res = write_fn(ds, args.output).to_pandas()
    print(
        json.dumps(
            {"files": len(res), "records": int(res["records"].sum()), "output": args.output}
        )
    )
    ray.shutdown()
    return 0


def _cmd_export_seqfile(args) -> int:
    """docs parquet -> sharded Hadoop SequenceFile (Text key column +
    BytesWritable value column; sources/seqfile.py)."""
    ray = _init_ray(args.num_cpus)
    import ray.data as rd

    from .sources.seqfile import write_seqfile

    ds = rd.read_parquet(args.input, columns=[args.key_col, args.value_col])
    res = write_seqfile(
        ds, args.output, key_col=args.key_col, value_col=args.value_col
    ).to_pandas()
    print(
        json.dumps(
            {"files": len(res), "records": int(res["records"].sum()), "output": args.output}
        )
    )
    ray.shutdown()
    return 0


def _cmd_query(args) -> int:
    from .pipelines.queries import REGISTRY

    if args.list:
        for name, (_fn, sql) in REGISTRY.items():
            print(f"{name}\t{'sql-checked' if sql else 'rows-only'}")
        return 0
    if args.name not in REGISTRY:
        print(f"unknown query {args.name!r}; use --list", file=sys.stderr)
        return 2
    ray = _init_ray(args.num_cpus)
    fn = REGISTRY[args.name][0]
    res = fn(args.sf_dir)
    if args.output:
        if hasattr(res, "write_parquet"):
            res.write_parquet(args.output)
        else:
            import pandas as pd
            import pyarrow as pa
            import pyarrow.parquet as pq

            table = res if isinstance(res, pa.Table) else pa.Table.from_pandas(
                res if isinstance(res, pd.DataFrame) else res.to_pandas()
            )
            os.makedirs(args.output, exist_ok=True)
            pq.write_table(table, os.path.join(args.output, "part-00000.parquet"))
        print(json.dumps({"query": args.name, "output": args.output}))
    else:
        # only the displayed page leaves the cluster
        if hasattr(res, "limit") and hasattr(res, "to_pandas"):
            df = res.limit(args.head).to_pandas()
        else:
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
        print(df.head(args.head).to_string())
    ray.shutdown()
    return 0


def _cmd_compact(args) -> int:
    """Coalesce a directory of small parquet files into ~target-size
    outputs. The resumable-output discipline (one file per shard /
    partition per attempt) trades write-side idempotence for a long
    tail of small files; compaction restores read efficiency — row
    groups sized so a scan's per-file overhead amortizes. Refuses a
    non-empty output dir (same stale-mix rule as ``parse``)."""
    if not os.path.isdir(args.input):
        print(f"error: input dir {args.input} does not exist", file=sys.stderr)
        return 2
    in_files = [f for f in os.listdir(args.input) if f.endswith(".parquet")]
    if not in_files:
        print(
            f"error: input dir {args.input} contains no parquet files",
            file=sys.stderr,
        )
        return 2
    if os.path.isdir(args.output) and any(
        f.endswith(".parquet") for f in os.listdir(args.output)
    ):
        print(
            f"error: output dir {args.output} already contains parquet files; "
            "use a fresh directory",
            file=sys.stderr,
        )
        return 2
    ray = _init_ray(args.num_cpus)
    import ray.data as rd

    in_bytes = sum(os.path.getsize(os.path.join(args.input, f)) for f in in_files)
    target = max(1, -(-in_bytes // (args.target_mb << 20)))
    ds = rd.read_parquet(args.input)
    # repartition without shuffle: coalesce/split whole blocks, no
    # all-to-all — compaction moves bytes once, not twice
    ds.repartition(target).write_parquet(args.output)
    n_out = sum(1 for f in os.listdir(args.output) if f.endswith(".parquet"))
    print(
        json.dumps(
            {
                "input_bytes": in_bytes,
                "files_out": n_out,
                "target_files": target,
                "output": args.output,
            }
        )
    )
    ray.shutdown()
    return 0


def _cmd_synth(args) -> int:
    ray = _init_ray(args.num_cpus)
    from .sources.synth import write_pages_parquet_ray

    n = write_pages_parquet_ray(args.output, args.sf, args.seed)
    print(json.dumps({"pages": n, "output": args.output}))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="commoncrawl_ray")
    p.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU cap")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run/resume the epoch crawl loop")
    c.add_argument("--ckpt", required=True)
    c.add_argument("--sf", type=float, default=0.001)
    c.add_argument("--seed", type=int, default=42)
    c.add_argument("--epochs", type=int, default=3)
    c.add_argument("--burst", type=int, default=4)
    c.add_argument("--seen-partitions", type=int, default=8)
    c.add_argument("--resume", action="store_true")
    c.add_argument(
        "--epoch-seconds",
        type=float,
        default=None,
        help="honor robots Crawl-delay: cap each host at "
        "floor(epoch_seconds/delay) fetches per epoch",
    )
    c.add_argument(
        "--snapshot", type=int, default=0, help="universe content version"
    )
    c.add_argument(
        "--revisit-from",
        default=None,
        help="previous crawl's ckpt dir: unchanged payloads become WARC "
        "revisit records (use with --archive)",
    )
    c.add_argument(
        "--archive", action="store_true", help="side-write .warc.gz archives"
    )
    c.set_defaults(fn=_cmd_crawl)

    pp = sub.add_parser("parse", help="pages parquet -> docs parquet")
    pp.add_argument("--input", required=True)
    pp.add_argument("--output", required=True)
    pp.set_defaults(fn=_cmd_parse)

    q = sub.add_parser("query", help="run a registry query")
    q.add_argument("name", nargs="?")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--output", default=None)
    q.add_argument("--head", type=int, default=20)
    q.add_argument("--list", action="store_true")
    q.set_defaults(fn=_cmd_query)

    cp = sub.add_parser("compact", help="coalesce small parquet files")
    cp.add_argument("--input", required=True)
    cp.add_argument("--output", required=True)
    cp.add_argument("--target-mb", type=int, default=128)
    cp.set_defaults(fn=_cmd_compact)

    ew = sub.add_parser("export-warc", help="pages parquet -> .warc.gz archive")
    ew.add_argument("--input", required=True)
    ew.add_argument("--output", required=True)
    ew.set_defaults(fn=_cmd_export_warc)

    ez = sub.add_parser(
        "export-wacz", help="pages parquet -> self-contained .wacz packages"
    )
    ez.add_argument("--input", required=True)
    ez.add_argument("--output", required=True)
    ez.set_defaults(fn=_cmd_export_wacz)

    et = sub.add_parser(
        "export-wet", help="pages parquet -> parse -> .wet.gz extracted text"
    )
    et.add_argument("--input", required=True)
    et.add_argument("--output", required=True)
    et.set_defaults(fn=_cmd_export_wet)

    etf = sub.add_parser(
        "export-tfrecord", help="docs parquet -> sharded .tfrecord"
    )
    etf.add_argument("--input", required=True)
    etf.add_argument("--output", required=True)
    etf.set_defaults(fn=_cmd_export_tfrecord)

    eav = sub.add_parser("export-avro", help="docs parquet -> sharded Avro OCF")
    eav.add_argument("--input", required=True)
    eav.add_argument("--output", required=True)
    eav.add_argument("--codec", default="deflate", choices=["null", "deflate"])
    eav.set_defaults(fn=_cmd_export_avro)

    for _fmt, _help in (
        ("orc", "docs parquet -> sharded ORC (zlib stripes)"),
        ("ipc", "docs parquet -> sharded Arrow IPC / Feather v2 (zstd)"),
    ):
        ec = sub.add_parser(f"export-{_fmt}", help=_help)
        ec.add_argument("--input", required=True)
        ec.add_argument("--output", required=True)
        ec.set_defaults(fn=_cmd_export_columnar, fmt=_fmt)

    esq = sub.add_parser(
        "export-seqfile", help="docs parquet -> sharded Hadoop SequenceFile"
    )
    esq.add_argument("--input", required=True)
    esq.add_argument("--output", required=True)
    esq.add_argument("--key-col", default="doc_id")
    esq.add_argument("--value-col", default="text")
    esq.set_defaults(fn=_cmd_export_seqfile)

    ic = sub.add_parser(
        "index-cdx", help=".warc.gz archive dir -> sorted CDXJ capture index"
    )
    ic.add_argument("--input", required=True)
    ic.add_argument("--output", required=True)
    ic.set_defaults(fn=_cmd_index_cdx)

    s = sub.add_parser("synth", help="generate a synthetic pages universe")
    s.add_argument("--output", required=True)
    s.add_argument("--sf", type=float, default=0.001)
    s.add_argument("--seed", type=int, default=42)
    s.set_defaults(fn=_cmd_synth)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
