"""Crawl-order + URL-seen parity: distributed engine vs single-process
oracle under identical seed list + politeness budget (the north rule's
correctness gate), plus kill/resume parity."""

import shutil

import numpy as np
import pytest

from commoncrawl_ray.pipelines.common import CrawlConfig
from commoncrawl_ray.pipelines.oracle import oracle_crawl

CFG = CrawlConfig(sf=0.001, seed=42, max_epochs=3, num_seen_partitions=8)


@pytest.fixture(scope="module")
def oracle_result():
    return oracle_crawl(CFG)


def test_oracle_shape(oracle_result):
    res = oracle_result
    assert res.epochs_run == 3
    actions = {r["action"] for r in res.log}
    assert "fetched" in actions and "budget_deferred" in actions
    assert "dup_skipped" in actions
    assert len(res.seen) > 100
    # seq dense per epoch
    by_epoch = {}
    for r in res.log:
        by_epoch.setdefault(r["epoch"], []).append(r["seq"])
    for e, seqs in by_epoch.items():
        assert sorted(seqs) == list(range(len(seqs))), e


def test_oracle_deterministic():
    a = oracle_crawl(CFG)
    b = oracle_crawl(CFG)
    assert a.seen == b.seen
    assert a.log == b.log


def test_engine_matches_oracle(ray_session, oracle_result, tmp_path_factory):
    from commoncrawl_ray.pipelines.crawl import crawl

    ckpt = str(tmp_path_factory.mktemp("crawl_ckpt"))
    res = crawl(CFG, ckpt)
    assert res.epochs_run == oracle_result.epochs_run

    # URL-seen parity: exact set equality
    seen_engine = set(res.seen_table().column("url_fp").to_pylist())
    assert seen_engine == oracle_result.seen

    # crawl-order parity: row-for-row over (epoch, seq) -> full record
    log = res.log_table().to_pylist()
    want = [
        {
            k: r[k]
            for k in (
                "epoch",
                "seq",
                "url_fp",
                "host_fp",
                "canon_url",
                "action",
                "http_status",
                "depth",
            )
        }
        for r in oracle_result.log
    ]
    got = [
        {
            k: r[k]
            for k in (
                "epoch",
                "seq",
                "url_fp",
                "host_fp",
                "canon_url",
                "action",
                "http_status",
                "depth",
            )
        }
        for r in log
    ]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, (g, w)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_resume_parity(ray_session, oracle_result, tmp_path_factory):
    """Kill after epoch 1 (simulated: run 2 epochs), resume to 3 —
    final state identical to an uninterrupted run."""
    from dataclasses import replace

    from commoncrawl_ray.pipelines.crawl import crawl

    ckpt = str(tmp_path_factory.mktemp("crawl_resume"))
    cfg2 = replace(CFG, max_epochs=2)
    crawl(cfg2, ckpt)
    res = crawl(CFG, ckpt, resume=True)
    assert res.epochs_run == 3
    seen_engine = set(res.seen_table().column("url_fp").to_pylist())
    assert seen_engine == oracle_result.seen
    log = res.log_table()
    assert log.num_rows == len(oracle_result.log)
    got_fps = log.column("url_fp").to_pylist()
    want_fps = [r["url_fp"] for r in oracle_result.log]
    assert got_fps == want_fps
    shutil.rmtree(ckpt, ignore_errors=True)


def test_skewed_budget_parity(ray_session, tmp_path_factory):
    """Tiny budget + Zipf mega-host => most frontier rows are trimmed
    by the pre-shuffle skew combiner; the fetched/deferred/log split
    must still match the oracle exactly (combiner-deferred rows are
    provably not in any host's global top-budget)."""
    from commoncrawl_ray.pipelines.crawl import crawl
    from commoncrawl_ray.state.politeness import PolitenessPolicy

    cfg = CrawlConfig(
        sf=0.001,
        seed=42,
        max_epochs=3,
        num_seen_partitions=4,
        policy=PolitenessPolicy(burst=2, refill=2),
    )
    want = oracle_crawl(cfg)
    ckpt = str(tmp_path_factory.mktemp("crawl_skew"))
    res = crawl(cfg, ckpt)
    assert res.epochs_run == want.epochs_run
    assert set(res.seen_table().column("url_fp").to_pylist()) == want.seen
    got = res.log_table().to_pylist()
    keys = ("epoch", "seq", "url_fp", "host_fp", "canon_url", "action", "http_status", "depth")
    assert [{k: r[k] for k in keys} for r in got] == [{k: r[k] for k in keys} for r in want.log]


def test_cuckoo_filter_parity(ray_session, oracle_result, tmp_path_factory):
    """Swapping the URL-seen fast path from bloom to the cuckoo filter
    must not change the crawl AT ALL — the exact set is authoritative
    (state/url_seen.py); the filter only short-circuits lookups."""
    import dataclasses

    from commoncrawl_ray.pipelines.crawl import crawl

    cfg = dataclasses.replace(CFG, seen_filter_kind="cuckoo")
    ckpt = str(tmp_path_factory.mktemp("crawl_ckpt_cuckoo"))
    res = crawl(cfg, ckpt)
    seen_engine = set(res.seen_table().column("url_fp").to_pylist())
    assert seen_engine == oracle_result.seen
    log = res.log_table().to_pylist()
    assert len(log) == len(oracle_result.log)
    for got, want in zip(log, oracle_result.log):
        assert got["epoch"] == want["epoch"] and got["seq"] == want["seq"]
        assert got["url_fp"] == want["url_fp"] and got["action"] == want["action"]


def test_pagerank_priority_parity(ray_session, tmp_path_factory):
    """priority_kind="pagerank" (VERDICT r3 #8): epoch-k host PageRank
    over the accumulated fetch-log edges feeds epoch-k+1 frontier
    priority. Distributed pagerank_edges + merge_join reprioritization
    must reproduce the single-process oracle's crawl order exactly —
    including the priority floats (6-decimal-rounded ranks + one
    addition on both sides), which ARE the sort key."""
    from commoncrawl_ray.pipelines.crawl import crawl

    cfg = CrawlConfig(
        sf=0.001,
        seed=42,
        max_epochs=3,
        num_seen_partitions=8,
        priority_kind="pagerank",
        pr_iters=4,
    )
    want = oracle_crawl(cfg)
    # the priority signal must actually change the order vs depth mode
    base = oracle_crawl(CFG)
    assert [r["url_fp"] for r in want.log] != [r["url_fp"] for r in base.log]

    ckpt = str(tmp_path_factory.mktemp("crawl_pagerank"))
    res = crawl(cfg, ckpt)
    assert res.epochs_run == want.epochs_run
    assert set(res.seen_table().column("url_fp").to_pylist()) == want.seen
    got = res.log_table().to_pylist()
    keys = (
        "epoch",
        "seq",
        "url_fp",
        "host_fp",
        "canon_url",
        "action",
        "http_status",
        "depth",
    )
    assert len(got) == len(want.log)
    for g, w in zip(got, want.log):
        assert {k: g[k] for k in keys} == {k: w[k] for k in keys}, (g, w)
    # priority floats themselves match bit-for-bit (they define order)
    got_prio = [r["priority"] for r in got]
    want_prio = [r["priority"] for r in want.log]
    assert got_prio == want_prio
    shutil.rmtree(ckpt, ignore_errors=True)


def test_pagerank_priority_resume_parity(ray_session, tmp_path_factory):
    """Kill/resume under pagerank priority: the host-edge side-writes
    of completed epochs persist in the checkpoint, so the resumed run
    recomputes identical ranks and the final state matches an
    uninterrupted run."""
    from dataclasses import replace

    from commoncrawl_ray.pipelines.crawl import crawl

    cfg = CrawlConfig(
        sf=0.001,
        seed=42,
        max_epochs=3,
        num_seen_partitions=8,
        priority_kind="pagerank",
        pr_iters=4,
    )
    want = oracle_crawl(cfg)
    ckpt = str(tmp_path_factory.mktemp("crawl_pr_resume"))
    crawl(replace(cfg, max_epochs=2), ckpt)
    res = crawl(cfg, ckpt, resume=True)
    assert res.epochs_run == 3
    assert set(res.seen_table().column("url_fp").to_pylist()) == want.seen
    log = res.log_table()
    assert log.num_rows == len(want.log)
    assert log.column("url_fp").to_pylist() == [r["url_fp"] for r in want.log]
    shutil.rmtree(ckpt, ignore_errors=True)


def test_sitemap_seed_parity(ray_session, tmp_path_factory):
    """seed_source="list+sitemap": the engine ingests the sitemap seed
    slice THROUGH the real XML shard files (write->read->parse) while
    the oracle derives the same set from the shared kernel — parity
    here validates the XML layer inside a full crawl, and the crawl
    must reach hosts the anchor list alone never discovers."""
    import dataclasses

    from commoncrawl_ray.functions.fingerprint import fp64
    from commoncrawl_ray.pipelines.crawl import crawl
    from commoncrawl_ray.sources.synth import get_universe

    cfg = dataclasses.replace(CFG, seed_source="list+sitemap")
    want = oracle_crawl(cfg)
    ckpt = str(tmp_path_factory.mktemp("crawl_sitemap"))
    res = crawl(cfg, ckpt)
    assert res.epochs_run == want.epochs_run
    assert set(res.seen_table().column("url_fp").to_pylist()) == want.seen
    got = res.log_table().to_pylist()
    keys = ("epoch", "seq", "url_fp", "host_fp", "canon_url", "action", "http_status", "depth")
    assert [{k: r[k] for k in keys} for r in got] == [{k: r[k] for k in keys} for r in want.log]
    # the sitemap slice buys coverage: fetched hosts the anchor-only
    # crawl can never reach (their pages are linked only from within)
    uni = get_universe(cfg.sf, cfg.seed)
    sm_hosts = {fp64(h) for h in uni.hosts if (fp64(h) % 10) >= 8}
    fetched_hosts = {r["host_fp"] for r in got if r["action"] == "fetched"}
    assert fetched_hosts & sm_hosts
    anchor_only = oracle_crawl(CFG)
    assert len(want.seen) > len(anchor_only.seen)


def test_engine_matches_oracle_with_crawl_delay(ray_session, tmp_path_factory):
    """Crawl-delay honoring (policy.epoch_seconds) must preserve exact
    engine/oracle parity: per-host budgets capped by the declared delay
    flow through the skew combiner AND the sort-block select, and the
    capped selection is still the global per-host top-B_h."""
    from commoncrawl_ray.pipelines.crawl import crawl
    from commoncrawl_ray.state.politeness import PolitenessPolicy
    from commoncrawl_ray.state.robots import delay_from_fp

    cfg = CrawlConfig(
        sf=0.001,
        seed=42,
        max_epochs=3,
        num_seen_partitions=8,
        policy=PolitenessPolicy(burst=4, refill=4, epoch_seconds=3.0),
    )
    want = oracle_crawl(cfg)
    ckpt = str(tmp_path_factory.mktemp("delay_ckpt"))
    res = crawl(cfg, ckpt)

    assert set(res.seen_table().column("url_fp").to_pylist()) == want.seen
    keys = (
        "epoch", "seq", "url_fp", "host_fp", "canon_url",
        "action", "http_status", "priority", "depth",
    )
    got = [{k: r[k] for k in keys} for r in res.log_table().to_pylist()]
    assert got == [{k: r[k] for k in keys} for r in want.log]

    # the cap visibly bit: a delay-declaring host fetched <= its cap
    per: dict = {}
    for r in got:
        if r["action"] == "fetched":
            per[(r["epoch"], r["host_fp"])] = per.get((r["epoch"], r["host_fp"]), 0) + 1
    assert any(delay_from_fp(hf) is not None for (_e, hf) in per)
    for (_e, hf), n in per.items():
        d = delay_from_fp(hf)
        if d is not None:
            assert n <= max(1, int(3.0 // d))


def test_recrawl_revisit_parity_and_archive(ray_session, tmp_path_factory):
    """Incremental recrawl: snapshot-1 crawl seeded with the snapshot-0
    crawl's digest side-writes must (a) match the sequential oracle
    row-for-row — fetched pages whose payload is unchanged become
    ``revisit_unchanged`` log rows — and (b) write WARC revisit records
    (identical-payload-digest profile) for exactly those captures, with
    full response records for changed/new pages."""
    from dataclasses import replace

    from commoncrawl_ray.pipelines.crawl import crawl
    from commoncrawl_ray.pipelines.oracle import oracle_crawl
    from commoncrawl_ray.sources.warc import iter_warc_records

    keys = (
        "epoch", "seq", "url_fp", "host_fp", "canon_url",
        "action", "http_status", "priority", "depth",
    )

    cfg0 = CrawlConfig(sf=0.001, seed=42, max_epochs=2, num_seen_partitions=8)
    o0 = oracle_crawl(cfg0)
    ck0 = str(tmp_path_factory.mktemp("rv0"))
    r0 = crawl(cfg0, ck0)
    assert [
        {k: r[k] for k in keys} for r in r0.log_table().to_pylist()
    ] == [{k: r[k] for k in keys} for r in o0.log]

    cfg1 = CrawlConfig(
        sf=0.001,
        seed=42,
        max_epochs=2,
        num_seen_partitions=8,
        snapshot=1,
        revisit_from=ck0,
        archive_format="warc",
    )
    o1 = oracle_crawl(replace(cfg1, revisit_from=None), revisit_digests=o0.digests)
    ck1 = str(tmp_path_factory.mktemp("rv1"))
    r1 = crawl(cfg1, ck1)
    got = [{k: r[k] for k in keys} for r in r1.log_table().to_pylist()]
    assert got == [{k: r[k] for k in keys} for r in o1.log]

    by_action = {}
    for r in got:
        by_action.setdefault(r["action"], set()).add(r["canon_url"])
    assert by_action.get("revisit_unchanged"), "churn model must leave revisits"
    assert by_action.get("fetched"), "churn model must change some pages"

    # archive audit: revisit records == revisit_unchanged log rows,
    # response records == fetched 200s; revisit blocks carry headers
    # only + the netpreserve profile + a refers-date in the past
    import glob
    import os

    rev_urls, resp_urls = set(), set()
    for f in glob.glob(os.path.join(ck1, "archive_*", "*.warc.gz")):
        with open(f, "rb") as fh:
            raw = fh.read()
        for rec in iter_warc_records(raw, rec_type=None):
            if rec.rec_type == "revisit":
                rev_urls.add(rec.url)
                assert rec.fields["warc-profile"].endswith(
                    "identical-payload-digest"
                )
                assert rec.fields["warc-refers-to-target-uri"] == rec.url
                # headers only (either terminator style), never a body
                assert rec.block.endswith(b"\r\n\r\n") or rec.block.endswith(
                    b"\n\n"
                )
                assert b"<html" not in rec.block
            elif rec.rec_type == "response":
                resp_urls.add(rec.url)
    assert rev_urls == by_action["revisit_unchanged"]
    fetched_200 = {
        r["canon_url"]
        for r in got
        if r["action"] == "fetched" and r["http_status"] == 200
    }
    assert resp_urls == fetched_200


def test_digest_store_pool_latest_wins(ray_session, tmp_path):
    """DigestStorePool: routed load + searchsorted lookup; duplicate
    fps keep the LATEST capture (max ts)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from commoncrawl_ray.state.digests import DigestStorePool

    d = tmp_path / "digests_0"
    d.mkdir()
    fps = np.array([10, 20, 30, 10], dtype=np.int64)
    digs = np.array([111, 222, 333, 999], dtype=np.int64)
    tss = np.array([0, 0, 0, 1000], dtype=np.int64)  # fp 10 recaptured later
    pq.write_table(
        pa.table(
            {
                "url_fp": pa.array(fps),
                "digest64": pa.array(digs),
                "ts_ms": pa.array(tss),
            }
        ),
        str(d / "dg-x.parquet"),
    )
    pool = DigestStorePool(4)
    assert pool.load_from_parquet([str(d)]) == 3  # dup fp collapsed
    dig, ts = pool.lookup(np.array([10, 20, 30, 40], dtype=np.int64))
    assert dig.tolist() == [999, 222, 333, 0]
    assert ts.tolist() == [1000, 0, 0, 0]
