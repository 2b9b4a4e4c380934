"""RFC 9309 robots.txt parsing + the HTTP robots crawl path (VERDICT
r4 missing #1): parser unit tests over the RFC's own example shapes,
failure-mode tests through a real loopback server, and full crawl
parity — an http-robots crawl against a loopback serving robots.txt
generated from the sim rule model must equal the sim crawl exactly.
"""

from __future__ import annotations

import pickle
import socketserver
import threading

import pytest

from commoncrawl_ray.state.robots import (
    ALLOW_ALL,
    DISALLOW_ALL,
    RobotsRules,
    is_blocked,
    parse_robots_txt,
    robots_rules_for_host,
)


def test_group_selection_exact_token_beats_star():
    txt = """
    User-agent: *
    Disallow: /private

    User-agent: FooBot
    Disallow: /foo-only
    """
    foo = parse_robots_txt(txt, "foobot")  # case-insensitive token match
    assert not foo.allowed("/foo-only/x")
    assert foo.allowed("/private/x")  # exclusive: no fallback merge with *
    other = parse_robots_txt(txt, "barbot")
    assert not other.allowed("/private/x")
    assert other.allowed("/foo-only/x")


def test_same_agent_groups_merge():
    txt = """
    User-agent: examplebot
    Disallow: /a

    User-agent: examplebot
    Disallow: /b
    """
    r = parse_robots_txt(txt, "ExampleBot")
    assert not r.allowed("/a/x") and not r.allowed("/b/x")
    assert r.allowed("/c")


def test_consecutive_user_agents_share_rules():
    txt = """
    User-agent: abot
    User-agent: bbot
    Disallow: /shared
    """
    for agent in ("abot", "bbot"):
        assert not parse_robots_txt(txt, agent).allowed("/shared/p")
    assert parse_robots_txt(txt, "cbot") is ALLOW_ALL or parse_robots_txt(
        txt, "cbot"
    ).allowed("/shared/p")


def test_longest_match_wins_and_allow_breaks_ties():
    # RFC 9309 §2.2.2 "most specific match" example shape
    txt = """
    User-agent: *
    Disallow: /example/
    Allow: /example/page/
    """
    r = parse_robots_txt(txt)
    assert not r.allowed("/example/other")
    assert r.allowed("/example/page/x")
    # equal-length tie -> allow wins (§2.2.2)
    tie = parse_robots_txt("User-agent: *\nDisallow: /p\nAllow: /p\n")
    assert tie.allowed("/p/anything")


def test_wildcards_and_end_anchor():
    txt = """
    User-agent: *
    Disallow: /*.gif$
    Disallow: /fish*.php
    """
    r = parse_robots_txt(txt)
    assert not r.allowed("/pics/cat.gif")
    assert r.allowed("/pics/cat.gif?x=1")  # $ anchors the end
    assert not r.allowed("/fishheads/catfish.php")
    assert r.allowed("/fishheads/catfish.html")


def test_rules_outside_groups_ignored_and_empty_disallow_allows():
    assert parse_robots_txt("Disallow: /\n").allowed("/anything")
    assert parse_robots_txt("User-agent: *\nDisallow:\n").allowed("/x")


def test_comments_crawl_delay_and_product_token():
    txt = """
    # robots for example.com
    User-agent: ccray/2.1   # version is not part of the token
    Disallow: /x  # trailing comment
    Crawl-delay: 2.5
    """
    r = parse_robots_txt(txt, "ccray")
    assert not r.allowed("/x/1")
    assert r.crawl_delay == 2.5


def test_rules_roundtrip_pickle_and_is_blocked_dispatch():
    r = parse_robots_txt("User-agent: *\nDisallow: /dir\n")
    r2 = pickle.loads(pickle.dumps(r))
    assert not r2.allowed("/dir/a") and r2.allowed("/other")
    assert is_blocked("http://h.example/dir/a", r2)
    assert not is_blocked("http://h.example/ok", r2)
    # sim prefix tuples still work through the same dispatch
    assert is_blocked("http://h.example/dir/a", ("/dir",))
    assert not is_blocked("http://h.example/ok", ())
    assert DISALLOW_ALL.allowed("/x") is False
    assert ALLOW_ALL.allowed("/x") is True


class _RobotsOnlyHandler(socketserver.StreamRequestHandler):
    """Serves /robots.txt with a host-configured (status, body)."""

    def handle(self):
        lines = []
        while True:
            line = self.rfile.readline()
            if not line or line in (b"\r\n", b"\n"):
                break
            lines.append(line)
        if not lines:
            return
        host = ""
        for ln in lines[1:]:
            k, sep, v = ln.decode("latin-1").partition(":")
            if sep and k.strip().lower() == "host":
                host = v.strip()
        status, body = self.server.responses.get(host, (404, b""))
        try:
            self.wfile.write(
                f"HTTP/1.1 {status} X\r\nContent-Length: {len(body)}\r\n\r\n".encode()
                + body
            )
        except (BrokenPipeError, ConnectionResetError):
            pass


def test_fetch_robots_http_failure_modes():
    from commoncrawl_ray.state.robots import fetch_robots_http

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _RobotsOnlyHandler)
    srv.daemon_threads = True
    srv.responses = {
        "ok.example": (200, b"User-agent: *\nDisallow: /dir\n"),
        "gone.example": (404, b""),
        "down.example": (500, b"oops"),
    }
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        opts = {"dns_override": {"*": ("127.0.0.1", srv.server_address[1])}}
        ok, gone, down, unreachable = fetch_robots_http(
            ["ok.example", "gone.example", "down.example", "nx.invalid"],
            {
                "dns_override": {
                    "ok.example": ("127.0.0.1", srv.server_address[1]),
                    "gone.example": ("127.0.0.1", srv.server_address[1]),
                    "down.example": ("127.0.0.1", srv.server_address[1]),
                    "nx.invalid": ("127.0.0.1", 1),  # connection refused
                }
            },
            "ccray",
        )
        assert not ok.allowed("/dir/x") and ok.allowed("/other")
        assert gone.allowed("/anything")  # 4xx unavailable => allow all
        assert not down.allowed("/anything")  # 5xx unreachable => disallow
        assert not unreachable.allowed("/anything")
        del opts
    finally:
        srv.shutdown()
        srv.server_close()


class _SynthWithRobotsHandler(socketserver.StreamRequestHandler):
    """The loopback synth-universe server, plus /robots.txt generated
    from the SAME deterministic rule model the sim robots path uses —
    so fetch+parse+apply must reproduce the sim crawl exactly."""

    def handle(self):
        lines = []
        while True:
            line = self.rfile.readline()
            if not line or line in (b"\r\n", b"\n"):
                break
            lines.append(line)
        if not lines:
            return
        try:
            _m, path, _v = lines[0].decode("latin-1").split()
        except ValueError:
            return
        host = ""
        for ln in lines[1:]:
            k, sep, v = ln.decode("latin-1").partition(":")
            if sep and k.strip().lower() == "host":
                host = v.strip()
        try:
            if path == "/robots.txt":
                from commoncrawl_ray.functions.fingerprint import fp64
                from commoncrawl_ray.state.robots import delay_from_fp

                rules = robots_rules_for_host(host)
                body = "User-agent: *\n" + "".join(
                    f"Disallow: {r}\n" for r in rules
                )
                d = delay_from_fp(fp64(host))
                if d is not None:
                    body += f"Crawl-delay: {d}\n"
                self.wfile.write(
                    f"HTTP/1.1 200 OK\r\nContent-Length: {len(body)}\r\n\r\n".encode()
                    + body.encode()
                )
                return
            rec = self.server.universe.synth_page(f"http://{host}{path}")
            if rec is None:
                self.wfile.write(
                    b"HTTP/1.1 404 Not Found\r\nContent-Length: 0\r\n\r\n"
                )
            else:
                self.wfile.write(rec)
        except (BrokenPipeError, ConnectionResetError):
            pass


def test_http_robots_crawl_matches_sim_crawl(ray_session, tmp_path_factory):
    """Full-path parity: fetch_kind='http' + robots_kind='http' against
    a loopback serving both pages and per-host robots.txt (generated
    from the sim rule model) must produce the sim crawl's exact log —
    including its robots_blocked rows — and URL-seen set."""
    from commoncrawl_ray.pipelines.common import CrawlConfig
    from commoncrawl_ray.pipelines.crawl import crawl
    from commoncrawl_ray.sources.synth import get_universe

    uni = get_universe(0.001, 42)
    srv = socketserver.ThreadingTCPServer(
        ("127.0.0.1", 0), _SynthWithRobotsHandler
    )
    srv.daemon_threads = True
    srv.universe = uni
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = dict(sf=0.001, seed=42, max_epochs=2, num_seen_partitions=4)
        sim = crawl(CrawlConfig(**base), str(tmp_path_factory.mktemp("sim_ck")))
        http = crawl(
            CrawlConfig(
                **base,
                fetch_kind="http",
                robots_kind="http",
                http_opts={
                    "dns_override": {"*": ("127.0.0.1", srv.server_address[1])}
                },
            ),
            str(tmp_path_factory.mktemp("http_ck")),
        )
        sim_log = sim.log_table().to_pylist()
        http_log = http.log_table().to_pylist()
        assert len(sim_log) == len(http_log)
        for a, b in zip(sim_log, http_log):
            assert a == b
        assert any(r["action"] == "robots_blocked" for r in sim_log)
        assert sim.seen_table().to_pydict() == http.seen_table().to_pydict()
    finally:
        srv.shutdown()
        srv.server_close()


def test_sitemap_directive_is_global_and_deduped():
    from commoncrawl_ray.state.robots import parse_robots_sitemaps

    body = """
User-agent: somebot
Disallow: /private
Sitemap: http://example.com/sitemap-a.xml

User-agent: *
Allow: /
sitemap: http://example.com/sitemap-b.xml  # case-insensitive key
Sitemap: http://example.com/sitemap-a.xml
Sitemap: /relative/ignored.xml
"""
    assert parse_robots_sitemaps(body) == [
        "http://example.com/sitemap-a.xml",
        "http://example.com/sitemap-b.xml",
    ]
    assert parse_robots_sitemaps("User-agent: *\nDisallow:") == []


def test_crawl_delay_budget_math():
    """host_budgets: floor(epoch_seconds/d) capped to base, floored at
    1 fetch/epoch; NaN (no declared delay) keeps the base budget."""
    import numpy as np

    from commoncrawl_ray.state.politeness import PolitenessPolicy

    p = PolitenessPolicy(burst=8, refill=8, epoch_seconds=6.0)
    got = p.host_budgets(8, np.array([np.nan, 1.0, 2.0, 3.0, 100.0, 0.5]))
    assert got.tolist() == [8, 6, 3, 2, 1, 8]
    # disabled policy: every host keeps the base budget
    off = PolitenessPolicy(burst=8, refill=8)
    assert off.host_budgets(8, np.array([np.nan, 1.0])).tolist() == [8, 8]


def test_delays_from_fps_matches_scalar():
    import numpy as np

    from commoncrawl_ray.state.robots import delay_from_fp, delays_from_fps

    fps = np.array([5, 18, -8, 31, 0, 12345, -98765], dtype=np.int64)
    vec = delays_from_fps(fps)
    for f, v in zip(fps.tolist(), vec.tolist()):
        want = delay_from_fp(f)
        assert (want is None and np.isnan(v)) or want == v


def test_http_crawl_delay_matches_sim_crawl(ray_session, tmp_path_factory):
    """Crawl-delay end-to-end over BOTH rule planes: with
    policy.epoch_seconds set, the sim crawl (delays from the fp model)
    and the http crawl (delays parsed from the loopback's real
    ``Crawl-delay:`` lines per RFC 9309) must produce the identical
    log and URL-seen set — and delay-capped hosts must actually fetch
    fewer pages per epoch than the scalar budget allows."""
    from commoncrawl_ray.functions.fingerprint import fp64
    from commoncrawl_ray.pipelines.common import CrawlConfig
    from commoncrawl_ray.pipelines.crawl import crawl
    from commoncrawl_ray.sources.synth import get_universe
    from commoncrawl_ray.state.politeness import PolitenessPolicy
    from commoncrawl_ray.state.robots import delay_from_fp

    uni = get_universe(0.001, 42)
    srv = socketserver.ThreadingTCPServer(
        ("127.0.0.1", 0), _SynthWithRobotsHandler
    )
    srv.daemon_threads = True
    srv.universe = uni
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        pol = PolitenessPolicy(burst=8, refill=8, epoch_seconds=4.0)
        base = dict(
            sf=0.001, seed=42, max_epochs=2, num_seen_partitions=4, policy=pol
        )
        sim = crawl(CrawlConfig(**base), str(tmp_path_factory.mktemp("simd_ck")))
        http = crawl(
            CrawlConfig(
                **base,
                fetch_kind="http",
                robots_kind="http",
                http_opts={
                    "dns_override": {"*": ("127.0.0.1", srv.server_address[1])}
                },
            ),
            str(tmp_path_factory.mktemp("httpd_ck")),
        )
        sim_log = sim.log_table().to_pylist()
        http_log = http.log_table().to_pylist()
        assert len(sim_log) == len(http_log)
        for a, b in zip(sim_log, http_log):
            assert a == b
        assert sim.seen_table().to_pydict() == http.seen_table().to_pydict()
        # the delay must have bitten: some host with a declared delay
        # fetched <= its cap in an epoch where more candidates existed
        per = {}
        for r in sim_log:
            if r["action"] == "fetched":
                per.setdefault((r["epoch"], r["host_fp"]), 0)
                per[(r["epoch"], r["host_fp"])] += 1
        capped = {
            hf
            for (_e, hf), n in per.items()
            if delay_from_fp(hf) is not None
        }
        assert capped, "test universe must contain delay-declaring hosts"
        for (e, hf), n in per.items():
            d = delay_from_fp(hf)
            if d is not None:
                assert n <= max(1, int(4.0 // d))
    finally:
        srv.shutdown()
        srv.server_close()
