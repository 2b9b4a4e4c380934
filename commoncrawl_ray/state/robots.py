"""Robots rules + caching actors.

The reference has NO robots.txt handling (SURVEY §0 — the only "robots"
is the HTML meta flag enum, ``protocol/shared/protocol.jr:31-38``); the
north rule requires robots caching actors built from scratch.

In the sandbox the robots.txt of a host is a *deterministic pure
function of the host name* (as the synthetic web itself is), so rules
can be computed anywhere; the ``RobotsCacheActor`` pool still models
the real deployment: one cache entry per host with a TTL, consulted
via batched lookups, partitioned by ``host_fp`` so each host's rules
are fetched/parsed once per TTL cluster-wide instead of once per task.
"""

from __future__ import annotations

import fnmatch  # noqa: F401 (reserved for wildcard rule extensions)

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


def path_of(canon_url: str) -> str:
    rest = canon_url.split("://", 1)[-1]
    slash = rest.find("/")
    return rest[slash:] if slash != -1 else "/"


def is_blocked(canon_url: str, rules: tuple[str, ...]) -> bool:
    if not rules:
        return False
    p = path_of(canon_url)
    return any(p.startswith(r) for r in rules)


@ray.remote(num_cpus=0)
class RobotsCacheActor:
    """Per-host robots cache with TTL (epoch-granularity clock).
    num_cpus=0: cache lookups are sub-millisecond; see UrlSeenActor."""

    def __init__(self, ttl_epochs: int = 8):
        self.cache: dict[str, tuple[int, tuple[str, ...]]] = {}
        self.ttl = ttl_epochs
        self.fetches = 0

    def rules_for(self, hosts: list[str], epoch: int) -> list[tuple[str, ...]]:
        cache = self.cache
        missing = [
            h
            for h in hosts
            if (hit := cache.get(h)) is None or epoch - hit[0] >= self.ttl
        ]
        if missing:
            # simulated robots.txt fetch+parse, VECTORIZED: the rules
            # derive from the host fingerprint, so hash all misses in
            # one numpy pass instead of a per-host Python Rabin loop
            # (the actor serializes all callers — scalar hashing here
            # was the top cost of the whole robots stage)
            from ..functions.fingerprint import fp64_batch

            self.fetches += len(missing)
            for h, fp in zip(missing, fp64_batch(missing).tolist()):
                cache[h] = (epoch, rules_from_fp(fp))
        return [cache[h][1] for h in hosts]

    def stats(self) -> dict:
        return {"hosts_cached": len(self.cache), "fetches": self.fetches}


class RobotsCachePool:
    """host_fp-partitioned pool of RobotsCacheActors."""

    def __init__(self, num_actors: int = 4, ttl_epochs: int = 8):
        self.num_actors = num_actors
        self.actors = [RobotsCacheActor.remote(ttl_epochs) for _ in range(num_actors)]

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
