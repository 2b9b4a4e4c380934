"""DNS cache — sharded actor pool with TTL semantics (SURVEY T3).

Ray-native re-expression of the reference's DNS cache
(`io/internal/NIODNSCache.java:51`): host → (ip, ttl, cname) entries
stored in a trie keyed by reversed host labels (`NIODNSCache` builds
the same reversed-label tree so `www.a.com` and `a.com` share the
`com→a` path), with the resolver's 1-hour minimum-TTL floor
(`NIOHttpConnection.java:131` MIN_DNS_CACHE_TIME). Expired entries
fall through to the resolver.

Only needed for LIVE fetching — the sandbox fetch is simulated — so
the resolver here is the same deterministic pure function pattern as
the robots rules: IPv4 derived from the host fingerprint. A real
deployment swaps ``_resolve_host`` for an async resolver
(`io/internal/NIODNSLocalResolver.java:71`); the cache, trie, TTL and
actor-pool routing are the production shapes.
"""

from __future__ import annotations

import numpy as np
import ray

from ..functions.fingerprint import fp64, fp64_batch
from ..functions.http import ipv4_int_to_str

MIN_DNS_CACHE_TIME_MS = 60 * 60 * 1000  # NIOHttpConnection.java:131


def _resolve_host(h: int) -> tuple[int, int]:
    """Simulated resolver: (ipv4_int, ttl_ms) from a host fingerprint.
    TTLs vary per host but never fall below the 1h floor."""
    ip = (10 << 24) | (h & 0xFFFFFF)
    ttl = MIN_DNS_CACHE_TIME_MS + (h % (4 * MIN_DNS_CACHE_TIME_MS))
    return ip, ttl


class DnsTrie:
    """Reversed-host-label trie (`NIODNSCache.java` node tree): one
    node per label, leaf nodes hold (ip, expires_at_ms)."""

    __slots__ = ("children", "entry")

    def __init__(self):
        self.children: dict[str, DnsTrie] = {}
        self.entry: tuple[int, int] | None = None  # (ip, expire_ms)

    def put(self, host: str, ip: int, expire_ms: int) -> None:
        node = self
        for label in reversed(host.split(".")):
            nxt = node.children.get(label)
            if nxt is None:
                nxt = DnsTrie()
                node.children[label] = nxt
            node = nxt
        node.entry = (ip, expire_ms)

    def get(self, host: str, now_ms: int) -> int | None:
        node = self
        for label in reversed(host.split(".")):
            node = node.children.get(label)
            if node is None:
                return None
        if node.entry is None:
            return None
        ip, expire = node.entry
        if expire <= now_ms:
            node.entry = None  # TTL eviction
            return None
        return ip

    def node_count(self) -> int:
        return sum(1 for _ in self._walk())

    def _walk(self):
        stack = [self]
        while stack:
            n = stack.pop()
            if n.entry is not None:
                yield n
            stack.extend(n.children.values())


@ray.remote(num_cpus=0)
class DnsCacheActor:
    """One shard of the DNS cache (route by host_fp % pool size).
    num_cpus=0: lookups are sub-millisecond dict walks."""

    def __init__(self):
        self.trie = DnsTrie()
        self.resolves = 0

    def resolve(self, hosts: list[str], now_ms: int) -> list[int]:
        """Batched host -> ipv4 int, consulting the trie first and
        resolving (simulated) + caching on miss with the TTL floor."""
        out = []
        misses = []
        for h in hosts:
            ip = self.trie.get(h, now_ms)
            if ip is None:
                misses.append(h)
            out.append(ip)
        if misses:
            distinct = sorted(set(misses))
            resolved = {}
            for h, fp in zip(distinct, fp64_batch(distinct).tolist()):
                ip, ttl = _resolve_host(fp & 0x7FFFFFFFFFFFFFFF)
                self.trie.put(h, ip, now_ms + max(ttl, MIN_DNS_CACHE_TIME_MS))
                resolved[h] = ip
                self.resolves += 1
            out = [resolved.get(h, ip) if ip is None else ip for h, ip in zip(hosts, out)]
        return out

    def stats(self) -> dict:
        return {"cached_nodes": self.trie.node_count(), "resolves": self.resolves}


class DnsCachePool:
    """host_fp-sharded DnsCacheActor pool."""

    def __init__(self, num_actors: int = 2):
        self.num_actors = num_actors
        self.actors = [DnsCacheActor.remote() for _ in range(num_actors)]

    def resolve(self, hosts: list[str], now_ms: int) -> list[str]:
        """Batched host -> dotted-quad, order preserved."""
        n = len(hosts)
        if n == 0:
            return []
        fps = np.fromiter((fp64(h) for h in hosts), dtype=np.int64, count=n)
        parts = fps.view(np.uint64) % np.uint64(self.num_actors)
        out = [None] * n
        refs, idxs = [], []
        for a in range(self.num_actors):
            sel = np.nonzero(parts == a)[0]
            if len(sel):
                refs.append(self.actors[a].resolve.remote([hosts[i] for i in sel], now_ms))
                idxs.append(sel)
        for sel, ips in zip(idxs, ray.get(refs)):
            for i, ip in zip(sel, ips):
                out[i] = ipv4_int_to_str(ip)
        return out
