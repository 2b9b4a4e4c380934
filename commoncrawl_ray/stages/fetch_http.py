"""Concrete async HTTP fetch client behind the crawl's fetch row
contract (VERDICT r2 #8).

The crawl's fused fetch stage needs ``url -> (status, record_bytes)``
where ``record_bytes`` is the raw HTTP response (status line + headers
+ entity body) — exactly what the simulated fetcher synthesizes and
what ``extract_record`` / ``discover_links`` consume. This module
provides that function over real sockets with the reference's client
discipline, public behavior only:

- separate connect / read timeouts
  (io/internal/NIOHttpConnection.java:128-131);
- a per-process local DNS cache with a 1-hour TTL floor
  (io/internal/NIODNSLocalResolver.java:71 — same floor as
  state/dns.py's distributed trie actors);
- bounded in-flight connections per fetcher (the reference's
  single-threaded NIO event loop, async/EventLoop.java:32, realized
  here as one asyncio loop thread + a semaphore).

stdlib asyncio only (aiohttp isn't in the runtime env). The sandbox
has no external network, so the loopback parity test
(tests/test_fetch_http.py) serves the synthetic universe's raw records
over real sockets and asserts the HTTP-fetched crawl equals the
simulated crawl byte-for-byte.
"""

from __future__ import annotations

import asyncio
import contextlib
import socket
import threading

import pyarrow as pa

_DEFAULT_UA = "commoncrawl-ray/0.1"


def _split_url(url: str) -> tuple[str, int, str]:
    """http URL -> (host, port, path-with-query). https is accepted but
    fetched in plaintext only when explicitly overridden to a loopback
    endpoint (no TLS stack in scope)."""
    rest = url.split("://", 1)[1] if "://" in url else url
    hostport, _, path = rest.partition("/")
    host, _, port_s = hostport.partition(":")
    port = int(port_s) if port_s else 80
    return host, port, "/" + path


class AsyncHttpFetcher:
    """Bounded-concurrency asyncio HTTP/1.x GET client.

    One instance per worker process/actor (create in ``__init__`` of a
    callable map_batches class, or via :func:`get_fetcher`); the event
    loop lives on a dedicated daemon thread so ``fetch_many`` is a
    plain synchronous call usable inside a Ray task.
    """

    def __init__(
        self,
        connect_timeout: float = 10.0,
        read_timeout: float = 30.0,
        max_in_flight: int = 64,
        max_body: int = 2 << 20,
        dns_ttl_floor: float = 3600.0,
        dns_override: dict | None = None,
        user_agent: str = _DEFAULT_UA,
    ):
        self.connect_timeout = connect_timeout
        self.read_timeout = read_timeout
        self.max_body = max_body
        self.dns_ttl_floor = dns_ttl_floor
        # host -> (ip, port) or ip; static routing for loopback tests /
        # split-horizon deployments. Checked before the cache.
        self.dns_override = dns_override or {}
        self.user_agent = user_agent
        self._dns_cache: dict[str, tuple[str, float]] = {}
        self._loop = asyncio.new_event_loop()
        self._thread = threading.Thread(
            target=self._loop.run_forever, name="ccray-fetch-loop", daemon=True
        )
        self._thread.start()
        self._sem = asyncio.run_coroutine_threadsafe(
            self._make_sem(max_in_flight), self._loop
        ).result()

    @staticmethod
    async def _make_sem(n: int) -> asyncio.Semaphore:
        return asyncio.Semaphore(n)

    # --- DNS ----------------------------------------------------------
    async def _resolve(self, host: str, port: int) -> tuple[str, int]:
        ov = self.dns_override.get(host)
        if ov is None:
            ov = self.dns_override.get("*")  # catch-all (proxy routing)
        if ov is not None:
            return ov if isinstance(ov, tuple) else (ov, port)
        hit = self._dns_cache.get(host)
        now = self._loop.time()
        if hit is not None and hit[1] > now:
            return hit[0], port
        infos = await self._loop.getaddrinfo(host, port, type=socket.SOCK_STREAM)
        ip = infos[0][4][0]
        # getaddrinfo exposes no record TTL; the reference floors
        # cached entries at 1 h anyway, which is the behavior kept here
        self._dns_cache[host] = (ip, now + self.dns_ttl_floor)
        return ip, port

    # --- response reading --------------------------------------------
    async def _read_response(self, reader: asyncio.StreamReader) -> tuple[int, bytes]:
        header_raw = bytearray()
        status = 0
        first = True
        content_length = None
        chunked = False
        while True:
            line = await reader.readline()
            if not line:
                break
            header_raw += line
            if line in (b"\r\n", b"\n"):
                break
            if first:
                first = False
                parts = line.split(None, 2)
                if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
                    try:
                        status = int(parts[1])
                    except ValueError:
                        status = 0
            else:
                k, sep, v = line.partition(b":")
                if sep:
                    kl = k.strip().lower()
                    if kl == b"content-length":
                        with contextlib.suppress(ValueError):
                            content_length = int(v.strip())
                    elif kl == b"transfer-encoding" and b"chunked" in v.lower():
                        chunked = True
        if chunked:
            body = await self._read_chunked(reader)
            # record contract carries an identity body: drop the
            # transfer-encoding line, append the actual length
            lines = [
                ln
                for ln in bytes(header_raw).splitlines(keepends=True)
                if not ln.lower().startswith(b"transfer-encoding")
            ]
            term = lines.pop() if lines and lines[-1] in (b"\r\n", b"\n") else b"\r\n"
            header_raw = bytearray(
                b"".join(lines) + b"Content-Length: %d\r\n" % len(body) + term
            )
        elif content_length is not None:
            body = await reader.readexactly(min(content_length, self.max_body))
            if content_length > self.max_body:
                # truncated: rewrite Content-Length to the actual body
                # length so the record stays internally consistent
                # (mirrors the dechunk path above; ADVICE r3) and mark
                # the truncation like the reference's
                # ContentTruncated flag (Constants.java x_commoncrawl_*)
                lines = []
                for ln in bytes(header_raw).splitlines(keepends=True):
                    if ln.lower().startswith(b"content-length"):
                        continue
                    lines.append(ln)
                term = (
                    lines.pop() if lines and lines[-1] in (b"\r\n", b"\n") else b"\r\n"
                )
                header_raw = bytearray(
                    b"".join(lines)
                    + b"Content-Length: %d\r\n" % len(body)
                    + b"x-commoncrawl-ContentTruncated: truncated-in-download\r\n"
                    + term
                )
                # connection is Connection: close per request; the
                # unread remainder is dropped with the socket
        else:
            body = await reader.read(self.max_body)
        return status, bytes(header_raw) + body

    async def _read_chunked(self, reader: asyncio.StreamReader) -> bytes:
        out = bytearray()
        while True:
            size_line = await reader.readline()
            try:
                size = int(size_line.split(b";", 1)[0].strip() or b"0", 16)
            except ValueError:
                break
            if size == 0:
                # trailers until blank line
                while True:
                    t = await reader.readline()
                    if t in (b"\r\n", b"\n", b""):
                        break
                break
            take = min(size, self.max_body - len(out))
            out += await reader.readexactly(take)
            if take < size:  # cap hit: drain the rest of this chunk
                await reader.readexactly(size - take)
            await reader.readline()  # chunk-terminating CRLF
            if len(out) >= self.max_body:
                break
        return bytes(out)

    # --- fetch --------------------------------------------------------
    async def _fetch_one(self, url: str) -> tuple[int, bytes]:
        try:
            host, port, path = _split_url(url)
            ip, port = await self._resolve(host, port)
            async with self._sem:
                reader, writer = await asyncio.wait_for(
                    asyncio.open_connection(ip, port), self.connect_timeout
                )
                try:
                    req = (
                        f"GET {path} HTTP/1.1\r\n"
                        f"Host: {host}\r\n"
                        f"User-Agent: {self.user_agent}\r\n"
                        "Accept-Encoding: identity\r\n"
                        "Connection: close\r\n\r\n"
                    )
                    writer.write(req.encode("latin-1"))
                    await writer.drain()
                    status, record = await asyncio.wait_for(
                        self._read_response(reader), self.read_timeout
                    )
                finally:
                    writer.close()
                    with contextlib.suppress(Exception):
                        await writer.wait_closed()
            return status, record
        except Exception:
            # connect/DNS/timeout/protocol failure -> status 0, no
            # record (the crawl logs it as a failed fetch, no links)
            return 0, b""

    async def _gather(self, urls: list[str]) -> list[tuple[int, bytes]]:
        return await asyncio.gather(*(self._fetch_one(u) for u in urls))

    def fetch_many(self, urls: list[str]) -> list[tuple[int, bytes]]:
        """Fetch a batch concurrently; returns ``[(status, record)]``
        aligned with ``urls``. status 0 = transport failure."""
        if not urls:
            return []
        return asyncio.run_coroutine_threadsafe(
            self._gather(list(urls)), self._loop
        ).result()

    def close(self):
        self._loop.call_soon_threadsafe(self._loop.stop)
        self._thread.join(timeout=5)
        with contextlib.suppress(Exception):
            self._loop.close()


# per-worker fetcher reuse across batches/epochs (task-pool stages
# can't hold state in __init__; same discipline as get_universe)
_FETCHER_CACHE: dict[tuple, AsyncHttpFetcher] = {}


def _freeze(v):
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    return v


def get_fetcher(opts: dict | None = None) -> AsyncHttpFetcher:
    key = _freeze(opts or {})
    f = _FETCHER_CACHE.get(key)
    if f is None:
        f = AsyncHttpFetcher(**(opts or {}))
        _FETCHER_CACHE[key] = f
    return f


class HttpFetchStage:
    """Actor-pool ``map_batches`` stage: append ``http_status:int16``
    and ``record:binary`` columns fetched for each row's ``url_col``.
    Client setup (loop thread, DNS cache, semaphore) happens once per
    actor in ``__init__``; batches only do I/O."""

    def __init__(self, url_col: str = "canon_url", **opts):
        self.url_col = url_col
        self.fetcher = AsyncHttpFetcher(**opts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column(self.url_col).to_pylist()
        res = self.fetcher.fetch_many(urls)
        return batch.append_column(
            "http_status", pa.array([s for s, _ in res], pa.int16())
        ).append_column("record", pa.array([r for _, r in res], pa.binary()))
