"""Deterministic synthetic web universe (Common-Crawl-style pages).

The analogue of the reference's test-corpus synthesizer
(``src/test/.../ArcFileReaderTests.java:87-184,389-408`` writes a
spec-compliant ARC file from random records, then asserts byte-exact
round-trips). Here the "web" is a pure function:

- :func:`Universe` derives a Zipf-skewed host pool + per-host page
  counts from (sf, seed) only.
- :func:`Universe.synth_page` maps a canonical URL to the full raw
  HTTP record bytes (status line + headers + CRLFCRLF + body) — or
  None (404). Being a pure function of the URL is what lets the
  distributed fetch stage run as a stateless ``map_batches`` at
  10^10-URL scale with no page-table join (SURVEY §7 step 7): the
  parquet pages table is just this function materialized.

Variant mix (FIXTURES.md §1): charset declared in header / meta-only /
both (meta overrides header) / undeclared; gzip Content-Encoding (some
truncated mid-stream); LF-LF header terminators; non-HTML and junk
mime types; links carrying session ids, uppercase scheme/host, dot
segments, fragments, explicit :80 ports, relative forms; a few dead
links (404 path); IPv4 hosts; Zipf mega-hosts for skew.
"""

from __future__ import annotations

import gzip as _gzip
import random
from functools import lru_cache

import numpy as np

from ..functions.fingerprint import fp64

BASE_TS_MS = 1341100800000  # 2012-07-01T00:00:00Z (TIMESTAMP14-friendly)

_WORDS = {
    "en": (
        "the of and to in is was for on that with as his they be at one have "
        "this from or had by hot word but what some we can out other were all "
        "there when up use your how said an each she which do their time if "
        "will way about many then them write would like so these her long make "
        "thing see him two has look more day could go come did number sound no "
        "most people my over know water than call first who may down side been "
        "now find"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach wird bei "
        "einer um am sind noch wie einem über einen so zum war haben nur oder "
        "aber vor zur bis mehr durch man sein wurde sei"
    ).split(),
    "fr": (
        "le de un être et à il avoir ne je son que se qui ce dans en du elle "
        "au pour pas que vous par sur faire plus dire me on mon lui nous comme "
        "mais pouvoir avec tout y aller voir bien où sans tu ou leur homme si "
        "deux mari moi vouloir te femme venir quand grand"
    ).split(),
    "ru": (
        "и в не на я быть он с что а по это она этот к но они мы как из у "
        "который то за свой весь год от так о для ты же все тот мочь вы "
        "человек такой его сказать только или еще бы себя один как уже до "
        "время если сам когда другой вот говорить наш мой знать стать при "
        "чтобы дело жизнь кто первый очень два день"
    ).split(),
    "ja": list("これは日本語のテキストです素晴らしい天気ですね東京大阪京都新幹線寿司刺身温泉旅行写真桜紅葉雪祭り花火大会神社寺院城下町歴史文化芸術音楽映画"),
    "zh": list("这是中文文本内容非常好的天气北京上海广州深圳高铁美食旅游照片樱花红叶雪节日烟花神庙寺院古城历史文化艺术音乐电影经济发展科技创新未来世界和平"),
}

# (lang, charset_header, charset_meta, codec) weighted variants per lang
_CHARSET_PLANS = {
    # (header_charset, meta_charset, actual_codec); header+meta together
    # exercises the meta-override precedence (CharsetUtils.java:46-56)
    "en": [("utf-8", None, "utf-8"), (None, "utf-8", "utf-8"), ("iso-8859-1", None, "iso-8859-1"), (None, None, "ascii"), ("iso-8859-1", "utf-8", "utf-8")],
    "de": [("utf-8", None, "utf-8"), ("iso-8859-1", None, "iso-8859-1"), (None, "iso-8859-1", "iso-8859-1"), (None, None, "utf-8")],
    "fr": [("utf-8", None, "utf-8"), ("iso-8859-1", None, "iso-8859-1"), (None, None, "utf-8")],
    "ru": [("koi8-r", None, "koi8-r"), ("windows-1251", None, "windows-1251"), (None, "windows-1251", "windows-1251"), (None, None, "utf-8"), ("koi8-r", "windows-1251", "windows-1251")],
    "ja": [("shift_jis", None, "shift_jis"), ("x-sjis", None, "shift_jis"), (None, "shift_jis", "shift_jis"), (None, None, "utf-8")],
    "zh": [("gb2312", None, "gb2312"), (None, "gb2312", "gb2312"), (None, None, "utf-8")],
}

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "de", "de", "fr", "ru", "ja", "zh"]


class Universe:
    """Deterministic page universe parameterized by scale factor."""

    def __init__(self, sf: float = 0.001, seed: int = 42):
        self.sf = sf
        self.seed = seed
        self.n_hosts = max(12, int(round(5000 * sf / 0.1)))
        self.total_pages = max(400, int(round(200000 * sf / 0.1)))
        rs = random.Random(seed)
        hosts: list[str] = []
        for i in range(self.n_hosts):
            kind = i % 10
            if i == 0:
                hosts.append("big-portal.com")  # mega host (skew)
            elif kind in (1, 2, 3):
                hosts.append(f"site{i}.com")
            elif kind == 4:
                hosts.append(f"shop{i}.co.uk")
            elif kind == 5:
                hosts.append(f"blog{i}.de")
            elif kind == 6:
                hosts.append(f"news{i}.org")
            elif kind == 7:
                hosts.append(f"portal{i}.co.jp")
            elif kind == 8 and i % 40 == 8:
                hosts.append(f"10.{(i // 250) % 250}.{i % 250}.7")
            else:
                hosts.append(f"info{i}.net")
        self.hosts = hosts
        # Zipf page counts (alpha 1.1), mega-host boosted
        ranks = np.arange(1, self.n_hosts + 1, dtype=np.float64)
        w = 1.0 / ranks**1.1
        counts = np.maximum(1, (w / w.sum() * self.total_pages)).astype(np.int64)
        self.page_counts = {h: int(c) for h, c in zip(hosts, counts)}
        self._host_index = {h: i for i, h in enumerate(hosts)}
        self._lang_by_host = {
            h: _LANGS[(fp64(h) ^ seed) % len(_LANGS)] for h in hosts
        }
        rs  # noqa: B018 (rs reserved for future host-pool variants)

    # --- URL scheme of the universe -----------------------------------

    def canon_page_url(self, host: str, k: int) -> str:
        if k == 0:
            return f"http://{host}/"
        t = (fp64(host) ^ k) % 3
        if t == 0:
            return f"http://{host}/page/{k}"
        if t == 1:
            return f"http://{host}/p/{k}.html"
        return f"http://{host}/dir{k % 7}/item{k}"

    def resolve(self, canon_url: str) -> tuple[str, int] | None:
        """canonical URL -> (host, page_id) if the page exists."""
        if not canon_url.startswith("http://"):
            return None
        rest = canon_url[7:]
        slash = rest.find("/")
        if slash == -1:
            return None
        host, path = rest[:slash], rest[slash:]
        npages = self.page_counts.get(host)
        if npages is None:
            return None
        if path == "/":
            k = 0
        else:
            try:
                if path.startswith("/page/"):
                    k = int(path[6:])
                elif path.startswith("/p/") and path.endswith(".html"):
                    k = int(path[3:-5])
                elif path.startswith("/dir"):
                    item = path.rfind("/item")
                    if item == -1:
                        return None
                    k = int(path[item + 5 :])
                else:
                    return None
            except ValueError:
                return None
        if k < 0 or k >= npages:
            return None
        if self.canon_page_url(host, k) != canon_url:
            return None
        return host, k

    # --- link graph ----------------------------------------------------

    def out_link_targets(self, host: str, k: int, rng: random.Random) -> list[str]:
        """Canonical link targets: a same-host tree (guarantees
        reachability from page 0) + random same-host + cross-host +
        a few dead links."""
        npages = self.page_counts[host]
        targets: list[str] = []
        for c in range(3 * k + 1, min(3 * k + 4, npages)):
            targets.append(self.canon_page_url(host, c))
        extra = rng.randint(0, 8)
        for _ in range(extra):
            targets.append(self.canon_page_url(host, rng.randrange(npages)))
        n_cross = rng.randint(0, 3)
        for _ in range(n_cross):
            other = self.hosts[rng.randrange(len(self.hosts))]
            op = self.page_counts[other]
            targets.append(self.canon_page_url(other, rng.randrange(min(op, 50))))
        if rng.random() < 0.05:
            targets.append(self.canon_page_url(host, npages + rng.randrange(1000)))
        return targets

    def dirty_link(self, canon: str, page_host: str, rng: random.Random) -> str:
        """Apply a deterministic 'dirtying' transform that the URL
        pipeline must undo (canonicalization cases, FIXTURES.md §1)."""
        r = rng.random()
        if r < 0.60:
            return canon
        host_and_path = canon[7:]
        slash = host_and_path.find("/")
        host, path = host_and_path[:slash], host_and_path[slash:]
        if r < 0.65:
            return f"http://{host.upper()}{path}"
        if r < 0.70:
            return f"HTTP://{host}:80{path}"
        if r < 0.75:
            return f"http://www.{host}{path}" if not host.startswith("www.") and not host[0].isdigit() else canon
        if r < 0.80:
            seg = f"/x{rng.randrange(10)}"
            return f"http://{host}{seg}/..{path}"
        if r < 0.85:
            return f"http://{host}{path}#frag{rng.randrange(100)}"
        if r < 0.90:
            sid = "".join(rng.choice("0123456789abcdef") for _ in range(32))
            joiner = "&" if "?" in path else "?"
            return f"http://{host}{path}{joiner}osCsid={sid}"
        if r < 0.95 and host == page_host:
            return path  # relative link
        return f"http://{host}.{path}"  # trailing-dot host

    # --- page synthesis -------------------------------------------------

    @staticmethod
    def content_version(url_fp: int, snapshot: int) -> int:
        """Deterministic page-churn model: the content version of a URL
        at snapshot t = number of change events in 1..t, where a change
        fires at snapshot s iff (url_fp + s*s) % 4 == 0 (~1/4 of pages
        change per snapshot — the q_snapshot_churn arithmetic family).
        snapshot 0 is always version 0, so the historical single-
        snapshot universe is byte-identical."""
        v = 0
        for s in range(1, snapshot + 1):
            if (url_fp + s * s) % 4 == 0:
                v += 1
        return v

    def synth_page(self, canon_url: str, snapshot: int = 0) -> bytes | None:
        """Pure fetch simulation: canonical URL -> raw record bytes or
        None (404). ``snapshot`` selects the page's content version
        under the deterministic churn model (default 0 = the original
        universe, byte-identical to every prior round)."""
        hit = self.resolve(canon_url)
        if hit is None:
            return None
        host, k = hit
        return self._build_record(host, k, snapshot=snapshot)

    def _build_record(self, host: str, k: int, snapshot: int = 0) -> bytes:
        canon_url = self.canon_page_url(host, k)
        fp = fp64(canon_url)
        version = self.content_version(fp, snapshot) if snapshot else 0
        rng = random.Random(
            (fp ^ (self.seed * 0x9E3779B9) ^ (version * 0x517CC1B727220A95))
            & 0xFFFFFFFFFFFF
        )
        lang = self._lang_by_host[host]

        mime_roll = rng.random()
        if mime_roll < 0.85:
            mime = "text/html"
        elif mime_roll < 0.93:
            mime = "text/plain"
        elif mime_roll < 0.97:
            mime = "image/gif"
        else:
            mime = "*/*"

        plans = _CHARSET_PLANS[lang]
        hdr_cs, meta_cs, codec = plans[rng.randrange(len(plans))]
        if mime != "text/html":
            meta_cs = None
            if mime in ("image/gif", "*/*"):
                hdr_cs, codec = None, "ascii"

        body = self._build_body(host, k, lang, mime, meta_cs, codec, rng)

        headers = [f"HTTP/1.1 200 OK"]
        ct = mime
        if hdr_cs and mime not in ("image/gif", "*/*"):
            ct = f"{mime}; charset={hdr_cs}"
        headers.append(f"Content-Type: {ct}")
        headers.append(f"Server: synthd/{1 + (k % 3)}.0")
        gzip_body = rng.random() < 0.10 and mime.startswith("text")
        if gzip_body:
            # mtime=0: gzip's header embeds the wall clock by default,
            # which made the raw record bytes time-dependent (content
            # was unaffected — it only surfaced when the WARC archive
            # sink compared raw bytes across processes)
            raw = _gzip.compress(body, compresslevel=6, mtime=0)
            if rng.random() < 0.05:
                raw = raw[: max(20, len(raw) * 2 // 3)]  # truncated member
            body = raw
            headers.append("Content-Encoding: gzip")
        headers.append(f"Content-Length: {len(body)}")
        if rng.random() < 0.02:
            headers.append("junk line without colon")
        terminator = b"\n\n" if rng.random() < 0.02 else b"\r\n\r\n"
        joiner = b"\n" if terminator == b"\n\n" else b"\r\n"
        return joiner.join(h.encode("latin-1") for h in headers) + terminator + body

    def _build_body(
        self,
        host: str,
        k: int,
        lang: str,
        mime: str,
        meta_cs: str | None,
        codec: str,
        rng: random.Random,
    ) -> bytes:
        words = _WORDS[lang]
        sep = "" if lang in ("ja", "zh") else " "

        def sentence(n):
            return sep.join(rng.choice(words) for _ in range(n))

        if mime in ("image/gif", "*/*"):
            return bytes(rng.randrange(256) for _ in range(rng.randint(64, 256)))
        if mime == "text/plain":
            paras = "\n".join(sentence(rng.randint(8, 30)) for _ in range(rng.randint(2, 6)))
            return paras.encode(codec, errors="replace")

        title = sentence(rng.randint(2, 6))
        parts = ["<html><head>"]
        if meta_cs:
            parts.append(
                f'<meta http-equiv="Content-Type" content="text/html; charset={meta_cs}">'
            )
        parts.append(f"<title>{title}</title>")
        if rng.random() < 0.05:
            parts.append(f'<base href="http://{host}/">')
        parts.append("</head><body>")
        if rng.random() < 0.3:
            parts.append(f"<script>var x = {rng.randrange(100)}; // skipped</script>")
        parts.append(f"<h1>{title}</h1>")
        n_paras = rng.randint(2, 6)
        for _ in range(n_paras):
            parts.append(f"<p>{sentence(rng.randint(10, 40))}</p>")
        for canon in self.out_link_targets(host, k, rng):
            href = self.dirty_link(canon, host, rng)
            parts.append(f'<a href="{href}">{sentence(rng.randint(1, 3))}</a>')
        parts.append("</body></html>")
        return "".join(parts).encode(codec, errors="replace")

    # --- table materialization -----------------------------------------

    def page_row(self, host: str, k: int) -> tuple[str, int, bytes, str]:
        """One pages-table row: (dirty_url, warc_ts_ms, record_bytes,
        lang) — a pure function of (host, k)."""
        canon = self.canon_page_url(host, k)
        rec = self._build_record(host, k)
        rng = random.Random((fp64(canon) ^ 0x5EED) & 0xFFFFFFFF)
        url = canon
        r = rng.random()
        if r < 0.02:
            # malformed: space inside path (ArcFileReaderTests.java:399)
            url = canon[:7] + canon[7:].replace("item", "it em", 1)
        elif r < 0.06:
            url = canon[:7] + canon[7:].upper()
        elif r < 0.10:
            sid = "".join(rng.choice("0123456789abcdef") for _ in range(32))
            url = canon + ("&" if "?" in canon else "?") + "sid=" + sid
        ts = BASE_TS_MS + ((fp64(canon) & 0x7FFFFFFF) % (86400 * 1000 * 30))
        return url, ts, rec, self._lang_by_host[host]

    def iter_pages(self):
        """Yield page rows for the whole universe (deterministic order:
        host rank, page id)."""
        for host in self.hosts:
            for k in range(self.page_counts[host]):
                yield self.page_row(host, k)

    def seed_urls(self) -> list[str]:
        """Seed list: page 0 of ~80% of hosts + a few dead urls
        (FIXTURES.md §2)."""
        seeds = []
        for i, h in enumerate(self.hosts):
            if (fp64(h) % 10) < 8:
                seeds.append(self.canon_page_url(h, 0))
            if i % 37 == 5:
                seeds.append(f"http://dead{i}.com/")
        return seeds


# Bump whenever page bytes OR the extract chain changes behavior: the
# golden `text` column of cached pages tables is computed by
# extract_record at generation time, so a stale /tmp cache written by
# an older build would silently fail byte-parity checks against the
# current kernels (seen when the real charset detector replaced the
# round-1 stand-in). Consumers embed this in their cache paths.
PAGES_FIXTURE_VERSION = 2


def pages_cache_dir(sf: float) -> str:
    """Canonical versioned /tmp cache dir for the pages universe."""
    return f"/tmp/cc_ray_pages_v{PAGES_FIXTURE_VERSION}_sf{sf}"


@lru_cache(maxsize=4)
def get_universe(sf: float, seed: int = 42) -> Universe:
    return Universe(sf, seed)


def sf_from_dir(sf_dir: str) -> float:
    """Map a testdata dir name (.../sf0.01) to its scale factor."""
    import re as _re

    m = _re.search(r"sf([0-9.]+)", sf_dir or "")
    return float(m.group(1)) if m else 0.001


def write_pages_parquet_ray(out_dir: str, sf: float, seed: int = 42) -> int:
    """Materialize the universe as a parquet directory using Ray Data
    (parallel generation — page synthesis is a pure function of
    (host, k), so the work list is just id pairs). Used by bench.py for
    large sfs where single-threaded generation would dominate."""
    import ray.data as rd

    uni = get_universe(sf, seed)
    items = [
        {"host": h, "k": k} for h in uni.hosts for k in range(uni.page_counts[h])
    ]

    def build(batch):
        import pyarrow as pa

        from ..stages.parse_extract import extract_record

        u = get_universe(sf, seed)
        urls, tss, recs, langs, texts = [], [], [], [], []
        for host, k in zip(batch["host"].to_pylist(), batch["k"].to_pylist()):
            url, ts, rec, lang = u.page_row(host, k)
            urls.append(url)
            tss.append(ts)
            recs.append(rec)
            langs.append(lang)
            texts.append(extract_record(url, rec)["text"])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("ms")),
                "html": pa.array(recs, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    ds = rd.from_items(items).map_batches(build, batch_format="pyarrow", batch_size=512)
    ds.write_parquet(out_dir)
    return len(items)


def write_pages_parquet(path: str, sf: float, seed: int = 42) -> int:
    """Materialize the universe into a pages parquet file (the engine's
    own fixture input; FIXTURES.md §1). Returns row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..stages.parse_extract import extract_record

    uni = get_universe(sf, seed)
    urls, tss, recs, langs, texts = [], [], [], [], []
    for url, ts, rec, lang in uni.iter_pages():
        urls.append(url)
        tss.append(ts)
        recs.append(rec)
        langs.append(lang)
        texts.append(extract_record(url, rec)["text"])
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("ms")),
            "html": pa.array(recs, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    pq.write_table(table, path)
    return table.num_rows
