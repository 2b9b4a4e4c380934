"""Mergeable summary sketches: HyperLogLog, Space-Saving, KLL-lite.

Extends the reference's sketch/statistics family (bloom math in
``util/BloomFilterUtils`` parity -> state/bloom.py, histograms/moving
averages -> functions/stats.py) with the three summaries a 100 TB
corpus census needs: approximate distinct counts (how many unique
hosts/users), heavy hitters (which hosts dominate the crawl), and
quantiles (latency / doc-length distributions) — each computable in
one streaming pass and MERGEABLE, so the Ray-side shape is
map_batches(partial sketch per block) -> bounded tree reduce, never a
corpus shuffle.

All three are textbook public algorithms:

- HyperLogLog: Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the
  analysis of a near-optimal cardinality estimation algorithm" (AofA
  2007), with the standard linear-counting small-range correction.
- Space-Saving: Metwally, Agrawal, El Abbadi, "Efficient computation
  of frequent and top-k elements in data streams" (ICDT 2005); the
  weighted-replay merge follows Agarwal et al., "Mergeable summaries"
  (PODS 2012).
- KLL-lite: the compactor hierarchy of Karnin, Lang, Liberty,
  "Optimal quantile approximation in streams" (FOCS 2016), with a
  DETERMINISTIC alternating compaction offset instead of a random one
  (merge results depend only on merge-tree shape, and the exact mode
  — capacity >= n — is independent even of that).

Determinism contract (what makes these oracle-checkable):

- HLL: registers combine by elementwise max => the estimate is a pure
  function of the input SET, independent of batch/merge order. A
  single-process sequential HLL over the same rows must produce the
  IDENTICAL estimate — that parity is the distributed-reduction
  oracle.
- Space-Saving with capacity >= total distinct keys degenerates to an
  exact counter (zero error), independent of merge order => the top-k
  is SQL-checkable (GROUP BY / ORDER BY count DESC). Under-capacity
  mode keeps the classic (count, err) overestimation bounds and is
  tested against those bounds, not for exactness.
- KLL with capacity >= n never compacts: level 0 holds every value,
  quantiles are exact (percentile_disc semantics) => SQL-checkable.
  Under-capacity mode guarantees rank error <= eps*n, tested
  empirically.
"""

from __future__ import annotations

import struct

import numpy as np

_U64 = np.uint64
_M64 = (1 << 64) - 1


# --- hashing ----------------------------------------------------------


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain constants,
    Steele/Lea/Flood "Fast splittable pseudorandom number generators",
    OOPSLA 2014). Input any integer ndarray; output uint64."""
    z = x.astype(np.int64).view(_U64) if x.dtype != _U64 else x.copy()
    with np.errstate(over="ignore"):
        z = (z + _U64(0x9E3779B97F4A7C15)) & _U64(_M64)
        z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _U64(_M64)
        z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)) & _U64(_M64)
    return z ^ (z >> _U64(31))


def knuth32(ids: np.ndarray) -> np.ndarray:
    """Knuth multiplicative hash, 32-bit (TAOCP v3 §6.4) — the one
    hash here chosen to be SQL-EXPRESSIBLE ((id*2654435761) %% 2^32 in
    plain BIGINT arithmetic), the basis of every consistent-sampling
    operator (pipelines/queries.py sampling queries, the IVF hash
    sample). Domain: non-negative ids below ~2^31; splitmix64 is the
    full-range variant."""
    return (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)


def _clz64(w: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (w == 0 -> 64)."""
    w = w.astype(_U64, copy=True)
    n = np.zeros(w.shape, dtype=np.int64)
    nz = w != 0
    for s in (32, 16, 8, 4, 2, 1):
        top_zero = nz & ((w >> _U64(64 - s)) == 0)
        n[top_zero] += s
        w[top_zero] = (w[top_zero] << _U64(s)) & _U64(_M64)
    n[~nz] = 64
    return n


# --- HyperLogLog ------------------------------------------------------


class HyperLogLog:
    """Dense HLL with 2**p uint8 registers (p in [4, 18])."""

    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        """Fold a uint64 hash array in (vectorized; order-free)."""
        if len(h) == 0:
            return self
        h = h.astype(_U64, copy=False)
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        w = (h << _U64(self.p)) & _U64(_M64)
        rank = np.minimum(_clz64(w) + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_ints(self, values: np.ndarray) -> "HyperLogLog":
        return self.add_hashes(splitmix64(np.asarray(values)))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("precision mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.float64(2.0) ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return struct.pack("<B", self.p) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p = struct.unpack_from("<B", b, 0)[0]
        hll = cls(p)
        regs = np.frombuffer(b, dtype=np.uint8, offset=1)
        if len(regs) != hll.m:
            raise ValueError("register payload size mismatch")
        hll.registers = regs.copy()
        return hll


# --- Space-Saving heavy hitters ---------------------------------------


class SpaceSaving:
    """Space-Saving stream summary over string keys.

    ``counts[k]`` overestimates the true frequency by at most
    ``errs[k]``; with ``capacity`` >= the number of distinct keys ever
    seen, no eviction happens and every count is exact (errs all 0).
    """

    def __init__(self, capacity: int = 256):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = capacity
        self.counts: dict[str, int] = {}
        self.errs: dict[str, int] = {}
        # lazy min-heap of (count, key) snapshots: stale entries (count
        # no longer current) are skipped at pop time, so eviction is
        # O(log n) amortized instead of an O(capacity) min() scan —
        # the difference between a streaming summary and a hot loop
        # when a 100 TB vocab census evicts on most offers.
        self._heap: list[tuple[int, str]] = []

    def _pop_min(self) -> str:
        import heapq

        while True:
            c, k = heapq.heappop(self._heap)
            if self.counts.get(k) == c:
                return k
            # stale snapshot (key updated or already evicted) — skip

    def _offer(self, key: str, weight: int) -> None:
        import heapq

        if key in self.counts:
            self.counts[key] += weight
            heapq.heappush(self._heap, (self.counts[key], key))
            return
        if len(self.counts) < self.capacity:
            self.counts[key] = weight
            self.errs[key] = 0
            heapq.heappush(self._heap, (weight, key))
            return
        # evict the current minimum; the newcomer inherits its count
        # as error (classic Space-Saving replacement rule)
        mk = self._pop_min()
        mc = self.counts.pop(mk)
        self.errs.pop(mk)
        self.counts[key] = mc + weight
        self.errs[key] = mc
        heapq.heappush(self._heap, (self.counts[key], key))
        if len(self._heap) > 8 * self.capacity:  # compact stale entries
            self._heap = [(c, k) for k, c in self.counts.items()]
            heapq.heapify(self._heap)

    def add_counted(self, keys, weights) -> "SpaceSaving":
        """Fold pre-aggregated (key, weight) pairs in — the per-batch
        partial is an EXACT value_counts, so the summary sees each
        batch's distinct keys once, not each row."""
        for k, w in zip(keys, weights):
            self._offer(k, int(w))
        return self

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        """Weighted-replay merge (Agarwal et al. 2012): replay the
        other summary's (key, count) items; errors add for shared
        keys, and replayed items keep their own overestimation."""
        import heapq

        for k in sorted(other.counts):  # sorted => merge-order determinism
            w = other.counts[k]
            e = other.errs[k]
            if k in self.counts:
                self.counts[k] += w
                self.errs[k] += e
                heapq.heappush(self._heap, (self.counts[k], k))
            else:
                self._offer(k, w)
                if k in self.counts:  # survived (or displaced the min)
                    self.errs[k] += e
        return self

    def top(self, k: int) -> list[tuple[str, int, int]]:
        """Top-k by (count desc, key asc) -> [(key, count, err)]."""
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(key, cnt, self.errs[key]) for key, cnt in items[:k]]

    def to_bytes(self) -> bytes:
        parts = [struct.pack("<II", self.capacity, len(self.counts))]
        for k in sorted(self.counts):
            kb = k.encode("utf-8")
            parts.append(struct.pack("<IqQ", len(kb), self.counts[k], self.errs[k]))
            parts.append(kb)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, b: bytes) -> "SpaceSaving":
        import heapq

        cap, n = struct.unpack_from("<II", b, 0)
        ss = cls(cap)
        off = 8
        for _ in range(n):
            klen, cnt, err = struct.unpack_from("<IqQ", b, off)
            off += 20
            k = b[off : off + klen].decode("utf-8")
            off += klen
            ss.counts[k] = cnt
            ss.errs[k] = int(err)
        ss._heap = [(c, k) for k, c in ss.counts.items()]
        heapq.heapify(ss._heap)
        return ss


# --- KLL-lite quantile sketch -----------------------------------------


class KLLSketch:
    """Compactor-hierarchy quantile sketch over float64 values.

    Level L items each represent 2**L input values. Compaction sorts a
    full level and promotes every other item, alternating the kept
    offset deterministically per level. ``capacity`` is the TOP
    level's buffer size; levels below the top get
    ceil(capacity * (2/3)**depth-from-top) (floored at 8) — KLL's
    geometric decay, which keeps the error of heavy (high-weight)
    compactions small because the heaviest levels have the largest
    buffers.

    Exact mode: while total items ever inserted <= capacity, level 0
    never compacts and ``quantile`` returns exact percentile_disc
    values regardless of merge order.
    """

    def __init__(self, capacity: int = 2048):
        if capacity < 8:
            raise ValueError("capacity must be >= 8")
        self.capacity = capacity
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.parity: list[int] = [0]
        self.n = 0

    def _cap(self, level: int) -> int:
        depth_from_top = len(self.levels) - 1 - level
        c = int(np.ceil(self.capacity * (2.0 / 3.0) ** depth_from_top))
        return max(8, c)

    def _compact(self) -> None:
        lev = 0
        while lev < len(self.levels):
            if len(self.levels[lev]) <= self._cap(lev):
                lev += 1
                continue
            buf = np.sort(self.levels[lev], kind="stable")
            # weight conservation: an odd item cannot promote (it has
            # no pair partner at 2**(lev+1) weight) — retain it at this
            # level, compact the even remainder. Without this the
            # represented mass drifts from n by 2**lev per odd
            # compaction and rank estimates acquire a bias outside the
            # KLL analysis.
            if len(buf) % 2:
                leftover = buf[-1:]
                buf = buf[:-1]
            else:
                leftover = buf[:0]
            keep = buf[self.parity[lev] :: 2]
            self.parity[lev] ^= 1
            self.levels[lev] = leftover
            if lev + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self.parity.append(0)
            self.levels[lev + 1] = np.concatenate([self.levels[lev + 1], keep])
            lev += 1

    def add(self, values: np.ndarray) -> "KLLSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += len(v)
        self._compact()
        return self

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.capacity != self.capacity:
            raise ValueError("capacity mismatch")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.parity.append(0)
        for lev, buf in enumerate(other.levels):
            if len(buf):
                self.levels[lev] = np.concatenate([self.levels[lev], buf])
        self.n += other.n
        self._compact()
        return self

    def quantile(self, q: float) -> float:
        """percentile_disc(q): smallest item whose cumulative weight
        reaches ceil(q * n)."""
        if self.n == 0:
            raise ValueError("empty sketch")
        items = []
        weights = []
        for lev, buf in enumerate(self.levels):
            if len(buf):
                items.append(buf)
                weights.append(np.full(len(buf), 1 << lev, dtype=np.int64))
        allv = np.concatenate(items)
        allw = np.concatenate(weights)
        order = np.argsort(allv, kind="stable")
        allv, allw = allv[order], allw[order]
        cum = np.cumsum(allw)
        target = max(1, int(np.ceil(q * cum[-1])))
        return float(allv[np.searchsorted(cum, target)])

    def to_bytes(self) -> bytes:
        parts = [struct.pack("<IqI", self.capacity, self.n, len(self.levels))]
        for lev, buf in enumerate(self.levels):
            parts.append(struct.pack("<IB", len(buf), self.parity[lev]))
            parts.append(buf.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLLSketch":
        cap, n, nlev = struct.unpack_from("<IqI", b, 0)
        sk = cls(cap)
        sk.n = n
        sk.levels, sk.parity = [], []
        off = 16
        for _ in range(nlev):
            ln, par = struct.unpack_from("<IB", b, off)
            off += 5
            sk.levels.append(np.frombuffer(b, dtype=np.float64, count=ln, offset=off).copy())
            sk.parity.append(par)
            off += 8 * ln
        if not sk.levels:
            sk.levels, sk.parity = [np.empty(0, dtype=np.float64)], [0]
        return sk


def hll_estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Row-wise HLL estimate over an (n, m) uint8 register matrix —
    the HyperLogLog.estimate formula vectorized across rows (same
    alpha, same linear-counting switch), shared by the HyperBall
    stage and its sequential oracle so both sides walk identical
    float trajectories."""
    regs = np.asarray(regs, dtype=np.uint8)
    if regs.ndim == 1:
        regs = regs[None, :]
    m = float(regs.shape[1])
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(
        np.float64(2.0) ** -regs.astype(np.float64), axis=1
    )
    zeros = np.count_nonzero(regs == 0, axis=1)
    with np.errstate(divide="ignore"):
        lc = m * np.log(m / np.maximum(zeros, 1))
    use_lc = (est <= 2.5 * m) & (zeros > 0)
    return np.where(use_lc, lc, est)


# --- Count-Min --------------------------------------------------------


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved
    data stream summary: the count-min sketch and its applications")
    over uint64 key hashes: ``depth`` rows x ``width`` int64 counters.
    Row r buckets a key hash h at ``splitmix64(h + r + 1) % width``;
    point estimate = min over rows (never under the true count).
    Merge is elementwise integer add — order-free, so a distributed
    tree reduce is BIT-IDENTICAL to the sequential fold (the same
    determinism argument as HyperLogLog's register max)."""

    def __init__(self, depth: int = 4, width: int = 2048):
        if not (1 <= depth <= 16) or width < 2:
            raise ValueError("bad CountMin shape")
        self.depth = depth
        self.width = width
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _rows_cols(self, h: np.ndarray):
        h = h.astype(_U64, copy=False)
        for r in range(self.depth):
            with np.errstate(over="ignore"):
                salted = (h + _U64(r + 1)) & _U64(_M64)
            yield r, (splitmix64(salted) % _U64(self.width)).astype(np.int64)

    def add_hashed(self, h: np.ndarray, counts: np.ndarray | None = None):
        """Add key hashes (uint64) with optional weights (int64)."""
        if len(h) == 0:
            return self
        c = (
            np.ones(len(h), dtype=np.int64)
            if counts is None
            else np.asarray(counts, dtype=np.int64)
        )
        for r, cols in self._rows_cols(h):
            np.add.at(self.table[r], cols, c)
        return self

    def estimate_hashed(self, h: np.ndarray) -> np.ndarray:
        """Point estimates (int64) for key hashes."""
        if len(h) == 0:
            return np.zeros(0, dtype=np.int64)
        est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
        for r, cols in self._rows_cols(h):
            est = np.minimum(est, self.table[r][cols])
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        if (other.depth, other.width) != (self.depth, self.width):
            raise ValueError("CountMin shape mismatch")
        self.table += other.table
        return self

    def to_bytes(self) -> bytes:
        return struct.pack("<II", self.depth, self.width) + self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMin":
        depth, width = struct.unpack_from("<II", b, 0)
        cm = cls(depth, width)
        t = np.frombuffer(b, dtype=np.int64, offset=8)
        if t.size != depth * width:
            raise ValueError("CountMin payload size mismatch")
        cm.table = t.reshape(depth, width).copy()
        return cm
