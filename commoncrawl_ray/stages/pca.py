"""Distributed PCA over an embedding column — the dimensionality
reduction / whitening step in front of clustering, ANN compression and
visualization of corpus-scale embedding tables.

No reference counterpart (the reference predates embeddings); the
algorithm is the textbook covariance eigendecomposition, distributed
the Ray-Data-first way:

  pass 1  one streaming scan -> per-block EXACT integer moment
          partials (count, Σqx, Σ qx·qxᵀ with qx = rint(x·2^20));
          cross-block merge sums the partials as ARBITRARY-PRECISION
          decimal strings through the repo's standard two-level
          fan-in (``map_batches(batch_size=fanin)`` merge passes), so
          the global moments are bit-exact under ANY reduction order
          and can never overflow — the semdedup int64-unit discipline
          extended to corpus scale;
  driver  d×d covariance from the exact moments (d = embedding dim,
          vocabulary-scale, never corpus-scale), ``np.linalg.eigh``,
          deterministic sign convention (largest-|component| entry
          made positive, ties to the lowest index), components
          re-quantized to int units;
  pass 2  components ray.put-broadcast once; a stateless scan emits
          each row's projection from EXACT int64 dot products
          (qx·qv ≤ d·2^40 « 2^53, exactly representable in float64),
          so per-row outputs are bit-identical regardless of how rows
          are blocked — no float-reduction-order discipline needed.

Scale shape: two streaming scans, zero all-to-all exchanges; driver
state is O(d²) ints + the merge fan-in, never O(rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

QSCALE_BITS = 20
QSCALE = 1 << QSCALE_BITS  # |x|<~32 stays exact; embeddings are unit-ish


def quantize(mat: np.ndarray) -> np.ndarray:
    """float64 rows -> int64 units (exact, order-free sums)."""
    return np.rint(mat * QSCALE).astype(np.int64)


# ------------------------------------------------------------ moments


def _partial_table(count: int, s, g) -> pa.Table:
    """One partial row; sums ride as decimal strings so merges stay
    exact at any corpus size (int64 would cap the merge depth)."""
    return pa.table(
        {
            "count": pa.array([str(int(count))], pa.string()),
            "s": pa.array([[str(int(v)) for v in s]], pa.list_(pa.string())),
            "g": pa.array([[str(int(v)) for v in g]], pa.list_(pa.string())),
        }
    )


def moments_ds(ds, vec_col: str = "embedding"):
    """Dataset -> Dataset of exact moment partials, reduced to ONE row
    via two fan-in merge passes (the stages/approx.py sketch-reduce
    shape)."""
    from ..functions.vec import list_to_matrix

    def partials(batch: pa.Table) -> pa.Table:
        mat = list_to_matrix(batch.column(vec_col))
        if len(mat) == 0:
            return _partial_table(0, [], [])
        q = quantize(np.asarray(mat, dtype=np.float64))
        # in-block int64 sums are exact: a 128 MB block holds ~5e5
        # 64-dim rows -> |Σ qx·qx| ≤ 5e5·2^40 ≈ 2^59 < 2^63
        return _partial_table(
            q.shape[0], q.sum(axis=0), (q.T @ q).reshape(-1)
        )

    def merge(batch: pa.Table) -> pa.Table:
        counts = batch.column("count").to_pylist()
        ss = batch.column("s").to_pylist()
        gs = batch.column("g").to_pylist()
        n = sum(int(c) for c in counts)
        width = max((len(x) for x in ss), default=0)
        s_tot = [0] * width
        g_tot = [0] * (width * width)
        for s_row, g_row in zip(ss, gs):
            for i, v in enumerate(s_row):
                s_tot[i] += int(v)
            for i, v in enumerate(g_row):
                g_tot[i] += int(v)
        return _partial_table(n, s_tot, g_tot)

    out = ds.map_batches(partials, batch_format="pyarrow", batch_size=None)
    # two fan-in passes bound any realistic block count (64² = 4096
    # first-level partials per final merge input)
    out = out.map_batches(merge, batch_format="pyarrow", batch_size=64)
    return out.map_batches(merge, batch_format="pyarrow", batch_size=None)


def collect_moments(ds, vec_col: str = "embedding"):
    """-> (n, s, G) with s (d,) and G (d,d) as exact Python ints."""
    rows = moments_ds(ds, vec_col).take_all()
    # the final merge pass leaves one row per final block; fold the
    # handful that remain (exact — they are ints)
    n = sum(int(r["count"]) for r in rows)
    width = max((len(r["s"]) for r in rows), default=0)
    s = [0] * width
    g = [0] * (width * width)
    for r in rows:
        for i, v in enumerate(r["s"]):
            s[i] += int(v)
        for i, v in enumerate(r["g"]):
            g[i] += int(v)
    return n, s, g


# ---------------------------------------------------------- components


def components_from_moments(
    n: int, s: list[int], g: list[int], k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact integer moments -> (mean, components[k,d], explained
    variance ratio[k]). Deterministic: the covariance entries are pure
    functions of exact ints, eigh runs once on the driver, and each
    eigenvector's sign is fixed by its largest-|entry| component
    (first index on ties) made positive."""
    d = int(np.sqrt(len(g)))
    s_arr = np.array(s, dtype=np.float64)
    g_arr = np.array([float(v) for v in g], dtype=np.float64).reshape(d, d)
    mean = s_arr / (n * QSCALE)
    denom = float(n - 1) * QSCALE * QSCALE
    cov = (g_arr - np.outer(s_arr, s_arr) / n) / denom
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-evals, kind="stable")[:k]
    comps = evecs[:, order].T  # (k, d)
    for row in comps:
        j = int(np.argmax(np.abs(np.round(row, 12))))
        if row[j] < 0:
            row *= -1
    total = float(evals.sum())
    ratio = evals[order] / total if total > 0 else np.zeros(len(order))
    return mean, comps, ratio


def project(ds, mean: np.ndarray, comps: np.ndarray,
            id_col: str = "vec_id", vec_col: str = "embedding"):
    """Broadcast the (k,d) component matrix once, emit (id, pc1..pck)
    per row from exact int64 dots — bit-identical under any blocking."""
    import ray

    from ..functions.vec import list_to_matrix

    k = comps.shape[0]
    qv = quantize(comps)  # (k, d) int units
    # centering constant per component: (Σqx)·qv / n, from exact ints
    # folded to one float64 each (driver-side, order-fixed)
    shared = ray.put((qv, mean))

    def score(batch: pa.Table) -> pa.Table:
        qv_, mean_ = ray.get(shared)
        ids = batch.column(id_col)
        mat = list_to_matrix(batch.column(vec_col))
        if len(mat) == 0:
            cols = {"vec_id": pa.array([], pa.int64())}
            for j in range(k):
                cols[f"pc{j + 1}"] = pa.array([], pa.float64())
            return pa.table(cols)
        qx = quantize(np.asarray(mat, dtype=np.float64))
        dots = qx @ qv_.T  # exact int64: ≤ d·2^40 « 2^63
        cent = (mean_ * QSCALE) @ qv_.T.astype(np.float64)  # (k,)
        proj = (dots.astype(np.float64) - cent) / (QSCALE * QSCALE)
        cols = {"vec_id": ids}
        for j in range(k):
            cols[f"pc{j + 1}"] = pa.array(np.round(proj[:, j], 6), pa.float64())
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


def pca(ds, k: int = 4, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Full distributed PCA: exact moments -> driver eigh -> projected
    Dataset (vec_id, pc1..pck). ``ds`` is consumed twice (two scans),
    so pass a cheap re-readable source (a read_parquet lineage)."""
    n, s, g = collect_moments(ds, vec_col)
    mean, comps, _ratio = components_from_moments(n, s, g, k)
    return project(ds, mean, comps, id_col=id_col, vec_col=vec_col)
