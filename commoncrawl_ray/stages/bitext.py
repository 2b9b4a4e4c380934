"""Margin-based bitext mining — pairing sentences/documents across
two language sides by embedding similarity with margin scoring
(Artetxe & Schwenk 2019, "Margin-based Parallel Corpus Mining with
Multilingual Sentence Embeddings"; the CCMatrix/CCAligned recipe that
turns a web crawl into parallel training data).

No reference counterpart (the reference predates embeddings). The
margin criterion: for a source vector x and target vector y,

    margin(x, y) = cos(x, y) / (avgNN_k(x)/2 + avgNN_k(y)/2)

where avgNN_k(v) is the mean cosine of v's k nearest neighbors on the
OPPOSITE side — a local density normalizer that kills hub vectors.
A pair is emitted iff each is the other's best margin match (mutual
best, the paper's "max" retrieval) and the margin clears a threshold.

Ray-Data-first shape (the stages/semdedup.py discipline):
  1. shared coarse geometry: ONE spherical k-means fit over the union
     of both sides (kmeans_fit_distributed — integer-exact partial
     sums, ≤k rows/iter to the driver);
  2. assign pass tags every row (side, cluster, quantized unit vec);
     per-cluster counts pre-aggregate (≤k-row partials) and clusters
     wider than ``max_cluster_docs`` are dropped BEFORE the exchange
     with asserted skip counters — the dedup-family cap rule;
  3. ONE ``sort("cluster")`` co-partition; each block mines its whole
     clusters locally: cross-side cosine matrix, top-k neighbor
     means, margin, mutual-best — all vectorized, every ranking
     rounded to 6 dp first with ties to the lowest vec_id.

Like IVF search, mining inside coarse clusters is the documented
approximation (cross-cluster pairs are not candidates — the paper's
own large-scale deployments shard the search the same way); the
sequential oracle shares the kernels AND the clustering, so the
hash check isolates the distributed plumbing exactly.

Scale note: cluster count must grow with corpus size (k ≈ √N keeps
corpus/k rows per cluster block-sized — the semdedup k-sizing rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.vec import list_to_matrix
from .semdedup import (
    _QSCALE,
    _norm_rows,
    assign_rounded,
    kmeans_fit_distributed,
    quantize,
)

PAIR_SCHEMA = pa.schema(
    [
        ("src_id", pa.int64()),
        ("tgt_id", pa.int64()),
        ("margin", pa.float64()),
    ]
)


def mine_block(
    ids: np.ndarray,
    sides: np.ndarray,
    q: np.ndarray,
    k_neighbors: int,
    threshold: float,
) -> tuple[list[int], list[int], list[float]]:
    """Mine one whole cluster: ids/sides/quantized unit rows ->
    mutual-best margin pairs. Pure numpy; shared verbatim with the
    sequential oracle. Rows are ordered by (side, id) internally so
    every argmax tie breaks on the lowest id."""
    a_idx = np.flatnonzero(sides == 0)
    b_idx = np.flatnonzero(sides == 1)
    if len(a_idx) == 0 or len(b_idx) == 0:
        return [], [], []
    a_idx = a_idx[np.argsort(ids[a_idx], kind="mergesort")]
    b_idx = b_idx[np.argsort(ids[b_idx], kind="mergesort")]
    xa = q[a_idx].astype(np.float64) / _QSCALE
    xb = q[b_idx].astype(np.float64) / _QSCALE
    cos = np.round(xa @ xb.T, 6)  # (A, B)

    ka = min(k_neighbors, cos.shape[1])
    kb = min(k_neighbors, cos.shape[0])
    # mean of the k largest cosines per row / column (the paper's
    # avgNN_k density normalizer), floored so a negative/zero
    # neighborhood cannot flip the margin sign
    nn_a = np.sort(cos, axis=1)[:, -ka:].mean(axis=1)
    nn_b = np.sort(cos, axis=0)[-kb:, :].mean(axis=0)
    denom = np.maximum(nn_a[:, None] / 2.0 + nn_b[None, :] / 2.0, 1e-6)
    margin = np.round(cos / denom, 6)

    best_b = np.argmax(margin, axis=1)  # first max = lowest tgt id
    best_a = np.argmax(margin, axis=0)  # first max = lowest src id
    i = np.arange(cos.shape[0])
    mutual = best_a[best_b[i]] == i
    ok = mutual & (margin[i, best_b[i]] >= threshold)
    src = ids[a_idx[i[ok]]]
    tgt = ids[b_idx[best_b[i[ok]]]]
    mg = margin[i[ok], best_b[i[ok]]]
    return list(src), list(tgt), list(mg)


def mine_bitext(
    ds,
    dim: int,
    k_neighbors: int = 4,
    threshold: float = 1.0,
    n_clusters: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    side_col: str = "side",
    max_cluster_docs: int | None = 4096,
):
    """ds(id, side∈{0,1}, vec) -> Dataset of (src_id, tgt_id, margin)
    mutual-best pairs. See module docstring for the shape."""
    import ray
    from ray.data.aggregate import Sum

    centroids = kmeans_fit_distributed(
        ds, dim, k=n_clusters, iters=iters, id_col=id_col, vec_col=vec_col
    )
    ref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        cent = ray.get(ref)
        xn = _norm_rows(list_to_matrix(t.column(vec_col)))
        cl = assign_rounded(xn, cent)
        return pa.table(
            {
                id_col: t.column(id_col),
                "side": t.column(side_col).cast(pa.int8()),
                "cluster": pa.array(cl),
                "qvec": pa.FixedSizeListArray.from_arrays(
                    pa.array(quantize(xn).reshape(-1), pa.int64()), dim
                ),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    over: list[int] = []
    if max_cluster_docs is not None:
        def count_partial(t: pa.Table) -> pa.Table:
            cl = t.column("cluster").to_numpy(zero_copy_only=False)
            counts = np.bincount(cl, minlength=n_clusters)
            nz = np.nonzero(counts)[0]
            return pa.table(
                {
                    "cluster": pa.array(nz.astype(np.int64)),
                    "n": pa.array(counts[nz].astype(np.int64)),
                }
            )

        size_rows = (
            assigned.select_columns(["cluster"])
            .map_batches(count_partial, batch_format="pyarrow")
            .groupby("cluster")
            .aggregate(Sum("n"))
            .take_all()
        )
        over = sorted(
            int(r["cluster"])
            for r in size_rows
            if int(r["sum(n)"]) > max_cluster_docs
        )
    if over:
        from ..state.counters import count_skip

        count_skip("bitext", buckets=len(over))
        over_arr = np.asarray(over, dtype=np.int64)

        def small_rows(t: pa.Table) -> pa.Table:
            cl = t.column("cluster").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(cl, over_arr)))

        assigned = assigned.map_batches(small_rows, batch_format="pyarrow")

    def mine(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return PAIR_SCHEMA.empty_table()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sides = t.column("side").to_numpy(zero_copy_only=False)
        cl = t.column("cluster").to_numpy(zero_copy_only=False)
        q = list_to_matrix(t.column("qvec"), dtype=np.int64)
        src_all: list[int] = []
        tgt_all: list[int] = []
        mg_all: list[float] = []
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        ends = np.r_[starts[1:], len(cl)]
        for s, e in zip(starts, ends):
            if max_cluster_docs is not None and e - s > max_cluster_docs:
                raise AssertionError(
                    f"over-cap cluster {cl[s]} ({e - s} rows) entered "
                    "the mining exchange"
                )
            src, tgt, mg = mine_block(
                ids[s:e], sides[s:e], q[s:e], k_neighbors, threshold
            )
            src_all += src
            tgt_all += tgt
            mg_all += mg
        return pa.table(
            {
                "src_id": pa.array(np.asarray(src_all, dtype=np.int64)),
                "tgt_id": pa.array(np.asarray(tgt_all, dtype=np.int64)),
                "margin": pa.array(np.asarray(mg_all, dtype=np.float64)),
            },
            schema=PAIR_SCHEMA,
        )

    return assigned.sort("cluster").map_batches(
        mine, batch_format="pyarrow", batch_size=None
    )
