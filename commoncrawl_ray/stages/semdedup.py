"""SemDeDup — semantic deduplication by cluster-then-prune
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): k-means over the embedding space,
then within each cluster drop every vector that has a
higher-priority near-duplicate (cosine >= threshold).

Built as two Ray-Data-first pieces, both exact-deterministic so the
whole pipeline value-hash-checks against a sequential oracle:

**Distributed spherical k-means (full corpus, bounded exchanges).**
Unlike ``stages/ann.kmeans_fit`` (driver-side Lloyd on a bounded
sample, the IVF coarse-quantizer path), this fits on EVERY row the way
PageRank iterates on every edge: per iteration ONE ``map_batches``
pass assigns the batch to broadcast centroids and emits <= k partial
rows (cluster, count, int64 quantized sum vector); a fan-in
``map_batches`` reduce tree (the sketch-family reduce shape — NOT
``repartition``) merges partials down to k rows on the driver. Two
determinism disciplines make this oracle-checkable where naive k-means
is not:

- centroid accumulation uses INTEGER units — each normalized vector is
  quantized to ``round(x * 2^24)`` int64 before summing, so partial
  sums are exact and order-free under any reduction tree (the repo's
  "integer units instead of distributed float SUM" rule). At ~2^37
  rows per cluster the int64 headroom runs out — at that scale drop
  the quantization to 2^16 or split hi/lo words.
- assignment rounds the cosine scores to 6 decimals BEFORE argmax
  (first-max tie-break = lowest cluster id), the knn_ivf discipline
  that absorbs BLAS shape-dependent ulps.

Initial centroids are the deterministic hash-sample rule shared with
``knn_ivf(sample_mode="hash")``: knuth32-select ~2k ids, order by id,
truncate to k — a pure function of the input, independent of block
layout.

**Within-cluster prune.** The final assignment is range-partitioned by
``sort(cluster)`` (equal clusters never split across blocks), then one
vectorized block pass computes the per-cluster cosine matrix and drops
every vector with a LOWER-id neighbor at ``sim >= threshold`` (keep
the canonical minimum — the exact-dedup "first per group" rule lifted
to approximate similarity). Over-wide clusters are SKIPPED and counted
via the shared skip-counter actor (the dedup-family ``max_bucket_docs``
discipline — no silent quadratic blow-ups, no silent caps).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.vec import list_to_matrix

_QSCALE = float(1 << 24)


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    n = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    return np.where(n > 0, mat / np.where(n == 0, 1.0, n), 0.0)


def quantize(mat: np.ndarray) -> np.ndarray:
    """Normalized float64 rows -> int64 units (exact, order-free sums)."""
    return np.rint(mat * _QSCALE).astype(np.int64)


def assign_rounded(xn: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Cluster ids via cosine rounded to 6 dp before argmax; numpy
    argmax takes the FIRST maximum, so ties break on lowest cluster."""
    scores = np.round(xn @ centroids.T, 6)
    return np.argmax(scores, axis=1).astype(np.int64)


def centroids_from_sums(
    qsums: np.ndarray, counts: np.ndarray, prev: np.ndarray
) -> np.ndarray:
    """Exact int64 (k, dim) sums + counts -> unit-normalized float64
    centroids; empty clusters keep their previous centroid. Every
    operation is a fixed float64 expression over exact integers, so
    any implementation that feeds it the same sums is bit-identical."""
    out = prev.copy()
    nz = counts > 0
    mean = qsums[nz].astype(np.float64) / (_QSCALE * counts[nz, None])
    out[nz] = _norm_rows(mean)
    return out


def init_centroids_hash(ds, k: int, id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic initial centroids: knuth32 hash-select ~2k ids,
    order by id, truncate to k (the knn_ivf 'hash' sample rule)."""
    from ..functions.sketches import knuth32

    n_rows = ds.count()
    if n_rows > k:
        thresh = np.uint64(min(1 << 32, int(np.ceil((1 << 32) * 2.0 * k / n_rows))))

        def hash_keep(t: pa.Table) -> pa.Table:
            ids_ = t.column(id_col).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(knuth32(ids_) < thresh))

        sample_ds = ds.map_batches(hash_keep, batch_format="pyarrow").sort(id_col).limit(k)
    else:
        sample_ds = ds.sort(id_col)
    tbl = sample_ds.take_batch(k, batch_format="pyarrow")
    return _norm_rows(list_to_matrix(tbl.column(vec_col)))


def _partial_schema(dim: int) -> pa.Schema:
    return pa.schema(
        [
            ("cluster", pa.int64()),
            ("n", pa.int64()),
            ("qsum", pa.list_(pa.int64(), dim)),
        ]
    )


def _merge_partial_rows(t: pa.Table, k: int, dim: int) -> pa.Table:
    """Sum partial rows by cluster — exact integers, any order."""
    cl = t.column("cluster").to_numpy(zero_copy_only=False)
    n = t.column("n").to_numpy(zero_copy_only=False)
    qs = list_to_matrix(t.column("qsum"), dtype=np.int64)
    counts = np.zeros(k, dtype=np.int64)
    np.add.at(counts, cl, n)
    sums = np.zeros((k, dim), dtype=np.int64)
    np.add.at(sums, cl, qs)
    nz = np.nonzero(counts)[0]
    return pa.table(
        {
            "cluster": pa.array(nz, pa.int64()),
            "n": pa.array(counts[nz]),
            "qsum": pa.FixedSizeListArray.from_arrays(
                pa.array(sums[nz].reshape(-1), pa.int64()), dim
            ),
        },
        schema=_partial_schema(dim),
    )


def kmeans_fit_distributed(
    ds,
    dim: int,
    k: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Full-corpus spherical k-means. Per iteration: one streaming
    assign+partial pass (<= k rows out per batch), one fan-in merge
    pass, <= k rows to the driver. Returns (k, dim) float64 unit
    centroids."""
    import ray

    centroids = init_centroids_hash(ds, k, id_col, vec_col)
    for _ in range(iters):
        ref = ray.put(centroids)

        def partials(t: pa.Table, _ref=ref) -> pa.Table:
            cent = ray.get(_ref)
            if len(t) == 0:
                return _partial_schema(dim).empty_table()
            xn = _norm_rows(list_to_matrix(t.column(vec_col)))
            cl = assign_rounded(xn, cent)
            q = quantize(xn)
            counts = np.zeros(k, dtype=np.int64)
            np.add.at(counts, cl, 1)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, cl, q)
            nz = np.nonzero(counts)[0]
            return pa.table(
                {
                    "cluster": pa.array(nz, pa.int64()),
                    "n": pa.array(counts[nz]),
                    "qsum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums[nz].reshape(-1), pa.int64()), dim
                    ),
                },
                schema=_partial_schema(dim),
            )

        merged = (
            ds.map_batches(partials, batch_format="pyarrow")
            .map_batches(
                lambda t: _merge_partial_rows(t, k, dim),
                batch_format="pyarrow",
                batch_size=32 * k,
            )
            .map_batches(
                lambda t: _merge_partial_rows(t, k, dim),
                batch_format="pyarrow",
                batch_size=32 * k,
            )
            .take_all()
        )
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        for row in merged:
            c = int(row["cluster"])
            counts[c] += int(row["n"])
            sums[c] += np.asarray(row["qsum"], dtype=np.int64)
        centroids = centroids_from_sums(sums, counts, centroids)
    return centroids


def semdedup(
    ds,
    dim: int,
    k: int = 16,
    iters: int = 4,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_docs: int | None = 4096,
):
    """Full SemDeDup: fit, assign, within-cluster prune. Returns a
    Dataset of (vec_id, cluster, keep) for every input row.

    ``max_cluster_docs``: clusters wider than this are not pruned
    (every member kept, skip counted) instead of materializing an
    O(b^2) similarity matrix in one block — the dedup-family cap rule.
    VERDICT r4 #3: over-cap clusters are dropped BEFORE the
    ``sort("cluster")`` exchange — a slim counting pass (per-batch
    <= k-row (cluster, n) partials -> one tiny groupby -> <= k rows to
    the driver) finds them first, their members bypass the sort
    entirely as keep=True rows, and ``prune_block`` ASSERTS it never
    sees one. So the prune exchange carries only clusters that will
    actually be pruned, never a multi-TB mega-cluster block.

    k-sizing rule: the prune exchange range-partitions on ``cluster``
    (<= k non-empty blocks, ~corpus/k rows of (id, cluster, dim x 8 B)
    each), so size k such that corpus_rows / k * (dim * 8 + 16) bytes
    fits a worker block — in SemDeDup's own regime k grows with the
    corpus (k ~ sqrt(N) at web scale: 10^10 rows, dim=768 -> k >= 10^5
    keeps blocks under ~1 GB). The default k=16 is the small-sf test
    configuration.
    """
    import ray
    from ray.data.aggregate import Sum

    centroids = kmeans_fit_distributed(
        ds, dim, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    ref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        cent = ray.get(ref)
        xn = _norm_rows(list_to_matrix(t.column(vec_col)))
        cl = assign_rounded(xn, cent)
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": pa.array(cl),
                "qvec": pa.FixedSizeListArray.from_arrays(
                    pa.array(quantize(xn).reshape(-1), pa.int64()), dim
                ),
            }
        )

    def prune_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(
                [(id_col, pa.int64()), ("cluster", pa.int64()), ("keep", pa.bool_())]
            ).empty_table()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        cl = t.column("cluster").to_numpy(zero_copy_only=False)
        q = list_to_matrix(t.column("qvec"), dtype=np.int64)
        keep = np.ones(len(ids), dtype=bool)
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        ends = np.r_[starts[1:], len(cl)]
        for s, e in zip(starts, ends):
            b = e - s
            if b < 2:
                continue
            if max_cluster_docs is not None and b > max_cluster_docs:
                # over-cap clusters are removed BEFORE the sort; one
                # reaching this block means the pre-sort drop failed
                raise AssertionError(
                    f"over-cap cluster {cl[s]} ({b} rows > "
                    f"{max_cluster_docs}) entered the prune exchange"
                )
            order = np.argsort(ids[s:e], kind="mergesort")
            xn = q[s:e][order].astype(np.float64) / _QSCALE
            sims = np.round(xn @ xn.T, 6)
            # drop every vector with a LOWER-id near-duplicate: strict
            # upper triangle (j > i in id order) marks the higher id
            dup = (np.triu(sims >= threshold, 1)).any(axis=0)
            keep[s + order[dup]] = False
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster": pa.array(cl),
                "keep": pa.array(keep),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    over: list[int] = []
    if max_cluster_docs is not None:
        # slim counting pass: re-runs only the assign lineage with a
        # <= k-row partial per batch (no qvec on the wire), one tiny
        # groupby, <= k rows to the driver
        def count_partial(t: pa.Table) -> pa.Table:
            cl = t.column("cluster").to_numpy(zero_copy_only=False)
            counts = np.bincount(cl, minlength=k)
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
            int(r["cluster"]) for r in size_rows if int(r["sum(n)"]) > max_cluster_docs
        )

    if over:
        from ..state.counters import count_skip

        count_skip("semdedup", buckets=len(over))
        over_arr = np.asarray(over, dtype=np.int64)

        def big_rows(t: pa.Table) -> pa.Table:
            cl = t.column("cluster").to_numpy(zero_copy_only=False)
            sub = t.filter(pa.array(np.isin(cl, over_arr))).drop_columns(["qvec"])
            return sub.append_column("keep", pa.array(np.ones(len(sub), dtype=bool)))

        def small_rows(t: pa.Table) -> pa.Table:
            cl = t.column("cluster").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(cl, over_arr)))

        kept_big = assigned.map_batches(big_rows, batch_format="pyarrow")
        small = assigned.map_batches(small_rows, batch_format="pyarrow")
        pruned = small.sort("cluster").map_batches(
            prune_block, batch_format="pyarrow", batch_size=None
        )
        return pruned.union(kept_big)

    return assigned.sort("cluster").map_batches(
        prune_block, batch_format="pyarrow", batch_size=None
    )


def _top_quota_block(
    t: pa.Table, quota: int, id_col: str, proto: bool, with_rank: bool
) -> pa.Table:
    """Block-local per-cluster top-``quota`` selection over (id,
    cluster, sim) rows: prototypes (sim desc) or edges (sim asc), ties
    to the lowest id. Vectorized lexsort + group-rank; emits a 1-based
    ``rank`` column when ``with_rank``."""
    fields = [
        (id_col, pa.int64()),
        ("cluster", pa.int64()),
        ("sim", pa.float64()),
    ] + ([("rank", pa.int64())] if with_rank else [])
    if len(t) == 0:
        return pa.schema(fields).empty_table()
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    cl = t.column("cluster").to_numpy(zero_copy_only=False).astype(np.int64)
    sim = t.column("sim").to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.lexsort((ids, -sim if proto else sim, cl))
    cl_s = cl[order]
    starts = np.ones(len(cl_s), dtype=bool)
    starts[1:] = cl_s[1:] != cl_s[:-1]
    idx = np.arange(len(cl_s), dtype=np.int64)
    grp_start = np.maximum.accumulate(np.where(starts, idx, 0))
    rank = idx - grp_start + 1
    keep = rank <= quota
    sel = order[keep]
    cols = {
        id_col: pa.array(ids[sel], pa.int64()),
        "cluster": pa.array(cl[sel], pa.int64()),
        "sim": pa.array(sim[sel], pa.float64()),
    }
    if with_rank:
        cols["rank"] = pa.array(rank[keep], pa.int64())
    return pa.table(cols)


def diversity_sample(
    ds,
    dim: int,
    n: int,
    k: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "prototypes",
):
    """Cluster-balanced diversity sampling: fit the distributed
    spherical k-means above, then select a ~``n``-row sample balanced
    across clusters — per cluster the ``ceil(n/k)`` rows ranked by
    cosine to their own centroid (``mode="prototypes"``: most
    prototypical first — the keep-easy end of Sorscher et al. 2022,
    "Beyond neural scaling laws: beating power law scaling via data
    pruning", which ranks examples by distance to their cluster
    centroid; ``mode="edges"``: least prototypical first — the
    keep-hard end that maximizes diversity). Ties break to the lowest
    id; sims round to 6 dp (the assign discipline), so the pick is
    exact-deterministic and oracle-checkable.

    Scale shape: NO corpus-scale exchange. One streaming assign pass
    emits per batch at most k x quota candidate rows (the pre-shuffle
    top-k combiner rule); the only all-to-all is a sort("cluster") of
    the CANDIDATE table (<= blocks x k x quota rows — sample-budget
    scale, so its low key cardinality is harmless), then one block
    pass takes the global per-cluster top-quota with a 1-based rank.
    Clusters smaller than the quota contribute what they have, so the
    result can be < n rows (counted by the caller if needed —
    deterministic, never silent)."""
    import math

    import ray

    if mode not in ("prototypes", "edges"):
        raise ValueError(f"mode must be 'prototypes' or 'edges', got {mode!r}")
    proto = mode == "prototypes"
    quota = max(1, math.ceil(n / k))
    centroids = kmeans_fit_distributed(
        ds, dim, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    ref = ray.put(centroids)

    def candidates(t: pa.Table, _ref=ref) -> pa.Table:
        cent = ray.get(_ref)
        if len(t) == 0:
            return pa.schema(
                [(id_col, pa.int64()), ("cluster", pa.int64()), ("sim", pa.float64())]
            ).empty_table()
        xn = _norm_rows(list_to_matrix(t.column(vec_col)))
        scores = np.round(xn @ cent.T, 6)
        cl = np.argmax(scores, axis=1).astype(np.int64)
        sim = scores[np.arange(len(cl)), cl]
        part = pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                "cluster": pa.array(cl),
                "sim": pa.array(sim, pa.float64()),
            }
        )
        return _top_quota_block(part, quota, id_col, proto, with_rank=False)

    cand = ds.map_batches(candidates, batch_format="pyarrow")
    return cand.sort("cluster").map_batches(
        lambda t: _top_quota_block(t, quota, id_col, proto, with_rank=True),
        batch_format="pyarrow",
        batch_size=None,
    )
