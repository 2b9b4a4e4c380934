"""Distributed logistic-regression document classifier.

The quality/language classifiers real curation pipelines train
(fastText-style: CCNet §3.2, FineWeb's edu scorer) reduced to the
engine primitive they need: full-batch gradient descent where every
iteration is ONE streaming pass over a slim feature table and the
gradient is aggregated EXACTLY.

Determinism discipline (the semdedup centroid trick): every
document's per-feature gradient contribution is quantized to int64
units of 2^-24 BEFORE summing, so the distributed Sum is exact under
any block order / reduction tree and bit-identical to a sequential
fold. The driver updates float64 weights from those exact integer
sums; per-document math (sigmoid, dot) is element-wise float64 on
identical inputs, so it reproduces bit-for-bit in the sequential
oracle. No wall clock, no RNG: weights start at zero and the feature
extraction is exact integer counts ratioed in float64.

Scale shape: the feature table is (doc_id, 3-4 float64 features,
label) — corpus-cardinality but ~40 B/row, materialized once;
each iteration ships only (n_features+1) int64 partial sums per
block and broadcasts the (tiny) weight vector in the task closure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

Q = np.int64(1) << np.int64(24)  # gradient quantization unit: 2^-24


def doc_features(n_words: np.ndarray, word_chars: np.ndarray,
                 n_stop: np.ndarray) -> np.ndarray:
    """(n, 3) float64 design matrix from exact integer counts:
    [bias=1, stop-word ratio, mean word length / 10]. Zero-word
    documents get zero ratios (guarded, not NaN)."""
    n = len(n_words)
    x = np.ones((n, 3), dtype=np.float64)
    nz = n_words > 0
    x[:, 1] = np.where(nz, n_stop / np.maximum(n_words, 1), 0.0)
    x[:, 2] = np.where(nz, word_chars / np.maximum(n_words, 1) / 10.0, 0.0)
    return x


def grad_quantized(x: np.ndarray, y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Exact int64 gradient contribution sum for one batch:
    sum_i round((sigmoid(x_i . w) - y_i) * x_ij * 2^24)."""
    p = 1.0 / (1.0 + np.exp(-(x @ w)))
    g = (p - y)[:, None] * x
    return np.round(g * float(Q)).astype(np.int64).sum(axis=0)


def fit_logreg(ds, feature_fn, n_features: int, lr: float = 1.0,
               iters: int = 10) -> np.ndarray:
    """Full-batch GD over a Ray Dataset. ``feature_fn(batch) ->
    (x, y)`` maps a pyarrow batch to the design matrix and 0/1
    labels. ``ds`` should be a slim materialized feature table — each
    iteration re-scans it. Returns the float64 weight vector."""
    from ray.data.aggregate import Sum

    n_total = ds.count()
    w = np.zeros(n_features, dtype=np.float64)
    for _ in range(iters):
        w_now = w.copy()

        def partials(t: pa.Table, _w=w_now) -> pa.Table:
            x, y = feature_fn(t)
            g = grad_quantized(x, y, _w)
            return pa.table({f"g{j}": pa.array([g[j]]) for j in range(len(g))})

        sums = ds.map_batches(partials, batch_format="pyarrow").aggregate(
            *[Sum(f"g{j}", alias_name=f"g{j}") for j in range(n_features)]
        )
        g = np.array(
            [sums[f"g{j}"] or 0 for j in range(n_features)], dtype=np.float64
        ) / float(Q)
        w = w - lr * g / n_total
    return w


def fit_logreg_sequential(x: np.ndarray, y: np.ndarray, lr: float = 1.0,
                          iters: int = 10) -> np.ndarray:
    """Sequential oracle fold: identical quantized-gradient math, one
    process, file order. Must equal fit_logreg bit-for-bit."""
    n, k = x.shape
    w = np.zeros(k, dtype=np.float64)
    for _ in range(iters):
        g = grad_quantized(x, y, w).astype(np.float64) / float(Q)
        w = w - lr * g / n
    return w


_STOP8 = ("the", "be", "to", "of", "and", "that", "have", "with")


def count_features(text_col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact integer (n_words, word_chars, n_stop8) from a pyarrow
    string column — shared verbatim by the distributed batch path and
    the sequential oracle, so the design matrix is identical on both
    sides by construction."""
    import pyarrow.compute as pc

    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    n_words = pc.count_substring_regex(text_col, pattern=r"\S+").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_chars = pc.utf8_length(text_col).to_numpy(zero_copy_only=False).astype(np.int64)
    n_ws = pc.count_substring_regex(text_col, pattern=r"\s").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    toks = pc.split_pattern_regex(pc.utf8_lower(text_col), pattern=r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    is_stop = pc.is_in(flat, value_set=pa.array(_STOP8)).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    n_stop = np.add.reduceat(is_stop, starts) if len(flat) else np.zeros(
        len(text_col), np.int64
    )
    return n_words, n_chars - n_ws, n_stop
