"""Distributed PCA (stages/pca.py): exact moment merging at any
blocking, deterministic components (sign convention), block-invariant
projections, and correctness vs plain numpy PCA on a known-structure
matrix."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from commoncrawl_ray.stages.pca import (
    QSCALE,
    components_from_moments,
    quantize,
)


def _rand_mat(n=200, d=8, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: a dominant direction PCA must find
    base = rng.normal(size=(n, d)) * 0.05
    base[:, 2] += rng.normal(size=n) * 0.9
    base[:, 5] += rng.normal(size=n) * 0.4
    return np.round(base, 5)


def _moments(mat):
    q = quantize(mat)
    return (
        q.shape[0],
        [int(v) for v in q.sum(axis=0)],
        [int(v) for v in (q.T @ q).reshape(-1)],
    )


def test_components_match_numpy_pca():
    mat = _rand_mat()
    n, s, g = _moments(mat)
    mean, comps, ratio = components_from_moments(n, s, g, k=3)

    # reference: plain float PCA on the quantization-rounded matrix
    x = np.rint(mat * QSCALE) / QSCALE
    c = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(c)
    top = evecs[:, np.argsort(-evals)[:3]].T
    for got, want in zip(comps, top):
        # eigenvectors match up to sign
        assert min(
            np.abs(got - want).max(), np.abs(got + want).max()
        ) < 1e-9
    # dominant axis is the one we injected
    assert int(np.argmax(np.abs(comps[0]))) == 2
    assert ratio[0] > ratio[1] > 0


def test_sign_convention_deterministic():
    mat = _rand_mat(seed=11)
    n, s, g = _moments(mat)
    _, c1, _ = components_from_moments(n, s, g, k=4)
    _, c2, _ = components_from_moments(n, s, g, k=4)
    assert np.array_equal(c1, c2)
    # largest-|entry| component of every eigenvector is positive
    for row in c1:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_moments_blocking_invariant(ray_session):
    import ray as _ray

    from commoncrawl_ray.stages.pca import collect_moments

    mat = _rand_mat(n=120, d=6, seed=3)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat]),
        }
    )
    seq = _moments(mat)
    for parts in (1, 7):
        ds = _ray.data.from_arrow(t).repartition(parts)
        assert collect_moments(ds) == seq  # exact ints, any blocking


def test_pca_projection_blocking_invariant(ray_session):
    import ray as _ray

    from commoncrawl_ray.stages.pca import pca

    mat = _rand_mat(n=90, d=6, seed=5)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat]),
        }
    )

    def run(parts):
        ds = _ray.data.from_arrow(t).repartition(parts)
        rows = pca(ds, k=2).take_all()
        return sorted((r["vec_id"], r["pc1"], r["pc2"]) for r in rows)

    a, b = run(1), run(6)
    assert a == b  # bit-identical, not just close
    # projections onto the dominant axis carry most of the variance
    p1 = np.array([r[1] for r in a])
    p2 = np.array([r[2] for r in a])
    assert p1.var() > p2.var() > 0
