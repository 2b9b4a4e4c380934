"""Margin-based bitext mining (stages/bitext.py): mine_block
semantics (mutual-best, threshold, planted-pair recovery, empty
sides), blocking invariance of the distributed miner, and the
pre-sort over-cap cluster drop."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from commoncrawl_ray.stages.bitext import mine_block
from commoncrawl_ray.stages.semdedup import _QSCALE, _norm_rows, quantize


def _q(mat):
    return quantize(_norm_rows(np.asarray(mat, dtype=np.float64)))


def test_mine_block_recovers_planted_pairs():
    rng = np.random.default_rng(4)
    base = rng.normal(size=(6, 16))
    # side A = base; side B = slightly perturbed copies (the planted
    # translations) plus two decoys
    a = base
    b = np.vstack([base + rng.normal(size=base.shape) * 0.01,
                   rng.normal(size=(2, 16))])
    ids = np.arange(100, 100 + len(a) + len(b), dtype=np.int64)
    sides = np.array([0] * len(a) + [1] * len(b), dtype=np.int8)
    q = _q(np.vstack([a, b]))
    src, tgt, mg = mine_block(ids, sides, q, k_neighbors=3, threshold=1.0)
    got = dict(zip(src, tgt))
    # every planted pair is mutual-best: A[i] (id 100+i) <-> B[i] (id 106+i)
    assert got == {100 + i: 106 + i for i in range(6)}
    assert all(m >= 1.0 for m in mg)


def test_mine_block_empty_side_and_threshold():
    rng = np.random.default_rng(5)
    q = _q(rng.normal(size=(4, 8)))
    ids = np.arange(4, dtype=np.int64)
    assert mine_block(ids, np.zeros(4, dtype=np.int8), q, 4, 1.0) == ([], [], [])
    # an impossible threshold yields no pairs even with both sides
    sides = np.array([0, 0, 1, 1], dtype=np.int8)
    src, tgt, mg = mine_block(ids, sides, q, 4, threshold=99.0)
    assert src == [] and tgt == [] and mg == []


def test_mine_block_is_mutual_best_only():
    # A0 is closest to B0 AND B1's best is also A0 -> B1 gets nothing
    a = np.array([[1.0, 0.0], [0.0, 1.0]])
    b = np.array([[0.9, 0.1], [0.8, 0.2]])  # both nearest A0
    ids = np.array([1, 2, 3, 4], dtype=np.int64)
    sides = np.array([0, 0, 1, 1], dtype=np.int8)
    src, tgt, _ = mine_block(ids, sides, _q(np.vstack([a, b])), 2, 0.0)
    assert list(zip(src, tgt)) == [(1, 3)]  # A0<->B0 mutual; B1 unpaired


def _union_table(n=80, d=8, seed=9):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n // 2, d))
    b = a + rng.normal(size=a.shape) * 0.05  # near-translations
    mat = np.vstack([a, b])
    return pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat]),
            "side": pa.array(
                [0] * (n // 2) + [1] * (n // 2), pa.int8()
            ),
        }
    )


def test_mine_bitext_blocking_invariant(ray_session):
    import ray as _ray

    from commoncrawl_ray.stages.bitext import mine_bitext

    t = _union_table()

    def run(parts):
        ds = _ray.data.from_arrow(t).repartition(parts)
        rows = mine_bitext(ds, dim=8, n_clusters=4, threshold=0.0).take_all()
        return sorted((r["src_id"], r["tgt_id"], r["margin"]) for r in rows)

    one, many = run(1), run(5)
    assert one == many
    assert len(one) > 0


def test_mine_bitext_over_cap_cluster_dropped(ray_session):
    import ray as _ray

    from commoncrawl_ray.stages.bitext import mine_bitext

    t = _union_table(n=60)
    ds = _ray.data.from_arrow(t).repartition(3)
    # every cluster is over a cap of 1 -> all dropped -> zero pairs,
    # and the assert inside the mining block never fires
    rows = mine_bitext(
        ds, dim=8, n_clusters=4, threshold=0.0, max_cluster_docs=1
    ).take_all()
    assert rows == []
