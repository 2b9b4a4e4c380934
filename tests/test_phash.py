"""Perceptual hashing + banded image near-dup (stages/multimodal)."""

import numpy as np
import pyarrow as pa

from commoncrawl_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    PHashStage,
    _dct_basis_int,
    phash_grid,
    phash_near_dup,
    synth_image_corpus,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_deterministic_and_robust():
    basis = _dct_basis_int()
    rs = np.random.RandomState(7)
    coarse = rs.randint(0, 256, size=(8, 8))
    g = np.clip(np.kron(coarse, np.ones((8, 8), dtype=np.int64)), 0, 255).astype(
        np.uint8
    )
    h1 = phash_grid(g, basis)
    assert h1 == phash_grid(g, basis)  # pure function
    # small perturbation -> small distance
    g2 = g.astype(np.int64)
    idx = rs.randint(0, 64, size=(160, 2))
    g2[idx[:, 0], idx[:, 1]] += rs.randint(-20, 21, size=160)
    h2 = phash_grid(np.clip(g2, 0, 255).astype(np.uint8), basis)
    assert _ham(h1, h2) <= 4
    # a different field -> far
    other = np.clip(
        np.kron(rs.randint(0, 256, size=(8, 8)), np.ones((8, 8), dtype=np.int64)),
        0,
        255,
    ).astype(np.uint8)
    assert _ham(h1, phash_grid(other, basis)) > 10


def test_phash_stage_matches_kernel():
    t = synth_image_corpus(16)
    out = PHashStage(fake=True)(t)
    basis = _dct_basis_int()
    for mid, h, p, m in zip(
        out.column("media_id").to_pylist(),
        out.column("phash").to_pylist(),
        t.column("payload").to_pylist(),
        t.column("meta").to_pylist(),
    ):
        g = np.frombuffer(p, np.uint8).reshape(m["height"], m["width"])
        assert h == phash_grid(g, basis), mid


def test_near_dup_finds_planted_pairs(ray_session):
    import ray.data as rd

    n = 64
    media = rd.from_arrow(synth_image_corpus(n)).repartition(5)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in phash_near_dup(media, max_hamming=4, fake=True).take_all()
    }
    planted = {(i - 1, i) for i in range(3, n, 4)}
    assert planted <= pairs
    # nothing absurd: pair count stays near the planted set
    assert len(pairs) <= len(planted) + 3


def test_audio_fp_properties():
    import numpy as np

    from commoncrawl_ray.stages.multimodal import (
        audio_fp_samples,
        synth_audio_corpus,
    )

    t = synth_audio_corpus(32)
    sams = [
        np.frombuffer(p, np.uint8).astype(np.int64) - 128
        for p in t.column("payload").to_pylist()
    ]
    fps = [audio_fp_samples(s) for s in sams]
    # deterministic + gain-invariant (sign bits survive volume scaling)
    assert fps[0] == audio_fp_samples(sams[0]) == audio_fp_samples(3 * sams[0])
    for i in range(3, 32, 4):  # planted near-dups
        assert _ham(fps[i - 1], fps[i]) <= 6
    assert _ham(fps[0], fps[4]) > 10  # distinct streams far apart


def test_audio_near_dup_finds_planted_pairs(ray_session):
    import ray.data as rd

    from commoncrawl_ray.stages.multimodal import (
        audio_fp_near_dup,
        synth_audio_corpus,
    )

    n = 64
    media = rd.from_arrow(synth_audio_corpus(n)).repartition(5)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in audio_fp_near_dup(media, max_hamming=6, fake=True).take_all()
    }
    planted = {(i - 1, i) for i in range(3, n, 4)}
    assert planted <= pairs
    assert len(pairs) <= len(planted) + 3


def test_bucket_cap_skips_flat_corpus(ray_session):
    import ray.data as rd

    from commoncrawl_ray.state.counters import get_counters, snapshot

    # 32 identical flat images: every band bucket is width-32 -> with a
    # cap of 8 every bucket is skipped and NO pairs come out
    flat = np.full((64, 64), 128, np.uint8).tobytes()
    t = pa.table(
        {
            "media_id": pa.array(range(32), pa.int64()),
            "kind": pa.array(["image"] * 32),
            "payload": pa.array([flat] * 32, pa.binary()),
            "meta": pa.array(
                [{"width": 64, "height": 64, "sample_rate": 0}] * 32,
                MEDIA_SCHEMA.field("meta").type,
            ),
        }
    )
    media = rd.from_arrow(t).repartition(3)
    out = phash_near_dup(media, max_hamming=4, fake=True, max_bucket_docs=8)
    assert out.count() == 0
    get_counters(create=True)  # counters actor exists in this session
    snap = snapshot()
    assert snap.get("phash_near_dup.skipped_buckets", 0) >= 8
