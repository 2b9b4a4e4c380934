"""Content-defined chunking kernel (functions/cdc.py)."""

import numpy as np

from commoncrawl_ray.functions.cdc import cdc_boundaries, cdc_chunk_fps


def _data(n=4096, seed=7):
    return bytes(np.random.RandomState(seed).randint(0, 256, n, dtype=np.uint8))


def test_boundaries_partition_the_input():
    data = _data()
    ends = cdc_boundaries(data)
    assert ends[-1] == len(data)
    assert ends == sorted(set(ends))
    prev = 0
    for e in ends[:-1]:
        assert e - prev >= 24  # min_size clamp
        prev = e


def test_deterministic():
    data = _data()
    assert cdc_boundaries(data) == cdc_boundaries(data)
    assert cdc_chunk_fps(data) == cdc_chunk_fps(data)


def test_insertion_only_shifts_local_chunks():
    """The CDC property: prepending bytes re-chunks only the head;
    most downstream chunk fingerprints survive unchanged (a fixed-size
    chunker would lose every one)."""
    data = _data(8192)
    fps_before = {fp for fp, _ in cdc_chunk_fps(data)}
    shifted = b"xyz-inserted-prefix" + data
    fps_after = {fp for fp, _ in cdc_chunk_fps(shifted)}
    common = len(fps_before & fps_after)
    assert common >= 0.6 * len(fps_before)


def test_short_inputs():
    assert cdc_boundaries(b"") == []
    assert cdc_boundaries(b"abc") == [3]
    assert cdc_chunk_fps(b"") == []
    (fp, ln), = cdc_chunk_fps(b"tiny")
    assert ln == 4 and fp > 0
