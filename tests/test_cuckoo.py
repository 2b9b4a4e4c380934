"""Cuckoo filter (state/cuckoo.py) — membership, deletion, FP rate,
checkpoint round-trip. Pure numpy; no Ray session needed."""

import numpy as np

from commoncrawl_ray.state.cuckoo import CuckooFilter


def test_membership_no_false_negatives():
    cf = CuckooFilter(expected_elements=5000)
    rs = np.random.RandomState(1)
    items = rs.randint(-(2**62), 2**62, size=4000, dtype=np.int64)
    assert cf.add_batch(items) == len(items)
    assert cf.maybe_present_batch(items).all()


def test_false_positive_rate_bounded():
    cf = CuckooFilter(expected_elements=5000)
    rs = np.random.RandomState(2)
    items = rs.randint(-(2**62), 2**62, size=4000, dtype=np.int64)
    cf.add_batch(items)
    probe = rs.randint(-(2**62), 2**62, size=20000, dtype=np.int64)
    probe = probe[~np.isin(probe, items)]
    fp_rate = cf.maybe_present_batch(probe).mean()
    # 16-bit fingerprints, 4-slot buckets: theoretical ~2*4/2^16 ≈ 0.00012
    assert fp_rate < 0.005, fp_rate


def test_delete_then_absent():
    cf = CuckooFilter(expected_elements=1000)
    items = np.arange(500, dtype=np.int64) * 7919 - 123456
    cf.add_batch(items)
    for fp in items[:100].tolist():
        assert cf.delete(int(fp))
    # deleted items gone (up to fingerprint collisions with survivors)
    still = cf.maybe_present_batch(items[:100]).mean()
    assert still < 0.05
    # survivors untouched — deletion must NOT create false negatives
    assert cf.maybe_present_batch(items[100:]).all()
    assert cf.count == 400


def test_checkpoint_roundtrip():
    cf = CuckooFilter(expected_elements=1000)
    items = np.arange(800, dtype=np.int64) * 104729
    cf.add_batch(items)
    blob = cf.to_bytes()
    cf2 = CuckooFilter.from_bytes(blob)
    assert cf2.nbuckets == cf.nbuckets and cf2.count == cf.count
    assert cf2.maybe_present_batch(items).all()


def test_full_filter_reports_failure():
    cf = CuckooFilter(expected_elements=16)  # min-size table (64 slots)
    rs = np.random.RandomState(3)
    inserted = 0
    for fp in rs.randint(-(2**62), 2**62, size=200, dtype=np.int64).tolist():
        if cf.add(int(fp)):
            inserted += 1
    assert inserted < 200  # overflow surfaced, not silently dropped
    assert cf.count == inserted


def test_failed_insert_rolls_back_no_false_negatives():
    """A failed eviction chain must leave the table exactly as it was:
    every previously-admitted fingerprint stays present (the AMQ
    no-false-negative guarantee), and count matches occupancy."""
    cf = CuckooFilter(expected_elements=16)  # minimum-size table
    rs = np.random.RandomState(9)
    admitted = []
    for fp in rs.randint(-(2**62), 2**62, size=300, dtype=np.int64).tolist():
        if cf.add(int(fp)):
            admitted.append(fp)
    assert len(admitted) < 300  # saturated: some adds failed
    assert cf.maybe_present_batch(np.array(admitted, dtype=np.int64)).all()
    assert cf.count == int((cf.table != 0).sum())
