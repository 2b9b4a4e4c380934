"""Property tests (hypothesis) for the mergeable sketches: the merge
operation must behave like a commutative monoid fold over any
partitioning of the input — that algebraic law is exactly what the
distributed two-level reduce in stages/approx.py relies on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from commoncrawl_ray.functions.sketches import (
    HyperLogLog,
    KLLSketch,
    SpaceSaving,
)

ints = st.lists(st.integers(min_value=0, max_value=1 << 61), max_size=300)


@given(vals=ints, split=st.integers(min_value=1, max_value=7))
@settings(max_examples=60, deadline=None)
def test_hll_partition_invariance(vals, split):
    arr = np.array(vals, dtype=np.int64) if vals else np.empty(0, np.int64)
    whole = HyperLogLog(10).add_ints(arr)
    acc = HyperLogLog(10)
    for chunk in np.array_split(arr, split):
        acc.merge(HyperLogLog(10).add_ints(chunk))
    assert (acc.registers == whole.registers).all()
    # estimate depends only on the value SET, not multiplicity/order
    dup = HyperLogLog(10).add_ints(np.concatenate([arr, arr[::-1]]))
    assert (dup.registers == whole.registers).all()


@given(
    pairs=st.lists(
        st.tuples(st.sampled_from("abcdefgh"), st.integers(1, 100)), max_size=60
    ),
    split=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=60, deadline=None)
def test_spacesaving_exact_capacity_partition_invariance(pairs, split):
    # capacity >= alphabet => exact counts under ANY partitioning
    truth: dict[str, int] = {}
    for k, w in pairs:
        truth[k] = truth.get(k, 0) + w
    chunks = [pairs[i::split] for i in range(split)]
    acc = SpaceSaving(8)
    for c in chunks:
        part = SpaceSaving(8)
        for k, w in c:
            part.add_counted([k], [w])
        acc.merge(SpaceSaving.from_bytes(part.to_bytes()))
    got = {k: c for k, c, e in acc.top(8)}
    errs = {k: e for k, c, e in acc.top(8)}
    assert got == truth
    assert all(e == 0 for e in errs.values())


@given(
    vals=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32), max_size=200
    ),
    split=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=60, deadline=None)
def test_kll_exact_capacity_partition_invariance(vals, split):
    arr = np.array(vals, dtype=np.float64) if vals else np.empty(0, np.float64)
    whole = KLLSketch(256).add(arr)
    acc = KLLSketch(256)
    for chunk in np.array_split(arr, split):
        acc.merge(KLLSketch(256).add(chunk))
    if len(arr) == 0 or len(arr) > 256:
        return  # exactness claim only holds within capacity
    sv = np.sort(arr)
    for q in (0.25, 0.5, 0.9):
        exact = sv[int(np.ceil(q * len(sv))) - 1]
        assert whole.quantile(q) == exact
        assert acc.quantile(q) == exact
