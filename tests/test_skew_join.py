"""skew_join must be row-identical to merge_join for every supported
``how`` while actually routing mega-keys through the broadcast path —
the equivalence law the registry's docs_lang_join_skew oracle relies
on."""

from __future__ import annotations

import pyarrow as pa
import pytest

from commoncrawl_ray.stages.joins import merge_join, skew_join


def _rows(ds):
    return sorted(tuple(sorted(r.items())) for r in ds.take_all())


@pytest.fixture()
def skewed(ray_session):
    import ray as _ray

    lk = [1] * 500 + [2, 3, 4, 5, 6] * 4
    left = _ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(lk, pa.int64()),
                "lv": pa.array(range(len(lk)), pa.int64()),
            }
        )
    ).repartition(4)
    right = _ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 3, 4, 9], pa.int64()),
                "rv": pa.array([10, 11, 12, 20, 30, 40, 90], pa.int64()),
            }
        )
    ).repartition(2)
    return left, right


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_skew_join_equivalent_and_hot_path_used(skewed, how):
    left, right = skewed
    cols = [] if how in ("semi", "anti") else ["rv"]
    stats: dict = {}
    a = skew_join(
        left, right, "k", "k", cols, how=how, hot_threshold=100, stats=stats
    )
    b = merge_join(left, right, "k", "k", cols, how=how)
    assert _rows(a) == _rows(b)
    assert stats["hot_keys"] == [1]  # the mega-key went broadcast
    assert stats["hot_right_rows"] == 3


def test_skew_join_left_hot_key_missing_on_right(ray_session):
    # a key hot on the LEFT with zero right rows: the broadcast slice
    # is empty for it; left/anti semantics must still hold
    import ray as _ray

    left = _ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([7] * 300 + [8], pa.int64()),
                "lv": pa.array(range(301), pa.int64()),
            }
        )
    )
    right = _ray.data.from_arrow(
        pa.table({"k": pa.array([8], pa.int64()), "rv": pa.array([80], pa.int64())})
    )
    st: dict = {}
    a = skew_join(left, right, "k", "k", ["rv"], how="left",
                  hot_threshold=100, stats=st)
    b = merge_join(left, right, "k", "k", ["rv"], how="left")
    assert _rows(a) == _rows(b)
    assert st["hot_keys"] == [7] and st["hot_right_rows"] == 0
    anti = skew_join(left, right, "k", "k", [], how="anti", hot_threshold=100)
    assert anti.count() == 300


def test_skew_join_string_keys_and_no_hot_fallback(ray_session):
    import ray as _ray

    left = _ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["en"] * 200 + ["de", "fr"] * 5),
                "lv": pa.array(range(210), pa.int64()),
            }
        )
    )
    right = _ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["en", "de", "fr", "zz"]),
                "rv": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
    )
    a = skew_join(left, right, "k", "k", ["rv"], how="left", hot_threshold=100)
    b = merge_join(left, right, "k", "k", ["rv"], how="left")
    assert _rows(a) == _rows(b)
    # threshold nothing reaches -> pure merge_join fallback, same rows
    st: dict = {}
    c = skew_join(left, right, "k", "k", ["rv"], how="left",
                  hot_threshold=10_000, stats=st)
    assert _rows(c) == _rows(b)
    assert st["hot_keys"] == []


def test_skew_join_rejects_outer_and_caps(ray_session):
    import ray as _ray

    ds = _ray.data.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1], pa.int64())})
    )
    with pytest.raises(ValueError):
        skew_join(ds, ds, "k", "k", ["v"], how="outer")
    with pytest.raises(ValueError):
        skew_join(
            ds.union(ds), ds.union(ds), "k", "k", ["v"],
            hot_threshold=1, max_hot_right_rows=1,
        )
