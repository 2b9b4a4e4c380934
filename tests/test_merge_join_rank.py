"""merge_join (stages/joins.py) and grouped_topk (stages/rank.py)
operator semantics: row expansion, left-join null payloads, int64
range preservation, per-group ranking."""

import numpy as np
import pyarrow as pa
import ray.data as rd

BIG = (1 << 62) + 12345  # would corrupt through a float64 decay


def _left():
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 3], pa.int64()),
                "lv": pa.array([10, 11, 20, BIG], pa.int64()),
            }
        )
    )


def _right():
    return rd.from_arrow(
        pa.table(
            {
                "rk": pa.array([1, 2, 2, 4], pa.int64()),
                "pay": pa.array([BIG, 200, 201, 400], pa.int64()),
            }
        )
    )


def test_merge_join_inner_expands_and_preserves_int64(ray_session):
    from commoncrawl_ray.stages.joins import merge_join

    out = merge_join(_left(), _right(), "k", "rk", ["pay"], how="inner")
    rows = sorted((r["k"], r["lv"], r["pay"]) for r in out.take_all())
    # k=1: two left rows x one right; k=2: one left x two rights; k=3 dropped
    assert rows == [(1, 10, BIG), (1, 11, BIG), (2, 20, 200), (2, 20, 201)]


def test_merge_join_left_keeps_unmatched_with_nulls(ray_session):
    from commoncrawl_ray.stages.joins import merge_join

    out = merge_join(_left(), _right(), "k", "rk", ["pay"], how="left")
    rows = sorted((r["k"], r["lv"], r["pay"]) for r in out.take_all())
    assert (3, BIG, None) in rows and len(rows) == 5


def test_merge_join_suffix_and_collision(ray_session):
    import pytest

    from commoncrawl_ray.stages.joins import merge_join

    with pytest.raises(ValueError):
        merge_join(_left(), _right().map_batches(
            lambda b: b.rename_columns(["rk", "lv"]), batch_format="pyarrow"
        ), "k", "rk", ["lv"])
    out = merge_join(
        _left(),
        _right().map_batches(
            lambda b: b.rename_columns(["rk", "lv"]), batch_format="pyarrow"
        ),
        "k",
        "rk",
        ["lv"],
        suffix="_r",
    )
    assert "lv_r" in out.schema().names


def test_grouped_topk_ranks_and_caps(ray_session):
    from commoncrawl_ray.stages.rank import grouped_topk

    t = pa.table(
        {
            "g": pa.array(["a"] * 5 + ["b"] * 2, pa.string()),
            "v": pa.array([5, 3, 9, 9, 1, 7, 7], pa.int64()),
            "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        }
    )
    out = grouped_topk(rd.from_arrow(t), "g", "v", 3, "id")
    rows = sorted((r["g"], r["rank"], r["id"], r["v"]) for r in out.take_all())
    # group a: v desc -> ids 3(9),4(9 tie by id),1(5); group b keeps both (k>size)
    assert rows == [
        ("a", 1, 3, 9),
        ("a", 2, 4, 9),
        ("a", 3, 1, 5),
        ("b", 1, 6, 7),
        ("b", 2, 7, 7),
    ]


def test_grouped_topk_pre_combine_is_invisible(ray_session):
    """Partial per-block top-k before the exchange must not change the
    result even when each input block holds only a slice of a group."""
    import numpy as np

    from commoncrawl_ray.stages.rank import grouped_topk

    rng = np.random.RandomState(7)
    n = 2000
    t = pa.table(
        {
            "g": pa.array((rng.randint(0, 20, n)).astype("int64")),
            "v": pa.array(rng.randint(0, 1000, n).astype("int64")),
            "id": pa.array(np.arange(n, dtype="int64")),
        }
    )
    ds = rd.from_arrow(t).repartition(16)
    a = sorted(map(tuple, (r.values() for r in grouped_topk(ds, "g", "v", 5, "id").take_all())))
    b = sorted(map(tuple, (r.values() for r in grouped_topk(ds, "g", "v", 5, "id", pre_combine=False).take_all())))
    assert a == b and len(a) == 100


def test_grouped_topk_ascending(ray_session):
    from commoncrawl_ray.stages.rank import grouped_topk

    t = pa.table(
        {
            "g": pa.array(["x"] * 3, pa.string()),
            "v": pa.array([3, 1, 2], pa.int64()),
            "id": pa.array([1, 2, 3], pa.int64()),
        }
    )
    out = grouped_topk(rd.from_arrow(t), "g", "v", 2, "id", descending=False)
    rows = sorted((r["rank"], r["v"]) for r in out.take_all())
    assert rows == [(1, 1), (2, 2)]


def test_merge_join_semi_emits_each_matching_left_row_once(ray_session):
    from commoncrawl_ray.stages.joins import merge_join

    out = merge_join(_left(), _right(), "k", "rk", [], how="semi")
    rows = sorted((r["k"], r["lv"]) for r in out.take_all())
    # k=1 matches (two left rows, each once despite one right dup-free
    # match), k=2 matches once despite TWO right rows, k=3 unmatched
    assert rows == [(1, 10), (1, 11), (2, 20)]
    assert out.schema().names == ["k", "lv"]


def test_merge_join_anti_emits_unmatched_left_rows(ray_session):
    from commoncrawl_ray.stages.joins import merge_join

    out = merge_join(_left(), _right(), "k", "rk", [], how="anti")
    rows = sorted((r["k"], r["lv"]) for r in out.take_all())
    assert rows == [(3, BIG)]  # int64 survives (no pandas decay)


def test_merge_join_anti_empty_result_keeps_schema(ray_session):
    from commoncrawl_ray.stages.joins import merge_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "lv": pa.array([1, 2], pa.int64())})
    )
    out = merge_join(left, _right(), "k", "rk", [], how="anti")
    assert out.count() == 0
    assert out.schema().names == ["k", "lv"]


def test_global_sorted_rank_matches_sequential(ray_session):
    """global_sorted_rank over a shuffled multi-block dataset must
    equal the sequential argsort row_number — including ties in the
    value column broken by the unique tiebreak."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from commoncrawl_ray.stages.rank import global_sorted_rank

    rng = np.random.default_rng(7)
    n = 500
    val = rng.integers(0, 40, n).astype(np.float64)  # heavy ties
    key = np.array([f"k{i:04d}" for i in rng.permutation(n)])
    t = pa.table({"v": pa.array(val), "key": pa.array(key)})
    ds = rd.from_arrow(t).repartition(13)
    out = {
        r["key"]: r["rank"]
        for r in global_sorted_rank(ds, ["v", "key"], "rank").take_all()
    }
    order = sorted(range(n), key=lambda i: (val[i], key[i]))
    for rank0, i in enumerate(order):
        assert out[key[i]] == rank0 + 1


def test_grouped_sorted_prefix_sum_matches_sequential(ray_session):
    """grouped_sorted_prefix_sum = SUM OVER (PARTITION BY g ORDER BY
    k, uid) — exact against a pandas oracle, with a DOMINANT group
    (90% of rows) so the check covers groups that span many sort
    blocks; rank mode (value_col=None) and the totals dict too."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from commoncrawl_ray.stages.rank import grouped_sorted_prefix_sum

    rng = np.random.default_rng(3)
    n = 5000
    g = np.where(rng.random(n) < 0.9, "big", rng.choice(["a", "b"], n))
    df = pd.DataFrame(
        {
            "g": g,
            "k": rng.integers(0, 50, n).astype(np.int64),  # heavy ties
            "uid": rng.permutation(n).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(17)

    out, totals = grouped_sorted_prefix_sum(ds, ["g", "k", "uid"], "v", "cum")
    got = out.to_pandas().sort_values(["g", "k", "uid"]).reset_index(drop=True)
    want = df.sort_values(["g", "k", "uid"]).reset_index(drop=True)
    want["cum"] = want.groupby("g")["v"].cumsum()
    assert (got["cum"].to_numpy() == want["cum"].to_numpy()).all()
    assert totals == want.groupby("g")["v"].sum().to_dict()

    out2, tot2 = grouped_sorted_prefix_sum(ds, ["g", "k", "uid"], None, "rnk")
    got2 = out2.to_pandas().sort_values(["g", "k", "uid"]).reset_index(drop=True)
    want["rnk"] = want.groupby("g").cumcount() + 1
    assert (got2["rnk"].to_numpy() == want["rnk"].to_numpy()).all()
    assert tot2 == want.groupby("g").size().to_dict()


def test_grouped_sorted_prefix_sum_splits_dominant_group(ray_session):
    """The scale property itself: with a group holding ~all rows, the
    sorted stage must SPLIT it across blocks (the former sort(group)
    co-partition shape would put it in one) — asserted by counting
    distinct blocks that carry the dominant group."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from commoncrawl_ray.stages.rank import grouped_sorted_prefix_sum

    n = 4000
    df = pd.DataFrame(
        {
            "g": np.array(["mega"] * n),
            "uid": np.arange(n, dtype=np.int64),
            "v": np.ones(n, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(16)
    out, totals = grouped_sorted_prefix_sum(ds, ["g", "uid"], "v", "cum")
    assert totals == {"mega": n}

    def block_span(t):
        import pyarrow as pa

        if len(t) == 0:
            return pa.table({"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())})
        u = t.column("cum").to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(u.min())]), "hi": pa.array([int(u.max())])})

    spans = out.map_batches(
        block_span, batch_format="pyarrow", batch_size=None
    ).take_all()
    assert len(spans) > 1, "dominant group must span multiple blocks"
    covered = sorted((r["lo"], r["hi"]) for r in spans)
    assert covered[0][0] == 1 and covered[-1][1] == n
