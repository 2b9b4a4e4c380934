"""Distributed suffix ranking / duplicated-window census (stages/suffix)."""

import pyarrow as pa
import pyarrow.parquet as pq

from commoncrawl_ray.stages.suffix import (
    dup_window_census,
    explode_tokens_batch,
    sequential_dup_window_census,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_explode_positions():
    t = explode_tokens_batch(_docs_table([(0, "a b c"), (5, "x y")]))
    assert t.column("tok").to_pylist() == ["a", "b", "c", "x", "y"]
    gids = t.column("gid").to_pylist()
    assert gids[:3] == [0, 1, 2]
    assert gids[3] == 5 << 20


def test_sequential_census_planted():
    # doc 0 and 1 share the 4-token run "p q r s"; doc 2 is disjoint
    rows = [
        (0, "p q r s alpha beta"),
        (1, "gamma p q r s delta"),
        (2, "u v w x y z"),
    ]
    res = sequential_dup_window_census([{"doc_id": d, "text": x} for d, x in rows])
    assert res[0][0] == 4 and res[1][0] == 4  # longest pow2 dup window
    assert res[2] == (0, 0, 0)
    # window-1 dups: the 4 shared tokens
    assert res[0][1] == 4 and res[1][1] == 4


def test_overlapping_self_repeat():
    # "a a a": 1-windows all dup; 2-windows ("a a" at 0 and 1) dup
    res = sequential_dup_window_census([{"doc_id": 0, "text": "a a a"}])
    assert res[0][0] == 2 and res[0][1] == 3


def test_sequential_strip_planted():
    from commoncrawl_ray.stages.suffix import sequential_dup_window_strip

    shared = "p1 p2 p3 p4 p5 p6 p7 p8"  # an exact 8-token window
    rows = [
        (0, f"{shared} tail0 only0"),
        (1, f"head1 {shared} tail1"),
        (2, "u v w x y z q r"),
    ]
    res = sequential_dup_window_strip(
        [{"doc_id": d, "text": x} for d, x in rows]
    )
    assert res[0] == ("tail0 only0", 2, 8)
    assert res[1] == ("head1 tail1", 2, 8)
    assert res[2][2] == 0  # untouched


def test_distributed_strip_matches_sequential(ray_session):
    import ray.data as rd

    from commoncrawl_ray.stages.suffix import (
        dup_window_strip,
        sequential_dup_window_strip,
    )

    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).slice(0, 150)
    want = sequential_dup_window_strip(t.to_pylist())
    got = {
        r["doc_id"]: (r["stripped_text"], r["n_kept"], r["n_stripped"])
        for r in dup_window_strip(rd.from_arrow(t).repartition(5)).take_all()
    }
    assert got == want


def test_distributed_matches_sequential_any_partitioning(ray_session):
    import ray.data as rd

    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).slice(0, 120)
    want = sequential_dup_window_census(t.to_pylist())
    for parts in (1, 3, 7):
        ds = rd.from_arrow(t).repartition(parts)
        got = {
            r["doc_id"]: (r["max_dup_len"], r["n_dup_1"], r["n_dup_8"])
            for r in dup_window_census(ds).take_all()
        }
        assert got == want, parts
