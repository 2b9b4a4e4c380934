"""Crawl fairness (Gini) + host co-citation queries."""

import duckdb
import numpy as np
import pyarrow as pa


def _gini_sql(xs):
    con = duckdb.connect()
    con.register("c", pa.table({"host_fp": list(range(len(xs))), "x": xs}))
    return con.sql(
        """WITH r AS (SELECT x, row_number() OVER (ORDER BY x, host_fp) i FROM c)
           SELECT round(2.0*sum(i*x)/(count(*)*sum(x)) - (count(*)+1.0)/count(*), 6)
           FROM r"""
    ).fetchone()[0]


def test_gini_formula_bounds():
    # perfectly even -> 0; one host dominates -> near 1
    assert _gini_sql([5, 5, 5, 5]) == 0.0
    g = _gini_sql([0, 0, 0, 1000])
    assert g > 0.7
    # matches the closed form the Ray side computes
    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    order = np.argsort(np.array(xs), kind="stable")
    x = np.array(xs)[order]
    i = np.arange(1, len(x) + 1)
    n, sx, six = len(x), int(x.sum()), int((i * x).sum())
    assert _gini_sql(xs) == round(2.0 * six / (n * sx) - (n + 1.0) / n, 6)


def test_crawl_fairness_query(ray_session):
    from commoncrawl_ray.pipelines.queries import q_crawl_fairness

    t = q_crawl_fairness("/root/testdata/sf0.001")
    assert t.num_rows == 1
    g = t.column("gini")[0].as_py()
    assert 0.0 <= g < 1.0
    assert t.column("total_fetched")[0].as_py() > 0


def test_cocitation_planted(ray_session):
    # hand-check the pair rule on a tiny edge set through the same
    # block kernel the query uses: 2 srcs both link {a, b} -> (a, b)
    # co-cited twice; c only once with each -> filtered by the >= 2 cut
    import ray.data as rd

    edges = pa.table(
        {
            "src": pa.array(["s1", "s1", "s1", "s2", "s2"]),
            "dst": pa.array(["a.com", "b.com", "c.com", "a.com", "b.com"]),
        }
    )
    from commoncrawl_ray.stages.pagerank import _distinct_sorted

    ds = _distinct_sorted(rd.from_arrow(edges).repartition(2), ["src", "dst"])
    # reuse the query's block kernel via the public query path is
    # heavyweight here; instead assert the SQL definition directly
    con = duckdb.connect()
    con.register("e", edges)
    rows = con.sql(
        """SELECT a.dst, b.dst, count(*) FROM (SELECT DISTINCT src, dst FROM e) a
           JOIN (SELECT DISTINCT src, dst FROM e) b
           ON a.src=b.src AND a.dst<b.dst GROUP BY 1,2 HAVING count(*)>=2"""
    ).fetchall()
    assert rows == [("a.com", "b.com", 2)]
    assert ds.count() == 5


def test_search_snippet_boundaries(ray_session):
    import ray.data as rd

    from commoncrawl_ray.pipelines.queries import q_search_snippets

    # exercise the window clamps through the same kernel the query
    # uses, on a controlled table routed through a tmp sf_dir-like read
    import os
    import tempfile

    import pyarrow.parquet as pq_mod

    d = tempfile.mkdtemp(prefix="ccray_snip_")
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "data w2 w3 w4 w5 w6 w7",  # term at start: left clamp
                    "w1 w2 w3 w4 w5 w6 data",  # term at end: right clamp
                    "w1 data w3 data w5",  # first occurrence wins
                    "no match here",
                ]
            ),
        }
    )
    pq_mod.write_table(t, os.path.join(d, "documents.parquet"))
    got = {
        r["doc_id"]: (r["pos"], r["snippet"])
        for r in q_search_snippets(d).take_all()
    }
    assert got == {
        0: (1, "data w2 w3 w4 w5 w6"),
        1: (7, "w2 w3 w4 w5 w6 data"),
        2: (2, "w1 data w3 data w5"),
    }


def test_copair_block_kernel():
    # the shared vectorized kernel: s1 -> {a,b,c}, s2 -> {a,b} yields
    # pairs (a,b):2 (a,c):1 (b,c):1, duplicate rows collapse first
    from commoncrawl_ray.pipelines.queries import _copair_block

    t = pa.table(
        {
            "src": pa.array(["s1"] * 4 + ["s2"] * 2),
            "dst": pa.array(["a", "b", "c", "b", "a", "b"]),
        }
    )
    out = _copair_block(t, "src", "dst", max_out=64, op="test")
    got = {
        (a, b): n
        for a, b, n in zip(
            out.column("host_a").to_pylist(),
            out.column("host_b").to_pylist(),
            out.column("n").to_pylist(),
        )
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
    # over-cap key skipped entirely
    wide = pa.table(
        {
            "src": pa.array(["s"] * 10),
            "dst": pa.array([f"d{i}" for i in range(10)]),
        }
    )
    assert len(_copair_block(wide, "src", "dst", max_out=5, op="test")) == 0
