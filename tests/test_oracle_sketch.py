"""Sketch-pipeline oracles (pipelines/oracle_sketch.py): the distributed
simhash / minhash-LSH queries must match the single-process oracles
value for value (the driver's DuckDB hash check runs the same compare
at sf0.01; this locks it at sf0.001)."""

import duckdb

SF = "/root/testdata/sf0.001"


def _cmp(ds, sql):
    cols = ds.schema().names
    got = ds.to_pandas().sort_values(cols).reset_index(drop=True)
    want = duckdb.sql(sql).df().sort_values(cols).reset_index(drop=True)
    assert list(want.columns) == cols
    assert got.equals(want), (got.head(), want.head())
    return len(got)


def test_simhash_docs_matches_scalar_oracle(ray_session):
    from commoncrawl_ray.pipelines.queries import SQL_SIMHASH_DOCS, q_simhash_docs

    assert _cmp(q_simhash_docs(SF), SQL_SIMHASH_DOCS) == 500


def test_minhash_lsh_matches_dict_oracle(ray_session):
    from commoncrawl_ray.pipelines.queries import (
        SQL_MINHASH_LSH_DEDUP,
        q_minhash_lsh_dedup,
    )

    assert _cmp(q_minhash_lsh_dedup(SF), SQL_MINHASH_LSH_DEDUP) > 0


def test_parse_extract_matches_single_process_oracle(ray_session):
    from commoncrawl_ray.pipelines.queries import SQL_PARSE_EXTRACT, q_parse_extract

    assert _cmp(q_parse_extract(SF), SQL_PARSE_EXTRACT) == 1975


def test_arc_roundtrip_matches_no_arc_oracle(ray_session):
    """The oracle path never touches the ARC layer, so equality proves
    the gzip-member write -> streaming read cycle is lossless."""
    from commoncrawl_ray.pipelines.queries import SQL_ARC_ROUNDTRIP, q_arc_roundtrip

    assert _cmp(q_arc_roundtrip(SF), SQL_ARC_ROUNDTRIP) == 160


def test_oracle_tables_rebuild_on_sf_change(tmp_path):
    """The sidecar invalidation: same sf_dir -> no rebuild (mtime
    stable); different sf_dir -> rebuilt."""
    import os

    from commoncrawl_ray.pipelines.oracle_sketch import oracle_simhash_table

    p = str(tmp_path / "sim.parquet")
    oracle_simhash_table("/root/testdata/sf0.001", p)
    m1 = os.stat(p).st_mtime_ns
    oracle_simhash_table("/root/testdata/sf0.001", p)
    assert os.stat(p).st_mtime_ns == m1
    oracle_simhash_table("/root/testdata/sf0.01", p)
    assert os.stat(p).st_mtime_ns != m1
