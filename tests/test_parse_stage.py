"""End-to-end parse/extract stage over the synthetic pages table via Ray
Data — the engine's text-parity invariant (BASELINE.json input_hint:
byte-identical extracted text per url at any parallelism)."""

import hashlib
import os

import pyarrow.parquet as pq
import pytest

from commoncrawl_ray.sources.synth import get_universe, write_pages_parquet
from commoncrawl_ray.stages.parse_extract import extract_record, parse_extract_batch

from commoncrawl_ray.sources.synth import PAGES_FIXTURE_VERSION

PAGES_PATH = f"/tmp/cc_ray_test_pages_v{PAGES_FIXTURE_VERSION}_sf0001.parquet"


@pytest.fixture(scope="module")
def pages_file():
    if not os.path.exists(PAGES_PATH):
        write_pages_parquet(PAGES_PATH, 0.001)
    return PAGES_PATH


def test_extract_deterministic(pages_file):
    uni = get_universe(0.001)
    url = uni.canon_page_url(uni.hosts[1], 0)
    rec = uni.synth_page(url)
    a = extract_record(url, rec)
    b = extract_record(url, rec)
    assert a["text"] == b["text"] and a["links"] == b["links"]


def test_parse_batch_matches_golden_column(pages_file):
    table = pq.read_table(pages_file)
    out = parse_extract_batch(table)
    got = out.column("text").to_pylist()
    want = table.column("text").to_pylist()
    assert got == want  # byte-identical text per url
    # sanity on the variant mix
    st = out.column("http_status").to_pylist()
    assert set(st) == {200}
    dispos = out.column("disposition").to_pylist()
    assert {0, 1, 2, 3} >= set(dispos) and 1 in dispos
    assert any(f != 0 for f in out.column("flags").to_pylist())  # truncated gzip present
    assert any(t is None for t in want)  # reject/junk mimes yield null text


def test_parse_stage_via_ray(ray_session, pages_file):
    import ray.data as rd

    ds = rd.read_parquet(pages_file)
    docs = ds.map_batches(parse_extract_batch, batch_format="pyarrow", batch_size=256)
    out = docs.to_pandas()
    golden = pq.read_table(pages_file).to_pandas()
    merged = out.merge(golden[["url", "text"]], on="url", suffixes=("", "_golden"))
    assert len(merged) == len(golden)
    mismatch = merged[merged["text"].fillna("\0") != merged["text_golden"].fillna("\0")]
    assert len(mismatch) == 0
    # digests stable
    for _, row in merged.head(50).iterrows():
        if row["text"] is not None:
            assert row["text_digest"] == hashlib.md5(row["text"].encode()).digest()


def test_urls_fingerprinted(pages_file):
    table = pq.read_table(pages_file)
    out = parse_extract_batch(table.slice(0, 300))
    fps = out.column("url_fp").to_pylist()
    canons = out.column("canon_url").to_pylist()
    assert sum(c is not None for c in canons) > 250
    assert len(set(fps)) > 250
