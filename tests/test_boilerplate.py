"""Boilerplate classification + structured-data extraction (stages/boilerplate)."""

import json
import math

import pyarrow.parquet as pq

from commoncrawl_ray.stages.boilerplate import (
    BAD,
    GOOD,
    boilerplate_batch,
    classify_blocks,
    extract_main_text,
    extract_structured,
    structured_batch,
    walk_blocks,
    wrap_document_html,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(n=None):
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    return t.slice(0, n) if n else t


def test_wrapper_roundtrip_whole_table():
    # the oracle invariant: good blocks reassemble to exactly the text,
    # and the good count is the paragraph count
    for r in _docs().to_pylist():
        html = wrap_document_html(r["doc_id"], r["text"], r["lang"], r["source"])
        main, n_blocks, n_good = extract_main_text(html)
        assert main == r["text"]
        assert n_good == math.ceil(len(r["text"].split(" ")) / 12)
        assert n_blocks > n_good  # boilerplate blocks exist and were dropped


def test_link_density_classification():
    html = (
        "<body><div><a href='/x'>all link text here</a></div>"
        "<p>a long enough content paragraph with zero links inside it</p>"
        "<div>mixed <a href='/y'>link</a> but mostly plain prose that runs on</div>"
        "</body>"
    )
    w = walk_blocks(html)
    labels = classify_blocks(w.blocks)
    assert labels[0] == BAD  # link density 1.0
    assert labels[1] == GOOD
    assert labels[2] == GOOD  # link density < 1/3


def test_short_block_context_propagation():
    # short block between two good paragraphs -> good; short block
    # surrounded by bad -> bad
    html = (
        "<body><p>first long content paragraph with plenty of characters</p>"
        "<p>tiny</p>"
        "<p>second long content paragraph with plenty of characters</p>"
        "<div><a href='/a'>nav nav nav</a></div>"
        "<p>stub</p>"
        "<div><a href='/b'>footer footer</a></div></body>"
    )
    w = walk_blocks(html)
    labels = classify_blocks(w.blocks)
    texts = [b["text"] for b in w.blocks]
    assert labels[texts.index("tiny")] == GOOD
    assert labels[texts.index("stub")] == BAD


def test_unclosed_anchor_does_not_poison_later_blocks():
    # real HTML routinely leaves <a> unclosed; the block flush must
    # reset the anchor context or every later block reads link-dense
    html = (
        "<body><div><a href='/x'>unclosed link"
        "</div><p>a long plain content paragraph with zero anchors in it</p></body>"
    )
    w = walk_blocks(html)
    labels = classify_blocks(w.blocks)
    texts = [b["text"] for b in w.blocks]
    i = texts.index("a long plain content paragraph with zero anchors in it")
    assert w.blocks[i]["link_chars"] == 0
    assert labels[i] == GOOD


def test_structured_extraction_kinds():
    html = wrap_document_html(7, "alpha beta gamma", "de", "srcX")
    rows = extract_structured(html)
    d = {(k, key): v for k, key, v in rows}
    assert d[("jsonld", "identifier")] == "7"
    assert d[("jsonld", "wordCount")] == "3"
    assert d[("jsonld", "@type")] == "Article"
    assert ("jsonld", "@context") not in d  # @-keys other than @type skipped
    assert d[("og", "og:title")] == "Doc 7"
    assert d[("microdata", "name")] == "doc-7"
    assert d[("microdata", "genre")] == "de"


def test_structured_tolerates_bad_json_and_nesting():
    html = (
        '<script type="application/ld+json">{not json</script>'
        '<script type="application/ld+json">'
        + json.dumps({"@type": "Article", "author": {"name": "nested skipped"},
                      "headline": "kept"})
        + "</script>"
    )
    rows = extract_structured(html)
    keys = {(k, key) for k, key, _ in rows}
    assert ("jsonld", "headline") in keys
    assert ("jsonld", "author") not in keys  # nested object: scalar-only


def test_batch_kernels_match_sequential():
    t = _docs(50)
    b = boilerplate_batch(t)
    assert b.column("main_text").to_pylist() == t.column("text").to_pylist()
    s = structured_batch(t)
    # 10 structured rows per doc (5 jsonld + 3 og + 2 microdata)
    assert s.num_rows == 50 * 10
    assert set(s.column("kind").to_pylist()) == {"jsonld", "og", "microdata"}


def test_registry_queries_distributed(ray_session):
    from commoncrawl_ray.pipelines.queries import (
        q_boilerplate_extract,
        q_structured_data,
    )

    df = q_boilerplate_extract(SF_DIR).to_pandas()
    t = _docs()
    got = dict(zip(df["doc_id"], df["main_text"]))
    want = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    assert got == want
    s = q_structured_data(SF_DIR).count()
    assert s == t.num_rows * 10
