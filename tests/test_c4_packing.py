"""Unit tests for the C4 cleaning kernel (q_c4_clean / _c4_rules),
the pinned webtext source, and the packing-efficiency eval — rule-level
planted cases the registry's DuckDB parity check can't isolate."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commoncrawl_ray.pipelines.queries import _c4_rules


def _run(texts: list[str]) -> dict[str, list[int]]:
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = _c4_rules(t)
    return {c: out.column(c).to_pylist() for c in out.column_names}


def test_c4_line_rules_each_direction():
    # one doc, one line per rule probe
    r = _run(
        [
            "alpha beta gamma.",  # kept: 3 words, terminal period
            "alpha beta.",  # dropped: <3 words
            "alpha beta gamma",  # dropped: no terminal punct
            "alpha beta gamma!",  # kept: bang
            "alpha beta gamma?",  # kept: question
            'alpha beta "gamma"',  # kept: closing quote
            "alpha javascript gamma.",  # dropped: javascript token
            "alpha JavaScript gamma.",  # dropped: case-insensitive
        ]
    )
    assert r["n_kept_lines"] == [1, 0, 0, 1, 1, 1, 0, 0]
    assert r["n_lines"] == [1] * 8


def test_c4_doc_rules():
    five = "\n".join(["one two three."] * 5)
    four = "\n".join(["one two three."] * 4)
    r = _run(
        [
            five,  # kept: 5 sentences
            four,  # dropped: 4 < 5 sentences
            five + "\nlorem ipsum here.",  # dropped: lorem ipsum
            five + "\ncode { body }.",  # dropped: brace anywhere
            "Lorem Ipsum.\n" + five,  # dropped: case-insensitive lorem
        ]
    )
    assert r["doc_kept"] == [1, 0, 0, 0, 0]
    # kept_chars counts only kept lines' characters
    assert r["kept_chars"][0] == 5 * len("one two three.")


def test_c4_multi_sentence_line_counts_all_marks():
    r = _run(["a b c! d e f? g h i. j k l. m n o."])
    assert r["n_lines"] == [1]
    assert r["n_kept_lines"] == [1]
    assert r["n_sentences"] == [5]
    assert r["doc_kept"] == [1]


def test_webtext_table_deterministic_and_mixed(tmp_path):
    from commoncrawl_ray.pipelines.oracle_sketch import oracle_webtext_table

    p1 = str(tmp_path / "wt1.parquet")
    p2 = str(tmp_path / "wt2.parquet")
    sf = "/root/testdata/sf0.001"
    oracle_webtext_table(sf, path=p1)
    oracle_webtext_table(sf, path=p2)
    a = pq.read_table(p1)
    b = pq.read_table(p2)
    assert a.equals(b)  # bit-identical across rebuilds
    out = _c4_rules(a)
    kept = sum(out.column("n_kept_lines").to_pylist())
    total = sum(out.column("n_lines").to_pylist())
    docs_kept = sum(out.column("doc_kept").to_pylist())
    # every rule fires both ways: lines and docs are a real mix
    assert 0 < kept < total
    assert 0 < docs_kept < len(a)


def test_packing_efficiency_tiny_exact(ray_session, tmp_path):
    from commoncrawl_ray.pipelines.queries import q_packing_efficiency

    # token counts 5, 1, 4, 2, 3 (doc_id order); seq_len=4 truncates
    # doc0 to 4; batch_docs=2.
    texts = [
        "a b c d e",
        "a",
        "a b c d",
        "a b",
        "a b c",
    ]
    d = tmp_path / "sf"
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = q_packing_efficiency(str(d), seq_len=4, batch_docs=2)
    rows = {
        r["strategy"]: r
        for r in out.to_pylist()
    }
    # arrival order lens: [4,1],[4,2],[3] -> padded 8+8+3=19, real 14
    assert rows["arrival"]["n_batches"] == 3
    assert rows["arrival"]["real_tokens"] == 14
    assert rows["arrival"]["padded_tokens"] == 19
    # sorted lens: 1,2,3,4,4 -> [1,2],[3,4],[4] -> padded 4+8+4=16
    assert rows["sorted"]["n_batches"] == 3
    assert rows["sorted"]["real_tokens"] == 14
    assert rows["sorted"]["padded_tokens"] == 16
    # the whole point: sorting never pads more
    assert rows["sorted"]["padded_tokens"] <= rows["arrival"]["padded_tokens"]


def test_packing_skips_empty_docs(ray_session, tmp_path):
    from commoncrawl_ray.pipelines.queries import q_packing_efficiency

    d = tmp_path / "sf"
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["a b", "", "c"], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = q_packing_efficiency(str(d), seq_len=4, batch_docs=2)
    rows = {r["strategy"]: r for r in out.to_pylist()}
    assert rows["arrival"]["n_batches"] == 1
    assert rows["arrival"]["real_tokens"] == 3  # empty doc excluded


def test_semantic_decontaminate_planted(ray_session, tmp_path):
    import numpy as np

    from commoncrawl_ray.pipelines.queries import q_semantic_decontaminate

    rng_free = np.eye(12, dtype=np.float32)  # orthonormal basis rows
    vecs = [rng_free[i % 12].tolist() for i in range(8)]  # eval set 0..7
    # train 8: exact copy of eval 3 -> contaminated, best_eval_id=3
    vecs.append(rng_free[3].tolist())
    # train 9: far from all evals (negative mix of unused basis dims)
    vecs.append((0.7071 * (rng_free[10] + rng_free[11])).tolist())
    d = tmp_path / "sf"
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(10), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    out = q_semantic_decontaminate(str(d), n_eval=8, tau=0.3)
    rows = {r["vec_id"]: r for r in out.take_all()}
    assert rows[8]["best_eval_id"] == 3
    assert rows[8]["best_cos"] == 1.0
    assert rows[8]["contaminated"] == 1
    assert rows[9]["contaminated"] == 0
    # tie-break: vec 9 is equidistant (cos 0) from every eval ->
    # smallest eval_id wins on both sides of the oracle
    assert rows[9]["best_eval_id"] == 0


def test_hard_negatives_planted(ray_session, tmp_path):
    import math

    from commoncrawl_ray.pipelines.queries import q_hard_negatives

    vecs = [
        [1.0, 0.0, 0.0, 0.0],  # query 0
        [0.0, 1.0, 0.0, 0.0],  # query 1
        [0.4, 0.0, math.sqrt(1 - 0.16), 0.0],  # cos .4 to q0 (kept)
        [0.9, 0.0, 0.0, math.sqrt(1 - 0.81)],  # cos .9 to q0 (excluded)
        [0.2, 0.3, math.sqrt(1 - 0.13), 0.0],  # cos .2/.3 (kept both)
    ]
    d = tmp_path / "sf"
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(5), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    out = q_hard_negatives(str(d), n_queries=2, k=10, pos_tau=0.45)
    rows = sorted(
        ((r["query_id"], r["rank"], r["vec_id"]) for r in out.take_all())
    )
    # q0: vec3 (cos .9) is a near-positive -> EXCLUDED; vec2 then vec4
    # q1: vec4 (.3) first, then the cos-0 tie broken by vec_id (2 < 3)
    assert rows == [
        (0, 1, 2),
        (0, 2, 4),
        (1, 1, 4),
        (1, 2, 2),
        (1, 3, 3),
    ]


def test_global_prefix_sum_multiblock_exact(ray_session):
    import ray as _ray

    from commoncrawl_ray.stages.rank import global_sorted_prefix_sum

    n = 1000
    ids = list(range(n))
    vals = [(i * 7) % 13 + 1 for i in ids]
    ds = _ray.data.from_arrow(
        pa.table({"k": pa.array(ids, pa.int64()), "v": pa.array(vals, pa.int64())})
    ).repartition(9)  # force multi-block summaries
    out = global_sorted_prefix_sum(ds, ["k"], "v", out_name="cum")
    rows = sorted((r["k"], r["cum"]) for r in out.take_all())
    acc = 0
    for i, (k, cum) in enumerate(rows):
        acc += vals[i]
        assert k == i and cum == acc


def test_token_budget_select_tiny(ray_session, tmp_path):
    from commoncrawl_ray.pipelines.queries import q_token_budget_select

    # n_chars picks the order: doc2 (9) first, doc0 (5), doc1 (3)
    texts = ["a b c", "x", "p q r s"]
    d = tmp_path / "sf"
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "n_chars": pa.array([5, 3, 9], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = q_token_budget_select(str(d), budget=7)
    rows = {r["doc_id"]: r for r in out.take_all()}
    # order: doc2 (4 toks, cum 4), doc0 (3, cum 7), doc1 (1, cum 8)
    assert rows[2]["cum_tokens"] == 4 and rows[2]["kept"] == 1
    assert rows[0]["cum_tokens"] == 7 and rows[0]["kept"] == 1  # exactly at budget
    assert rows[1]["cum_tokens"] == 8 and rows[1]["kept"] == 0
