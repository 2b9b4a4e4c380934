"""Driver-style correctness gate, run locally: every SQL-checkable
queries() entry must match its oracle_sql() via DuckDB on the same
parquet tables (row count + sorted-column value equality), at sf0.01.
"""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    try:
        import pyarrow as pa

        if isinstance(result, pa.Table):
            return result.to_pandas()
    except ImportError:
        pass
    return result.to_pandas()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    # unify int dtypes
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df


def _pairs():
    from commoncrawl_ray.pipelines.queries import REGISTRY

    return [(n, fn, sql) for n, (fn, sql) in REGISTRY.items() if sql is not None]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(ray_session, name, fn, sql):
    got = _normalize(_to_pandas(fn(SF_DIR)))
    want = _normalize(_duck(sql))
    assert list(got.columns) == list(want.columns), (
        name,
        got.columns,
        want.columns,
    )
    assert len(got) == len(want), (name, len(got), len(want))
    for c in got.columns:
        if pd.api.types.is_float_dtype(want[c]):
            assert (
                (got[c] - want[c]).abs().fillna(0) < 1e-6
            ).all() or got[c].equals(want[c]), (name, c)
        else:
            assert got[c].tolist() == want[c].tolist(), (name, c)


def test_rows_only_queries_run(ray_session):
    """Non-SQL entries at least run and return rows with stable schema."""
    from commoncrawl_ray.pipelines.queries import REGISTRY

    small = "/root/testdata/sf0.001"
    for name in ("simhash_docs", "text_quality"):
        fn = REGISTRY[name][0]
        df = _to_pandas(fn(small))
        assert len(df) > 0, name


def test_entry_smoke(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__ray_entry__")
    res = mod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert {"url", "canon_url", "url_fp", "http_status"} <= set(df.columns)


def test_dup_passage_gram_key_modes_agree(ray_session):
    """VERDICT r4 #1: the int64 hash gram wire (default) must produce
    byte-identical output to the materialized-string gram wire — for
    both the detection and the strip pipelines (sf0.01)."""
    from commoncrawl_ray.pipelines.queries import q_dup_passage_strip, q_dup_passages

    for fn in (q_dup_passages, q_dup_passage_strip):
        got_hash = _normalize(_to_pandas(fn(SF_DIR)))
        got_str = _normalize(_to_pandas(fn(SF_DIR, gram_key="str")))
        pd.testing.assert_frame_equal(got_hash, got_str)


def test_zipf_fit_recovers_planted_exponent(ray_session):
    """A corpus whose token counts are constructed to follow
    freq(rank) = C * rank^(-1.2) exactly must fit alpha ~ 1.2."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from commoncrawl_ray.pipelines.queries import q_zipf_fit

    V, alpha, C = 300, 1.2, 5000.0
    counts = np.maximum(1, np.round(C * np.arange(1, V + 1) ** (-alpha))).astype(int)
    words = []
    for i, c in enumerate(counts):
        words.extend([f"w{i:04d}"] * int(c))
    rs = np.random.RandomState(0)
    rs.shuffle(words)
    docs, B = [], 500
    for off in range(0, len(words), B):
        docs.append(" ".join(words[off:off + B]))
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        row = q_zipf_fit(d).take_all()[0]
    assert row["k"] == 256
    assert abs(row["alpha"] - alpha) < 0.05


def test_host_template_threshold_invariants(ray_session):
    """Hosts below the 3-page minimum must have zero template grams;
    ratios live in [0, 1]; template grams never exceed distinct grams."""
    from commoncrawl_ray.pipelines.queries import q_host_template_grams

    df = _to_pandas(q_host_template_grams("/root/testdata/sf0.001"))
    assert len(df) > 0
    assert (df["n_template"] <= df["n_grams"]).all()
    assert df["template_ratio"].between(0.0, 1.0).all()
    small = df[df["pages"] < 3]
    assert (small["n_template"] == 0).all()
    assert (df["pages"] >= 1).all()


def test_collocations_pmi_planted_pair(ray_session):
    """A corpus where 'new york' is always adjacent while filler words
    pair randomly must rank the planted pair first, with its exact
    count and the shared-kernel PMI value."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from commoncrawl_ray.functions.textstats import pmi_scores
    from commoncrawl_ray.pipelines.queries import q_collocations_pmi

    rs = np.random.RandomState(3)
    fillers = [f"f{i}" for i in range(40)]
    docs = []
    for _ in range(60):
        toks = []
        for _ in range(30):
            if rs.rand() < 0.2:
                toks.extend(["new", "york"])
            else:
                toks.append(fillers[rs.randint(40)])
        docs.append(" ".join(toks))
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        rows = q_collocations_pmi(d).take_all()
    assert rows, "no collocations returned"
    top = rows[0]
    assert (top["w1"], top["w2"]) == ("new", "york")
    # hand-fold the counts and check the exact pmi of the planted pair
    from collections import Counter

    uni, big = Counter(), Counter()
    for t in docs:
        ws = t.split(" ")
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    n_tok, n_pairs = sum(uni.values()), sum(big.values())
    want = float(
        pmi_scores(
            np.array([big[("new", "york")]]),
            np.array([uni["new"]]),
            np.array([uni["york"]]),
            n_pairs,
            n_tok,
        )[0]
    )
    assert top["n_pair"] == big[("new", "york")]
    assert top["pmi"] == want


def test_oov_census_planted_vocab_boundary(ray_session):
    """A corpus with 300 tokens whose counts strictly decrease must
    put exactly the top-256 in vocab: the rarest 44 token types are
    OOV, and per-language counts are exact."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from commoncrawl_ray.pipelines.queries import q_oov_census

    V = 300
    words = []
    for i in range(V):
        words.extend([f"t{i:03d}"] * (V - i))  # count(t_i) = 300 - i
    rs = np.random.RandomState(5)
    rs.shuffle(words)
    docs, langs, B = [], [], 450
    for k, off in enumerate(range(0, len(words), B)):
        docs.append(" ".join(words[off:off + B]))
        langs.append("aa" if k % 2 == 0 else "bb")
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        rows = {r["lang"]: r for r in q_oov_census(d).take_all()}
    # sequential check: same top-256 rule (counts strictly decreasing,
    # so no tie at the boundary)
    from collections import Counter

    uni = Counter()
    per_lang = {}
    for t, lg in zip(docs, langs):
        ws = t.split(" ")
        uni.update(ws)
        per_lang.setdefault(lg, []).extend(ws)
    vocab = {w for w, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:256]}
    assert vocab == {f"t{i:03d}" for i in range(256)}
    for lg, ws in per_lang.items():
        assert rows[lg]["n_tokens"] == len(ws)
        assert rows[lg]["n_oov"] == sum(1 for w in ws if w not in vocab)
