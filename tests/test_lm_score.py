"""Kernel tests for the CCNet-style char-trigram LM scorer
(stages/lm_score.py). Pure numpy — no Ray session needed; the
distributed fit/score parity is covered by the lm_perplexity row in
tests/test_queries_oracle.py."""

import numpy as np

from commoncrawl_ray.stages.lm_score import (
    ALPHA,
    K,
    N_GRAMS,
    batch_gram_counts,
    encode_text,
    gram_ids,
    logprob_table,
    score_nll,
)


def test_encode_alphabet_classes():
    codes = encode_text("aZ9 \t\n.é中")
    # a->1, Z->26, 9->36, ws->0 (x3), '.'->other-ascii, é/中->non-ascii
    assert codes.tolist() == [1, 26, 36, 0, 0, 0, 37, 38, 38]


def test_gram_ids_window_and_short_text():
    c = encode_text("abc")
    assert gram_ids(c).tolist() == [1 * K * K + 2 * K + 3]
    assert gram_ids(encode_text("ab")).tolist() == []
    assert gram_ids(encode_text("")).tolist() == []


def test_batch_counts_match_per_doc_sum():
    texts = ["the cat sat", "the cat", "", None and "x" or "on a mat"]
    g, c = batch_gram_counts(texts)
    dense = np.zeros(N_GRAMS, dtype=np.int64)
    dense[g] = c
    ref = np.zeros(N_GRAMS, dtype=np.int64)
    for t in texts:
        ids = gram_ids(encode_text(t))
        if len(ids):
            ref += np.bincount(ids, minlength=N_GRAMS)
    assert np.array_equal(dense, ref)


def test_logprob_is_normalized_per_context():
    """exp(logp) must sum to 1 over the K next-symbols for every
    context — including contexts never seen in training (pure
    smoothing mass)."""
    g, c = batch_gram_counts(["the quick brown fox jumps over the lazy dog 123"])
    logp = logprob_table(g, c)
    p = np.exp(logp).reshape(K * K, K).sum(axis=1)
    assert np.allclose(p, 1.0, atol=1e-12)


def test_trained_text_scores_lower_than_gibberish():
    corpus = ["the cat sat on the mat " * 20]
    g, c = batch_gram_counts(corpus)
    logp = logprob_table(g, c)
    _, nll_seen = score_nll("the cat sat on the mat", logp)
    _, nll_junk = score_nll("zqxj vwkp qzzx jjjj", logp)
    assert nll_seen < nll_junk


def test_score_nll_short_doc_is_zero():
    logp = logprob_table(*batch_gram_counts(["abcabc"]))
    assert score_nll("ab", logp) == (0, 0.0)
    assert score_nll("", logp) == (0, 0.0)


def test_smoothing_alpha_uniform_for_unseen_context():
    """An unseen context gives the uniform distribution log(1/K)."""
    logp = logprob_table(*batch_gram_counts(["aaaa"]))
    # context (z,z) never seen -> P = ALPHA / (0 + ALPHA*K) = 1/K
    zz = 26 * K * K + 26 * K + 26
    assert np.isclose(logp[zz], np.log(1.0 / K))
    assert ALPHA > 0


def test_lmratio_stage_kernel_matches_sequential():
    """LMRatioStage (DSIR importance scoring) must equal the
    sequential per-doc log p_target - log p_raw mean, and rank a
    target-like document above an off-domain one."""
    import pyarrow as pa

    from commoncrawl_ray.stages.lm_score import LMRatioStage

    target_corpus = ["the cat sat on the mat " * 10]
    raw_corpus = target_corpus + ["zqxj vwkp qzzx jjjj " * 10]
    logp_t = logprob_table(*batch_gram_counts(target_corpus))
    logp_s = logprob_table(*batch_gram_counts(raw_corpus))

    docs = ["the cat sat on a mat", "zqxj vwkp zzzz", "ab", ""]
    stage = LMRatioStage(logp_t, logp_s)  # ndarray path: no ray.get
    out = stage(pa.table({"doc_id": list(range(4)), "text": docs}))

    ratios = out.column("logratio").to_pylist()
    n_grams = out.column("n_grams").to_pylist()
    for i, text in enumerate(docs):
        g = gram_ids(encode_text(text))
        if len(g):
            want = (logp_t[g].sum() - logp_s[g].sum()) / len(g)
            assert ratios[i] == round(want, 6)
            assert n_grams[i] == len(g)
        else:
            assert (n_grams[i], ratios[i]) == (0, 0.0)
    assert ratios[0] > ratios[1]  # in-domain text scores higher
    assert "text" not in out.column_names
