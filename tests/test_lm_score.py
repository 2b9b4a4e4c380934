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


# ---------------------------------------------------------------------------
# Interpolated Kneser–Ney table (kn_logprob_table)


def test_kn_is_normalized_per_context():
    """Every trigram conditional under KN must be a proper
    distribution — seen contexts (discount mass exactly re-assigned),
    unseen-bigram contexts (pure P2 backoff) and unseen-unigram
    contexts (pure P1 backoff) alike."""
    from commoncrawl_ray.stages.lm_score import kn_logprob_table

    g, c = batch_gram_counts(
        ["the quick brown fox jumps over the lazy dog 123", "aaa bbb aaa ccc"]
    )
    logp = kn_logprob_table(g, c)
    p = np.exp(logp).reshape(K * K, K).sum(axis=1)
    assert np.allclose(p, 1.0, atol=1e-10)


def test_kn_continuation_beats_raw_frequency():
    """The defining KN property: in an UNSEEN context the backoff
    prefers the symbol seen after many distinct contexts over the
    symbol that is frequent but glued to a single context (the
    'Francisco' effect — high count, one continuation)."""
    from commoncrawl_ray.stages.lm_score import kn_logprob_table

    # 'x' follows many distinct 2-symbol contexts once each;
    # 'q' appears more often in total but always in the same context.
    corpus = ["abx cdx efx ghx ijx klx", "zq zq zq zq zq zq zq zq zq zq"]
    g, c = batch_gram_counts(corpus)
    logp = kn_logprob_table(g, c).reshape(K, K, K)
    cx = encode_text("x")[0]
    cq = encode_text("q")[0]
    # a context never seen in training: both sides fall through to the
    # continuation-weighted lower orders
    u, v = encode_text("77")[:2]
    assert logp[u, v, cx] > logp[u, v, cq]


def test_kn_matches_sequential_fold_bitwise():
    """Feeding the same integer counts must produce bit-identical
    doubles no matter how the counts were accumulated (the contract
    the distributed fit relies on)."""
    from commoncrawl_ray.stages.lm_score import kn_logprob_table

    texts = ["the cat sat on the mat", "el gato 99", "aaa bbb"]
    g, c = batch_gram_counts(texts)
    ref = np.zeros(N_GRAMS, dtype=np.int64)
    for t in texts:
        ids = gram_ids(encode_text(t))
        if len(ids):
            ref += np.bincount(ids, minlength=N_GRAMS)
    nz = np.nonzero(ref)[0]
    a = kn_logprob_table(g, c)
    b = kn_logprob_table(nz.astype(np.int64), ref[nz])
    assert np.array_equal(a, b)


def test_kn_discount_mass_goes_to_backoff():
    """A seen trigram loses exactly D/c(uv·) of probability relative
    to its ML estimate plus the backoff share — spot-check the closed
    form for one seen gram."""
    from commoncrawl_ray.stages.lm_score import KN_DISCOUNT, kn_logprob_table

    g, c = batch_gram_counts(["abc abd abe"])
    logp = kn_logprob_table(g, c).reshape(K, K, K)
    a, b_ = encode_text("ab")[:2]
    cc = encode_text("c")[0]
    # context 'ab' seen 3 times with 3 distinct continuations
    T = np.zeros(N_GRAMS)
    T[g] = c
    T = T.reshape(K, K, K)
    c_ab = T[a, b_].sum()
    n1p = (T[a, b_] > 0).sum()
    # reconstruct p2 term indirectly: p3 = (c-D)/c_ab + D*n1p/c_ab * p2
    p3 = np.exp(logp[a, b_, cc])
    lower = (T[a, b_, cc] - KN_DISCOUNT) / c_ab
    assert p3 > lower  # interpolation strictly adds backoff mass
    assert p3 < lower + KN_DISCOUNT * n1p / c_ab  # p2 < 1
