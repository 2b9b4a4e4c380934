"""Unigram-LM tokenizer tests (stages/unigram.py): lattice E-step vs
brute-force segmentation enumeration, seed/prune determinism, Viterbi
behavior, and distributed-fit vs sequential-fit bit parity."""

import itertools
import math

from commoncrawl_ray.stages.unigram import (
    QSCALE,
    cap_seed,
    m_step,
    prune_vocab,
    run_unigram_em,
    seed_pieces_of_word,
    viterbi_n_pieces,
    word_qcounts,
)


def test_seed_pieces_of_word_counts_occurrences():
    out = seed_pieces_of_word("aba", 2, 3)
    # substrings: a(x2), b, ab, ba, aba — each occurrence × freq 2
    assert out == {"a": 4, "b": 2, "ab": 2, "ba": 2, "aba": 2}
    # max_piece_len truncates
    out2 = seed_pieces_of_word("aba", 1, 2)
    assert "aba" not in out2 and out2["ab"] == 1


def test_cap_seed_keeps_all_singles_caps_multis():
    counts = {"a": 1, "b": 1, "ab": 10, "ba": 5, "bb": 5}
    logp = cap_seed(counts, 2)
    # both singles survive a cap of 2; multis keep top-2 by
    # (count desc, piece asc): ab, then ba (ties break ascending)
    assert set(logp) == {"a", "b", "ab", "ba"}
    total = sum(math.exp(v) for v in logp.values())
    assert abs(total - 1.0) < 1e-9


def _brute_expected_counts(word, logp, max_len):
    """Enumerate every segmentation, weight by its probability,
    accumulate expected piece counts — the O(2^n) reference for the
    forward-backward lattice."""

    def segs(s):
        if not s:
            yield []
            return
        for L in range(1, min(max_len, len(s)) + 1):
            p = s[:L]
            if p in logp:
                for rest in segs(s[L:]):
                    yield [p] + rest

    weights, pieces = [], []
    for seg in segs(word):
        weights.append(math.exp(sum(logp[p] for p in seg)))
        pieces.append(seg)
    z = sum(weights)
    exp_counts: dict[str, float] = {}
    for w, seg in zip(weights, pieces):
        for p in seg:
            exp_counts[p] = exp_counts.get(p, 0.0) + w / z
    return exp_counts, math.log(z)


def test_word_qcounts_matches_brute_force_enumeration():
    logp = {
        "a": math.log(0.3),
        "b": math.log(0.2),
        "ab": math.log(0.25),
        "ba": math.log(0.15),
        "aba": math.log(0.1),
    }
    for word in ["a", "ab", "aba", "abab", "ababa"]:
        qc, qll = word_qcounts(word, 3, logp, 3)
        exp, ll = _brute_expected_counts(word, logp, 3)
        for p, ec in exp.items():
            want = int(round(ec * 3 * QSCALE))
            assert abs(qc.get(p, 0) - want) <= 1, (word, p)
        assert abs(qll - int(round(ll * 3 * QSCALE))) <= 2


def test_word_qcounts_unsegmentable_returns_empty():
    qc, qll = word_qcounts("xyz", 1, {"a": 0.0}, 3)
    assert qc == {} and qll == 0


def test_m_step_floors_singles_and_drops_dead_multis():
    logp = m_step({"a": 100, "ab": 0, "b": 50}, {"a", "b", "c"})
    assert "ab" not in logp
    assert set(logp) == {"a", "b", "c"}  # c floored in at 1 quantum
    assert logp["c"] < logp["b"] < logp["a"]


def test_prune_vocab_deterministic_head():
    qc = {"a": 5, "b": 1, "ab": 10, "ba": 10, "bb": 3}
    out = prune_vocab(qc, {"a", "b"}, 2)
    # top-2 multis by (count desc, piece asc): ab before ba, bb cut
    assert set(out) == {"a", "b", "ab", "ba"}


def test_viterbi_prefers_learned_pieces_and_unk_falls_back():
    logp = {
        "a": math.log(0.1),
        "b": math.log(0.1),
        "ab": math.log(0.4),
        "abab": math.log(0.4),
    }
    assert viterbi_n_pieces("abab", logp, 4) == 1
    assert viterbi_n_pieces("ab", logp, 4) == 1
    assert viterbi_n_pieces("ba", logp, 4) == 2
    # unseen characters segment per-char at the UNK penalty
    assert viterbi_n_pieces("zz", logp, 4) == 2
    assert viterbi_n_pieces("", logp, 4) == 0


def _seq_fit(word_counts, seed_size, vocab_size, max_len):
    piece_counts: dict[str, int] = {}
    for w, f in word_counts.items():
        for p, c in seed_pieces_of_word(w, f, max_len).items():
            piece_counts[p] = piece_counts.get(p, 0) + c
    seed = cap_seed(piece_counts, seed_size)
    chars = {p for p in piece_counts if len(p) == 1}

    def qfn(logp):
        acc: dict[str, int] = {}
        for w, f in word_counts.items():
            qc, _ = word_qcounts(w, f, logp, max_len)
            for p, q in qc.items():
                acc[p] = acc.get(p, 0) + q
        return acc

    return run_unigram_em(qfn, seed, chars, vocab_size, max_len), chars


def test_fit_invariant_to_word_order():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "news": 4}
    m1, _ = _seq_fit(dict(wc), 50, 20, 4)
    m2, _ = _seq_fit(dict(reversed(list(wc.items()))), 50, 20, 4)
    assert m1 == m2  # bit-identical: integer merge is order-free


def test_distributed_fit_matches_sequential(ray_session):
    """The whole engine path (distributed count+cap, distributed
    substring seed, actor-pool E-step with groupby integer merge) must
    produce the bit-identical model to the sequential fold, at every
    partitioning."""
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from commoncrawl_ray.stages.bpe import pretokenize
    from commoncrawl_ray.stages.unigram import (
        UnigramEncodeStage,
        capped_word_counts_ds,
        distributed_qcounts_fn,
        seed_logp_distributed,
    )

    texts = [
        "the lowest lower low",
        "newest news is the widest",
        "low and lower and lowest",
        "wide wider widest news",
    ] * 6
    max_len, seed_size, vocab = 4, 80, 30

    seq_counts: Counter = Counter()
    for t in texts:
        seq_counts.update(pretokenize(t))
    kept = dict(
        sorted(seq_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    )
    want_model, _ = _seq_fit(kept, seed_size, vocab, max_len)

    for nparts in (1, 3, 7):
        ds = rd.from_arrow(pa.table({"text": texts})).repartition(nparts)
        words, total = capped_word_counts_ds(ds, 25)
        assert total == len(seq_counts)
        seed, chars = seed_logp_distributed(words, max_len, seed_size)
        got = run_unigram_em(
            distributed_qcounts_fn(words, max_len),
            seed,
            chars,
            vocab,
            max_len,
        )
        assert got == want_model, f"nparts={nparts}"

    # encode stage parity vs direct Viterbi
    docs = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).repartition(3)
    enc = docs.map_batches(
        UnigramEncodeStage,
        fn_constructor_args=(want_model, max_len),
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).to_pandas()
    by_id = dict(zip(enc["doc_id"], enc["n_unigram_tokens"]))
    for i, t in enumerate(texts):
        want = sum(
            viterbi_n_pieces(w, want_model, max_len) for w in pretokenize(t)
        )
        assert by_id[i] == want
