"""WordPiece trainer/encoder tests (stages/wordpiece.py): likelihood
scoring vs raw frequency, exact-integer tie determinism, greedy
longest-match encode incl. the whole-word-UNK rule, and distributed
count -> shared kernel parity."""

from collections import Counter

from commoncrawl_ray.stages.wordpiece import (
    UNK,
    _merge_sym,
    _word_symbols,
    encode_word_wordpiece,
    learn_wordpiece,
    vocab_to_table,
    wordpiece_vocab,
)


def test_word_symbols_and_merge():
    assert _word_symbols("abc") == ["a", "##b", "##c"]
    assert _word_symbols("") == []
    assert _merge_sym("a", "##b") == "ab"
    assert _merge_sym("##a", "##b") == "##ab"
    assert _merge_sym("a", "b") == "ab"  # right side without ## kept


def test_likelihood_score_beats_raw_frequency():
    """freq(un) = 10 vs freq(qu) = 3, but 'q' and 'u-as-##u' are rare
    outside those pairs, so score(q,##u) = 3/(3*anything_small) beats
    score(u,##n): WordPiece merges qu first where BPE would take un."""
    wc = {"un": 5, "une": 5, "qu": 3, "nn": 20, "uu": 20, "ee": 20}
    merges = learn_wordpiece(dict(wc), 1)
    # freq(q)=3, freq(##u)=3+20=23 -> score(q,##u)=3/69
    # freq(u)=30, freq(##n)=10+20=30 -> score(u,##n)=10/900
    assert merges[0] == ("q", "##u")


def test_tie_break_lexicographic_and_exact_integers():
    # identical scores -> lexicographically smallest pair first; the
    # comparison is exact-integer so equal rational scores really tie
    wc = {"ab": 3, "cd": 3}
    m1 = learn_wordpiece(dict(wc), 2)
    m2 = learn_wordpiece(dict(reversed(list(wc.items()))), 2)
    assert m1 == m2 == [("a", "##b"), ("c", "##d")]


def test_merges_stop_when_no_pairs_remain():
    merges = learn_wordpiece({"ab": 1}, 10)
    assert merges == [("a", "##b")]


def test_vocab_layout_unk_first_then_base_then_merges():
    wc = {"ab": 2, "ba": 1}
    merges = learn_wordpiece(dict(wc), 1)
    vocab = wordpiece_vocab(wc, merges)
    assert vocab[0] == UNK
    base = sorted({"a", "b", "##a", "##b"})
    assert vocab[1 : 1 + len(base)] == base
    assert vocab[-1] == _merge_sym(*merges[0])
    t = vocab_to_table(vocab)
    assert t.column("token_id").to_pylist() == list(range(len(vocab)))


def test_encode_greedy_longest_match():
    vocab = {"un", "##able", "##a", "##b", "##l", "##e", "u", "##n", "a"}
    assert encode_word_wordpiece("unable", vocab) == ["un", "##able"]
    # prefers the longest prefix even when shorter pieces exist
    vocab2 = {"una", "un", "u", "##n", "##a", "##ble", "##b", "##l", "##e"}
    assert encode_word_wordpiece("unable", vocab2) == ["una", "##ble"]


def test_encode_unk_is_whole_word():
    vocab = {"a", "##b"}
    # 'abz': z unmatched -> the WHOLE word is [UNK] (BERT rule)
    assert encode_word_wordpiece("abz", vocab) == [UNK]
    assert encode_word_wordpiece("", vocab) == []
    # first-position piece must be un-prefixed: '##b' alone can't
    # start a word
    assert encode_word_wordpiece("b", vocab) == [UNK]


def test_roundtrip_encodes_training_words_without_unk():
    wc = {"low": 5, "lower": 2, "lowest": 6, "newest": 3, "wide": 4}
    merges = learn_wordpiece(dict(wc), 30)
    vocab = set(wordpiece_vocab(wc, merges))
    for w in wc:
        pieces = encode_word_wordpiece(w, vocab)
        assert UNK not in pieces
        # pieces reassemble to the word
        joined = pieces[0] + "".join(p[2:] for p in pieces[1:])
        assert joined == w


def test_distributed_counts_feed_identical_vocab(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from commoncrawl_ray.stages.bpe import corpus_word_counts, pretokenize
    from commoncrawl_ray.stages.wordpiece import WordPieceEncodeStage

    texts = [
        "the quick brown fox",
        "the quicker browner foxes",
        "quick quick brown",
    ] * 5
    seq = Counter()
    for t in texts:
        seq.update(pretokenize(t))
    want_vocab = wordpiece_vocab(
        dict(sorted(seq.items(), key=lambda kv: (-kv[1], kv[0]))),
        learn_wordpiece(
            dict(sorted(seq.items(), key=lambda kv: (-kv[1], kv[0]))), 20
        ),
    )

    ds = rd.from_arrow(pa.table({"text": texts})).repartition(4)
    wc = corpus_word_counts(ds, max_words=1000)
    counts = dict(
        zip(wc.column("word").to_pylist(), wc.column("count").to_pylist())
    )
    got_vocab = wordpiece_vocab(counts, learn_wordpiece(counts, 20))
    assert got_vocab == want_vocab

    # encode stage parity vs direct greedy encode
    docs = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).repartition(3)
    enc = docs.map_batches(
        WordPieceEncodeStage,
        fn_constructor_args=(set(want_vocab),),
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).to_pandas()
    by_id = dict(zip(enc["doc_id"], enc["n_wordpiece_tokens"]))
    vset = set(want_vocab)
    for i, t in enumerate(texts):
        want = sum(len(encode_word_wordpiece(w, vset)) for w in pretokenize(t))
        assert by_id[i] == want
