"""BPE trainer/encoder kernel tests (stages/bpe.py): merge learning
on the textbook example, determinism, incremental-update consistency
vs a naive recount reference, encode behavior, distributed count
parity."""

import random
from collections import Counter, defaultdict

from commoncrawl_ray.stages.bpe import (
    count_words_batch,
    encode_word,
    learn_bpe,
    pretokenize,
)


def test_pretokenize_gpt2_style():
    toks = pretokenize("Hello world, it's 2024!")
    assert toks == ["Hello", " world", ",", " it", "'s", " 2024", "!"]
    assert pretokenize("") == []
    # pure whitespace emits nothing; leading space folds into words
    assert pretokenize("   ") == []


def test_learn_bpe_textbook():
    # Sennrich's example: low/lower/newest/widest family
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_bpe(wc, 4)
    # 'es' dominates (6+3=9), then 'est' (9)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert len(merges) == 4


def test_learn_bpe_tie_break_deterministic():
    # two pairs with equal weight -> lexicographically smallest first
    wc = {"ab": 3, "cd": 3}
    m1 = learn_bpe(dict(wc), 2)
    m2 = learn_bpe(dict(reversed(list(wc.items()))), 2)
    assert m1 == m2 == [("a", "b"), ("c", "d")]


def _naive_learn_bpe(word_counts, n_merges):
    """Full-recount reference (no incremental update)."""
    words = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc = defaultdict(int)
        for w, syms in words.items():
            f = word_counts[w]
            for p in zip(syms, syms[1:]):
                pc[p] += f
        if not pc:
            break
        best = max(pc.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0][0]]))
        # deterministic max: highest count, then smallest pair
        best_n = max(pc.values())
        best = min(p for p, n in pc.items() if n == best_n)
        merges.append(best)
        new = best[0] + best[1]
        for w, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and (syms[j], syms[j + 1]) == best:
                    out.append(new)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = out
    return merges


def test_incremental_matches_naive_recount():
    rng = random.Random(7)
    alphabet = "abcdef"
    wc = {}
    for _ in range(120):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
        wc[w] = wc.get(w, 0) + rng.randint(1, 20)
    fast = learn_bpe(dict(wc), 40)
    slow = _naive_learn_bpe(dict(wc), 40)
    assert fast == slow


def test_encode_word_lowest_rank_first():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est"]
    assert encode_word("xyz", ranks) == ["x", "y", "z"]
    assert encode_word("", ranks) == []


def test_count_words_batch_preaggregates():
    import pyarrow as pa

    t = pa.table({"text": ["a b a", "b c", None]})
    out = count_words_batch(t)
    got = dict(
        zip(out.column("word").to_pylist(), out.column("count").to_pylist())
    )
    assert got == {"a": 1, " b": 1, " a": 1, "b": 1, " c": 1}


def test_distributed_counts_match_sequential(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from commoncrawl_ray.stages.bpe import corpus_word_counts

    texts = [
        "the cat sat on the mat",
        "the dog ate the cat food",
        "cats and dogs",
    ] * 7
    seq = Counter()
    for t in texts:
        seq.update(pretokenize(t))
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(5)
    wc = corpus_word_counts(ds, max_words=1000)
    got = dict(
        zip(wc.column("word").to_pylist(), wc.column("count").to_pylist())
    )
    assert got == dict(seq)
    # cap keeps the deterministic (count desc, word asc) head
    wc2 = corpus_word_counts(ds, max_words=3)
    kept = sorted(seq.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got2 = list(
        zip(wc2.column("word").to_pylist(), wc2.column("count").to_pylist())
    )
    assert got2 == kept


def test_token_shard_export_files_match_digests(ray_session):
    """The packer's stats rows must describe the bytes actually on
    disk: re-read each shard_NNNNN.bin, check md5/size/token count,
    and check the id stream decodes back to per-doc EOD-terminated
    runs (n_docs EOD markers per shard)."""
    import hashlib
    import os

    import numpy as np

    from commoncrawl_ray.pipelines.queries import q_token_shard_export

    rows = q_token_shard_export("/root/testdata/sf0.001").take_all()
    assert len(rows) == 8
    out_dir = "/tmp/ccray_token_shards"
    for r in rows:
        path = os.path.join(out_dir, f"shard_{r['shard']:05d}.bin")
        blob = open(path, "rb").read()
        assert len(blob) == r["nbytes"]
        assert len(blob) // 4 == r["n_tokens"]
        assert hashlib.md5(blob).hexdigest() == r["digest_hex"]
        ids = np.frombuffer(blob, dtype="<u4")
        eod = ids.max()  # eod_id is the largest id by construction
        assert int((ids == eod).sum()) == r["n_docs"]
        assert ids[-1] == eod
