"""WordPiece tokenizer training + encoding (the BERT tokenizer;
Schuster & Nakajima 2012, the trainer HF `tokenizers` ships as
`WordPieceTrainer`). The third named subword trainer beside
stages/bpe.py (frequency-scored merges) and stages/unigram.py (EM over
the segmentation lattice). No reference counterpart (the reference
predates subword tokenizers); built from the public algorithm only.

Algorithm — what distinguishes it from BPE:

- **train**: symbols start as characters, non-initial ones carrying
  the ``##`` continuation prefix. Each round merges the adjacent pair
  maximizing the LIKELIHOOD score ``freq(pair) / (freq(left) *
  freq(right))`` — not the raw pair frequency — i.e. the merge that
  most increases a unigram LM's corpus likelihood. Scores are compared
  as exact integer cross-products (``n1·l2·r2`` vs ``n2·l1·r1`` in
  Python bigints), never as floats, so ordering is bit-deterministic
  on every host; ties break on the lexicographically smallest pair.
- **encode**: greedy longest-match-first over the vocabulary (BERT's
  MaxMatch WordPiece tokenizer): repeatedly take the longest prefix
  present in the vocab (``##``-prefixed after the first piece); a word
  with an unmatchable position encodes as the single ``[UNK]``.

Scale shape — identical two-regime split to BPE (the corpus is
reduced to (word, count) FIRST, distributed; the merge loop is
vocab-scale driver compute): reuse stages/bpe.corpus_word_counts
(within-batch Counter pre-agg, ONE groupby(word), deterministic
sort+limit cap), then ``learn_wordpiece`` on the capped table; encode
is a zero-exchange actor-pool stage with the vocab ray.put-broadcast
and a per-actor word memo (Zipf => ~1 hit rate).
"""

from __future__ import annotations

import pyarrow as pa

CONT = "##"
UNK = "[UNK]"


def _word_symbols(word: str) -> list[str]:
    """Initial WordPiece symbolization: first char bare, the rest
    ``##``-prefixed."""
    return [word[0]] + [CONT + c for c in word[1:]] if word else []


def _merge_sym(a: str, b: str) -> str:
    """Pair -> merged symbol: the right side drops its ``##``."""
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def learn_wordpiece(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Likelihood-scored merge learning over a word-frequency table.
    Pure + deterministic: exact-integer score comparison (cross-
    multiplied bigints) with (pair asc) tie-break — the engine and the
    sequential oracle both call THIS on their respective word counts,
    so a registry hash match isolates the distributed counting path.

    Recount-per-round implementation: with the capped word table
    (≤ tens of thousands of words) and a few hundred merges this is
    vocab-scale driver math, same regime as stages/bpe.learn_bpe —
    chosen over the incremental update because the likelihood score
    depends on UNIT frequencies too (every merge changes the left and
    right symbols' own counts), which makes incremental deltas touch
    far more state than BPE's pair-count-only update."""
    words: list[list[str]] = [_word_symbols(w) for w in word_counts]
    freqs: list[int] = list(word_counts.values())

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        sym_counts: dict[str, int] = {}
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, f in zip(words, freqs):
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + f
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
        best: tuple[str, str] | None = None
        bn = bl = br = 0
        for p, n in pair_counts.items():
            l, r = sym_counts[p[0]], sym_counts[p[1]]
            if best is None:
                best, bn, bl, br = p, n, l, r
                continue
            # n/(l·r) vs bn/(bl·br) as exact integers
            lhs = n * bl * br
            rhs = bn * l * r
            if lhs > rhs or (lhs == rhs and p < best):
                best, bn, bl, br = p, n, l, r
        if best is None or bn < 1:
            break
        merges.append(best)
        new_sym = _merge_sym(*best)
        for i, syms in enumerate(words):
            j = 0
            out: list[str] = []
            while j < len(syms):
                if (
                    j < len(syms) - 1
                    and syms[j] == best[0]
                    and syms[j + 1] == best[1]
                ):
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return merges


def wordpiece_vocab(
    word_counts: dict[str, int], merges: list[tuple[str, str]]
) -> list[str]:
    """Vocabulary = [UNK] + base symbols (sorted) + merged symbols in
    merge order — the id layout BERT vocab files ship (specials
    first, then subwords)."""
    base: set[str] = set()
    for w in word_counts:
        base.update(_word_symbols(w))
    vocab = [UNK] + sorted(base)
    seen = set(vocab)
    for m in merges:
        s = _merge_sym(*m)
        if s not in seen:
            vocab.append(s)
            seen.add(s)
    return vocab


def vocab_to_table(vocab: list[str]) -> pa.Table:
    return pa.table(
        {
            "token": pa.array(vocab, pa.string()),
            "token_id": pa.array(range(len(vocab)), pa.int64()),
        }
    )


def encode_word_wordpiece(word: str, vocab: set[str]) -> list[str]:
    """BERT's greedy longest-match-first WordPiece encode: the longest
    vocab prefix at each position (``##``-prefixed after the first
    piece); any unmatchable position collapses the whole word to
    [UNK] (the BERT rule, not per-char fallback)."""
    if not word:
        return []
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = n
        piece = None
        while j > i:
            cand = word[i:j] if i == 0 else CONT + word[i:j]
            if cand in vocab:
                piece = cand
                break
            j -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        i = j
    return out


class WordPieceEncodeStage:
    """Actor-pool encode: vocab ray.put-broadcast once per actor,
    per-actor word->n_pieces memo; (doc_id, n_wordpiece_tokens) out,
    zero exchanges."""

    def __init__(self, vocab_ref):
        import ray

        v = ray.get(vocab_ref) if not isinstance(vocab_ref, (set, list)) else vocab_ref
        self._vocab = set(v)
        self._memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.bpe import pretokenize

        out = []
        for t in batch.column("text").to_pylist():
            n = 0
            for w in pretokenize(t or ""):
                k = self._memo.get(w)
                if k is None:
                    k = len(encode_word_wordpiece(w, self._vocab))
                    self._memo[w] = k
                n += k
            out.append(n)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_wordpiece_tokens": pa.array(out, pa.int64()),
            }
        )
