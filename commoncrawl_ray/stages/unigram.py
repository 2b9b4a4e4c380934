"""Unigram-LM tokenizer training + encoding (SentencePiece's default
algorithm; Kudo 2018, "Subword Regularization: Improving Neural
Network Translation Models with Multiple Subword Candidates").

The second of the two named subword trainers (stages/bpe.py is the
first): a vocabulary of pieces is FIT as a unigram language model by
EM over the segmentation lattice of every word, then pruned to size;
encoding is the Viterbi segmentation under the learned piece
log-probs. No reference counterpart (the reference predates subword
tokenizers); built from the public algorithm only.

Scale shape — and where it BEATS the BPE trainer's two-regime split:

- **corpus-scale** (distributed): pre-tokenize + count words inside
  ``map_batches`` exactly as BPE does (the wire carries (word, count)
  partials, never the token stream), ONE global ``groupby(word)``,
  deterministic-cap sort+limit. The capped word table stays a
  **Dataset** — it is never pulled to the driver.
- **word-scale E-step** (distributed — the part BPE runs on the
  driver): every EM iteration is ONE ``map_batches`` pass over the
  word-count Dataset with the current piece log-probs
  ``ray.put``-broadcast; each batch folds its words' expected piece
  counts into per-batch partials, and ONE piece-scale
  ``groupby(piece).sum`` merges them. Per-word expected counts are
  QUANTIZED to fixed-point int64 (``QSCALE``) before they leave the
  word, so the cross-batch merge is an integer sum — bit-identical
  under any batching/reduction order (the house integer-partials
  discipline; see stages/pca.py for the same trick on moments).
- **vocab-scale M-step / prune** (driver): probability renormalization
  and the keep-top-K prune run over the ≤ ``seed_size`` piece table.

Determinism contract: the per-word lattice forward-backward is a pure
float64 kernel evaluated in a fixed loop order, so for a given word and
piece table both the engine and the sequential oracle produce the SAME
floats, quantization makes each word's contribution an integer, and
integer sums are order-free — the fitted model is bit-identical no
matter how words are sharded. All ties (seed cap, prune, Viterbi) break
on deterministic (count desc, piece asc) / first-improvement rules.
"""

from __future__ import annotations

import math

import pyarrow as pa

# fixed-point scale for per-word expected counts: counts ≤ word length
# (~64) so a quantized per-word value ≤ 2^26; times corpus word
# frequencies the int64 wire holds ~2^37 occurrences of one word per
# batch partial — beyond that, promote the merge to the decimal-string
# fan-in stages/pca.py uses (documented headroom, not a silent cap).
QSCALE = 1 << 20
# implicit per-character fallback for symbols outside the vocabulary
# at ENCODE time (cap-dropped tail words can carry unseen characters);
# a fixed constant keeps the Viterbi DP deterministic everywhere.
UNK_LP = -30.0


# ---------------------------------------------------------------------------
# pure kernels (shared verbatim by the distributed fit and the oracle)


def seed_pieces_of_word(
    word: str, freq: int, max_piece_len: int
) -> dict[str, int]:
    """All substrings of ``word`` up to ``max_piece_len``, each counted
    ``freq`` times per occurrence — the standard suffix-substring seed
    (SentencePiece seeds from frequent substrings the same way)."""
    out: dict[str, int] = {}
    n = len(word)
    for i in range(n):
        for j in range(i + 1, min(i + max_piece_len, n) + 1):
            p = word[i:j]
            out[p] = out.get(p, 0) + freq
    return out


def cap_seed(
    piece_counts: dict[str, int], seed_size: int
) -> dict[str, float]:
    """Seed counts -> initial log-prob table: ALL single characters are
    kept unconditionally (coverage guarantee: every word the fit sees
    stays segmentable), multi-char pieces capped to ``seed_size`` by
    the deterministic (count desc, piece asc) rule. Initial probs are
    count-proportional."""
    singles = {p: c for p, c in piece_counts.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in piece_counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_size]
    kept = dict(singles)
    kept.update(multis)
    total = sum(kept.values())
    return {p: math.log(c / total) for p, c in kept.items()}


def word_qcounts(
    word: str, freq: int, logp: dict[str, float], max_piece_len: int
) -> tuple[dict[str, int], int]:
    """E-step for ONE word: expected piece counts over all
    segmentations (forward-backward on the segmentation lattice),
    multiplied by the word's corpus frequency and quantized to
    fixed-point int64. Returns (piece -> qcount, q_loglik·freq).

    Fixed loop order + float64 throughout = identical floats for
    identical inputs on any host; the quantization then makes the
    cross-word merge exact-integer."""
    n = len(word)
    NEG = float("-inf")
    # forward: alpha[j] = log sum over segmentations of word[:j]
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        acc = NEG
        for L in range(1, min(max_piece_len, j) + 1):
            i = j - L
            lp = logp.get(word[i:j])
            if lp is None or alpha[i] == NEG:
                continue
            s = alpha[i] + lp
            if acc == NEG:
                acc = s
            elif s > acc:
                acc = s + math.log1p(math.exp(acc - s))
            else:
                acc = acc + math.log1p(math.exp(s - acc))
        alpha[j] = acc
    z = alpha[n]
    if z == NEG:  # unsegmentable (cannot happen when singles are kept)
        return {}, 0
    # backward: beta[i] = log sum over segmentations of word[i:]
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = NEG
        for L in range(1, min(max_piece_len, n - i) + 1):
            j = i + L
            lp = logp.get(word[i:j])
            if lp is None or beta[j] == NEG:
                continue
            s = beta[j] + lp
            if acc == NEG:
                acc = s
            elif s > acc:
                acc = s + math.log1p(math.exp(acc - s))
            else:
                acc = acc + math.log1p(math.exp(s - acc))
        beta[i] = acc
    out: dict[str, int] = {}
    for i in range(n):
        if alpha[i] == NEG:
            continue
        for L in range(1, min(max_piece_len, n - i) + 1):
            j = i + L
            lp = logp.get(word[i:j])
            if lp is None or beta[j] == NEG:
                continue
            ec = math.exp(alpha[i] + lp + beta[j] - z)
            q = int(round(ec * freq * QSCALE))
            if q:
                p = word[i:j]
                out[p] = out.get(p, 0) + q
    return out, int(round(z * freq * QSCALE))


def m_step(qcounts: dict[str, int], chars: set[str]) -> dict[str, float]:
    """Quantized expected counts -> renormalized piece log-probs.
    Multi-char pieces with zero expected count drop out; single
    characters are floored at 1 quantum (coverage guarantee)."""
    kept: dict[str, int] = {}
    for p, c in qcounts.items():
        if c > 0:
            kept[p] = c
    for ch in chars:
        if kept.get(ch, 0) <= 0:
            kept[ch] = 1
    total = sum(kept.values())
    return {p: math.log(c / total) for p, c in sorted(kept.items())}


def prune_vocab(
    qcounts: dict[str, int], chars: set[str], keep_multis: int
) -> dict[str, int]:
    """Keep all single characters + the top ``keep_multis`` multi-char
    pieces by (expected count desc, piece asc) — the loss-proxy prune
    (a piece's expected count IS its contribution to the corpus
    likelihood up to the shared normalizer)."""
    multis = sorted(
        ((p, c) for p, c in qcounts.items() if len(p) > 1 and c > 0),
        key=lambda kv: (-kv[1], kv[0]),
    )[:keep_multis]
    out = {p: c for p, c in multis}
    for ch in chars:
        out[ch] = max(qcounts.get(ch, 0), 1)
    return out


def run_unigram_em(
    qcounts_fn,
    seed_logp: dict[str, float],
    chars: set[str],
    vocab_size: int,
    max_piece_len: int,
    em_iters: int = 2,
    prune_rounds: int = 2,
    shrink: float = 0.6,
) -> dict[str, float]:
    """The SHARED fit orchestration: ``qcounts_fn(logp) -> merged
    quantized-count dict`` abstracts WHERE the E-step runs (the engine
    passes the distributed map_batches+groupby version, the oracle a
    sequential fold); everything else is pure driver math, so engine
    and oracle cannot diverge anywhere but the E-step merge — exactly
    the plumbing the registry hash is meant to isolate."""
    logp = dict(seed_logp)
    final_multis = max(vocab_size - len(chars), 0)
    for r in range(prune_rounds):
        qc: dict[str, int] = {}
        for _ in range(em_iters):
            qc = qcounts_fn(logp)
            logp = m_step(qc, chars)
        n_multis = sum(1 for p in logp if len(p) > 1)
        keep = (
            final_multis
            if r == prune_rounds - 1
            else max(final_multis, int(math.ceil(n_multis * shrink)))
        )
        kept = prune_vocab(qc, chars, keep)
        logp = m_step(kept, chars)
    # one final refit on the pruned vocabulary
    logp = m_step(qcounts_fn(logp), chars)
    return logp


def viterbi_n_pieces(
    word: str, logp: dict[str, float], max_piece_len: int
) -> int:
    """Number of pieces in the max-probability segmentation (Viterbi
    over the lattice; unseen characters segment as implicit UNK pieces
    at a fixed penalty). First-improvement (shortest-piece-first) tie
    break — deterministic because the loop order is fixed."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    nseg = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for L in range(1, min(max_piece_len, j) + 1):
            i = j - L
            if best[i] == NEG:
                continue
            p = word[i:j]
            lp = logp.get(p)
            if lp is None:
                if L != 1:
                    continue
                lp = UNK_LP  # per-char UNK fallback
            s = best[i] + lp
            if s > best[j]:
                best[j] = s
                nseg[j] = nseg[i] + 1
    return nseg[n]


def pieces_logp_table(logp: dict[str, float]) -> pa.Table:
    """Fitted model -> (piece, logprob) artifact rows, piece-ascending,
    log-probs rounded to 6 dp (the registry float discipline)."""
    items = sorted(logp.items())
    return pa.table(
        {
            "piece": pa.array([p for p, _ in items], pa.string()),
            "logprob": pa.array(
                [round(v, 6) for _, v in items], pa.float64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# distributed halves (Ray Data)


def capped_word_counts_ds(docs_ds, max_words: int):
    """documents(text) -> MATERIALIZED (word, count) Dataset capped at
    ``max_words`` by the deterministic (count desc, word asc)
    distributed sort+limit — stages/bpe.corpus_word_counts without the
    driver pull: the word table stays sharded for the distributed
    E-step. Returns (dataset, total_words_before_cap)."""
    from ..stages.bpe import count_words_batch

    counted = (
        docs_ds.map_batches(count_words_batch, batch_format="pyarrow")
        .groupby("word")
        .sum("count")
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["word", "count"])

    counted = counted.map_batches(rename, batch_format="pyarrow")
    total = counted.count()
    capped = (
        counted.sort(["count", "word"], descending=[True, False])
        .limit(max_words)
        .materialize()
    )
    if total > max_words:
        print(
            f"[unigram] word vocab capped: kept {max_words} of {total} "
            f"({total - max_words} tail words dropped)"
        )
    return capped, total


def seed_logp_distributed(
    words_ds, max_piece_len: int, seed_size: int
) -> tuple[dict[str, float], set[str]]:
    """Distributed seed: per-batch substring-count partials (bounded by
    the batch vocabulary × piece positions), ONE piece-scale
    ``groupby(piece).sum``; singles all kept, multis capped by a
    distributed (count desc, piece asc) sort+limit — only vocab-scale
    rows ever reach the driver."""

    def partials(t: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        for w, f in zip(
            t.column("word").to_pylist(), t.column("count").to_pylist()
        ):
            for p, c in seed_pieces_of_word(w, f, max_piece_len).items():
                acc[p] = acc.get(p, 0) + c
        items = sorted(acc.items())
        return pa.table(
            {
                "piece": pa.array([p for p, _ in items], pa.string()),
                "n": pa.array([c for _, c in items], pa.int64()),
            }
        )

    counted = (
        words_ds.map_batches(partials, batch_format="pyarrow")
        .groupby("piece")
        .sum("n")
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["piece", "n"])

    counted = counted.map_batches(rename, batch_format="pyarrow").materialize()

    def only_singles(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(pc.utf8_length(t.column("piece")), 1))

    def only_multis(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(pc.utf8_length(t.column("piece")), 1))

    singles_tab = counted.map_batches(
        only_singles, batch_format="pyarrow"
    ).to_pandas()
    multis_tab = (
        counted.map_batches(only_multis, batch_format="pyarrow")
        .sort(["n", "piece"], descending=[True, False])
        .limit(seed_size)
        .to_pandas()
    )
    piece_counts: dict[str, int] = dict(
        zip(singles_tab["piece"], (int(x) for x in singles_tab["n"]))
    )
    for p, c in zip(multis_tab["piece"], multis_tab["n"]):
        piece_counts[p] = int(c)
    # cap_seed re-applies the multis cap (idempotent here) so the seed
    # rule is the SAME pure kernel the oracle runs
    chars = {p for p in piece_counts if len(p) == 1}
    return cap_seed(piece_counts, seed_size), chars


class EStepStage:
    """Actor-pool E-step: the current piece log-probs arrive once per
    actor via ``ray.get`` of a broadcast ref (never re-shipped per
    batch); each batch folds its words' quantized expected counts into
    one partial table. (word,count) in — (piece, qn) out."""

    def __init__(self, logp_ref, max_piece_len: int):
        import ray

        self._logp = (
            ray.get(logp_ref) if not isinstance(logp_ref, dict) else logp_ref
        )
        self._maxlen = max_piece_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        for w, f in zip(
            batch.column("word").to_pylist(), batch.column("count").to_pylist()
        ):
            qc, _ = word_qcounts(w, f, self._logp, self._maxlen)
            for p, q in qc.items():
                acc[p] = acc.get(p, 0) + q
        items = sorted(acc.items())
        return pa.table(
            {
                "piece": pa.array([p for p, _ in items], pa.string()),
                "qn": pa.array([q for _, q in items], pa.int64()),
            }
        )


def distributed_qcounts_fn(words_ds, max_piece_len: int):
    """Build the engine's ``qcounts_fn`` for :func:`run_unigram_em`:
    each call broadcasts the current model with ``ray.put``, streams
    ONE E-step pass over the word Dataset and merges the integer
    partials with ONE piece-scale groupby."""
    import ray

    def fn(logp: dict[str, float]) -> dict[str, int]:
        ref = ray.put(logp)
        merged = (
            words_ds.map_batches(
                EStepStage,
                fn_constructor_args=(ref, max_piece_len),
                batch_format="pyarrow",
                concurrency=(1, 4),
            )
            .groupby("piece")
            .sum("qn")
            .to_pandas()
        )
        return dict(
            zip(merged["piece"], (int(x) for x in merged["sum(qn)"]))
        )

    return fn


class UnigramEncodeStage:
    """Actor-pool Viterbi encode: fitted model broadcast once per
    actor, per-actor word->n_pieces memo (Zipf => ~1 hit rate). Emits
    (doc_id, n_unigram_tokens)."""

    def __init__(self, logp_ref, max_piece_len: int):
        import ray

        self._logp = (
            ray.get(logp_ref) if not isinstance(logp_ref, dict) else logp_ref
        )
        self._maxlen = max_piece_len
        self._memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.bpe import pretokenize

        out = []
        for t in batch.column("text").to_pylist():
            n = 0
            for w in pretokenize(t or ""):
                k = self._memo.get(w)
                if k is None:
                    k = viterbi_n_pieces(w, self._logp, self._maxlen)
                    self._memo[w] = k
                n += k
            out.append(n)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_unigram_tokens": pa.array(out, pa.int64()),
            }
        )
