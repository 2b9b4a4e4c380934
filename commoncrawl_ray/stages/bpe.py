"""BPE tokenizer training + encoding over the corpus.

The missing half of the token stack: `q_bpe_token_counts` estimates
token budgets with the GPT-2 pre-tokenizer split; this module LEARNS a
byte-pair-encoding merge table from the corpus (Sennrich et al. 2016,
the algorithm GPT-2/SentencePiece-BPE trainers implement) and applies
it. No reference counterpart (the reference predates subword
tokenizers); built from the public algorithm only.

Scale shape — the standard two-regime split every BPE trainer uses:
- **corpus-scale** (distributed): pre-tokenize + count words inside
  ``map_batches`` (the wire carries (word, count) partials, never the
  token stream), ONE global ``groupby(word)`` sum, then a distributed
  sort+limit caps the vocabulary at ``max_words`` (drop counter
  logged — the dropped tail is hapax noise by construction).
- **vocab-scale** (driver): the merge loop runs over the capped
  word-frequency table with the classic incremental pair-count
  update (only words containing the merged pair are touched). This is
  how HF tokenizers / subword-nmt train: the corpus is reduced to
  word counts FIRST; the loop never sees corpus-scale data.
- **encode** (distributed, zero exchanges): merge ranks are
  ``ray.put``-broadcast; each batch encodes through a per-actor
  word->len memo (Zipf makes the hit rate ~1).

Determinism: pair ties break on (left, right) lexicographic order;
word-cap ties break on the word string — no hash-order anywhere.
"""

from __future__ import annotations

import re

import pyarrow as pa

# GPT-2-style pre-tokenizer split (Python `re` dialect: \w classes
# with UNICODE give the \p{L}/\p{N} behavior closely enough — the
# engine and the sequential oracle share THIS exact pattern, so parity
# is class-exact by construction).
_PRETOK = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+", re.UNICODE
)


def pretokenize(text: str) -> list[str]:
    """Text -> pre-token words (whitespace folded into the following
    word as a leading space, GPT-2 style; pure-whitespace runs are not
    emitted as tokens)."""
    return _PRETOK.findall(text)


def count_words_batch(batch: pa.Table) -> pa.Table:
    """documents(text) -> (word, count) partial rows, pre-aggregated
    within the batch so the exchange carries the batch vocabulary,
    not the token stream."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch.column("text").to_pylist():
        if t:
            c.update(pretokenize(t))
    if not c:
        return pa.table(
            {"word": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
        )
    words, counts = zip(*sorted(c.items()))
    return pa.table(
        {
            "word": pa.array(list(words), pa.string()),
            "count": pa.array(list(counts), pa.int64()),
        }
    )


def corpus_word_counts(docs_ds, max_words: int = 50_000):
    """Dataset with a ``text`` column -> capped (word, count) table
    (pyarrow, driver-resident — bounded by ``max_words``). ONE
    all-to-all (the groupby); the cap is a distributed sort + limit
    with a deterministic (count desc, word asc) order."""
    import pyarrow.compute as pc

    counted = (
        docs_ds.map_batches(count_words_batch, batch_format="pyarrow")
        .groupby("word")
        .sum("count")
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["word", "count"])

    counted = counted.map_batches(rename, batch_format="pyarrow")
    total = counted.count()
    capped = counted.sort(["count", "word"], descending=[True, False]).limit(
        max_words
    )
    t = capped.to_arrow_refs()
    import ray

    tab = pa.concat_tables([ray.get(r) for r in t])
    tab = tab.sort_by([("count", "descending"), ("word", "ascending")])
    if total > max_words:
        # no silent caps: surface how much vocabulary was dropped
        print(
            f"[bpe] word vocab capped: kept {max_words} of {total} "
            f"({total - max_words} tail words dropped)"
        )
    return pa.table(
        {
            "word": tab.column("word").cast(pa.string()),
            "count": pc.cast(tab.column("count"), pa.int64()),
        }
    )


def learn_bpe(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table
    (Sennrich 2016, incremental variant): symbols start as single
    characters; each round merges the most frequent adjacent pair
    (ties -> lexicographically smallest pair). Returns the ordered
    merge list. Pure + deterministic: the engine and the sequential
    oracle both call THIS on their respective word counts, so a
    registry hash match isolates the distributed counting path."""
    from collections import defaultdict

    words: list[list[str]] = [list(w) for w in word_counts]
    freqs: list[int] = [word_counts[w] for w in word_counts]

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        f = freqs[i]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            pair_words[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best: tuple[str, str] | None = None
        best_n = 0
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None or best_n < 1:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        touched = list(pair_words.pop(best, ()))
        pair_counts.pop(best, None)
        for i in touched:
            syms = words[i]
            f = freqs[i]
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
            # retract old pair contributions, add new ones
            for a, b in zip(syms, syms[1:]):
                p = (a, b)
                if p == best:
                    continue
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                    pair_words.pop(p, None)
                else:
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(i)
            for a, b in zip(out, out[1:]):
                p = (a, b)
                if p == best:
                    continue
                pair_counts[p] += f
                pair_words[p].add(i)
            words[i] = out
    return merges


def merges_table(merges: list[tuple[str, str]]) -> pa.Table:
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "merged": pa.array([m[0] + m[1] for m in merges], pa.string()),
        }
    )


def vocab_table(
    word_counts: dict[str, int], merges: list[tuple[str, str]]
) -> "pa.Table":
    """Tokenizer vocabulary (token, token_id): base symbols are the
    distinct characters of the counted words (sorted, ids first), then
    merged tokens in merge order — the id layout BPE tokenizers ship.
    Pure + deterministic; shared by engine and oracle."""
    base = sorted({c for w in word_counts for c in w})
    toks = base + [a + b for a, b in merges]
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "token_id": pa.array(range(len(toks)), pa.int64()),
        }
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encode of one word (the GPT-2
    apply rule)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_j = -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return syms


class BpeEncodeStage:
    """Actor-pool encode stage: merge ranks arrive once per actor via
    an object-store ref (``ray.put`` broadcast, never re-shipped per
    batch); a word->n_tokens memo exploits the Zipf word distribution.
    Emits (doc_id, n_bpe_tokens) — the exact token budget the packing
    and mixture stages estimate with the pre-tokenizer count."""

    def __init__(self, merges_ref):
        import ray

        merges = (
            ray.get(merges_ref)
            if not isinstance(merges_ref, list)
            else merges_ref
        )
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column("text").to_pylist():
            n = 0
            for w in pretokenize(t or ""):
                k = self.memo.get(w)
                if k is None:
                    k = len(encode_word(w, self.ranks))
                    self.memo[w] = k
                n += k
            out.append(n)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pa.array(out, pa.int64()),
            }
        )


def encode_word_ids(
    word: str,
    ranks: dict[tuple[str, str], int],
    vocab_id: dict[str, int],
    unk_id: int,
) -> list[int]:
    """Shared pure kernel: one word -> BPE token ids via the greedy
    encode; symbols outside the vocabulary (chars seen only in
    cap-dropped words) map to ``unk_id``."""
    return [vocab_id.get(s, unk_id) for s in encode_word(word, ranks)]


class TokenIdEncodeStage:
    """Actor-pool id-encode stage for the token-shard export: merges
    and vocabulary arrive once per actor via object-store refs; a
    word -> id-tuple memo exploits the Zipf distribution. Emits
    (shard, doc_id, ids list<uint32>) — doc text leaves the pipeline
    here; only the ~4 B/token id stream rides the shard exchange."""

    def __init__(self, merges_ref, vocab_ref, n_shards: int):
        import ray

        merges = (
            ray.get(merges_ref) if not isinstance(merges_ref, list) else merges_ref
        )
        vocab = ray.get(vocab_ref) if not isinstance(vocab_ref, dict) else vocab_ref
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.vocab_id = vocab
        self.unk_id = len(vocab)
        self.eod_id = len(vocab) + 1
        self.n_shards = n_shards
        self.memo: dict[str, tuple] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        doc_ids = batch.column("doc_id").to_pylist()
        all_ids, offsets = [], [0]
        for t in batch.column("text").to_pylist():
            ids: list[int] = []
            for w in pretokenize(t or ""):
                k = self.memo.get(w)
                if k is None:
                    k = tuple(
                        encode_word_ids(w, self.ranks, self.vocab_id, self.unk_id)
                    )
                    self.memo[w] = k
                ids.extend(k)
            ids.append(self.eod_id)  # Megatron-style end-of-document
            all_ids.extend(ids)
            offsets.append(len(all_ids))
        shards = np.asarray(doc_ids, dtype=np.int64) % self.n_shards
        return pa.table(
            {
                "shard": pa.array(shards, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "ids": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(np.asarray(all_ids, dtype=np.uint32), pa.uint32()),
                ),
            }
        )


def pack_token_shards(encoded_ds, out_dir: str):
    """Pack (shard, doc_id, ids) rows into flat little-endian uint32
    binary shard files — the Megatron-LM `.bin` layout (one contiguous
    token stream per shard, docs in doc_id order, EOD-separated) — and
    return per-shard stats (shard, n_docs, n_tokens, nbytes,
    digest_hex). Files are written atomically (tmp+rename), so task
    retries re-produce identical bytes — the idempotent side-write
    rule. ONE all-to-all: sort(shard) co-partitions each shard into a
    block (shard count scales with the corpus — size shards so
    corpus_tokens/n_shards * 4 B fits a block; cardinality is high, so
    the sort never degenerates to few blocks)."""
    import hashlib
    import os

    import numpy as np

    os.makedirs(out_dir, exist_ok=True)

    def pack_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(
                [
                    ("shard", pa.int64()),
                    ("n_docs", pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("nbytes", pa.int64()),
                    ("digest_hex", pa.string()),
                ]
            ).empty_table()
        sh = t.column("shard").to_numpy(zero_copy_only=False).astype(np.int64)
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        rows_out = {"shard": [], "n_docs": [], "n_tokens": [], "nbytes": [], "digest_hex": []}
        order = np.lexsort((did, sh))
        ts = t.take(pa.array(order, pa.int64()))
        sh_s = sh[order]
        starts = np.flatnonzero(np.r_[True, sh_s[1:] != sh_s[:-1]])
        ends = np.r_[starts[1:], len(sh_s)]
        ids_col = ts.column("ids")
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        if isinstance(ids_col, pa.ChunkedArray):  # older pyarrow keeps the wrapper
            ids_col = (
                ids_col.chunk(0) if ids_col.num_chunks else pa.array([], ids_col.type)
            )
        flat = ids_col.values.to_numpy(zero_copy_only=False).astype(np.uint32)
        offs = ids_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        for s, e in zip(starts, ends):
            blob = flat[offs[s] : offs[e]].astype("<u4").tobytes()
            shard = int(sh_s[s])
            path = os.path.join(out_dir, f"shard_{shard:05d}.bin")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
            rows_out["shard"].append(shard)
            rows_out["n_docs"].append(int(e - s))
            rows_out["n_tokens"].append(len(blob) // 4)
            rows_out["nbytes"].append(len(blob))
            rows_out["digest_hex"].append(hashlib.md5(blob).hexdigest())
        return pa.table(
            {
                "shard": pa.array(rows_out["shard"], pa.int64()),
                "n_docs": pa.array(rows_out["n_docs"], pa.int64()),
                "n_tokens": pa.array(rows_out["n_tokens"], pa.int64()),
                "nbytes": pa.array(rows_out["nbytes"], pa.int64()),
                "digest_hex": pa.array(rows_out["digest_hex"], pa.string()),
            }
        )

    return encoded_ds.sort("shard").map_batches(
        pack_block, batch_format="pyarrow", batch_size=None
    )
