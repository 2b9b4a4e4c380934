"""Single-process oracles for the sketch/dedup pipelines.

Same discipline as the oracle crawler (``pipelines/oracle.py``): shared
low-level hash primitives, *independent* single-process pipeline logic
(plain dicts/sets instead of the distributed band-explode → sort →
bucket → union+sort verify machinery), so a value-hash match proves the
distributed plumbing moved every row to the right place.

- :func:`oracle_simhash_table` additionally uses a fully SCALAR simhash
  (per-shingle ``fp64_bytes`` fold + per-bit Python vote), so it also
  independently validates the vectorized ``_fp64_u64_batch`` /
  ``unpackbits`` kernel in ``functions/simhash.py`` bit for bit.
- :func:`oracle_minhash_pairs_table` shares the signature math
  (``MinHasher`` / ``band_hashes`` — exactly as the crawl oracle shares
  ``url_fpv2``/``fp64``) and reimplements candidate generation and
  verification with dict buckets and Python set Jaccard.

Both write their result as a parquet file DuckDB's ``read_parquet`` can
see (VERDICT r2 #10 pattern), with a sidecar recording the source
``sf_dir`` so repeated calls skip regeneration and a different scale
factor forces a rebuild. Pure Python + pyarrow — no Ray session.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SIMHASH_ORACLE_PATH = "/tmp/ccray_oracle_simhash.parquet"
MINHASH_ORACLE_PATH = "/tmp/ccray_oracle_minhash_pairs.parquet"
PARSE_ORACLE_PATH = "/tmp/ccray_oracle_parse_extract.parquet"
ARC_ORACLE_PATH = "/tmp/ccray_oracle_arc_roundtrip.parquet"
HLL_ORACLE_PATH = "/tmp/ccray_oracle_hll_users.parquet"
CDX_ORACLE_PATH = "/tmp/ccray_oracle_cdx_index.parquet"
SITEMAP_INV_ORACLE_PATH = "/tmp/ccray_oracle_sitemap_inventory.parquet"
BPE_TRAIN_ORACLE_PATH = "/tmp/ccray_oracle_bpe_train.parquet"
BPE_ENCODE_ORACLE_PATH = "/tmp/ccray_oracle_bpe_encode.parquet"
BPE_VOCAB_ORACLE_PATH = "/tmp/ccray_oracle_bpe_vocab.parquet"
UNIGRAM_TRAIN_ORACLE_PATH = "/tmp/ccray_oracle_unigram_train.parquet"
UNIGRAM_ENCODE_ORACLE_PATH = "/tmp/ccray_oracle_unigram_encode.parquet"
WP_VOCAB_ORACLE_PATH = "/tmp/ccray_oracle_wordpiece_vocab.parquet"
WP_ENCODE_ORACLE_PATH = "/tmp/ccray_oracle_wordpiece_encode.parquet"
WARC_REVISIT_ORACLE_PATH = "/tmp/ccray_oracle_warc_revisit.parquet"
WEBTEXT_ORACLE_PATH = "/tmp/ccray_oracle_webtext.parquet"
_M64 = (1 << 64) - 1


def _read_docs(sf_dir: str) -> tuple[list[int], list[str]]:
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return t.column("doc_id").to_pylist(), t.column("text").to_pylist()


def _write_atomic(table: pa.Table, path: str, src_key: str) -> str:
    fd, tmp = tempfile.mkstemp(suffix=".parquet", dir=os.path.dirname(path))
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)  # atomic: readers never see a partial file
    with open(path + ".src", "w") as f:
        f.write(src_key)
    return path


def _is_fresh(path: str, src_key: str) -> bool:
    try:
        with open(path + ".src") as f:
            return os.path.exists(path) and f.read() == src_key
    except OSError:
        return False


def _scalar_simhash(s: str) -> int:
    """Scalar reference simhash (``SimHash.java:55-106`` semantics):
    distinct 4-char (UTF-16 code unit) shingles packed 16 bits/char,
    each fingerprinted over its 8 big-endian bytes, per-bit majority
    vote. Independent of the numpy kernel on purpose."""
    from ..functions.fingerprint import _to_signed, fp64_bytes

    codes = np.frombuffer(s.encode("utf-16-le"), dtype="<u2").tolist()
    if len(codes) < 4:
        return 0
    shingles = {
        (codes[i] << 48) | (codes[i + 1] << 32) | (codes[i + 2] << 16) | codes[i + 3]
        for i in range(len(codes) - 3)
    }
    hashes = [fp64_bytes(sh.to_bytes(8, "big")) & _M64 for sh in shingles]
    n = len(hashes)
    out = 0
    for bit in range(64):
        votes = sum((h >> bit) & 1 for h in hashes)
        if 2 * votes > n:
            out |= 1 << bit
    return _to_signed(out)


def oracle_simhash_table(sf_dir: str, path: str = SIMHASH_ORACLE_PATH) -> str:
    src_key = os.path.abspath(sf_dir)
    if _is_fresh(path, src_key):
        return path
    ids, texts = _read_docs(sf_dir)
    vals = [_scalar_simhash(t or "") for t in texts]
    t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "simhash": pa.array(vals, pa.int64())}
    )
    return _write_atomic(t, path, src_key)


def oracle_minhash_pairs_table(
    sf_dir: str,
    path: str = MINHASH_ORACLE_PATH,
    num_perm: int = 128,
    bands: int = 32,
    jaccard_threshold: float = 0.8,
    ngram: int = 5,
) -> str:
    """Dict-bucket LSH + set-Jaccard verify, one process, no Ray.

    Mirrors the contract of ``stages/dedup.minhash_lsh_pairs``:
    candidate = any two docs sharing a (band, band_hash) bucket;
    emitted iff exact Jaccard over the hashed-shingle sets >= threshold;
    output (id_a < id_b, jaccard rounded to 6)."""
    src_key = f"{os.path.abspath(sf_dir)}|{num_perm}|{bands}|{jaccard_threshold}|{ngram}"
    if _is_fresh(path, src_key):
        return path
    from ..functions.minhash import MinHasher, _ngrams_hashed, band_hashes

    ids, texts = _read_docs(sf_dir)
    mh = MinHasher(num_perm)
    buckets: dict[tuple[int, int], list[int]] = {}
    shingle_sets: dict[int, set[int]] = {}
    for doc_id, text in zip(ids, texts):
        sh = _ngrams_hashed(text or "", ngram)
        shingle_sets[doc_id] = {int(v) for v in sh}
        bh = band_hashes(mh.signature(sh), bands)
        for b in range(bands):
            buckets.setdefault((b, int(bh[b])), []).append(doc_id)
    cands: set[tuple[int, int]] = set()
    for members in buckets.values():
        u = sorted(set(members))
        for i in range(len(u)):
            for j in range(i + 1, len(u)):
                cands.add((u[i], u[j]))
    rows = []
    for a, b in sorted(cands):
        sa, sb = shingle_sets[a], shingle_sets[b]
        if not sa and not sb:
            j = 1.0
        else:
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
        if j >= jaccard_threshold:
            rows.append((a, b, round(j, 6)))
    t = pa.table(
        {
            "id_a": pa.array([r[0] for r in rows], pa.int64()),
            "id_b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    return _write_atomic(t, path, src_key)


def _parse_projection(batch: pa.Table) -> pa.Table:
    """The parse_extract registry projection (url, canon_url, url_fp,
    http_status, mime_norm, digest_hex) — shared by query and oracle so
    only the EXECUTION differs (distributed vs one process)."""
    return pa.table(
        {
            "url": batch.column("url"),
            "canon_url": batch.column("canon_url"),
            "url_fp": batch.column("url_fp"),
            "http_status": batch.column("http_status"),
            "mime_norm": batch.column("mime_norm"),
            "digest_hex": pa.array(
                [
                    d.hex() if d is not None else None
                    for d in batch.column("text_digest").to_pylist()
                ],
                pa.string(),
            ),
        }
    )


_SEQ_PARSE_CACHE: dict[str, pa.Table] = {}


def _sequential_parse(pages_dir: str, sf: float) -> pa.Table:
    """ONE single-threaded parse of the pages cache, memoized per
    directory and shared by every oracle that needs parsed fields
    (parse_extract, WAT, host edges) — a cold ensure_oracle_tables()
    would otherwise re-parse the full corpus sequentially three times
    (the ADVICE r3 duplicated-driver-work finding, generalized)."""
    cached = _SEQ_PARSE_CACHE.get(pages_dir)
    if cached is not None:
        return cached
    if not os.path.isdir(pages_dir) or not os.listdir(pages_dir):
        # cache generation is Ray-parallel (the query path builds it the
        # same way); a session is live in every caller context
        from ..sources.synth import write_pages_parquet_ray

        write_pages_parquet_ray(pages_dir, sf)
    from ..stages.parse_extract import parse_extract_batch

    src = pq.read_table(pages_dir, columns=["url", "warc_ts", "html"])
    out = pa.concat_tables(
        parse_extract_batch(src.slice(off, 1024))
        for off in range(0, len(src), 1024)
    )
    _SEQ_PARSE_CACHE.clear()  # hold at most one scale's parse in memory
    _SEQ_PARSE_CACHE[pages_dir] = out
    return out


def oracle_parse_extract_table(sf_dir: str, path: str = PARSE_ORACLE_PATH) -> str:
    """Single-process parse/extract over the SAME pages-cache parquet
    the registered query reads: plain pyarrow batches through
    ``parse_extract_batch`` in one thread. A value-hash match proves
    the distributed map_batches plan neither drops, duplicates, nor
    perturbs a row (~12 s once per scale; sidecar- and memo-cached)."""
    from ..sources.synth import pages_cache_dir, sf_from_dir

    sf = min(sf_from_dir(sf_dir), 0.01)
    pages_dir = pages_cache_dir(sf)
    src_key = f"{os.path.abspath(sf_dir)}|{sf}"
    if _is_fresh(path, src_key):
        return path
    parsed = _sequential_parse(pages_dir, sf)
    return _write_atomic(_parse_projection(parsed), path, src_key)


def oracle_arc_roundtrip_table(path: str = ARC_ORACLE_PATH) -> str:
    """Oracle for the ARC round-trip query WITHOUT the ARC layer: build
    the identical 160 pages straight from the synthetic universe and
    parse them in-process. A value-hash match therefore proves the
    gzip-member ARC write -> streaming read cycle is byte-lossless
    (any header/payload corruption would shift http_status, mime_norm
    or the text digest)."""
    import hashlib

    from ..sources.synth import get_universe
    from ..stages.parse_extract import parse_extract_batch

    src_key = "arc|0.001|42"
    if _is_fresh(path, src_key):
        return path
    uni = get_universe(0.001, 42)
    urls, tss, recs = [], [], []
    for host in uni.hosts[:8]:
        for k in range(min(20, uni.page_counts[host])):
            url, ts, rec, _lang = uni.page_row(host, k)
            urls.append(url)
            tss.append(ts)
            recs.append(rec)
    parsed = parse_extract_batch(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("ms")),
                "html": pa.array(recs, pa.binary()),
            }
        )
    )
    t = pa.table(
        {
            "url": parsed.column("url"),
            "url_fp": parsed.column("url_fp"),
            "http_status": parsed.column("http_status"),
            "mime_norm": parsed.column("mime_norm"),
            "digest_hex": pa.array(
                [
                    hashlib.md5((x or "").encode()).hexdigest()
                    for x in parsed.column("text").to_pylist()
                ],
                pa.string(),
            ),
        }
    )
    return _write_atomic(t, path, src_key)


def oracle_warc_revisit_table(path: str = WARC_REVISIT_ORACLE_PATH) -> str:
    """Oracle for the revisit-dedup query WITHOUT the WARC layer or any
    distributed machinery: regenerate the identical two-crawl capture
    set (160 pages at ts and ts + 7 d — the payload is a pure function
    of (host, k), so the recrawl duplicates every digest), fold a plain
    dict digest -> earliest (ts, url) keeper, and emit the expected
    capture table. A value-hash match proves the distributed index ->
    groupby(digest) keeper pick -> per-file rewrite -> read-back cycle
    reassigned every capture to the right record type with the right
    keeper reference."""
    from ..sources.synth import get_universe
    from ..sources.warc import payload_digest

    src_key = "warc_revisit|0.001|42|2crawls|lf-tolerant-digest"
    if _is_fresh(path, src_key):
        return path
    uni = get_universe(0.001, 42)
    rows = []  # (url, ts_ms, digest)
    for host in uni.hosts[:8]:
        for k in range(min(20, uni.page_counts[host])):
            url, ts, rec, _lang = uni.page_row(host, k)
            dig = payload_digest(rec)  # shared LF-tolerant kernel
            # WARC-Date is second-granular, so every ts the engine
            # sees after the write -> read cycle is floor-truncated
            ts = (ts // 1000) * 1000
            for dt in (0, 7 * 86400 * 1000):
                rows.append((url, ts + dt, dig))
    keeper: dict[str, tuple[int, str]] = {}
    for url, ts, dig in sorted(rows, key=lambda r: (r[1], r[0])):
        keeper.setdefault(dig, (ts, url))
    urls, tss, types, digs, rurls, rtss = [], [], [], [], [], []
    for url, ts, dig in rows:
        k_ts, k_url = keeper[dig]
        is_keep = (ts, url) == (k_ts, k_url)
        urls.append(url)
        tss.append(ts)
        types.append("response" if is_keep else "revisit")
        digs.append(dig)
        rurls.append(None if is_keep else k_url)
        rtss.append(None if is_keep else k_ts)
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "ts_ms": pa.array(tss, pa.int64()),
            "rec_type": pa.array(types, pa.string()),
            "digest": pa.array(digs, pa.string()),
            "refers_url": pa.array(rurls, pa.string()),
            "refers_ts": pa.array(rtss, pa.int64()),
        }
    )
    return _write_atomic(t, path, src_key)


BPE_MAX_WORDS = 20_000
BPE_N_MERGES = 200


def _bpe_seq_word_counts(sf_dir: str) -> dict[str, int]:
    """Sequential word-count + cap: dict fold over every document with
    the SHARED pre-tokenizer, then the identical deterministic cap
    rule (count desc, word asc, top BPE_MAX_WORDS) the distributed
    sort+limit applies."""
    from collections import Counter

    from ..stages.bpe import pretokenize

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    c: Counter = Counter()
    for txt in t.column("text").to_pylist():
        if txt:
            c.update(pretokenize(txt))
    kept = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_MAX_WORDS]
    return dict(kept)


def oracle_bpe_train_table(
    sf_dir: str, path: str = BPE_TRAIN_ORACLE_PATH
) -> str:
    """Sequential BPE training oracle: single-process word counts (no
    Ray) feeding the SHARED merge-learning kernel (stages/bpe.learn_bpe
    — pure + deterministic), so a registry hash match isolates exactly
    the distributed counting/cap path."""
    from ..stages.bpe import learn_bpe, merges_table

    src_key = f"{os.path.abspath(sf_dir)}|bpe_train|{BPE_MAX_WORDS}|{BPE_N_MERGES}"
    if _is_fresh(path, src_key):
        return path
    merges = learn_bpe(_bpe_seq_word_counts(sf_dir), BPE_N_MERGES)
    return _write_atomic(merges_table(merges), path, src_key)


def oracle_bpe_vocab_table(
    sf_dir: str, path: str = BPE_VOCAB_ORACLE_PATH
) -> str:
    """Sequential-count vocabulary through the SHARED vocab_table
    kernel — hash parity isolates the distributed counting path."""
    from ..stages.bpe import learn_bpe, vocab_table

    src_key = f"{os.path.abspath(sf_dir)}|bpe_vocab|{BPE_MAX_WORDS}|{BPE_N_MERGES}"
    if _is_fresh(path, src_key):
        return path
    wc = _bpe_seq_word_counts(sf_dir)
    merges = learn_bpe(wc, BPE_N_MERGES)
    return _write_atomic(vocab_table(wc, merges), path, src_key)


def oracle_bpe_encode_table(
    sf_dir: str, path: str = BPE_ENCODE_ORACLE_PATH
) -> str:
    """Sequential BPE encode oracle: the sequentially-trained merge
    ranks applied doc-by-doc with the shared encode_word kernel."""
    from ..stages.bpe import encode_word, learn_bpe, pretokenize

    src_key = f"{os.path.abspath(sf_dir)}|bpe_encode|{BPE_MAX_WORDS}|{BPE_N_MERGES}"
    if _is_fresh(path, src_key):
        return path
    merges = learn_bpe(_bpe_seq_word_counts(sf_dir), BPE_N_MERGES)
    ranks = {m: i for i, m in enumerate(merges)}
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    memo: dict[str, int] = {}
    out = []
    for txt in t.column("text").to_pylist():
        n = 0
        for w in pretokenize(txt or ""):
            k = memo.get(w)
            if k is None:
                k = len(encode_word(w, ranks))
                memo[w] = k
            n += k
        out.append(n)
    tab = pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_bpe_tokens": pa.array(out, pa.int64()),
        }
    )
    return _write_atomic(tab, path, src_key)


# unigram-LM tokenizer fit parameters (stages/unigram.py): sized so
# the sequential oracle's 5 EM passes over the capped word table stay
# in seconds at sf0.01 while still exercising multi-round pruning.
UNI_MAX_WORDS = 8_000
UNI_SEED_SIZE = 1_500
UNI_VOCAB_SIZE = 600
UNI_MAX_PIECE_LEN = 5


def _unigram_seq_word_counts(sf_dir: str) -> dict[str, int]:
    """Sequential word-count + cap with the SHARED pre-tokenizer and
    the identical deterministic (count desc, word asc) rule the
    engine's distributed sort+limit applies — _bpe_seq_word_counts at
    the unigram fit's own cap."""
    from collections import Counter

    from ..stages.bpe import pretokenize

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    c: Counter = Counter()
    for txt in t.column("text").to_pylist():
        if txt:
            c.update(pretokenize(txt))
    kept = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:UNI_MAX_WORDS]
    return dict(kept)


def _unigram_seq_fit(sf_dir: str):
    """Sequential unigram-LM fit: dict-fold word counts, dict-fold
    seed substring counts, and a plain-loop E-step, all feeding the
    SHARED pure kernels (stages/unigram.{cap_seed,word_qcounts,
    run_unigram_em}). The quantized integer merge makes the fitted
    model bit-identical to the engine's distributed EM, so a registry
    hash match isolates exactly the map_batches+groupby plumbing.
    Returns (logp, word_counts)."""
    from ..stages.unigram import (
        cap_seed,
        run_unigram_em,
        seed_pieces_of_word,
        word_qcounts,
    )

    wc = _unigram_seq_word_counts(sf_dir)
    piece_counts: dict[str, int] = {}
    for w, f in wc.items():
        for p, c in seed_pieces_of_word(w, f, UNI_MAX_PIECE_LEN).items():
            piece_counts[p] = piece_counts.get(p, 0) + c
    seed = cap_seed(piece_counts, UNI_SEED_SIZE)
    chars = {p for p in piece_counts if len(p) == 1}

    def qfn(logp: dict[str, float]) -> dict[str, int]:
        acc: dict[str, int] = {}
        for w, f in wc.items():
            qc, _ = word_qcounts(w, f, logp, UNI_MAX_PIECE_LEN)
            for p, q in qc.items():
                acc[p] = acc.get(p, 0) + q
        return acc

    logp = run_unigram_em(
        qfn, seed, chars, UNI_VOCAB_SIZE, UNI_MAX_PIECE_LEN
    )
    return logp, wc


def oracle_unigram_train_table(
    sf_dir: str, path: str = UNIGRAM_TRAIN_ORACLE_PATH
) -> str:
    """Sequential unigram-LM training oracle -> (piece, logprob)."""
    from ..stages.unigram import pieces_logp_table

    src_key = (
        f"{os.path.abspath(sf_dir)}|uni_train|{UNI_MAX_WORDS}"
        f"|{UNI_SEED_SIZE}|{UNI_VOCAB_SIZE}|{UNI_MAX_PIECE_LEN}"
    )
    if _is_fresh(path, src_key):
        return path
    logp, _ = _unigram_seq_fit(sf_dir)
    return _write_atomic(pieces_logp_table(logp), path, src_key)


def oracle_unigram_encode_table(
    sf_dir: str, path: str = UNIGRAM_ENCODE_ORACLE_PATH
) -> str:
    """Sequential Viterbi-encode oracle: the sequentially-fitted model
    applied doc-by-doc with the shared viterbi_n_pieces kernel."""
    from ..stages.bpe import pretokenize
    from ..stages.unigram import viterbi_n_pieces

    src_key = (
        f"{os.path.abspath(sf_dir)}|uni_encode|{UNI_MAX_WORDS}"
        f"|{UNI_SEED_SIZE}|{UNI_VOCAB_SIZE}|{UNI_MAX_PIECE_LEN}"
    )
    if _is_fresh(path, src_key):
        return path
    logp, _ = _unigram_seq_fit(sf_dir)
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    memo: dict[str, int] = {}
    out = []
    for txt in t.column("text").to_pylist():
        n = 0
        for w in pretokenize(txt or ""):
            k = memo.get(w)
            if k is None:
                k = viterbi_n_pieces(w, logp, UNI_MAX_PIECE_LEN)
                memo[w] = k
            n += k
        out.append(n)
    tab = pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_unigram_tokens": pa.array(out, pa.int64()),
        }
    )
    return _write_atomic(tab, path, src_key)


# WordPiece fit parameters (stages/wordpiece.py): same cap regime as
# BPE — the synthetic corpus' word vocabulary is far below the cap, so
# nothing is dropped at test scale.
WP_MAX_WORDS = 8_000
WP_N_MERGES = 150


def _wordpiece_seq_word_counts(sf_dir: str) -> dict[str, int]:
    """Sequential word-count + deterministic cap at the WordPiece fit's
    own parameters (shared pre-tokenizer, (count desc, word asc) rule)."""
    from collections import Counter

    from ..stages.bpe import pretokenize

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    c: Counter = Counter()
    for txt in t.column("text").to_pylist():
        if txt:
            c.update(pretokenize(txt))
    kept = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:WP_MAX_WORDS]
    return dict(kept)


def oracle_wordpiece_vocab_table(
    sf_dir: str, path: str = WP_VOCAB_ORACLE_PATH
) -> str:
    """Sequential WordPiece training oracle: single-process word counts
    feeding the SHARED likelihood-scored merge kernel
    (stages/wordpiece.learn_wordpiece — exact-integer score compare,
    pure + deterministic), exported as the (token, token_id) vocab."""
    from ..stages.wordpiece import (
        learn_wordpiece,
        vocab_to_table,
        wordpiece_vocab,
    )

    src_key = f"{os.path.abspath(sf_dir)}|wp_vocab|{WP_MAX_WORDS}|{WP_N_MERGES}"
    if _is_fresh(path, src_key):
        return path
    wc = _wordpiece_seq_word_counts(sf_dir)
    vocab = wordpiece_vocab(wc, learn_wordpiece(wc, WP_N_MERGES))
    return _write_atomic(vocab_to_table(vocab), path, src_key)


def oracle_wordpiece_encode_table(
    sf_dir: str, path: str = WP_ENCODE_ORACLE_PATH
) -> str:
    """Sequential greedy longest-match encode oracle under the
    sequentially-trained vocabulary."""
    from ..stages.bpe import pretokenize
    from ..stages.wordpiece import (
        encode_word_wordpiece,
        learn_wordpiece,
        wordpiece_vocab,
    )

    src_key = f"{os.path.abspath(sf_dir)}|wp_encode|{WP_MAX_WORDS}|{WP_N_MERGES}"
    if _is_fresh(path, src_key):
        return path
    wc = _wordpiece_seq_word_counts(sf_dir)
    vocab = set(wordpiece_vocab(wc, learn_wordpiece(wc, WP_N_MERGES)))
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    memo: dict[str, int] = {}
    out = []
    for txt in t.column("text").to_pylist():
        n = 0
        for w in pretokenize(txt or ""):
            k = memo.get(w)
            if k is None:
                k = len(encode_word_wordpiece(w, vocab))
                memo[w] = k
            n += k
        out.append(n)
    tab = pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_wordpiece_tokens": pa.array(out, pa.int64()),
        }
    )
    return _write_atomic(tab, path, src_key)


def oracle_sitemap_inventory_table(
    path: str = SITEMAP_INV_ORACLE_PATH,
) -> str:
    """The sf0.001 universe's full sitemap inventory (url, lastmod)
    straight from the shared row kernel — the sitemap side of the
    coverage-audit join (pinned to the same fixed 0.001/42 slice the
    CDX index queries use, independent of the driver's sf_dir)."""
    from ..sources.sitemap import universe_sitemap_rows

    src_key = "sitemap_inv|0.001|42"
    if _is_fresh(path, src_key):
        return path
    rows = universe_sitemap_rows(0.001, 42)
    t = pa.table(
        {
            "url": pa.array([r[1] for r in rows], pa.string()),
            "lastmod": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    return _write_atomic(t, path, src_key)


def oracle_cdx_table(path: str = CDX_ORACLE_PATH) -> str:
    """Oracle for the CDX index queries WITHOUT the index layer: build
    the identical 160-page shard straight from the synthetic universe
    and derive the capture rows in-process via the shared row kernel
    (sources/cdx.cdx_rows_batch — the same discipline as
    oracle_arc_roundtrip_table). A value-hash match therefore proves
    the CDXJ line format + gzip shard + cluster.idx write->read cycle
    is lossless; the prefix-lookup query additionally proves the
    pruned range scan returns exactly the SQL LIKE slice."""
    from ..sources.cdx import cdx_rows_batch
    from ..sources.synth import get_universe

    src_key = "cdx|0.001|42|v1"
    if _is_fresh(path, src_key):
        return path
    uni = get_universe(0.001, 42)
    urls, tss, recs = [], [], []
    for host in uni.hosts[:8]:
        for k in range(min(20, uni.page_counts[host])):
            url, ts, rec, _lang = uni.page_row(host, k)
            urls.append(url)
            tss.append(ts)
            recs.append(rec)
    rows = cdx_rows_batch(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("ms")),
                "html": pa.array(recs, pa.binary()),
            }
        )
    ).drop_columns(["cdx_key"])
    return _write_atomic(rows, path, src_key)


def oracle_hll_table(sf_dir: str, path: str = HLL_ORACLE_PATH, p: int = 14) -> str:
    """Single-process HyperLogLog over events.user_id -> one-row
    parquet {distinct_estimate}. HLL registers combine by max, so the
    sequential fold here must produce BIT-IDENTICAL registers (hence
    an identical float estimate) to the distributed
    partial-per-batch -> tree-merge reduction in stages/approx.py —
    a value-hash match proves the whole reduce path, not just the
    kernel."""
    from ..functions.sketches import HyperLogLog

    src_key = os.path.abspath(sf_dir) + f"|p={p}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    vals = t.column("user_id").drop_null().to_numpy(zero_copy_only=False)
    est = HyperLogLog(p).add_ints(vals.astype(np.int64)).estimate()
    out = pa.table({"distinct_estimate": pa.array([est], pa.float64())})
    return _write_atomic(out, path, src_key)


HLL_BY_TYPE_ORACLE_PATH = "/tmp/ccray_oracle_hll_by_type.parquet"


def oracle_hll_by_type_table(
    sf_dir: str, path: str = HLL_BY_TYPE_ORACLE_PATH, p: int = 12
) -> str:
    """Single-process per-group HLL (event_type -> distinct user_id
    estimate). Same register-max determinism argument as
    oracle_hll_table, applied per group — a value-hash match proves
    the map-side per-(batch,key) combiner + groupby merge moved every
    value into the right group's registers."""
    from ..functions.sketches import HyperLogLog

    src_key = os.path.abspath(sf_dir) + f"|by_type|p={p}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    keys = t.column("event_type").to_pylist()
    vals = t.column("user_id").to_pylist()
    hlls: dict[str, object] = {}
    for k, v in zip(keys, vals):
        if v is None:
            continue
        hlls.setdefault(k, HyperLogLog(p)).add_ints(np.array([v], dtype=np.int64))
    rows = sorted(hlls.items())
    out = pa.table(
        {
            "event_type": pa.array([k for k, _ in rows], pa.string()),
            "distinct_estimate": pa.array(
                [h.estimate() for _, h in rows], pa.float64()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


MULTIMODAL_ORACLE_PATH = "/tmp/ccray_oracle_multimodal.parquet"


def oracle_multimodal_table(path: str = MULTIMODAL_ORACLE_PATH) -> str:
    """Single-process multimodal summary: the SAME deterministic fake
    decode/frame-sample kernels (stages/multimodal.py stage classes,
    called directly — kernel sharing, as the crawl oracle shares
    url_fpv2), with every piece of distributed machinery replaced by
    plain dicts: no actor pools, no groupby aggregate, no union+sort
    join. A value-hash match proves the actor-pool plumbing and the
    co-partition join assembled the identical summary."""
    from ..stages.multimodal import (
        DecodeImageStage,
        FrameSampleStage,
        synth_media_table,
    )

    src_key = "synth|n=96|seed=42|n_frames=4"
    if _is_fresh(path, src_key):
        return path
    media = synth_media_table(n=96, seed=42)
    dec = DecodeImageStage(fake=True)(media)
    frames = FrameSampleStage(n_frames=4, fake=True)(media)
    counts: dict[int, int] = {}
    for mid in frames.column("media_id").to_pylist():
        counts[mid] = counts.get(mid, 0) + 1
    feat_dims = [len(f) for f in dec.column("feat").to_pylist()]
    ids = dec.column("media_id").to_pylist()
    out = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": dec.column("kind"),
            "feat_dim": pa.array(feat_dims, pa.int32()),
            "n_frames": pa.array([counts.get(i, 0) for i in ids], pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


KNN_IVF_ORACLE_PATH = "/tmp/ccray_oracle_knn_ivf.parquet"


def oracle_knn_ivf_table(
    sf_dir: str,
    path: str = KNN_IVF_ORACLE_PATH,
    k: int = 10,
    n_centroids: int = 32,
    nprobe: int = 8,
    sample_size: int = 4096,
) -> str:
    """Single-process APPROXIMATE IVF (hash-sample quantizer config):
    shares the numeric kernels (kmeans_fit, _normalize, list_to_matrix,
    knuth32 — the crawl-oracle kernel-sharing rule) but replaces every
    piece of distribution with sequential numpy: no broadcast, no
    per-batch partial top-k, no sort-shuffle reduce. Valid because the
    hash sample fixes the quantizer deterministically (stages/ann.py
    sample_mode="hash"), assignment/probe are pure functions of the
    centroids, and the union of per-batch top-k always contains the
    global top-k — so the distributed result must match this one, with
    cosines rounded to 6 decimals absorbing BLAS shape-dependent ulps."""
    from ..functions.sketches import knuth32
    from ..functions.vec import list_to_matrix
    from ..stages.ann import _normalize, kmeans_fit

    src_key = f"{os.path.abspath(sf_dir)}|ivf|{k}|{n_centroids}|{nprobe}|{sample_size}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = list_to_matrix(t.column("embedding"))

    # the same deterministic sample rule as stages/ann.py
    n = len(ids)
    if n > sample_size:
        thresh = np.uint64(
            min(1 << 32, int(np.ceil((1 << 32) * 2.0 * sample_size / n)))
        )
        sel = np.nonzero(knuth32(ids) < thresh)[0]
        sel = sel[np.argsort(ids[sel], kind="stable")][:sample_size]
    else:
        sel = np.argsort(ids, kind="stable")
    centroids = kmeans_fit(mat[sel], n_centroids)

    qsel = [int(np.nonzero(ids == qid)[0][0]) for qid in range(4)]
    qn = _normalize(np.asarray(mat[qsel], dtype=np.float64))
    q_cent = qn @ centroids.T
    nprobe_eff = min(nprobe, centroids.shape[0])
    probe = np.argsort(-q_cent, axis=1, kind="stable")[:, :nprobe_eff]

    matn = _normalize(mat.astype(np.float64))
    assign = np.argmax(matn @ centroids.T, axis=1)
    rows_q, rows_id, rows_cos, rows_rank = [], [], [], []
    for qi in range(len(qn)):
        cand = np.nonzero(np.isin(assign, probe[qi]))[0]
        if len(cand) == 0:
            continue
        sims = matn[cand] @ qn[qi]
        order = np.lexsort((ids[cand], -sims))[:k]
        for r, j in enumerate(order):
            rows_q.append(qi)
            rows_id.append(int(ids[cand][j]))
            rows_cos.append(round(float(sims[j]), 6))
            rows_rank.append(r)
    out = pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "vec_id": pa.array(rows_id, pa.int64()),
            "cosine": pa.array(rows_cos, pa.float64()),
            "rank": pa.array(rows_rank, pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


KNN_IVFPQ_ORACLE_PATH = "/tmp/ccray_oracle_knn_ivfpq.parquet"


def oracle_knn_ivfpq_table(
    sf_dir: str,
    path: str = KNN_IVFPQ_ORACLE_PATH,
    k: int = 10,
    n_centroids: int = 32,
    nprobe: int = 8,
    m: int = 8,
    n_codes: int = 256,
    sample_size: int = 4096,
) -> str:
    """Single-process IVF-PQ (same deterministic training as
    stages/ann.knn_ivfpq: hash sample -> shared kmeans_fit coarse ->
    kmeans_l2 residual sub-quantizers), sequential encode + ADC over
    the whole matrix, global top-k. Kernel sharing + independent
    execution, per the oracle discipline."""
    from ..functions.sketches import knuth32
    from ..functions.vec import list_to_matrix
    from ..stages.ann import _normalize, kmeans_fit, kmeans_l2

    src_key = (
        f"{os.path.abspath(sf_dir)}|ivfpq|{k}|{n_centroids}|{nprobe}|{m}|"
        f"{n_codes}|{sample_size}"
    )
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = list_to_matrix(t.column("embedding"))
    n = len(ids)
    if n > sample_size:
        thresh = np.uint64(
            min(1 << 32, int(np.ceil((1 << 32) * 2.0 * sample_size / n)))
        )
        sel = np.nonzero(knuth32(ids) < thresh)[0]
        sel = sel[np.argsort(ids[sel], kind="stable")][:sample_size]
    else:
        sel = np.argsort(ids, kind="stable")
    sample = mat[sel]
    dim = sample.shape[1]
    sub = dim // m
    centroids = kmeans_fit(sample, n_centroids)
    sn = _normalize(sample.astype(np.float64))
    s_assign = np.argmax(sn @ centroids.T, axis=1)
    resid = sn - centroids[s_assign]
    codebooks = [
        kmeans_l2(resid[:, s * sub : (s + 1) * sub], n_codes, seed=42 + s)
        for s in range(m)
    ]

    matn = _normalize(mat.astype(np.float64))
    assign = np.argmax(matn @ centroids.T, axis=1)
    r = matn - centroids[assign]
    codes = np.empty((n, m), dtype=np.int64)
    for s in range(m):
        rs_ = r[:, s * sub : (s + 1) * sub]
        d = (
            (rs_**2).sum(axis=1)[:, None]
            - 2.0 * (rs_ @ codebooks[s].T)
            + (codebooks[s] ** 2).sum(axis=1)[None, :]
        )
        codes[:, s] = np.argmin(d, axis=1)

    qsel = [int(np.nonzero(ids == qid)[0][0]) for qid in range(4)]
    qn = _normalize(mat[qsel].astype(np.float64))
    q_cent = qn @ centroids.T
    nprobe_eff = min(nprobe, centroids.shape[0])
    probe = np.argsort(-q_cent, axis=1, kind="stable")[:, :nprobe_eff]
    sub_idx = np.arange(m)[None, :]
    rows_q, rows_id, rows_sc, rows_rank = [], [], [], []
    for qi in range(len(qn)):
        lut = np.stack(
            [qn[qi, s * sub : (s + 1) * sub] @ codebooks[s].T for s in range(m)]
        )  # (m, k')
        cand = np.nonzero(np.isin(assign, probe[qi]))[0]
        if len(cand) == 0:
            continue
        sc = lut[sub_idx.ravel()[None, :], codes[cand]].sum(axis=1) + q_cent[
            qi, assign[cand]
        ]
        order = np.lexsort((ids[cand], -sc))[:k]
        for rnk, j in enumerate(order):
            rows_q.append(qi)
            rows_id.append(int(ids[cand][j]))
            rows_sc.append(round(float(sc[j]), 6))
            rows_rank.append(rnk)
    out = pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "vec_id": pa.array(rows_id, pa.int64()),
            "score": pa.array(rows_sc, pa.float64()),
            "rank": pa.array(rows_rank, pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


_HOST_EDGES_CACHE: dict[str, tuple] = {}


def _sequential_host_edges(sf_dir: str):
    """Sequential pages -> host edge build shared by the graph oracles
    (pagerank, HITS): same parse + edge kernels as the distributed
    path, plain Python set dedup. -> (nodes list, src_idx, dst_idx).

    Memoized per pages cache dir (ADVICE r3): ensure_oracle_tables()
    builds both graph oracles eagerly, so without the cache the whole
    pages corpus would be re-parsed single-threaded twice."""
    from ..sources.synth import pages_cache_dir, sf_from_dir
    from ..stages.pagerank import extract_host_edges_batch

    sf = min(sf_from_dir(sf_dir), 0.01)
    pages_dir = pages_cache_dir(sf)
    cached = _HOST_EDGES_CACHE.get(pages_dir)
    if cached is not None:
        return cached
    parsed_all = _sequential_parse(pages_dir, sf)
    edge_set: set[tuple[str, str]] = set()
    B = 256
    for off in range(0, parsed_all.num_rows, B):
        et = extract_host_edges_batch(parsed_all.slice(off, B))
        edge_set.update(
            zip(et.column("src").to_pylist(), et.column("dst").to_pylist())
        )
    nodes = sorted({h for e in edge_set for h in e})
    idx = {h: i for i, h in enumerate(nodes)}
    src_i = np.array([idx[s] for s, _ in edge_set], dtype=np.int64)
    dst_i = np.array([idx[d] for _, d in edge_set], dtype=np.int64)
    _HOST_EDGES_CACHE[pages_dir] = (nodes, src_i, dst_i)
    return nodes, src_i, dst_i


PAGERANK_ORACLE_PATH = "/tmp/ccray_oracle_pagerank.parquet"


def oracle_pagerank_table(
    sf_dir: str,
    path: str = PAGERANK_ORACLE_PATH,
    damping: float = 0.85,
    iters: int = 10,
) -> str:
    """Single-process PageRank over the host graph of the SAME pages
    cache the registered query parses: sequential parse via the shared
    kernel, the shared edge-extraction batch function, then a dense
    numpy power iteration (dict indices instead of distributed joins).
    Ranks rounded to 6 decimals on both sides."""
    from ..sources.synth import sf_from_dir

    sf = min(sf_from_dir(sf_dir), 0.01)
    src_key = f"{os.path.abspath(sf_dir)}|pagerank|{sf}|{damping}|{iters}"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    n = len(nodes)
    if n == 0:
        out = pa.table(
            {"host": pa.array([], pa.string()), "pr": pa.array([], pa.float64())}
        )
        return _write_atomic(out, path, src_key)
    deg = np.bincount(src_i, minlength=n).astype(np.float64)
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = pr[deg == 0].sum()
        w = np.where(deg > 0, pr / np.maximum(deg, 1.0), 0.0)
        s = np.bincount(dst_i, weights=w[src_i], minlength=n)
        pr = (1.0 - damping) / n + damping * (s + dangling / n)
    out = pa.table(
        {
            "host": pa.array(nodes, pa.string()),
            "pr": pa.array(np.round(pr, 6), pa.float64()),
        }
    )
    return _write_atomic(out, path, src_key)


CRAWL_TRAP_ORACLE_PATH = "/tmp/ccray_oracle_crawl_trap.parquet"


def trap_universe_rows(n_hosts: int = 12, per_host: int = 20):
    """Deterministic pages shard with SIMULATED crawler traps, shared
    by the distributed query and the sequential oracle: the base
    universe slice, plus — for every 4th host — 8 calendar-style
    ``?cal=<i>`` URL variants per early page that serve the SAME
    bytes (the unbounded-URL-space / duplicate-content signature a
    trap detector must flag). Yields (url, ts_ms, record_bytes)."""
    from ..sources.synth import get_universe

    uni = get_universe(0.001, 42)
    for hi, host in enumerate(uni.hosts[:n_hosts]):
        for k in range(min(per_host, uni.page_counts[host])):
            url, ts, rec, _lang = uni.page_row(host, k)
            yield url, ts, rec
            if hi % 4 == 0 and k < 5:
                canon = uni.canon_page_url(host, k)
                sep = "&" if "?" in canon else "?"
                for i in range(8):
                    yield f"{canon}{sep}cal=2026-{i + 1:02d}-01", ts + i, rec


def oracle_crawl_trap_table(path: str = CRAWL_TRAP_ORACLE_PATH) -> str:
    """Sequential oracle for the crawler-trap detector: same simulated
    trap shard, same parse kernel (canon_url) and host/digest
    primitives, plain dict fold to per-host (n_urls, n_distinct
    content digests); a host is a trap when it serves >= 2 URLs per
    distinct payload. A value-hash match proves the distributed
    two-groupby plan (distinct (host, digest) then host rollup)
    reassigned every capture correctly."""
    import hashlib

    from ..stages.pagerank import _host_of
    from ..stages.parse_extract import parse_extract_batch

    src_key = "crawl_trap|0.001|42|12x20"
    if _is_fresh(path, src_key):
        return path
    rows = list(trap_universe_rows())
    parsed = parse_extract_batch(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("ms")),
                "html": pa.array([r[2] for r in rows], pa.binary()),
            }
        )
    )
    urls_n: dict[str, int] = {}
    digs: dict[str, set] = {}
    for cu, rec in zip(parsed.column("canon_url").to_pylist(), [r[2] for r in rows]):
        h = _host_of(cu) if cu else None
        if not h:
            continue
        urls_n[h] = urls_n.get(h, 0) + 1
        digs.setdefault(h, set()).add(hashlib.md5(rec or b"").hexdigest())
    hosts = sorted(urls_n)
    n_urls = [urls_n[h] for h in hosts]
    n_dist = [len(digs[h]) for h in hosts]
    ratio = [np.round(u / d, 6) for u, d in zip(n_urls, n_dist)]
    out = pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "n_urls": pa.array(n_urls, pa.int64()),
            "n_distinct": pa.array(n_dist, pa.int64()),
            "dup_ratio": pa.array(ratio, pa.float64()),
            "is_trap": pa.array([r >= 2.0 for r in ratio], pa.bool_()),
        }
    )
    return _write_atomic(out, path, src_key)


MIRROR_ORACLE_PATH = "/tmp/ccray_oracle_mirror.parquet"


def mirror_universe_rows(n_hosts: int = 12, per_host: int = 20):
    """Deterministic pages shard with SIMULATED mirror sites, shared
    by the distributed query and the sequential oracle: the base
    universe slice, plus — for every 3rd host — an ``m-<host>`` twin
    that serves byte-identical copies of the host's first 15 pages
    (the partial-replica signature a mirror detector must flag;
    Bharat & Broder 1999). Yields (url, ts_ms, record_bytes)."""
    from urllib.parse import urlsplit, urlunsplit

    from ..sources.synth import get_universe

    uni = get_universe(0.001, 42)
    for hi, host in enumerate(uni.hosts[:n_hosts]):
        n = min(per_host, uni.page_counts[host])
        for k in range(n):
            url, ts, rec, _lang = uni.page_row(host, k)
            yield url, ts, rec
            if hi % 3 == 0 and k < 15:
                p = urlsplit(url)
                murl = urlunsplit(
                    (p.scheme, "m-" + p.netloc, p.path, p.query, p.fragment)
                )
                yield murl, ts + 1, rec


def oracle_mirror_table(
    path: str = MIRROR_ORACLE_PATH,
    min_shared: int = 2,
    jaccard_threshold: float = 0.5,
    max_hosts_per_digest: int = 64,
) -> str:
    """Sequential mirror-host fold over the same simulated shard:
    host -> set of payload digests (same parse kernel + md5 as the
    distributed side), digests shared by more than
    ``max_hosts_per_digest`` hosts dropped (the hot-content cap both
    sides apply), then every host pair sharing >= ``min_shared``
    digests scored with set-Jaccard."""
    import hashlib
    from itertools import combinations

    from ..stages.pagerank import _host_of
    from ..stages.parse_extract import parse_extract_batch

    src_key = f"mirror|0.001|42|12x20|{min_shared}|{jaccard_threshold}|{max_hosts_per_digest}"
    if _is_fresh(path, src_key):
        return path
    rows = list(mirror_universe_rows())
    parsed = parse_extract_batch(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("ms")),
                "html": pa.array([r[2] for r in rows], pa.binary()),
            }
        )
    )
    digs: dict[str, set] = {}
    for cu, rec in zip(parsed.column("canon_url").to_pylist(), [r[2] for r in rows]):
        h = _host_of(cu) if cu else None
        if not h:
            continue
        digs.setdefault(h, set()).add(hashlib.md5(rec or b"").hexdigest())
    owners: dict[str, set] = {}
    for h, ds in digs.items():
        for dg in ds:
            owners.setdefault(dg, set()).add(h)
    hot = {dg for dg, hs in owners.items() if len(hs) > max_hosts_per_digest}
    digs = {h: ds - hot for h, ds in digs.items()}
    recs = []
    for a, b in combinations(sorted(digs), 2):
        shared = len(digs[a] & digs[b])
        if shared < min_shared:
            continue
        jac = shared / len(digs[a] | digs[b])
        recs.append((a, b, shared, len(digs[a]), len(digs[b]), round(jac, 6)))
    out = pa.table(
        {
            "host_a": pa.array([r[0] for r in recs], pa.string()),
            "host_b": pa.array([r[1] for r in recs], pa.string()),
            "n_shared": pa.array([r[2] for r in recs], pa.int64()),
            "n_a": pa.array([r[3] for r in recs], pa.int64()),
            "n_b": pa.array([r[4] for r in recs], pa.int64()),
            "jaccard": pa.array([r[5] for r in recs], pa.float64()),
            "is_mirror": pa.array(
                [r[5] >= jaccard_threshold for r in recs], pa.bool_()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


TRUSTRANK_ORACLE_PATH = "/tmp/ccray_oracle_trustrank.parquet"
TRUSTRANK_N_SEEDS = 8


def oracle_trustrank_table(
    sf_dir: str,
    path: str = TRUSTRANK_ORACLE_PATH,
    damping: float = 0.85,
    iters: int = 10,
    n_seeds: int = TRUSTRANK_N_SEEDS,
) -> str:
    """Single-process TrustRank (Gyongyi et al. 2004) over the same
    host graph: seed set = top-``n_seeds`` hosts by distinct-edge
    in-degree (host-asc tiebreak — the deterministic stand-in for a
    human-vetted whitelist), teleport restricted to the seeds, dense
    numpy iteration with dangling mass returned to the seeds. Trust
    rounded to 6 decimals on both sides."""
    from ..sources.synth import sf_from_dir

    sf = min(sf_from_dir(sf_dir), 0.01)
    src_key = f"{os.path.abspath(sf_dir)}|trustrank|{sf}|{damping}|{iters}|{n_seeds}"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    n = len(nodes)
    if n == 0:
        out = pa.table(
            {"host": pa.array([], pa.string()), "trust": pa.array([], pa.float64())}
        )
        return _write_atomic(out, path, src_key)
    indeg = np.bincount(dst_i, minlength=n)
    # candidates = hosts with >= 1 in-edge (what a groupby over the
    # edge table's dst column sees on the distributed side)
    order = sorted(
        (i for i in range(n) if indeg[i] > 0),
        key=lambda i: (-int(indeg[i]), nodes[i]),
    )
    seed_idx = order[: min(n_seeds, len(order))]
    if not seed_idx:
        out = pa.table(
            {"host": pa.array([], pa.string()), "trust": pa.array([], pa.float64())}
        )
        return _write_atomic(out, path, src_key)
    tele = np.zeros(n, dtype=np.float64)
    tele[seed_idx] = 1.0 / len(seed_idx)
    deg = np.bincount(src_i, minlength=n).astype(np.float64)
    pr = tele.copy()
    for _ in range(iters):
        dangling = pr[deg == 0].sum()
        w = np.where(deg > 0, pr / np.maximum(deg, 1.0), 0.0)
        s = np.bincount(dst_i, weights=w[src_i], minlength=n)
        pr = (1.0 - damping) * tele + damping * (s + dangling * tele)
    out = pa.table(
        {
            "host": pa.array(nodes, pa.string()),
            "trust": pa.array(np.round(pr, 6), pa.float64()),
        }
    )
    return _write_atomic(out, path, src_key)


SPAM_MASS_ORACLE_PATH = "/tmp/ccray_oracle_spam_mass.parquet"


def oracle_spam_mass_table(
    sf_dir: str, path: str = SPAM_MASS_ORACLE_PATH
) -> str:
    """Sequential spam-mass combine (Gyongyi, Garcia-Molina & Pedersen
    2006, "Link spam detection based on mass estimation"): relative
    spam mass = (pr - trust) / pr per host, from the two sequential
    graph oracles (both probability-scale, both already rounded to 6
    decimals — the same inputs whose hashes the pagerank/trustrank
    queries match, so the combine is value-exact on both sides)."""
    src_key = f"{os.path.abspath(sf_dir)}|spam_mass"
    if _is_fresh(path, src_key):
        return path
    pr_t = pq.read_table(oracle_pagerank_table(sf_dir))
    tr_t = pq.read_table(oracle_trustrank_table(sf_dir))
    trust = dict(
        zip(tr_t.column("host").to_pylist(), tr_t.column("trust").to_pylist())
    )
    hosts = pr_t.column("host").to_pylist()
    pr = np.asarray(pr_t.column("pr").to_pylist(), dtype=np.float64)
    tr = np.asarray([trust.get(h, 0.0) for h in hosts], dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mass = np.where(pr > 0, np.round((pr - tr) / np.maximum(pr, 1e-300), 6), 0.0)
    out = pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "pr": pa.array(pr, pa.float64()),
            "trust": pa.array(tr, pa.float64()),
            "spam_mass": pa.array(mass + 0.0, pa.float64()),
        }
    )
    return _write_atomic(out, path, src_key)


ORPHAN_ORACLE_PATH = "/tmp/ccray_oracle_orphans.parquet"


def oracle_orphan_table(sf_dir: str, path: str = ORPHAN_ORACLE_PATH) -> str:
    """Sequential orphan-page fold over the shared memoized parse:
    a page is an orphan when NO page in the corpus (other than
    itself) links to its canonical URL fingerprint — same
    resolve+canonicalize+fp64 kernels as the distributed side."""
    from ..pipelines.crawl import _canon_memo_lookup
    from ..sources.synth import pages_cache_dir, sf_from_dir
    from ..stages.links import resolve_links

    sf = min(sf_from_dir(sf_dir), 0.01)
    src_key = f"{os.path.abspath(sf_dir)}|orphans|{sf}"
    if _is_fresh(path, src_key):
        return path
    parsed = _sequential_parse(pages_cache_dir(sf), sf)
    urls = parsed.column("url").to_pylist()
    anchors = parsed.column("anchors").to_pylist()
    bases = parsed.column("base_url").to_pylist()
    hosts = parsed.column("host").to_pylist()
    own_fp = parsed.column("url_fp").to_pylist()
    linked: set[int] = set()
    for u, a, b, fp in zip(urls, anchors, bases, own_fp):
        if not a:
            continue
        hrefs = a.split("\n")[0::2]
        for link in resolve_links(u, hrefs, b):
            hit = _canon_memo_lookup(link)
            if hit == () or hit[2] == fp:  # self-links don't count
                continue
            linked.add(hit[2])
    acc: dict[str, list] = {}
    for h, fp in zip(hosts, own_fp):
        if not h:
            continue
        a = acc.setdefault(h, [0, 0])
        a[0] += 1
        if fp not in linked:
            a[1] += 1
    order = sorted(acc)
    n = np.array([acc[h][0] for h in order], dtype=np.int64)
    o = np.array([acc[h][1] for h in order], dtype=np.int64)
    out = pa.table(
        {
            "host": pa.array(order, pa.string()),
            "n_pages": pa.array(n, pa.int64()),
            "n_orphans": pa.array(o, pa.int64()),
            "orphan_frac": pa.array(
                np.round(o / np.maximum(n, 1), 6) + 0.0, pa.float64()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


ROBOTS_AUDIT_ORACLE_PATH = "/tmp/ccray_oracle_robots_audit.parquet"


def robots_body_for_host(host: str) -> str:
    """Deterministic robots.txt BODY per host (shared by the audit
    query and its oracle): real RFC 9309 text — wildcard `*` and `$`
    patterns, an Allow overriding a broader Disallow (longest-match
    precedence), Crawl-delay, and a `badbot` group that must NOT
    apply — so the audit exercises the actual parser
    (state/robots.parse_robots_txt), not a simulation."""
    import hashlib

    h = int(hashlib.md5(host.encode("utf-8")).hexdigest()[:8], 16)
    lines = ["User-agent: *"]
    if h & 1:
        lines.append("Disallow: /page/")
    if h & 2:
        lines.append("Disallow: /*.html$")
    if h & 4:
        lines.append("Disallow: /dir")
        lines.append("Allow: /dir5/")
    if h & 8:
        lines.append(f"Crawl-delay: {1 + h % 5}")
    lines += ["", "User-agent: badbot", "Disallow: /"]
    return "\n".join(lines) + "\n"


def oracle_robots_audit_table(
    sf_dir: str, path: str = ROBOTS_AUDIT_ORACLE_PATH
) -> str:
    """Sequential robots-compliance fold over the shared memoized
    parse: per host, URLs blocked for our agent under the
    deterministic robots.txt body, using the SAME RFC 9309 parser and
    path matcher as the distributed side."""
    from ..sources.synth import pages_cache_dir, sf_from_dir
    from ..state.robots import parse_robots_txt, path_of

    sf = min(sf_from_dir(sf_dir), 0.01)
    src_key = f"{os.path.abspath(sf_dir)}|robots_audit|{sf}"
    if _is_fresh(path, src_key):
        return path
    parsed = _sequential_parse(pages_cache_dir(sf), sf)
    rules_memo: dict[str, object] = {}
    acc: dict[str, list] = {}
    for h, cu in zip(
        parsed.column("host").to_pylist(), parsed.column("canon_url").to_pylist()
    ):
        if not h or not cu:
            continue
        r = rules_memo.get(h)
        if r is None:
            r = parse_robots_txt(robots_body_for_host(h), agent="ccray")
            rules_memo[h] = r
        a = acc.setdefault(h, [0, 0])
        a[0] += 1
        if not r.allowed(path_of(cu)):
            a[1] += 1
    order = sorted(acc)
    delays = [
        rules_memo[h].crawl_delay
        if rules_memo[h].crawl_delay is not None
        else -1.0
        for h in order
    ]
    out = pa.table(
        {
            "host": pa.array(order, pa.string()),
            "n_urls": pa.array([acc[h][0] for h in order], pa.int64()),
            "n_blocked": pa.array([acc[h][1] for h in order], pa.int64()),
            "crawl_delay": pa.array(
                [float(d) for d in delays], pa.float64()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


FRESHNESS_ORACLE_PATH = "/tmp/ccray_oracle_freshness.parquet"


def freshness_seconds(
    max_age: int, expires: int, http_date: int, last_modified: int, flags: int
) -> int:
    """RFC 9111 freshness lifetime in whole seconds, or -1 when the
    response is not cacheable (no-cache/no-store, or no usable
    header). Precedence per §4.2: Cache-Control max-age, then
    Expires - Date, then the §4.2.2 heuristic 10% of
    (Date - Last-Modified). Dates are epoch millis, max-age seconds;
    all integer arithmetic so both sides agree bit-for-bit."""
    if flags & 3:  # CACHE_NO_CACHE | CACHE_NO_STORE
        return -1
    if max_age >= 0:
        return max_age
    if expires >= 0 and http_date >= 0:
        return max(expires - http_date, 0) // 1000
    if last_modified >= 0 and http_date >= 0 and http_date >= last_modified:
        return ((http_date - last_modified) // 1000) // 10
    return -1


def oracle_freshness_table(
    sf_dir: str, path: str = FRESHNESS_ORACLE_PATH
) -> str:
    """Sequential per-host cache-freshness fold over the shared
    memoized parse, using the same freshness_seconds kernel as the
    distributed query."""
    from ..sources.synth import pages_cache_dir, sf_from_dir

    sf = min(sf_from_dir(sf_dir), 0.01)
    src_key = f"{os.path.abspath(sf_dir)}|freshness|{sf}"
    if _is_fresh(path, src_key):
        return path
    parsed = _sequential_parse(pages_cache_dir(sf), sf)
    acc: dict[str, list] = {}
    for h, ma, ex, hd, lm, fl in zip(
        parsed.column("host").to_pylist(),
        parsed.column("max_age").to_pylist(),
        parsed.column("expires").to_pylist(),
        parsed.column("http_date").to_pylist(),
        parsed.column("last_modified").to_pylist(),
        parsed.column("cache_flags").to_pylist(),
    ):
        if not h:
            continue
        a = acc.setdefault(h, [0, 0, 0])  # n_pages, n_cacheable, total
        a[0] += 1
        fs = freshness_seconds(ma, ex, hd, lm, fl)
        if fs >= 0:
            a[1] += 1
            a[2] += fs
    order = sorted(acc)
    n_c = np.array([acc[h][1] for h in order], dtype=np.int64)
    tot = np.array([acc[h][2] for h in order], dtype=np.int64)
    avg = np.where(n_c > 0, np.round(tot / np.maximum(n_c, 1), 6), 0.0)
    out = pa.table(
        {
            "host": pa.array(order, pa.string()),
            "n_pages": pa.array(
                [acc[h][0] for h in order], pa.int64()
            ),
            "n_cacheable": pa.array(n_c, pa.int64()),
            "total_freshness_s": pa.array(tot, pa.int64()),
            "avg_freshness_s": pa.array(avg + 0.0, pa.float64()),
        }
    )
    return _write_atomic(out, path, src_key)


HOST_INDEX_ORACLE_PATH = "/tmp/ccray_oracle_host_index.parquet"


def oracle_host_index_table(
    sf_dir: str, path: str = HOST_INDEX_ORACLE_PATH
) -> str:
    """Sequential per-host index fold over the SAME pages cache the
    distributed query parses (shared memoized parse): pages, 200s,
    distinct normalized mimes, total extracted-text bytes
    (pc.binary_length — the identical Arrow kernel both sides)."""
    import pyarrow.compute as pc_

    from ..sources.synth import pages_cache_dir, sf_from_dir

    sf = min(sf_from_dir(sf_dir), 0.01)
    src_key = f"{os.path.abspath(sf_dir)}|host_index|{sf}"
    if _is_fresh(path, src_key):
        return path
    parsed = _sequential_parse(pages_cache_dir(sf), sf)
    hosts = parsed.column("host").to_pylist()
    status = parsed.column("http_status").to_pylist()
    mimes = parsed.column("mime_norm").to_pylist()
    tbytes = pc_.binary_length(
        pc_.coalesce(parsed.column("text"), "")
    ).to_pylist()
    acc: dict[str, dict] = {}
    for h, st, mi, tb in zip(hosts, status, mimes, tbytes):
        if not h:
            continue
        a = acc.setdefault(
            h, {"n": 0, "ok": 0, "mimes": set(), "bytes": 0}
        )
        a["n"] += 1
        a["ok"] += 1 if st == 200 else 0
        a["mimes"].add(mi or "")
        a["bytes"] += int(tb or 0)
    order = sorted(acc)
    out = pa.table(
        {
            "host": pa.array(order, pa.string()),
            "n_pages": pa.array([acc[h]["n"] for h in order], pa.int64()),
            "n_ok": pa.array([acc[h]["ok"] for h in order], pa.int64()),
            "n_mimes": pa.array(
                [len(acc[h]["mimes"]) for h in order], pa.int64()
            ),
            "text_bytes": pa.array(
                [acc[h]["bytes"] for h in order], pa.int64()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


CDC_ORACLE_PATH = "/tmp/ccray_oracle_cdc.parquet"


def oracle_cdc_table(sf_dir: str, path: str = CDC_ORACLE_PATH) -> str:
    """Sequential per-source CDC chunk-dedup fold over the documents
    table with the SAME shared chunking kernel (functions/cdc.py) the
    distributed query uses — the value-hash match verifies the
    distributed (source, chunk_fp) aggregation."""
    from ..functions.cdc import cdc_chunk_fps

    src_key = f"{os.path.abspath(sf_dir)}|cdc"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )
    stats: dict[str, dict] = {}
    for src, text in zip(
        t.column("source").to_pylist(), t.column("text").to_pylist()
    ):
        s = stats.setdefault(
            src, {"chunks": 0, "bytes": 0, "seen": {}}
        )
        for fp, ln in cdc_chunk_fps((text or "").encode("utf-8")):
            s["chunks"] += 1
            s["bytes"] += ln
            s["seen"].setdefault(fp, ln)
    rows = []
    for src in sorted(stats):
        s = stats[src]
        dbytes = sum(s["seen"].values())
        ratio = round(1.0 - dbytes / s["bytes"], 6) if s["bytes"] else 0.0
        rows.append(
            (src, s["chunks"], len(s["seen"]), s["bytes"], dbytes, ratio)
        )
    out = pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_chunks": pa.array([r[1] for r in rows], pa.int64()),
            "n_distinct": pa.array([r[2] for r in rows], pa.int64()),
            "total_bytes": pa.array([r[3] for r in rows], pa.int64()),
            "distinct_bytes": pa.array([r[4] for r in rows], pa.int64()),
            "dedup_ratio": pa.array([r[5] for r in rows], pa.float64()),
        }
    )
    return _write_atomic(out, path, src_key)


LPA_ORACLE_PATH = "/tmp/ccray_oracle_lpa.parquet"


def oracle_lpa_table(
    sf_dir: str, path: str = LPA_ORACLE_PATH, iters: int = 5
) -> str:
    """Single-process synchronous label propagation (Raghavan et al.
    2007) over the same undirected host graph with the SAME
    deterministic tie-break as stages/components.label_propagation:
    labels are FNV-1a host ids, ties go to the smallest id. Neighbors
    = distinct non-self edge endpoints both ways, every node starts
    as its own label, each round all nodes simultaneously adopt the
    most frequent neighbor label. Fixed ``iters`` rounds."""
    from collections import Counter, defaultdict

    from ..functions.minhash import fnv1a_batch

    src_key = f"{os.path.abspath(sf_dir)}|lpa-fnv|{iters}"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    ids = fnv1a_batch(pa.array(nodes, pa.string())).view(np.int64)
    host_of_id = {int(ids[i]): nodes[i] for i in range(len(nodes))}
    nbrs: dict[int, set] = defaultdict(set)
    for s, d in zip(src_i.tolist(), dst_i.tolist()):
        if s == d:
            continue
        nbrs[s].add(d)
        nbrs[d].add(s)
    labels = {i: int(ids[i]) for i in nbrs}
    for _ in range(iters):
        labels = {
            a: min(
                Counter(labels[b] for b in ns).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for a, ns in nbrs.items()
        }
    order = sorted(nbrs)
    out = pa.table(
        {
            "host": pa.array([nodes[i] for i in order], pa.string()),
            "community": pa.array(
                [host_of_id[labels[i]] for i in order], pa.string()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


RECIP_LINKS_ORACLE_PATH = "/tmp/ccray_oracle_recip_links.parquet"


def oracle_recip_links_table(
    sf_dir: str, path: str = RECIP_LINKS_ORACLE_PATH
) -> str:
    """Sequential reciprocal-link (link-exchange) fold over the same
    distinct host edge set the graph queries use: per host with >= 1
    non-self out-edge, how many of its out-edges are reciprocated
    (the reverse edge exists) and the reciprocity ratio — the classic
    link-exchange spam signal (cf. Gyongyi & Garcia-Molina, "Web spam
    taxonomy", 2005: link farms show near-total reciprocity). Plain
    Python set membership; ratio rounded to 6 decimals."""
    src_key = f"{os.path.abspath(sf_dir)}|recip_links"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    pairs = set(zip(src_i.tolist(), dst_i.tolist()))
    out_deg: dict[int, int] = {}
    recip: dict[int, int] = {}
    for s, d in pairs:
        if s == d:
            continue
        out_deg[s] = out_deg.get(s, 0) + 1
        if (d, s) in pairs:
            recip[s] = recip.get(s, 0) + 1
    order = sorted(out_deg)
    od = np.array([out_deg[i] for i in order], dtype=np.int64)
    rc = np.array([recip.get(i, 0) for i in order], dtype=np.int64)
    out = pa.table(
        {
            "host": pa.array([nodes[i] for i in order], pa.string()),
            "out_deg": pa.array(od, pa.int64()),
            "recip_deg": pa.array(rc, pa.int64()),
            "recip_ratio": pa.array(
                np.round(rc / np.maximum(od, 1), 6), pa.float64()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


HITS_ORACLE_PATH = "/tmp/ccray_oracle_hits.parquet"


def oracle_hits_table(
    sf_dir: str, path: str = HITS_ORACLE_PATH, iters: int = 6
) -> str:
    """Single-process HITS (Kleinberg 1999) over the same host graph:
    a = E^T h then h = E a per iteration, L2-normalized. Dense numpy
    vs the distributed per-iteration edge exchanges; scores rounded
    to 6 decimals on both sides."""
    from ..sources.synth import sf_from_dir

    sf = min(sf_from_dir(sf_dir), 0.01)
    src_key = f"{os.path.abspath(sf_dir)}|hits|{sf}|{iters}"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    n = len(nodes)
    if n == 0:
        out = pa.table(
            {
                "host": pa.array([], pa.string()),
                "authority": pa.array([], pa.float64()),
                "hub": pa.array([], pa.float64()),
            }
        )
        return _write_atomic(out, path, src_key)
    hub = np.full(n, 1.0)
    auth = np.full(n, 1.0)
    for _ in range(iters):
        auth = np.bincount(dst_i, weights=hub[src_i], minlength=n)
        norm = np.sqrt((auth**2).sum())
        auth = auth / norm if norm else auth
        hub = np.bincount(src_i, weights=auth[dst_i], minlength=n)
        norm = np.sqrt((hub**2).sum())
        hub = hub / norm if norm else hub
    out = pa.table(
        {
            "host": pa.array(nodes, pa.string()),
            "authority": pa.array(np.round(auth, 6), pa.float64()),
            "hub": pa.array(np.round(hub, 6), pa.float64()),
        }
    )
    return _write_atomic(out, path, src_key)


LM_SCORE_ORACLE_PATH = "/tmp/ccray_oracle_lm_score.parquet"


def oracle_lm_score_table(sf_dir: str, path: str = LM_SCORE_ORACLE_PATH) -> str:
    """Single-process CCNet-style char-trigram LM fit + score: train
    counts accumulated sequentially doc-by-doc into one dense vector
    (vs the distributed partial-bincount -> groupby(gram_id).sum
    merge), then every document scored in file order. Shares the
    alphabet/gram/log-prob KERNELS with stages/lm_score.py — the
    parity being proven is the distributed aggregation and broadcast
    plumbing, exactly the oracle_knn_ivf discipline. Integer counts
    and a fixed float64 smoothing expression make the match exact at
    the 6-decimal rounding both sides apply."""
    from ..stages.lm_score import (
        N_GRAMS,
        encode_text,
        gram_ids,
        logprob_table,
        score_nll,
    )

    src_key = f"{os.path.abspath(sf_dir)}|lm_score|en"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    doc_ids = t.column("doc_id").to_pylist()
    langs = t.column("lang").to_pylist()
    texts = t.column("text").to_pylist()
    counts = np.zeros(N_GRAMS, dtype=np.int64)
    for lang, text in zip(langs, texts):
        if lang == "en" and text:
            g = gram_ids(encode_text(text))
            if len(g):
                counts += np.bincount(g, minlength=N_GRAMS)
    nz = np.nonzero(counts)[0]
    logp = logprob_table(nz.astype(np.int64), counts[nz])
    n_grams = np.zeros(len(texts), dtype=np.int64)
    nll = np.zeros(len(texts), dtype=np.float64)
    for i, text in enumerate(texts):
        n_grams[i], nll[i] = score_nll(text or "", logp)
    out = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "n_grams": pa.array(n_grams),
            "nll": pa.array(np.round(nll, 6), pa.float64()),
        }
    )
    return _write_atomic(out, path, src_key)


LM_KN_ORACLE_PATH = "/tmp/ccray_oracle_lm_score_kn.parquet"


def oracle_lm_score_kn_table(sf_dir: str, path: str = LM_KN_ORACLE_PATH) -> str:
    """Single-process interpolated Kneser–Ney fit + score: sequential
    doc-by-doc count accumulation (vs the distributed partial-bincount
    merge), then every document scored in file order. Shares the
    alphabet/gram/KN-table KERNELS with stages/lm_score.py — the
    parity proven is the distributed aggregation + broadcast plumbing,
    exactly the oracle_lm_score_table discipline."""
    from ..stages.lm_score import (
        N_GRAMS,
        encode_text,
        gram_ids,
        kn_logprob_table,
        score_nll,
    )

    src_key = f"{os.path.abspath(sf_dir)}|lm_score_kn|en"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    doc_ids = t.column("doc_id").to_pylist()
    langs = t.column("lang").to_pylist()
    texts = t.column("text").to_pylist()
    counts = np.zeros(N_GRAMS, dtype=np.int64)
    for lang, text in zip(langs, texts):
        if lang == "en" and text:
            g = gram_ids(encode_text(text))
            if len(g):
                counts += np.bincount(g, minlength=N_GRAMS)
    nz = np.nonzero(counts)[0]
    logp = kn_logprob_table(nz.astype(np.int64), counts[nz])
    n_grams = np.zeros(len(texts), dtype=np.int64)
    nll = np.zeros(len(texts), dtype=np.float64)
    for i, text in enumerate(texts):
        n_grams[i], nll[i] = score_nll(text or "", logp)
    out = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "n_grams": pa.array(n_grams),
            "nll": pa.array(np.round(nll, 6), pa.float64()),
        }
    )
    return _write_atomic(out, path, src_key)


SEMDEDUP_ORACLE_PATH = "/tmp/ccray_oracle_semdedup.parquet"


def oracle_semdedup_table(
    sf_dir: str,
    path: str = SEMDEDUP_ORACLE_PATH,
    k: int = 16,
    iters: int = 4,
    threshold: float = 0.45,
) -> str:
    """Sequential SemDeDup (fit + assign + prune) sharing only the
    numeric kernels with stages/semdedup.py; the aggregation plumbing
    — one flat numpy pass here vs the distributed partial-row reduce
    tree there — is independent. Exactness argument: the centroid
    state is integer-unit sums (order-free), assignments round cosine
    to 6 dp before argmax, so both implementations walk bit-identical
    centroid trajectories and produce identical (cluster, keep)."""
    from ..functions.sketches import knuth32
    from ..stages.semdedup import (
        _QSCALE,
        _norm_rows,
        assign_rounded,
        centroids_from_sums,
        quantize,
    )

    src_key = f"{os.path.abspath(sf_dir)}|semdedup|{k}|{iters}|{threshold}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    from ..functions.vec import list_to_matrix

    xn = _norm_rows(list_to_matrix(t.column("embedding")))
    dim = xn.shape[1]
    # init: the shared knuth32 hash-sample rule (select ~2k, id order, k)
    if len(ids) > k:
        thresh = np.uint64(min(1 << 32, int(np.ceil((1 << 32) * 2.0 * k / len(ids)))))
        sel = np.sort(ids[knuth32(ids) < thresh])[:k]
    else:
        sel = np.sort(ids)
    pos = {int(v): i for i, v in enumerate(ids)}
    centroids = xn[[pos[int(s)] for s in sel]].copy()
    q = quantize(xn)
    for _ in range(iters):
        cl = assign_rounded(xn, centroids)
        counts = np.zeros(k, dtype=np.int64)
        np.add.at(counts, cl, 1)
        sums = np.zeros((k, dim), dtype=np.int64)
        np.add.at(sums, cl, q)
        centroids = centroids_from_sums(sums, counts, centroids)
    cl = assign_rounded(xn, centroids)
    keep = np.ones(len(ids), dtype=bool)
    for c in np.unique(cl):
        members = np.nonzero(cl == c)[0]
        if len(members) < 2:
            continue
        order = members[np.argsort(ids[members], kind="mergesort")]
        xq = q[order].astype(np.float64) / _QSCALE
        sims = np.round(xq @ xq.T, 6)
        dup = (np.triu(sims >= threshold, 1)).any(axis=0)
        keep[order[dup]] = False
    out = pa.table(
        {
            "vec_id": pa.array(ids),
            "cluster": pa.array(cl),
            "keep": pa.array(keep),
        }
    )
    return _write_atomic(out, path, src_key)


WAT_ORACLE_PATH = "/tmp/ccray_oracle_wat.parquet"


def oracle_wat_table(sf_dir: str, path: str = WAT_ORACLE_PATH) -> str:
    """Oracle for the WAT metadata round trip WITHOUT the WAT layer:
    the same pages cache parsed sequentially, projected to the fields
    the WAT JSON envelope carries (status, normalized mime, link
    count, md5 of the title). A value-hash match proves the JSON
    build -> .wat.gz write -> read -> JSON parse cycle preserves every
    field."""
    import hashlib

    from ..sources.synth import pages_cache_dir, sf_from_dir

    sf = min(sf_from_dir(sf_dir), 0.01)
    src_key = f"wat|{sf}|42"
    if _is_fresh(path, src_key):
        return path
    p = _sequential_parse(pages_cache_dir(sf), sf)
    urls = p.column("url").to_pylist()
    status = p.column("http_status").to_pylist()
    mimes = p.column("mime_norm").to_pylist()
    n_links = p.column("n_links").to_pylist()
    title_hex = [
        hashlib.md5((t or "").encode()).hexdigest()
        for t in p.column("title").to_pylist()
    ]
    out = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "http_status": pa.array(np.asarray(status, dtype=np.int16)),
            "mime_norm": pa.array(mimes, pa.string()),
            "n_links": pa.array(np.asarray(n_links, dtype=np.int32)),
            "title_hex": pa.array(title_hex, pa.string()),
        }
    )
    return _write_atomic(out, path, src_key)


HOST_EDGES_ORACLE_PATH = "/tmp/ccray_oracle_host_edges.parquet"


def oracle_host_edges_table(sf_dir: str, path: str = HOST_EDGES_ORACLE_PATH) -> str:
    """The sequential host edge set (directed, distinct — the shared
    _sequential_host_edges build) as a parquet DuckDB can self-join:
    the triangle-count oracle is then PLAIN SQL over it, fully
    independent of the distributed wedge machinery."""
    from ..sources.synth import sf_from_dir

    sf = min(sf_from_dir(sf_dir), 0.01)
    src_key = f"{os.path.abspath(sf_dir)}|host_edges|{sf}"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    out = pa.table(
        {
            "src": pa.array([nodes[i] for i in src_i], pa.string()),
            "dst": pa.array([nodes[i] for i in dst_i], pa.string()),
        }
    )
    return _write_atomic(out, path, src_key)


SITEMAP_ORACLE_PATH = "/tmp/ccray_oracle_sitemap.parquet"


def oracle_sitemap_table(sf_dir: str, path: str = SITEMAP_ORACLE_PATH) -> str:
    """The universe's sitemap row set built directly by the shared
    kernel (sources/sitemap.universe_sitemap_rows), WITHOUT the XML
    layer — a hash match against the distributed write->read->parse
    round-trip therefore proves the XML cycle lossless."""
    from ..sources.sitemap import universe_sitemap_rows
    from ..sources.synth import sf_from_dir

    sf = min(sf_from_dir(sf_dir), 0.01)
    src_key = f"{os.path.abspath(sf_dir)}|sitemap|{sf}"
    if _is_fresh(path, src_key):
        return path
    rows = universe_sitemap_rows(sf, n_shards=16)
    out = pa.table(
        {
            "url": pa.array([r[1] for r in rows], pa.string()),
            "lastmod": pa.array([r[2] for r in rows], pa.string()),
            "shard": pa.array(
                [f"sitemap-{r[0]:05d}.xml" for r in rows], pa.string()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


HOST_COMPONENTS_ORACLE_PATH = "/tmp/ccray_oracle_host_components.parquet"


def oracle_host_components_table(
    sf_dir: str, path: str = HOST_COMPONENTS_ORACLE_PATH
) -> str:
    """Sequential weakly-connected components over the SAME host edge
    set (shared _sequential_host_edges build): plain union-find with
    path compression, component rep = the member host with the
    smallest fp64 (the identical rule the distributed Hash-to-Min
    query resolves to, since its component_id is the min member
    fingerprint)."""
    from ..functions.fingerprint import fp64
    from ..sources.synth import sf_from_dir

    sf = min(sf_from_dir(sf_dir), 0.01)
    src_key = f"{os.path.abspath(sf_dir)}|host_components|{sf}"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    parent = list(range(len(nodes)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src_i.tolist(), dst_i.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    fps = [fp64(h) for h in nodes]
    rep_fp: dict[int, int] = {}  # root -> index of min-fp member
    for i in range(len(nodes)):
        r = find(i)
        if r not in rep_fp or fps[i] < fps[rep_fp[r]]:
            rep_fp[r] = i
    out = pa.table(
        {
            "host": pa.array(nodes, pa.string()),
            "comp_host": pa.array(
                [nodes[rep_fp[find(i)]] for i in range(len(nodes))], pa.string()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


ANCHOR_TERMS_ORACLE_PATH = "/tmp/ccray_oracle_anchor_terms.parquet"


def oracle_anchor_terms_table(
    sf_dir: str, path: str = ANCHOR_TERMS_ORACLE_PATH
) -> str:
    """Sequential (dst_host, anchor_term) occurrence pairs over the
    SAME pages cache the registered query parses: shared parse kernel
    + shared ``extract_anchor_terms_batch``, single thread. The
    anchor-text aggregation oracle is then plain SQL (count + window
    rank) over this parquet, fully independent of the distributed
    groupby/top-k machinery."""
    from ..sources.synth import pages_cache_dir, sf_from_dir
    from ..stages.pagerank import extract_anchor_terms_batch

    sf = min(sf_from_dir(sf_dir), 0.01)
    src_key = f"{os.path.abspath(sf_dir)}|anchor_terms|{sf}"
    if _is_fresh(path, src_key):
        return path
    parsed = _sequential_parse(pages_cache_dir(sf), sf)
    B = 256
    parts = [
        extract_anchor_terms_batch(parsed.slice(off, B))
        for off in range(0, parsed.num_rows, B)
    ]
    out = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {"dst": pa.array([], pa.string()), "term": pa.array([], pa.string())}
        )
    )
    return _write_atomic(out, path, src_key)


DUP_STRIP_ORACLE_PATH = "/tmp/ccray_oracle_dup_strip.parquet"


def oracle_dup_strip_table(sf_dir: str, path: str = DUP_STRIP_ORACLE_PATH) -> str:
    """Sequential duplicate-passage strip: one dict pass counts each
    word 8-gram's distinct documents, a second pass cuts every token
    covered by a cross-document gram and digests the remainder —
    plain Python against the distributed three-exchange pipeline."""
    import hashlib
    import re as _re

    src_key = f"{os.path.abspath(sf_dir)}|dup_strip|8"
    if _is_fresh(path, src_key):
        return path
    N = 8
    ids, texts = _read_docs(sf_dir)
    tok_lists = [_re.split(r"\s+", t or "") for t in texts]
    docs_of: dict[str, set[int]] = {}
    for did, lst in zip(ids, tok_lists):
        for i in range(len(lst) - N + 1):
            docs_of.setdefault(" ".join(lst[i : i + N]), set()).add(did)
    out_n, out_kept, out_digest = [], [], []
    for did, lst in zip(ids, tok_lists):
        n = len(lst)
        cover = [False] * n
        for i in range(n - N + 1):
            if len(docs_of[" ".join(lst[i : i + N])]) >= 2:
                for j in range(i, min(i + N, n)):
                    cover[j] = True
        kept = [w for w, c in zip(lst, cover) if not c]
        out_n.append(n)
        out_kept.append(len(kept))
        out_digest.append(hashlib.md5(" ".join(kept).encode()).hexdigest())
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(np.asarray(out_n, dtype=np.int64)),
            "n_kept": pa.array(np.asarray(out_kept, dtype=np.int64)),
            "clean_digest": pa.array(out_digest, pa.string()),
        }
    )
    return _write_atomic(out, path, src_key)


MULTIMODAL_RESIZE_ORACLE_PATH = "/tmp/ccray_oracle_multimodal_resize.parquet"


def oracle_multimodal_resize_table(
    path: str = MULTIMODAL_RESIZE_ORACLE_PATH,
) -> str:
    """Single-process resize summary: the same deterministic fake
    block-mean kernel (ResizeImageStage called directly), digests of
    the resized payloads — vs the distributed actor-pool run."""
    import hashlib

    from ..stages.multimodal import ResizeImageStage, synth_media_table

    src_key = "synth-resize|n=96|seed=42|16x16"
    if _is_fresh(path, src_key):
        return path
    media = synth_media_table(n=96, seed=42)
    res = ResizeImageStage(width=16, height=16, fake=True)(media)
    out = pa.table(
        {
            "media_id": res.column("media_id"),
            "kind": res.column("kind"),
            "width": res.column("width"),
            "height": res.column("height"),
            "payload_hex": pa.array(
                [
                    hashlib.md5(p).hexdigest()
                    for p in res.column("payload").to_pylist()
                ],
                pa.string(),
            ),
        }
    )
    return _write_atomic(out, path, src_key)


LANG_ID_ORACLE_PATH = "/tmp/ccray_oracle_lang_id.parquet"


def oracle_lang_id_table(sf_dir: str, path: str = LANG_ID_ORACLE_PATH) -> str:
    """Sequential per-language LM fit + classification: one dense
    count matrix accumulated doc-by-doc (vs the distributed per-batch
    partials -> groupby((lang, gram)).sum merge), then every document
    classified with the SHARED score_langs kernel — integer counts and
    one fixed float64 path make the argmax identical."""
    from ..stages.lm_score import (
        N_GRAMS,
        encode_text,
        gram_ids,
        logprob_table,
        score_langs,
    )

    src_key = f"{os.path.abspath(sf_dir)}|lang_id"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "text"]
    )
    ids = t.column("doc_id").to_pylist()
    langs_col = t.column("lang").to_pylist()
    texts = t.column("text").to_pylist()
    langs = sorted(set(langs_col))
    counts = {lang: np.zeros(N_GRAMS, dtype=np.int64) for lang in langs}
    grams_cache = []
    for lang, text in zip(langs_col, texts):
        g = gram_ids(encode_text(text or ""))
        grams_cache.append(g)
        if len(g):
            counts[lang] += np.bincount(g, minlength=N_GRAMS)
    mat = np.empty((len(langs), N_GRAMS), dtype=np.float64)
    for i, lang in enumerate(langs):
        nz = np.nonzero(counts[lang])[0]
        mat[i] = logprob_table(nz.astype(np.int64), counts[lang][nz])
    preds = [langs[int(np.argmax(score_langs(g, mat)))] for g in grams_cache]
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs_col, pa.string()),
            "lang_pred": pa.array(preds, pa.string()),
        }
    )
    return _write_atomic(out, path, src_key)


DOC_FP_ORACLE_PATH = "/tmp/ccray_oracle_doc_fp.parquet"


def oracle_doc_fp_table(sf_dir: str, path: str = DOC_FP_ORACLE_PATH) -> str:
    """Sequential per-doc Rabin fp64 + length — the rolling-hash
    document fingerprint applied doc-by-doc in one process (shared
    kernel; the parity proven is the distributed map plumbing, and the
    kernel itself is bit-parity-locked by tests/test_fingerprint.py)."""
    from ..functions.fingerprint import fp64

    src_key = f"{os.path.abspath(sf_dir)}|doc_fp"
    if _is_fresh(path, src_key):
        return path
    ids, texts = _read_docs(sf_dir)
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text_fp": pa.array([fp64(t or "") for t in texts], pa.int64()),
            "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


DSIR_ORACLE_PATH = "/tmp/ccray_oracle_dsir.parquet"


def oracle_dsir_table(sf_dir: str, target_source: str = "src0",
                      path: str = DSIR_ORACLE_PATH) -> str:
    """Single-process DSIR importance scoring (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling", with the
    repo's deterministic char-trigram LM standing in for the paper's
    hashed n-gram bag models): fit the target-domain LM on the
    ``source == target_source`` slice and the raw LM on the whole
    corpus, both by sequential dense bincount accumulation, then score
    every document's per-gram log ratio in file order. Shares the
    alphabet/gram/log-prob kernels with stages/lm_score.py — the
    parity proven is the distributed two-model fit + two-table
    broadcast plumbing (the oracle_lm_score_table discipline)."""
    from ..stages.lm_score import N_GRAMS, encode_text, gram_ids, logprob_table

    src_key = f"{os.path.abspath(sf_dir)}|dsir|{target_source}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )
    doc_ids = t.column("doc_id").to_pylist()
    sources = t.column("source").to_pylist()
    texts = t.column("text").to_pylist()
    counts_t = np.zeros(N_GRAMS, dtype=np.int64)
    counts_s = np.zeros(N_GRAMS, dtype=np.int64)
    for src, text in zip(sources, texts):
        if text:
            g = gram_ids(encode_text(text))
            if len(g):
                b = np.bincount(g, minlength=N_GRAMS)
                counts_s += b
                if src == target_source:
                    counts_t += b
    nz_t = np.nonzero(counts_t)[0]
    nz_s = np.nonzero(counts_s)[0]
    logp_t = logprob_table(nz_t.astype(np.int64), counts_t[nz_t])
    logp_s = logprob_table(nz_s.astype(np.int64), counts_s[nz_s])
    n_grams = np.zeros(len(texts), dtype=np.int64)
    ratio = np.zeros(len(texts), dtype=np.float64)
    for i, text in enumerate(texts):
        g = gram_ids(encode_text(text or ""))
        if len(g):
            n_grams[i] = len(g)
            ratio[i] = (logp_t[g].sum() - logp_s[g].sum()) / len(g)
    out = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_grams": pa.array(n_grams),
            "logratio": pa.array(np.round(ratio, 6), pa.float64()),
        }
    )
    return _write_atomic(out, path, src_key)


SHUFFLE_ORACLE_PATH = "/tmp/ccray_oracle_shuffle.parquet"


def oracle_shuffle_table(sf_dir: str, seed: int = 42, num_shards: int = 8,
                         path: str = SHUFFLE_ORACLE_PATH) -> str:
    """Single-process deterministic shuffle-key assignment: scalar
    splitmix64 per doc_id in file order (the SCALAR kernel — the
    distributed path uses the vectorized batch kernel, and
    tests/test_fingerprint.py pins batch == scalar), unsigned modulo
    shard routing. The parity proven is the keyed map + hive
    partitioned write + read-back plumbing."""
    from ..functions.fingerprint import splitmix64

    src_key = f"{os.path.abspath(sf_dir)}|shuffle|{seed}|{num_shards}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    ids = t.column("doc_id").to_pylist()
    skeys = [splitmix64(i, seed) for i in ids]
    shards = [(k & 0xFFFFFFFFFFFFFFFF) % num_shards for k in skeys]
    out = pa.table(
        {
            "shard": pa.array(shards, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "skey": pa.array(skeys, pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


LOGREG_ORACLE_PATH = "/tmp/ccray_oracle_logreg.parquet"


def oracle_logreg_table(sf_dir: str, pos_lang: str = "en",
                        path: str = LOGREG_ORACLE_PATH) -> str:
    """Single-process logistic-regression fit + score in file order.
    Shares the count_features / doc_features / quantized-gradient
    kernels with stages/classifier.py — the int64 gradient
    quantization makes the distributed fit bit-identical to this
    sequential fold, so the parity proven is the per-iteration
    streaming aggregate + weight broadcast plumbing."""
    from ..stages.classifier import (
        Q,
        count_features,
        doc_features,
        fit_logreg_sequential,
    )

    src_key = f"{os.path.abspath(sf_dir)}|logreg|{pos_lang}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )
    n_words, word_chars, n_stop = count_features(t.column("text"))
    x = doc_features(n_words, word_chars, n_stop)
    y = (np.array(t.column("lang").to_pylist()) == pos_lang).astype(np.float64)
    w = fit_logreg_sequential(x, y, lr=1.0, iters=10)
    p = 1.0 / (1.0 + np.exp(-(x @ w)))
    out = pa.table(
        {
            "doc_id": t.column("doc_id"),
            "label": pa.array(y.astype(np.int64)),
            "score_q": pa.array(np.round(p * float(Q)).astype(np.int64)),
        }
    )
    return _write_atomic(out, path, src_key)


COMPRESS_ORACLE_PATH = "/tmp/ccray_oracle_compress.parquet"


def oracle_compress_table(sf_dir: str, level: int = 6,
                          path: str = COMPRESS_ORACLE_PATH) -> str:
    """Single-process compression-ratio scan in file order (zlib at a
    fixed level is deterministic for a given input). Shares only the
    zlib call with the distributed stage — the parity proven is the
    batch plumbing and the integer threshold flag."""
    import zlib

    src_key = f"{os.path.abspath(sf_dir)}|compress|{level}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    n_raw, n_gz = [], []
    for s in texts:
        b = (s or "").encode("utf-8")
        n_raw.append(len(b))
        n_gz.append(len(zlib.compress(b, level)))
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_raw": pa.array(n_raw, pa.int64()),
            "n_gz": pa.array(n_gz, pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


KCORE_ORACLE_PATH = "/tmp/ccray_oracle_kcore.parquet"


def oracle_kcore_table(sf_dir: str, path: str = KCORE_ORACLE_PATH) -> str:
    """Sequential exact k-core decomposition over the same distinct
    host edge set the graph queries use, viewed undirected with
    self-loops dropped: classic peeling (Batagelj & Zaversnik 2003,
    "An O(m) Algorithm for Cores Decomposition of Networks") — process
    nodes in increasing current-degree order; a node's coreness is its
    degree at removal time, clamped to never drop below the previous
    removal. Plain Python adjacency sets."""
    import heapq

    src_key = f"{os.path.abspath(sf_dir)}|kcore"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    adj: dict[int, set[int]] = {}
    for s, d in zip(src_i.tolist(), dst_i.tolist()):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    deg = {v: len(ns) for v, ns in adj.items()}
    heap = [(dv, v) for v, dv in deg.items()]
    heapq.heapify(heap)
    removed: set[int] = set()
    core: dict[int, int] = {}
    k = 0
    while heap:
        dv, v = heapq.heappop(heap)
        if v in removed or dv != deg[v]:
            continue  # stale heap entry
        k = max(k, dv)
        core[v] = k
        removed.add(v)
        for w in adj[v]:
            if w not in removed:
                deg[w] -= 1
                heapq.heappush(heap, (deg[w], w))
    order = sorted(core)
    out = pa.table(
        {
            "host": pa.array([nodes[i] for i in order], pa.string()),
            "core": pa.array(
                np.array([core[i] for i in order], dtype=np.int64), pa.int64()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


KTRUSS_ORACLE_PATH = "/tmp/ccray_oracle_ktruss.parquet"


def oracle_ktruss_table(
    sf_dir: str, k: int = 4, path: str = KTRUSS_ORACLE_PATH
) -> str:
    """Sequential exact maximal k-truss over the same distinct host
    edge set the graph queries use, viewed undirected with self-loops
    dropped: classic support peeling (Cohen 2008) — compute per-edge
    triangle support |N(u) & N(v)|, repeatedly delete any edge with
    support < k-2, decrementing the support of the two co-triangle
    edges it leaves behind, until stable. Plain Python adjacency
    sets. Output (host, truss_deg) = per-node incident truss-edge
    count over the surviving subgraph."""
    from collections import Counter, deque

    src_key = f"{os.path.abspath(sf_dir)}|ktruss{k}"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    adj: dict[int, set[int]] = {}
    for s, d in zip(src_i.tolist(), dst_i.tolist()):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    alive: set[tuple[int, int]] = {
        (u, v) for u, ns in adj.items() for v in ns if u < v
    }
    sup: dict[tuple[int, int], int] = {
        (u, v): len(adj[u] & adj[v]) for (u, v) in alive
    }
    thresh = k - 2
    q = deque(e for e, s in sup.items() if s < thresh)
    while q:
        e = q.popleft()
        if e not in alive:
            continue
        alive.discard(e)
        u, v = e
        for w in adj[u] & adj[v]:
            for f in (
                (min(u, w), max(u, w)),
                (min(v, w), max(v, w)),
            ):
                if f in alive:
                    sup[f] -= 1
                    if sup[f] < thresh:
                        q.append(f)
        adj[u].discard(v)
        adj[v].discard(u)
    deg: Counter = Counter()
    for u, v in alive:
        deg[u] += 1
        deg[v] += 1
    order = sorted(deg)
    out = pa.table(
        {
            "host": pa.array([nodes[i] for i in order], pa.string()),
            "truss_deg": pa.array(
                np.array([deg[i] for i in order], dtype=np.int64), pa.int64()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


RWR_ORACLE_PATH = "/tmp/ccray_oracle_rwr.parquet"


def oracle_rwr_table(
    sf_dir: str,
    path: str = RWR_ORACLE_PATH,
    n_seeds: int = 4,
    walks_per_seed: int = 25,
    steps: int = 8,
    restart_p: float = 0.15,
) -> str:
    """Sequential bit-exact replay of stages/pagerank.random_walk_visits
    over the same distinct directed non-self host edge set: identical
    FNV-1a node ids, identical SplitMix64 choice/restart hashes
    (rwr_choice_score / rwr_restarts — the shared numeric kernels),
    identical top-out-degree seed pick (ties to the smallest host).
    Plain Python walk loop."""
    from collections import Counter

    from ..functions.minhash import fnv1a_batch
    from ..stages.pagerank import rwr_choice_score, rwr_restarts

    src_key = (
        f"{os.path.abspath(sf_dir)}|rwr{n_seeds},{walks_per_seed},{steps},{restart_p}"
    )
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    ids = fnv1a_batch(pa.array(nodes, pa.string())).view(np.int64)
    adj: dict[int, set[int]] = {}
    for s, d in zip(src_i.tolist(), dst_i.tolist()):
        su, du = int(ids[s]), int(ids[d])
        if su == du:
            continue
        adj.setdefault(su, set()).add(du)
    id_to_host = {int(i): h for i, h in zip(ids, nodes)}
    # seeds: top out-degree, ties to the smallest host string
    ranked = sorted(
        ((u, ns) for u, ns in adj.items()),
        key=lambda kv: (-len(kv[1]), id_to_host[kv[0]]),
    )
    seed_ids = [u for u, _ in ranked[:n_seeds]]
    adj_arr = {u: np.array(sorted(ns), dtype=np.int64) for u, ns in adj.items()}
    visits: Counter = Counter()
    for i, sid in enumerate(seed_ids):
        for j in range(walks_per_seed):
            w = i * walks_per_seed + j
            cur = sid
            visits[cur] += 1
            for step in range(1, steps + 1):
                restart = bool(
                    rwr_restarts(np.array([w], np.int64), step, restart_p)[0]
                )
                cand = adj_arr.get(cur)
                if restart or cand is None or len(cand) == 0:
                    cur = sid
                else:
                    score = rwr_choice_score(
                        np.array([w], np.int64), step, cand
                    )
                    cur = int(cand[np.lexsort((cand, score))[0]])
                visits[cur] += 1
    order = sorted(visits, key=lambda u: id_to_host[u])
    out = pa.table(
        {
            "host": pa.array([id_to_host[u] for u in order], pa.string()),
            "visits": pa.array(
                np.array([visits[u] for u in order], dtype=np.int64), pa.int64()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


PMI_ORACLE_PATH = "/tmp/ccray_oracle_pmi.parquet"


def oracle_pmi_table(
    sf_dir: str,
    path: str = PMI_ORACLE_PATH,
    min_count: int = 5,
    topk: int = 50,
) -> str:
    """Sequential PMI collocation fold sharing ONLY the float kernel
    (functions/textstats.pmi_scores) with the distributed query:
    whitespace tokens per document (identical split semantics to
    pc.split_pattern_regex(r"\\s+") + empty drop), Counter folds for
    unigrams and within-doc adjacent bigrams, then top-``topk`` pairs
    with n_pair >= ``min_count`` by (pmi desc, w1, w2)."""
    import re as _re
    from collections import Counter

    from ..functions.textstats import pmi_scores

    src_key = f"{os.path.abspath(sf_dir)}|pmi{min_count},{topk}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    uni: Counter = Counter()
    big: Counter = Counter()
    for txt in t.column("text").to_pylist():
        toks = [w for w in _re.split(r"\s+", txt or "") if w != ""]
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n_tok = sum(uni.values())
    n_pairs = sum(big.values())
    keys = [kv for kv in big.items() if kv[1] >= min_count]
    if keys and n_pairs:
        w1 = [k[0][0] for k in keys]
        w2 = [k[0][1] for k in keys]
        n_pair = np.array([k[1] for k in keys], dtype=np.int64)
        n_w1 = np.array([uni[a] for a in w1], dtype=np.int64)
        n_w2 = np.array([uni[b] for b in w2], dtype=np.int64)
        pmi = pmi_scores(n_pair, n_w1, n_w2, n_pairs, n_tok)
        order = sorted(
            range(len(keys)), key=lambda i: (-pmi[i], w1[i], w2[i])
        )[:topk]
    else:
        order = []
        w1 = w2 = []
        n_pair = np.array([], dtype=np.int64)
        pmi = np.array([], dtype=np.float64)
    out = pa.table(
        {
            "w1": pa.array([w1[i] for i in order], pa.string()),
            "w2": pa.array([w2[i] for i in order], pa.string()),
            "n_pair": pa.array(
                np.array([n_pair[i] for i in order], dtype=np.int64), pa.int64()
            ),
            "pmi": pa.array(
                np.array([pmi[i] for i in order], dtype=np.float64), pa.float64()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


SQ_RECALL_ORACLE_PATH = "/tmp/ccray_oracle_sq_recall.parquet"


def oracle_sq_recall_table(
    sf_dir: str,
    path: str = SQ_RECALL_ORACLE_PATH,
    n_queries: int = 4,
    k: int = 10,
) -> str:
    """Sequential int8 scalar-quantization recall eval sharing the
    quantization kernel (functions/vec.sq_quantize_unit) and the exact
    round-6 cosine expression with the distributed q_sq_recall: per
    query, |top-k(exact) & top-k(quantized)| with (score desc, vec_id
    asc) ordering on both sides — the quantized score is an exact
    int8xint8->int64 dot, so only the exact side carries the standing
    round-before-rank float discipline."""
    from ..functions.vec import sq_quantize_unit

    src_key = f"{os.path.abspath(sf_dir)}|sqrecall{n_queries},{k}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    pos = {int(v): i for i, v in enumerate(ids)}
    qmat = mat[[pos[q] for q in range(n_queries)]]
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0] = 1.0
    qunit = qmat / qn[:, None]
    q8 = sq_quantize_unit(qmat).astype(np.int64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sims = np.round((mat @ qunit.T) / norms[:, None], 6)  # (n, Q)
    dots = sq_quantize_unit(mat).astype(np.int64) @ q8.T  # (n, Q) exact
    out_q: list[int] = []
    out_h: list[int] = []
    for q in range(n_queries):
        keep = ids != q
        vid = ids[keep]
        s = sims[keep, q]
        d = dots[keep, q]
        top_e = set(vid[np.lexsort((vid, -s))[:k]].tolist())
        top_q = set(vid[np.lexsort((vid, -d))[:k]].tolist())
        n_hits = len(top_e & top_q)
        if n_hits:
            out_q.append(q)
            out_h.append(n_hits)
    out = pa.table(
        {
            "query_id": pa.array(np.array(out_q, dtype=np.int64), pa.int64()),
            "n_hits": pa.array(np.array(out_h, dtype=np.int64), pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


DIVERSITY_ORACLE_PATH = "/tmp/ccray_oracle_diversity.parquet"


def oracle_diversity_sample_table(
    sf_dir: str,
    path: str = DIVERSITY_ORACLE_PATH,
    n: int = 120,
    k: int = 16,
    iters: int = 4,
    mode: str = "prototypes",
) -> str:
    """Sequential cluster-balanced diversity sample sharing only the
    numeric kernels with stages/semdedup.py diversity_sample: the
    identical integer-unit k-means trajectory (see oracle_semdedup's
    exactness argument), then a plain per-cluster sort picking the
    ceil(n/k) most (or least, mode='edges') prototypical members,
    ties to the lowest id, sims rounded to 6 dp."""
    import math

    from ..functions.sketches import knuth32
    from ..functions.vec import list_to_matrix
    from ..stages.semdedup import (
        _norm_rows,
        assign_rounded,
        centroids_from_sums,
        quantize,
    )

    src_key = f"{os.path.abspath(sf_dir)}|diversity|{n}|{k}|{iters}|{mode}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    xn = _norm_rows(list_to_matrix(t.column("embedding")))
    dim = xn.shape[1]
    if len(ids) > k:
        thresh = np.uint64(min(1 << 32, int(np.ceil((1 << 32) * 2.0 * k / len(ids)))))
        sel = np.sort(ids[knuth32(ids) < thresh])[:k]
    else:
        sel = np.sort(ids)
    pos = {int(v): i for i, v in enumerate(ids)}
    centroids = xn[[pos[int(s)] for s in sel]].copy()
    q = quantize(xn)
    for _ in range(iters):
        cl = assign_rounded(xn, centroids)
        counts = np.zeros(k, dtype=np.int64)
        np.add.at(counts, cl, 1)
        sums = np.zeros((k, dim), dtype=np.int64)
        np.add.at(sums, cl, q)
        centroids = centroids_from_sums(sums, counts, centroids)
    scores = np.round(xn @ centroids.T, 6)
    cl = np.argmax(scores, axis=1).astype(np.int64)
    sim = scores[np.arange(len(cl)), cl]
    quota = max(1, math.ceil(n / k))
    proto = mode == "prototypes"
    out_id, out_cl, out_sim, out_rank = [], [], [], []
    for c in np.unique(cl):
        members = np.nonzero(cl == c)[0]
        order = members[
            np.lexsort((ids[members], -sim[members] if proto else sim[members]))
        ][:quota]
        for r, i in enumerate(order, start=1):
            out_id.append(int(ids[i]))
            out_cl.append(int(c))
            out_sim.append(float(sim[i]))
            out_rank.append(r)
    out = pa.table(
        {
            "vec_id": pa.array(out_id, pa.int64()),
            "cluster": pa.array(out_cl, pa.int64()),
            "sim": pa.array(out_sim, pa.float64()),
            "rank": pa.array(out_rank, pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


IP_COLOC_ORACLE_PATH = "/tmp/ccray_oracle_ip_coloc.parquet"


def oracle_ip_colocation_table(
    sf_dir: str, path: str = IP_COLOC_ORACLE_PATH
) -> str:
    """Sequential IP-colocation census over the same host universe the
    graph oracles use: the deterministic fingerprint resolver model
    (state/dns.py _resolve_host: ip = 10.x.x.x from the low 24 bits of
    fp64(host)), then a plain Counter of hosts per IP."""
    from collections import Counter

    from ..functions.fingerprint import fp64_batch

    src_key = f"{os.path.abspath(sf_dir)}|ip_coloc"
    if _is_fresh(path, src_key):
        return path
    nodes, _, _ = _sequential_host_edges(sf_dir)
    fps = fp64_batch(nodes).view(np.uint64)
    ips = (np.uint64(10 << 24) | (fps & np.uint64(0xFFFFFF))).astype(np.int64)
    quads = [
        f"{(v >> 24) & 0xFF}.{(v >> 16) & 0xFF}.{(v >> 8) & 0xFF}.{v & 0xFF}"
        for v in ips.tolist()
    ]
    per_ip = Counter(quads)
    out = pa.table(
        {
            "host": pa.array(nodes, pa.string()),
            "ip": pa.array(quads, pa.string()),
            "n_shared": pa.array(
                np.array([per_ip[q] for q in quads], dtype=np.int64), pa.int64()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


TOKEN_SHARDS_ORACLE_PATH = "/tmp/ccray_oracle_token_shards.parquet"


def oracle_token_shards_table(
    sf_dir: str, path: str = TOKEN_SHARDS_ORACLE_PATH, n_shards: int = 8
) -> str:
    """Sequential token-shard export oracle: sequentially-counted
    words -> shared merge/vocab/encode kernels -> per-doc uint32 id
    streams (EOD-terminated), grouped by doc_id % n_shards in doc_id
    order and packed little-endian — the identical bytes the
    distributed packer must produce, digest and all."""
    import hashlib

    from ..stages.bpe import encode_word_ids, learn_bpe, pretokenize, vocab_table

    src_key = f"{os.path.abspath(sf_dir)}|token_shards|{n_shards}"
    if _is_fresh(path, src_key):
        return path
    wc = _bpe_seq_word_counts(sf_dir)
    merges = learn_bpe(wc, BPE_N_MERGES)
    vt = vocab_table(wc, merges)
    vocab_id = dict(
        zip(vt.column("token").to_pylist(), vt.column("token_id").to_pylist())
    )
    ranks = {m: i for i, m in enumerate(merges)}
    unk_id = len(vocab_id)
    eod_id = len(vocab_id) + 1
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    order = np.argsort(
        np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64), kind="mergesort"
    )
    doc_ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)[order]
    texts = [t.column("text").to_pylist()[int(i)] for i in order]
    memo: dict[str, tuple] = {}
    per_shard: dict[int, list] = {}
    n_docs: dict[int, int] = {}
    for did, txt in zip(doc_ids.tolist(), texts):
        ids: list[int] = []
        for w in pretokenize(txt or ""):
            k = memo.get(w)
            if k is None:
                k = tuple(encode_word_ids(w, ranks, vocab_id, unk_id))
                memo[w] = k
            ids.extend(k)
        ids.append(eod_id)
        s = did % n_shards
        per_shard.setdefault(s, []).extend(ids)
        n_docs[s] = n_docs.get(s, 0) + 1
    rows = {"shard": [], "n_docs": [], "n_tokens": [], "nbytes": [], "digest_hex": []}
    for s in sorted(per_shard):
        blob = np.asarray(per_shard[s], dtype="<u4").tobytes()
        rows["shard"].append(s)
        rows["n_docs"].append(n_docs[s])
        rows["n_tokens"].append(len(blob) // 4)
        rows["nbytes"].append(len(blob))
        rows["digest_hex"].append(hashlib.md5(blob).hexdigest())
    out = pa.table(
        {
            "shard": pa.array(rows["shard"], pa.int64()),
            "n_docs": pa.array(rows["n_docs"], pa.int64()),
            "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
            "nbytes": pa.array(rows["nbytes"], pa.int64()),
            "digest_hex": pa.array(rows["digest_hex"], pa.string()),
        }
    )
    return _write_atomic(out, path, src_key)


WINNOW_ORACLE_PATH = "/tmp/ccray_oracle_winnow.parquet"


def oracle_winnow_table(
    sf_dir: str,
    path: str = WINNOW_ORACLE_PATH,
    k: int = 16,
    w: int = 8,
    min_common: int = 3,
    max_gram_docs: int = 256,
) -> str:
    """Sequential winnowing near-dup fold sharing only the pure
    winnow_hashes kernel: per-doc distinct fingerprint sets, a plain
    dict posting index with the SAME ultra-frequent-fingerprint cap
    rule, exact shared-fingerprint counts per pair."""
    from collections import Counter

    from ..functions.minhash import winnow_hashes

    src_key = f"{os.path.abspath(sf_dir)}|winnow|{k}|{w}|{min_common}|{max_gram_docs}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    postings: dict[int, list[int]] = {}
    sizes: dict[int, int] = {}
    for i, txt in zip(ids, texts):
        g = winnow_hashes(txt or "", k=k, w=w)
        if g.size == 0:
            continue
        sizes[i] = int(g.size)
        for h in g.view(np.int64).tolist():
            postings.setdefault(h, []).append(i)
    pair_counts: Counter = Counter()
    for h, docs in postings.items():
        if len(docs) < 2 or len(docs) > max_gram_docs:
            continue
        docs = sorted(docs)
        for x in range(len(docs)):
            for y in range(x + 1, len(docs)):
                pair_counts[(docs[x], docs[y])] += 1
    rows = {"id_a": [], "id_b": [], "n_common": [], "sz_a": [], "sz_b": []}
    for (a, b), n in sorted(pair_counts.items()):
        if n < min_common:
            continue
        rows["id_a"].append(a)
        rows["id_b"].append(b)
        rows["n_common"].append(n)
        rows["sz_a"].append(sizes[a])
        rows["sz_b"].append(sizes[b])
    out = pa.table(
        {
            "id_a": pa.array(rows["id_a"], pa.int64()),
            "id_b": pa.array(rows["id_b"], pa.int64()),
            "n_common": pa.array(rows["n_common"], pa.int64()),
            "sz_a": pa.array(rows["sz_a"], pa.int64()),
            "sz_b": pa.array(rows["sz_b"], pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


HYPERBALL_ORACLE_PATH = "/tmp/ccray_oracle_hyperball.parquet"


def oracle_hyperball_table(
    sf_dir: str,
    path: str = HYPERBALL_ORACLE_PATH,
    p: int = 8,
    max_rounds: int = 32,
) -> str:
    """Sequential HyperBall (Boldi & Vigna 2013) over the same host
    edge set, sharing only the pure kernels (fnv1a node hashing,
    splitmix64 register insert, hll_estimate_rows): a dense (V, 2^p)
    uint8 register matrix, per round an elementwise-max fold of each
    node's in-neighbors' registers, per-node harmonic accumulation
    inc/t with the >= 0 clamp, until the register sum fixes. The
    register merge is order-free max and the estimate/accumulate
    arithmetic is the identical numpy expression, so the distributed
    loop walks bit-identical floats."""
    from ..functions.minhash import fnv1a_batch
    from ..functions.sketches import hll_estimate_rows, splitmix64

    src_key = f"{os.path.abspath(sf_dir)}|hyperball|{p}|{max_rounds}"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    m = 1 << p
    V = len(nodes)
    ids = fnv1a_batch(pa.array(nodes, pa.string())).view(np.int64)
    # distinct directed non-self edges in node-index space
    pairs = sorted({(int(s), int(d)) for s, d in zip(src_i, dst_i) if s != d})
    src = np.array([a for a, _ in pairs], dtype=np.int64)
    dst = np.array([b for _, b in pairs], dtype=np.int64)
    regs = np.zeros((V, m), dtype=np.uint8)
    h = splitmix64(ids)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) & np.uint64((1 << 64) - 1)
    from ..functions.sketches import _clz64

    rank = np.minimum(_clz64(w) + 1, 64 - p + 1).astype(np.uint8)
    regs[np.arange(V), idx] = rank
    prev = hll_estimate_rows(regs)
    harm = np.zeros(V, dtype=np.float64)
    prev_total = int(regs.astype(np.int64).sum())
    for t_round in range(1, max_rounds + 1):
        new = regs.copy()
        # fold every in-edge (u -> v): new[v] = max(new[v], regs[u])
        order = np.argsort(dst, kind="mergesort")
        d_s, s_s = dst[order], src[order]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        ends = np.r_[starts[1:], len(d_s)]
        for a, b in zip(starts, ends):
            v = d_s[a]
            new[v] = np.maximum(
                np.maximum.reduce(regs[s_s[a:b]], axis=0), new[v]
            )
        regs = new
        est = hll_estimate_rows(regs)
        inc = np.maximum(est - prev, 0.0)
        harm = harm + inc / float(t_round)
        prev = est
        cur_total = int(regs.astype(np.int64).sum())
        if cur_total == prev_total:
            break
        prev_total = cur_total
    out = pa.table(
        {
            "host": pa.array(nodes, pa.string()),
            "harmonic": pa.array(np.round(harm, 6), pa.float64()),
            "reach_in": pa.array(np.round(prev, 6), pa.float64()),
        }
    )
    return _write_atomic(out, path, src_key)


HYPERANF_ORACLE_PATH = "/tmp/ccray_oracle_hyperanf.parquet"


def oracle_hyperanf_table(
    sf_dir: str,
    path: str = HYPERANF_ORACLE_PATH,
    p: int = 8,
    max_rounds: int = 32,
) -> str:
    """Sequential HyperANF neighborhood function over the same host
    edge set: the oracle_hyperball loop, collecting after init and
    after every round the exact integer-unit global sum
    rint(est * 1e6) — the identical order-free quantity the
    distributed loop collects, so (t, nreach, frac) match bit-for-bit."""
    from ..functions.minhash import fnv1a_batch
    from ..functions.sketches import _clz64, hll_estimate_rows, splitmix64

    src_key = f"{os.path.abspath(sf_dir)}|hyperanf|{p}|{max_rounds}"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    m = 1 << p
    V = len(nodes)
    ids = fnv1a_batch(pa.array(nodes, pa.string())).view(np.int64)
    pairs = sorted({(int(s), int(d)) for s, d in zip(src_i, dst_i) if s != d})
    src = np.array([a for a, _ in pairs], dtype=np.int64)
    dst = np.array([b for _, b in pairs], dtype=np.int64)
    regs = np.zeros((V, m), dtype=np.uint8)
    h = splitmix64(ids)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) & np.uint64((1 << 64) - 1)
    rank = np.minimum(_clz64(w) + 1, 64 - p + 1).astype(np.uint8)
    regs[np.arange(V), idx] = rank

    def units(r):
        return int(np.rint(hll_estimate_rows(r) * 1e6).astype(np.int64).sum())

    collected = [(0, units(regs))]
    prev_total = int(regs.astype(np.int64).sum())
    for t_round in range(1, max_rounds + 1):
        new = regs.copy()
        order = np.argsort(dst, kind="mergesort")
        d_s, s_s = dst[order], src[order]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        ends = np.r_[starts[1:], len(d_s)]
        for a, b in zip(starts, ends):
            v = d_s[a]
            new[v] = np.maximum(np.maximum.reduce(regs[s_s[a:b]], axis=0), new[v])
        regs = new
        collected.append((t_round, units(regs)))
        cur_total = int(regs.astype(np.int64).sum())
        if cur_total == prev_total:
            break
        prev_total = cur_total
    final = collected[-1][1] if collected else 0
    out = pa.table(
        {
            "t": pa.array([t for t, _ in collected], pa.int64()),
            "nreach": pa.array(
                [round(u / 1e6, 6) for _, u in collected], pa.float64()
            ),
            "frac": pa.array(
                [round(u / final, 6) if final else 0.0 for _, u in collected],
                pa.float64(),
            ),
        }
    )
    return _write_atomic(out, path, src_key)


WINNOW_DUP_FRAC_ORACLE_PATH = "/tmp/ccray_oracle_winnow_dupfrac.parquet"


def oracle_winnow_dup_frac_table(
    sf_dir: str,
    path: str = WINNOW_DUP_FRAC_ORACLE_PATH,
    k: int = 16,
    w: int = 8,
) -> str:
    """Sequential soft-dedup fold sharing only the winnow_hashes
    kernel: per-doc distinct fingerprint sets, a global Counter of
    docs per fingerprint, then per doc the shared count and
    fraction."""
    from collections import Counter

    from ..functions.minhash import winnow_hashes

    src_key = f"{os.path.abspath(sf_dir)}|winnow_dupfrac|{k}|{w}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    fps: dict[int, np.ndarray] = {}
    occ: Counter = Counter()
    for i, txt in zip(ids, texts):
        g = winnow_hashes(txt or "", k=k, w=w)
        if g.size == 0:
            continue
        fps[i] = g.view(np.int64)
        occ.update(fps[i].tolist())
    rows = {"doc_id": [], "n_fps": [], "n_shared": [], "dup_frac": []}
    for i in sorted(fps):
        g = fps[i]
        n = int(g.size)
        s = int(sum(1 for h in g.tolist() if occ[h] >= 2))
        rows["doc_id"].append(i)
        rows["n_fps"].append(n)
        rows["n_shared"].append(s)
        rows["dup_frac"].append(round(s / max(n, 1), 6))
    out = pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "n_fps": pa.array(rows["n_fps"], pa.int64()),
            "n_shared": pa.array(rows["n_shared"], pa.int64()),
            "dup_frac": pa.array(rows["dup_frac"], pa.float64()),
        }
    )
    return _write_atomic(out, path, src_key)


BOWTIE_ORACLE_PATH = "/tmp/ccray_oracle_bowtie.parquet"


def oracle_bowtie_table(sf_dir: str, path: str = BOWTIE_ORACLE_PATH) -> str:
    """Sequential pivot-based bow-tie decomposition over the same
    host edge set: max-(in+out)-degree pivot (host-string tiebreak),
    two plain BFS reachability sets, SCC/IN/OUT/OTHER labels."""
    from collections import deque

    src_key = f"{os.path.abspath(sf_dir)}|bowtie"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    pairs = sorted({(int(s), int(d)) for s, d in zip(src_i, dst_i) if s != d})
    fwd: dict[int, list[int]] = {}
    bwd: dict[int, list[int]] = {}
    deg: dict[int, int] = {}
    for s, d in pairs:
        fwd.setdefault(s, []).append(d)
        bwd.setdefault(d, []).append(s)
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    pivot = min(deg, key=lambda v: (-deg[v], nodes[v]))

    def bfs(adj):
        seen = {pivot}
        q = deque([pivot])
        while q:
            x = q.popleft()
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    q.append(y)
        return seen

    F, B = bfs(fwd), bfs(bwd)
    labs = []
    for i in range(len(nodes)):
        if i in F and i in B:
            labs.append("SCC")
        elif i in F:
            labs.append("OUT")
        elif i in B:
            labs.append("IN")
        else:
            labs.append("OTHER")
    out = pa.table(
        {
            "host": pa.array(nodes, pa.string()),
            "bowtie": pa.array(labs, pa.string()),
        }
    )
    return _write_atomic(out, path, src_key)


SEED_DISTANCE_ORACLE_PATH = "/tmp/ccray_oracle_seed_distance.parquet"


def oracle_seed_distance_table(
    sf_dir: str, path: str = SEED_DISTANCE_ORACLE_PATH
) -> str:
    """Sequential multi-source BFS from the crawl seed hosts over the
    same host edge set: dist 0 at seeds present in the graph, -1 for
    unreachable hosts."""
    from collections import deque

    from ..sources.synth import get_universe, sf_from_dir
    from ..stages.pagerank import _host_of

    src_key = f"{os.path.abspath(sf_dir)}|seed_distance"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    sf = min(sf_from_dir(sf_dir), 0.01)
    seed_hosts = sorted(
        {h for h in (_host_of(u) for u in get_universe(sf).seed_urls()) if h}
    )
    idx = {h: i for i, h in enumerate(nodes)}
    fwd: dict[int, list[int]] = {}
    for s, d in zip(src_i, dst_i):
        if s != d:
            fwd.setdefault(int(s), []).append(int(d))
    dist = [-1] * len(nodes)
    q = deque()
    for h in seed_hosts:
        i = idx.get(h)
        if i is not None and dist[i] < 0:
            dist[i] = 0
            q.append(i)
    while q:
        x = q.popleft()
        for y in fwd.get(x, ()):
            if dist[y] < 0:
                dist[y] = dist[x] + 1
                q.append(y)
    out = pa.table(
        {
            "host": pa.array(nodes, pa.string()),
            "dist": pa.array(dist, pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


SCC_ORACLE_PATH = "/tmp/ccray_oracle_scc.parquet"


def oracle_scc_table(sf_dir: str, path: str = SCC_ORACLE_PATH) -> str:
    """Sequential iterative Tarjan SCC over the same host edge set;
    each component labeled by its lexicographically smallest host."""
    src_key = f"{os.path.abspath(sf_dir)}|scc"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    n = len(nodes)
    fwd: dict[int, list[int]] = {}
    for s, d in zip(src_i, dst_i):
        if s != d:
            fwd.setdefault(int(s), []).append(int(d))

    index = [-1] * n
    low = [0] * n
    on_stack = [False] * n
    stack: list[int] = []
    comp = [-1] * n
    counter = 0
    n_comp = 0
    for root in range(n):
        if index[root] >= 0:
            continue
        # iterative Tarjan: (node, iterator position) work stack
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            adv = False
            nbrs = fwd.get(v, ())
            for j in range(pi, len(nbrs)):
                w = nbrs[j]
                if index[w] < 0:
                    work[-1] = (v, j + 1)
                    work.append((w, 0))
                    adv = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if adv:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp[w] = n_comp
                    if w == v:
                        break
                n_comp += 1

    reps: dict[int, str] = {}
    sizes: dict[int, int] = {}
    for i in range(n):
        c = comp[i]
        sizes[c] = sizes.get(c, 0) + 1
        if c not in reps or nodes[i] < reps[c]:
            reps[c] = nodes[i]
    out = pa.table(
        {
            "host": pa.array(nodes, pa.string()),
            "scc": pa.array([reps[comp[i]] for i in range(n)], pa.string()),
            "scc_size": pa.array([sizes[comp[i]] for i in range(n)], pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


HOST_TEMPLATE_ORACLE_PATH = "/tmp/ccray_oracle_host_template.parquet"


def oracle_host_template_table(
    sf_dir: str, path: str = HOST_TEMPLATE_ORACLE_PATH
) -> str:
    """Sequential per-host dict fold of the template-gram census:
    per-doc distinct word-gram fingerprints (same gram kernel and
    width as the engine), host document frequencies, template
    threshold df >= ceil(0.5 * pages) with pages >= 3."""
    from . import queries as _q
    import pyarrow.compute as pc

    from ..functions.minhash import gram_fp_rows
    from ..sources.synth import pages_cache_dir, sf_from_dir

    src_key = f"{os.path.abspath(sf_dir)}|host_template|w={_q._TPL_W}"
    if _is_fresh(path, src_key):
        return path
    sf = min(sf_from_dir(sf_dir), 0.01)
    parsed = _sequential_parse(pages_cache_dir(sf), sf)
    hosts = parsed.column("host").to_pylist()
    texts = parsed.column("text")
    df: dict[str, dict[int, int]] = {}
    pages: dict[str, int] = {}
    B = 256
    for off in range(0, parsed.num_rows, B):
        chunk_hosts = hosts[off : off + B]
        toks = pc.split_pattern_regex(
            texts.slice(off, B).combine_chunks()
            if isinstance(texts, pa.ChunkedArray)
            else texts.slice(off, B),
            pattern=r"\s+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        d_idx, _pos, gfp = gram_fp_rows(toks, _q._TPL_W)
        per_doc: dict[int, set[int]] = {}
        for d, g in zip(d_idx.tolist(), gfp.tolist()):
            per_doc.setdefault(d, set()).add(g)
        for d, h in enumerate(chunk_hosts):
            pages[h] = pages.get(h, 0) + 1
            hd = df.setdefault(h, {})
            for g in per_doc.get(d, ()):
                hd[g] = hd.get(g, 0) + 1
    import math

    rows = []
    for h in sorted(pages):
        p = pages[h]
        grams = df.get(h, {})
        n = len(grams)
        thr = math.ceil(0.5 * p)
        tpl = sum(1 for c in grams.values() if p >= 3 and c >= thr)
        rows.append((h, p, n, tpl, round(tpl / max(n, 1), 6)))
    out = pa.table(
        {
            "host": pa.array([r[0] for r in rows], pa.string()),
            "pages": pa.array([r[1] for r in rows], pa.int64()),
            "n_grams": pa.array([r[2] for r in rows], pa.int64()),
            "n_template": pa.array([r[3] for r in rows], pa.int64()),
            "template_ratio": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    return _write_atomic(out, path, src_key)


SALSA_ORACLE_PATH = "/tmp/ccray_oracle_salsa.parquet"


def oracle_salsa_table(sf_dir: str, path: str = SALSA_ORACLE_PATH) -> str:
    """Sequential SALSA power iteration over the same host edge set:
    10 backward/forward degree-normalized half steps from the uniform
    authority distribution, 6-decimal rounding."""
    src_key = f"{os.path.abspath(sf_dir)}|salsa"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    n = len(nodes)
    src = np.asarray(src_i, dtype=np.int64)
    dst = np.asarray(dst_i, dtype=np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    indeg = np.bincount(dst, minlength=n).astype(np.float64)
    n_auth = int((indeg > 0).sum())
    a = np.where(indeg > 0, 1.0 / n_auth, 0.0)
    h = np.zeros(n)
    for _ in range(10):
        w = np.divide(a, indeg, out=np.zeros(n), where=indeg > 0)
        h = np.zeros(n)
        np.add.at(h, src, w[dst])
        w2 = np.divide(h, outdeg, out=np.zeros(n), where=outdeg > 0)
        a = np.zeros(n)
        np.add.at(a, dst, w2[src])
    out = pa.table(
        {
            "host": pa.array(nodes, pa.string()),
            "salsa_authority": pa.array(np.round(a, 6), pa.float64()),
            "salsa_hub": pa.array(np.round(h, 6), pa.float64()),
        }
    )
    return _write_atomic(out, path, src_key)


OPIC_ORACLE_PATH = "/tmp/ccray_oracle_opic.parquet"


def oracle_opic_table(sf_dir: str, path: str = OPIC_ORACLE_PATH) -> str:
    """Sequential synchronous-batch OPIC over the same host edge set:
    10 rounds of cash splitting over outdeg+1 links (the +1 is the
    virtual page), virtual cash returning uniformly, history
    accumulation; importance = hist / total hist, 6-decimal rounded.
    Applies updates identical to stages/pagerank.opic_edges."""
    src_key = f"{os.path.abspath(sf_dir)}|opic"
    if _is_fresh(path, src_key):
        return path
    nodes, src_i, dst_i = _sequential_host_edges(sf_dir)
    n = len(nodes)
    src = np.asarray(src_i, dtype=np.int64)
    dst = np.asarray(dst_i, dtype=np.int64)
    deg = np.bincount(src, minlength=n).astype(np.float64)
    cash = np.full(n, 1.0 / n) if n else np.zeros(0)
    hist = np.zeros(n)
    vc = 0.0
    for _ in range(10):
        w = cash / (deg + 1.0)
        virtual_in = float(w.sum())
        s = np.zeros(n)
        np.add.at(s, dst, w[src])
        hist = hist + cash
        cash = s + vc / n
        vc = virtual_in
    total = float(hist.sum())
    out = pa.table(
        {
            "host": pa.array(nodes, pa.string()),
            "opic": pa.array(
                np.round(hist / total if total > 0 else hist, 6), pa.float64()
            ),
        }
    )
    return _write_atomic(out, path, src_key)


CMS_ORACLE_PATH = "/tmp/ccray_oracle_cms.parquet"


def oracle_cms_table(sf_dir: str, path: str = CMS_ORACLE_PATH) -> str:
    """Sequential Count-Min oracle: global exact token counts folded
    into ONE CountMin (integer adds are order-free, so this is
    bit-identical to the engine's distributed tree reduce), estimates
    for the exact top-30 tokens by (-count, token). Shares only the
    pure tokenize/hash/sketch kernels."""
    src_key = f"{os.path.abspath(sf_dir)}|cms"
    if _is_fresh(path, src_key):
        return path
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..functions.minhash import fnv1a_batch
    from ..functions.sketches import CountMin

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    flat = pc.list_flatten(pc.split_pattern_regex(t.column("text"), pattern=r"\s+"))
    flat = flat.filter(pc.not_equal(flat, ""))
    vc = pc.value_counts(flat.combine_chunks())
    keys = vc.field("values").to_pylist()
    cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    cm = CountMin(4, 2048).add_hashed(
        fnv1a_batch(vc.field("values")), cnts
    )
    order = sorted(range(len(keys)), key=lambda i: (-cnts[i], keys[i]))[:30]
    probes = [keys[i] for i in order]
    est = cm.estimate_hashed(fnv1a_batch(pa.array(probes, pa.string())))
    out = pa.table(
        {
            "token": pa.array(probes, pa.string()),
            "cms_count": pa.array(est, pa.int64()),
        }
    )
    return _write_atomic(out, path, src_key)


def oracle_webtext_table(sf_dir: str, path: str = WEBTEXT_ORACLE_PATH) -> str:
    """Deterministic multi-line "web text" corpus derived from the
    documents table — the punctuated, line-structured input the C4
    cleaning rules (pipelines/queries.q_c4_clean) need in order to
    fire at realistic mixed rates: the sf documents are single-line
    punctuation-free token streams, over which every C4 line rule
    would be vacuously false. Every choice below is a splitmix64 hash
    of (doc_id, line_idx) — no RNG state — so the table is
    bit-identical across rebuilds and BOTH the Ray query and the
    DuckDB oracle read the SAME pinned parquet (the oracle_cdx_table
    pinned-source discipline).

    Per doc: tokens chunked into lines of 4..9 words; each line draws
    a terminal mark from a 10-way hash bucket ('.' x4, '!', '?', '"',
    none x3 — so ~30% of lines fail the terminal-punctuation rule);
    1 line in 17 gets a literal ``javascript`` token injected; docs
    hash-selected at ~1/31 carry a ``lorem ipsum`` line and ~1/29 an
    opening-brace code line — every rule of the C4 pass is exercised
    in both directions."""
    from ..functions.fingerprint import splitmix64

    src_key = f"{os.path.abspath(sf_dir)}|webtext|v1"
    if _is_fresh(path, src_key):
        return path
    ids, texts = _read_docs(sf_dir)
    out_texts: list[str] = []
    for did, text in zip(ids, texts):
        toks = text.split()
        lines: list[str] = []
        i = 0
        li = 0
        while i < len(toks):
            h = splitmix64((did << 20) | li, seed=0xC4C4) & _M64
            w = 4 + (h % 6)
            chunk = toks[i : i + w]
            i += w
            if (h >> 8) % 17 == 0:
                chunk.append("javascript")
            line = " ".join(chunk)
            p = (h >> 16) % 10
            if p < 4:
                line += "."
            elif p == 4:
                line += "!"
            elif p == 5:
                line += "?"
            elif p == 6:
                line += '"'
            lines.append(line)
            li += 1
        hd = splitmix64(did, seed=0xD0C5) & _M64
        if hd % 31 == 0:
            lines.append("this page contains lorem ipsum filler text.")
        if hd % 29 == 3:
            lines.append("function() { var x = 1; } sample code line.")
        out_texts.append("\n".join(lines))
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(out_texts, pa.string()),
        }
    )
    return _write_atomic(t, path, src_key)


# --------------------------------------------------------------------
# distributed PCA oracle (stages/pca.py)
# --------------------------------------------------------------------

PCA_ORACLE_PATH = "/tmp/ccray_oracle_embedding_pca.parquet"


def oracle_pca_table(sf_dir: str, path: str = PCA_ORACLE_PATH, k: int = 4) -> str:
    """Sequential PCA sharing only the numeric kernels with
    stages/pca.py (quantize / components_from_moments / the per-row
    integer-dot projection formula); the moment accumulation here is
    one flat big-int fold, vs the distributed in-block-int64 +
    decimal-string merge tree there — exact integers either way, so
    the covariance floats, eigh output and per-row projections are
    bit-identical by construction."""
    import numpy as np

    from ..stages.pca import QSCALE, components_from_moments, quantize

    src_key = f"{os.path.abspath(sf_dir)}|pca|{k}|v1"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t.column("vec_id").to_pylist()
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    q = quantize(mat)
    n = q.shape[0]
    s = [int(v) for v in q.sum(axis=0)]
    g = [int(v) for v in (q.T @ q).reshape(-1)]
    mean, comps, _ratio = components_from_moments(n, s, g, k)
    qv = quantize(comps)
    dots = q @ qv.T
    cent = (mean * QSCALE) @ qv.T.astype(np.float64)
    proj = (dots.astype(np.float64) - cent) / (QSCALE * QSCALE)
    cols = {"vec_id": pa.array(ids, pa.int64())}
    for j in range(comps.shape[0]):
        cols[f"pc{j + 1}"] = pa.array(np.round(proj[:, j], 6), pa.float64())
    return _write_atomic(pa.table(cols), path, src_key)


# --------------------------------------------------------------------
# margin-based bitext mining oracle (stages/bitext.py)
# --------------------------------------------------------------------

BITEXT_ORACLE_PATH = "/tmp/ccray_oracle_bitext.parquet"


def oracle_bitext_table(
    sf_dir: str,
    path: str = BITEXT_ORACLE_PATH,
    k_neighbors: int = 4,
    threshold: float = 1.0,
    n_clusters: int = 8,
    iters: int = 4,
) -> str:
    """Sequential margin-based bitext mining sharing the numeric
    kernels (assign_rounded / centroids_from_sums / quantize and the
    whole per-cluster ``mine_block``) with stages/bitext.py. The fit
    walks the same integer-exact centroid trajectory as the
    distributed k-means (same init rule, same order-free sums), and
    the per-cluster miner is the identical function, so a value-hash
    match isolates the Ray plumbing (assign pass, pre-sort cap drop,
    sort co-partition)."""
    import numpy as np

    from ..functions.sketches import knuth32
    from ..functions.vec import list_to_matrix
    from ..stages.bitext import mine_block
    from ..stages.semdedup import (
        _norm_rows,
        assign_rounded,
        centroids_from_sums,
        quantize,
    )

    src_key = (
        f"{os.path.abspath(sf_dir)}|bitext|{k_neighbors}|{threshold}"
        f"|{n_clusters}|{iters}|v1"
    )
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
    )
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    sides = (
        np.asarray(t.column("label").to_pylist(), dtype=np.int64) % 2
    ).astype(np.int8)
    xn = _norm_rows(list_to_matrix(t.column("embedding")))
    dim = xn.shape[1]
    k = n_clusters
    if len(ids) > k:
        thresh = np.uint64(min(1 << 32, int(np.ceil((1 << 32) * 2.0 * k / len(ids)))))
        sel = np.sort(ids[knuth32(ids) < thresh])[:k]
    else:
        sel = np.sort(ids)
    pos = {int(v): i for i, v in enumerate(ids)}
    centroids = xn[[pos[int(s)] for s in sel]].copy()
    q = quantize(xn)
    for _ in range(iters):
        cl = assign_rounded(xn, centroids)
        counts = np.zeros(k, dtype=np.int64)
        np.add.at(counts, cl, 1)
        sums = np.zeros((k, dim), dtype=np.int64)
        np.add.at(sums, cl, q)
        centroids = centroids_from_sums(sums, counts, centroids)
    cl = assign_rounded(xn, centroids)
    src_all, tgt_all, mg_all = [], [], []
    for c in np.unique(cl):
        m = np.nonzero(cl == c)[0]
        src, tgt, mg = mine_block(
            ids[m], sides[m], q[m], k_neighbors, threshold
        )
        src_all += src
        tgt_all += tgt
        mg_all += mg
    out = pa.table(
        {
            "src_id": pa.array(np.asarray(src_all, dtype=np.int64)),
            "tgt_id": pa.array(np.asarray(tgt_all, dtype=np.int64)),
            "margin": pa.array(np.asarray(mg_all, dtype=np.float64)),
        }
    )
    return _write_atomic(out, path, src_key)


# --------------------------------------------------------------------
# HLL pairwise audience overlap oracle (stages/approx.hll_overlap_by_key)
# --------------------------------------------------------------------

HLL_OVERLAP_ORACLE_PATH = "/tmp/ccray_oracle_hll_overlap.parquet"


def oracle_hll_overlap_table(
    sf_dir: str, path: str = HLL_OVERLAP_ORACLE_PATH, p: int = 12
) -> str:
    """Single-process per-type HLL fold (the oracle_hll_by_type
    registers) piped through the SHARED pairwise set-algebra kernel
    (stages/approx.hll_pairwise_overlap). Registers merge by max =>
    the sequential fold's bytes equal the distributed combiner's
    bit-for-bit, so every pairwise estimate matches exactly."""
    from ..functions.sketches import HyperLogLog
    from ..stages.approx import hll_pairwise_overlap

    src_key = os.path.abspath(sf_dir) + f"|hll_overlap|p={p}"
    if _is_fresh(path, src_key):
        return path
    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    keys = t.column("event_type").to_pylist()
    vals = t.column("user_id").to_pylist()
    hlls: dict[str, HyperLogLog] = {}
    for k, v in zip(keys, vals):
        if k is None or v is None:
            continue
        hlls.setdefault(k, HyperLogLog(p)).add_ints(np.array([v], dtype=np.int64))
    return _write_atomic(hll_pairwise_overlap(hlls), path, src_key)
