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
