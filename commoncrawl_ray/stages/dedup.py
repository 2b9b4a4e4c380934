"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference ships the sketch primitives (SimHash
``util/shared/SimHash.java``, shingle Jaccard ``util/shared/Shingle.java``,
bloom membership); the distributed shapes here are the added
training-data operators (prompt scope): each is a composition of
vectorized ``map_batches`` + ``groupby`` shuffles, never a driver loop.

Scale shapes:
- exact: content-hash column -> groupby(hash) -> keep min id. One
  shuffle keyed by the hash (SURVEY D1).
- MinHash+LSH: per-batch signatures -> explode to (band_id, band_hash,
  id) rows -> groupby((band_id, band_hash)) -> candidate pairs within
  buckets -> verify true Jaccard -> distinct pairs. Shuffle volume =
  bands × docs smallish rows, not O(n²).
- SimHash: 64-bit sketch column; near-dup buckets by rotated prefixes.
- embedding LSH: random-hyperplane signs bucket vectors; exact cosine
  verify within buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.minhash import MinHasher, band_hashes, jaccard, ngram_set

_DEFAULT_PERMS = 128
_DEFAULT_BANDS = 32
_NGRAM = 5


def exact_dedup(ds, id_col: str, text_col: str):
    """-> (text_hash, keeper, n) per distinct content."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table(
            {id_col: batch.column(id_col), "text_hash": pa.array(hashes, pa.string())}
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min(id_col, alias_name="keeper"), Count(alias_name="n"))
    )


class _SignatureStage:
    """Actor-pool stage: MinHasher permutations built once per actor."""

    def __init__(self, num_perm: int, bands: int, text_col: str, id_col: str):
        self.mh = MinHasher(num_perm)
        self.bands = bands
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, t in zip(ids, texts):
            sig = self.mh.signature_for_text(t or "", _NGRAM)
            bh = band_hashes(sig, self.bands)
            for b in range(self.bands):
                out_id.append(i)
                out_band.append(b)
                out_hash.append(int(bh[b]))
        return pa.table(
            {
                "id": pa.array(out_id, pa.int64()),
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
            }
        )


def minhash_lsh_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = _DEFAULT_PERMS,
    bands: int = _DEFAULT_BANDS,
    jaccard_threshold: float = 0.8,
):
    """-> distinct (id_a, id_b, jaccard) verified near-dup pairs.

    Candidate generation is fully distributed (band groupby); the
    verify step re-reads the two texts per candidate pair via a
    broadcast id->text map (fine while the distinct-candidate set is
    small relative to the corpus; at 100 TB swap the verify for a
    bucket-local join on a (id, shingle-set-sketch) side table).
    """
    import ray

    texts_df = ds.to_pandas()
    text_by_id = ray.put(dict(zip(texts_df[id_col], texts_df[text_col])))

    sigs = ds.map_batches(
        _SignatureStage,
        fn_constructor_args=(num_perm, bands, text_col, id_col),
        batch_format="pyarrow",
        concurrency=(1, 4),
        batch_size=512,
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["id"].unique())
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pd.DataFrame({"id_a": a_out, "id_b": b_out})

    cands = sigs.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    def verify(batch: pa.Table) -> pa.Table:
        lut = ray.get(text_by_id)
        a = batch.column("id_a").to_pylist()
        b = batch.column("id_b").to_pylist()
        seen = set()
        ja, jb, jj = [], [], []
        for x, y in zip(a, b):
            if (x, y) in seen:
                continue
            seen.add((x, y))
            j = jaccard(ngram_set(lut.get(x) or "", _NGRAM), ngram_set(lut.get(y) or "", _NGRAM))
            if j >= jaccard_threshold:
                ja.append(x)
                jb.append(y)
                jj.append(round(j, 6))
        return pa.table(
            {
                "id_a": pa.array(ja, pa.int64()),
                "id_b": pa.array(jb, pa.int64()),
                "jaccard": pa.array(jj, pa.float64()),
            }
        )

    verified = cands.map_batches(verify, batch_format="pyarrow")
    # cross-batch distinct (same pair can surface from multiple bands)
    def first_row(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return verified.groupby(["id_a", "id_b"]).map_groups(first_row, batch_format="pandas")


def simhash_near_dup(ds, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3):
    """SimHash near-dup pairs: bucket by the 4 16-bit sub-bands (any
    pair within hamming<=3 of 64 bits shares at least one exact 16-bit
    band by pigeonhole over 4 bands), verify hamming within buckets."""
    from ..functions.simhash import hamming, simhash_text_batch

    def add_sim(batch: pa.Table) -> pa.Table:
        sims = simhash_text_batch(batch.column(text_col).to_pylist())
        ids = batch.column(id_col)
        out_id, out_band, out_key, out_sim = [], [], [], []
        u = sims.view(np.uint64)
        for b in range(4):
            key = ((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out_id.extend(ids.to_pylist())
            out_band.extend([b] * len(sims))
            out_key.extend(key.tolist())
            out_sim.extend(sims.tolist())
        return pa.table(
            {
                "id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "key": pa.array(out_key, pa.int64()),
                "simhash": pa.array(out_sim, pa.int64()),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("id").sort_values("id")
        ids = g["id"].to_numpy()
        sims = g["simhash"].to_numpy()
        a_out, b_out, h_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                h = hamming(int(sims[i]), int(sims[j]))
                if h <= max_hamming:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
                    h_out.append(h)
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "hamming": h_out})

    pairs = (
        ds.map_batches(add_sim, batch_format="pyarrow", batch_size=512)
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    def first_row(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(first_row, batch_format="pandas")


def embedding_lsh_neardup(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    threshold: float = 0.95,
    seed: int = 42,
):
    """Random-hyperplane LSH bucketing + exact cosine verify within
    buckets — the scale path for embedding near-dup (brute force is the
    baseline in pipelines/queries.q_embedding_neardup)."""
    rs = np.random.RandomState(seed)
    planes = rs.normal(size=(n_planes, dim)).astype(np.float64)

    def add_bucket(batch: pa.Table) -> pa.Table:
        mat = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        signs = (mat @ planes.T) > 0
        bucket = np.zeros(len(mat), dtype=np.int64)
        for b in range(n_planes):
            bucket |= signs[:, b].astype(np.int64) << b
        return pa.table(
            {
                "id": batch.column(id_col),
                "bucket": pa.array(bucket),
                "vec": batch.column(vec_col),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["id"].to_numpy()
        mat = np.array(list(group["vec"]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1
        mat = mat / norms[:, None]
        sims = mat @ mat.T
        a_out, b_out, s_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] > threshold:
                    a, b = int(ids[i]), int(ids[j])
                    if a > b:
                        a, b = b, a
                    a_out.append(a)
                    b_out.append(b)
                    s_out.append(round(float(sims[i, j]), 6))
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "sim": s_out})

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=1024)
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
