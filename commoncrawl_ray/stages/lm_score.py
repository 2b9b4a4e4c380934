"""CCNet-style character-trigram language-model quality scoring.

The canonical Common Crawl LLM-prep pipeline (CCNet; Wenzek et al.
2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data") filters documents by the perplexity of a language model
trained on a trusted reference corpus — low-perplexity text reads like
the reference, high-perplexity text is boilerplate/gibberish.  This
module is the Ray-Data-first analogue with a deterministic, dependency
free model: an add-α-smoothed character-trigram LM over a fixed
39-symbol alphabet.

Scale shape (the part that matters at 100 TB):

- TRAIN is one ``map_batches`` pass emitting per-batch *partial* gram
  counts (``np.bincount`` over the dense gram-id space, then sparsified
  to (gram_id, count) rows) followed by ONE small
  ``groupby(gram_id).sum`` — the shuffle moves at most
  ``39**3 = 59,319`` rows per batch regardless of corpus size, and the
  merged model is bounded by the same constant.
- The fitted model (a ``59,319``-entry float64 log-prob table, ~475 KB)
  is broadcast once with ``ray.put`` and read by every scoring task —
  never re-shipped per batch.
- SCORE is a stateless ``map_batches`` pass: per document the text is
  vectorized to gram ids (numpy byte table lookup) and the
  negative-log-likelihood is one fancy-index + ``np.sum`` — no Python
  loop over characters.

Everything is exact-deterministic given the input (integer counts, a
fixed float64 expression for the log-prob table, per-document numpy
summation), so the distributed result value-hash-matches a sequential
single-process oracle bit for bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# Alphabet: 'a'-'z' -> 1..26 (case-folded), '0'-'9' -> 27..36,
# whitespace -> 0, other ASCII -> 37, non-ASCII -> 38.
K = 39
_OTHER_ASCII = 37
_NON_ASCII = 38

_BYTE_CODE = np.full(256, _NON_ASCII, dtype=np.int32)
for _b in range(128):
    _BYTE_CODE[_b] = _OTHER_ASCII
for _b in range(ord("a"), ord("z") + 1):
    _BYTE_CODE[_b] = _b - ord("a") + 1
for _b in range(ord("A"), ord("Z") + 1):
    _BYTE_CODE[_b] = _b - ord("A") + 1
for _b in range(ord("0"), ord("9") + 1):
    _BYTE_CODE[_b] = _b - ord("0") + 27
for _b in b" \t\n\r\x0b\x0c":
    _BYTE_CODE[_b] = 0

N_GRAMS = K * K * K  # dense trigram-id space (59,319)
ALPHA = 0.5  # add-alpha smoothing


def encode_text(s: str) -> np.ndarray:
    """Text -> int32 symbol codes. UTF-32 decode gives one element per
    code point; the 256-entry table maps ASCII, everything above is the
    single non-ASCII bucket (exactly how the table treats bytes >= 128,
    so clipping codepoints to 255 is lossless w.r.t. the alphabet)."""
    cp = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
    return _BYTE_CODE[np.minimum(cp, 255)]


def gram_ids(codes: np.ndarray) -> np.ndarray:
    """Symbol codes -> dense trigram ids (len-2 entries)."""
    if len(codes) < 3:
        return np.empty(0, dtype=np.int64)
    c = codes.astype(np.int64)
    return c[:-2] * (K * K) + c[1:-1] * K + c[2:]


def batch_gram_counts(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Partial combiner for one batch: (gram_id, count) sparse arrays.
    One ``np.bincount`` over the concatenated gram ids of the batch —
    the per-batch shuffle contribution is bounded by N_GRAMS rows no
    matter how many documents the batch holds."""
    parts = [gram_ids(encode_text(t)) for t in texts if t]
    if not parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    counts = np.bincount(np.concatenate(parts), minlength=N_GRAMS)
    nz = np.nonzero(counts)[0]
    return nz.astype(np.int64), counts[nz].astype(np.int64)


def logprob_table(gram: np.ndarray, count: np.ndarray) -> np.ndarray:
    """Merged (gram_id, count) -> dense float64 log P(c3 | c1 c2) with
    add-ALPHA smoothing over the K-symbol alphabet. A single fixed
    float64 expression, so any implementation that feeds it the same
    integer counts produces bit-identical doubles."""
    tri = np.zeros(N_GRAMS, dtype=np.float64)
    tri[gram] = count
    ctx = tri.reshape(K * K, K).sum(axis=1)  # context marginals
    return np.log(
        (tri + ALPHA) / np.repeat(ctx + ALPHA * K, K)
    )


def score_nll(text: str, logp: np.ndarray) -> tuple[int, float]:
    """Per-document negative log likelihood per gram. Returns
    (n_grams, mean_nll); documents shorter than one trigram score 0."""
    g = gram_ids(encode_text(text))
    if len(g) == 0:
        return 0, 0.0
    return len(g), float(-logp[g].sum() / len(g))


class LMScoreStage:
    """Actor-pool scoring stage: the broadcast log-prob table is
    fetched ONCE per actor in ``__init__`` (``ray.get`` of the
    ``ray.put`` handle), then every ``__call__`` scores a batch with
    numpy only."""

    def __init__(self, logp_ref):
        import ray

        self._logp = (
            ray.get(logp_ref) if not isinstance(logp_ref, np.ndarray) else logp_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        n_grams = np.zeros(n, dtype=np.int64)
        nll = np.zeros(n, dtype=np.float64)
        for i, t in enumerate(texts):
            n_grams[i], nll[i] = score_nll(t or "", self._logp)
        out = batch.drop_columns(["text"])
        out = out.append_column("n_grams", pa.array(n_grams))
        return out.append_column("nll", pa.array(np.round(nll, 6)))


def corpus_gram_counts(train_ds) -> tuple[np.ndarray, np.ndarray]:
    """Distributed trigram-count collection: the groupby moves only
    sparse (gram_id, partial_count) rows — bounded per batch by the
    N_GRAMS constant — and the merged counts are pulled to the driver
    (<= N_GRAMS rows, ~1 MB). Returns sparse (gram_id, count) int64
    arrays; every smoothing recipe (add-α, Kneser–Ney) is a pure
    driver-side expression over these exact integer counts."""

    def partials(t: pa.Table) -> pa.Table:
        g, c = batch_gram_counts(t.column("text").to_pylist())
        return pa.table({"gram_id": pa.array(g), "n": pa.array(c)})

    merged = (
        train_ds.map_batches(partials, batch_format="pyarrow")
        .groupby("gram_id")
        .sum("n")
    )
    tbl = merged.to_pandas()  # bounded: <= N_GRAMS rows
    return (
        tbl["gram_id"].to_numpy(dtype=np.int64),
        tbl["sum(n)"].to_numpy(np.int64),
    )


def train_char_lm(train_ds) -> np.ndarray:
    """Distributed trigram-count fit -> dense add-α log-prob table
    (one bounded exchange via :func:`corpus_gram_counts`, smoothing
    expression runs once on the driver)."""
    g, c = corpus_gram_counts(train_ds)
    return logprob_table(g, c)


# Fixed absolute discount for the interpolated Kneser–Ney table — the
# standard constant Chen & Goodman (1999) report as near-optimal; a
# FIXED constant (not a count-of-counts estimate) keeps the float
# expression independent of corpus pathologies (n1=n2=0) and therefore
# bit-deterministic for any input.
KN_DISCOUNT = 0.75


def kn_logprob_table(
    gram: np.ndarray, count: np.ndarray, discount: float = KN_DISCOUNT
) -> np.ndarray:
    """Merged (gram_id, count) -> dense float64 log P(w | u v) under
    interpolated Kneser–Ney smoothing (Kneser & Ney 1995; the
    formulation of Chen & Goodman 1999 §3 — the smoothing KenLM ships
    and CCNet's quality filter actually runs). Lower orders use
    CONTINUATION counts (in how many distinct contexts a gram appears),
    not raw frequencies — the property that makes KN the empirical
    best n-gram smoother.

    Everything is a fixed chain of vectorized float64 expressions over
    the dense (K,K,K) integer tensor, so any implementation that feeds
    it the same integer counts produces bit-identical doubles (the
    same contract as :func:`logprob_table`). Each conditional is a
    PROPER distribution: the discount mass removed from seen trigrams
    is exactly the backoff weight D·N1+(uv·)/c(uv·), and the base
    unigram gets an add-α floor so no probability is ever 0."""
    tri = np.zeros(N_GRAMS, dtype=np.float64)
    tri[gram] = count
    T = tri.reshape(K, K, K)  # T[u, v, w] = c(u v w)

    c_uv = T.sum(axis=2)  # c(u v ·)
    n1p_uv = (T > 0).sum(axis=2).astype(np.float64)  # N1+(u v ·)
    # continuation bigram counts: in how many left-contexts u was
    # (v, w) seen — the KN replacement for raw bigram frequency
    cont_vw = (T > 0).sum(axis=0).astype(np.float64)  # N1+(· v w)
    cont_v = cont_vw.sum(axis=1)  # N1+(· v ·)
    n1p_v = (cont_vw > 0).sum(axis=1).astype(np.float64)  # |{w: N1+(·vw)>0}|
    cont_w = (cont_vw > 0).sum(axis=0).astype(np.float64)  # N1+(· · w)
    cont_total = float((cont_vw > 0).sum())  # N1+(· · ·)

    # unigram continuation distribution with an add-α floor (never 0)
    p1 = (cont_w + ALPHA) / (cont_total + ALPHA * K)  # (K,)
    # bigram: discounted continuation counts interpolated with p1
    denom_v = np.where(cont_v > 0, cont_v, 1.0)[:, None]
    lam_v = (discount * n1p_v / np.where(cont_v > 0, cont_v, 1.0))[:, None]
    p2 = np.maximum(cont_vw - discount, 0.0) / denom_v + lam_v * p1[None, :]
    p2 = np.where(cont_v[:, None] > 0, p2, p1[None, :])  # unseen v -> p1
    # trigram: discounted raw counts interpolated with p2
    denom_uv = np.where(c_uv > 0, c_uv, 1.0)[:, :, None]
    lam_uv = (discount * n1p_uv / np.where(c_uv > 0, c_uv, 1.0))[:, :, None]
    p3 = np.maximum(T - discount, 0.0) / denom_uv + lam_uv * p2[None, :, :]
    p3 = np.where(c_uv[:, :, None] > 0, p3, p2[None, :, :])  # unseen uv -> p2
    return np.log(p3).reshape(N_GRAMS)


def train_char_lm_kn(train_ds, discount: float = KN_DISCOUNT) -> np.ndarray:
    """Distributed trigram-count fit -> dense interpolated-KN log-prob
    table. Identical bounded exchange to :func:`train_char_lm`; only
    the driver-side smoothing expression differs."""
    g, c = corpus_gram_counts(train_ds)
    return kn_logprob_table(g, c, discount)


def lm_score(score_ds, logp: np.ndarray, concurrency=(1, 8), batch_size: int = 256):
    """Score ``score_ds`` (needs ``text``; keeps every other column)
    with a broadcast model: ``ray.put`` once, each scoring actor
    ``ray.get``s the handle in ``__init__``."""
    import ray

    ref = ray.put(logp)
    return score_ds.map_batches(
        LMScoreStage,
        fn_constructor_kwargs={"logp_ref": ref},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def score_langs(g: np.ndarray, logp_matrix: np.ndarray) -> np.ndarray:
    """Per-language mean log-likelihood of one document's gram ids,
    rounded to 6 dp — THE shared classification kernel (both the
    distributed classifier and the sequential oracle call exactly
    this, so the float chains are identical and argmax cannot
    diverge). Returns (L,) rounded scores; empty docs score 0."""
    if len(g) == 0:
        return np.zeros(logp_matrix.shape[0])
    return np.round(logp_matrix[:, g].sum(axis=1) / len(g), 6)


def batch_gram_counts_by_lang(
    langs: list, texts: list
) -> tuple[list, np.ndarray, np.ndarray]:
    """Partial combiner: per-(lang) sparse gram counts for one batch —
    (lang_col, gram_col, count_col), bounded by n_langs * N_GRAMS rows
    per batch regardless of document count."""
    per_lang: dict[str, list] = {}
    for lang, t in zip(langs, texts):
        if t:
            per_lang.setdefault(lang, []).append(gram_ids(encode_text(t)))
    l_col: list[str] = []
    g_parts, c_parts = [], []
    for lang in sorted(per_lang):
        parts = [p for p in per_lang[lang] if len(p)]
        if not parts:
            continue
        counts = np.bincount(np.concatenate(parts), minlength=N_GRAMS)
        nz = np.nonzero(counts)[0]
        l_col.extend([lang] * len(nz))
        g_parts.append(nz.astype(np.int64))
        c_parts.append(counts[nz].astype(np.int64))
    if not g_parts:
        return [], np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return l_col, np.concatenate(g_parts), np.concatenate(c_parts)


def train_char_lm_by_lang(ds) -> tuple[list, np.ndarray]:
    """One streaming pass fits EVERY language's trigram LM: per-batch
    per-lang partial bincounts -> ONE groupby((lang, gram_id)).sum ->
    (sorted lang list, (L, N_GRAMS) float64 log-prob matrix). The
    merged table is bounded by n_langs * N_GRAMS rows."""
    def partials(t: pa.Table) -> pa.Table:
        l, g, c = batch_gram_counts_by_lang(
            t.column("lang").to_pylist(), t.column("text").to_pylist()
        )
        return pa.table(
            {
                "lang": pa.array(l, pa.string()),
                "gram_id": pa.array(g),
                "n": pa.array(c),
            }
        )

    merged = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["lang", "gram_id"])
        .sum("n")
        .to_pandas()
    )
    langs = sorted(merged["lang"].unique())
    mat = np.empty((len(langs), N_GRAMS), dtype=np.float64)
    for i, lang in enumerate(langs):
        sub = merged[merged["lang"] == lang]
        mat[i] = logprob_table(
            sub["gram_id"].to_numpy(np.int64), sub["sum(n)"].to_numpy(np.int64)
        )
    return langs, mat


class LangIdStage:
    """Actor-pool language classifier: broadcast (langs, logp matrix)
    fetched once per actor; per doc the shared score_langs kernel picks
    argmax (first max = alphabetically-lowest lang on rounded ties)."""

    def __init__(self, model_ref):
        import ray

        self._langs, self._mat = (
            ray.get(model_ref) if not isinstance(model_ref, tuple) else model_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        preds = []
        for t in texts:
            s = score_langs(gram_ids(encode_text(t or "")), self._mat)
            preds.append(self._langs[int(np.argmax(s))])
        out = batch.drop_columns(["text"])
        return out.append_column("lang_pred", pa.array(preds, pa.string()))


def lang_id_lm(ds, langs: list, mat: np.ndarray, concurrency=(1, 8), batch_size: int = 256):
    """Classify ``ds`` (needs text; keeps other columns) against the
    fitted per-language LMs (ray.put broadcast)."""
    import ray

    ref = ray.put((langs, mat))
    return ds.map_batches(
        LangIdStage,
        fn_constructor_kwargs={"model_ref": ref},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


class LMRatioStage:
    """Actor-pool DSIR scoring stage: TWO broadcast log-prob tables
    (target-domain LM, raw-corpus LM) fetched once per actor; every
    ``__call__`` scores a batch against both and emits the per-gram
    log importance ratio log p_target(x) - log p_raw(x) =
    nll_raw - nll_target (mean per gram, rounded 6 dp)."""

    def __init__(self, logp_t_ref, logp_s_ref):
        import ray

        self._lt = ray.get(logp_t_ref) if not isinstance(logp_t_ref, np.ndarray) else logp_t_ref
        self._ls = ray.get(logp_s_ref) if not isinstance(logp_s_ref, np.ndarray) else logp_s_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        n_grams = np.zeros(n, dtype=np.int64)
        ratio = np.zeros(n, dtype=np.float64)
        for i, t in enumerate(texts):
            g = gram_ids(encode_text(t or ""))
            if len(g):
                n_grams[i] = len(g)
                ratio[i] = (self._lt[g].sum() - self._ls[g].sum()) / len(g)
        out = batch.drop_columns(["text"])
        out = out.append_column("n_grams", pa.array(n_grams))
        return out.append_column("logratio", pa.array(np.round(ratio, 6)))


def lm_logratio(ds, logp_target: np.ndarray, logp_raw: np.ndarray,
                concurrency=(1, 8), batch_size: int = 256):
    """Score ``ds`` (needs text; keeps other columns) with both models
    broadcast once via ray.put."""
    import ray

    ref_t, ref_s = ray.put(logp_target), ray.put(logp_raw)
    return ds.map_batches(
        LMRatioStage,
        fn_constructor_kwargs={"logp_t_ref": ref_t, "logp_s_ref": ref_s},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
