"""Text analysis kernels: language-ID heuristic, quality scores, token
counts, rolling-hash document fingerprints.

These are the training-data-pipeline operators the prompt adds on top of
the reference inventory (SURVEY §2 scope extension). All are pure,
vectorizable-per-batch, and SQL-mirrorable for the correctness oracle
where feasible.
"""

from __future__ import annotations

import re

import numpy as np

# --- token counting ---------------------------------------------------

_WS_TOKEN = re.compile(r"\S+")
# BPE-ish: words, numbers, or single non-space symbols (GPT-2-style
# coarse pre-tokenizer shape)
_BPEISH = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def token_count_ws(text: str) -> int:
    return len(_WS_TOKEN.findall(text or ""))


def token_count_bpeish(text: str) -> int:
    return len(_BPEISH.findall(text or ""))


# --- quality scoring --------------------------------------------------

_STOPWORDS = frozenset(
    "the and of a to in is it that for on was with as be at by this have "
    "from or an are not but had his they you which one all were her she".split()
)
_PUNCT = frozenset(".,;:!?'\"()[]{}-")


def quality_stats(text: str) -> dict:
    """length / punctuation / stopword ratios (C4/Gopher-style rules)."""
    text = text or ""
    n_chars = len(text)
    words = text.lower().split()
    n_words = len(words)
    n_stop = sum(1 for w in words if w.strip("".join(_PUNCT)) in _STOPWORDS)
    n_punct = sum(1 for c in text if c in _PUNCT)
    mean_word_len = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_stop": n_stop,
        "n_punct": n_punct,
        "stopword_ratio": (n_stop / n_words) if n_words else 0.0,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "mean_word_len": mean_word_len,
    }


def quality_score(text: str) -> float:
    """Single scalar in [0,1]: crude but deterministic quality signal."""
    s = quality_stats(text)
    score = 1.0
    if s["n_words"] < 10:
        score *= 0.2
    if not 0.01 <= s["stopword_ratio"]:
        score *= 0.5
    if s["punct_ratio"] > 0.3:
        score *= 0.5
    if not 2.0 <= s["mean_word_len"] <= 12.0:
        score *= 0.5
    return score


# --- language id ------------------------------------------------------

# Tiny per-language marker sets (top function words). Deterministic
# n-gram/stopword heuristic; NOT a model. Covers the fixture languages.
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von"},
    "fr": {"le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "una", "por"},
    "ru": {"и", "в", "не", "на", "что", "с", "это", "как", "по", "из"},
}


def detect_language(text: str) -> str:
    """Heuristic language id over function-word hits + script ranges."""
    text = text or ""
    # script-range shortcuts
    for ch in text[:2000]:
        o = ord(ch)
        if 0x3040 <= o <= 0x30FF:
            return "ja"
        if 0x4E00 <= o <= 0x9FFF:
            return "zh"
        if 0xAC00 <= o <= 0xD7AF:
            return "ko"
    words = re.findall(r"[^\W\d_]+", text.lower()[:4000], re.UNICODE)
    if not words:
        return "und"
    best_lang, best_hits = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        hits = sum(1 for w in words if w in markers)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_hits == 0:
        # cyrillic fallback
        if any("Ѐ" <= c <= "ӿ" for c in text[:2000]):
            return "ru"
        return "und"
    return best_lang


# --- rolling-hash fingerprint ----------------------------------------

_B = 1000003
_MOD = (1 << 61) - 1


def doc_fingerprint(text: str, window: int = 64) -> int:
    """Rolling polynomial hash over char windows, combined by XOR of the
    min-k window hashes — a cheap winnowing-style document fingerprint
    (public technique: Schleimer et al., SIGMOD'03 winnowing)."""
    text = text or ""
    if len(text) <= window:
        h = 0
        for c in text:
            h = (h * _B + ord(c)) % _MOD
        return h
    # rolling hashes of every window
    vals = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    h = 0
    pw = pow(_B, window - 1, _MOD)
    hashes = np.empty(len(vals) - window + 1, dtype=np.int64)
    for i in range(window):
        h = (h * _B + int(vals[i])) % _MOD
    hashes[0] = h
    for i in range(1, len(vals) - window + 1):
        h = ((h - int(vals[i - 1]) * pw) * _B + int(vals[i + window - 1])) % _MOD
        hashes[i] = h
    # distinct min-k (duplicate windows in periodic text would cancel
    # under XOR otherwise)
    uniq = np.unique(hashes)
    k = min(8, uniq.size)
    out = 0
    for v in uniq[:k]:
        out ^= int(v)
    return out


# --- collocations ------------------------------------------------------


def pmi_scores(n_pair, n_w1, n_w2, n_pairs_total: int, n_tok_total: int):
    """Rounded pointwise mutual information shared by the distributed
    collocations query and its sequential oracle — the IDENTICAL
    float64 expression order on both sides (elementwise, no reduction,
    so distribution cannot perturb a bit):

        pmi = round( ln( (n_pair/N_pairs) / ((n_w1/N_tok)*(n_w2/N_tok)) ), 6 )

    Counts are exact int64; only this one expression touches floats
    (the determinism-toolkit discipline: round before any ranking).
    """
    p12 = np.asarray(n_pair, np.float64) / float(n_pairs_total)
    p1 = np.asarray(n_w1, np.float64) / float(n_tok_total)
    p2 = np.asarray(n_w2, np.float64) / float(n_tok_total)
    return np.round(np.log(p12 / (p1 * p2)), 6)
