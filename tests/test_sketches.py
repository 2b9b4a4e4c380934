"""SimHash / MinHash / textstats kernel tests."""

import numpy as np

from commoncrawl_ray.functions.minhash import (
    MinHasher,
    band_hashes,
    char_shingle_jaccard,
    jaccard,
    ngram_set,
)
from commoncrawl_ray.functions.simhash import hamming, simhash_bytes, simhash_text
from commoncrawl_ray.functions.textstats import (
    detect_language,
    doc_fingerprint,
    quality_score,
    quality_stats,
    token_count_bpeish,
    token_count_ws,
)


def test_simhash_similarity():
    a = "the quick brown fox jumps over the lazy dog " * 10
    b = a.replace("lazy", "sleepy")
    c = "completely different content about astrophysics and galaxies " * 10
    assert hamming(simhash_text(a), simhash_text(b)) < 18
    assert hamming(simhash_text(a), simhash_text(c)) > 22
    assert simhash_text(a) == simhash_text(a)  # deterministic
    assert simhash_text("abc") == 0  # < 4 chars


def test_simhash_bytes_deterministic():
    data = b"some binary content with repetition " * 20
    assert simhash_bytes(data) == simhash_bytes(data)
    assert simhash_bytes(b"short") == 0
    # includes negative bytes (sign-extension path)
    assert isinstance(simhash_bytes(bytes(range(256)) * 4), int)


def test_minhash_jaccard_estimate():
    mh = MinHasher(256)
    a = "the quick brown fox jumps over the lazy dog and runs far away today " * 5
    b = a + " extra trailing words appended here"
    sa, sb = mh.signature_for_text(a), mh.signature_for_text(b)
    est = (sa == sb).mean()
    true = jaccard(ngram_set(a), ngram_set(b))
    assert abs(est - true) < 0.15
    bh = band_hashes(sa, 16)
    assert bh.shape == (16,)
    # identical docs share all band hashes
    assert (band_hashes(mh.signature_for_text(a), 16) == bh).all()


def test_char_shingle_jaccard():
    assert char_shingle_jaccard("abcdef", "abcdef") == 1.0
    assert char_shingle_jaccard("abcdef", "uvwxyz") == 0.0


def test_textstats():
    assert token_count_ws("a b  c") == 3
    assert token_count_bpeish("Hello, world!") == 4
    s = quality_stats("The cat and the dog. They ran to the house.")
    assert s["n_words"] == 10 and 0.3 < s["stopword_ratio"] <= 0.8
    assert quality_score("the cat sat on the mat and then it ran away quickly") == 1.0
    assert detect_language("the cat and the dog went to the market") == "en"
    assert detect_language("der Hund und die Katze sind nicht da") == "de"
    assert detect_language("これは日本語のテキストです") == "ja"
    assert detect_language("Это русский текст и он не короткий") == "ru"
    assert detect_language("12345") == "und"


def test_doc_fingerprint():
    a = "lorem ipsum dolor sit amet " * 30
    b = "a totally different document body with other words " * 30
    assert doc_fingerprint(a) == doc_fingerprint(a)
    # winnowing is intentionally robust to tiny appends; different docs differ
    assert doc_fingerprint(a) != doc_fingerprint(b)
    assert doc_fingerprint("short") == doc_fingerprint("short")
    assert doc_fingerprint("short") != doc_fingerprint("shorp")
