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


# --- mergeable summary sketches (functions/sketches.py) ---------------


def test_hll_accuracy_merge_invariance_and_serde():
    from commoncrawl_ray.functions.sketches import HyperLogLog

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 62, 200_000)
    uniq = len(np.unique(vals))
    whole = HyperLogLog(14).add_ints(vals)
    est = whole.estimate()
    assert abs(est - uniq) / uniq < 0.03  # ~1.04/sqrt(2^14) std err
    # merge in arbitrary order == sequential fold, bit-identical
    parts = [HyperLogLog(14).add_ints(c) for c in np.array_split(vals, 7)]
    acc = parts[3]
    for i in (6, 0, 5, 1, 4, 2):
        acc.merge(parts[i])
    assert acc.estimate() == est
    assert (acc.registers == whole.registers).all()
    assert HyperLogLog.from_bytes(whole.to_bytes()).estimate() == est
    # small-range linear counting
    small = HyperLogLog(14).add_ints(np.arange(100))
    assert abs(small.estimate() - 100) < 3


def test_spacesaving_exact_mode_and_overestimate_bound():
    from commoncrawl_ray.functions.sketches import SpaceSaving

    a = SpaceSaving(16).add_counted(["a", "b", "c"], [20, 30, 5])
    b = SpaceSaving(16).add_counted(["a", "c", "d"], [30, 5, 5])
    a.merge(SpaceSaving.from_bytes(b.to_bytes()))
    assert a.top(4) == [("a", 50, 0), ("b", 30, 0), ("c", 10, 0), ("d", 5, 0)]
    # under capacity: counts never underestimate; err bounds the excess
    s = SpaceSaving(2)
    for k, w in [("a", 50), ("b", 30), ("c", 10), ("d", 5)]:
        s.add_counted([k], [w])
    (k0, c0, e0), *_ = s.top(1)
    assert c0 >= 50 and c0 - e0 <= 50


def test_kll_exact_mode_matches_percentile_disc_and_bounds_rank_error():
    from commoncrawl_ray.functions.sketches import KLLSketch

    rng = np.random.default_rng(11)
    v = rng.normal(size=5000)
    sv = np.sort(v)
    exact = KLLSketch(8192).add(v)
    for q in (0.1, 0.5, 0.95, 0.99):
        assert exact.quantile(q) == sv[int(np.ceil(q * len(v))) - 1]
    # exact mode is merge-order independent (never compacts)
    parts = [KLLSketch(8192).add(c) for c in np.array_split(v, 5)]
    m = parts[2]
    for i in (4, 0, 3, 1):
        m.merge(KLLSketch.from_bytes(parts[i].to_bytes()))
    assert m.quantile(0.5) == exact.quantile(0.5)
    # approximate mode: bounded rank error under many merges
    vv = rng.normal(size=100_000)
    svv = np.sort(vv)
    ks = [KLLSketch(512).add(c) for c in np.array_split(vv, 23)]
    acc = ks[11]
    for i in range(23):
        if i != 11:
            acc.merge(ks[i])
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        rank = np.searchsorted(svv, acc.quantile(q)) / len(vv)
        assert abs(rank - q) < 0.02, (q, rank)


def test_countmin_properties():
    """CMS never undercounts; is exact when width >> distinct keys;
    tree merge of arbitrary splits is bit-identical to one fold."""
    import numpy as np
    from commoncrawl_ray.functions.minhash import fnv1a_batch
    from commoncrawl_ray.functions.sketches import CountMin
    import pyarrow as pa

    rs = np.random.RandomState(3)
    keys = [f"tok{i}" for i in range(300)]
    counts = rs.randint(1, 50, len(keys)).astype(np.int64)
    h = fnv1a_batch(pa.array(keys, pa.string()))

    wide = CountMin(4, 1 << 14).add_hashed(h, counts)
    assert np.array_equal(wide.estimate_hashed(h), counts)  # exact

    narrow = CountMin(4, 128).add_hashed(h, counts)
    assert (narrow.estimate_hashed(h) >= counts).all()  # one-sided

    # merge determinism: three arbitrary splits == one fold
    merged = CountMin(4, 128)
    for lo, hi in ((0, 70), (70, 200), (200, 300)):
        merged.merge(CountMin(4, 128).add_hashed(h[lo:hi], counts[lo:hi]))
    assert np.array_equal(merged.table, narrow.table)

    # serialization round-trip
    back = CountMin.from_bytes(narrow.to_bytes())
    assert np.array_equal(back.table, narrow.table)


def test_hll_pairwise_overlap_tracks_truth():
    """HLL set algebra (stages/approx.hll_pairwise_overlap): union via
    register max is exact-HLL; intersection by inclusion-exclusion
    tracks the true overlap within the p=12 error envelope."""
    import numpy as np

    from commoncrawl_ray.functions.sketches import HyperLogLog
    from commoncrawl_ray.stages.approx import hll_pairwise_overlap

    a = HyperLogLog(12).add_ints(np.arange(0, 6000, dtype=np.int64))
    b = HyperLogLog(12).add_ints(np.arange(4000, 10000, dtype=np.int64))
    c = HyperLogLog(12).add_ints(np.arange(20000, 21000, dtype=np.int64))
    t = hll_pairwise_overlap({"a": a, "b": b, "c": c})
    rows = {
        (r["key_a"], r["key_b"]): r
        for r in t.to_pylist()
    }
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = rows[("a", "b")]
    assert abs(ab["union_est"] - 10000) / 10000 < 0.1
    assert abs(ab["intersection_est"] - 2000) / 2000 < 0.25
    assert 0 < ab["jaccard_est"] < 0.5
    # disjoint pair: intersection clamps near zero
    assert rows[("a", "c")]["intersection_est"] < 600
    # merging copies must not mutate the inputs
    assert abs(a.estimate() - 6000) / 6000 < 0.05
