"""DUST rule mining — "Do not crawl in the DUST: different URLs with
similar text" (Bar-Yossef, Keidar & Schonfeld, WWW 2007).

A crawler that has seen the same content under several URLs can LEARN
the site's rewrite rules (``?print=1`` suffixes, ``/index.html``
defaults, path-vs-query aliases) and canonicalize *before* fetching —
saving the duplicate fetches outright. The reference canonicalizes
with a fixed spec (sessionid strip, case, escapes — SURVEY §2.2
P9-P11); DUST is the data-driven complement that discovers
site-specific alias structure from the crawl's own (url, content
digest) evidence.

Algorithm (the paper's substring-substitution core):

1. group URLs by content digest;
2. within a group, each lexicographically ordered URL pair (u1 < u2)
   yields a candidate rule: strip the longest common prefix and the
   longest common suffix (clamped so they never overlap), the two
   remaining middles are the rule (alpha -> beta);
3. count support per rule across the corpus and keep rules with
   support >= ``min_support`` — alias structure generalizes across
   pages, one-off coincidences don't.

Scale shape: ONE ``sort(digest)`` range exchange co-partitions digest
groups (equal keys land in one block — the repo's standing sort
guarantee); per-group pair emission is capped at ``max_group`` URLs
with asserted skip counters (the dedup-family cap rule: a viral
payload shared by 10^5 URLs must not emit 10^10 pairs); rules are
pre-aggregated per batch before ONE rule-scale groupby. URLs ride the
wire once; the rule table is tiny.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa


def pair_rule(u1: str, u2: str) -> tuple[str, str]:
    """Candidate substitution rule from one same-content URL pair
    (u1 < u2 lexicographically): (alpha, beta) = the middles left
    after stripping the longest common prefix and the longest common
    suffix, with the suffix clamped so prefix+suffix never overlap on
    either URL."""
    n1, n2 = len(u1), len(u2)
    lim = min(n1, n2)
    p = 0
    while p < lim and u1[p] == u2[p]:
        p += 1
    s = 0
    while s < lim - p and u1[n1 - 1 - s] == u2[n2 - 1 - s]:
        s += 1
    return u1[p : n1 - s], u2[p : n2 - s]


def group_rules(urls: list[str], max_group: int) -> Counter | None:
    """All pair rules within one digest group (None = group over cap,
    caller counts the skip). The cap applies to DISTINCT urls — a
    crawl's evidence repeats sightings, and 100 sightings of 2 aliases
    is one pair, not an over-wide group."""
    us = sorted(set(urls))
    if len(us) < 2:
        return Counter()
    if len(us) > max_group:
        return None
    out: Counter = Counter()
    for i in range(len(us) - 1):
        for j in range(i + 1, len(us)):
            out[pair_rule(us[i], us[j])] += 1
    return out


def _rules_block(t: pa.Table, max_group: int) -> pa.Table:
    """sort(digest) co-partitioned block -> per-batch pre-aggregated
    (alpha, beta, n) partial counts."""
    from ..state.counters import count_skip

    if len(t) == 0:
        return pa.table(
            {
                "alpha": pa.array([], pa.string()),
                "beta": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    dig = t.column("digest").to_numpy(zero_copy_only=False)
    urls = t.column("url").to_pylist()
    order = np.argsort(dig, kind="stable")
    dig = dig[order]
    starts = np.flatnonzero(np.r_[True, dig[1:] != dig[:-1]])
    ends = np.r_[starts[1:], len(dig)]
    agg: Counter = Counter()
    skipped = skip_rows = 0
    for s, e in zip(starts, ends):
        rules = group_rules([urls[order[k]] for k in range(s, e)], max_group)
        if rules is None:
            skipped += 1
            skip_rows += e - s
            continue
        agg.update(rules)
    if skipped:
        count_skip("dust", buckets=skipped, rows=skip_rows)
    items = sorted(agg.items())
    return pa.table(
        {
            "alpha": pa.array([a for (a, _b), _n in items], pa.string()),
            "beta": pa.array([b for (_a, b), _n in items], pa.string()),
            "n": pa.array([n for _ab, n in items], pa.int64()),
        }
    )


def mine_dust_rules(url_digest_ds, min_support: int = 3, max_group: int = 64):
    """(url, digest) Dataset -> (alpha, beta, support) rules with
    support >= min_support. One sort exchange + one rule-scale
    groupby."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    sums = (
        url_digest_ds.sort("digest")
        .map_batches(
            lambda t: _rules_block(t, max_group),
            batch_format="pyarrow",
            batch_size=None,
        )
        .groupby(["alpha", "beta"])
        .aggregate(Sum("n", alias_name="support"))
    )
    return sums.map_batches(
        lambda t: pa.table(
            {
                "alpha": t.column("alpha"),
                "beta": t.column("beta"),
                "support": t.column("support").cast(pa.int64()),
            }
        ).filter(pc.greater_equal(t.column("support"), min_support)),
        batch_format="pyarrow",
    )


# --- deterministic alias universe (test/bench input) ------------------

ALIAS_KINDS = 4  # php-query, bare, /index.html, ?print=1


def alias_rows(doc_id: int, text: str) -> tuple[list[str], list[str]]:
    """The four systematic aliases of one document, all serving the
    same content — the evidence a real crawl accumulates. Digest is
    doc-unique (id || text) so alias groups never merge across docs.
    -> (urls, digests)."""
    import hashlib

    base = f"http://site{doc_id % 20}.com/story/{doc_id}"
    prefix = base[: base.rfind("/")]
    urls = [
        f"{prefix}.php?id={doc_id}",
        base,
        f"{base}/index.html",
        f"{base}?print=1",
    ]
    d = hashlib.md5(f"{doc_id}|{text}".encode()).hexdigest()
    return urls, [d] * len(urls)
