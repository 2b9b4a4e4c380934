"""Distributed suffix ranking (prefix doubling) — the exact-substring
duplication primitive of Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better" (they build a suffix array of the
concatenated corpus to find every substring repeated >= 50 tokens; the
fixed-n-gram ops in stages/dedup.py and the passage family approximate
this with one window size).

Manber-Myers prefix doubling, Ray-Data-first: the corpus explodes to
(gid, token) position rows; level k assigns every FULL 2^k-token
window a canonical integer class id such that two windows share an id
iff their token sequences are EQUAL (no hashing — parity with the
sequential oracle is exact):

- level 0: class id of a window = the global rank of the first
  position row holding an equal token (global_sorted_rank over
  (token, gid), then min-rank per token class joined back);
- level k: a 2^k window is the pair of its two 2^(k-1) halves, both
  full — ONE shift merge_join (gid against gid + 2^(k-1)) fuses the
  half classes into r1*(n+1)+r2 (exact: class ids <= n, so the fused
  key is injective and fits int64 for any corpus under ~3e9
  positions), then the same rank/min/join discipline canonicalizes;
  windows whose second half is not full drop out via the inner join.

A window is DUPLICATED iff its class has >= 2 members (overlapping
self-repeats included — the paper's semantics). Per level the census
records, per doc, how many window positions are duplicated; the
per-doc longest duplicated window is the largest 2^k with a hit
(power-of-2 resolution — the doubling lattice; the paper's exact
arbitrary-length extension refines between levels with the same
tables).

Scale shape: every exchange is position-scale rows of 2-3 int64s
(tokens ride once, in the explode); per level ONE sort
(global_sorted_rank), ONE class-scale groupby, TWO merge_joins —
O(log max_len) levels total, the canonical O(n log n) suffix-array
construction cost expressed as Dataset exchanges. No stage ever needs
a whole class, document or level in one block. Driver traffic is the
O(num_blocks) summaries of global_sorted_rank plus one scalar per
level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# position encoding: gid = doc_id * 2^20 + pos. Window shifts stay
# inside a doc because docs are truncated to _MAX_DOC_TOKENS below, so
# pos + 2^max_level never reaches the next doc's gid space.
_POS_BITS = 20
_POS_MOD = 1 << _POS_BITS
_MAX_LEVEL_CAP = 10  # windows up to 1024 tokens
# hard truncation guard: without it a >= 2^20-token document would
# silently overflow into doc_id+1's gid range and the shift join would
# fuse windows ACROSS documents — corruption, not an error. Both the
# distributed explode and the sequential oracles truncate at the same
# constant, so parity holds by definition; truncations are counted.
_MAX_DOC_TOKENS = _POS_MOD - (1 << _MAX_LEVEL_CAP)


def _doc_tokens(text: str | None) -> list[str]:
    """The shared tokenizer + truncation guard (distributed explode
    AND sequential oracles — parity by construction)."""
    ws = (text or "").split()
    return ws[:_MAX_DOC_TOKENS] if len(ws) > _MAX_DOC_TOKENS else ws


def explode_tokens_batch(t: pa.Table) -> pa.Table:
    """documents(doc_id, text) -> (gid, tok) position rows (whitespace
    tokens, the corpus-wide tokenizer of the dedup family)."""
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    gids: list[int] = []
    toks: list[str] = []
    truncated = 0
    for d, x in zip(ids, texts):
        full = (x or "").split()
        if len(full) > _MAX_DOC_TOKENS:
            truncated += 1
            full = full[:_MAX_DOC_TOKENS]
        base = d * _POS_MOD
        gids.extend(base + p for p in range(len(full)))
        toks.extend(full)
    if truncated:
        from ..state.counters import count_skip

        count_skip("suffix_explode_truncated", rows=truncated)
    return pa.table(
        {
            "gid": pa.array(gids, pa.int64()),
            "tok": pa.array(toks, pa.string()),
        }
    )


def _canon_classes(rows, key_col: str):
    """(gid, <key>) Dataset -> (gid, cls, dup): cls = 1 + the number
    of rows strictly before the key's equality class in global key
    order (a canonical integer <= n, equal iff keys equal — the min
    global rank of the class), dup = class has >= 2 members.

    ONE sort(key) range exchange: equal keys co-locate in one block
    (the repo's standing sort guarantee, _distinct_sorted discipline),
    so class boundaries, sizes and the global base offset — shipped as
    O(num_blocks) (first_key, n) summaries through the driver, the
    global_sorted_rank discipline — are all block-local. No groupby,
    no join."""
    sorted_ds = rows.sort(key_col).materialize()

    def summary(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "k": t.column(key_col).slice(0, 0),
                    "_n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "k": t.column(key_col).slice(0, 1),
                "_n": pa.array([len(t)], pa.int64()),
            }
        )

    summ = sorted_ds.map_batches(
        summary, batch_format="pyarrow", batch_size=None
    ).take_all()
    summ.sort(key=lambda r: r["k"])
    offsets: dict = {}
    acc = 0
    for r in summ:
        offsets[r["k"]] = acc  # distinct blocks have disjoint key ranges
        acc += r["_n"]

    def classes_block(t: pa.Table, _offs=offsets) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "gid": pa.array([], pa.int64()),
                    "cls": pa.array([], pa.int64()),
                    "dup": pa.array([], pa.bool_()),
                }
            )
        base = _offs[t.column(key_col)[0].as_py()]
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks = k[order]
        new_run = np.r_[True, ks[1:] != ks[:-1]]
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        sizes = np.diff(np.r_[starts, len(ks)])
        cls_sorted = base + starts[run_id] + 1
        dup_sorted = sizes[run_id] >= 2
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        return pa.table(
            {
                "gid": t.column("gid"),
                "cls": pa.array(cls_sorted[inv], pa.int64()),
                "dup": pa.array(dup_sorted[inv]),
            }
        )

    return sorted_ds.map_batches(
        classes_block, batch_format="pyarrow", batch_size=None
    )


def _level_census(level_rows, k: int):
    """One (doc_id, level, n_dup_positions) row set from a level's
    (gid, cls, dup) table — per-batch pre-aggregated, then one
    doc-scale groupby happens in the caller's union."""

    def per_batch(t: pa.Table) -> pa.Table:
        gid = t.column("gid").to_numpy(zero_copy_only=False)
        dup = t.column("dup").to_numpy(zero_copy_only=False)
        doc = gid >> _POS_BITS
        docs_d = doc[dup]
        if len(docs_d) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "level": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        u, c = np.unique(docs_d, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(u, pa.int64()),
                "level": pa.array(np.full(len(u), k), pa.int64()),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    return level_rows.map_batches(per_batch, batch_format="pyarrow")


def window_class_levels(rows, max_level: int, parts: int = 8):
    """(gid, tok) position rows -> [(k, level_ds)] for k = 0..max_level
    (stopping early once no full window remains), level_ds = (gid,
    cls, dup) with cls canonical per 2^k-token window. The doubling
    loop shared by the census and the strip."""
    from .joins import merge_join

    n_total = rows.count()
    level = _canon_classes(rows, "tok").repartition(parts).materialize()
    out = [(0, level)]
    for k in range(1, max_level + 1):
        half = 1 << (k - 1)
        fuse_m = n_total + 1

        def shift_key(t: pa.Table, _h=half) -> pa.Table:
            return pa.table(
                {
                    "gid2": pa.array(
                        t.column("gid").to_numpy(zero_copy_only=False) - _h,
                        pa.int64(),
                    ),
                    "cls2": t.column("cls"),
                }
            )

        paired = merge_join(
            level.select_columns(["gid", "cls"]),
            level.map_batches(shift_key, batch_format="pyarrow"),
            left_on="gid",
            right_on="gid2",
            right_cols=["cls2"],
            how="inner",
        )

        def fuse(t: pa.Table, _m=fuse_m) -> pa.Table:
            c1 = t.column("cls").to_numpy(zero_copy_only=False)
            c2 = t.column("cls2").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "gid": t.column("gid"),
                    "key": pa.array(c1 * _m + c2, pa.int64()),
                }
            )

        # materialize BEFORE the emptiness check: fused is lazy, and
        # count() would otherwise execute the shift merge_join once
        # for the check and _canon_classes' sort would re-execute it —
        # the level's dominant exchange paid twice
        fused = paired.map_batches(fuse, batch_format="pyarrow").materialize()
        if fused.count() == 0:
            break
        level = _canon_classes(fused, "key").repartition(parts).materialize()
        out.append((k, level))
    return out


def dup_window_census(docs_ds, max_level: int = 7, parts: int = 8):
    """documents(doc_id, text) -> per-doc duplicated-window census:
    (doc_id, max_dup_len, n_dup_1, n_dup_8) where max_dup_len is the
    longest power-of-2 token window duplicated anywhere in the corpus
    (0 = the doc shares not even one token), n_dup_1 / n_dup_8 the
    duplicated-position counts at window sizes 1 and 8. Exact — no
    hashing anywhere on the class path."""
    from ray.data.aggregate import Max, Sum

    from .joins import merge_join

    # materialized: window_class_levels' n_total count and the level-0
    # sort would otherwise each run the explode (strip already does
    # this; same reasoning as the fused materialize inside the loop)
    rows = docs_ds.map_batches(
        explode_tokens_batch, batch_format="pyarrow"
    ).materialize()
    censuses = [
        _level_census(level, k)
        for k, level in window_class_levels(rows, max_level, parts)
    ]

    per_level = censuses[0]
    for c in censuses[1:]:
        per_level = per_level.union(c)
    per_level = per_level.materialize()

    def widen(t: pa.Table) -> pa.Table:
        lv = t.column("level").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "dup_len": pa.array((1 << lv.astype(np.int64))),
                "n1": pa.array(np.where(lv == 0, n, 0), pa.int64()),
                "n8": pa.array(np.where(lv == 3, n, 0), pa.int64()),
            }
        )

    agg = (
        per_level.map_batches(widen, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Max("dup_len", alias_name="max_dup_len"),
            Sum("n1", alias_name="n_dup_1"),
            Sum("n8", alias_name="n_dup_8"),
        )
    )
    # docs with zero duplicated windows at any level are absent from
    # the census — left-join the doc universe back with zeros
    doc_ids = docs_ds.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id")}),
        batch_format="pyarrow",
    )
    out = merge_join(
        doc_ids,
        agg,
        left_on="doc_id",
        right_on="doc_id",
        right_cols=["max_dup_len", "n_dup_1", "n_dup_8"],
        how="left",
    )

    def fill(t: pa.Table) -> pa.Table:
        def z(c):
            v = t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.array(np.nan_to_num(v, nan=0.0).astype(np.int64))

        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "max_dup_len": z("max_dup_len"),
                "n_dup_1": z("n_dup_1"),
                "n_dup_8": z("n_dup_8"),
            }
        )

    return out.map_batches(fill, batch_format="pyarrow")


def dup_window_strip(docs_ds, window_level: int = 3, parts: int = 8):
    """The Lee-et-al dedup step itself: remove every token covered by
    a duplicated 2^window_level-token window (default 8 — the
    dup_passage_strip width, here found by exact suffix ranking
    instead of a fixed gram dictionary). -> (doc_id, stripped_text,
    n_kept, n_stripped).

    Shape: the shared doubling lattice up to ``window_level`` (ONE
    sort per level + one shift join), duplicated window starts explode
    x2^k into covered positions (bounded fan-out), ONE sort-distinct,
    ONE anti merge_join removes covered tokens, and the rebuild is a
    sort(doc_id) co-partitioned block-local ordered join (a doc's
    surviving tokens fit a block — the standing group-fits-a-block
    assumption of the window family). Text rides the wire once, in
    the explode."""
    import pyarrow.compute as pc

    from .joins import merge_join
    from .pagerank import _distinct_sorted

    rows = docs_ds.map_batches(
        explode_tokens_batch, batch_format="pyarrow"
    ).materialize()
    levels = window_class_levels(rows, window_level, parts)
    w = 1 << window_level
    top = [lv for k, lv in levels if k == window_level]

    def no_cover(t: pa.Table) -> pa.Table:
        return pa.table({"gid": pa.array([], pa.int64())})

    if not top:
        covered = rows.map_batches(no_cover, batch_format="pyarrow")
    else:

        def explode_cover(t: pa.Table, _w=w) -> pa.Table:
            gid = (
                t.filter(t.column("dup"))
                .column("gid")
                .to_numpy(zero_copy_only=False)
            )
            if len(gid) == 0:
                return pa.table({"gid": pa.array([], pa.int64())})
            cov = (gid[:, None] + np.arange(_w, dtype=np.int64)[None, :]).ravel()
            return pa.table({"gid": pa.array(cov, pa.int64())})

        covered = _distinct_sorted(
            top[0].map_batches(explode_cover, batch_format="pyarrow"), ["gid"]
        )

    kept = merge_join(rows, covered, "gid", "gid", [], how="anti")

    def rebuild_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "stripped_text": pa.array([], pa.string()),
                    "n_kept": pa.array([], pa.int64()),
                }
            )
        gid = t.column("gid").to_numpy(zero_copy_only=False)
        toks = t.column("tok").to_pylist()
        order = np.argsort(gid, kind="stable")
        gid_s = gid[order]
        doc = gid_s >> _POS_BITS
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        ends = np.r_[starts[1:], len(doc)]
        return pa.table(
            {
                "doc_id": pa.array(doc[starts], pa.int64()),
                "stripped_text": pa.array(
                    [
                        " ".join(toks[order[i]] for i in range(s, e))
                        for s, e in zip(starts, ends)
                    ],
                    pa.string(),
                ),
                "n_kept": pa.array((ends - starts).astype(np.int64)),
            }
        )

    def doc_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "doc_id",
            pa.array(
                t.column("gid").to_numpy(zero_copy_only=False) >> _POS_BITS,
                pa.int64(),
            ),
        )

    rebuilt = (
        kept.map_batches(doc_key, batch_format="pyarrow")
        .sort("doc_id")
        .map_batches(rebuild_block, batch_format="pyarrow", batch_size=None)
    )

    # token totals per doc (for n_stripped) + docs stripped to nothing
    def doc_totals(t: pa.Table) -> pa.Table:
        gid = t.column("gid").to_numpy(zero_copy_only=False)
        doc = gid >> _POS_BITS
        u, c = np.unique(doc, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(u, pa.int64()),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    totals = (
        rows.map_batches(doc_totals, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n", alias_name="n_total"))
    )
    out = merge_join(
        totals,
        rebuilt,
        "doc_id",
        "doc_id",
        ["stripped_text", "n_kept"],
        how="left",
    )

    def finalize(t: pa.Table) -> pa.Table:
        total = t.column("n_total").to_numpy(zero_copy_only=False).astype(np.int64)
        nk = np.nan_to_num(
            t.column("n_kept").to_numpy(zero_copy_only=False).astype(np.float64),
            nan=0.0,
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "stripped_text": pc.fill_null(t.column("stripped_text"), ""),
                "n_kept": pa.array(nk),
                "n_stripped": pa.array(total - nk),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def sequential_dup_window_strip(doc_rows: list[dict], window_level: int = 3) -> dict:
    """Independent sequential strip oracle (token-tuple Counter +
    coverage mask). -> {doc_id: (stripped_text, n_kept, n_stripped)}."""
    from collections import Counter

    w = 1 << window_level
    toks = {r["doc_id"]: _doc_tokens(r["text"]) for r in doc_rows}
    counts: Counter = Counter()
    for ws in toks.values():
        for p in range(len(ws) - w + 1):
            counts[tuple(ws[p : p + w])] += 1
    out = {}
    for d, ws in toks.items():
        cover = np.zeros(len(ws), dtype=bool)
        for p in range(len(ws) - w + 1):
            if counts[tuple(ws[p : p + w])] >= 2:
                cover[p : p + w] = True
        kept = [t for t, c in zip(ws, cover) if not c]
        out[d] = (" ".join(kept), len(kept), int(cover.sum()))
    return out


def sequential_dup_window_census(doc_rows: list[dict], max_level: int = 7) -> dict:
    """Independent sequential oracle: per level a Counter over actual
    token-tuple windows (no ranking, no doubling — a different
    algorithm computing the same definition). -> {doc_id: (max_dup_len,
    n_dup_1, n_dup_8)}."""
    from collections import Counter

    toks = {r["doc_id"]: _doc_tokens(r["text"]) for r in doc_rows}
    out = {d: [0, 0, 0] for d in toks}
    for k in range(0, max_level + 1):
        w = 1 << k
        counts: Counter = Counter()
        for ws in toks.values():
            for p in range(len(ws) - w + 1):
                counts[tuple(ws[p : p + w])] += 1
        any_hit = False
        for d, ws in toks.items():
            n = sum(
                1
                for p in range(len(ws) - w + 1)
                if counts[tuple(ws[p : p + w])] >= 2
            )
            if n:
                any_hit = True
                out[d][0] = w
                if k == 0:
                    out[d][1] = n
                if k == 3:
                    out[d][2] = n
        if not any_hit:
            break
    return {d: tuple(v) for d, v in out.items()}
