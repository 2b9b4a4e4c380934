"""Distributed mergeable-sketch reductions (HLL / Space-Saving / KLL).

The one Ray-Data shape all three share — and the reason sketches are
the right tool at 100 TB where exact `groupby`/`sort` answers cost an
all-to-all shuffle:

    map_batches(partial sketch per input batch)   # streaming, no shuffle
      -> map_batches(merge, batch_size=fanin) x2  # block-coalescing tree
      -> take_all() + driver merge                # <= partials/fanin^2 rows

The only data that ever moves is serialized sketch bytes: at 100 TB
with 64 MB input blocks that is ~1.6M partial rows x ~16 KB = ~26 GB
spread over the cluster, coalesced to ``fanin`` rows before the driver
sees anything — the driver materializes at most ``fanin`` sketches
regardless of input size (never the corpus; the ADVICE r2 take_all
rule applies to unbounded joins, not to a bounded reduce tail).

Merge-order independence is what makes the results trustworthy here:
HLL registers combine by max (any tree shape gives identical output),
Space-Saving in exact-capacity mode never evicts, and KLL in
exact-capacity mode never compacts — see functions/sketches.py for
the determinism contract each oracle relies on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import HyperLogLog, KLLSketch, SpaceSaving

_SKETCH_BATCH = 65536  # input rows folded into one partial sketch row


def _reduce_sketches(ds, partial_fn, from_bytes, fanin: int = 64):
    """Run ``partial_fn`` (pyarrow batch -> one {"sk": binary} row) over
    the dataset, tree-merge with fan-in ``fanin`` per level, and return
    the final merged sketch object (or None on an empty dataset).

    The merge levels are plain ``map_batches(batch_size=fanin)`` calls:
    Ray Data coalesces the one-row partial blocks into fanin-row
    batches, so each level divides the row count by ``fanin`` with no
    repartition (a repartition here manufactures empty blocks whenever
    partials < fanin, which trips Ray's bundle-schema warning). Two
    levels bound the driver tail at partials/fanin^2 rows — ~1.6M
    partials at 100 TB -> ~390 sixteen-KB rows."""

    def merge_block(t: pa.Table) -> pa.Table:
        blobs = [b for b in t.column("sk").to_pylist() if b is not None]
        if not blobs:
            return pa.table({"sk": pa.array([], pa.binary())})
        acc = from_bytes(blobs[0])
        for b in blobs[1:]:
            acc.merge(from_bytes(b))
        return pa.table({"sk": pa.array([acc.to_bytes()], pa.binary())})

    merged = ds.map_batches(
        partial_fn, batch_format="pyarrow", batch_size=_SKETCH_BATCH
    )
    for _level in range(2):
        merged = merged.map_batches(
            merge_block, batch_format="pyarrow", batch_size=fanin
        )
    acc = None
    for row in merged.take_all():  # <= partials/fanin^2 one-sketch rows
        sk = from_bytes(row["sk"])
        acc = sk if acc is None else acc.merge(sk)
    return acc


def approx_distinct(ds, col: str, p: int = 14, fanin: int = 32) -> float:
    """HyperLogLog distinct-count estimate of an int64 column.

    Order-free (register max), so the distributed estimate is exactly
    the sequential single-process estimate — the oracle check in
    pipelines/oracle_sketch.py:oracle_hll_table relies on this.
    """

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(col).drop_null().to_numpy(zero_copy_only=False)
        hll = HyperLogLog(p).add_ints(vals.astype(np.int64))
        return pa.table({"sk": pa.array([hll.to_bytes()], pa.binary())})

    acc = _reduce_sketches(ds, partial, HyperLogLog.from_bytes, fanin)
    return (acc or HyperLogLog(p)).estimate()


def heavy_hitters(
    ds, col: str, k: int = 10, capacity: int = 256, fanin: int = 32
) -> pa.Table:
    """Space-Saving top-k of a string column -> (key, cnt, err) table.

    Each partial is an EXACT in-batch ``value_counts`` folded as
    weighted items, so the summary's working set is per-batch distinct
    keys, not rows. With ``capacity`` >= global distinct keys the
    result is exact (err all 0) — the SQL-oracle configuration.
    """

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column(col).drop_null())
        ss = SpaceSaving(capacity).add_counted(
            vc.field("values").to_pylist(), vc.field("counts").to_pylist()
        )
        return pa.table({"sk": pa.array([ss.to_bytes()], pa.binary())})

    acc = _reduce_sketches(ds, partial, SpaceSaving.from_bytes, fanin)
    rows = acc.top(k) if acc is not None else []
    return pa.table(
        {
            col: pa.array([r[0] for r in rows], pa.string()),
            "cnt": pa.array([r[1] for r in rows], pa.int64()),
            "err": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def _hll_partial_fn(key_col: str, val_col: str, p: int):
    """Shared map-side builder: one HLL register blob PER (batch, key)
    — the combiner every per-group sketch op here uses. Null keys
    can't sort (None vs str) and null values must be skipped exactly
    as the single-process oracles skip them."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.is_valid(t.column(key_col)), pc.is_valid(t.column(val_col))
            )
        )
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        vals = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys) == 0:
            return pa.table(
                {key_col: pa.array([], pa.string()), "sk": pa.array([], pa.binary())}
            )
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        starts = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1]
        ends = np.r_[starts[1:], len(keys)]
        out_k, out_sk = [], []
        for s, e in zip(starts, ends):
            out_k.append(keys[s])
            out_sk.append(HyperLogLog(p).add_ints(vals[s:e]).to_bytes())
        return pa.table(
            {
                key_col: pa.array(out_k, pa.string()),
                "sk": pa.array(out_sk, pa.binary()),
            }
        )

    return partial


def hll_pairwise_overlap(sketches: dict[str, "HyperLogLog"]) -> pa.Table:
    """Pairwise HLL set algebra over final per-key sketches (key-pair
    scale — vocabulary, never corpus): |A∪B| from the register max of
    COPIES, |A∩B| by inclusion-exclusion clamped at >= 0, jaccard =
    inter/union. Pure kernel, shared verbatim with the sequential
    oracle; floats rounded to 6 dp (all inputs are identical register
    bytes on both sides, so the arithmetic is bit-identical)."""
    keys = sorted(sketches)
    ka, kb, da, db, un, inter, jac = [], [], [], [], [], [], []
    for i, a in enumerate(keys):
        ea = sketches[a].estimate()
        for b in keys[i + 1 :]:
            eb = sketches[b].estimate()
            merged = HyperLogLog.from_bytes(sketches[a].to_bytes()).merge(
                sketches[b]
            )
            eu = merged.estimate()
            ei = max(ea + eb - eu, 0.0)
            ka.append(a)
            kb.append(b)
            da.append(round(ea, 6))
            db.append(round(eb, 6))
            un.append(round(eu, 6))
            inter.append(round(ei, 6))
            jac.append(round(ei / eu, 6) if eu > 0 else 0.0)
    return pa.table(
        {
            "key_a": pa.array(ka, pa.string()),
            "key_b": pa.array(kb, pa.string()),
            "distinct_a": pa.array(da, pa.float64()),
            "distinct_b": pa.array(db, pa.float64()),
            "union_est": pa.array(un, pa.float64()),
            "intersection_est": pa.array(inter, pa.float64()),
            "jaccard_est": pa.array(jac, pa.float64()),
        }
    )


def hll_overlap_by_key(ds, key_col: str, val_col: str, p: int = 12) -> pa.Table:
    """Pairwise audience overlap between key groups via HLL set
    algebra — "how many users do event types A and B share?" without
    a distinct-pairs shuffle.

    Map side pre-aggregates one register blob per (batch, key) (the
    approx_distinct_by_key combiner), the groupby moves sketch rows
    only, each key folds to ONE final sketch, and the key-cardinality-
    sized sketch set comes to the driver for the pairwise algebra
    (bounded: one 2^p-byte blob per DISTINCT key — event types /
    langs / TLDs, never rows). Registers merge by max => order-free
    => identical bytes to the sequential fold, so the float estimates
    are oracle-checkable bit-for-bit."""
    import pandas as pd

    partial = _hll_partial_fn(key_col, val_col, p)

    def merge_group(df):
        acc = None
        for b in df["sk"]:
            sk = HyperLogLog.from_bytes(b)
            acc = sk if acc is None else acc.merge(sk)
        return pd.DataFrame(
            {key_col: [df[key_col].iloc[0]], "sk": [acc.to_bytes()]}
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=_SKETCH_BATCH)
        .groupby(key_col)
        .map_groups(merge_group, batch_format="pandas")
        .take_all()
    )
    sketches = {r[key_col]: HyperLogLog.from_bytes(r["sk"]) for r in rows}
    return hll_pairwise_overlap(sketches)


def approx_distinct_by_key(
    ds, key_col: str, val_col: str, p: int = 12
):
    """Per-group HLL distinct counts -> Dataset (key, distinct_estimate).

    The groupby-aggregate form of ``approx_distinct``: the map side
    pre-aggregates one HLL PER (batch, key) — the combiner discipline
    every wide op here follows — so the shuffle moves
    batches x group-cardinality sketch rows (2^p bytes each), never
    input rows. map_groups then merges each key's partials (register
    max => merge-order free, single-process-parity oracle-checkable).
    Partitioning assumption: one output row per distinct key; suits
    low-to-mid key cardinality (event types, languages, TLDs). For
    billions of keys use exact groupby counts instead — the sketch
    constant (2^p bytes/key) dominates below ~10k values per key.
    """

    partial = _hll_partial_fn(key_col, val_col, p)

    def merge_group(df):
        import pandas as pd

        acc = None
        for b in df["sk"]:
            sk = HyperLogLog.from_bytes(b)
            acc = sk if acc is None else acc.merge(sk)
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "distinct_estimate": [acc.estimate()],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=_SKETCH_BATCH)
        .groupby(key_col)
        .map_groups(merge_group, batch_format="pandas")
    )


def sketch_quantiles_by_key(
    ds, key_col: str, val_col: str, qs: list[float], capacity: int = 2048
):
    """Per-group KLL quantiles -> Dataset (key, q, value).

    Same combiner-then-groupby shape as ``approx_distinct_by_key``:
    one KLL partial per (batch, key), shuffle of sketch rows only,
    per-key merge + quantile extraction in map_groups. With
    ``capacity`` >= the largest group the result is exact
    percentile_disc (merge-order free) — unlike the exact
    sort-and-scan quantiles in pipelines/queries.py this never needs
    a group to fit one sort block, only its SKETCH to fit memory, so
    it is the high-cardinality/giant-group scale path.
    """

    def partial(t: pa.Table) -> pa.Table:
        # same null discipline as approx_distinct_by_key: null keys
        # can't sort, null values are skipped (KLL.add also drops NaN)
        t = t.filter(
            pc.and_(
                pc.is_valid(t.column(key_col)), pc.is_valid(t.column(val_col))
            )
        )
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        vals = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        if len(keys) == 0:
            return pa.table(
                {key_col: pa.array([], pa.string()), "sk": pa.array([], pa.binary())}
            )
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        starts = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1]
        ends = np.r_[starts[1:], len(keys)]
        out_k, out_sk = [], []
        for s, e in zip(starts, ends):
            out_k.append(keys[s])
            out_sk.append(KLLSketch(capacity).add(vals[s:e]).to_bytes())
        return pa.table(
            {
                key_col: pa.array(out_k, pa.string()),
                "sk": pa.array(out_sk, pa.binary()),
            }
        )

    def merge_group(df):
        import pandas as pd

        acc = None
        for b in df["sk"]:
            sk = KLLSketch.from_bytes(b)
            acc = sk if acc is None else acc.merge(sk)
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]] * len(qs),
                "q": list(qs),
                "value": [acc.quantile(q) for q in qs],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=_SKETCH_BATCH)
        .groupby(key_col)
        .map_groups(merge_group, batch_format="pandas")
    )


def sketch_quantiles(
    ds, col: str, qs: list[float], capacity: int = 2048, fanin: int = 32
) -> pa.Table:
    """KLL quantiles of a float column -> (q, value) table,
    percentile_disc semantics. ``capacity`` >= row count = exact mode
    (never compacts; merge-order independent) — the SQL-oracle
    configuration; smaller capacities give eps ~ O(1/capacity) rank
    error (tested in tests/test_sketches.py).
    """

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(col).drop_null().to_numpy(zero_copy_only=False)
        sk = KLLSketch(capacity).add(vals.astype(np.float64))
        return pa.table({"sk": pa.array([sk.to_bytes()], pa.binary())})

    acc = _reduce_sketches(ds, partial, KLLSketch.from_bytes, fanin)
    if acc is None or acc.n == 0:
        return pa.table(
            {"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())}
        )
    return pa.table(
        {
            "q": pa.array(list(qs), pa.float64()),
            "value": pa.array([acc.quantile(q) for q in qs], pa.float64()),
        }
    )


def cms_counts(
    ds,
    col: str,
    probe_keys: list[str],
    depth: int = 4,
    width: int = 2048,
    fanin: int = 32,
) -> pa.Table:
    """Count-Min frequency estimates of ``probe_keys`` over a string
    column -> (key, cms_count) table. Each partial is an EXACT
    in-batch ``value_counts`` added as weighted items (working set =
    per-batch distinct keys), partials tree-merge by elementwise
    integer add — order-free, so the distributed table is BIT-IDENTICAL
    to a sequential global-counter fold and the estimates hash-check
    against the single-process oracle. CMS estimates never undercount;
    at ``width`` >= a few x distinct keys they are exact."""
    from ..functions.minhash import fnv1a_batch
    from ..functions.sketches import CountMin

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column(col).drop_null())
        cm = CountMin(depth, width)
        if len(vc):
            cm.add_hashed(
                fnv1a_batch(vc.field("values")),
                vc.field("counts").to_numpy(zero_copy_only=False),
            )
        return pa.table({"sk": pa.array([cm.to_bytes()], pa.binary())})

    acc = _reduce_sketches(ds, partial, CountMin.from_bytes, fanin)
    if acc is None:
        acc = CountMin(depth, width)
    ph = fnv1a_batch(pa.array(probe_keys, pa.string()))
    est = acc.estimate_hashed(ph)
    return pa.table(
        {
            "token": pa.array(probe_keys, pa.string()),
            "cms_count": pa.array(est, pa.int64()),
        }
    )
