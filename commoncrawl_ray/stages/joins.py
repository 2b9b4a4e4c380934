"""Distributed as-of join — an operator Ray Data lacks natively.

``asof_join(left, right, by, on, right_cols)`` attaches, to every left
row, the payload of the LATEST right row with the same ``by`` key and
``on`` strictly less than the left row's ``on`` (the classic
trades/quotes as-of shape; here: "each purchase gets the user's most
recent preceding click").

Shape (same union+sort co-partition discipline as the dedup sketch
join in stages/dedup.py): both sides are projected onto one shared
schema with a side tag, unioned, and range-shuffled by the SINGLE
``by`` column — equal keys can never split across blocks — then each
block runs a vectorized per-key searchsorted merge. ONE all-to-all
exchange total; no driver materialization.

Partitioning assumption (documented per the custom-operator rule): all
rows of one ``by`` key fit in one sort block. Keys are users/hosts —
bounded groups — not timestamps; a mega-key would need salting by
time-range with a boundary fix-up pass.
"""

from __future__ import annotations

import numpy as np

import pyarrow as pa


def asof_join(left, right, by: str, on: str, right_cols: list, suffix: str = "_asof"):
    """left/right: Datasets sharing int64-sortable ``by`` and ``on``
    columns. Returns left's columns + ``<c><suffix>`` for each payload
    column (null when no preceding right row exists)."""
    left_schema = left.schema()
    left_names = list(left_schema.names)
    left_types = {n: t for n, t in zip(left_schema.names, left_schema.types)}
    out_fields = [(n, left_types[n]) for n in left_names]

    right_schema = right.schema()
    right_types = {n: t for n, t in zip(right_schema.names, right_schema.types)}
    payload_fields = [(c + suffix, right_types[c]) for c in right_cols]

    # one shared wire schema: left cols + tagged payload cols + _side
    wire = pa.schema(
        out_fields + payload_fields + [("_side", pa.int8())]
    )
    out_schema = pa.schema(out_fields + payload_fields)

    def to_wire_left(t: pa.Table) -> pa.Table:
        cols = {n: t.column(n) for n in left_names}
        for c, typ in payload_fields:
            cols[c] = pa.nulls(len(t), typ)
        cols["_side"] = pa.array(np.ones(len(t), dtype=np.int8))
        return pa.table(cols, schema=wire)

    def to_wire_right(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {}
        for name in left_names:
            if name in (by, on):
                cols[name] = t.column(name)
            else:
                cols[name] = pa.nulls(n, left_types[name])
        for c, typ in payload_fields:
            cols[c] = t.column(c[: -len(suffix)])
        cols["_side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols, schema=wire)

    def merge_block(t: pa.Table) -> pa.Table:
        """Pure Arrow merge (ADVICE r2): a pandas conversion would turn
        the null-carrying int64 wire columns into float64 and silently
        round key/payload values above 2^53."""
        import pyarrow.compute as pc

        side = t.column("_side")
        lefts = t.filter(pc.equal(side, 1))
        if len(lefts) == 0:
            return out_schema.empty_table()
        rights = t.filter(pc.equal(side, 0))
        out_cols = {n: lefts.column(n) for n in left_names}
        n_left = len(lefts)
        if len(rights) == 0:
            for c, typ in payload_fields:
                out_cols[c] = pa.nulls(n_left, typ)
            return pa.table(out_cols, schema=out_schema)
        # by/on are never null on their own side — plain int64/datetime64
        rk = rights.column(by).to_numpy(zero_copy_only=False)
        rt = rights.column(on).to_numpy(zero_copy_only=False)
        order_r = np.lexsort((rt, rk))
        rk, rt = rk[order_r], rt[order_r]
        lk = lefts.column(by).to_numpy(zero_copy_only=False)
        lt = lefts.column(on).to_numpy(zero_copy_only=False)
        # key ranges in the sorted right side
        lo = np.searchsorted(rk, lk, side="left")
        hi = np.searchsorted(rk, lk, side="right")
        # strictly-preceding rank within [lo, hi): per-key arrays are
        # ts-sorted, so one more searchsorted per UNIQUE key batch
        idx = np.full(n_left, -1, dtype=np.int64)
        order = np.argsort(lk, kind="mergesort")
        pos = 0
        while pos < len(order):
            end = pos
            k = lk[order[pos]]
            while end < len(order) and lk[order[end]] == k:
                end += 1
            sel = order[pos:end]
            a, b = lo[sel[0]], hi[sel[0]]
            if b > a:
                within = np.searchsorted(rt[a:b], lt[sel], side="left") - 1
                idx[sel] = np.where(within >= 0, a + within, -1)
            pos = end
        found = idx >= 0
        # Arrow take with a null mask: payload types (incl. full-range
        # int64) never pass through float64
        take_idx = pa.array(order_r[np.maximum(idx, 0)], mask=~found)
        for c, _typ in payload_fields:
            out_cols[c] = rights.column(c).combine_chunks().take(take_idx)
        return pa.table(out_cols, schema=out_schema)

    wire_ds = left.map_batches(to_wire_left, batch_format="pyarrow").union(
        right.map_batches(to_wire_right, batch_format="pyarrow")
    )
    return wire_ds.sort(by).map_batches(
        merge_block, batch_format="pyarrow", batch_size=None
    )
