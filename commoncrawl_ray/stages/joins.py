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
import pandas as pd
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

    def merge_block(df: pd.DataFrame) -> pa.Table:
        lefts = df[df["_side"] == 1]
        if len(lefts) == 0:
            return out_schema.empty_table()
        rights = df[df["_side"] == 0]
        out = lefts.drop(columns=["_side"]).copy()
        if len(rights):
            r = rights.sort_values([by, on], kind="mergesort")
            rk = r[by].to_numpy()
            rt = r[on].to_numpy()
            lk = out[by].to_numpy()
            lt = out[on].to_numpy()
            # key ranges in the sorted right side
            lo = np.searchsorted(rk, lk, side="left")
            hi = np.searchsorted(rk, lk, side="right")
            # strictly-preceding rank within [lo, hi): per-key arrays are
            # ts-sorted, so one more searchsorted per UNIQUE key batch
            idx = np.full(len(out), -1, dtype=np.int64)
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
            for c, _typ in payload_fields:
                src = r[c].to_numpy()
                col = np.empty(len(out), dtype=object)
                col[:] = None
                col[found] = src[idx[found]]
                out[c] = col
        arrays = []
        for name, typ in zip(out_schema.names, out_schema.types):
            arrays.append(pa.array(out[name].to_numpy(), type=typ, from_pandas=True))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    wire_ds = left.map_batches(to_wire_left, batch_format="pyarrow").union(
        right.map_batches(to_wire_right, batch_format="pyarrow")
    )
    return wire_ds.sort(by).map_batches(
        merge_block, batch_format="pandas", batch_size=None
    )
