"""Grouped top-k (window rank) — ``row_number() OVER (PARTITION BY g
ORDER BY v DESC, tiebreak)`` with ``rank <= k``, Ray-Data-first.

The reference's sorted+indexed pagination (``query/Query.java:214+``,
``S3SeedQuery`` top-N assembly) serves whole-result ranking; this is
the per-GROUP variant a training-data pipeline needs (best k docs per
language / per host / per domain).

Shape: ONE all-to-all exchange — sort by the single group key (the
union+sort co-partition discipline of stages/joins.py; equal keys
never split across blocks), then a vectorized per-block lexsort ranks
every group at once. No per-group Python beyond slice bookkeeping, no
driver materialization.

Partitioning assumption (custom-operator rule): all rows of one group
fit in one sort block. Groups are languages/hosts — bounded — not
timestamps; a mega-group would need a per-block partial top-k combine
(keep k per block keyed by (group, salt)) before the exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def grouped_topk(ds, group_col: str, order_col: str, k: int, tiebreak_col: str, descending: bool = True):
    """Keep the top ``k`` rows per ``group_col`` ordered by
    ``order_col`` (desc by default), ties broken by ascending
    ``tiebreak_col`` (must be unique within a group for deterministic
    output). Appends an int64 ``rank`` column (1-based)."""
    schema = ds.schema()
    out_schema = pa.schema(
        list(zip(schema.names, schema.types)) + [("rank", pa.int64())]
    )

    def topk_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        v = t.column(order_col).to_numpy(zero_copy_only=False)
        tb = t.column(tiebreak_col).to_numpy(zero_copy_only=False)
        if descending:
            v = -v if np.issubdtype(v.dtype, np.number) else v
        # one lexsort ranks every group in the block: (group, value, tie)
        order = np.lexsort((tb, v, g))
        g_s = g[order]
        starts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]])
        # rank within group = position - start of its group's run
        run_id = np.cumsum(np.r_[True, g_s[1:] != g_s[:-1]]) - 1
        rank = np.arange(len(g_s)) - starts[run_id] + 1
        keep = rank <= k
        take = pa.array(order[keep], pa.int64())
        cols = {n: t.column(n).combine_chunks().take(take) for n in schema.names}
        cols["rank"] = pa.array(rank[keep].astype(np.int64))
        return pa.table(cols, schema=out_schema)

    return ds.sort(group_col).map_batches(
        topk_block, batch_format="pyarrow", batch_size=None
    )
