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


def merge_join(
    left,
    right,
    left_on: str,
    right_on: str,
    right_cols: list,
    how: str = "inner",
    suffix: str = "",
):
    """Distributed sort-merge equi-join (one-to-many; row expansion).

    Attaches ``right_cols`` (renamed ``<c><suffix>``) of EVERY right
    row whose ``right_on`` equals a left row's ``left_on``. ``how`` is
    ``"inner"`` (drop unmatched left rows), ``"left"`` (keep them
    with null payloads), ``"outer"`` (FULL OUTER: additionally keep
    unmatched RIGHT rows — their join key lands in ``left_on``, every
    other left column is null, payload is carried), ``"semi"`` (left
    rows with >= 1 match, once, no payload — SQL EXISTS), or
    ``"anti"`` (left rows with no match — SQL NOT EXISTS; the crawl
    frontier's seen-set subtraction is this operator specialised to
    the URL-fingerprint key).
    Reference parity: the query layer's
    merge-sorted shard joins (``query/Query.java`` result assembly,
    ``hadoop/mergeutils/MergeSortSpillWriter.java:66``) re-expressed
    Ray-Data-first.

    Shape: the established union + sort(single key) co-partition
    discipline (asof_join above, sketch attach in stages/dedup.py) —
    both sides projected onto one tagged wire schema, ONE all-to-all
    exchange, then a vectorized per-key cross-product inside each
    block. All column movement is Arrow ``take`` — int64 payloads
    never decay through pandas float64 (ADVICE r2).

    Partitioning assumption (custom-operator rule): all rows of one
    join key fit in one sort block. Keys here are bounded entity ids
    (custkey, host_fp); for a mega-key use :func:`skew_join` below —
    the broadcast fix-up pass, implemented.
    """
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(
            f"how must be 'inner', 'left', 'outer', 'semi' or 'anti', got {how!r}"
        )
    if how in ("semi", "anti") and right_cols:
        # existence joins carry no payload: the right side contributes
        # only its key presence — silently dropping requested payload
        # columns would surface as a confusing missing-column error
        # far downstream
        raise ValueError(f"right_cols must be empty for how={how!r}")
    left_schema = left.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right.schema().names, right.schema().types))
    payload_fields = [(c + suffix, right_types[c]) for c in right_cols]
    for c, _ in payload_fields:
        if c in left_names:
            raise ValueError(f"payload column {c!r} collides with a left column")

    wire = pa.schema(
        [(n, left_types[n]) for n in left_names]
        + payload_fields
        + [("_side", pa.int8())]
    )
    out_schema = pa.schema([(n, left_types[n]) for n in left_names] + payload_fields)

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
            cols[name] = (
                t.column(right_on).cast(left_types[name])
                if name == left_on
                else pa.nulls(n, left_types[name])
            )
        for (c, _typ), src in zip(payload_fields, right_cols):
            cols[c] = t.column(src)
        cols["_side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols, schema=wire)

    def merge_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        key = t.column(left_on).to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        # group by key with right rows (side 0) leading each group
        order = np.lexsort((side, key))
        key_s = key[order]
        side_s = side[order]
        starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
        ends = np.r_[starts[1:], len(key_s)]
        lt_parts, rt_parts = [], []
        for s, e in zip(starts, ends):
            nr = int(np.searchsorted(side_s[s:e], 1))
            l_pos = order[s + nr : e]
            if len(l_pos) == 0:
                if how == "outer" and nr > 0:
                    # unmatched RIGHT rows: their wire representation —
                    # key in left_on, other left cols null, payload
                    # live — is already the desired output row, so take
                    # BOTH column groups from the right row positions
                    r_pos = order[s : s + nr]
                    lt_parts.append(r_pos)
                    rt_parts.append(r_pos)
                continue
            if how == "semi":
                if nr > 0:
                    lt_parts.append(l_pos)
                continue
            if how == "anti":
                if nr == 0:
                    lt_parts.append(l_pos)
                continue
            if nr == 0:
                if how in ("left", "outer"):
                    lt_parts.append(l_pos)
                    rt_parts.append(np.full(len(l_pos), -1, dtype=np.int64))
                continue
            r_pos = order[s : s + nr]
            lt_parts.append(np.repeat(l_pos, nr))
            rt_parts.append(np.tile(r_pos, len(l_pos)))
        if not lt_parts:
            return out_schema.empty_table()
        idx_l = np.concatenate(lt_parts)
        take_l = pa.array(idx_l, pa.int64())
        cols = {n: t.column(n).combine_chunks().take(take_l) for n in left_names}
        if payload_fields:
            idx_r = np.concatenate(rt_parts)
            take_r = pa.array(np.maximum(idx_r, 0), mask=idx_r < 0)
            for c, _typ in payload_fields:
                cols[c] = t.column(c).combine_chunks().take(take_r)
        return pa.table(cols, schema=out_schema)

    wire_ds = left.map_batches(to_wire_left, batch_format="pyarrow").union(
        right.map_batches(to_wire_right, batch_format="pyarrow")
    )
    return wire_ds.sort(left_on).map_batches(
        merge_block, batch_format="pyarrow", batch_size=None
    )


def interval_join(
    left,
    right,
    by: str,
    on: str,
    lo: int,
    hi: int,
    right_cols: list,
    suffix: str = "_r",
):
    """Distributed interval (range-band) equi+range join: for each left
    row, attach EVERY right row with the same ``by`` key whose ``on``
    value satisfies ``lo <= on_right - on_left <= hi`` (int64 units —
    epoch micros, positions, offsets). Inner semantics with row
    expansion; payload columns arrive as ``<c><suffix>``.

    The range-join sibling of :func:`asof_join` (the custom-operator
    family the brief names alongside as-of): same ONE union +
    sort(by) co-partition exchange, then a fully vectorized
    per-key band match inside each block — two searchsorteds give each
    left row its [start, end) band in the key's ts-sorted right rows,
    and the pair explosion is a repeat/cumsum expansion (no Python
    loop over rows or pairs).

    Partitioning assumption (documented like merge_join's): all rows
    of one ``by`` key fit in one sort block; a mega-key needs salting
    by ``on`` range plus a boundary-band fix-up pass.
    """
    left_schema = left.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right.schema().names, right.schema().types))
    payload_fields = [(c + suffix, right_types[c]) for c in right_cols]
    for c, _ in payload_fields:
        if c in left_names:
            raise ValueError(f"payload column {c!r} collides with a left column")

    wire = pa.schema(
        [(n, left_types[n]) for n in left_names]
        + payload_fields
        + [("_side", pa.int8())]
    )
    out_schema = pa.schema([(n, left_types[n]) for n in left_names] + payload_fields)

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
                cols[name] = t.column(name).cast(left_types[name])
            else:
                cols[name] = pa.nulls(n, left_types[name])
        for c, typ in payload_fields:
            cols[c] = t.column(c[: -len(suffix)] if suffix else c).cast(typ)
        cols["_side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols, schema=wire)

    def merge_block(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = t.column("_side")
        lefts = t.filter(pc.equal(side, 1))
        rights = t.filter(pc.equal(side, 0))
        if len(lefts) == 0 or len(rights) == 0:
            return out_schema.empty_table()
        rk = rights.column(by).to_numpy(zero_copy_only=False)
        rt = rights.column(on).to_numpy(zero_copy_only=False)
        order_r = np.lexsort((rt, rk))
        rk, rt = rk[order_r], rt[order_r]
        lk = lefts.column(by).to_numpy(zero_copy_only=False)
        lt = lefts.column(on).to_numpy(zero_copy_only=False)
        # each left row's right-side band: same key AND on in
        # [lt+lo, lt+hi] — realized as searchsorted over the composite
        # (key, ts) order using per-key sub-searches on a fused 128-bit
        # proxy: search (key, ts+lo) left .. (key, ts+hi) right.
        # lexsorted (rk, rt) lets us binary-search the key range first,
        # then the ts band inside it, all vectorized via np.searchsorted
        # on tuples encoded as structured sort — cheaper: search key
        # range, then ts band with offset bases.
        k_start = np.searchsorted(rk, lk, side="left")
        k_end = np.searchsorted(rk, lk, side="right")
        # ts band within the key slice (vectorized per left row using
        # global searchsorted on rt is wrong across key boundaries, so
        # search within slices via offset trick: rt is ts-sorted within
        # each key run; np.searchsorted over the whole rt array with
        # manual clamping to [k_start, k_end))
        start = np.empty(len(lt), dtype=np.int64)
        end = np.empty(len(lt), dtype=np.int64)
        # vectorized per unique key: group left rows by key run
        order_l = np.argsort(lk, kind="mergesort")
        pos = 0
        while pos < len(order_l):
            run_end = pos
            k = lk[order_l[pos]]
            while run_end < len(order_l) and lk[order_l[run_end]] == k:
                run_end += 1
            sel = order_l[pos:run_end]
            a, b = k_start[sel[0]], k_end[sel[0]]
            if b > a:
                start[sel] = a + np.searchsorted(rt[a:b], lt[sel] + lo, side="left")
                end[sel] = a + np.searchsorted(rt[a:b], lt[sel] + hi, side="right")
            else:
                start[sel] = 0
                end[sel] = 0
            pos = run_end
        counts = end - start
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        li = np.repeat(np.arange(len(lt), dtype=np.int64), counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        ri = (
            np.arange(total, dtype=np.int64)
            - np.repeat(offs, counts)
            + np.repeat(start, counts)
        )
        li_arr = pa.array(li)
        ri_arr = pa.array(order_r[ri])
        out_cols = {}
        for n in left_names:
            out_cols[n] = lefts.column(n).combine_chunks().take(li_arr)
        for c, _typ in payload_fields:
            out_cols[c] = rights.column(c).combine_chunks().take(ri_arr)
        return pa.table(out_cols, schema=out_schema)

    wire_ds = left.map_batches(to_wire_left, batch_format="pyarrow").union(
        right.map_batches(to_wire_right, batch_format="pyarrow")
    )
    return wire_ds.sort(by).map_batches(
        merge_block, batch_format="pyarrow", batch_size=None
    )


def skew_join(
    left,
    right,
    left_on: str,
    right_on: str,
    right_cols: list,
    how: str = "inner",
    suffix: str = "",
    hot_threshold: int = 1_000_000,
    max_hot_right_rows: int = 5_000_000,
    stats: dict | None = None,
):
    """Skew-resilient equi-join: the mega-key fix-up the plain
    :func:`merge_join` docstrings defer to ("a mega-key would need
    salting + a broadcast fix-up pass") — implemented. Keys whose row
    count reaches ``hot_threshold`` on EITHER side are routed to a
    broadcast hash probe (the right slice of hot keys ships once via
    ray.put and is probed vectorized inside map_batches over the hot
    left rows); every other key takes the normal ONE-exchange
    sort-merge path. The hot set is the union across sides, so each
    key is fully handled by exactly one path and the result is
    row-identical to merge_join. Spark's skew-join optimization is the
    same split; here detection is an exact pre-combined per-key count
    (per-batch value_counts partials -> one key-scale groupby), not a
    sampler.

    Semantics: how in ("inner", "left", "semi", "anti") — FULL OUTER
    is not offered because unmatched-RIGHT tracking would need
    cross-path reconciliation; use merge_join (and no mega-key) for
    outer.

    Bounds and assumptions (custom-operator rule): the right-side
    rows of hot keys must fit in one broadcast object
    (``max_hot_right_rows`` asserts it — the classic skew shape is a
    LEFT mega-key probing a small dimension slice, where this is
    tiny); the number of hot keys is <= total_rows/hot_threshold by
    construction, so the driver-side hot-key list is bounded. Both
    inputs are materialized once (three consumers: count, hot split,
    cold split — Ray re-executes lineage per consumer otherwise)."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"skew_join: unsupported how={how!r} (no outer)")
    if how in ("semi", "anti") and right_cols:
        raise ValueError(f"right_cols must be empty for how={how!r}")

    left = left.materialize()
    right = right.materialize()

    def key_counts(ds, col):
        def partial(t: pa.Table) -> pa.Table:
            arr = t.column(col)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            vc = pc.value_counts(arr)
            return pa.table(
                {
                    "k": vc.field("values"),
                    "c": vc.field("counts").cast(pa.int64()),
                }
            )

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("k")
            .aggregate(Sum("c", alias_name="c"))
        )

    hot = sorted(
        {
            r["k"]
            for side, col in ((left, left_on), (right, right_on))
            for r in key_counts(side, col)
            .filter(expr=f"c >= {hot_threshold}")
            .take_all()  # bounded: <= rows/threshold keys
        }
    )
    if stats is not None:
        stats["hot_keys"] = list(hot)
    if not hot:
        return merge_join(
            left, right, left_on, right_on, right_cols, how=how, suffix=suffix
        )
    hot_arr = pa.array(hot)

    def split(ds, col, keep_hot: bool):
        def f(t: pa.Table) -> pa.Table:
            m = pc.is_in(t.column(col), value_set=hot_arr)
            return t.filter(m if keep_hot else pc.invert(m))

        return ds.map_batches(f, batch_format="pyarrow")

    cold = merge_join(
        split(left, left_on, False),
        split(right, right_on, False),
        left_on,
        right_on,
        right_cols,
        how=how,
        suffix=suffix,
    )

    # broadcast fix-up: the right rows of hot keys, shipped ONCE
    right_schema = right.schema()
    rh_refs = ray.get(split(right, right_on, True).materialize().to_arrow_refs())
    rtab = pa.concat_tables(rh_refs).combine_chunks() if rh_refs else None
    if rtab is None or len(rtab) == 0:
        # a key hot on the LEFT only may have zero right rows: the
        # empty slice still needs the full right schema for the probe
        rtab = pa.schema(
            list(zip(right_schema.names, right_schema.types))
        ).empty_table()
    else:
        rtab = rtab.sort_by(right_on)
    if len(rtab) > max_hot_right_rows:
        raise ValueError(
            f"skew_join: hot right slice {len(rtab)} rows exceeds "
            f"max_hot_right_rows={max_hot_right_rows}; raise the cap or "
            "pre-aggregate the right side"
        )
    if stats is not None:
        stats["hot_right_rows"] = len(rtab)

    def _np_keys(col):
        a = col.to_numpy(zero_copy_only=False)
        return a.astype("U") if a.dtype == object else a

    rkeys = _np_keys(rtab.column(right_on))
    bref = ray.put((rkeys, rtab))

    left_schema = left.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right.schema().names, right.schema().types))
    payload_fields = [(c + suffix, right_types[c]) for c in right_cols]
    out_schema = pa.schema(
        [(n, left_types[n]) for n in left_names] + payload_fields
    )

    def probe(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return (
                out_schema.empty_table()
                if how in ("inner", "left")
                else t
            )
        rk, rt = ray.get(bref)
        keys = _np_keys(t.column(left_on))
        lo = np.searchsorted(rk, keys, "left")
        hi = np.searchsorted(rk, keys, "right")
        cnt = (hi - lo).astype(np.int64)
        if how == "semi":
            return t.filter(pa.array(cnt > 0))
        if how == "anti":
            return t.filter(pa.array(cnt == 0))
        total = int(cnt.sum())
        idx_l = np.repeat(np.arange(n, dtype=np.int64), cnt)
        base = np.repeat(lo, cnt)
        offs = np.repeat(np.cumsum(cnt) - cnt, cnt)
        idx_r = base + (np.arange(total, dtype=np.int64) - offs)
        take_l = pa.array(idx_l, pa.int64())
        cols = {
            nm: t.column(nm).combine_chunks().take(take_l)
            for nm in left_names
        }
        take_r = pa.array(idx_r, pa.int64())
        for (c, _typ), src in zip(payload_fields, right_cols):
            cols[c] = rt.column(src).take(take_r)
        matched = pa.table(cols, schema=out_schema)
        if how == "left":
            um = np.flatnonzero(cnt == 0)
            if len(um):
                t_um = t.take(pa.array(um, pa.int64()))
                cols2 = {nm: t_um.column(nm) for nm in left_names}
                for c, typ in payload_fields:
                    cols2[c] = pa.nulls(len(um), typ)
                matched = pa.concat_tables(
                    [matched, pa.table(cols2, schema=out_schema)]
                )
        return matched

    hot_out = split(left, left_on, True).map_batches(
        probe, batch_format="pyarrow"
    )
    return cold.union(hot_out)
