"""Distributed connected components over a near-dup pair table.

Near-dup pairs (MinHash/SimHash/embedding LSH) are edges; dedup keeps
one document per CONNECTED COMPONENT, not per pair — a–b and b–c must
collapse a, b, c together. Implemented as Hash-to-Min (Rastogi et al.
2013, "Finding Connected Components in Map-Reduce in Logarithmic
Rounds") on Ray Data:

- state is a directed tuple table (u, v) = "u knows v is in its
  component", seeded with both directions of every input pair;
- each round, every node u takes C_u = {u} ∪ {its tuples}, computes
  m = min(C_u), and emits (x, m) for every x in C_u plus (m, x) for
  every x in C_u — the min spreads to all members and the min node
  accumulates the membership list;
- at the fixpoint every non-min node holds exactly {m} and the min
  node holds the whole component, so ``min(C_u)`` is the component id.

One round == ONE all-to-all (the ``groupby(u).map_groups`` sort) plus
a cheap block-parallel sum for the fixpoint test; hash-to-min
converges in O(log n) rounds. Fixpoint detection: each emitted row
carries two independent 31-bit mixes of (u, v); the pair of dataset
sums is a multiset fingerprint (sums fit int64 up to ~4e9 rows), and
an unchanged fingerprint means the tuple set reached the paper's
termination condition, which is what guarantees correct labels —
label-sum stability alone can plateau mid-run.

Each round materializes only the TUPLE table — pairs-scale, orders of
magnitude smaller than the corpus (the documented exception to the
no-mid-pipeline-materialize rule: iterative algorithms need a barrier
per round, and re-executing k rounds of lineage each round would be
O(k^2)). Partitioning assumption: one component's membership list
lands in the min node's single group, so the LARGEST duplicate
cluster must fit a worker's heap — the standard hash-to-min bound; if
a corpus has giga-clusters, alternate large-star/small-star instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Min

# two independent odd multipliers for the 31-bit multiset fingerprints
_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)
_MASK31 = np.uint64(0x7FFFFFFF)


def _fingerprint_cols(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row 31-bit mixes of (u, v); their dataset sums fingerprint
    the tuple multiset without int64 overflow below ~4e9 rows."""
    with np.errstate(over="ignore"):
        a = u.astype(np.uint64) * _MIX1 + v.astype(np.uint64) * _MIX2
        a ^= a >> np.uint64(29)
        b = a * _MIX2
        b ^= b >> np.uint64(32)
    h1 = (a & _MASK31).astype(np.int64)
    h2 = (b & _MASK31).astype(np.int64)
    return h1, h2


def _emit_group(group: pa.Table) -> pa.Table:
    """One hash-to-min round for one node's tuple set."""
    u = group.column("u")[0].as_py()
    v = group.column("v").to_numpy(zero_copy_only=False)
    members = np.unique(np.append(v, np.int64(u)))
    m = members[0]
    # (x, m) for all x; (m, x) for all x — dedup the doubled (m, m)
    src = np.concatenate([members, np.full(len(members), m, dtype=np.int64)])
    dst = np.concatenate([np.full(len(members), m, dtype=np.int64), members])
    uniq = np.unique(np.stack([src, dst], axis=1), axis=0)
    src, dst = uniq[:, 0], uniq[:, 1]
    h1, h2 = _fingerprint_cols(src, dst)
    return pa.table(
        {
            "u": pa.array(src, pa.int64()),
            "v": pa.array(dst, pa.int64()),
            "h1": pa.array(h1, pa.int64()),
            "h2": pa.array(h2, pa.int64()),
        }
    )


def connected_components(
    pairs,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
    parts: int = 8,
):
    """pairs: Dataset with two int64 id columns (undirected edges).
    -> Dataset (doc_id, component_id) for every id appearing in pairs;
    component_id = smallest doc_id in the component.

    ``parts`` bounds the block count of the loop-carried tuple table:
    each sort/groupby otherwise MULTIPLIES block counts round over
    round (measured: a 40-row input ballooned to a 9 GB driver-memory
    shuffle estimate by round ~6), and per-block task overhead — not
    data — dominates. Size it to the pair-table scale."""
    import ray.data as rd

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        h1, h2 = _fingerprint_cols(src, dst)
        return pa.table(
            {
                "u": pa.array(src, pa.int64()),
                "v": pa.array(dst, pa.int64()),
                "h1": pa.array(h1, pa.int64()),
                "h2": pa.array(h2, pa.int64()),
            }
        )

    # materialize ONCE: tuples are pair-scale (small), and every round
    # below consumes them — without the barrier each round would
    # re-execute the full upstream pair-producing pipeline
    tuples = (
        pairs.map_batches(both_dirs, batch_format="pyarrow")
        .repartition(parts)
        .materialize()
    )
    if tuples.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "component_id": pa.array([], pa.int64()),
                }
            )
        )

    prev_fp = None
    for _ in range(max_rounds):
        tuples = (
            tuples.groupby("u")
            .map_groups(_emit_group, batch_format="pyarrow")
            .repartition(parts)
            .materialize()
        )
        sums = tuples.sum(["h1", "h2"])
        fp = (sums["sum(h1)"], sums["sum(h2)"])
        if fp == prev_fp:
            break
        prev_fp = fp

    return (
        tuples.groupby("u")
        .aggregate(Min("v", alias_name="component_id"))
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t.column("u"),
                    "component_id": t.column("component_id"),
                }
            ),
            batch_format="pyarrow",
        )
    )


def label_propagation(edge_ds, iters: int = 5, parts: int = 8):
    """Synchronous label propagation (Raghavan, Albert & Kumara 2007,
    "Near linear time algorithm to detect community structures") over
    a raw directed (src, dst) string edge Dataset, viewed undirected:
    every node starts as its own label; each round every node adopts
    the most frequent label among its distinct neighbors (tie ->
    smallest FNV-1a label id — deterministic; the paper breaks ties
    uniformly at random). Fixed ``iters`` rounds, no early exit —
    synchronous LPA can oscillate on bipartite structures, and a
    fixed round count keeps the oracle comparison exact.

    Scale shape (the pagerank_edges discipline, hash wire per the
    dup_passages discipline): hosts are FNV-1a-hashed to int64 at the
    edge build, so the loop carries ONLY int64 triples — no string
    ever rides the per-round exchanges. The undirected distinct
    neighbor table is built ONCE and materialized (edge-scale, two
    int64 columns); each round moves it once through the union+sort
    merge_join that attaches neighbor labels, then a (node,
    label)-keyed groupby count and a sort(node) co-partitioned
    block-local numpy argmax (equal sort keys co-locate in one block
    — the repo's standing guarantee). The loop-carried label table is
    node-scale and re-materialized per round; host strings come back
    only in the final two node-scale translation joins. Collisions:
    two hosts sharing an FNV-1a id would merge (~V^2/2^64,
    negligible; the same bound every hash-wire op documents).
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.minhash import fnv1a_batch
    from .joins import merge_join
    from .pagerank import _distinct_sorted

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src")
        d = t.column("dst")
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        d = d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d
        si = fnv1a_batch(s).view(np.int64)
        di = fnv1a_batch(d).view(np.int64)
        return pa.table(
            {
                "u": pa.array(np.concatenate([si, di])),
                "v": pa.array(np.concatenate([di, si])),
                "u_host": pa.concat_arrays([s, d]),
            }
        )

    def drop_self(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t.column("u"), t.column("v")))

    hashed = edge_ds.map_batches(both_dirs, batch_format="pyarrow")
    und = (
        _distinct_sorted(
            hashed.map_batches(
                lambda t: t.select(["u", "v"]), batch_format="pyarrow"
            ),
            ["u", "v"],
        )
        .map_batches(drop_self, batch_format="pyarrow")
        .repartition(parts)
        .materialize()
    )
    # node-scale (id, host) map — strings leave the loop entirely and
    # come back only in the final translation joins
    id_host = (
        _distinct_sorted(
            hashed.map_batches(
                lambda t: pa.table(
                    {"id": t.column("u"), "host": t.column("u_host")}
                ),
                batch_format="pyarrow",
            ),
            ["id"],
        )
        .repartition(parts)
        .materialize()
    )

    labels = (
        _distinct_sorted(
            und.map_batches(
                lambda t: pa.table({"u": t.column("u")}), batch_format="pyarrow"
            ),
            ["u"],
        )
        .map_batches(
            lambda t: pa.table(
                {"node": t.column("u"), "label": t.column("u")}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def pick(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("count()").to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((lab, -c, u))  # u asc, count desc, label asc
        u_s, l_s = u[order], lab[order]
        first = np.ones(len(u_s), dtype=bool)
        first[1:] = u_s[1:] != u_s[:-1]
        return pa.table(
            {
                "node": pa.array(u_s[first]),
                "label": pa.array(l_s[first]),
            }
        )

    for _ in range(iters):
        votes = merge_join(und, labels, "v", "node", ["label"], how="inner")
        labels = (
            votes.groupby(["u", "label"])
            .count()
            .sort("u")
            .map_batches(pick, batch_format="pyarrow", batch_size=None)
            .repartition(parts)
            .materialize()
        )

    named = merge_join(labels, id_host, "node", "id", ["host"], how="inner")
    named = merge_join(
        named,
        id_host.map_batches(
            lambda t: pa.table(
                {"id": t.column("id"), "community": t.column("host")}
            ),
            batch_format="pyarrow",
        ),
        "label",
        "id",
        ["community"],
        how="inner",
    )
    return named.map_batches(
        lambda t: t.select(["host", "community"]), batch_format="pyarrow"
    )
