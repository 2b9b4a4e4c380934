"""Cluster-wide skip/skew counters — the "no silent caps" rule.

Capped operators (``minhash_lsh_pairs``, ``simhash_near_dup``,
``ngram_jaccard_pairs``, the crawl per-host budget combiner) skip work
when a bucket/group exceeds a width guard.  At 100 TB an operator that
silently skips a mega-bucket reads as "covered everything", so every
skip is counted here and surfaced in run manifests.

Implementation: one tiny named Ray actor (``num_cpus=0``) per cluster,
created lazily with ``get_if_exists`` so concurrent map workers race
safely.  Increments are *synchronous* (the worker waits for the ack):
skip events are rare by construction, and the round-trip makes the
driver-side ``snapshot()`` exact once the pipeline has finished — no
fire-and-forget reordering.

The reference's analogue is the Hadoop counter enum threaded through
the merge (``hadoop/mergeutils/SequenceFileMerger.java:53-57``).
"""

from __future__ import annotations

import ray

_ACTOR_NAME = "ccray_skew_counters"
_NAMESPACE = "ccray_counters"


@ray.remote(num_cpus=0)
class _SkewCounters:
    def __init__(self) -> None:
        self._c: dict[str, int] = {}

    def add(self, items: dict[str, int]) -> None:
        for k, v in items.items():
            self._c[k] = self._c.get(k, 0) + int(v)

    def snapshot(self) -> dict[str, int]:
        return dict(self._c)

    def reset(self) -> None:
        self._c.clear()


def get_counters(create: bool = True):
    """Handle to the cluster's counter actor (or None when absent)."""
    if not ray.is_initialized():
        return None
    try:
        return ray.get_actor(_ACTOR_NAME, namespace=_NAMESPACE)
    except ValueError:
        if not create:
            return None
        # detached: counters are usually created from inside map-worker
        # tasks, and a non-detached named actor dies with its creating
        # task. One num_cpus=0 actor per cluster; dies with the cluster.
        return _SkewCounters.options(
            name=_ACTOR_NAME,
            namespace=_NAMESPACE,
            get_if_exists=True,
            lifetime="detached",
        ).remote()


def count_skip(op: str, *, buckets: int = 0, rows: int = 0, pairs_avoided: int = 0) -> None:
    """Record that ``op`` skipped ``buckets`` over-wide buckets spanning
    ``rows`` member rows (≙ ``pairs_avoided`` suppressed pair outputs).

    Synchronous on purpose — see module docstring. No-op outside Ray.
    """
    a = get_counters(create=True)
    if a is None:
        return
    items = {f"{op}.skipped_buckets": buckets}
    if rows:
        items[f"{op}.skipped_rows"] = rows
    if pairs_avoided:
        items[f"{op}.pairs_avoided"] = pairs_avoided
    ray.get(a.add.remote(items))


def snapshot() -> dict[str, int]:
    """Current counter values (empty when no skips have occurred)."""
    a = get_counters(create=False)
    if a is None:
        return {}
    return ray.get(a.snapshot.remote())


def reset() -> None:
    a = get_counters(create=False)
    if a is not None:
        ray.get(a.reset.remote())
