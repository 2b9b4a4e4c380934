"""Sharded query layer: cached, sorted, paginated query results.

Ray-Data re-expression of the reference's query framework
(`query/Query.java:48`, `query/QueryController.java:47`):

- **Cache key** — the reference caches results on HDFS keyed by
  `FP64(queryDomainId) + FP64(uniqueQueryParameters)`
  (`query/Query.java:792-808`). We key a parquet cache dir by the same
  two fingerprints (hex-joined).
- **Execute + sort + merge** — the reference spills per-shard sorted
  segments and k-way merges them (`query/Query.java:146-260`,
  `hadoop/mergeutils/SequenceFileMerger.java:51`). Here the body is a
  Ray Dataset pipeline; ``ds.sort`` IS the distributed sort-merge.
- **Attempt-dir atomicity** — results are written to a temp dir and
  renamed into place only when complete, mirroring the attempt-dir →
  final-path rename of `query/Query.java:246-260`.
- **Position index / pagination** — the reference writes an every-N
  (position, offset) index next to the sorted SequenceFile so page k
  is O(1) (`query/QueryResultFileIndex.java:173-318`). Parquet already
  gives us that index: the manifest records per-file row counts in
  global sort order, and :meth:`QueryResultHandle.page` reads ONLY the
  files covering the requested row range (row-group skip at read).

Scale: nothing here materializes on the driver except the manifest
(O(files)) and the requested page (O(page_size)).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.fingerprint import fp64

_DEFAULT_CACHE_ROOT = "/tmp/ccray_query_cache"
_LAYER_VERSION = "1"  # bump to invalidate caches on layout change


@dataclass(frozen=True)
class ShardedQuery:
    """A cacheable sorted query: distributed body + canonical identity.

    ``domain_id`` + ``params`` play the role of
    ``getQueryDomainId``/``getUniqueQueryParameters``
    (`query/Query.java:805-812`); ``sort_by`` plays
    ``ClientQueryInfo.sortByField`` (`query/query.jr:34-48`).
    """

    domain_id: str
    params: str
    sort_by: tuple = ()  # ((col, "ascending"|"descending"), ...)

    def cache_fp(self) -> str:
        d = fp64(self.domain_id) & 0xFFFFFFFFFFFFFFFF
        p = fp64(f"v{_LAYER_VERSION}|{self.params}|{self.sort_by!r}") & 0xFFFFFFFFFFFFFFFF
        return f"{d:016x}_{p:016x}"


@dataclass
class QueryResultHandle:
    """Sorted, cached query result + its pagination index."""

    result_dir: str
    manifest: dict = field(default_factory=dict)

    @property
    def total_rows(self) -> int:
        return self.manifest["total_rows"]

    def dataset(self):
        import ray.data as rd

        files = [os.path.join(self.result_dir, f["name"]) for f in self.manifest["files"]]
        return rd.read_parquet(files)

    def page(self, page_size: int, page_no: int) -> pa.Table:
        """Rows [page_no*page_size, ...) in global sort order, reading
        only the parquet files that cover the range (the analogue of
        `QueryResultFileIndex.readPaginatedResults`,
        `query/QueryResultFileIndex.java:220-318`)."""
        start = page_no * page_size
        stop = min(start + page_size, self.total_rows)
        if start >= stop:
            first = self.manifest["files"][0]["name"] if self.manifest["files"] else None
            if first is None:
                return pa.table({})
            return pq.read_table(os.path.join(self.result_dir, first)).slice(0, 0)
        out = []
        offset = 0
        for f in self.manifest["files"]:
            n = f["rows"]
            if offset + n <= start:
                offset += n
                continue
            if offset >= stop:
                break
            t = pq.read_table(os.path.join(self.result_dir, f["name"]))
            lo = max(0, start - offset)
            hi = min(n, stop - offset)
            out.append(t.slice(lo, hi - lo))
            offset += n
        return pa.concat_tables(out)

    def num_pages(self, page_size: int) -> int:
        return (self.total_rows + page_size - 1) // page_size


def _check_file_order(directory: str, files: list, primary_sort) -> None:
    """Fail loudly if the written files' parquet footer min/max stats on
    the primary sort key are not monotonic in filename order — the
    invariant the pagination manifest depends on (ADVICE r1 medium).
    Footer-only: no data pages are read."""
    col, direction = primary_sort
    lo_hi = []
    for name in files:
        md = pq.read_metadata(os.path.join(directory, name))
        names = md.schema.to_arrow_schema().names
        if col not in names or md.num_rows == 0:
            return  # nested/absent key or empty file: nothing checkable
        j = names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(j).statistics
            if st is None or not st.has_min_max:
                return  # stats unavailable: can't verify, don't false-alarm
            mins.append(st.min)
            maxs.append(st.max)
        lo_hi.append((min(mins), max(maxs)))
    descending = direction == "descending"
    for (lo_a, hi_a), (lo_b, hi_b), fa, fb in zip(lo_hi, lo_hi[1:], files, files[1:]):
        ok = (lo_b >= hi_a) if not descending else (hi_b <= lo_a)
        if not ok:
            raise RuntimeError(
                f"query result file order is not sorted on {col!r}: "
                f"{fa} [{lo_a!r},{hi_a!r}] vs {fb} [{lo_b!r},{hi_b!r}] — "
                "pagination manifest would serve misordered pages"
            )


class QueryCancelled(Exception):
    """Raised inside pipeline tasks when the controller's cancel flag
    is set; surfaces on the driver as the query run's terminal state."""


class QueryControl:
    """Progress + cancellation surface of a running sharded query — the
    analogue of the reference's per-query cancel flag and remote
    progress aggregation (`query/Query.java:214-230`,
    `cancelQuery`/`getPercentComplete`).

    Backed by a zero-cpu Ray actor every pipeline worker probes
    cooperatively (per batch, rate-limited): rows flow in as progress,
    the cancel flag aborts the streaming job at the next probe. Cheap
    at scale — one actor round-trip per worker per ``probe_interval``
    seconds, not per batch.
    """

    def __init__(self, probe_interval: float = 0.5):
        import ray

        @ray.remote(num_cpus=0)
        class _Ctl:
            def __init__(self):
                self._cancelled = False
                self._rows = 0

            def cancel(self):
                self._cancelled = True

            def add_rows(self, n: int) -> bool:
                self._rows += int(n)
                return self._cancelled

            def snapshot(self):
                return {"rows": self._rows, "cancelled": self._cancelled}

        self._actor = _Ctl.remote()
        self.probe_interval = probe_interval

    def cancel(self) -> None:
        import ray

        ray.get(self._actor.cancel.remote())

    def progress(self) -> dict:
        import ray

        return ray.get(self._actor.snapshot.remote())

    def probe_fn(self):
        """Identity ``map_batches`` stage reporting rows and honouring
        cancel. Worker-local state rate-limits actor traffic."""
        import time

        import ray

        actor = self._actor
        interval = self.probe_interval
        state = {"pending": 0, "last": 0.0}

        def probe(t: pa.Table) -> pa.Table:
            state["pending"] += t.num_rows
            now = time.monotonic()
            if now - state["last"] >= interval:
                if ray.get(actor.add_rows.remote(state["pending"])):
                    raise QueryCancelled("query cancelled by controller")
                state["pending"] = 0
                state["last"] = now
            return t

        return probe


def run_query(
    query: ShardedQuery,
    body,
    cache_root: str = _DEFAULT_CACHE_ROOT,
    use_cache: bool = True,
    control: QueryControl | None = None,
) -> QueryResultHandle:
    """Run (or serve from cache) a sharded query.

    ``body()`` -> ray.data.Dataset (unsorted); this function sorts it
    by ``query.sort_by``, writes the result dir atomically, and builds
    the pagination manifest. A second call with the same
    (domain_id, params, sort_by) is a pure cache read — the analogue of
    `QueryController.runCacheQuery` (`query/QueryController.java:623`).

    ``control`` (optional) attaches a :class:`QueryControl` probe stage
    so the run reports row progress and honours ``control.cancel()``
    (raising :class:`QueryCancelled`; the attempt dir is cleaned up and
    no cache entry appears).
    """
    result_dir = os.path.join(cache_root, query.cache_fp())
    man_path = os.path.join(result_dir, "manifest.json")
    if use_cache and os.path.isfile(man_path):
        with open(man_path) as f:
            return QueryResultHandle(result_dir, json.load(f))

    ds = body()
    if control is not None:
        ds = ds.map_batches(
            control.probe_fn(), batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )
    if query.sort_by:
        cols = [c for c, _ in query.sort_by]
        desc = [d == "descending" for _, d in query.sort_by]
        ds = ds.sort(cols, descending=desc)

    attempt = os.path.join(cache_root, f".attempt-{query.cache_fp()}-{uuid.uuid4().hex[:8]}")
    os.makedirs(attempt, exist_ok=True)
    # The manifest equates lexicographic FILE order with global sort
    # order, which holds only when the writer receives blocks in
    # partition order — undocumented with preserve_order unset (any
    # added stage or Ray upgrade could scramble it, ADVICE r1 medium).
    # Force ordered execution for the write, then VERIFY below.
    import ray.data as rd

    exec_opts = rd.DataContext.get_current().execution_options
    prev_preserve = exec_opts.preserve_order
    exec_opts.preserve_order = True
    try:
        ds.write_parquet(attempt)
    except Exception:
        # cancelled or failed mid-write: no partial attempt dirs left
        # behind (the reference deletes the attempt path on error,
        # query/Query.java:246-260)
        shutil.rmtree(attempt, ignore_errors=True)
        raise
    finally:
        exec_opts.preserve_order = prev_preserve

    # Build the pagination index. Ray writes one file per block with
    # the block's position in the filename (verified: after ds.sort,
    # lexicographic filename order == global sort order), so the
    # manifest is just (name, rows) in filename order — row counts from
    # parquet footers only, no data read.
    files = sorted(f for f in os.listdir(attempt) if f.endswith(".parquet"))
    keyed = [(name, pq.read_metadata(os.path.join(attempt, name)).num_rows) for name in files]
    if query.sort_by:
        _check_file_order(attempt, files, query.sort_by[0])
    from ..state import counters as _skew

    manifest = {
        "query": {"domain_id": query.domain_id, "params": query.params},
        "sort_by": [list(s) for s in query.sort_by],
        "total_rows": int(sum(r for _, r in keyed)),
        "files": [{"name": n, "rows": int(r)} for n, r in keyed],
        # "no silent caps": skipped-bucket counters from any capped
        # operator that ran in this session (state/counters.py)
        "skew_counters": _skew.snapshot(),
    }
    tmp_man = os.path.join(attempt, "manifest.json.tmp")
    with open(tmp_man, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp_man, os.path.join(attempt, "manifest.json"))

    os.makedirs(cache_root, exist_ok=True)
    if os.path.isdir(result_dir):
        shutil.rmtree(attempt, ignore_errors=True)  # lost the race; cache exists
    else:
        try:
            os.replace(attempt, result_dir)
        except OSError:
            shutil.rmtree(attempt, ignore_errors=True)
    with open(man_path) as f:
        return QueryResultHandle(result_dir, json.load(f))
