"""URL prefix/suffix filters (P20).

The reference builds tries for multi-pattern prefix/suffix membership
(`util/shared/PrefixStringMatcher.java:27`,
`SuffixStringMatcher.java:10`, `TrieStringMatcher.java:28`) to filter
URLs against pattern sets. Over Arrow batches the same operation is a
vectorized any-of match: for small pattern sets, OR-reduce
``pyarrow.compute`` starts_with/ends_with kernels; the driver-side
scalar API mirrors the reference's (shortestMatch/longestMatch).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


class PrefixMatcher:
    """Membership + shortest/longest match against a prefix set."""

    def __init__(self, prefixes):
        self.prefixes = sorted(set(prefixes), key=len)

    def matches(self, s: str) -> bool:
        return any(s.startswith(p) for p in self.prefixes)

    def shortest_match(self, s: str) -> str | None:
        for p in self.prefixes:  # sorted by length asc
            if s.startswith(p):
                return p
        return None

    def longest_match(self, s: str) -> str | None:
        best = None
        for p in self.prefixes:
            if s.startswith(p):
                best = p
        return best

    def mask(self, arr: pa.Array | pa.ChunkedArray) -> pa.Array:
        """Vectorized membership mask over a string column."""
        out = None
        for p in self.prefixes:
            m = pc.starts_with(arr, pattern=p)
            out = m if out is None else pc.or_(out, m)
        if out is None:
            import numpy as np

            return pa.array(np.zeros(len(arr), dtype=bool))
        return out


class SuffixMatcher:
    def __init__(self, suffixes):
        self.suffixes = sorted(set(suffixes), key=len)

    def matches(self, s: str) -> bool:
        return any(s.endswith(p) for p in self.suffixes)

    def shortest_match(self, s: str) -> str | None:
        for p in self.suffixes:
            if s.endswith(p):
                return p
        return None

    def longest_match(self, s: str) -> str | None:
        best = None
        for p in self.suffixes:
            if s.endswith(p):
                best = p
        return best

    def mask(self, arr: pa.Array | pa.ChunkedArray) -> pa.Array:
        out = None
        for p in self.suffixes:
            m = pc.ends_with(arr, pattern=p)
            out = m if out is None else pc.or_(out, m)
        if out is None:
            import numpy as np

            return pa.array(np.zeros(len(arr), dtype=bool))
        return out


def filter_by_prefix(ds, column: str, prefixes, keep_matching: bool = True):
    """Dataset-level URL prefix filter: vectorized mask inside
    map_batches (no row loop), then Arrow-level filter."""
    matcher = PrefixMatcher(prefixes)

    def fil(batch: pa.Table) -> pa.Table:
        mask = matcher.mask(batch.column(column))
        if not keep_matching:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(fil, batch_format="pyarrow")
