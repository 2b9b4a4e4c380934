"""Per-host politeness budget — token buckets at epoch granularity.

The reference's only rate primitive is the byte-bandwidth RateLimiter
(``util/shared/BandwidthUtils.java:158-207``: 1-second token windows,
window-reset refill). Our crawl loop is epoch-batched (SURVEY §2.9), so
the token bucket refills per epoch: a host may be fetched at most
``burst`` times in one epoch and accrues ``refill`` tokens per epoch up
to ``burst`` — the same accumulate-and-cap shape as the reference's
window reset, with the epoch as the window.

Selection within a host is deterministic: candidates sorted by
(priority desc, url_fp asc); ties cannot occur (url_fp is unique).
This module is pure (no actor needed): the budget state is a tiny
per-host int carried in the frontier checkpoint, and the groupby(host)
shuffle already co-locates each host's candidates (SURVEY §7 step 6).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PolitenessPolicy:
    burst: int = 4  # max fetches per host per epoch (bucket capacity)
    refill: int = 4  # tokens added per epoch
    # Crawl-delay honoring (RFC 9309's de-facto extension): when set,
    # an epoch is treated as a nominal window of this many wall
    # seconds, so a host declaring ``Crawl-delay: d`` gets a per-epoch
    # budget cap of max(1, floor(epoch_seconds / d)) — at least one
    # fetch per epoch so the frontier always drains. None (default)
    # ignores declared delays entirely, preserving the historical
    # scalar-budget behavior bit-for-bit.
    epoch_seconds: float | None = None

    def budget_for_epoch(self, carried_tokens: int) -> int:
        """Tokens available this epoch given carry-over (capped)."""
        return min(self.burst, carried_tokens + self.refill)

    def host_budgets(self, base: int, delays) -> "np.ndarray":
        """Vectorized per-host budgets: ``base`` capped by each host's
        declared Crawl-delay under the epoch_seconds window. ``delays``
        is a float array with NaN for hosts that declare no delay."""
        import numpy as np

        delays = np.asarray(delays, dtype=np.float64)
        out = np.full(len(delays), base, dtype=np.int64)
        if self.epoch_seconds is None:
            return out
        has = np.isfinite(delays) & (delays > 0)
        caps = np.maximum(
            1, np.floor(self.epoch_seconds / delays[has]).astype(np.int64)
        )
        out[has] = np.minimum(base, caps)
        return out


def select_within_host(
    rows: list[tuple[float, int]], budget: int
) -> tuple[list[int], list[int]]:
    """rows = [(priority, url_fp)] for one host -> (selected_idx,
    deferred_idx) in deterministic order (priority desc, url_fp asc)."""
    order = sorted(range(len(rows)), key=lambda i: (-rows[i][0], rows[i][1]))
    return order[:budget], order[budget:]
