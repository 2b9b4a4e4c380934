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

    def budget_for_epoch(self, carried_tokens: int) -> int:
        """Tokens available this epoch given carry-over (capped)."""
        return min(self.burst, carried_tokens + self.refill)


def select_within_host(
    rows: list[tuple[float, int]], budget: int
) -> tuple[list[int], list[int]]:
    """rows = [(priority, url_fp)] for one host -> (selected_idx,
    deferred_idx) in deterministic order (priority desc, url_fp asc)."""
    order = sorted(range(len(rows)), key=lambda i: (-rows[i][0], rows[i][1]))
    return order[:budget], order[budget:]
