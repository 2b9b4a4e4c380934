"""Throughput/metric primitives: moving & smoothed averages, the
bandwidth speed-history ring, and the 1-second-window rate limiter.

Parity ports (SURVEY §2.5 A3 / §2.3 T6 primitives):

- :class:`MovingAverage` == ``util/shared/MovingAverage.java:11``
  (bounded FIFO of samples, arithmetic mean recomputed per add).
- :class:`SmoothedAverage` == ``util/shared/SmoothedAverage.java:9``
  (EWMA seeded with the first observation).
- :class:`BandwidthHistory` == ``util/shared/BandwidthUtils.java:37-156``
  (wget-style speed ring: 20 samples of >=150 ms each, 5 s stall
  detection that resets the ring, in-progress sample folded into
  calc_speed).
- :class:`RateLimiter` == ``BandwidthUtils.RateLimiter`` (1-second
  byte windows: the window resets when >=1000 ms old; available =
  desired_bytes_per_sec - bytes_accumulated_this_window)
  — the primitive behind the crawl's politeness pacing
  (``BandwidthUtils.java:158-207``).

All classes take an injectable ``clock`` (→ epoch millis) so behavior
is testable deterministically; default is wall clock like the
reference.
"""

from __future__ import annotations

import time
from collections import deque

SPEED_HISTORY_SIZE = 20
SPEED_SAMPLE_MIN = 150
STALL_START_TIME = 5000

_BYTE_UNITS = ["B/s", "KB/s", "MB/s", "GB/s"]
_BIT_UNITS = ["b/s", "Kb/s", "Mb/s", "Gb/s"]


def _wall_ms() -> int:
    return int(time.time() * 1000)


class MovingAverage:
    def __init__(self, sample_size: int):
        self._samples: deque = deque(maxlen=sample_size)
        self._average = 0.0

    def add_sample(self, value: float) -> float:
        self._samples.append(value)  # deque(maxlen) drops the oldest
        self._average = sum(self._samples) / len(self._samples)
        return self._average

    def get_average(self) -> float:
        return self._average


class SmoothedAverage:
    def __init__(self, alpha: float):
        self._alpha = alpha
        self._n = 0
        self._value = 0.0

    def add_sample(self, value: float) -> float:
        if self._n == 0:
            self._value = value
        else:
            self._value = self._alpha * value + (1 - self._alpha) * self._value
        self._n += 1
        return self._value

    def get_average(self) -> float:
        return self._value


class BandwidthHistory:
    """wget-style speed history ring (BandwidthUtils.java:37-156)."""

    def __init__(self, clock=_wall_ms):
        self._clock = clock
        self.pos = 0
        self.times = [0] * SPEED_HISTORY_SIZE
        self.bytes = [0] * SPEED_HISTORY_SIZE
        self.total_time = 0
        self.total_bytes = 0
        self.recent_bytes = 0
        self.recent_start = 0
        self.stalled = False

    def _reset(self):
        # zero the WHOLE ring (wget's speed-history reset): leaving
        # stale slots would make later commits subtract pre-stall
        # samples from freshly-zeroed totals, driving them negative
        self.pos = 0
        self.recent_bytes = 0
        self.times = [0] * SPEED_HISTORY_SIZE
        self.bytes = [0] * SPEED_HISTORY_SIZE
        self.total_time = 0
        self.total_bytes = 0

    def update(self, n_bytes: int) -> None:
        if self.recent_start == 0:
            self.recent_start = self._clock()
        curr = self._clock()
        recent_age = int(curr - self.recent_start)
        self.recent_bytes += n_bytes
        if recent_age < SPEED_SAMPLE_MIN:
            return
        if n_bytes == 0:
            if recent_age >= STALL_START_TIME:
                self.stalled = True
                self._reset()
            return
        if self.stalled:
            self.stalled = False
            recent_age = 1
        self.total_time -= self.times[self.pos]
        self.total_bytes -= self.bytes[self.pos]
        self.times[self.pos] = recent_age
        self.bytes[self.pos] = self.recent_bytes
        self.total_time += recent_age
        self.total_bytes += self.recent_bytes
        self.recent_start = curr
        self.recent_bytes = 0
        self.pos = (self.pos + 1) % SPEED_HISTORY_SIZE

    def calc_speed(self) -> dict:
        """-> dict of bytes/bits per second + human-scaled values, the
        BandwidthStats fields (BandwidthUtils.java:24-35, 115-149)."""
        amount = self.total_bytes + self.recent_bytes
        t = self.total_time
        if self.recent_start != 0 and not self.stalled:
            t += int(self._clock() - self.recent_start)
        bps = (amount / (t / 1000.0)) if t > 0 else 0.0
        out = {
            "bytes_per_second": bps,
            "bits_per_second": bps * 8,
        }
        scaled, unit = bps, _BYTE_UNITS[0]
        for u in _BYTE_UNITS[1:]:
            if scaled >= 1024.0:
                scaled /= 1024.0
                unit = u
        out["scaled_bytes_per_second"] = scaled
        out["scaled_bytes_units"] = unit
        sbits, bunit = bps * 8, _BIT_UNITS[0]
        for u in _BIT_UNITS[1:]:
            if sbits >= 1024.0:
                sbits /= 1024.0
                bunit = u
        out["scaled_bits_per_second"] = sbits
        out["scaled_bits_units"] = bunit
        return out


class RateLimiter:
    """1-second byte-window limiter (BandwidthUtils.java:158-207)."""

    def __init__(self, max_bits_per_second: int, clock=_wall_ms):
        self._desired_bytes = max_bits_per_second // 8
        self._history = BandwidthHistory(clock)
        self._clock = clock
        self._window_start = 0
        self._accumulated = 0

    def check_rate_limit(self, bytes_available: int) -> int:
        curr = self._clock()
        if self._window_start == 0 or (curr - self._window_start) >= 1000:
            self._window_start = curr
            self._accumulated = 0
        return min(self._desired_bytes - self._accumulated, bytes_available)

    def update_stats(self, n_bytes: int) -> None:
        self._accumulated += n_bytes
        self._history.update(n_bytes)

    def get_stats(self) -> dict:
        return self._history.calc_speed()
