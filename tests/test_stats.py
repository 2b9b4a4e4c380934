"""MovingAverage / SmoothedAverage / BandwidthHistory / RateLimiter
parity (reference util/shared/{MovingAverage,SmoothedAverage,
BandwidthUtils}.java) with a deterministic injected clock."""

from commoncrawl_ray.functions.stats import (
    BandwidthHistory,
    MovingAverage,
    RateLimiter,
    SmoothedAverage,
)


class FakeClock:
    def __init__(self, t0=1_000_000):
        self.t = t0

    def __call__(self):
        return self.t

    def advance(self, ms):
        self.t += ms


def test_moving_average_window():
    ma = MovingAverage(3)
    assert ma.add_sample(3) == 3
    assert ma.add_sample(6) == 4.5
    assert ma.add_sample(9) == 6
    # window full: 3 drops out
    assert ma.add_sample(12) == 9
    assert ma.get_average() == 9


def test_smoothed_average_seeded_by_first():
    sa = SmoothedAverage(0.5)
    assert sa.add_sample(10) == 10  # first observation seeds
    assert sa.add_sample(20) == 15
    assert sa.add_sample(0) == 7.5
    assert sa.get_average() == 7.5


def test_bandwidth_history_speed_and_stall():
    clk = FakeClock()
    h = BandwidthHistory(clock=clk)
    # sub-150ms updates only accumulate
    h.update(1000)
    clk.advance(100)
    h.update(1000)
    assert h.total_bytes == 0 and h.recent_bytes == 2000
    # crossing the 150ms minimum commits a sample
    clk.advance(100)
    h.update(1000)
    assert h.total_bytes == 3000 and h.total_time == 200
    s = h.calc_speed()
    assert s["bytes_per_second"] == 3000 / 0.2
    assert s["scaled_bytes_units"] == "KB/s"
    # 5s of zero-byte updates => stall resets the ring
    clk.advance(5000)
    h.update(0)
    assert h.stalled and h.total_bytes == 0
    # recovery commits with recent_age forced to 1ms
    clk.advance(200)
    h.update(500)
    assert not h.stalled and h.total_time == 1 and h.total_bytes == 500


def test_rate_limiter_one_second_windows():
    clk = FakeClock()
    rl = RateLimiter(8000, clock=clk)  # 1000 bytes/sec
    assert rl.check_rate_limit(4096) == 1000
    rl.update_stats(900)
    assert rl.check_rate_limit(4096) == 100
    rl.update_stats(100)
    # exhausted within the window
    assert rl.check_rate_limit(4096) == 0
    # window rolls after >=1000 ms
    clk.advance(1000)
    assert rl.check_rate_limit(4096) == 1000


def test_bandwidth_history_stall_clears_whole_ring():
    """A stall reset must zero every ring slot: stale pre-stall samples
    would otherwise be subtracted from freshly-zeroed totals on later
    commits, corrupting (even negating) the speed calculation."""
    clk = FakeClock()
    h = BandwidthHistory(clock=clk)
    for _ in range(3):  # commit 3 samples of 200ms / 1000 bytes
        clk.advance(200)
        h.update(1000)
    assert h.total_bytes == 3000
    clk.advance(5000)
    h.update(0)  # stall -> full reset
    assert h.stalled
    # two post-stall commits walk over previously-stale slots
    clk.advance(200)
    h.update(500)
    clk.advance(200)
    h.update(500)
    assert h.total_bytes == 1000 and h.total_time >= 0
    assert h.calc_speed()["bytes_per_second"] > 0
