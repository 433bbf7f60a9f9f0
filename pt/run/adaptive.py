"""Adaptive samples-per-frame controller.

Port of the reference's refresh-rate-targeted controller
(Renderer::OnUpdate, Renderer.cpp:1615-1657): keep the last MinRefreshRate
frame times; if their sum stays below ~1 s the framerate is above target —
after 2 s of stability increase spp by 1; if above the threshold, decrease
after 10 s. Exact thresholds and hysteresis preserved.
"""

from __future__ import annotations

from collections import deque


class AdaptiveSampleController:
    def __init__(self, min_refresh_rate: float = 60.0,
                 max_samples_per_frame: int = 64):
        self.min_refresh_rate = max(1.0, min_refresh_rate)
        self.max_samples_per_frame = max_samples_per_frame
        self.samples_per_frame = 1
        self._timings: deque = deque()
        self._time_sum = 0.0
        self._since_reset = 0.0
        self._increase_threshold = 0.0   # first increase allowed immediately
        self._decrease_threshold = 1.0

    def on_update(self, dt: float) -> int:
        """Feed one frame time; returns the samples-per-frame to use."""
        window = int(self.min_refresh_rate)
        if len(self._timings) == window:
            self._time_sum -= self._timings.popleft()
        self._time_sum += dt
        self._timings.append(dt)

        threshold = (self.min_refresh_rate + 1) / self.min_refresh_rate

        if (self._since_reset > self._increase_threshold
                and self._time_sum < threshold
                and self.samples_per_frame < self.max_samples_per_frame):
            self._increase_threshold = 2.0
            self.samples_per_frame += 1
            self._since_reset = 0.0
        elif (self._since_reset > self._decrease_threshold
              and self._time_sum > threshold
              and self.samples_per_frame > 1):
            self._increase_threshold = 10.0
            self.samples_per_frame -= 1
            self._since_reset = 0.0
        else:
            self._since_reset += dt
        return self.samples_per_frame
