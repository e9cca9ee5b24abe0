"""MemoryMonitor (≈ reference core thread/MemoryMonitor.hpp): samples host RSS /
device HBM usage for observability."""

from __future__ import annotations

import threading
import time


def rss_bytes() -> int:
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        import os
        return pages * os.sysconf("SC_PAGESIZE")
    except Exception:
        return 0


def device_memory_stats() -> dict:
    try:
        import jax
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        return dict(stats) if stats else {}
    except Exception:
        return {}


class MemoryMonitor:
    """Background sampler of host RSS (and device stats when available)."""

    def __init__(self, interval_s: float = 1.0, maxlen: int = 600):
        self.interval = interval_s
        self.samples: list[tuple[float, int]] = []
        self.maxlen = maxlen
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> "MemoryMonitor":
        if self._thread is None:
            from . import thread_pool
            self._thread = thread_pool.spawn(self._run, name="memory-monitor")
        return self

    def _run(self):
        while not self._stop.is_set():
            self.samples.append((time.monotonic(), rss_bytes()))
            del self.samples[:-self.maxlen]
            self._stop.wait(self.interval)

    def stop(self):
        self._stop.set()

    @property
    def peak_rss(self) -> int:
        return max((s for _, s in self.samples), default=rss_bytes())
