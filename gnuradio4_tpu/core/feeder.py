"""Threaded host feed pipeline: producer threads → native ring → scheduler.

≈ reference IO-bound thread pool + ring buffers between hardware sources and the
graph (thread_pool.hpp TaskType::IO_BOUND, BlockingSync.hpp): a producer thread
(file reader, socket, SDR driver) fills a :class:`~..native.ring.HostRing`; the
scheduler's feed path drains exactly one time-block per step. The ring absorbs
producer jitter so device dispatch never stalls on IO.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Iterable, Iterator

import numpy as np

from ..native.ring import HostRing


class ThreadedFeeder:
    """Pumps arrays from an iterator into a ring on a daemon thread."""

    def __init__(self, source: Iterable[np.ndarray] | Iterator[np.ndarray],
                 dtype, *, capacity_items: int = 1 << 20, name: str = "feeder"):
        self.ring = HostRing(capacity_items, dtype=dtype)
        # the consumer slot must exist BEFORE the producer thread starts, else
        # the writer (with no readers) runs ahead and early data is lost
        self.reader = self.ring.add_reader()
        self._iter = iter(source)
        self._name = name
        self._thread: threading.Thread | None = None
        self.error: Exception | None = None
        self._started = False

    def start(self) -> "ThreadedFeeder":
        if not self._started:
            self._started = True
            from ..utils import thread_pool
            self._thread = thread_pool.spawn(self._run, name=self._name)
        return self

    def _run(self) -> None:
        try:
            for chunk in self._iter:
                arr = np.asarray(chunk).ravel()
                done = 0
                while done < len(arr):
                    wrote = self.ring.write(arr[done:], block=True, timeout=1.0)
                    done += wrote
                    if wrote == 0 and self.ring.eos:
                        return
        except Exception as e:  # surface to the scheduler via error attr
            self.error = e
        finally:
            self.ring.set_eos()

    def stop(self) -> None:
        self.ring.set_eos()


def read_exact(ring: HostRing, reader: int, n: int, *, timeout: float = 30.0,
               allow_partial_on_eos: bool = True,
               wait: str = "sleep") -> np.ndarray | None:
    """Block until n items (or EOS). Returns None if EOS with nothing left.

    ``wait`` selects the back-off strategy (≈ reference WaitStrategy.hpp):
    'spin' (busy, lowest latency), 'yield' (sched_yield-ish), 'sleep' (default
    50 µs naps), 'block' (futex-parked in the kernel — zero CPU while waiting,
    woken directly by the producer's publish; ≈ BlockingWaitStrategy,
    WaitStrategy.hpp:54).
    """
    sleep_for = {"spin": 0.0, "yield": 0.0, "sleep": 50e-6, "block": None}[wait]
    if sleep_for is None:
        st = ring.wait_readable(reader, n, timeout=timeout)
        if st == -1:
            raise TimeoutError(f"ring feed starved (< {n} items for {timeout}s)")
    else:
        deadline = time.monotonic() + timeout
        while ring.readable(reader) < n:
            if ring.eos:
                break
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"ring feed starved (< {n} items for {timeout}s)")
            if wait == "yield":
                time.sleep(0)
            elif sleep_for:
                time.sleep(sleep_for)
    avail = ring.readable(reader)
    take = min(n, avail)
    if take == 0:
        return None
    out = np.array(ring.read(reader, take), copy=True)
    ring.release(reader, take)
    return out
