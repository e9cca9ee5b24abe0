"""chrome://tracing profiler (≈ reference core Profiler.hpp).

Same event taxonomy as the reference (Complete 'X', Instant 'i', Counter 'C',
Begin/End 'B'/'E'; Profiler.hpp:29) and the same consumption path: write a JSON
trace loadable in chrome://tracing / Perfetto. Per-thread lock-free-ish buffers
(list-append is atomic under the GIL ≈ the reference's per-thread ring handlers,
Profiler.hpp:247). A :class:`NullProfiler` keeps the disabled path free
(Profiler.hpp:136-153). Device-side timing comes from JAX profiler integration
(:meth:`Profiler.jax_trace`)."""

from __future__ import annotations

import json
import threading
import time
from contextlib import contextmanager
from typing import Any

_t0 = time.perf_counter_ns()


def _now_us() -> float:
    return (time.perf_counter_ns() - _t0) / 1e3


class NullProfiler:
    """Zero-overhead stand-in; all methods are no-ops."""

    enabled = False

    @contextmanager
    def duration(self, name: str, **args: Any):
        yield

    def instant(self, name: str, **args: Any) -> None: ...
    def counter(self, name: str, **values: float) -> None: ...
    def begin(self, name: str, **args: Any) -> None: ...
    def end(self, name: str) -> None: ...
    def write(self, path: str) -> None: ...
    def events(self) -> list[dict]:
        return []

    @contextmanager
    def jax_trace(self, logdir: str):
        yield


class Profiler(NullProfiler):
    """Collects trace events; thread-safe via per-thread buffers."""

    enabled = True

    def __init__(self, process_name: str = "gnuradio4_tpu"):
        self._local = threading.local()
        self._buffers: list[list[dict]] = []
        self._lock = threading.Lock()
        self.process_name = process_name

    def _buf(self) -> list[dict]:
        buf = getattr(self._local, "buf", None)
        if buf is None:
            buf = []
            self._local.buf = buf
            with self._lock:
                self._buffers.append(buf)
        return buf

    def _emit(self, ev: dict) -> None:
        ev.setdefault("pid", 1)
        ev.setdefault("tid", threading.get_ident() % 100000)
        self._buf().append(ev)

    @contextmanager
    def duration(self, name: str, **args: Any):
        ts = _now_us()
        try:
            yield
        finally:
            self._emit({"name": name, "ph": "X", "ts": ts,
                        "dur": _now_us() - ts, "args": args})

    def begin(self, name: str, **args: Any) -> None:
        self._emit({"name": name, "ph": "B", "ts": _now_us(), "args": args})

    def end(self, name: str) -> None:
        self._emit({"name": name, "ph": "E", "ts": _now_us()})

    def instant(self, name: str, **args: Any) -> None:
        self._emit({"name": name, "ph": "i", "ts": _now_us(), "s": "t",
                    "args": args})

    def counter(self, name: str, **values: float) -> None:
        self._emit({"name": name, "ph": "C", "ts": _now_us(), "args": values})

    def events(self) -> list[dict]:
        with self._lock:
            out = []
            for buf in self._buffers:
                out.extend(buf)
        return sorted(out, key=lambda e: e["ts"])

    def write(self, path: str) -> None:
        doc = {"traceEvents": self.events(),
               "displayTimeUnit": "ms",
               "otherData": {"process": self.process_name}}
        with open(path, "w") as f:
            json.dump(doc, f)

    @contextmanager
    def jax_trace(self, logdir: str):
        """Wrap a region with the XLA device profiler (TensorBoard trace)."""
        import jax
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
