"""DataSink: out-of-graph data egress with pollers (≈ reference
blocks/basic DataSink.hpp: DataSink block :468, DataSinkRegistry + query API :163,
StreamingPoller w/ Backpressure|Drop :21-37,78-100; consumer path SURVEY §3.6).

A DataSink block registers itself (by signal name) in the global
:class:`DataSinkRegistry`; consumer threads attach pollers:

- :class:`StreamingPoller` — continuous chunks (+tags), bounded queue with
  ``Backpressure`` (block the scheduler's deliver) or ``Drop`` policy;
- :class:`TriggerPoller` — pre/post-sample windows around matching trigger tags;
- :class:`MultiplexedPoller` — DataSets spanning start→stop trigger pairs;
- :class:`SnapshotPoller` — single samples at trigger+delay.
"""

from __future__ import annotations

import collections
import dataclasses
import enum
import queue
import threading
from typing import Any, Iterable

import numpy as np

from .block import Port, SinkBlock
from .dataset import DataSet
from .registry import register_block
from .settings import Setting
from .tags import Keys, Tag
from .trigger import Matcher, MatchResult, match_trigger


class OverflowPolicy(enum.Enum):
    BACKPRESSURE = "Backpressure"
    DROP = "Drop"


@dataclasses.dataclass
class StreamChunk:
    data: np.ndarray
    tags: list[Tag]
    abs_index: int


class _PollerBase:
    def __init__(self):
        self.finished = False

    def _feed(self, chunk: StreamChunk) -> None:  # called by the sink
        raise NotImplementedError

    def _eos(self) -> None:
        self.finished = True


class StreamingPoller(_PollerBase):
    def __init__(self, *, max_chunks: int = 64,
                 policy: OverflowPolicy = OverflowPolicy.BACKPRESSURE):
        super().__init__()
        self.policy = policy
        self.q: "queue.Queue[StreamChunk]" = queue.Queue(maxsize=max_chunks)
        self.dropped = 0

    def _feed(self, chunk: StreamChunk) -> None:
        if self.policy is OverflowPolicy.BACKPRESSURE:
            self.q.put(chunk)
        else:
            try:
                self.q.put_nowait(chunk)
            except queue.Full:
                self.dropped += chunk.data.shape[-1]

    def read(self, timeout: float | None = 1.0) -> StreamChunk | None:
        try:
            return self.q.get(timeout=timeout)
        except queue.Empty:
            return None

    def read_all(self) -> list[StreamChunk]:
        out = []
        while True:
            try:
                out.append(self.q.get_nowait())
            except queue.Empty:
                return out


class TriggerPoller(_PollerBase):
    """Emits [pre+post] windows around each matched trigger tag."""

    def __init__(self, matcher: Matcher | str, *, pre: int, post: int,
                 max_windows: int = 64, sample_rate: float = 1.0):
        super().__init__()
        self.matcher = match_trigger(matcher) if isinstance(matcher, str) else matcher
        self.pre, self.post = pre, post
        self.sample_rate = sample_rate
        self.q: "queue.Queue[DataSet]" = queue.Queue(maxsize=max_windows)
        self._hist: collections.deque = collections.deque(maxlen=1)
        self._tail = None  # np array of last `pre` samples
        self._pending: list[tuple[int, Tag, list[np.ndarray], int]] = []

    def _feed(self, chunk: StreamChunk) -> None:
        data = chunk.data
        # complete pending windows
        still = []
        for (start_abs, tag, parts, have) in self._pending:
            need = self.pre + self.post - have
            take = data[..., :need]
            parts.append(take)
            have += take.shape[-1]
            if have >= self.pre + self.post:
                self._emit(start_abs, tag, parts)
            else:
                still.append((start_abs, tag, parts, have))
        self._pending = still
        # new triggers in this chunk
        for t in chunk.tags:
            if self.matcher(t) is not MatchResult.MATCHED:
                continue
            trig_abs = chunk.abs_index + t.index
            start_rel = t.index - self.pre
            parts: list[np.ndarray] = []
            if start_rel < 0:
                if self._tail is not None and self._tail.shape[-1] >= -start_rel:
                    parts.append(self._tail[..., start_rel:])
                else:  # not enough history: pad with zeros
                    pad = np.zeros(data.shape[:-1] + (-start_rel,), data.dtype)
                    if self._tail is not None:
                        pad[..., -self._tail.shape[-1]:] = self._tail[..., :]
                    parts.append(pad)
                start_rel = 0
            take = data[..., start_rel: t.index + self.post]
            parts.append(take)
            have = sum(p.shape[-1] for p in parts)
            if have >= self.pre + self.post:
                self._emit(trig_abs - self.pre, t, parts)
            else:
                self._pending.append((trig_abs - self.pre, t, parts, have))
        # update history tail
        if self.pre > 0:
            if self._tail is None or data.shape[-1] >= self.pre:
                self._tail = data[..., -self.pre:].copy()
            else:
                joined = np.concatenate([self._tail, data], axis=-1)
                self._tail = joined[..., -self.pre:]

    def _emit(self, start_abs: int, tag: Tag, parts: list[np.ndarray]) -> None:
        win = np.concatenate(parts, axis=-1)[..., : self.pre + self.post]
        ds = DataSet.from_stream(win, sample_rate=self.sample_rate,
                                 start_index=start_abs,
                                 tags=[Tag(self.pre, dict(tag.map))])
        ds.meta["trigger"] = dict(tag.map)
        try:
            self.q.put_nowait(ds)
        except queue.Full:
            pass

    def read(self, timeout: float | None = 1.0) -> DataSet | None:
        try:
            return self.q.get(timeout=timeout)
        except queue.Empty:
            return None


class MultiplexedPoller(_PollerBase):
    """Captures DataSets spanning start→stop trigger pairs (state-machine)."""

    def __init__(self, start: Matcher | str, stop: Matcher | str, *,
                 max_windows: int = 16, max_samples: int = 1 << 22,
                 sample_rate: float = 1.0):
        super().__init__()
        self.start = match_trigger(start) if isinstance(start, str) else start
        self.stop = match_trigger(stop) if isinstance(stop, str) else stop
        self.q: "queue.Queue[DataSet]" = queue.Queue(maxsize=max_windows)
        self.sample_rate = sample_rate
        self.max_samples = max_samples
        self._open: tuple[int, Tag, list[np.ndarray]] | None = None

    def _feed(self, chunk: StreamChunk) -> None:
        data, tags = chunk.data, sorted(chunk.tags)
        cursor = 0
        for t in tags:
            if self._open is None:
                if self.start(t) is MatchResult.MATCHED:
                    self._open = (chunk.abs_index + t.index, t, [])
                    cursor = t.index
            else:
                if self.stop(t) is MatchResult.MATCHED:
                    start_abs, st_tag, parts = self._open
                    parts.append(data[..., cursor:t.index])
                    self._emit(start_abs, st_tag, t, parts)
                    self._open = None
                    cursor = t.index
        if self._open is not None:
            start_abs, st_tag, parts = self._open
            parts.append(data[..., cursor:])
            if sum(p.shape[-1] for p in parts) > self.max_samples:
                self._emit(start_abs, st_tag, None, parts)  # overflow close
                self._open = None

    def _emit(self, start_abs: int, start_tag: Tag, stop_tag: Tag | None,
              parts: list[np.ndarray]) -> None:
        if not parts:
            return
        win = np.concatenate(parts, axis=-1)
        ds = DataSet.from_stream(win, sample_rate=self.sample_rate,
                                 start_index=start_abs,
                                 tags=[Tag(0, dict(start_tag.map))])
        ds.meta["trigger_start"] = dict(start_tag.map)
        if stop_tag is not None:
            ds.meta["trigger_stop"] = dict(stop_tag.map)
        try:
            self.q.put_nowait(ds)
        except queue.Full:
            pass

    def read(self, timeout: float | None = 1.0) -> DataSet | None:
        try:
            return self.q.get(timeout=timeout)
        except queue.Empty:
            return None


class SnapshotPoller(_PollerBase):
    """Single samples at trigger + delay_samples."""

    def __init__(self, matcher: Matcher | str, *, delay_samples: int = 0,
                 max_items: int = 256):
        super().__init__()
        self.matcher = match_trigger(matcher) if isinstance(matcher, str) else matcher
        self.delay = delay_samples
        self.q: "queue.Queue[tuple[int, Any, dict]]" = queue.Queue(maxsize=max_items)
        self._armed: list[tuple[int, dict]] = []  # (abs sample index, trigger map)

    def _feed(self, chunk: StreamChunk) -> None:
        for t in chunk.tags:
            if self.matcher(t) is MatchResult.MATCHED:
                self._armed.append((chunk.abs_index + t.index + self.delay,
                                    dict(t.map)))
        still = []
        hi = chunk.abs_index + chunk.data.shape[-1]
        for (target, tmap) in self._armed:
            if chunk.abs_index <= target < hi:
                val = chunk.data[..., target - chunk.abs_index]
                try:
                    self.q.put_nowait((target, val, tmap))
                except queue.Full:
                    pass
            elif target >= hi:
                still.append((target, tmap))
        self._armed = still

    def read(self, timeout: float | None = 1.0):
        try:
            return self.q.get(timeout=timeout)
        except queue.Empty:
            return None


class DataSinkRegistry:
    """Global name→sink registry with poller attachment (≈ DataSink.hpp:163)."""

    def __init__(self):
        self._sinks: dict[str, "DataSink"] = {}
        self._lock = threading.Lock()

    def register(self, sink: "DataSink") -> None:
        with self._lock:
            self._sinks[sink.signal_name] = sink

    def unregister(self, sink: "DataSink") -> None:
        with self._lock:
            self._sinks.pop(sink.signal_name, None)

    def sinks(self) -> list[str]:
        with self._lock:
            return sorted(self._sinks)

    def _get(self, signal_name: str) -> "DataSink":
        with self._lock:
            if signal_name not in self._sinks:
                raise KeyError(f"no DataSink registered for {signal_name!r}; "
                               f"have {sorted(self._sinks)}")
            return self._sinks[signal_name]

    def get_streaming_poller(self, signal_name: str, **kw) -> StreamingPoller:
        return self._get(signal_name).attach(StreamingPoller(**kw))

    def get_trigger_poller(self, signal_name: str, matcher, **kw) -> TriggerPoller:
        return self._get(signal_name).attach(TriggerPoller(matcher, **kw))

    def get_multiplexed_poller(self, signal_name: str, start, stop, **kw
                               ) -> MultiplexedPoller:
        return self._get(signal_name).attach(MultiplexedPoller(start, stop, **kw))

    def get_snapshot_poller(self, signal_name: str, matcher, **kw) -> SnapshotPoller:
        return self._get(signal_name).attach(SnapshotPoller(matcher, **kw))


global_data_sink_registry = DataSinkRegistry()


@register_block("DataSink")
class DataSink(SinkBlock):
    """Terminal block feeding registered pollers (≈ DataSink.hpp:468)."""

    IN = (Port("in"),)
    signal_name = Setting(default="", kind="static",
                          description="registry key (defaults to block name)")

    def __init__(self, name=None, registry: DataSinkRegistry | None = None,
                 **settings):
        super().__init__(name=name, **settings)
        self.registry = registry or global_data_sink_registry
        if not self.settings.get("signal_name"):
            self.settings.set({"signal_name": self.name})
            self.settings.apply_staged()
        self._pollers: list[_PollerBase] = []
        self._plock = threading.Lock()
        self.registry.register(self)

    # NOTE: no @property here — it would shadow the Setting descriptor and
    # prevent its registration in _settings_spec.
    def get_signal_name(self) -> str:
        return str(self.settings.get("signal_name"))

    def attach(self, poller: _PollerBase):
        with self._plock:
            self._pollers.append(poller)
        return poller

    def consume(self, arrays, tags, n_valid, abs_index):
        data = arrays["in"][..., :n_valid]
        chunk = StreamChunk(data=data, tags=[t for t in tags.get("in", [])
                                             if t.index <= n_valid],
                            abs_index=abs_index)
        eos = any(t.map.get(Keys.END_OF_STREAM) for t in chunk.tags)
        with self._plock:
            pollers = list(self._pollers)
        for p in pollers:
            if n_valid:
                p._feed(chunk)
            if eos:
                p._eos()

    def stop(self):
        with self._plock:
            for p in self._pollers:
                p._eos()
