"""Audio blocks over a backend abstraction (≈ reference blocks/audio/
AudioBlocks.hpp:32,361 AudioSource/AudioSink over AudioBackends.hpp:28 —
libsoundio native + WebAudio backends).

This image has no sound hardware/libsoundio, so the backend registry ships:
- ``null``: sink discards / source emits silence (paced optionally)
- ``file``: source reads WAV, sink writes WAV
- ``loopback``: source/sink pairs share an in-memory ring (tests; ≈ the
  reference's headless-CI audio strategy)
A real device backend plugs in by registering another :class:`AudioBackend`.
"""

from __future__ import annotations

import threading
import time
from typing import Any

import numpy as np

from ..core.block import Port, SinkBlock, SourceBlock
from ..core.errors import GrError
from ..core.registry import register_block
from ..core.settings import Setting
from ..native.ring import HostRing


class AudioBackend:
    """Capture/playback interface (≈ AudioBackends.hpp)."""

    def open_capture(self, sample_rate: float, channels: int): ...
    def read(self, n: int) -> np.ndarray | None:
        raise NotImplementedError
    def open_playback(self, sample_rate: float, channels: int): ...
    def write(self, samples: np.ndarray) -> None:
        raise NotImplementedError
    def close(self): ...


class NullAudioBackend(AudioBackend):
    def __init__(self):
        self.rate = 48000.0
        self._t0 = None

    def open_capture(self, sample_rate, channels):
        self.rate = sample_rate
        self.channels = channels

    def read(self, n):
        # paced silence (wall-clock source semantics)
        if self._t0 is None:
            self._t0 = time.monotonic()
            self._served = 0
        target = self._t0 + (self._served + n) / self.rate
        delay = target - time.monotonic()
        if delay > 0:
            time.sleep(min(delay, 1.0))
        self._served += n
        shape = (n,) if self.channels <= 1 else (self.channels, n)
        return np.zeros(shape, np.float32)

    def open_playback(self, sample_rate, channels):
        self.rate = sample_rate

    def write(self, samples):
        pass


class LoopbackAudioBackend(AudioBackend):
    """Shared ring: what the sink plays, the source captures."""

    _rings: dict[str, HostRing] = {}
    _pending_readers: dict[str, int] = {}
    _lock = threading.Lock()

    def __init__(self, key: str = "default"):
        self.key = key
        self.channels = 1

    def _ring(self) -> HostRing:
        with self._lock:
            if self.key not in self._rings:
                ring = HostRing(1 << 18, np.float32)
                # pre-attach the capture reader so playback written before the
                # capture side opens is retained (writer can't run ahead of it)
                self._pending_readers[self.key] = ring.add_reader()
                self._rings[self.key] = ring
            return self._rings[self.key]

    def open_capture(self, sample_rate, channels):
        self.channels = channels
        ring = self._ring()
        with self._lock:
            rid = self._pending_readers.pop(self.key, None)
        self._reader = rid if rid is not None else ring.add_reader()

    def read(self, n):
        ring = self._ring()
        deadline = time.monotonic() + 10.0
        while ring.readable(self._reader) < n:
            if ring.eos:
                avail = ring.readable(self._reader)
                if avail == 0:
                    return None
                n = avail
                break
            if time.monotonic() > deadline:
                return np.zeros(n, np.float32)
            time.sleep(1e-4)
        out = np.array(ring.read(self._reader, n), copy=True)
        ring.release(self._reader, n)
        return out

    def open_playback(self, sample_rate, channels):
        self.channels = channels

    def write(self, samples):
        self._ring().write(np.asarray(samples, np.float32).ravel())

    def close(self):
        self._ring().set_eos()


_BACKENDS = {
    "null": NullAudioBackend,
    "loopback": LoopbackAudioBackend,
}


def register_audio_backend(name: str, factory) -> None:
    _BACKENDS[name] = factory


def make_backend(name: str, **kw) -> AudioBackend:
    try:
        return _BACKENDS[name](**kw)
    except KeyError:
        raise GrError(f"unknown audio backend {name!r}; have {sorted(_BACKENDS)}")


@register_block("AudioSource")
class AudioSource(SourceBlock):
    OUT = (Port("out", dtype="float32"),)
    FEED = True
    backend = Setting(default="null", kind="static")
    device = Setting(default="default", kind="static")
    sample_rate = Setting(default=48000.0, kind="static")
    channels = Setting(default=1, kind="static")
    n_samples = Setting(default=0, kind="static")

    def __init__(self, name=None, backend_obj: AudioBackend | None = None,
                 **settings):
        super().__init__(name=name, **settings)
        self._backend = backend_obj
        self._served = 0

    def out_channels(self, port, in_channels):
        c = int(self.settings.get("channels"))
        return 0 if c <= 1 else c

    def start(self):
        if self._backend is None:
            kw = {}
            if self.settings.get("backend") == "loopback":
                kw["key"] = str(self.settings.get("device"))
            self._backend = make_backend(str(self.settings.get("backend")), **kw)
        self._backend.open_capture(float(self.settings.get("sample_rate")),
                                   int(self.settings.get("channels")))

    def host_feed(self, n, abs_index):
        if self._backend is None:
            self.start()
        total = int(self.settings.get("n_samples"))
        if total and abs_index >= total:
            return None
        got = self._backend.read(n)
        if got is None:
            return None
        nv = got.shape[-1]
        if total:
            nv = min(nv, total - abs_index)
        return {"out": got}, nv

    def apply(self, state, ins, ctx):
        return state, {"out": ins["out"]}

    def stop(self):
        if self._backend:
            self._backend.close()


@register_block("AudioSink")
class AudioSink(SinkBlock):
    IN = (Port("in", dtype="float32"),)
    backend = Setting(default="null", kind="static")
    device = Setting(default="default", kind="static")
    sample_rate = Setting(default=48000.0, kind="static")

    def __init__(self, name=None, backend_obj: AudioBackend | None = None,
                 **settings):
        super().__init__(name=name, **settings)
        self._backend = backend_obj
        self.n_played = 0

    def consume(self, arrays, tags, n_valid, abs_index):
        if self._backend is None:
            kw = {}
            if self.settings.get("backend") == "loopback":
                kw["key"] = str(self.settings.get("device"))
            self._backend = make_backend(str(self.settings.get("backend")), **kw)
            x = arrays["in"]
            ch = 1 if x.ndim == 1 else x.shape[0]
            self._backend.open_playback(float(self.settings.get("sample_rate")), ch)
        self._backend.write(arrays["in"][..., :n_valid])
        self.n_played += n_valid

    def stop(self):
        if self._backend:
            self._backend.close()
