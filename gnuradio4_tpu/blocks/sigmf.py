"""SigMF (Signal Metadata Format) recording support.

The SDR ecosystem's standard on-disk recording format (gr-sigmf in GNU
Radio): a raw `.sigmf-data` sample file paired with a `.sigmf-meta` JSON
document — `global` (datatype, sample rate, description), `captures`
(per-segment center frequency / timestamp / sample-index) and `annotations`
(labelled sample ranges). Spec: https://sigmf.org (v1.0.0 core namespace).

:class:`SigmfSink` records a stream: the capture segment carries the
flowgraph sample rate and any `trigger_time`/`frequency` tags it sees;
stream tags with string payloads become annotations anchored at their
absolute sample index. :class:`SigmfSource` plays a recording back,
re-emitting the capture metadata as stream tags (sample_rate / frequency at
the capture boundaries, annotation labels at their sample index) — so a
recorded flowgraph resumes with its tag sideband intact.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..core.block import Port, SinkBlock, SourceBlock
from ..core.errors import GrError
from ..core.registry import register_block
from ..core.settings import Setting
from ..core.tags import Keys, Tag

SIGMF_VERSION = "1.0.0"

# SigMF core datatypes (little-endian) ↔ numpy
_DTYPES = {
    "cf64_le": np.complex128, "cf32_le": np.complex64,
    "rf64_le": np.float64, "rf32_le": np.float32,
    "ri32_le": np.int32, "ri16_le": np.int16, "ri8": np.int8,
    "ru32_le": np.uint32, "ru16_le": np.uint16, "ru8": np.uint8,
    "ci16_le": None,       # interleaved int16 I/Q (converted on read/write)
    "ci8": None,           # interleaved int8 I/Q
}
_TO_SIGMF = {np.dtype(np.complex128): "cf64_le",
             np.dtype(np.complex64): "cf32_le",
             np.dtype(np.float64): "rf64_le",
             np.dtype(np.float32): "rf32_le",
             np.dtype(np.int32): "ri32_le",
             np.dtype(np.int16): "ri16_le",
             np.dtype(np.int8): "ri8",
             np.dtype(np.uint16): "ru16_le",
             np.dtype(np.uint8): "ru8"}


def _paths(base: str) -> tuple[Path, Path]:
    p = Path(base)
    stem = p.with_suffix("") if p.suffix in (".sigmf-data", ".sigmf-meta") \
        else p
    return (stem.with_suffix(".sigmf-data"),
            stem.with_suffix(".sigmf-meta"))


def read_sigmf(base: str) -> tuple[np.ndarray, dict]:
    """Load a recording: (samples, meta dict)."""
    data_p, meta_p = _paths(base)
    meta = json.loads(meta_p.read_text())
    dt_name = meta["global"]["core:datatype"]
    if dt_name not in _DTYPES:
        raise GrError(f"sigmf: unsupported datatype {dt_name!r}")
    if dt_name == "ci16_le":
        raw = np.fromfile(data_p, np.int16).astype(np.float32) / 32768.0
        x = (raw[0::2] + 1j * raw[1::2]).astype(np.complex64)
    elif dt_name == "ci8":
        raw = np.fromfile(data_p, np.int8).astype(np.float32) / 128.0
        x = (raw[0::2] + 1j * raw[1::2]).astype(np.complex64)
    else:
        x = np.fromfile(data_p, _DTYPES[dt_name])
    return x, meta


def write_sigmf(base: str, samples: np.ndarray, *, sample_rate: float,
                frequency: float | None = None,
                description: str = "", annotations: list[dict] = (),
                datatype: str | None = None) -> None:
    """Write a recording (one capture segment starting at sample 0)."""
    data_p, meta_p = _paths(base)
    x = np.asarray(samples)
    if datatype == "ci16_le":
        inter = np.empty(2 * len(x), np.int16)
        pairs = (x.view(np.float32).reshape(-1, 2)
                 if x.dtype == np.complex64
                 else np.stack([x.real, x.imag], -1))
        scaled = np.clip(np.round(pairs * 32767.0), -32768, 32767)
        inter[0::2] = scaled[:, 0].astype(np.int16)
        inter[1::2] = scaled[:, 1].astype(np.int16)
        inter.tofile(data_p)
        dt_name = "ci16_le"
    else:
        dt_name = datatype or _TO_SIGMF.get(x.dtype)
        if dt_name is None:
            raise GrError(f"sigmf: cannot map dtype {x.dtype} — pass "
                          f"datatype= explicitly")
        x.tofile(data_p)
    capture: dict = {"core:sample_start": 0}
    if frequency is not None:
        capture["core:frequency"] = float(frequency)
    meta = {
        "global": {"core:datatype": dt_name,
                   "core:sample_rate": float(sample_rate),
                   "core:version": SIGMF_VERSION,
                   **({"core:description": description}
                      if description else {})},
        "captures": [capture],
        "annotations": list(annotations),
    }
    meta_p.write_text(json.dumps(meta, indent=2))


@register_block("SigmfSink")
class SigmfSink(SinkBlock):
    """Records a stream as a SigMF pair. The capture segment gets the
    flowgraph sample rate; a `frequency` tag (e.g. from an SDR source)
    fills `core:frequency`; string-payload tags become annotations at
    their absolute sample index."""

    IN = (Port("in"),)
    path = Setting(default="", kind="static",
                   description="base path ('.sigmf-data/-meta' appended)")
    description = Setting(default="", kind="static")
    sample_rate = Setting(default=0.0, kind="static",
                          description="0 = take the rate from the connected "
                                      "edge / sample_rate tags")

    def __init__(self, name=None, **settings):
        super().__init__(name=name, **settings)
        self._f = None
        self._dtype = None
        self._sample_rate = 0.0
        self._frequency: float | None = None
        self._annotations: list[dict] = []
        self.n_written = 0

    def start(self):
        data_p, _ = _paths(str(self.settings.get("path")))
        self._f = open(data_p, "wb")
        self.n_written = 0
        self._annotations = []
        self._frequency = None

    def consume(self, arrays, tags, n_valid, abs_index):
        if self._f is None:
            self.start()
        data = np.ascontiguousarray(arrays["in"][..., :n_valid])
        if self._dtype is None:
            self._dtype = data.dtype
        for t in tags.get("in", []):
            if Keys.SAMPLE_RATE in t.map:
                self._sample_rate = float(t.map[Keys.SAMPLE_RATE])
            if "frequency" in t.map:
                self._frequency = float(t.map["frequency"])
            for k, v in t.map.items():
                if isinstance(v, str) and k not in (Keys.CONTEXT,):
                    self._annotations.append({
                        "core:sample_start": int(abs_index + t.index),
                        "core:sample_count": 1,
                        "core:label": f"{k}={v}"})
        self._f.write(data.tobytes())
        self.n_written += n_valid

    def stop(self):
        if self._f is None:
            return
        self._f.close()
        self._f = None
        if not self._sample_rate:
            self._sample_rate = float(self.settings.get("sample_rate"))
        if not self._sample_rate and self._graph is not None:
            # the rate solver stamped every edge (Graph.resolve_rates)
            for e in self._graph.edges:
                if e.dst is self and getattr(e, "sample_rate", 0.0):
                    self._sample_rate = float(e.sample_rate)
                    break
        _, meta_p = _paths(str(self.settings.get("path")))
        dt_name = _TO_SIGMF.get(np.dtype(self._dtype or np.float32),
                                "rf32_le")
        capture: dict = {"core:sample_start": 0}
        if self._frequency is not None:
            capture["core:frequency"] = self._frequency
        meta = {
            "global": {"core:datatype": dt_name,
                       "core:sample_rate": float(self._sample_rate),
                       "core:version": SIGMF_VERSION,
                       **({"core:description":
                           str(self.settings.get("description"))}
                          if self.settings.get("description") else {})},
            "captures": [capture],
            "annotations": self._annotations,
        }
        meta_p.write_text(json.dumps(meta, indent=2))


@register_block("SigmfSource")
class SigmfSource(SourceBlock):
    """Plays a SigMF recording; capture metadata re-enters the flowgraph as
    stream tags (sample_rate + frequency at each capture's sample_start,
    annotation labels at their index)."""

    OUT = (Port("out"),)
    FEED = True
    path = Setting(default="", kind="static")
    repeat = Setting(default=False, kind="static")

    def __init__(self, name=None, **settings):
        super().__init__(name=name, **settings)
        self._data = np.zeros(0, np.float32)
        self._meta: dict = {}
        self._tag_queue: list[Tag] = []

    def out_dtype(self, port, in_dtypes):
        base = str(self.settings.get("path"))
        if base:
            try:                        # meta only — never scan the data
                _, meta_p = _paths(base)
                meta = json.loads(meta_p.read_text())
                name = meta["global"]["core:datatype"]
                dt = _DTYPES.get(name)
                if dt is None and name in ("ci16_le", "ci8"):
                    return "complex64"
                if dt is not None:
                    return str(np.dtype(dt))
            except (OSError, KeyError, ValueError):
                pass
        return "float32"

    def start(self):
        base = str(self.settings.get("path"))
        data_p, meta_p = _paths(base)
        if not meta_p.is_file():
            raise GrError(f"{self.name}: no such recording {base!r}")
        self._data, self._meta = read_sigmf(base)

    @property
    def sample_rate(self) -> float:
        return float(self._meta.get("global", {})
                     .get("core:sample_rate", 0.0))

    def host_feed(self, n, abs_index):
        total = len(self._data)
        if not total:
            self.start()
            total = len(self._data)
        if bool(self.settings.get("repeat")):
            idx = np.arange(abs_index, abs_index + n) % total
            return {"out": self._data[idx]}, n
        if abs_index >= total:
            return None
        chunk = self._data[abs_index:abs_index + n]
        return {"out": chunk}, len(chunk)

    def emit_tags(self, ctx):
        out: list[Tag] = []
        lo = ctx.abs_index
        hi = lo + ctx.out_len.get("out", 0)
        for cap in self._meta.get("captures", []):
            s = int(cap.get("core:sample_start", 0))
            if lo <= s < hi:
                m: dict = {}
                if self.sample_rate:
                    m[Keys.SAMPLE_RATE] = self.sample_rate
                if "core:frequency" in cap:
                    m["frequency"] = float(cap["core:frequency"])
                if m:
                    out.append(Tag(s - lo, m))
        for ann in self._meta.get("annotations", []):
            s = int(ann.get("core:sample_start", 0))
            if lo <= s < hi and "core:label" in ann:
                out.append(Tag(s - lo, {"annotation":
                                        str(ann["core:label"])}))
        return out

    def apply(self, state, ins, ctx):
        return state, {"out": ins["out"]}
