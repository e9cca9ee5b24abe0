"""Nested-scheduler subgraphs (≈ reference ScheduledBlockGroup / managed
subgraphs, Block.hpp:579-585, qa_ManagedSubGraph).

Two composition modes exist in this framework:

1. **Transparent** (default): nested :class:`~.graph.Graph` blocks are flattened
   into the parent's single jitted program (≈ TransparentBlockGroup) — zero cost,
   used by WbfmReceiver etc.
2. **Scheduled** (:class:`ScheduledSubgraph`): the inner graph runs under its OWN
   Scheduler on a separate thread, bridged to the outer graph through native
   ring buffers — for isolating rate domains, host-heavy subgraphs, or different
   block lengths. Data crosses host↔device at the boundary; the bridge primes
   ``latency_steps`` zero-blocks so the two pumps never deadlock (the price of
   decoupled schedulers, analogous to the reference's inter-scheduler buffering).
"""

from __future__ import annotations

import threading
from typing import Any

import numpy as np

from .block import Block, Port, SinkBlock, SourceBlock
from .errors import GrError
from .feeder import read_exact
from .graph import Graph
from .registry import register_block
from .settings import Setting
from .stream import canonical_dtype
from ..native.ring import HostRing


class _BridgeSource(SourceBlock):
    """Inner-graph source draining an outer-side ring."""

    FEED = True

    def __init__(self, ring: HostRing, channels: int, name=None):
        super().__init__(name=name)
        self.out_ports = (Port("out"),)
        self.ring = ring
        self.reader = ring.add_reader()
        self._channels = channels

    def out_channels(self, port, in_channels):
        return self._channels

    def out_dtype(self, port, in_dtypes):
        return self.ring.dtype

    def host_feed(self, n, abs_index):
        ch = max(1, self._channels)
        got = read_exact(self.ring, self.reader, n * ch, timeout=60.0)
        if got is None:
            return None
        nv = len(got) // ch
        if self._channels:
            got = got.reshape(ch, -1, order="F")[:, :nv]
        return {"out": got}, nv

    def apply(self, state, ins, ctx):
        return state, {"out": ins["out"]}


class _BridgeSink(SinkBlock):
    """Inner-graph sink filling an outer-side ring."""

    def __init__(self, ring: HostRing, name=None):
        super().__init__(name=name)
        self.in_ports = (Port("in"),)
        self.ring = ring

    def consume(self, arrays, tags, n_valid, abs_index):
        x = arrays["in"][..., :n_valid]
        if x.ndim > 1:
            x = np.asarray(x).reshape(-1, order="F")
        self.ring.write(np.asarray(x).ravel(), block=True, timeout=60.0)

    def stop(self):
        self.ring.set_eos()


@register_block("ScheduledSubgraph")
class ScheduledSubgraph(Block):
    """Runs an inner flowgraph under its own scheduler thread (see module doc).

    The inner graph must have exported in/out ports. ``out_dtypes``/
    ``out_channels_map`` declare boundary types (the outer compiler needs them
    before the inner graph is compiled).
    """

    HOST_TAP = True   # outer runtime delivers this block's inputs to the host
    FEED = True       # and feeds its outputs from the host

    block_len_inner = Setting(default=0, kind="static",
                              description="0 → inherit outer per-step length")
    latency_steps = Setting(default=4, kind="static", limits=(1, 64),
                            description="zero-priming depth of the bridge")

    def __init__(self, inner: Graph, name=None,
                 out_dtypes: dict[str, Any] | None = None,
                 out_channels_map: dict[str, int] | None = None,
                 scheduler_kwargs: dict | None = None, **settings):
        super().__init__(name=name, **settings)
        if not inner._exports_in and not inner._exports_out:
            raise GrError("ScheduledSubgraph needs exported ports on the inner "
                          "graph (export_in/export_out)")
        self.inner = inner
        self.in_ports = tuple(Port(p) for p in inner._exports_in)
        self.out_ports = tuple(Port(p) for p in inner._exports_out)
        self._out_dtypes = {k: canonical_dtype(v)
                            for k, v in (out_dtypes or {}).items()}
        self._out_channels = dict(out_channels_map or {})
        self._sched_kwargs = dict(scheduler_kwargs or {})
        self._in_rings: dict[str, HostRing] = {}
        self._out_rings: dict[str, HostRing] = {}
        self._out_readers: dict[str, int] = {}
        self._inner_sched = None
        self._primed = 0
        self._ctx = None

    def out_dtype(self, port, in_dtypes):
        if port in self._out_dtypes:
            return self._out_dtypes[port]
        if in_dtypes:
            return next(iter(in_dtypes.values()))
        import jax.numpy as jnp
        return jnp.float32

    def out_channels(self, port, in_channels):
        if port in self._out_channels:
            return self._out_channels[port]
        return super().out_channels(port, in_channels)

    def init_state(self, ctx):
        self._ctx = ctx
        return None

    def start(self):
        if self._inner_sched is not None:
            return
        ctx = self._ctx
        from .scheduler import Scheduler
        wrap = Graph(name=f"{self.name}.wrap")
        wrap.add(self.inner)
        cap = 1 << 20
        for pub in self.inner._exports_in:
            dt = np.dtype(ctx.dtype(pub)) if ctx else np.float32
            ch = ctx.channels.get(pub, 0) if ctx else 0
            ring = HostRing(cap, dtype=dt)
            self._in_rings[pub] = ring
            src = _BridgeSource(ring, ch, name=f"{self.name}.{pub}.bridge_in")
            wrap.connect(src, self.inner[pub])
        for pub in self.inner._exports_out:
            dt = np.dtype(self.out_dtype(pub, {p: ctx.dtype(p) for p in
                                               ctx.in_len} if ctx else {}))
            ring = HostRing(cap, dtype=dt)
            self._out_rings[pub] = ring
            self._out_readers[pub] = ring.add_reader()
            snk = _BridgeSink(ring, name=f"{self.name}.{pub}.bridge_out")
            wrap.connect(self.inner[pub], snk)
        n_in = next(iter(self._ctx.in_len.values())) if self._ctx and \
            self._ctx.in_len else next(iter(self._ctx.out_len.values()), 4096)
        bl = int(self.settings.get("block_len_inner")) or n_in
        kw = dict(self._sched_kwargs)
        kw.setdefault("block_len", bl)
        kw.setdefault("sample_rate", self._ctx.sample_rate if self._ctx else 1.0)
        kw.setdefault("pipeline_depth", 1)  # minimize bridge latency
        self._inner_sched = Scheduler(wrap, name=f"{self.name}.sched", **kw)
        self._inner_sched.start()
        self._primed = 0

    def stop(self):
        for ring in self._in_rings.values():
            ring.set_eos()
        if self._inner_sched is not None:
            try:
                self._inner_sched.wait_done(timeout=30)
            except TimeoutError:
                self._inner_sched.request_stop()

    # outer sink side: deliver inputs into the inner rings
    def consume(self, arrays, tags, n_valid, abs_index):
        if self._inner_sched is None:
            self.start()
        for pub, ring in self._in_rings.items():
            x = arrays.get(pub)
            if x is None or n_valid == 0:
                continue
            x = np.asarray(x)[..., :n_valid]
            if x.ndim > 1:
                x = x.reshape(-1, order="F")
            ring.write(x.ravel(), block=True, timeout=60.0)

    # outer feed side: produce outputs from the inner rings
    def host_feed(self, n, abs_index):
        if self._inner_sched is None:
            self.start()
        prime = int(self.settings.get("latency_steps"))
        out: dict[str, np.ndarray] = {}
        if self._primed < prime:
            self._primed += 1
            for pub, ring in self._out_rings.items():
                out[pub] = np.zeros(n, ring.dtype)
            return out, n
        nv = n
        for pub, ring in self._out_rings.items():
            got = read_exact(ring, self._out_readers[pub], n, timeout=60.0)
            if got is None:
                return None
            nv = min(nv, len(got))
            out[pub] = got
        return out, nv

    def apply(self, state, ins, ctx):
        # pass the host-fed arrays through as this block's outputs
        return state, {p.name: ins[p.name] for p in self.out_ports}
