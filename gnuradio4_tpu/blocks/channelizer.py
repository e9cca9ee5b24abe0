"""PFB channelizer / synthesizer blocks (BASELINE configs 4–5 flagship path).

The analysis block turns a 1-D wideband complex stream ``[T]`` into an M-channel
stream ``[M, T/M]`` (rate fs/M per channel); the synthesis block inverts. On a mesh,
the channel axis is the natural sharding axis (parallel/).
"""

from __future__ import annotations

from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from ..core.block import Block, Port
from ..core.registry import register_block
from ..core.settings import Setting
from ..ops.channelizer import (design_pfb_taps, pfb_analyze, pfb_init_state,
                               pfb_synthesize)


@register_block("PFBChannelizer")
class PFBChannelizer(Block):
    """M-channel polyphase analysis bank: [T] → [M, T/M] (critically sampled)."""

    IN = (Port("in", dtype="complex64"),)
    OUT = (Port("out", dtype="complex64"),)
    n_channels = Setting(default=4, kind="static", limits=(2, 1 << 16))
    taps_per_phase = Setting(default=8, kind="static", limits=(1, 64))
    taps = Setting(default=(), kind="static",
                   description="prototype LP taps (empty → auto Kaiser design)")

    @property
    def ratio(self):
        return Fraction(1, int(self.settings.get("n_channels")))

    @property
    def alignment(self):
        return int(self.settings.get("n_channels"))

    def out_channels(self, port, in_channels):
        return int(self.settings.get("n_channels"))

    def _taps(self) -> np.ndarray:
        t = self.settings.get("taps")
        m = int(self.settings.get("n_channels"))
        p = int(self.settings.get("taps_per_phase"))
        if t is None or len(t) == 0:
            return design_pfb_taps(m, p).astype(np.float32)
        t = np.asarray(t, dtype=np.float32)
        return np.pad(t, (0, m * p - len(t)))[: m * p]

    def init_state(self, ctx):
        return pfb_init_state(int(self.settings.get("n_channels")),
                              int(self.settings.get("taps_per_phase")))

    def apply(self, state, ins, ctx):
        y, new_state = pfb_analyze(ins["in"].astype(jnp.complex64),
                                   self._taps(), state)
        return new_state, {"out": y}

    # time-sharding protocol: the branch-FIR history is the last
    # (taps_per_phase−1)·M input samples, stored corner-turned as rows [P−1, M]
    def sp_halo(self, ctx):
        m = int(self.settings.get("n_channels"))
        p = int(self.settings.get("taps_per_phase"))
        return (p - 1) * m

    def sp_state_to_tail(self, state, ctx):
        return state.reshape(*state.shape[:-2], -1)  # rows → flat input order

    def sp_tail_to_state(self, tail, state, ctx):
        m = int(self.settings.get("n_channels"))
        return tail.reshape(*tail.shape[:-1], -1, m).astype(jnp.complex64)


@register_block("PFBSynthesizer")
class PFBSynthesizer(Block):
    """M-channel synthesis bank: [M, T] → [M·T] wideband (inverse of analysis)."""

    IN = (Port("in", dtype="complex64"),)
    OUT = (Port("out", dtype="complex64"),)
    n_channels = Setting(default=4, kind="static", limits=(2, 1 << 16))
    taps_per_phase = Setting(default=8, kind="static", limits=(1, 64))
    taps = Setting(default=(), kind="static")

    @property
    def ratio(self):
        return Fraction(int(self.settings.get("n_channels")), 1)

    def out_channels(self, port, in_channels):
        return 0

    def _taps(self) -> np.ndarray:
        t = self.settings.get("taps")
        m = int(self.settings.get("n_channels"))
        p = int(self.settings.get("taps_per_phase"))
        if t is None or len(t) == 0:
            return design_pfb_taps(m, p).astype(np.float32)
        t = np.asarray(t, dtype=np.float32)
        return np.pad(t, (0, m * p - len(t)))[: m * p]

    def init_state(self, ctx):
        return pfb_init_state(int(self.settings.get("n_channels")),
                              int(self.settings.get("taps_per_phase")))

    def apply(self, state, ins, ctx):
        y, new_state = pfb_synthesize(ins["in"].astype(jnp.complex64),
                                      self._taps(), state)
        return new_state, {"out": y}


@register_block("ChannelSelect")
class ChannelSelect(Block):
    """Pick one channel of a multi-channel stream: [C, T] → [T]."""

    IN = (Port("in"),)
    OUT = (Port("out"),)
    channel = Setting(default=0, kind="static", limits=(0, 1 << 20))

    def out_channels(self, port, in_channels):
        return 0

    def apply(self, state, ins, ctx):
        c = int(self.settings.get("channel"))
        n_ch = ins["in"].shape[0] if ins["in"].ndim > 1 else 0
        if c >= n_ch:
            from ..core.errors import GrError
            raise GrError(f"{self.name}: channel {c} out of range "
                          f"(input has {n_ch} channels)")
        return state, {"out": ins["in"][c]}


@register_block("StreamToChannels")
class StreamToChannels(Block):
    """Deinterleave [T] → [C, T/C] (≈ stream-to-streams corner turn)."""

    IN = (Port("in"),)
    OUT = (Port("out"),)
    n_channels = Setting(default=2, kind="static", limits=(1, 1 << 16))

    @property
    def ratio(self):
        return Fraction(1, int(self.settings.get("n_channels")))

    @property
    def alignment(self):
        return int(self.settings.get("n_channels"))

    def out_channels(self, port, in_channels):
        return int(self.settings.get("n_channels"))

    def apply(self, state, ins, ctx):
        c = int(self.settings.get("n_channels"))
        return state, {"out": jnp.moveaxis(ins["in"].reshape(-1, c), 0, 1)}


@register_block("ChannelsToStream")
class ChannelsToStream(Block):
    """Interleave [C, T] → [T·C] (inverse corner turn)."""

    IN = (Port("in"),)
    OUT = (Port("out"),)
    n_channels = Setting(default=2, kind="static", limits=(1, 1 << 16))

    @property
    def ratio(self):
        return Fraction(int(self.settings.get("n_channels")), 1)

    def out_channels(self, port, in_channels):
        return 0

    def apply(self, state, ins, ctx):
        x = ins["in"]
        return state, {"out": jnp.moveaxis(x, 0, 1).reshape(-1)}
