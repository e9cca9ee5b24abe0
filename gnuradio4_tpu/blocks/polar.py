"""Polar code stream blocks over :mod:`gnuradio4_tpu.ops.polar`.

The encoder runs ON DEVICE: the u→x butterfly is log₂N stages of
reshape + XOR (as mod-2 float adds), which XLA fuses into the flowgraph
program. Successive-cancellation decoding is inherently sequential, so the
decoder is a frame-rate host callback (the RS pattern,
blocks/reed_solomon.py) with static shapes.
"""

from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from ..core.block import Block, Port
from ..core.registry import register_block
from ..core.settings import Setting
from ..ops.polar import frozen_mask, polar_decode


@register_block("PolarEncoder")
class PolarEncoder(Block):
    """K info bits → N codeword bits per frame (device butterflies)."""

    IN = (Port("in", dtype="float32"),)
    OUT = (Port("out", dtype="float32"),)
    n = Setting(default=256, kind="static")
    k = Setting(default=128, kind="static")

    def __init__(self, name=None, **settings):
        super().__init__(name=name, **settings)
        self._frozen = frozen_mask(int(self.settings.get("n")),
                                   int(self.settings.get("k")))

    @property
    def ratio(self):
        return Fraction(int(self.settings.get("n")),
                        int(self.settings.get("k")))

    @property
    def alignment(self):
        return int(self.settings.get("k"))

    def apply(self, state, ins, ctx):
        x = ins["in"]
        n = int(self.settings.get("n"))
        k = int(self.settings.get("k"))
        frames = x.reshape(x.shape[:-1] + (-1, k))
        info_idx = np.flatnonzero(~self._frozen)
        u = jnp.zeros(frames.shape[:-1] + (n,), jnp.float32)
        u = u.at[..., info_idx].set(frames)
        # butterfly stages: XOR as mod-2 addition
        step = 1
        while step < n:
            v = u.reshape(u.shape[:-1] + (n // (2 * step), 2, step))
            upper = jnp.mod(v[..., 0, :] + v[..., 1, :], 2.0)
            v = jnp.stack([upper, v[..., 1, :]], axis=-2)
            u = v.reshape(u.shape)
            step *= 2
        return state, {"out": u.reshape(x.shape[:-1]
                                        + (x.shape[-1] // k * n,))}


@register_block("PolarDecoder")
class PolarDecoder(Block):
    """N soft LLRs (positive = bit 0) → K info bits per frame via
    successive cancellation (host callback, frame rate)."""

    IN = (Port("in", dtype="float32"),)
    OUT = (Port("out", dtype="float32"),)
    n = Setting(default=256, kind="static")
    k = Setting(default=128, kind="static")

    def __init__(self, name=None, **settings):
        super().__init__(name=name, **settings)
        self._frozen = frozen_mask(int(self.settings.get("n")),
                                   int(self.settings.get("k")))

    @property
    def ratio(self):
        return Fraction(int(self.settings.get("k")),
                        int(self.settings.get("n")))

    @property
    def alignment(self):
        return int(self.settings.get("n"))

    def _decode_np(self, x: np.ndarray) -> np.ndarray:
        n = int(self.settings.get("n"))
        k = int(self.settings.get("k"))
        flat = np.asarray(x).reshape(-1)
        bits = polar_decode(flat, self._frozen)
        return bits.astype(np.float32).reshape(x.shape[:-1]
                                               + (x.shape[-1] // n * k,))

    def apply(self, state, ins, ctx):
        x = ins["in"]
        n = int(self.settings.get("n"))
        k = int(self.settings.get("k"))
        shape = jax.ShapeDtypeStruct(x.shape[:-1] + (x.shape[-1] // n * k,),
                                     jnp.float32)
        y = jax.pure_callback(self._decode_np, shape, x,
                              vmap_method="sequential")
        return state, {"out": y}
