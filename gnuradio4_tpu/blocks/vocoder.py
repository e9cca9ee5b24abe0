"""Voice codecs (≈ gr-vocoder's most-used member, absent from the
reference blocklib): CVSD — continuously-variable-slope delta modulation,
the classic 1-bit military/tactical voice codec (MIL-STD-188-113 shape).

Both directions run ON DEVICE as a ``lax.scan`` over samples: the encoder
carries (estimate, step, run-of-equal-bits) and emits one bit per sample;
the decoder mirrors the same recursion, so a clean channel reconstructs
bit-exactly what the encoder's internal estimate tracked. Syllabic
companding: ``J`` equal bits in a row grow the step toward ``max_step``,
otherwise it decays toward ``min_step``.
"""

from __future__ import annotations

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from ..core.block import Block, Port
from ..core.registry import register_block
from ..core.settings import Setting


def _cvsd_params(settings):
    return (float(settings.get("min_step")), float(settings.get("max_step")),
            float(settings.get("step_decay")), float(settings.get("accum_decay")),
            int(settings.get("runlength")))


def cvsd_encode_scan(x, state, *, min_step, max_step, step_decay,
                     accum_decay, runlength):
    """x [T] float → (bits [T] float32 {0,1}, new state)."""

    def step_fn(carry, xi):
        est, delta, run = carry
        bit = (xi >= est)
        # run of equal bits: shift in the new bit, compare to all-ones/zeros
        run = jnp.where(bit == (run >= 0), jnp.abs(run) + 1, 1) \
            * jnp.where(bit, 1, -1)
        coincide = jnp.abs(run) >= runlength
        delta = jnp.where(coincide,
                          jnp.minimum(delta + min_step, max_step),
                          jnp.maximum(delta * step_decay, min_step))
        est = est * accum_decay + jnp.where(bit, delta, -delta)
        return (est, delta, run), bit.astype(jnp.float32)

    (est, delta, run), bits = jax.lax.scan(step_fn, state, x)
    return bits, (est, delta, run)


def cvsd_decode_scan(bits, state, *, min_step, max_step, step_decay,
                     accum_decay, runlength):
    """bits [T] {0,1} → (audio [T] float32, new state); the exact mirror
    of the encoder's estimate recursion."""

    def step_fn(carry, b):
        est, delta, run = carry
        bit = b > 0.5
        run = jnp.where(bit == (run >= 0), jnp.abs(run) + 1, 1) \
            * jnp.where(bit, 1, -1)
        coincide = jnp.abs(run) >= runlength
        delta = jnp.where(coincide,
                          jnp.minimum(delta + min_step, max_step),
                          jnp.maximum(delta * step_decay, min_step))
        est = est * accum_decay + jnp.where(bit, delta, -delta)
        return (est, delta, run), est.astype(jnp.float32)

    (est, delta, run), audio = jax.lax.scan(step_fn, state, bits)
    return audio, (est, delta, run)


def _init(settings):
    return (jnp.zeros((), jnp.float32),
            jnp.asarray(float(settings.get("min_step")), jnp.float32),
            jnp.ones((), jnp.int32))


class _CvsdBase(Block):
    min_step = Setting(default=0.01, kind="static")
    max_step = Setting(default=0.1, kind="static")
    step_decay = Setting(default=0.98, kind="static")
    accum_decay = Setting(default=0.97, kind="static")
    runlength = Setting(default=3, kind="static")

    def init_state(self, ctx):
        return _init(self.settings)

    def _kw(self):
        mn, mx, sd, ad, rl = _cvsd_params(self.settings)
        return dict(min_step=mn, max_step=mx, step_decay=sd,
                    accum_decay=ad, runlength=rl)


@register_block("CvsdEncoder")
class CvsdEncoder(_CvsdBase):
    """Audio (float32, ~|x|≤1) → 1 bit/sample CVSD stream (device scan)."""

    IN = (Port("in", dtype="float32"),)
    OUT = (Port("out", dtype="float32"),)

    def apply(self, state, ins, ctx):
        bits, st = cvsd_encode_scan(ins["in"], state, **self._kw())
        return st, {"out": bits}


@register_block("CvsdDecoder")
class CvsdDecoder(_CvsdBase):
    """CVSD bit stream → reconstructed audio (device scan)."""

    IN = (Port("in", dtype="float32"),)
    OUT = (Port("out", dtype="float32"),)

    def apply(self, state, ins, ctx):
        audio, st = cvsd_decode_scan(ins["in"], state, **self._kw())
        return st, {"out": audio}
