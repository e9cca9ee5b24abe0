"""Electrical / power-metering blocks (≈ reference blocks/electrical/
PowerEstimators.hpp: PowerMetrics<T, nPhases>, PowerFactor, SystemUnbalance).

Windowed power estimation is a reduction over decimation windows — a reshape +
mean on the VPU, fully fused.
"""

from __future__ import annotations

from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from ..core.block import Block, Port
from ..core.registry import register_block
from ..core.settings import Setting


@register_block("PowerMetrics")
class PowerMetrics(Block):
    """Per-phase P/Q/S + RMS voltage/current over decimation windows.

    inputs: ``u`` and ``i`` (both [n_phases, T] or [T] for single phase);
    outputs: p, q, s, u_rms, i_rms at rate fs/decim.
    """

    IN = (Port("u", dtype="float32"), Port("i", dtype="float32"))
    OUT = (Port("p", dtype="float32"), Port("q", dtype="float32"),
           Port("s", dtype="float32"), Port("u_rms", dtype="float32"),
           Port("i_rms", dtype="float32"))
    decim = Setting(default=1000, kind="static", limits=(1, 1 << 24),
                    description="samples per estimate window")

    @property
    def ratio(self):
        return Fraction(1, int(self.settings.get("decim")))

    @property
    def alignment(self):
        return int(self.settings.get("decim"))

    def apply(self, state, ins, ctx):
        d = int(self.settings.get("decim"))
        u, i = ins["u"], ins["i"]
        uw = u.reshape(*u.shape[:-1], -1, d)
        iw = i.reshape(*i.shape[:-1], -1, d)
        p = jnp.mean(uw * iw, axis=-1)
        u_rms = jnp.sqrt(jnp.mean(uw * uw, axis=-1))
        i_rms = jnp.sqrt(jnp.mean(iw * iw, axis=-1))
        s = u_rms * i_rms
        q = jnp.sqrt(jnp.maximum(s * s - p * p, 0.0))
        return state, {"p": p, "q": q, "s": s, "u_rms": u_rms, "i_rms": i_rms}


@register_block("PowerFactor")
class PowerFactor(Block):
    """cos φ = P/S and phase angle from P/S streams (≈ PowerFactor)."""

    IN = (Port("p", dtype="float32"), Port("s", dtype="float32"))
    OUT = (Port("power_factor", dtype="float32"), Port("phase", dtype="float32"))

    def apply(self, state, ins, ctx):
        pf = jnp.clip(ins["p"] / jnp.maximum(ins["s"], 1e-20), -1.0, 1.0)
        return state, {"power_factor": pf, "phase": jnp.arccos(pf)}


@register_block("SystemUnbalance")
class SystemUnbalance(Block):
    """Three-phase voltage/current unbalance (max deviation / mean, in %).

    inputs: u_rms and i_rms as [3, T] multi-channel streams; outputs unbalance
    percentages + total power (≈ SystemUnbalance for nPhases=3).
    """

    IN = (Port("u_rms", dtype="float32"), Port("i_rms", dtype="float32"),
          Port("p", dtype="float32"))
    OUT = (Port("u_unbalance", dtype="float32"),
           Port("i_unbalance", dtype="float32"),
           Port("p_total", dtype="float32"))

    def out_channels(self, port, in_channels):
        return 0  # scalar streams out

    def apply(self, state, ins, ctx):
        def unbal(x):
            m = jnp.mean(x, axis=0)
            dev = jnp.max(jnp.abs(x - m[None, :]), axis=0)
            return 100.0 * dev / jnp.maximum(m, 1e-20)
        return state, {
            "u_unbalance": unbal(ins["u_rms"]),
            "i_unbalance": unbal(ins["i_rms"]),
            "p_total": jnp.sum(ins["p"], axis=0),
        }
