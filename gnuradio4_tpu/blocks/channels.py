"""Channel simulation models (≈ GNU Radio's gr-channels, which the
reference blocklib lacks) — all device-side, so impairments fuse into the
same program as the receiver under test.

- :class:`ChannelModel`: AWGN (threefry, key in state) + carrier frequency
  offset (integer-NCO phase accumulator, drift-free) + static multipath
  taps (FIR with carried history) — the workhorse link impairment block.
- :class:`FadingModel`: flat Rayleigh/Rician fading by the Jakes
  sum-of-sinusoids method; the per-sinusoid phases ride in state (mod 2π)
  so the fading trajectory is continuous across scheduler steps,
  reproducible by seed, and precise on unbounded streams.
- :class:`SelectiveFadingModel`: frequency-selective fading — per-tap
  independent Jakes processes on a static delay line (power-delay profile),
  i.e. a time-varying FIR realized as a weighted sum of delayed copies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.block import Block, Port
from ..core.registry import register_block
from ..core.settings import Setting
from ..ops.noise import gaussian, noise_init_state


def _jakes_params(n_sinusoids: int, seed: int, tap: int = 0):
    """Random arrival angles + phases for one Jakes process (host, static)."""
    rng = np.random.default_rng((seed << 8) ^ tap)
    alpha = rng.uniform(0.0, 2.0 * np.pi, n_sinusoids)
    phi = rng.uniform(0.0, 2.0 * np.pi, n_sinusoids)
    psi = rng.uniform(0.0, 2.0 * np.pi, n_sinusoids)
    return (alpha.astype(np.float32), phi.astype(np.float32),
            psi.astype(np.float32))


def _jakes_gain(arg0: jnp.ndarray, w: np.ndarray, T: int, phi, psi
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Complex Jakes gain for ``T`` samples from carried per-sinusoid
    phases ``arg0`` [N]; returns (gain [T], new arg0). Carrying phases
    (mod 2π) instead of absolute time keeps precision on unbounded
    streams. E[|g|²] = 1."""
    n = len(w)
    idx = jnp.arange(T, dtype=jnp.float32)
    arg = arg0[None, :] + idx[:, None] * jnp.asarray(w)[None, :]
    re = jnp.cos(arg + jnp.asarray(phi)[None, :])
    im = jnp.sin(arg + jnp.asarray(psi)[None, :])
    g = ((re + 1j * im) / np.sqrt(2.0 * n)).sum(axis=-1) \
        .astype(jnp.complex64) * np.sqrt(2.0)
    new0 = jnp.mod(arg0 + jnp.asarray(w) * T, 2.0 * np.pi)
    return g, new0


def _jakes_w(fd: float, alpha: np.ndarray) -> np.ndarray:
    return (2.0 * np.pi * fd * np.cos(alpha)).astype(np.float32)


@register_block("ChannelModel")
class ChannelModel(Block):
    """AWGN + CFO + static multipath (≈ gr::channels::channel_model).

    ``noise_voltage`` is the per-component std of the complex AWGN;
    ``frequency_offset`` is normalized (cycles/sample, like the GNU Radio
    block); ``taps`` is the static channel impulse response."""

    IN = (Port("in", dtype="complex64"),)
    OUT = (Port("out", dtype="complex64"),)
    noise_voltage = Setting(default=0.0)
    frequency_offset = Setting(default=0.0,
                               description="normalized CFO, cycles/sample")
    seed = Setting(default=0, kind="static")
    taps = Setting(default=(1.0 + 0.0j,), kind="static")

    SAMPLE_ACCURATE = frozenset()

    def _taps(self) -> np.ndarray:
        return np.atleast_1d(np.asarray(
            self.settings.get("taps"), np.complex64))

    def prepare_params(self, params):
        cfo = float(self.settings.get("frequency_offset"))
        params = dict(params)
        params["cfo_inc"] = np.uint32(int(round((cfo % 1.0) * (1 << 32)))
                                      & 0xFFFFFFFF)
        return params

    def init_state(self, ctx):
        taps = self._taps()
        return {"key": noise_init_state(int(self.settings.get("seed"))),
                "phase": jnp.zeros((), jnp.uint32),
                "hist": jnp.zeros(max(len(taps) - 1, 1), jnp.complex64)}

    def apply(self, state, ins, ctx):
        x = ins["in"]
        taps = jnp.asarray(self._taps())
        nt = taps.shape[0]
        # multipath: carried history keeps the convolution seamless
        hist = state["hist"]
        ext = jnp.concatenate([hist[-(nt - 1):], x]) if nt > 1 else x
        if nt > 1:
            y = jnp.zeros_like(x)
            for k in range(nt):
                y = y + taps[k] * jax.lax.dynamic_slice_in_dim(
                    ext, nt - 1 - k, x.shape[-1])
            new_hist = ext[-(nt - 1):] if nt > 1 else hist
        else:
            y = taps[0] * x
            new_hist = hist
        # CFO: integer phase accumulator (uint32 wraps for free); the
        # increment is derived host-side in f64 (prepare_params), the NCO
        # pattern from blocks/math.Rotator
        inc = jnp.asarray(ctx.p("cfo_inc", 0), jnp.uint32)
        ph0 = state["phase"]
        idx = jnp.arange(x.shape[-1], dtype=jnp.uint32)
        ph = ph0 + inc * (idx + 1)
        ang = ph.astype(jnp.float32) * (2.0 * np.pi / (1 << 32))
        y = y * jnp.exp(1j * ang).astype(jnp.complex64)
        new_phase = ph0 + inc * jnp.uint32(x.shape[-1])
        # AWGN
        nv = jnp.asarray(ctx.p("noise_voltage", 0.0), jnp.float32)
        re, key = gaussian(state["key"], x.shape)
        im, key = gaussian(key, x.shape)
        y = y + nv * (re + 1j * im).astype(jnp.complex64)
        return ({"key": key, "phase": new_phase, "hist": new_hist},
                {"out": y})


@register_block("FadingModel")
class FadingModel(Block):
    """Flat Rayleigh/Rician fading (Jakes sum-of-sinusoids,
    ≈ gr::channels::fading_model). ``fD`` is the normalized maximum Doppler
    (cycles/sample); ``K`` the Rician LOS factor (0 = Rayleigh);
    E[|gain|²] = 1 either way."""

    IN = (Port("in", dtype="complex64"),)
    OUT = (Port("out", dtype="complex64"),)
    fD = Setting(default=1e-4, kind="static",
                 description="normalized max Doppler (cycles/sample)")
    K = Setting(default=0.0, kind="static",
                description="Rician K factor (0 = Rayleigh)")
    n_sinusoids = Setting(default=8, kind="static")
    los_doppler = Setting(default=0.7, kind="static",
                          description="LOS Doppler as a fraction of fD")
    seed = Setting(default=0, kind="static")

    def init_state(self, ctx):
        ns = int(self.settings.get("n_sinusoids"))
        return {"arg": jnp.zeros(ns, jnp.float32),
                "los": jnp.zeros((), jnp.float32)}

    def apply(self, state, ins, ctx):
        x = ins["in"]
        T = x.shape[-1]
        alpha, phi, psi = _jakes_params(int(self.settings.get("n_sinusoids")),
                                        int(self.settings.get("seed")))
        fd = float(self.settings.get("fD"))
        w = _jakes_w(fd, alpha)
        g, arg = _jakes_gain(state["arg"], w, T, phi, psi)
        K = float(self.settings.get("K"))
        new_los = state["los"]
        if K > 0.0:
            los_w = np.float32(2.0 * np.pi * fd
                               * float(self.settings.get("los_doppler")))
            idx = jnp.arange(T, dtype=jnp.float32)
            los = jnp.exp(1j * (state["los"] + los_w * idx)) \
                .astype(jnp.complex64)
            g = (g + np.sqrt(K) * los) / np.sqrt(1.0 + K)
            new_los = jnp.mod(state["los"] + los_w * T,
                              np.float32(2.0 * np.pi))
        return ({"arg": arg, "los": new_los},
                {"out": (x * g).astype(jnp.complex64)})


@register_block("SelectiveFadingModel")
class SelectiveFadingModel(Block):
    """Frequency-selective fading (≈ gr::channels::selective_fading_model):
    a static delay line (``delays`` in samples, ``mags`` per-tap amplitudes)
    whose taps fade as independent Jakes processes — a time-varying FIR as
    a weighted sum of delayed copies, history carried in state."""

    IN = (Port("in", dtype="complex64"),)
    OUT = (Port("out", dtype="complex64"),)
    fD = Setting(default=1e-4, kind="static")
    n_sinusoids = Setting(default=8, kind="static")
    delays = Setting(default=(0, 3, 7), kind="static")
    mags = Setting(default=(1.0, 0.6, 0.3), kind="static")
    seed = Setting(default=0, kind="static")

    def _pdp(self):
        d = np.asarray(self.settings.get("delays"), np.int64)
        m = np.asarray(self.settings.get("mags"), np.float32)
        m = m / np.sqrt(np.sum(m ** 2))          # unit average power
        return d, m

    def init_state(self, ctx):
        d, _ = self._pdp()
        ns = int(self.settings.get("n_sinusoids"))
        return {"arg": jnp.zeros((len(d), ns), jnp.float32),
                "hist": jnp.zeros(max(int(d.max()), 1), jnp.complex64)}

    def apply(self, state, ins, ctx):
        x = ins["in"]
        T = x.shape[-1]
        d, m = self._pdp()
        dmax = int(d.max())
        ext = jnp.concatenate([state["hist"][-dmax:], x]) if dmax else x
        fd = float(self.settings.get("fD"))
        ns = int(self.settings.get("n_sinusoids"))
        y = jnp.zeros_like(x)
        args = []
        for k, (dk, mk) in enumerate(zip(d, m)):
            alpha, phi, psi = _jakes_params(ns, int(self.settings.get("seed")),
                                            tap=k + 1)
            g, a = _jakes_gain(state["arg"][k], _jakes_w(fd, alpha), T,
                               phi, psi)
            args.append(a)
            xk = jax.lax.dynamic_slice_in_dim(ext, dmax - int(dk),
                                              x.shape[-1]) if dmax else x
            y = y + float(mk) * g * xk
        new_hist = ext[-dmax:] if dmax else state["hist"]
        return ({"arg": jnp.stack(args), "hist": new_hist},
                {"out": y.astype(jnp.complex64)})


@register_block("PhaseNoise")
class PhaseNoise(Block):
    """Oscillator phase noise (≈ gr::channels::phase_noise_gen): a Wiener
    random walk, φ[n] = φ[n−1] + N(0, std²), applied as e^{jφ}. The walk
    value and PRNG key carry in state, so the trajectory is continuous
    across steps and reproducible by seed."""

    IN = (Port("in", dtype="complex64"),)
    OUT = (Port("out", dtype="complex64"),)
    std = Setting(default=0.001,
                  description="per-sample phase-increment std (radians)")
    seed = Setting(default=0, kind="static")

    def init_state(self, ctx):
        return {"key": noise_init_state(int(self.settings.get("seed"))),
                "phi": jnp.zeros((), jnp.float32)}

    def apply(self, state, ins, ctx):
        x = ins["in"]
        std = jnp.asarray(ctx.p("std", 0.0), jnp.float32)
        dphi, key = gaussian(state["key"], x.shape[-1:])
        walk = state["phi"] + jnp.cumsum(std * dphi)
        y = x * jnp.exp(1j * walk).astype(jnp.complex64)
        # wrap the carried phase so an unbounded stream never loses precision
        new_phi = jnp.mod(walk[-1], jnp.float32(2.0 * np.pi))
        return {"key": key, "phi": new_phi}, {"out": y}


@register_block("IqImbalanceGen")
class IqImbalanceGen(Block):
    """Transmit-side IQ imbalance (≈ gr::channels::iqbal_gen): amplitude
    skew ``magnitude`` (dB) and ``phase`` (degrees) applied to the I rail —
    the standard image-generating impairment the RX-side IqImbalance
    corrector (blocks/dsp_extras.py) undoes."""

    IN = (Port("in", dtype="complex64"),)
    OUT = (Port("out", dtype="complex64"),)
    magnitude = Setting(default=0.0, description="amplitude skew (dB)")
    phase = Setting(default=0.0, description="phase skew (degrees)")

    def apply(self, state, ins, ctx):
        x = ins["in"]
        mag = 10.0 ** (jnp.asarray(ctx.p("magnitude", 0.0),
                                   jnp.float32) / 20.0)
        ph = jnp.asarray(ctx.p("phase", 0.0), jnp.float32) * (np.pi / 180.0)
        # gr iqbal_gen convention: I' = mag·(I·cosφ − Q·sinφ... applied to I)
        i = x.real * mag
        q = x.imag + x.real * jnp.tan(ph) * mag
        return state, {"out": (i + 1j * q).astype(jnp.complex64)}
