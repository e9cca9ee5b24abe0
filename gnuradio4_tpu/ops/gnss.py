"""GNSS (GPS L1 C/A) signal processing: Gold codes + FFT acquisition.

Beyond-reference model family — and, unlike the host-side frame decoders,
a DEVICE-side workload: acquisition is a 2-D search over Doppler × code
phase, evaluated as a batch of FFT circular correlations (one [D, N]
element-wise wipe + FFT per coherent block) — exactly the dense batched
compute the TPU is for. Everything here is jnp and jit-able.

C/A codes are the standard 1023-chip Gold codes (IS-GPS-200: G1 = 1+x³+x¹⁰,
G2 = 1+x²+x³+x⁶+x⁸+x⁹+x¹⁰ with per-PRN G2 phase taps), validated against the
published first-10-chips octal table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# per-PRN G2 phase-select taps (IS-GPS-200 table 3-I, PRN 1..32)
_G2_TAPS = [(2, 6), (3, 7), (4, 8), (5, 9), (1, 9), (2, 10), (1, 8), (2, 9),
            (3, 10), (2, 3), (3, 4), (5, 6), (6, 7), (7, 8), (8, 9), (9, 10),
            (1, 4), (2, 5), (3, 6), (4, 7), (5, 8), (6, 9), (1, 3), (4, 6),
            (5, 7), (6, 8), (7, 9), (8, 10), (1, 6), (2, 7), (3, 8), (4, 9)]

CHIP_RATE = 1.023e6
CODE_LEN = 1023


@functools.lru_cache(maxsize=None)
def ca_code(prn: int) -> np.ndarray:
    """1023-chip C/A Gold code for PRN 1..32, as ±1 float32."""
    if not 1 <= prn <= 32:
        raise ValueError("PRN must be 1..32")
    t1, t2 = _G2_TAPS[prn - 1]
    g1 = [1] * 10
    g2 = [1] * 10
    chips = np.empty(CODE_LEN, np.float32)
    for i in range(CODE_LEN):
        out = g1[9] ^ (g2[t1 - 1] ^ g2[t2 - 1])
        chips[i] = 1.0 - 2.0 * out          # 0 → +1, 1 → −1
        new1 = g1[2] ^ g1[9]
        new2 = g2[1] ^ g2[2] ^ g2[5] ^ g2[7] ^ g2[8] ^ g2[9]
        g1 = [new1] + g1[:9]
        g2 = [new2] + g2[:9]
    return chips


def ca_code_first_octal(prn: int) -> int:
    """First 10 chips as the IS-GPS-200 octal check value."""
    chips = ca_code(prn)[:10]
    bits = (chips < 0).astype(int)          # −1 ↔ chip value 1
    return int("".join(map(str, bits)), 2)


def sampled_code(prn: int, fs: float, n: int) -> np.ndarray:
    """C/A code resampled to ``fs`` over ``n`` samples (code repeats each ms)."""
    chips = ca_code(prn)
    idx = (np.arange(n) * (CHIP_RATE / fs)).astype(np.int64) % CODE_LEN
    return chips[idx]


@functools.partial(jax.jit, static_argnames=("fs", "n_coherent"))
def acquire_metric(iq: jnp.ndarray, code: jnp.ndarray,
                   dopplers: jnp.ndarray, *, fs: float,
                   n_coherent: int = 1) -> jnp.ndarray:
    """Doppler × code-phase search surface [D, N].

    For each Doppler bin: wipe the carrier, circularly correlate with the
    local code via FFT, magnitude-square; non-coherently sum ``n_coherent``
    consecutive 1-code blocks (robust to data-bit flips). One batched
    [D, n_coherent, N] FFT — the whole search is a single fused program.
    """
    n = code.shape[0]
    x = iq[:n * n_coherent].reshape(n_coherent, n)
    t = (jnp.arange(n * n_coherent, dtype=jnp.float32) / fs).reshape(
        n_coherent, n)
    carriers = jnp.exp(-2j * jnp.pi * dopplers[:, None, None] * t[None])
    xw = x[None] * carriers.astype(jnp.complex64)          # [D, K, N]
    cf = jnp.conj(jnp.fft.fft(code.astype(jnp.complex64)))
    corr = jnp.fft.ifft(jnp.fft.fft(xw, axis=-1) * cf[None, None], axis=-1)
    return jnp.sum(jnp.abs(corr) ** 2, axis=1)             # [D, N]


def acquire(iq: np.ndarray, prn: int, *, fs: float,
            doppler_max: float = 5000.0, doppler_step: float = 250.0,
            n_coherent: int = 2, threshold: float = 2.5) -> dict | None:
    """Acquire one PRN → {prn, doppler, code_phase, metric} or None.

    ``metric`` is peak / (second peak outside ±1 chip) — the standard
    acquisition quality ratio; ``threshold`` gates detection.
    """
    code = jnp.asarray(sampled_code(prn, fs, int(round(fs * 1e-3))))
    n = code.shape[0]
    dopplers = jnp.arange(-doppler_max, doppler_max + doppler_step / 2,
                          doppler_step, dtype=jnp.float32)
    surf = np.asarray(acquire_metric(jnp.asarray(iq, jnp.complex64), code,
                                     dopplers, fs=fs, n_coherent=n_coherent))
    d_idx, c_idx = np.unravel_index(np.argmax(surf), surf.shape)
    peak = surf[d_idx, c_idx]
    # second peak on the same Doppler row, outside one chip of the first
    spc = int(round(fs / CHIP_RATE))
    row = surf[d_idx].copy()
    lo, hi = c_idx - spc, c_idx + spc + 1
    row[max(lo, 0):hi] = 0.0
    if lo < 0:
        row[lo:] = 0.0
    if hi > n:
        row[:hi - n] = 0.0
    second = row.max()
    metric = float(peak / max(second, 1e-30))
    if metric < threshold:
        return None
    return {"prn": prn, "doppler": float(dopplers[d_idx]),
            "code_phase": int(c_idx), "metric": metric}


def synthesize(prns_dopplers_phases: list[tuple[int, float, int]], *,
               fs: float, n_ms: int = 4, amplitude: float = 1.0,
               rng: np.random.Generator | None = None,
               noise_std: float = 0.0) -> np.ndarray:
    """Composite baseband: Σ satellites (PRN, Doppler Hz, code-phase samples)
    + complex AWGN. Test/simulation stimulus."""
    n = int(round(fs * 1e-3)) * n_ms
    t = np.arange(n) / fs
    out = np.zeros(n, np.complex128)
    for prn, dopp, phase in prns_dopplers_phases:
        code = sampled_code(prn, fs, n)
        rolled = np.roll(np.tile(code[:int(round(fs * 1e-3))],
                                 n_ms), phase)[:n]
        out += amplitude * rolled * np.exp(2j * np.pi * dopp * t)
    if noise_std > 0.0:
        rng = rng or np.random.default_rng(0)
        out += noise_std * (rng.standard_normal(n)
                            + 1j * rng.standard_normal(n))
    return out.astype(np.complex64)
