"""FIR filtering kernels (overlap-save, decimating, frequency-translating).

Reference capability: per-sample FIR with a HistoryBuffer of tap history
(blocks/filter/include/gnuradio-4.0/filter/time_domain_filter.hpp:24 ``fir_filter``;
history: core HistoryBuffer.hpp:68).

TPU-native design: **overlap-save over time blocks** — the carried state is the last
``ntaps-1`` input samples (the exact analog of the HistoryBuffer tail); each step
convolves ``concat([state, x])`` "valid", producing exactly ``len(x)`` outputs.
The convolution maps onto XLA's conv HLO (which the TPU backend lowers onto the MXU
for large tap counts) with channels as the batch dim; complex data is handled by a
2×2 real kernel mixing re/im feature planes (one conv call, MXU-friendly). Decimation
fuses into the conv via ``window_strides`` so no wasted output compute.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _as_cx(taps: jnp.ndarray) -> bool:
    return jnp.issubdtype(taps.dtype, jnp.complexfloating)


def fir_init_state(channels: int, ntaps: int, dtype) -> jnp.ndarray:
    """Zero prehistory of ``ntaps-1`` samples (≈ HistoryBuffer zero-init)."""
    shape = (ntaps - 1,) if channels == 0 else (channels, ntaps - 1)
    return jnp.zeros(shape, dtype=dtype)


def _conv_valid_real(x2: jnp.ndarray, taps: jnp.ndarray, stride: int) -> jnp.ndarray:
    """x2: [B, T'] real, taps: [K] real → [B, (T'-K)//stride+1] via conv HLO.

    FIR is y[n] = Σ_k taps[k]·x[n-k]; XLA conv computes correlation, so flip taps.
    """
    k = taps[::-1].reshape(1, 1, -1)          # [out_feat, in_feat, K]
    lhs = x2[:, None, :]                      # [batch, feat, T]
    y = jax.lax.conv_general_dilated(
        lhs, k.astype(x2.dtype), window_strides=(stride,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    return y[:, 0, :]


def _conv_valid_complex(x2: jnp.ndarray, taps: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Complex FIR as one real conv with 2 in/out feature planes (re, im)."""
    tr = jnp.real(taps)[::-1]
    ti = jnp.imag(taps)[::-1]
    real_dt = jnp.real(x2).dtype
    # kernel [out=2, in=2, K]: y_r = x_r*t_r - x_i*t_i ; y_i = x_r*t_i + x_i*t_r
    k = jnp.stack([jnp.stack([tr, -ti]), jnp.stack([ti, tr])]).astype(real_dt)
    lhs = jnp.stack([jnp.real(x2), jnp.imag(x2)], axis=1)   # [B, 2, T]
    y = jax.lax.conv_general_dilated(
        lhs, k, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    return (y[:, 0, :] + 1j * y[:, 1, :]).astype(x2.dtype)


def fir_apply(x: jnp.ndarray, taps: jnp.ndarray, state: jnp.ndarray,
              *, decim: int = 1) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Overlap-save FIR step.

    ``x``: [T] or [C, T]; ``state``: prehistory [*, K-1]; returns
    ``(y, new_state)`` with ``y`` of length T//decim (on the decimated grid aligned to
    the first input sample) and new_state = last K-1 inputs.
    """
    ntaps = taps.shape[-1]
    squeeze = x.ndim == 1
    x2 = x[None, :] if squeeze else x
    st2 = state[None, :] if squeeze else state
    xc = jnp.concatenate([st2.astype(x2.dtype), x2], axis=-1)
    cx = jnp.issubdtype(x2.dtype, jnp.complexfloating) or _as_cx(taps)
    if cx:
        xc = xc.astype(jnp.complex64) if not jnp.issubdtype(
            xc.dtype, jnp.complexfloating) else xc
        y = _conv_valid_complex(xc, taps.astype(jnp.complex64), decim)
    else:
        y = _conv_valid_real(xc, taps.astype(x2.dtype), decim)
    new_state = xc[:, -(ntaps - 1):] if ntaps > 1 else xc[:, :0]
    if squeeze:
        return y[0], new_state[0]
    return y, new_state


def fir_interpolate(x: jnp.ndarray, taps: jnp.ndarray, state: jnp.ndarray,
                    interp: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Polyphase interpolating FIR: T inputs → T·interp outputs.

    Decompose taps into ``interp`` phases; each phase filters the input stream, and
    outputs interleave. One conv call with ``interp`` output features, then a
    reshape-interleave — all static shapes.
    """
    ntaps = taps.shape[-1]
    pad = (-ntaps) % interp
    tp = jnp.pad(taps, (0, pad))
    phases = tp.reshape(-1, interp).T          # [interp, K/interp] phase p taps
    k_per_phase = phases.shape[1]
    squeeze = x.ndim == 1
    x2 = x[None, :] if squeeze else x
    st2 = state[None, :] if squeeze else state
    xc = jnp.concatenate([st2.astype(x2.dtype), x2], axis=-1)
    cx = jnp.issubdtype(xc.dtype, jnp.complexfloating)
    outs = []
    for p in range(phases.shape[0]):
        tp_p = phases[p]
        if cx:
            outs.append(_conv_valid_complex(xc, tp_p.astype(jnp.complex64), 1))
        else:
            outs.append(_conv_valid_real(xc, tp_p.astype(x2.dtype), 1))
    y = jnp.stack(outs, axis=-1).reshape(x2.shape[0], -1) * interp
    new_state = xc[:, -(k_per_phase - 1):] if k_per_phase > 1 else xc[:, :0]
    if squeeze:
        return y[0], new_state[0]
    return y, new_state


def freq_xlating_taps(taps: np.ndarray, center_freq: float, sample_rate: float
                      ) -> np.ndarray:
    """Heterodyne low-pass taps up to ``center_freq`` (frequency-xlating FIR design)."""
    n = np.arange(len(taps), dtype=np.float64)
    rot = np.exp(1j * 2.0 * np.pi * center_freq / sample_rate * n)
    return (np.asarray(taps, dtype=np.float64) * rot).astype(np.complex64)
