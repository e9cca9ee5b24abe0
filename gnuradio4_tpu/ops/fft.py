"""FFT / spectrum kernels.

Reference: in-house radix FFT + SIMD split-radix (algorithm/fourier/fft.hpp:91,
SimdFFT.hpp) and the FFT block producing DataSet spectra (blocks/fourier/fft.hpp:33).

TPU-native design: XLA's native FFT HLO (``jnp.fft``) — hand-rolling radix kernels
would fight the compiler; XLA's TPU FFT is already fused/tiled. We provide windowed
chunked transforms over ``[..., n_chunks, fft_size]`` with static shapes, plus the
spectrum post-processing (magnitude, dB, shift, phase) the reference FFT block emits.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .windows import enbw, make_window


def chunked_fft(x: jnp.ndarray, fft_size: int, *, window: jnp.ndarray | None = None
                ) -> jnp.ndarray:
    """Reshape the trailing time axis into ``[-1, fft_size]`` chunks, window, FFT.

    x: [..., T] with T % fft_size == 0 → complex spectra [..., T//fft_size, fft_size].
    """
    lead = x.shape[:-1]
    xr = x.reshape(*lead, -1, fft_size)
    if window is not None:
        xr = xr * window.astype(jnp.real(xr).dtype)
    return jnp.fft.fft(xr, axis=-1)


def magnitude(spectrum: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(spectrum)


def magnitude_db(spectrum: jnp.ndarray, *, floor: float = 1e-20) -> jnp.ndarray:
    p = jnp.real(spectrum) ** 2 + jnp.imag(spectrum) ** 2
    return 10.0 * jnp.log10(jnp.maximum(p, floor))


def phase(spectrum: jnp.ndarray, *, unwrap: bool = False) -> jnp.ndarray:
    ph = jnp.angle(spectrum)
    if unwrap:
        d = jnp.diff(ph, axis=-1)
        d = jnp.mod(d + jnp.pi, 2 * jnp.pi) - jnp.pi
        ph = jnp.concatenate([ph[..., :1], ph[..., :1] + jnp.cumsum(d, axis=-1)],
                             axis=-1)
    return ph


def fftshift(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.fft.fftshift(x, axes=-1)


def freq_axis(fft_size: int, sample_rate: float, *, shifted: bool = False,
              one_sided: bool = False) -> np.ndarray:
    f = np.fft.fftfreq(fft_size, d=1.0 / sample_rate)
    if one_sided:
        return f[: fft_size // 2 + 1].copy()
    if shifted:
        return np.fft.fftshift(f)
    return f


def spectrum_scale(fft_size: int, window: np.ndarray | None, *, power: bool,
                   density: bool, sample_rate: float) -> float:
    """Scale factor for calibrated amplitude/power spectra (coherent/noise gain)."""
    if window is None:
        cg = 1.0
        nbw = 1.0
    else:
        w = np.asarray(window, dtype=np.float64)
        cg = float(np.mean(w))
        nbw = enbw(w)
    if power and density:
        return 1.0 / (fft_size * cg * np.sqrt(nbw * sample_rate))
    return 1.0 / (fft_size * cg)
