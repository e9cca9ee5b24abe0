"""Equivalence of the three FIR lowering strategies (conv HLO, MXU matmul framing,
FFT overlap-save) — all must match the NumPy reference within f32 tolerance."""

import jax.numpy as jnp
import numpy as np
from gnuradio4_tpu.utils.transfer import (host_array as to_host, safe_put as dev_put)
import pytest

from gnuradio4_tpu.ops.fir import fir_apply, fir_init_state


METHODS = ["conv", "matmul", "fft"]


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("ntaps", [9, 64, 127, 513])
def test_real_matches_reference(method, ntaps, rng):
    taps = rng.standard_normal(ntaps).astype(np.float32)
    x = rng.standard_normal(2048).astype(np.float32)
    ref = np.convolve(x.astype(np.float64), taps)[: len(x)]
    y, _ = fir_apply(dev_put(x), dev_put(taps),
                     fir_init_state(0, ntaps, jnp.float32), method=method)
    np.testing.assert_allclose(to_host(y), ref, atol=ntaps * 3e-6)


@pytest.mark.parametrize("method", METHODS)
def test_complex_input_real_taps(method, rng):
    taps = rng.standard_normal(63).astype(np.float32)
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)
         ).astype(np.complex64)
    ref = np.convolve(x.astype(np.complex128), taps)[: len(x)]
    y, _ = fir_apply(dev_put(x), dev_put(taps),
                     fir_init_state(0, 63, jnp.complex64), method=method)
    np.testing.assert_allclose(to_host(y), ref, atol=3e-4)


@pytest.mark.parametrize("method", METHODS)
def test_complex_taps(method, rng):
    taps = (rng.standard_normal(31) + 1j * rng.standard_normal(31)
            ).astype(np.complex64)
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)
         ).astype(np.complex64)
    ref = np.convolve(x.astype(np.complex128), taps.astype(np.complex128)
                      )[: len(x)]
    y, _ = fir_apply(dev_put(x), dev_put(taps),
                     fir_init_state(0, 31, jnp.complex64), method=method)
    np.testing.assert_allclose(to_host(y), ref, atol=3e-4)


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("decim", [2, 4, 8])
def test_decimation(method, decim, rng):
    taps = rng.standard_normal(32).astype(np.float32)
    x = rng.standard_normal(1024).astype(np.float32)
    ref = np.convolve(x.astype(np.float64), taps)[: len(x)][::decim]
    y, _ = fir_apply(dev_put(x), dev_put(taps),
                     fir_init_state(0, 32, jnp.float32), decim=decim,
                     method=method)
    np.testing.assert_allclose(to_host(y), ref, atol=2e-4)


@pytest.mark.parametrize("method", METHODS)
def test_streaming_continuity(method, rng):
    taps = rng.standard_normal(65).astype(np.float32)
    x = rng.standard_normal(4096).astype(np.float32)
    ref = np.convolve(x.astype(np.float64), taps)[: len(x)]
    state = fir_init_state(0, 65, jnp.float32)
    parts = []
    for chunk in x.reshape(4, 1024):
        y, state = fir_apply(dev_put(chunk), dev_put(taps), state,
                             method=method)
        parts.append(to_host(y))
    np.testing.assert_allclose(np.concatenate(parts), ref, atol=3e-4)


@pytest.mark.parametrize("method", ["matmul", "fft"])
def test_multichannel(method, rng):
    taps = rng.standard_normal(17).astype(np.float32)
    x = rng.standard_normal((5, 512)).astype(np.float32)
    y, _ = fir_apply(dev_put(x), dev_put(taps),
                     fir_init_state(5, 17, jnp.float32), method=method)
    for c in range(5):
        ref = np.convolve(x[c].astype(np.float64), taps)[:512]
        np.testing.assert_allclose(to_host(y)[c], ref, atol=2e-4)


@pytest.mark.parametrize("method", ["matmul", "fft"])
def test_odd_sizes(method, rng):
    """Non-power-of-two stream lengths (single-tile / padded paths)."""
    taps = rng.standard_normal(40).astype(np.float32)
    x = rng.standard_normal(700).astype(np.float32)
    ref = np.convolve(x.astype(np.float64), taps)[:700]
    y, _ = fir_apply(dev_put(x), dev_put(taps),
                     fir_init_state(0, 40, jnp.float32), method=method)
    assert to_host(y).shape == (700,)
    np.testing.assert_allclose(to_host(y), ref, atol=2e-4)


class TestInt8Matmul:
    def test_real_snr(self, rng):
        taps = rng.standard_normal(127).astype(np.float32)
        x = rng.standard_normal(4096).astype(np.float32)
        ref = np.convolve(x.astype(np.float64), taps)[: len(x)]
        y, _ = fir_apply(dev_put(x), taps,
                         fir_init_state(0, 127, jnp.float32),
                         method="matmul_int8")
        err = to_host(y) - ref
        snr = 10 * np.log10(np.mean(ref ** 2) / np.mean(err ** 2))
        assert snr > 40.0, f"int8 SNR {snr:.1f} dB"

    def test_complex_snr(self, rng):
        taps = (rng.standard_normal(63) + 1j * rng.standard_normal(63)
                ).astype(np.complex64)
        x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)
             ).astype(np.complex64)
        ref = np.convolve(x.astype(np.complex128), taps.astype(np.complex128)
                          )[: len(x)]
        y, _ = fir_apply(dev_put(x), taps,
                         fir_init_state(0, 63, jnp.complex64),
                         method="matmul_int8")
        err = np.abs(to_host(y) - ref)
        snr = 10 * np.log10(np.mean(np.abs(ref) ** 2) / np.mean(err ** 2))
        assert snr > 38.0, f"int8 SNR {snr:.1f} dB"

    def test_decimating(self, rng):
        taps = rng.standard_normal(32).astype(np.float32)
        x = rng.standard_normal(2048).astype(np.float32)
        ref = np.convolve(x.astype(np.float64), taps)[: len(x)][::4]
        y, _ = fir_apply(dev_put(x), taps,
                         fir_init_state(0, 32, jnp.float32), decim=4,
                         method="matmul_int8")
        err = to_host(y) - ref
        snr = 10 * np.log10(np.mean(ref ** 2) / (np.mean(err ** 2) + 1e-30))
        assert snr > 40.0
