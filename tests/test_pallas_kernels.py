"""Pallas kernel equivalence tests (interpret mode on CPU; native compilation is
validated separately on the TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnuradio4_tpu.utils.transfer import (device_zeros,
                                          host_array as to_host,
                                          safe_put as dev_put)

from gnuradio4_tpu.ops import filter_design as fd
from gnuradio4_tpu.ops.iir import sos_apply, sos_init_state
from gnuradio4_tpu.ops.pallas_kernels import iir_sos_pallas, nco_mix_pallas
from gnuradio4_tpu.ops.signal import phase_increment


class TestIirSosPallas:
    def test_matches_scan_reference(self, rng):
        res = fd.design_iir("butterworth", "lowpass", 4, sample_rate=100.0,
                            f_low=10.0)
        x = rng.standard_normal((8, 256)).astype(np.float32)
        y_ref, s_ref = sos_apply(jnp.asarray(x), res.sos,
                                 sos_init_state(8, res.sos.shape[0]))
        y, s = jax.jit(lambda v, st: iir_sos_pallas(
            v, res.sos, st, interpret=True))(
            jnp.asarray(x), sos_init_state(8, res.sos.shape[0]))
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_streaming_state_carry(self, rng):
        res = fd.design_iir("chebyshev1", "lowpass", 2, sample_rate=50.0,
                            f_low=5.0)
        x = rng.standard_normal(512).astype(np.float32)
        y1, _ = jax.jit(lambda v, st: iir_sos_pallas(
            v, res.sos, st, interpret=True))(
            jnp.asarray(x), sos_init_state(0, res.sos.shape[0]))
        state = sos_init_state(0, res.sos.shape[0])
        parts = []
        for chunk in x.reshape(2, 256):
            y, state = jax.jit(lambda v, st: iir_sos_pallas(
                v, res.sos, st, interpret=True))(jnp.asarray(chunk), state)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(parts), np.asarray(y1),
                                   rtol=1e-4, atol=1e-5)


class TestNcoMixPallas:
    def test_matches_numpy_rotation(self):
        fs = 1e6
        f_shift = 123456.0
        n = 2048
        x = (np.ones(n) + 0j).astype(np.complex64)
        dphi = phase_increment(f_shift, fs)
        # under jit: EAGER pallas dispatch is UNIMPLEMENTED on the relay
        y, ph = jax.jit(lambda v: nco_mix_pallas(
            v, np.uint32(0), dphi, interpret=True))(dev_put(x))
        t = np.arange(n)
        ref = np.exp(2j * np.pi * (float(dphi) / 2**32) * t)
        np.testing.assert_allclose(to_host(y), ref, atol=2e-3)
        # phase carry: continuing must be seamless
        y2, _ = jax.jit(lambda v, p: nco_mix_pallas(
            v, p, dphi, interpret=True))(dev_put(x), ph)
        ref2 = np.exp(2j * np.pi * (float(dphi) / 2**32) * (t + n))
        np.testing.assert_allclose(to_host(y2), ref2, atol=4e-3)


class TestFirIlvPallas:
    """Interleaved banded FIR Pallas kernel vs NumPy reference (interpret
    mode; the shifted operand comes from a sublane roll + the next block's
    first row — the zero-copy framing without misaligned VMEM reads)."""

    @pytest.mark.parametrize("ntaps,decim", [(127, 1), (63, 2), (31, 1)])
    def test_matches_reference(self, rng, ntaps, decim):
        from gnuradio4_tpu.ops.fir import fir_apply, fir_init_state
        taps = rng.standard_normal(ntaps).astype(np.float32)
        x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
             ).astype(np.complex64)
        y, _ = jax.jit(lambda v, st: fir_apply(
            v, taps, st, decim=decim, method="pallas"))(
            dev_put(x), fir_init_state(0, ntaps, jnp.complex64))
        ref = np.convolve(x.astype(np.complex128), taps)[:4096][::decim]
        np.testing.assert_allclose(to_host(y), ref, atol=2e-4)

    def test_streaming_state_carry(self, rng):
        from gnuradio4_tpu.ops.fir import fir_apply, fir_init_state
        taps = rng.standard_normal(65).astype(np.float32)
        x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)
             ).astype(np.complex64)
        ref = np.convolve(x.astype(np.complex128), taps)[:8192]
        st = fir_init_state(0, 65, jnp.complex64)
        parts = []
        for chunk in x.reshape(2, 4096):
            y, st = jax.jit(lambda v, s0: fir_apply(
                v, taps, s0, method="pallas"))(dev_put(chunk), st)
            parts.append(to_host(y))
        np.testing.assert_allclose(np.concatenate(parts), ref, atol=2e-4)


class TestFusedFirDemod:
    """Round-5 fused banded FIR + quadrature-demod VMEM pass
    (ops/fir.fir_quad_demod_fused → pallas_kernels.fir_demod_planar_pallas):
    the complex FIR intermediate never round-trips HBM. Must match the
    FIR→demod composition including the carried v[−1], the cross-program
    prev-sample reconstruction, decimation, and partial final tiles."""

    @pytest.mark.parametrize("k,decim,t", [(127, 1, 1 << 15), (64, 2, 1 << 15),
                                           (127, 1, 12345 + 126)])
    def test_matches_composition(self, k, decim, t):
        from gnuradio4_tpu.ops.demod import quadrature_demod
        from gnuradio4_tpu.ops.fir import fir_apply, fir_quad_demod_fused
        rng = np.random.default_rng(0)
        taps = (rng.standard_normal(k) / 8).astype(np.float32)
        x = (rng.standard_normal(t + k - 1)
             + 1j * rng.standard_normal(t + k - 1)).astype(np.complex64)
        prev = dev_put(np.complex64(0.3 + 0.1j))
        got = jax.jit(lambda v, pv: fir_quad_demod_fused(
            v[None, :], taps, decim, pv, 1.5))(dev_put(x), prev)
        y, _ = jax.jit(lambda v, st: fir_apply(
            v, taps, st, decim=decim))(dev_put(x[k - 1:]),
                                       dev_put(x[: k - 1]))
        ref, _ = jax.jit(lambda v, pv: quadrature_demod(
            v, pv, gain=1.5))(y, prev)
        assert got.shape[-1] == ref.shape[-1]
        assert float(np.max(to_host(jnp.abs(got[0] - ref)))) < 2e-3

    def test_complex_taps_and_streaming_carry(self):
        """Heterodyned (complex) taps — the wbfm xlating form — streamed in
        two chunks: the second chunk's first demod sample must use the first
        chunk's last FIR output as v[−1]."""
        from gnuradio4_tpu.ops.demod import quadrature_demod
        from gnuradio4_tpu.ops.fir import (fir_apply, fir_init_state,
                                           fir_quad_demod_fused,
                                           freq_xlating_taps)
        rng = np.random.default_rng(1)
        k = 127
        taps = freq_xlating_taps(
            (rng.standard_normal(k) / 8).astype(np.float32), 0.15, 1.0)
        n = 1 << 14
        x = (rng.standard_normal(2 * n + k - 1)
             + 1j * rng.standard_normal(2 * n + k - 1)).astype(np.complex64)
        # reference: one-shot composition
        one = device_zeros((), np.complex64) + 1     # relay-safe ones()
        taps_np = np.asarray(taps)
        y, _ = jax.jit(lambda v, st: fir_apply(v, taps_np, st))(
            dev_put(x[k - 1:]), dev_put(x[: k - 1]))
        ref, _ = jax.jit(lambda v, o: quadrature_demod(v, o, gain=1.0))(
            y, one)
        # streamed: two fused chunks with the carried v[-1] in between
        c1 = jax.jit(lambda v, o: fir_quad_demod_fused(
            v[None, :], taps_np, 1, o, 1.0))(dev_put(x[: n + k - 1]), one)
        v_last, _ = jax.jit(lambda v, st: fir_apply(v, taps_np, st))(
            dev_put(x[k - 1: n + k - 1]), dev_put(x[: k - 1]))
        c2 = jax.jit(lambda v, pv: fir_quad_demod_fused(
            v[None, :], taps_np, 1, pv, 1.0))(
            dev_put(x[n: 2 * n + k - 1]), v_last[-1])
        got = jnp.concatenate([c1[0], c2[0]])
        assert float(np.max(to_host(jnp.abs(got - ref)))) < 2e-3
