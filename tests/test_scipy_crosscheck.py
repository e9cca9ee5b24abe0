"""Independent cross-validation against SciPy (reference implementations we did
NOT write): IIR design responses, lfilter equivalence, resample_poly, windows,
Savitzky-Golay — the 'outputs within SNR tolerance on identical stimulus'
requirement checked against a third party."""

import numpy as np
import pytest

import jax.numpy as jnp

scipy_signal = pytest.importorskip("scipy.signal")

from gnuradio4_tpu.ops import filter_design as fd
from gnuradio4_tpu.ops.fir import fir_apply, fir_init_state
from gnuradio4_tpu.ops.iir import iir_apply, iir_init_state
from gnuradio4_tpu.ops.resample import RationalResamplerKernel
from gnuradio4_tpu.ops.savgol import design_savgol
from gnuradio4_tpu.ops.windows import make_window


def snr_db(ref, out):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(out, np.float64) - ref
    return 10 * np.log10(np.mean(ref ** 2) / (np.mean(err ** 2) + 1e-300))


class TestIirVsScipy:
    @pytest.mark.parametrize("design,scipy_name", [
        ("butterworth", "butter"), ("chebyshev1", "cheby1"),
        ("chebyshev2", "cheby2")])
    def test_response_matches_scipy_design(self, design, scipy_name):
        fs, fc, order = 1000.0, 100.0, 4
        res = fd.design_iir(design, "lowpass", order, sample_rate=fs, f_low=fc,
                            ripple_db=1.0, atten_db=40.0)
        if scipy_name == "butter":
            b, a = scipy_signal.butter(order, fc, fs=fs)
        elif scipy_name == "cheby1":
            b, a = scipy_signal.cheby1(order, 1.0, fc, fs=fs)
        else:
            b, a = scipy_signal.cheby2(order, 40.0, fc, fs=fs)
        w, h_ref = scipy_signal.freqz(b, a, worN=512, fs=fs)
        _, h_ours = fd.freq_response(res.b, res.a, sample_rate=fs,
                                     freqs=np.asarray(w))
        np.testing.assert_allclose(np.abs(h_ours), np.abs(h_ref),
                                   rtol=1e-5, atol=1e-7)

    def test_iir_apply_matches_lfilter(self, rng):
        b, a = scipy_signal.butter(6, 0.2)
        x = rng.standard_normal(2048).astype(np.float32)
        ref = scipy_signal.lfilter(b, a, x)
        y, _ = iir_apply(jnp.asarray(x), b, a, iir_init_state(0, len(b), len(a)))
        assert snr_db(ref, np.asarray(y)) > 90.0


class TestFirVsScipy:
    def test_design_matches_firwin(self):
        fs, fc, n = 1000.0, 120.0, 101
        ours = fd.design_fir("lowpass", n, sample_rate=fs, f_low=fc,
                             window="Hamming")
        theirs = scipy_signal.firwin(n, fc, fs=fs, window="hamming")
        # both normalize to unity DC gain
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_fir_apply_matches_lfilter(self, rng):
        taps = scipy_signal.firwin(63, 0.3)
        x = rng.standard_normal(4096).astype(np.float32)
        ref = scipy_signal.lfilter(taps, [1.0], x)
        y, _ = fir_apply(jnp.asarray(x), taps.astype(np.float32),
                         fir_init_state(0, 63, jnp.float32))
        assert snr_db(ref, np.asarray(y)) > 90.0


class TestResamplerVsScipy:
    @pytest.mark.parametrize("L,M", [(2, 3), (3, 2), (5, 4)])
    def test_matches_resample_poly(self, L, M, rng):
        """In-band multitone through our polyphase vs scipy.resample_poly.

        The anti-alias designs differ (ours: Kaiser 16 taps/phase, scipy's
        default differs), so compare on a signal well inside both passbands.
        """
        k = RationalResamplerKernel(L, M, ntaps_per_phase=24)
        n = 6000
        t = np.arange(n)
        band = 0.5 * min(1.0, L / M)          # output Nyquist in input cycles
        freqs = np.array([0.05, 0.13, 0.27]) * band
        x = sum(np.sin(2 * np.pi * f * t + i) for i, f in enumerate(freqs))
        x = x.astype(np.float32)
        y, _ = k.apply(jnp.asarray(x), k.init_state(0, jnp.float32))
        ref = scipy_signal.resample_poly(x.astype(np.float64), L, M,
                                         window=("kaiser", 8.6))
        y = np.asarray(y)
        # group delays differ; align by cross-correlation then compare SNR
        seg_y = y[300: len(y) - 300]
        c = np.correlate(ref, seg_y[:2000], mode="valid")
        off = int(np.argmax(np.abs(c)))
        sign = np.sign(c[off])  # a multitone can align on a negated lag
        ref_al = sign * ref[off: off + len(seg_y)]
        assert snr_db(ref_al, seg_y[: len(ref_al)]) > 40.0

    def test_windows_match_scipy(self):
        for kind, sp in [("Hann", "hann"), ("Hamming", "hamming"),
                         ("Blackman", "blackman"),
                         ("BlackmanHarris", "blackmanharris"),
                         ("Nuttall", "nuttall"), ("FlatTop", "flattop")]:
            ours = make_window(kind, 256, dtype=np.float64)
            theirs = scipy_signal.get_window(sp, 256, fftbins=False)
            # flattop coefficient sets differ slightly across references
            tol = 2e-2 if kind in ("FlatTop", "Nuttall") else 1e-6
            np.testing.assert_allclose(ours, theirs, atol=tol)


class TestSavgolVsScipy:
    def test_coeffs_match(self):
        ours = design_savgol(21, 4)
        theirs = scipy_signal.savgol_coeffs(21, 4)
        np.testing.assert_allclose(ours, theirs, atol=1e-12)

    def test_derivative_coeffs_match(self):
        ours = design_savgol(15, 3, deriv=1, delta=0.5)
        theirs = scipy_signal.savgol_coeffs(15, 3, deriv=1, delta=0.5)
        np.testing.assert_allclose(ours, theirs, atol=1e-12)
