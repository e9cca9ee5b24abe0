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


class TestRemezVsScipy:
    """Parks-McClellan: the equiripple optimum is unique, so our exchange and
    SciPy's must land on (nearly) the same filter."""

    CASES = [
        dict(numtaps=65, bands=[0, 0.20, 0.25, 0.5], desired=[1, 0]),
        dict(numtaps=64, bands=[0, 0.20, 0.25, 0.5], desired=[1, 0]),   # type II
        dict(numtaps=33, bands=[0, 0.15, 0.22, 0.5], desired=[1, 0],
             weight=[1, 5]),
        dict(numtaps=129, bands=[0, 0.05, 0.07, 0.5], desired=[1, 0]),
        dict(numtaps=17, bands=[0, 0.1, 0.2, 0.35, 0.425, 0.5],
             desired=[0, 1, 0]),
    ]

    @pytest.mark.parametrize("case", CASES,
                             ids=[f"n{c['numtaps']}" for c in CASES])
    def test_taps_match(self, case):
        h = fd.remez(**case)
        hs = scipy_signal.remez(case["numtaps"], case["bands"],
                                case["desired"], weight=case.get("weight"),
                                fs=1.0)
        assert h.shape == hs.shape
        np.testing.assert_allclose(h, hs, atol=5e-5)

    def test_weighted_multiband_ripple_near_optimum(self):
        """Heavily weighted 3-band case: compare achieved weighted ripple, not
        taps (both solvers stop within grid resolution of the optimum)."""
        case = dict(numtaps=101, bands=[0, 0.08, 0.12, 0.28, 0.34, 0.5],
                    desired=[0, 1, 0], weight=[10, 1, 10])

        def ripple(h):
            H = np.abs(np.fft.rfft(h, 65536))
            fr = np.arange(len(H)) / 65536
            worst = 0.0
            for (lo, hi), d, w in zip(
                    np.asarray(case["bands"]).reshape(-1, 2),
                    case["desired"], case["weight"]):
                m = (fr >= lo) & (fr <= hi)
                worst = max(worst, w * np.max(np.abs(H[m] - d)))
            return worst

        h = fd.remez(**case, grid_density=32, maxiter=120)
        hs = scipy_signal.remez(case["numtaps"], case["bands"],
                                case["desired"], weight=case["weight"], fs=1.0)
        assert ripple(h) <= ripple(hs) * 1.05

    def test_symmetry_and_fs_scaling(self):
        h = fd.remez(51, [0, 2000, 2500, 5000], [1, 0], fs=10000.0)
        np.testing.assert_allclose(h, h[::-1], atol=0)
        hs = scipy_signal.remez(51, [0, 2000, 2500, 5000], [1, 0], fs=10000.0)
        np.testing.assert_allclose(h, hs, atol=5e-5)

    def test_validation(self):
        with pytest.raises(ValueError):
            fd.remez(0, [0, 0.2, 0.3, 0.5], [1, 0])
        with pytest.raises(ValueError):
            fd.remez(31, [0, 0.3, 0.2, 0.5], [1, 0])   # non-monotonic edges
        with pytest.raises(ValueError):
            fd.remez(31, [0, 0.2, 0.3, 0.5], [1, 0, 1])  # desired len mismatch
        with pytest.raises(ValueError):
            fd.remez(31, [0, 0.2, 0.3, 0.5], [1, 0], weight=[1])  # weight len
        with pytest.raises(ValueError):  # type II cannot pass at Nyquist
            fd.remez(32, [0, 0.15, 0.25, 0.5], [0, 1])
