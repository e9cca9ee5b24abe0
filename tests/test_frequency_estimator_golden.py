"""Golden mirror of the reference's qa_FrequencyEstimator.cpp
(blocks/filter/test/:67-224): the grid-monitoring frequency sweep — 30 test
tones from 49.9 to 51.0 Hz (sub-mHz / 10 mHz / 100 mHz steps) at 1 kHz with
1% noise — through the time-domain (period regression, 30 mHz tolerance) and
frequency-domain (4096-pt FFT + parabolic interpolation, 1 Hz tolerance)
estimators, driven as decimating blocks through the Scheduler."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource

FS = 1000.0
# qa_FrequencyEstimator.cpp:71 testFrequencies
TEST_FREQS = ([49.9, 50.0] + [50.0 + k / 1000 for k in range(1, 10)]
              + [50.0 + k / 100 for k in range(1, 10)]
              + [50.0 + k / 10 for k in range(1, 11)])


def _signal(freq, n, noise_amp, seed):
    rng = np.random.default_rng(seed)
    phase = 2 * np.pi * freq / FS * np.arange(1, n + 1)
    return (np.sin(phase)
            + noise_amp * rng.standard_normal(n)).astype(np.float32)


def _estimate(freq, *, method, chunk, n, noise_amp=0.01, seed=1, **kw):
    g = gr.Graph()
    src = VectorSource(_signal(freq, n, noise_amp, seed))
    est = g.emplace("FrequencyEstimator", method=method, chunk=chunk, **kw)
    snk = VectorSink()
    g.connect_chain(src, est, snk)
    gr.Scheduler(g, block_len=n, sample_rate=FS).run_and_wait()
    return snk.data()


class TestTimeDomain:
    """≈ cpp:78-103: n=128 (≈6.4 periods of 50 Hz), 1% noise, 30 mHz."""

    @pytest.mark.parametrize("freq", TEST_FREQS)
    def test_sweep_30_mhz(self, freq):
        est = _estimate(freq, method="period", chunk=128, n=128,
                        f_min=45.0, f_max=55.0, f_expected=50.0)
        assert est.shape[-1] == 1
        assert abs(float(est[-1]) - freq) < 0.03, (freq, float(est[-1]))

    def test_decimating_chunks(self):
        # ≈ cpp:104-135: 1280 samples → 10 chunk estimates
        est = _estimate(50.05, method="period", chunk=128, n=1280,
                        f_min=45.0, f_max=55.0, f_expected=50.0)
        assert est.shape[-1] == 10
        np.testing.assert_allclose(est, 50.05, atol=0.03)

    def test_out_of_band_falls_back_to_expected(self):
        # silence → 0 crossings → f_expected (the reference's band clamp)
        g = gr.Graph()
        src = VectorSource(np.zeros(128, np.float32))
        est = g.emplace("FrequencyEstimator", method="period", chunk=128,
                        f_min=45.0, f_max=55.0, f_expected=50.0)
        snk = VectorSink()
        g.connect_chain(src, est, snk)
        gr.Scheduler(g, block_len=128, sample_rate=FS).run_and_wait()
        assert float(snk.data()[0]) == 50.0


class TestFrequencyDomain:
    """≈ cpp:136-224: 4096-pt FFT + interpolation, 1 Hz tolerance
    (conservative for the 0.244 Hz bin width)."""

    @pytest.mark.parametrize("freq", TEST_FREQS[::6])
    def test_sweep_1_hz(self, freq):
        est = _estimate(freq, method="fft", chunk=4096, n=4096)
        assert abs(float(est[-1]) - freq) < 1.0, (freq, float(est[-1]))

    def test_decimating_multi_chunk(self):
        # ≈ cpp:168: 10 FFT chunks, every estimate in tolerance
        est = _estimate(50.5, method="fft", chunk=4096, n=40960)
        assert est.shape[-1] == 10
        np.testing.assert_allclose(est, 50.5, atol=1.0)
        # parabolic interpolation beats the raw 0.244 Hz bin width
        np.testing.assert_allclose(est, 50.5, atol=0.1)


class TestLockInDemodulator:
    """≈ qa_FrequencyEstimator.cpp:226-430 "IQDemodulator" (the reference's
    dual-input lock-in): amplitude ratio within 5%, phase within 0.1 rad
    (3° in degrees mode), frequency within 5%, across both sweep cases and
    both phase units, plus phase inversion."""

    def _run(self, freq, fs, *, phase_unit="radians", invert=False,
             phase_shift=0.5, amp_ratio=0.8, chunk=1024, n_chunks=40,
             seed=3):
        rng = np.random.default_rng(seed)
        n = chunk * n_chunks
        t = np.arange(n)
        omega = 2 * np.pi * freq / fs
        ref = (np.sin(omega * t)
               + 0.01 * rng.standard_normal(n)).astype(np.float32)
        resp = (amp_ratio * np.sin(omega * t + phase_shift) + 0.1
                + 0.01 * rng.standard_normal(n)).astype(np.float32)
        g = gr.Graph()
        demod = g.emplace("LockInDemodulator", chunk=chunk,
                          phase_unit=phase_unit, invert_phase=invert)
        g.connect(VectorSource(ref), demod, dst_port="ref")
        g.connect(VectorSource(resp), demod, dst_port="resp")
        sinks = {p: VectorSink() for p in ("amp", "phase", "freq")}
        for p, s in sinks.items():
            g.connect(demod, s, src_port=p)
        gr.Scheduler(g, block_len=n, sample_rate=fs).run_and_wait()
        return {p: s.data() for p, s in sinks.items()}

    @pytest.mark.parametrize("freq,fs", [(100e3, 1e6), (5e6, 62.5e6)])
    @pytest.mark.parametrize("phase_unit", ["radians", "degrees"])
    def test_sweep_cases(self, freq, fs, phase_unit):
        out = self._run(freq, fs, phase_unit=phase_unit)
        amp = float(np.mean(out["amp"]))
        ph = float(np.mean(out["phase"]))
        fq = float(np.mean(out["freq"]))
        assert abs(amp - 0.8) < 0.05 * 0.8 + 0.05, amp
        if phase_unit == "degrees":
            assert abs(ph - 0.5 * 180 / np.pi) < 3.0, ph
        else:
            assert abs(ph - 0.5) < 0.1, ph
        assert abs(fq - freq) < 0.05 * freq, fq

    def test_phase_inversion(self):
        # ≈ cpp:290: invert_phase flips the sign of the measured shift
        out_n = self._run(150e3, 1e6, phase_shift=0.3, chunk=256,
                          n_chunks=100)
        out_i = self._run(150e3, 1e6, phase_shift=0.3, chunk=256,
                          n_chunks=100, invert=True)
        assert abs(float(np.mean(out_n["phase"])) - 0.3) < 0.1
        assert abs(float(np.mean(out_i["phase"])) + 0.3) < 0.1
