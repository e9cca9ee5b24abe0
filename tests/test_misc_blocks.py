"""Tests for the remaining block families: FunctionGenerator, ClockSource,
SchmittTrigger, FrequencyEstimator, SavitzkyGolay, SvdDenoiser, BurstTaper,
Expression blocks, SyncBlock, electrical metering, estimators."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.misc import (BurstTaper, ClockSource, ExpressionDISO,
                                       ExpressionSISO, FrequencyEstimator,
                                       FunctionGenerator, SavitzkyGolayFilter,
                                       SchmittTrigger, SvdDenoiser, SyncBlock)
from gnuradio4_tpu.blocks.electrical import PowerFactor, PowerMetrics
from gnuradio4_tpu.blocks.testing import TagSource, VectorSink, VectorSource
from gnuradio4_tpu.core.tags import Keys, Tag
from gnuradio4_tpu.ops import estimators as est
from gnuradio4_tpu.ops.savgol import design_savgol


def run_chain(*blocks, block_len=512, sample_rate=1.0, n_steps=None):
    g = gr.Graph()
    g.connect_chain(*blocks)
    gr.Scheduler(g, block_len=block_len,
                 sample_rate=sample_rate).run_and_wait(n_steps)


class TestFunctionGenerator:
    @pytest.mark.parametrize("mode,check", [
        ("Const", lambda t, y: np.allclose(y, 2.0)),
        ("LinearRamp", lambda t, y: np.allclose(y, 2.0 + 3.0 * np.minimum(t, 1.0),
                                                atol=1e-4)),
        ("CubicSpline", lambda t, y: abs(y[-1] - 5.0) < 1e-4
         and abs(np.interp(0.5, t, y) - 3.5) < 0.02),
    ])
    def test_modes(self, mode, check):
        fg = FunctionGenerator(signal_type=mode, start_value=2.0, final_value=5.0,
                               duration=1.0, n_samples=2000, sample_rate=1000.0)
        snk = VectorSink()
        run_chain(fg, snk, block_len=500, sample_rate=1000.0)
        y = snk.data()
        t = np.arange(2000) / 1000.0
        assert y.shape == (2000,)
        assert check(t, y)

    def test_parabolic_monotone_and_smooth(self):
        fg = FunctionGenerator(signal_type="ParabolicRamp", start_value=0.0,
                               final_value=1.0, duration=1.0, round_off_time=0.2,
                               n_samples=1200, sample_rate=1000.0)
        snk = VectorSink()
        run_chain(fg, snk, block_len=400, sample_rate=1000.0)
        y = snk.data()
        assert y[0] < 0.01 and abs(y[1100] - 1.0) < 0.01
        assert np.all(np.diff(y[:1000]) >= -1e-6)  # monotone rise
        # parabolic start: slope grows from ~0
        assert np.diff(y)[2] < np.diff(y)[150]

    def test_impulse_response_window(self):
        """ImpulseResponse: final_value inside [it0, it0+it1], start_value
        outside (FunctionGenerator.hpp:295)."""
        fg = FunctionGenerator(signal_type="ImpulseResponse", start_value=1.0,
                               final_value=7.0, impulse_time0=0.2,
                               impulse_time1=0.3, n_samples=1000,
                               sample_rate=1000.0)
        snk = VectorSink()
        run_chain(fg, snk, block_len=250, sample_rate=1000.0)
        y = snk.data()
        t = np.arange(1000) / 1000.0
        exp = np.where((t < 0.2) | (t > 0.5), 1.0, 7.0)
        np.testing.assert_allclose(y, exp)

    def test_tone_amplitude_offset_and_expiry(self):
        """Tone types: final_value = amplitude, start_value = offset; a
        positive duration expires the tone back to the offset
        (FunctionGenerator.hpp:258-269,344)."""
        fg = FunctionGenerator(signal_type="Sin", start_value=2.0,
                               final_value=0.5, frequency=50.0, duration=0.5,
                               n_samples=1000, sample_rate=1000.0)
        snk = VectorSink()
        run_chain(fg, snk, block_len=250, sample_rate=1000.0)
        y = snk.data()
        t = np.arange(1000) / 1000.0
        live = t <= 0.5
        np.testing.assert_allclose(
            y[live], 0.5 * np.sin(2 * np.pi * 50.0 * t[live]) + 2.0, atol=1e-4)
        np.testing.assert_allclose(y[t > 0.5], 2.0)

    @pytest.mark.parametrize("mode", ["UniformNoise", "TriangularNoise",
                                      "GaussianNoise"])
    def test_noise_types(self, mode):
        """Noise types: start_value = amplitude (FunctionGenerator.hpp:342)."""
        fg = FunctionGenerator(signal_type=mode, start_value=2.0, seed=1,
                               n_samples=20000, sample_rate=1000.0)
        snk = VectorSink()
        run_chain(fg, snk, block_len=5000, sample_rate=1000.0)
        y = snk.data()
        assert abs(y.mean()) < 0.06
        if mode == "GaussianNoise":
            assert abs(y.var() - 4.0) < 0.2
        else:
            assert np.all(np.abs(y) <= 2.0)
            var = 4.0 / 3.0 if mode == "UniformNoise" else 4.0 / 6.0
            assert abs(y.var() - var) < 0.1

    def test_settings_change_restarts_segment(self):
        fg = FunctionGenerator(signal_type="LinearRamp", start_value=0.0,
                               final_value=1.0, duration=0.5, sample_rate=1000.0)
        snk = VectorSink()
        g = gr.Graph()
        g.connect_chain(fg, snk)
        sched = gr.Scheduler(g, block_len=250, sample_rate=1000.0)
        sched.init()
        sched._pump_once(); sched._pump_once()   # 500 samples: full ramp 0→1
        fg.settings.set({"start_value": 10.0, "final_value": 20.0})
        sched._pump_once(); sched._pump_once()
        sched.request_stop(); sched._drain()
        y = snk.data()
        assert abs(y[499] - 1.0) < 0.01
        assert abs(y[500] - 10.0) < 0.1       # restarted at new start_value
        assert abs(y[999] - 20.0) < 0.1


class TestClockSource:
    def test_tags_at_scheduled_times(self):
        cs = ClockSource(sample_rate=1000.0, n_samples=1000,
                         tag_times=[0.1, 0.25, 0.9],
                         tag_values=[{Keys.TRIGGER_NAME: "a"},
                                     {Keys.TRIGGER_NAME: "b"},
                                     {Keys.TRIGGER_NAME: "c"}])
        snk = VectorSink()
        run_chain(cs, snk, block_len=256, sample_rate=1000.0)
        named = {t.map.get(Keys.TRIGGER_NAME): t.index for t in snk.tags
                 if Keys.TRIGGER_NAME in t.map}
        assert named == {"a": 100, "b": 250, "c": 900}

    def test_realtime_pacing(self):
        import time
        cs = ClockSource(sample_rate=10000.0, n_samples=5000, realtime=True)
        snk = VectorSink()
        t0 = time.monotonic()
        run_chain(cs, snk, block_len=1000, sample_rate=10000.0)
        dt = time.monotonic() - t0
        assert dt >= 0.45  # 5000 samples @ 10 kHz ≈ 0.5 s wall-clock


class TestSchmitt:
    def test_device_matches_host_reference(self, rng):
        x = np.sin(2 * np.pi * 5 * np.arange(2000) / 1000.0) \
            + 0.05 * rng.standard_normal(2000)
        x = x.astype(np.float32)
        src = VectorSource(x)
        st = SchmittTrigger(low=-0.3, high=0.3)
        snk = VectorSink()
        run_chain(src, st, snk, block_len=500)
        y = snk.data()
        edges, _ = est.schmitt_edges(x, low=-0.3, high=0.3)
        # number of sign flips in the gate equals number of edges
        flips = np.sum(y[1:] != y[:-1])
        assert flips == len(edges)
        # 10 cycles in 2000 samples → 20 edges
        assert 18 <= len(edges) <= 22

    def test_hysteresis_rejects_small_noise(self):
        x = (0.1 * np.sin(2 * np.pi * np.arange(1000) / 100.0)).astype(np.float32)
        src = VectorSource(x)
        st = SchmittTrigger(low=-0.3, high=0.3)
        snk = VectorSink()
        run_chain(src, st, snk, block_len=500)
        assert np.all(snk.data() == -1.0)  # never crosses


class TestFrequencyEstimator:
    @pytest.mark.parametrize("method,tol", [("fft", 0.5), ("zero_crossing", 2.0)])
    def test_estimates_tone(self, method, tol):
        fs = 10000.0
        f0 = 1234.0
        x = np.sin(2 * np.pi * f0 * np.arange(8192) / fs).astype(np.float32)
        src = VectorSource(x)
        fe = FrequencyEstimator(chunk=1024, method=method)
        snk = VectorSink()
        run_chain(src, fe, snk, block_len=2048, sample_rate=fs)
        ests = snk.data()
        assert ests.shape == (8,)
        np.testing.assert_allclose(ests, f0, atol=tol * fs / 1024)

    @pytest.mark.parametrize("f0", [1234.0, -1234.0, 3777.5])
    def test_complex_fft_signed_spectrum(self, f0):
        """Complex IQ: the fft method resolves sign and magnitude of the tone."""
        fs = 10000.0
        n = np.arange(8192)
        x = np.exp(2j * np.pi * f0 * n / fs).astype(np.complex64)
        src = VectorSource(x)
        fe = FrequencyEstimator(chunk=1024, method="fft")
        snk = VectorSink()
        run_chain(src, fe, snk, block_len=2048, sample_rate=fs)
        np.testing.assert_allclose(snk.data(), f0, atol=0.5 * fs / 1024)

    @pytest.mark.parametrize("f0", [250.0, -1875.25])
    def test_complex_phase_slope_kay(self, f0, rng):
        """Complex time-domain method = Kay phase-slope: sub-bin accuracy
        under noise, signed."""
        fs = 10000.0
        n = np.arange(8192)
        x = np.exp(2j * np.pi * f0 * n / fs)
        x += 0.01 * (rng.standard_normal(8192) + 1j * rng.standard_normal(8192))
        src = VectorSource(x.astype(np.complex64))
        fe = FrequencyEstimator(chunk=1024, method="zero_crossing")
        snk = VectorSink()
        run_chain(src, fe, snk, block_len=2048, sample_rate=fs)
        np.testing.assert_allclose(snk.data(), f0, atol=1.0)  # Hz, ≪ one bin


class TestSavgolAndSvd:
    def test_savgol_design_preserves_polynomial(self):
        # S-G of order p reproduces degree-≤p polynomials exactly
        h = design_savgol(11, 3)
        t = np.arange(100, dtype=np.float64)
        x = 0.5 * t ** 2 - 3 * t + 7
        y = np.convolve(x, h, mode="valid")
        np.testing.assert_allclose(y, x[5:-5], rtol=1e-9)

    def test_savgol_block_smooths(self, rng):
        clean = np.sin(2 * np.pi * np.arange(2048) / 512.0)
        noisy = (clean + 0.3 * rng.standard_normal(2048)).astype(np.float32)
        src = VectorSource(noisy)
        sg = SavitzkyGolayFilter(window=31, poly_order=3)
        snk = VectorSink()
        run_chain(src, sg, snk, block_len=512)
        y = snk.data()
        # group delay = 15 samples; compare interior
        err_out = np.std(y[100:1900] - clean[85:1885])
        err_in = np.std(noisy[100:1900] - clean[100:1900])
        assert err_out < 0.4 * err_in

    def test_savgol_dataset_smooths_all_signals(self, rng):
        """DataSet-domain S-G (≈ SavitzkyGolayDataSetFilter): every signal of
        a captured DataSet smooths; metadata/axes survive; the input DataSet
        (incl. its SignalMeta) is left untouched."""
        from gnuradio4_tpu.core.dataset import DataSet
        from gnuradio4_tpu.ops.savgol import savgol_dataset
        t = np.arange(1024)
        clean = np.stack([np.sin(2 * np.pi * t / 256.0),
                          np.cos(2 * np.pi * t / 128.0)])
        noisy = (clean + 0.3 * rng.standard_normal(clean.shape)
                 ).astype(np.float32)
        ds = DataSet(values=noisy)
        ds.signals[0].name = "sine"
        ds.updated_range(0)
        before_min = ds.signals[0].range_min
        out = savgol_dataset(ds, window=31, poly_order=3)
        assert out.n_signals == 2
        assert out.signals[0].name == "sine"
        assert out.values.shape == noisy.shape
        for i in range(2):
            err_out = np.std(out.values[i][100:900] - clean[i][100:900])
            err_in = np.std(noisy[i][100:900] - clean[i][100:900])
            assert err_out < 0.4 * err_in
        np.testing.assert_array_equal(ds.values, noisy)   # input untouched
        assert ds.signals[0].range_min == before_min

    def test_svd_denoiser_reduces_noise(self, rng):
        clean = np.sin(2 * np.pi * 4 * np.arange(1024) / 256.0)
        noisy = (clean + 0.2 * rng.standard_normal(1024)).astype(np.float32)
        src = VectorSource(noisy)
        dn = SvdDenoiser(chunk=256, window=24, rank=2)
        snk = VectorSink()
        run_chain(src, dn, snk, block_len=512)
        y = snk.data()
        assert np.std(y - clean) < 0.5 * np.std(noisy - clean)

    def test_svd_denoiser_complex_iq_jacobi(self, rng):
        t = np.arange(2048)
        clean = np.exp(2j * np.pi * 0.02 * t).astype(np.complex64)
        noise = (rng.standard_normal(2048)
                 + 1j * rng.standard_normal(2048)).astype(np.complex64)
        noisy = clean + 0.25 * noise
        src = VectorSource(noisy)
        dn = SvdDenoiser(chunk=256, window=24, rank=2, engine="jacobi")
        snk = VectorSink()
        run_chain(src, dn, snk, block_len=512)
        y = snk.data()
        assert y.dtype == np.complex64
        assert np.std(y - clean) < 0.5 * np.std(noisy - clean)


class TestExpression:
    def test_siso(self):
        src = VectorSource(np.linspace(0, 1, 256).astype(np.float32))
        ex = ExpressionSISO(expression="sin(2*pi*x) + 0.5")
        snk = VectorSink()
        run_chain(src, ex, snk, block_len=256)
        t = np.linspace(0, 1, 256)
        np.testing.assert_allclose(snk.data(), np.sin(2 * np.pi * t) + 0.5,
                                   atol=1e-5)

    def test_diso(self):
        g = gr.Graph()
        a = VectorSource(np.full(128, 3.0, np.float32))
        b = VectorSource(np.full(128, 4.0, np.float32))
        ex = ExpressionDISO(expression="sqrt(x*x + y*y)")
        snk = VectorSink()
        g.connect(a, ex["x"])
        g.connect(b, ex["y"])
        g.connect(ex, snk)
        gr.Scheduler(g, block_len=128).run_and_wait()
        np.testing.assert_allclose(snk.data(), 5.0, atol=1e-6)

    def test_unsafe_expression_rejected(self):
        with pytest.raises(gr.GrError):
            ExpressionSISO(expression="__import__('os').system('true')")
        with pytest.raises(gr.GrError):
            ExpressionSISO(expression="open('/etc/passwd')")


class TestSyncBlock:
    def test_aligns_streams_on_trigger(self):
        n = 2048
        base = np.arange(n, dtype=np.float32)
        lagged = np.concatenate([np.zeros(7, np.float32), base[:-7]])
        g = gr.Graph()
        # stream B lags A by 7 samples: same event (and its trigger) 7 later
        a = VectorSource(base, tags=[Tag(100, {Keys.TRIGGER_NAME: "sync"})])
        b = VectorSource(lagged, tags=[Tag(107, {Keys.TRIGGER_NAME: "sync"})])
        sync = SyncBlock(n_inputs=2, max_skew=64)
        s0, s1 = VectorSink(), VectorSink()
        g.connect(a, sync["in0"])
        g.connect(b, sync["in1"])
        g.connect(sync["out0"], s0)
        g.connect(sync["out1"], s1)
        gr.Scheduler(g, block_len=512).run_and_wait()
        y0, y1 = s0.data(), s1.data()
        # skews: in0 → 7, in1 → 0; both outputs now carry the event at the same
        # index, so the streams are sample-identical after alignment
        seg = slice(600, 1500)
        np.testing.assert_array_equal(y0[seg], y1[seg])


class TestElectrical:
    def test_uncertainty_chain_power_factor(self):
        """sigma side-channel composes across blocks: PowerMetrics sigma
        outputs feed PowerFactor's optional sigma inputs → cos-phi with a
        propagated uncertainty."""
        fs, f0, n, d = 10000.0, 50.0, 20000, 2000
        t = np.arange(n) / fs
        u = (325.0 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
        i = (14.1 * np.sin(2 * np.pi * f0 * t - 0.2)).astype(np.float32)
        g = gr.Graph()
        s_u, s_i = VectorSource(u), VectorSource(i)
        s_su = VectorSource(np.full(n, 3.25, np.float32))
        s_si = VectorSource(np.full(n, 0.141, np.float32))
        pm, pfb = PowerMetrics(decim=d), PowerFactor()
        k_pf, k_pfs = VectorSink(), VectorSink()
        for b in (s_u, s_i, s_su, s_si, pm, pfb, k_pf, k_pfs):
            g.add(b)
        g.connect(s_u["out"], pm["u"])
        g.connect(s_i["out"], pm["i"])
        g.connect(s_su["out"], pm["u_sigma"])
        g.connect(s_si["out"], pm["i_sigma"])
        g.connect(pm["p"], pfb["p"])
        g.connect(pm["s"], pfb["s"])
        g.connect(pm["p_sigma"], pfb["p_sigma"])
        g.connect(pm["s_sigma"], pfb["s_sigma"])
        g.connect(pfb["power_factor"], k_pf["in"])
        g.connect(pfb["power_factor_sigma"], k_pfs["in"])
        gr.Scheduler(g, block_len=2 * d, sample_rate=fs).run_and_wait()
        np.testing.assert_allclose(k_pf.data(), np.cos(0.2), atol=1e-3)
        assert np.all(k_pfs.data() > 0) and np.all(k_pfs.data() < 0.01)

    def test_power_metrics_uncertainty_propagation(self):
        """PowerMetrics with sigma side-channels (≈ the reference's
        PowerMetrics<UncertainValue<float>> instantiation,
        qa_PowerEstimators.cpp:76): first-order Gaussian propagation of
        per-sample measurement sigma into sigma_P and sigma_rms outputs."""
        fs, f0, n, d = 10000.0, 50.0, 20000, 2000
        t = np.arange(n) / fs
        u = (325.0 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
        i = (14.1 * np.sin(2 * np.pi * f0 * t - 0.2)).astype(np.float32)
        sig_u, sig_i = 3.25, 0.141                     # 1% of peak
        g = gr.Graph()
        s_u, s_i = VectorSource(u), VectorSource(i)
        s_su = VectorSource(np.full(n, sig_u, np.float32))
        s_si = VectorSource(np.full(n, sig_i, np.float32))
        pm = PowerMetrics(decim=d)
        k_p, k_ps, k_us = VectorSink(), VectorSink(), VectorSink()
        for b in (s_u, s_i, s_su, s_si, pm, k_p, k_ps, k_us):
            g.add(b)
        g.connect(s_u["out"], pm["u"])
        g.connect(s_i["out"], pm["i"])
        g.connect(s_su["out"], pm["u_sigma"])
        g.connect(s_si["out"], pm["i_sigma"])
        g.connect(pm["p"], k_p["in"])
        g.connect(pm["p_sigma"], k_ps["in"])
        g.connect(pm["u_rms_sigma"], k_us["in"])
        gr.Scheduler(g, block_len=2 * d, sample_rate=fs).run_and_wait()
        exp_p = 0.5 * 325 * 14.1 * np.cos(0.2)
        exp_sp = np.sqrt(np.mean(i.astype(np.float64) ** 2) * sig_u ** 2
                         + np.mean(u.astype(np.float64) ** 2) * sig_i ** 2)             / np.sqrt(d)
        np.testing.assert_allclose(k_p.data(), exp_p, rtol=1e-2)
        np.testing.assert_allclose(k_ps.data(), exp_sp, rtol=5e-2)
        np.testing.assert_allclose(k_us.data(), sig_u / np.sqrt(d), rtol=5e-2)

    def test_power_metrics_resistive_load(self):
        fs = 10000.0
        t = np.arange(10000) / fs
        u = (325.0 * np.sin(2 * np.pi * 50 * t)).astype(np.float32)
        i = (u / 10.0).astype(np.float32)  # 10 Ω resistor
        g = gr.Graph()
        su, si = VectorSource(u), VectorSource(i)
        pm = PowerMetrics(decim=1000)
        sp, sq = VectorSink(), VectorSink()
        g.connect(su, pm["u"])
        g.connect(si, pm["i"])
        g.connect(pm["p"], sp)
        g.connect(pm["q"], sq)
        gr.Scheduler(g, block_len=2000, sample_rate=fs).run_and_wait()
        p, q = sp.data(), sq.data()
        np.testing.assert_allclose(p, 325.0 ** 2 / 2 / 10.0, rtol=0.01)
        assert np.all(q < 0.05 * p)  # purely resistive

    def test_power_factor_phase_shift(self):
        fs = 10000.0
        t = np.arange(10000) / fs
        phi = np.pi / 3
        u = np.sin(2 * np.pi * 50 * t).astype(np.float32)
        i = np.sin(2 * np.pi * 50 * t - phi).astype(np.float32)
        g = gr.Graph()
        su, si = VectorSource(u), VectorSource(i)
        pm = PowerMetrics(decim=2000)
        pf = PowerFactor()
        s1, s2 = VectorSink(), VectorSink()
        g.connect(su, pm["u"]); g.connect(si, pm["i"])
        g.connect(pm["p"], pf["p"]); g.connect(pm["s"], pf["s"])
        g.connect(pf["power_factor"], s1)
        g.connect(pf["phase"], s2)
        gr.Scheduler(g, block_len=2000, sample_rate=fs).run_and_wait()
        np.testing.assert_allclose(s1.data(), np.cos(phi), atol=0.01)
        np.testing.assert_allclose(s2.data(), phi, atol=0.02)


class TestBurstTaper:
    def test_envelope_applied_at_tags(self):
        n = 1024
        x = np.ones(n, np.float32)
        src = VectorSource(x, tags=[Tag(100, {Keys.TRIGGER_NAME: "burst_start"}),
                                    Tag(500, {Keys.TRIGGER_NAME: "burst_stop"})])
        bt = BurstTaper(ramp_len=32)
        snk = VectorSink()
        run_chain(src, bt, snk, block_len=1024)
        y = snk.data()
        assert y[100] < 0.05           # ramp starts at burst_start
        assert abs(y[131] - 1.0) < 0.05
        assert y[499] < 0.1            # ramped down into burst_stop
        np.testing.assert_allclose(y[200:460], 1.0)
        np.testing.assert_allclose(y[600:], 1.0)


class TestEstimators:
    def test_basic_stats(self):
        x = np.array([1.0, -2.0, 3.0, 0.0])
        assert est.minimum(x) == -2.0 and est.maximum(x) == 3.0
        assert est.peak_to_peak(x) == 5.0
        np.testing.assert_allclose(est.rms(np.ones(10) * 2), 2.0)

    def test_interpolated_peak(self):
        t = np.arange(64.0)
        x = np.exp(-0.5 * ((t - 31.7) / 3.0) ** 2)
        pos, val = est.interpolated_peak(x)
        assert abs(pos - 31.7) < 0.05

    def test_fwhm_gaussian(self):
        sigma = 5.0
        t = np.arange(200.0)
        x = np.exp(-0.5 * ((t - 100) / sigma) ** 2)
        w = est.fwhm(x)
        np.testing.assert_allclose(w, 2.355 * sigma, rtol=0.02)

    def test_edge_detect_subsample(self):
        x = np.array([0.0, 0.2, 0.4, 0.6, 0.8, 1.0])
        e = est.edge_detect(x, threshold=0.5)
        np.testing.assert_allclose(e, [2.5])

    def test_sample_rate_estimator(self):
        sre = est.SampleRateEstimator(alpha=0.5)
        for k in range(1, 10):
            r = sre.update(k * 1000, k * 1.0)
        np.testing.assert_allclose(r, 1000.0, rtol=0.01)


class TestArraySourceSink:
    """Multi-port qa helpers (≈ ArraySource/ArraySink, CollectionTestBlocks.hpp)."""

    def test_two_port_roundtrip(self):
        a0 = np.arange(10_000, dtype=np.float32)
        a1 = -np.arange(10_000, dtype=np.float32)
        g = gr.Graph()
        src = gr.global_registry.create("ArraySource", arrays=[a0, a1])
        snk = gr.global_registry.create("ArraySink", n_inputs=2)
        g.add(src); g.add(snk)
        g.connect(src["out0"], snk["in0"])
        g.connect(src["out1"], snk["in1"])
        gr.Scheduler(g, block_len=1024, sample_rate=1e6).run_and_wait()
        np.testing.assert_array_equal(snk.data(0)[:10_000], a0)
        np.testing.assert_array_equal(snk.data(1)[:10_000], a1)

    def test_validation(self):
        with pytest.raises(gr.GrError, match="at least one"):
            gr.global_registry.create("ArraySource", arrays=[])
        with pytest.raises(gr.GrError, match="time length"):
            gr.global_registry.create(
                "ArraySource", arrays=[np.zeros(8), np.zeros(9)])


class TestIQDemodulator:
    """RF -> decimated baseband composite (≈ reference IQDemodulator)."""

    def test_real_rf_tone_to_baseband(self):
        fs, fc, n = 1.0e6, 200e3, 262144
        t = np.arange(n) / fs
        x = np.cos(2 * np.pi * (fc + 5e3) * t).astype(np.float32)
        g = gr.Graph()
        src = g.emplace("VectorSource")
        src.data = x
        iq = g.emplace("IQDemodulator", center_freq=fc, decim=16,
                       sample_rate_in=fs)
        snk = g.emplace("VectorSink")
        g.connect_chain(src, iq, snk)
        gr.Scheduler(g, block_len=16384, sample_rate=fs).run_and_wait()
        y = np.asarray(snk.data())
        assert y.dtype == np.complex64
        seg = y[2048:2048 + 8192] * np.hanning(8192)
        S = np.abs(np.fft.fftshift(np.fft.fft(seg)))
        f = np.fft.fftshift(np.fft.fftfreq(8192, 16 / fs))
        assert abs(f[np.argmax(S)] - 5e3) < 100          # tone at +5 kHz
        img = S[np.argmin(np.abs(f + 30e3))]             # aliased image spot
        assert 20 * np.log10(img / S.max()) < -60        # auto AA filter works


class TestPowerFactorSigmaStability:
    def test_zero_active_power_gives_finite_sigma(self):
        from gnuradio4_tpu.blocks.electrical import PowerFactor
        n = 8
        g = gr.Graph()
        s_p = VectorSource(np.zeros(n, np.float32))      # purely reactive
        s_s = VectorSource(np.full(n, 100.0, np.float32))
        s_sp = VectorSource(np.full(n, 5.0, np.float32))
        s_ss = VectorSource(np.full(n, 1.0, np.float32))
        pf = PowerFactor()
        k = VectorSink()
        for b in (s_p, s_s, s_sp, s_ss, pf, k):
            g.add(b)
        g.connect(s_p["out"], pf["p"])
        g.connect(s_s["out"], pf["s"])
        g.connect(s_sp["out"], pf["p_sigma"])
        g.connect(s_ss["out"], pf["s_sigma"])
        g.connect(pf["power_factor_sigma"], k["in"])
        gr.Scheduler(g, block_len=n).run_and_wait()
        out = k.data()
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(out, 5.0 / 100.0, rtol=1e-5)  # limit sp/s
