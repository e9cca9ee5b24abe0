"""Channel simulation models (gr-channels equivalents): AWGN statistics,
drift-free CFO, static multipath with seamless step boundaries, Jakes
Rayleigh/Rician fading (unit power, envelope statistics, chunking
invariance, Doppler rate), frequency-selective fading, and an end-to-end
receiver-under-impairment chain."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource

N = 200_000
ONES = np.ones(N, np.complex64)


def _through(block_type, data=None, block_len=65536, **settings):
    g = gr.Graph()
    src = g.add(VectorSource(ONES if data is None else data))
    ch = g.emplace(block_type, **settings)
    snk = g.add(VectorSink())
    g.connect_chain(src, ch, snk)
    gr.Scheduler(g, block_len=block_len, sample_rate=1e6).run_and_wait()
    return np.asarray(snk.data())


class TestChannelModel:
    def test_awgn_statistics(self):
        y = _through("ChannelModel", noise_voltage=0.5)
        n = y - 1.0
        assert abs(np.std(n.real) - 0.5) < 0.01
        assert abs(np.std(n.imag) - 0.5) < 0.01
        assert abs(np.mean(n)) < 0.01
        # white-ish: neighbor correlation near zero
        r = np.mean(n[1:] * np.conj(n[:-1])).real / np.var(n.real) / 2
        assert abs(r) < 0.02

    def test_cfo_exact_and_driftfree(self):
        y = _through("ChannelModel", frequency_offset=0.01)
        f = np.angle(y[1:] * np.conj(y[:-1])) / (2 * np.pi)
        np.testing.assert_allclose(np.mean(f), 0.01, atol=1e-6)
        # integer NCO: no phase discontinuity at the step seams
        assert np.max(np.abs(np.diff(f))) < 1e-4

    def test_multipath_impulse_response(self):
        imp = np.zeros(64, np.complex64)
        imp[5] = 1.0
        y = _through("ChannelModel", data=imp, block_len=32,
                     taps=(1.0, 0.5j, -0.25))
        np.testing.assert_allclose(y[5:8], [1.0, 0.5j, -0.25], atol=1e-6)
        assert np.abs(y[:5]).max() < 1e-6 and np.abs(y[8:]).max() < 1e-6

    def test_multipath_seamless_across_steps(self):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(4096)
             + 1j * rng.standard_normal(4096)).astype(np.complex64)
        taps = (1.0, -0.3 + 0.2j, 0.1j)
        a = _through("ChannelModel", data=x, block_len=4096, taps=taps)
        b = _through("ChannelModel", data=x, block_len=256, taps=taps)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_reproducible_by_seed(self):
        a = _through("ChannelModel", noise_voltage=0.3, seed=7)
        b = _through("ChannelModel", noise_voltage=0.3, seed=7)
        np.testing.assert_array_equal(a, b)
        c = _through("ChannelModel", noise_voltage=0.3, seed=8)
        assert not np.array_equal(a, c)


class TestFadingModel:
    def test_rayleigh_unit_power_and_fades(self):
        y = _through("FadingModel", fD=5e-4, seed=3)
        p = np.abs(y) ** 2
        assert abs(np.mean(p) - 1.0) < 0.15
        # deep fades and peaks both occur (Rayleigh envelope dynamics)
        assert np.abs(y).min() < 0.1 and np.abs(y).max() > 1.8

    def test_rician_k_concentrates_envelope(self):
        ray = _through("FadingModel", fD=5e-4, seed=3, K=0.0)
        ric = _through("FadingModel", fD=5e-4, seed=3, K=10.0)
        assert np.std(np.abs(ric)) < 0.5 * np.std(np.abs(ray))
        assert abs(np.mean(np.abs(ric) ** 2) - 1.0) < 0.1

    def test_chunking_invariance(self):
        a = _through("FadingModel", fD=2e-4, seed=3, block_len=65536)
        b = _through("FadingModel", fD=2e-4, seed=3, block_len=8192)
        np.testing.assert_allclose(a, b[:len(a)], atol=1e-3)

    def test_doppler_rate_scales_fade_rate(self):
        slow = _through("FadingModel", fD=1e-4, seed=1)
        fast = _through("FadingModel", fD=1e-3, seed=1)
        # count envelope crossings of the mean level
        def crossings(y):
            e = np.abs(y) - np.mean(np.abs(y))
            return int(np.count_nonzero(np.diff(e > 0)))
        assert crossings(fast) > 4 * crossings(slow)


class TestSelectiveFading:
    def test_frequency_selectivity(self):
        y = _through("SelectiveFadingModel", fD=1e-5, seed=2,
                     delays=(0, 8), mags=(1.0, 1.0))
        # two equal taps 8 samples apart → comb: spectrum varies >10 dB
        spec = np.abs(np.fft.fft(y[:65536] * np.hanning(65536)))
        band = spec[100:30000]
        assert band.max() / np.maximum(band.min(), 1e-9) > 3.0

    def test_power_approx_unit(self):
        y = _through("SelectiveFadingModel", fD=5e-4, seed=4)
        assert abs(np.mean(np.abs(y) ** 2) - 1.0) < 0.3


class TestReceiverUnderImpairment:
    def test_costas_survives_channel_model(self):
        # BPSK through CFO+AWGN, recovered by the stock sync stack
        rng = np.random.default_rng(5)
        bits = rng.integers(0, 2, 4096)
        sym = (1.0 - 2.0 * bits).astype(np.complex64)
        sps = 4
        x = np.repeat(sym, sps).astype(np.complex64)
        g = gr.Graph()
        src = g.add(VectorSource(x))
        ch = g.emplace("ChannelModel", frequency_offset=0.002,
                       noise_voltage=0.05)
        cl = g.emplace("CostasLoop", order=2, loop_bw=0.02)
        snk = g.add(VectorSink())
        g.connect_chain(src, ch, cl, snk)
        gr.Scheduler(g, block_len=4096, sample_rate=1e6).run_and_wait()
        y = np.asarray(snk.data())
        # after lock (skip 25%), hard decisions match up to a global sign
        tail = y[len(y) // 4:]
        ref = np.repeat(sym, sps)[len(y) // 4: len(y) // 4 + len(tail)]
        dec = np.sign(tail.real)
        agree = np.mean(dec == np.sign(ref.real))
        assert max(agree, 1 - agree) > 0.95


class TestPhaseNoiseAndIq:
    def test_phase_noise_broadens_linewidth(self):
        t = np.arange(65536)
        tone = np.exp(2j * np.pi * (3277 / 65536) * t).astype(np.complex64)
        y = _through("PhaseNoise", data=tone, std=0.03, seed=1)[:65536]
        # the Wiener walk smears the carrier: the peak bin's share of the
        # total energy collapses vs the pure tone
        def peak_frac(z):
            p = np.abs(np.fft.fft(z)) ** 2
            return float(p.max() / p.sum())
        # coherence length 2/std^2 ≈ 2.2k samples « 65k window
        assert peak_frac(tone[:65536]) > 0.9
        assert peak_frac(y) < 0.2

    def test_phase_noise_unit_envelope_and_reproducible(self):
        t = np.arange(65536)
        tone = np.exp(2j * np.pi * 0.01 * t).astype(np.complex64)
        a = _through("PhaseNoise", data=tone, std=0.02, seed=5)
        b = _through("PhaseNoise", data=tone, std=0.02, seed=5)
        np.testing.assert_array_equal(a, b)      # same seed, same chunking
        np.testing.assert_allclose(np.abs(a), 1.0, atol=1e-5)  # pure phase

    def test_phase_walk_continuous_across_steps(self):
        # the carried phase must not jump at step boundaries: successive
        # phase increments stay small everywhere (std=0.02 → ~5 sigma cap)
        t = np.arange(65536)
        tone = np.ones(65536, np.complex64)
        y = _through("PhaseNoise", data=tone, std=0.02, seed=5,
                     block_len=4096)
        dphi = np.angle(y[1:] * np.conj(y[:-1]))
        assert np.max(np.abs(dphi)) < 0.15

    def test_iq_imbalance_creates_image(self):
        t = np.arange(65536)
        tone = np.exp(2j * np.pi * 0.05 * t).astype(np.complex64)
        y = _through("IqImbalanceGen", data=tone, magnitude=1.0,
                     phase=5.0)[:65536]
        sp = np.abs(np.fft.fft(y))
        k = round(0.05 * 65536)
        image_db = 20 * np.log10(sp[65536 - k] / sp[k])
        assert -35.0 < image_db < -15.0
        # and disabled imbalance is transparent
        y0 = _through("IqImbalanceGen", data=tone)[:65536]
        np.testing.assert_allclose(y0, tone, atol=1e-5)
