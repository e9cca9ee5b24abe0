"""BASELINE config 3: wideband FM receiver — freq-xlating FIR → quadrature demod →
audio decimator → de-emphasis — demodulates a synthetic FM station correctly."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.sdr import QuadratureDemod, WbfmReceiver, make_wbfm_receiver
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource


def make_fm_signal(message: np.ndarray, fs: float, max_dev: float,
                   carrier_offset: float = 0.0) -> np.ndarray:
    """Complex-baseband FM: e^{j(2π·offset·t + 2π·Δf·∫m dt)}."""
    phase = 2 * np.pi * np.cumsum(max_dev * message) / fs
    t = np.arange(len(message)) / fs
    return np.exp(1j * (2 * np.pi * carrier_offset * t + phase)).astype(np.complex64)


def tone_snr_db(x: np.ndarray, f0: float, fs: float) -> float:
    """SNR of a single tone at f0 vs everything else (Hann-windowed FFT)."""
    n = len(x)
    w = np.hanning(n)
    spec = np.abs(np.fft.rfft((x - x.mean()) * w)) ** 2
    freqs = np.fft.rfftfreq(n, 1 / fs)
    sig_bins = np.abs(freqs - f0) < 4 * fs / n
    p_sig = spec[sig_bins].sum()
    p_noise = spec[~sig_bins].sum() + 1e-30
    return 10 * np.log10(p_sig / p_noise)


def test_quadrature_demod_constant_freq():
    """A pure frequency offset demodulates to a constant (= offset·2π/fs/gain⁻¹)."""
    fs = 100e3
    f_off = 5e3
    n = 4096
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * f_off * t).astype(np.complex64)
    g = gr.Graph()
    src = VectorSource(x)
    dem = QuadratureDemod(gain=1.0)
    snk = VectorSink()
    g.connect_chain(src, dem, snk)
    gr.Scheduler(g, block_len=1024, sample_rate=fs).run_and_wait()
    y = snk.data()
    np.testing.assert_allclose(y[10:], 2 * np.pi * f_off / fs, rtol=1e-3)


@pytest.mark.parametrize("carrier_offset", [0.0, 50e3])
def test_wbfm_receiver_demodulates_tone(carrier_offset):
    quad_rate = 250e3
    audio_decim = 5          # audio at 50 kHz
    max_dev = 75e3
    f_tone = 3000.0          # audible message tone
    n = 50000
    t = np.arange(n) / quad_rate
    message = np.sin(2 * np.pi * f_tone * t)
    iq = make_fm_signal(message, quad_rate, max_dev, carrier_offset)

    g = gr.Graph()
    src = VectorSource(iq)
    rx = make_wbfm_receiver(quad_rate=quad_rate, audio_decim=audio_decim,
                            center_freq=carrier_offset, max_dev=max_dev)
    snk = VectorSink()
    g.add(rx)
    g.connect(src, rx["in"])
    g.connect(rx["out"], snk)
    gr.Scheduler(g, block_len=12500, sample_rate=quad_rate).run_and_wait()
    audio = snk.data()
    assert len(audio) == n // audio_decim
    audio_fs = quad_rate / audio_decim
    # skip filter transients, measure the recovered tone
    settled = audio[2000:]
    snr = tone_snr_db(settled, f_tone, audio_fs)
    assert snr > 30.0, f"audio SNR {snr:.1f} dB"
    # de-emphasis attenuates 3 kHz slightly; amplitude in the right ballpark
    amp = np.sqrt(2.0) * np.std(settled)
    assert 0.5 < amp < 1.1


def test_wbfm_registry_block():
    """WbfmReceiver constructible via registry and usable as a nested block."""
    quad_rate = 250e3
    n = 25000
    t = np.arange(n) / quad_rate
    message = np.sin(2 * np.pi * 1000.0 * t)
    iq = make_fm_signal(message, quad_rate, 75e3)
    g = gr.Graph()
    src = VectorSource(iq)
    rx = g.emplace("WbfmReceiver", quad_rate=quad_rate, audio_decim=5)
    snk = VectorSink()
    g.connect(src, rx["in"])
    g.connect(rx["out"], snk)
    gr.Scheduler(g, block_len=5000, sample_rate=quad_rate).run_and_wait()
    audio = snk.data()
    assert len(audio) == n // 5
    snr = tone_snr_db(audio[2000:], 1000.0, quad_rate / 5)
    assert snr > 30.0


class TestSsbDemod:
    @staticmethod
    def _run(iq, sideband, fs=48000.0):
        g = gr.Graph()
        src = g.emplace("StreamSource", dtype="complex64")
        dem = g.emplace("SsbDemod", sideband=sideband, bandwidth=2700.0,
                        sample_rate_in=fs)
        snk = g.emplace("VectorSink")
        g.connect_chain(src, dem, snk)
        src.push(iq)
        src.close()
        gr.Scheduler(g, block_len=8192, sample_rate=fs).run_and_wait()
        y = np.asarray(snk.data())
        seg = y[8192:8192 + 16384] * np.hanning(16384)
        S = np.abs(np.fft.rfft(seg))
        f = np.fft.rfftfreq(16384, 1 / fs)
        return f[np.argmax(S)], S.max()

    def test_usb_lsb_recover_audio_and_reject_opposite(self):
        fs, n = 48000.0, 65536
        t = np.arange(n) / fs
        usb = np.exp(2j * np.pi * 1000.0 * t).astype(np.complex64)
        lsb = np.exp(-2j * np.pi * 1000.0 * t).astype(np.complex64)
        pk_u, a_u = self._run(usb, "usb")
        pk_l, a_l = self._run(lsb, "lsb")
        _, a_x = self._run(lsb, "usb")       # opposite sideband
        assert abs(pk_u - 1000) < 5 and abs(pk_l - 1000) < 5
        assert 20 * np.log10(a_u / (a_x + 1e-12)) > 45   # sideband rejection


class TestFmStereoDecoder:
    FS = 240000.0

    def _decode(self, mpx):
        g = gr.Graph()
        src = g.emplace("StreamSource", dtype="float32")
        dec = g.emplace("FmStereoDecoder", sample_rate_in=self.FS)
        kl = g.emplace("VectorSink")
        kr = g.emplace("VectorSink")
        g.connect(src, dec)
        g.connect(dec["left"], kl["in"])
        g.connect(dec["right"], kr["in"])
        src.push(mpx)
        src.close()
        gr.Scheduler(g, block_len=16384, sample_rate=self.FS).run_and_wait()
        return np.asarray(kl.data()), np.asarray(kr.data())

    def test_stereo_separation(self):
        n = 262144
        t = np.arange(n) / self.FS
        L = np.sin(2 * np.pi * 1000.0 * t)
        R = np.sin(2 * np.pi * 2500.0 * t)
        th = 2 * np.pi * 19000.0 * t
        mpx = (0.45 * (L + R) + 0.1 * np.sin(th) +
               0.45 * (L - R) * np.sin(2 * th)).astype(np.float32)
        yl, yr = self._decode(mpx)

        def tone(y, f0):
            seg = y[32768:32768 + 65536] * np.hanning(65536)
            S = np.abs(np.fft.rfft(seg))
            f = np.fft.rfftfreq(65536, 1 / self.FS)
            return S[np.argmin(np.abs(f - f0))]

        sep_l = 20 * np.log10(tone(yl, 1000) / (tone(yl, 2500) + 1e-12))
        sep_r = 20 * np.log10(tone(yr, 2500) / (tone(yr, 1000) + 1e-12))
        assert sep_l > 40 and sep_r > 40, (sep_l, sep_r)

    def test_mono_compatibility(self):
        """No pilot -> both channels carry the mono program, no blowup."""
        n = 131072
        t = np.arange(n) / self.FS
        mpx = (0.9 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
        yl, yr = self._decode(mpx)
        a, b = yl[40000:100000], yr[40000:100000]
        assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
        assert np.dot(a, b) / np.linalg.norm(a) / np.linalg.norm(b) > 0.999
