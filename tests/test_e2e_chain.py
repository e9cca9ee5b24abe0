"""End-to-end BASELINE config 1: signal source → 127-tap FIR low-pass → 4096-pt FFT →
magnitude sink, float32, verified against a NumPy reference within SNR bounds
(SURVEY §7 step 4 — the minimum end-to-end slice)."""

import numpy as np
import jax.numpy as jnp

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.basic import SignalGenerator
from gnuradio4_tpu.blocks.filter import BasicFilter, FirFilter
from gnuradio4_tpu.blocks.fourier import FFT
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource
from gnuradio4_tpu.ops import filter_design as fd
from gnuradio4_tpu.ops.windows import make_window


def snr_db(ref: np.ndarray, out: np.ndarray) -> float:
    err = np.asarray(out, np.float64) - np.asarray(ref, np.float64)
    p_sig = np.mean(np.asarray(ref, np.float64) ** 2)
    p_err = np.mean(err ** 2) + 1e-30
    return 10.0 * np.log10(p_sig / p_err)


def test_config1_chain_vs_numpy():
    fs = 1.0e6
    n_total = 8 * 4096
    fft_size = 4096
    taps = fd.design_fir("lowpass", 127, sample_rate=fs, f_low=100e3)

    # stimulus: two tones, one in passband one in stopband + noise
    rng = np.random.default_rng(42)
    t = np.arange(n_total) / fs
    x = (np.sin(2 * np.pi * 50e3 * t) + 0.5 * np.sin(2 * np.pi * 300e3 * t)
         + 0.01 * rng.standard_normal(n_total)).astype(np.float32)

    g = gr.Graph()
    src = VectorSource(x)
    fir = FirFilter(taps=taps.astype(np.float32))
    fft = FFT(fft_size=fft_size, window="Hann", output="magnitude", calibrate=False)
    snk = VectorSink()
    g.connect_chain(src, fir, fft, snk)
    gr.Scheduler(g, block_len=2 * fft_size, sample_rate=fs).run_and_wait()
    out = snk.data()
    assert out.shape == (n_total,)

    # NumPy reference
    y_ref = np.convolve(x.astype(np.float64), taps)[:n_total]
    win = make_window("Hann", fft_size, dtype=np.float64)
    spec_ref = np.abs(np.fft.fft(y_ref.reshape(-1, fft_size) * win, axis=-1)).ravel()

    assert snr_db(spec_ref, out) > 60.0, f"SNR {snr_db(spec_ref, out):.1f} dB too low"

    # functional check: stopband tone crushed ≥ 40 dB relative to passband tone
    spec0 = out[:fft_size]
    bin_pass = int(50e3 / fs * fft_size)
    bin_stop = int(300e3 / fs * fft_size)
    ratio_db = 20 * np.log10(spec0[bin_pass] / max(spec0[bin_stop], 1e-12))
    assert ratio_db > 40.0


def test_config1_with_signal_generator_source():
    """Same chain but fully on-device source (no host feed in the hot path)."""
    fs = 1.0e6
    fft_size = 4096
    g = gr.Graph()
    src = SignalGenerator(signal="Sin", frequency=50e3, amplitude=1.0,
                          n_samples=4 * fft_size)
    fir = BasicFilter(filter_type="lowpass", f_low=100e3, ntaps=127,
                      sample_rate_design=fs)
    fft = FFT(fft_size=fft_size, window="Hann", output="magnitude", calibrate=False)
    snk = VectorSink()
    g.connect_chain(src, fir, fft, snk)
    gr.Scheduler(g, block_len=fft_size, sample_rate=fs).run_and_wait()
    out = snk.data()
    assert out.shape == (4 * fft_size,)
    spec = out[:fft_size]
    peak = np.argmax(spec[: fft_size // 2])
    assert abs(peak - int(50e3 / fs * fft_size)) <= 1
    # tone passes the 100 kHz low-pass untouched: peak magnitude ≈ N/2·CG(Hann)·A
    win = make_window("Hann", fft_size, dtype=np.float64)
    expected_peak = np.sum(win) / 2.0
    np.testing.assert_allclose(spec[peak], expected_peak, rtol=0.05)


def test_signal_generator_phase_continuity():
    """Tone must be phase-continuous across step boundaries (integer NCO)."""
    fs = 48000.0
    f0 = 1000.0
    g = gr.Graph()
    src = SignalGenerator(signal="Sin", frequency=f0, n_samples=4096)
    snk = VectorSink()
    g.connect(src, snk)
    gr.Scheduler(g, block_len=512, sample_rate=fs).run_and_wait()
    out = snk.data()
    t = np.arange(4096) / fs
    ref = np.sin(2 * np.pi * f0 * t)
    assert snr_db(ref, out) > 80.0


def test_rotator_frequency_shift():
    """Rotator shifts a complex tone by exactly its programmed frequency."""
    from gnuradio4_tpu.blocks.basic import ComplexToneSource
    from gnuradio4_tpu.blocks.math import Rotator
    fs = 100e3
    g = gr.Graph()
    src = ComplexToneSource(frequency=10e3, n_samples=8192)
    rot = Rotator(frequency_shift=-7e3)
    snk = VectorSink()
    g.connect_chain(src, rot, snk)
    gr.Scheduler(g, block_len=2048, sample_rate=fs).run_and_wait()
    out = snk.data()
    spec = np.abs(np.fft.fft(out[:4096]))
    peak = np.argmax(spec)
    f_peak = np.fft.fftfreq(4096, 1 / fs)[peak]
    assert abs(f_peak - 3e3) < fs / 4096 + 1e-6


def test_fft_overlapping_stride():
    """Stride < fft_size ⇒ overlapping windows (Stride NTTP semantics)."""
    fs = 1024.0
    n = 2048
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * 128.0 * t).astype(np.float32)
    g = gr.Graph()
    src = VectorSource(x)
    fft = FFT(fft_size=256, stride=64, window="Hann", output="magnitude",
              calibrate=False)
    snk = VectorSink()
    g.connect_chain(src, fft, snk)
    gr.Scheduler(g, block_len=512).run_and_wait()
    out = snk.data()
    # T/stride windows of fft_size each
    assert out.shape == (n // 64 * 256,)
    spectra = out.reshape(-1, 256)
    # reference with numpy: same framing incl. zero prehistory of n-s samples
    xc = np.concatenate([np.zeros(256 - 64, np.float32), x])
    win = np.hanning(256 + 1)[:256]
    from gnuradio4_tpu.ops.windows import make_window
    w = make_window("Hann", 256, dtype=np.float64)
    for k in [4, 10, 20]:
        frame = xc[k * 64: k * 64 + 256] * w
        ref = np.abs(np.fft.fft(frame))
        np.testing.assert_allclose(spectra[k], ref, atol=1e-3)
