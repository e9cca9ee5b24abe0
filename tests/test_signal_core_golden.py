"""Golden mirror of the reference's qa_SignalGeneratorCore.cpp and
qa_ToneGenerator.cpp (algorithm/test/): typed generator outputs — integer
saturation at overflow (int8 ±clamp, uint8 negative→0, uint16 offset),
analytic complex sinusoids (real = scalar waveform, |z| = amplitude,
non-sinusoidal → zero imaginary), FastSin/FastCos precision vs Sin/Cos,
continuity across chunks, reset determinism, and every SignalType producing
output."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.ops.signal import WAVEFORMS


def run_gen(n, block_len=None, **settings):
    g = gr.Graph()
    src = g.emplace("SignalGenerator", n_samples=n, **settings)
    snk = g.emplace("VectorSink")
    g.connect(src, snk)
    gr.Scheduler(g, block_len=block_len or n).run_and_wait()
    return snk.data()


class TestIntegerSaturation:
    def test_int8_clamp_at_overflow(self):
        # ≈ qa_SignalGeneratorCore.cpp:94: A=200 sine through int8 clamps at
        # ±127/−128 and never exceeds the range
        v = run_gen(100, signal="Sin", frequency=256.0, sample_rate=2048.0,
                    amplitude=200.0, dtype="int8")
        assert v.dtype == np.int8
        assert v.min() >= -128 and v.max() <= 127
        assert (v == 127).any() and (v == -128).any()

    def test_uint8_clamp_negative_to_zero(self):
        # ≈ cpp:115
        v = run_gen(100, signal="Sin", frequency=256.0, sample_rate=2048.0,
                    amplitude=200.0, dtype="uint8")
        assert v.dtype == np.uint8
        assert (v == 0).any() and (v == 200).any() and v.max() <= 255

    def test_uint16_with_offset(self):
        # ≈ cpp:135: offset keeps the waveform inside the unsigned range
        v = run_gen(64, signal="Sin", frequency=100.0, sample_rate=1000.0,
                    amplitude=100.0, offset=1000.0, dtype="uint16")
        assert v.dtype == np.uint16
        assert 900 <= v.min() and v.max() <= 1100

    def test_int16_matches_truncated_float(self):
        # ≈ cpp:79: integer output == the rounded float waveform
        kw = dict(signal="Sin", frequency=100.0, sample_rate=1000.0,
                  amplitude=1000.0)
        vi = run_gen(50, dtype="int16", **kw)
        vf = run_gen(50, dtype="float32", **kw)
        np.testing.assert_array_equal(vi, np.round(vf).astype(np.int16))


class TestComplexAnalytic:
    def test_sin_analytic(self):
        # ≈ cpp:197 / qa_ToneGenerator.cpp:99: real == scalar Sin, |z| == A
        z = run_gen(10, signal="Sin", frequency=100.0, sample_rate=1000.0,
                    dtype="complex64")
        r = run_gen(10, signal="Sin", frequency=100.0, sample_rate=1000.0,
                    dtype="float32")
        np.testing.assert_allclose(z.real, r, atol=1e-6)
        np.testing.assert_allclose(np.abs(z), 1.0, atol=1e-6)

    def test_cos_analytic_with_amplitude(self):
        # ≈ qa_ToneGenerator.cpp:122 (A = 2)
        z = run_gen(10, signal="Cos", frequency=100.0, sample_rate=1000.0,
                    amplitude=2.0, dtype="complex64")
        r = run_gen(10, signal="Cos", frequency=100.0, sample_rate=1000.0,
                    amplitude=2.0, dtype="float32")
        np.testing.assert_allclose(z.real, r, atol=1e-5)
        np.testing.assert_allclose(np.abs(z), 2.0, atol=1e-5)

    def test_square_zero_imag(self):
        # ≈ cpp:240 / qa_ToneGenerator.cpp:140
        z = run_gen(32, signal="Square", frequency=100.0, sample_rate=1000.0,
                    dtype="complex64")
        np.testing.assert_array_equal(z.imag, np.zeros(32, np.float32))


class TestToneGenerator:
    def test_continuity_across_chunks(self):
        # ≈ qa_ToneGenerator.cpp:53: chunked == one-shot, phase continuous
        kw = dict(signal="Sin", frequency=123.0, sample_rate=10000.0)
        one = run_gen(1000, **kw)
        chunked = run_gen(1000, block_len=125, **kw)
        np.testing.assert_allclose(chunked, one, atol=1e-6)

    def test_reset_restarts_waveform(self):
        # ≈ qa_ToneGenerator.cpp:76: two fresh runs are identical
        kw = dict(signal="Sin", frequency=100.0, sample_rate=1000.0)
        np.testing.assert_array_equal(run_gen(64, **kw), run_gen(64, **kw))

    @pytest.mark.parametrize("fast,exact", [("FastSin", "Sin"),
                                            ("FastCos", "Cos")])
    def test_fast_variants_match(self, fast, exact):
        # ≈ qa_ToneGenerator.cpp:158/172 (the integer NCO is exact here, so
        # "short-term precision" holds to float rounding)
        kw = dict(frequency=100.0, sample_rate=1000.0)
        np.testing.assert_allclose(run_gen(256, signal=fast, **kw),
                                   run_gen(256, signal=exact, **kw),
                                   atol=1e-5)

    def test_all_signal_types_produce_output(self):
        # ≈ qa_SignalGeneratorCore.cpp:303 / qa_ToneGenerator.cpp:256
        for kind in WAVEFORMS:
            v = run_gen(64, signal=kind, frequency=100.0,
                        sample_rate=1000.0, amplitude=1.0, offset=0.5)
            assert v.shape[-1] == 64
            assert np.any(v != 0.0), kind

    def test_all_signal_types_int16(self):
        # ≈ cpp:318
        for kind in WAVEFORMS:
            v = run_gen(64, signal=kind, frequency=100.0, sample_rate=1000.0,
                        amplitude=1000.0, dtype="int16")
            assert v.dtype == np.int16
            assert np.any(v != 0), kind
