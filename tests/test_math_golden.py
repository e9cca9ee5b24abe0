"""Golden mirror of the reference's qa_Math.cpp and qa_Rotator.cpp
(blocks/math/test/): the Add/Subtract/Multiply/Divide 1-/2-/3-input value
matrix across arithmetic and complex types, the *Const variants, and the
Rotator's phase_increment/initial_phase surface (pre-increment convention)
plus the tone frequency-shift checks."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource

TYPES = ["uint8", "uint16", "uint32", "int8", "int16", "int32", "float32",
         "complex64"]


def run_nary(block, inputs, dtype, **kw):
    g = gr.Graph()
    b = g.emplace(block, n_inputs=len(inputs), **kw)
    for i, data in enumerate(inputs):
        g.connect(VectorSource(np.asarray(data, dtype)), b,
                  dst_port=f"in{i}")
    snk = VectorSink()
    g.connect(b, snk)
    gr.Scheduler(g, block_len=len(inputs[0])).run_and_wait()
    return snk.data()


def run_const(block, data, dtype, value):
    g = gr.Graph()
    b = g.emplace(block, value=value)
    g.connect(VectorSource(np.asarray(data, dtype)), b)
    snk = VectorSink()
    g.connect(b, snk)
    gr.Scheduler(g, block_len=len(data)).run_and_wait()
    return snk.data()


class TestBasicMath:
    """≈ qa_Math.cpp:59-121 (integer rows of the value tables; the x.y
    fractional rows run on the float/complex instantiations)."""

    @pytest.mark.parametrize("dtype", TYPES)
    def test_add(self, dtype):
        y = run_nary("Add", [[1, 2, 8, 17]], dtype)
        np.testing.assert_array_equal(y, np.asarray([1, 2, 8, 17], dtype))
        y = run_nary("Add", [[1, 2, 3, 4], [5, 6, 7, 8]], dtype)
        np.testing.assert_array_equal(y, np.asarray([6, 8, 10, 12], dtype))
        y = run_nary("Add", [[12, 35, 18, 17], [31, 15, 27, 36],
                             [83, 46, 37, 41]], dtype)
        np.testing.assert_array_equal(y, np.asarray([126, 96, 82, 94], dtype))

    @pytest.mark.parametrize("dtype", TYPES)
    def test_subtract(self, dtype):
        y = run_nary("Subtract", [[9, 7, 5, 3], [3, 2, 0, 1]], dtype)
        np.testing.assert_array_equal(y, np.asarray([6, 5, 5, 2], dtype))
        y = run_nary("Subtract", [[15, 38, 88, 29], [3, 12, 26, 18],
                                  [0, 10, 50, 7]], dtype)
        np.testing.assert_array_equal(y, np.asarray([12, 16, 12, 4], dtype))

    @pytest.mark.parametrize("dtype", TYPES)
    def test_multiply(self, dtype):
        y = run_nary("Multiply", [[1, 2, 3, 4], [4, 5, 6, 7]], dtype)
        np.testing.assert_array_equal(y, np.asarray([4, 10, 18, 28], dtype))
        y = run_nary("Multiply", [[0, 1, 2, 3], [4, 5, 6, 2],
                                  [8, 9, 10, 11]], dtype)
        np.testing.assert_array_equal(y, np.asarray([0, 45, 120, 66], dtype))

    @pytest.mark.parametrize("dtype", ["float32", "complex64"])
    def test_divide(self, dtype):
        y = run_nary("Divide", [[9, 4, 5, 7], [3, 4, 1, 2]], dtype)
        np.testing.assert_array_equal(y, np.asarray([3, 1, 5, 3.5], dtype))
        y = run_nary("Divide", [[0, 10, 40, 80], [1, 2, 4, 20],
                                [1, 5, 5, 2]], dtype)
        np.testing.assert_array_equal(y, np.asarray([0, 1, 2, 2], dtype))

    def test_fractional_rows(self):
        # the x.y rows from the qa tables (float instantiation)
        y = run_nary("Add", [[1, 2, 3, 4.2], [5, 6, 7, 8.3]], "float32")
        np.testing.assert_allclose(y, [6, 8, 10, 12.5], rtol=1e-6)
        y = run_nary("Subtract", [[9, 7, 5, 3.5], [3, 2, 0, 1.2]], "float32")
        np.testing.assert_allclose(y, [6, 5, 5, 2.3], rtol=1e-6)
        y = run_nary("Multiply", [[1, 2, 3, 4.0], [4, 5, 6, 7.1]], "float32")
        np.testing.assert_allclose(y, [4, 10, 18, 28.4], rtol=1e-6)

    @pytest.mark.parametrize("block,expected", [
        ("AddConst", 6.0), ("SubtractConst", 2.0),
        ("MultiplyConst", 8.0), ("DivideConst", 2.0),
    ])
    def test_const_variants(self, block, expected):
        # ≈ qa_Math.cpp:123-150: <op>Const(2) over input 4
        y = run_const(block, [4.0, 4.0], "float32", 2.0)
        np.testing.assert_allclose(y, [expected, expected], rtol=1e-6)


class TestRotatorGolden:
    """≈ qa_Rotator.cpp:69-130."""

    def test_phase_increment_pre_increment_convention(self):
        # cpp:69-96: inc = π/2, input all (1+0j) → out[i] = e^{j(i+1)π/2}
        inc = np.pi / 2
        g = gr.Graph()
        rot = g.emplace("Rotator", phase_increment=inc, initial_phase=0.0)
        g.connect(VectorSource(np.ones(8, np.complex64)), rot)
        snk = VectorSink()
        g.connect(rot, snk)
        gr.Scheduler(g, block_len=8, sample_rate=1.0).run_and_wait()
        y = snk.data()
        for i in range(8):
            want = np.exp(1j * (i + 1) * inc)
            assert abs(y[i] - want) < 1e-5, (i, y[i], want)

    def test_frequency_shift_xor_phase_increment(self):
        from gnuradio4_tpu.core.errors import GrError
        with pytest.raises(GrError, match="XOR"):
            gr.Graph().emplace("Rotator", frequency_shift=1.0,
                               phase_increment=0.5)

    def test_initial_phase_offset(self):
        g = gr.Graph()
        rot = g.emplace("Rotator", phase_increment=0.0,
                        initial_phase=np.pi / 2)
        g.connect(VectorSource(np.ones(4, np.complex64)), rot)
        snk = VectorSink()
        g.connect(rot, snk)
        gr.Scheduler(g, block_len=4).run_and_wait()
        np.testing.assert_allclose(snk.data(), np.full(4, 1j, np.complex64),
                                   atol=1e-6)

    @pytest.mark.parametrize("f_in,shift", [(0.0, 2.0), (0.5, 1.5),
                                            (2.0, -1.5)])
    def test_tone_frequency_shift(self, f_in, shift):
        # cpp:98-130: a tone at f_in shifted by `shift` peaks at f_in+shift
        fs, n = 100.0, 200
        t = np.arange(n) / fs
        x = np.exp(2j * np.pi * f_in * t).astype(np.complex64)
        g = gr.Graph()
        rot = g.emplace("Rotator", frequency_shift=shift)
        g.connect(VectorSource(x), rot)
        snk = VectorSink()
        g.connect(rot, snk)
        gr.Scheduler(g, block_len=n, sample_rate=fs).run_and_wait()
        spec = np.abs(np.fft.fft(snk.data()))
        peak = np.fft.fftfreq(n, 1 / fs)[int(np.argmax(spec))]
        assert abs(peak - (f_in + shift)) < fs / n + 1e-6
