"""DataSet math / windowed filters / utils / test-function generators
(golden mirrors of algorithm/dataset/DataSetMath.hpp, DataSetUtils.hpp,
DataSetTestFunctions.hpp semantics — see ops/dataset_math.py)."""

import numpy as np
import pytest

from gnuradio4_tpu.core.dataset import DataSet
from gnuradio4_tpu.core.errors import GrError
from gnuradio4_tpu.ops import dataset_math as dsm


def _ds(values, x=None):
    ds = DataSet(values=np.asarray(values, np.float64))
    if x is not None:
        ds.axes[0].values = np.asarray(x, np.float64)
    return ds


class TestMathFunction:
    def test_scalar_binary_ops(self):
        ds = _ds([1.0, 2.0, 3.0])
        np.testing.assert_allclose(
            dsm.math_function(ds, 2.0, dsm.MathOp.ADD).values[0], [3, 4, 5])
        np.testing.assert_allclose(
            dsm.math_function(ds, 2.0, dsm.MathOp.SUBTRACT).values[0],
            [-1, 0, 1])
        np.testing.assert_allclose(
            dsm.math_function(ds, 2.0, dsm.MathOp.MULTIPLY).values[0],
            [2, 4, 6])
        np.testing.assert_allclose(
            dsm.math_function(ds, 2.0, dsm.MathOp.DIVIDE).values[0],
            [0.5, 1.0, 1.5])

    def test_divide_by_zero_is_nan(self):
        ds = _ds([1.0, 2.0])
        out = dsm.math_function(ds, 0.0, dsm.MathOp.DIVIDE).values[0]
        assert np.all(np.isnan(out))

    def test_unary_tail_adds_value_first(self):
        # reference switch: SQR/SQRT/LOG10/DB operate on (Y1 + value)
        ds = _ds([3.0])
        np.testing.assert_allclose(
            dsm.math_function(ds, 1.0, dsm.MathOp.SQR).values[0], [16.0])
        np.testing.assert_allclose(
            dsm.math_function(ds, 1.0, dsm.MathOp.SQRT).values[0], [2.0])
        np.testing.assert_allclose(
            dsm.math_function(_ds([99.0]), 1.0, dsm.MathOp.LOG10).values[0],
            [20.0])
        np.testing.assert_allclose(
            dsm.math_function(_ds([9.0]), 1.0, dsm.MathOp.DB).values[0],
            [20.0])

    def test_inv_db_ignores_operand(self):
        ds = _ds([40.0])
        np.testing.assert_allclose(
            dsm.math_function(ds, 123.0, dsm.MathOp.INV_DB).values[0],
            [100.0])

    def test_sqrt_negative_is_nan(self):
        out = dsm.math_function(_ds([-5.0]), 1.0, dsm.MathOp.SQRT).values[0]
        assert np.isnan(out[0])

    def test_dataset_same_base(self):
        a, b = _ds([1.0, 2.0, 3.0]), _ds([10.0, 20.0, 30.0])
        np.testing.assert_allclose(dsm.add_function(a, b).values[0],
                                   [11, 22, 33])
        np.testing.assert_allclose(dsm.subtract_function(a, b).values[0],
                                   [-9, -18, -27])
        np.testing.assert_allclose(dsm.multiply_function(a, b).values[0],
                                   [10, 40, 90])
        np.testing.assert_allclose(dsm.divide_function(a, b).values[0],
                                   [0.1, 0.1, 0.1])

    def test_dataset_interpolates_mismatched_base(self):
        # ds2 sampled at half the rate: values must be linearly interpolated
        # onto ds1's axis (mathFunction "needsInterpolation" branch)
        a = _ds([0.0, 0.0, 0.0, 0.0, 0.0], x=[0, 1, 2, 3, 4])
        b = _ds([0.0, 4.0, 8.0], x=[0, 2, 4])
        out = dsm.add_function(a, b)
        np.testing.assert_allclose(out.values[0], [0, 2, 4, 6, 8])

    def test_same_horizontal_base(self):
        a = _ds([1.0, 2.0], x=[0, 1])
        b = _ds([1.0, 2.0], x=[0, 1])
        c = _ds([1.0, 2.0], x=[0, 2])
        assert dsm.same_horizontal_base(a, b)
        assert not dsm.same_horizontal_base(a, c)


class TestDerivativeNoise:
    def test_compute_derivative(self):
        ds = _ds([1.0, 4.0, 9.0, 16.0])
        np.testing.assert_allclose(dsm.compute_derivative(ds), [3, 5, 7])

    def test_derivative_needs_two_samples(self):
        with pytest.raises(GrError):
            dsm.compute_derivative(_ds([1.0]))

    def test_add_noise_bounded_and_seeded(self):
        ds = _ds(np.zeros(4096))
        n1 = dsm.add_noise(ds, 0.5, seed=42).values[0]
        n2 = dsm.add_noise(ds, 0.5, seed=42).values[0]
        np.testing.assert_array_equal(n1, n2)          # deterministic by seed
        assert np.max(np.abs(n1)) <= 0.5               # uniform ±level
        assert np.std(n1) > 0.1                        # actually noisy
        with pytest.raises(GrError):
            dsm.add_noise(ds, -1.0)


class TestWindowedFilters:
    def test_moving_average_interior_and_edges(self):
        ds = _ds([1.0, 2.0, 3.0, 4.0, 5.0])
        out = dsm.apply_moving_average(ds, 3).values[0]
        # edges use the ragged window (reference start/end clamping)
        np.testing.assert_allclose(out, [1.5, 2, 3, 4, 4.5])

    def test_moving_average_rejects_even_window(self):
        with pytest.raises(GrError):
            dsm.apply_moving_average(_ds([1.0, 2.0]), 4)

    def test_median_odd_and_even_windows(self):
        ds = _ds([5.0, 1.0, 4.0, 2.0, 3.0])
        out = dsm.apply_median(ds, 3).values[0]
        np.testing.assert_allclose(out[1:4], [4, 2, 3])
        # even-sized window averages the two mid order statistics
        out2 = dsm.apply_median(_ds([1.0, 3.0, 2.0, 4.0]), 2).values[0]
        assert out2[1] == pytest.approx(2.0)   # median of {1,3}

    def test_rms_is_windowed_stddev(self):
        ds = _ds([0.0, 1.0, 0.0, 1.0, 0.0, 1.0])
        out = dsm.apply_rms(ds, 3).values[0]
        # interior windows {0,1,0}/{1,0,1}: std = sqrt(2)/3
        np.testing.assert_allclose(out[1:5], np.sqrt(2) / 3, atol=1e-12)

    def test_peak_to_peak(self):
        ds = _ds([0.0, 5.0, 1.0, 9.0, 2.0])
        out = dsm.apply_peak_to_peak(ds, 3).values[0]
        np.testing.assert_allclose(out, [5, 5, 8, 8, 7])

    def test_apply_filter_forward_matches_lfilter(self):
        # one-pole smoother vs a hand-rolled reference recursion
        b, a = np.array([0.25]), np.array([1.0, -0.75])
        x = np.sin(np.arange(32) * 0.3)
        want = np.empty_like(x)
        acc = 0.0
        for i, xi in enumerate(x):
            acc = 0.25 * xi + 0.75 * acc
            want[i] = acc
        out = dsm.apply_filter(_ds(x), (b, a)).values[0]
        np.testing.assert_allclose(out, want, atol=1e-12)

    def test_apply_filter_symmetric_is_zero_phase_average(self):
        b, a = np.array([0.5]), np.array([1.0, -0.5])
        x = np.random.default_rng(0).normal(size=64)
        fwd = dsm.apply_filter(_ds(x), (b, a)).values[0]
        bwd = dsm.apply_filter(_ds(x[::-1]), (b, a)).values[0][::-1]
        sym = dsm.apply_filter(_ds(x), (b, a), symmetric=True).values[0]
        np.testing.assert_allclose(sym, 0.5 * (fwd + bwd), atol=1e-12)

    def test_apply_savgol_zero_phase_preserves_polynomial(self):
        # S-G of poly_order p reproduces degree-<=p polynomials exactly in
        # the interior (twice-applied still exact); peak stays centred
        x = np.arange(64, dtype=float)
        quad = 0.1 * (x - 32) ** 2
        out = dsm.apply_savgol(_ds(quad), 11, 3).values[0]
        # two passes of window 11 → boundary-padding influence reaches 10
        # samples in; beyond that the fit must be exact
        np.testing.assert_allclose(out[12:-12], quad[12:-12], atol=1e-8)
        bump = np.exp(-0.5 * ((x - 31.5) / 3) ** 2)
        sm = dsm.apply_savgol(_ds(bump), 11, 3).values[0]
        assert abs(int(np.argmax(sm)) - int(np.argmax(bump))) <= 1

    def test_apply_savgol_boundary_policies_differ(self):
        ramp_sig = np.arange(16, dtype=float)
        r = dsm.apply_savgol(_ds(ramp_sig), 7, 2, boundary="reflect").values[0]
        e = dsm.apply_savgol(_ds(ramp_sig), 7, 2,
                             boundary="replicate").values[0]
        assert not np.allclose(r[:3], e[:3])
        with pytest.raises(GrError):
            dsm.apply_savgol(_ds(ramp_sig), 7, 2, boundary="wrap")


class TestUtils:
    def test_update_min_max(self):
        ds = _ds([3.0, -1.0, 7.0])
        dsm.update_min_max(ds)
        assert ds.signals[0].range_min == -1.0
        assert ds.signals[0].range_max == 7.0

    def test_merge_stacks_signals(self):
        a = dsm.ramp("a", 8)
        b = dsm.ramp("b", 8, offset=1.0)
        m = dsm.merge(a, b)
        assert m.n_signals == 2
        assert [s.name for s in m.signals] == ["a", "b"]
        np.testing.assert_allclose(m.values[1] - m.values[0], 1.0)

    def test_merge_rejects_mismatched_base(self):
        with pytest.raises(GrError):
            dsm.merge(dsm.ramp("a", 8), dsm.ramp("b", 9))

    def test_waveform_sine_zero_crossings(self):
        # 2 full periods of a sine: zero crossings at every half period
        ds = dsm.waveform("sine", 200, 100.0, 1.0)
        idx = [t.index for t in ds.timing_events[0]]
        assert len(idx) >= 3
        for i in idx:
            assert abs(ds.values[0][i]) < 0.1
        assert ds.signals[0].name == "Sine Wave"
        assert ds.axes[0].unit == "s"
        with pytest.raises(GrError):
            dsm.waveform("sawtooth", 10, 1.0, 1.0)


class TestGenerators:
    def test_triangular_reference_shape(self):
        # mirrors qa_DataSetEstimators.cpp:42-51 exactly
        odd = dsm.triangular("odd", 11).values[0]
        assert odd[0] == odd[-1]
        assert odd[5] == 1.0
        even = dsm.triangular("even", 10).values[0]
        assert even[0] == even[-1]
        assert even[4] == even[5] == 1.0
        with pytest.raises(GrError):
            dsm.triangular("tiny", 2)

    def test_ramp_divides_by_count(self):
        r = dsm.ramp("r", 4).values[0]
        np.testing.assert_allclose(r, [0, 0.25, 0.5, 0.75])

    def test_gauss_function(self):
        g = dsm.gauss_function("g", 21, mean=10, sigma=2).values[0]
        assert np.argmax(g) == 10
        assert g[10] == pytest.approx(1.0)
        assert g[12] == pytest.approx(np.exp(-0.5))

    def test_step_functions(self):
        s = dsm.step_function("s", 10, step_at=3).values[0]
        np.testing.assert_allclose(s, [0, 0, 0, 1, 1, 1, 1, 1, 1, 1])
        # step_at=0 → midpoint (reference default behavior)
        s2 = dsm.step_function("s", 10).values[0]
        assert s2[4] == 0.0 and s2[5] == 1.0
        r1 = dsm.random_step_function("r", 64, seed=7).values[0]
        r2 = dsm.random_step_function("r", 64, seed=7).values[0]
        np.testing.assert_array_equal(r1, r2)

    def test_dataset_from(self):
        ds = dsm.dataset_from("fib", [0, 1, 1, 2, 3, 5, 8, 13])
        assert ds.values.shape == (1, 8)
        assert ds.signals[0].name == "fib"


class TestSavGolDataSetBlock:
    def test_block_smooths_captured_windows(self):
        import jax
        jax.config.update("jax_platforms", "cpu")
        import gnuradio4_tpu as gr
        g = gr.Graph()
        src = g.emplace("SignalGenerator", frequency=50.0, n_samples=2048,
                        sample_rate=2048.0)
        snk = g.emplace("SavitzkyGolayDataSetFilter", n_length=1024,
                        window_size=11, poly_order=3,
                        sample_rate_hint=2048.0)
        g.connect(src, snk)
        gr.Scheduler(g, block_len=1024, sample_rate=2048.0).run_and_wait()
        got = snk.read_all()
        assert len(got) == 2
        raw = np.sin(2 * np.pi * 50.0 / 2048.0 * np.arange(1024))
        sm = got[0].values[0]
        # smoothing attenuates, preserves shape (correlation stays high)
        c = np.corrcoef(sm, raw)[0, 1]
        assert c > 0.99
        assert np.max(np.abs(sm)) < np.max(np.abs(raw)) + 1e-9

    def test_registry_alias_loads(self):
        import gnuradio4_tpu as gr
        b = gr.global_registry.create("SavitzkyGolayDataSetFilter")
        assert type(b).__name__ == "SavitzkyGolayDataSetFilter"
