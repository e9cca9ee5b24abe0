"""Utility blocks: MovingAverage, DcBlocker, Threshold, MuteSwitch, Throttle."""

import time

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.util_blocks import (DcBlocker, MovingAverage,
                                              MuteSwitch, Threshold, Throttle)
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource


def run_chain(*blocks, block_len=512, sample_rate=1.0):
    g = gr.Graph()
    g.connect_chain(*blocks)
    sched = gr.Scheduler(g, block_len=block_len, sample_rate=sample_rate)
    sched.run_and_wait()
    return sched


class TestMovingAverage:
    def test_matches_numpy_streaming(self, rng):
        x = rng.standard_normal(2048).astype(np.float32)
        n = 32
        src = VectorSource(x)
        ma = MovingAverage(length=n)
        snk = VectorSink()
        run_chain(src, ma, snk, block_len=512)
        y = snk.data()
        xc = np.concatenate([np.zeros(n - 1, np.float32), x])
        ref = np.convolve(xc, np.ones(n) / n, mode="valid")
        np.testing.assert_allclose(y, ref, atol=1e-5)

    def test_length_one_identity(self, rng):
        x = rng.standard_normal(256).astype(np.float32)
        src, snk = VectorSource(x), VectorSink()
        run_chain(src, MovingAverage(length=1), snk, block_len=256)
        np.testing.assert_array_equal(snk.data(), x)


class TestDcBlocker:
    def test_removes_dc_keeps_ac(self):
        n = 16384
        t = np.arange(n)
        x = (3.0 + np.sin(2 * np.pi * 0.05 * t)).astype(np.float32)
        src, snk = VectorSource(x), VectorSink()
        run_chain(src, DcBlocker(pole=0.99), snk, block_len=4096)
        y = snk.data()
        settled = y[4000:]
        assert abs(np.mean(settled)) < 0.01          # DC gone
        amp = np.max(settled) - np.min(settled)
        assert abs(amp - 2.0) < 0.1                  # AC preserved


class TestThresholdMute:
    def test_threshold(self):
        x = np.array([-1.0, 0.0, 0.5, 2.0], np.float32)
        src, snk = VectorSource(x), VectorSink()
        run_chain(src, Threshold(level=0.5), snk, block_len=4)
        np.testing.assert_array_equal(snk.data(), [0, 0, 1, 1])

    def test_mute_toggles_at_runtime(self):
        g = gr.Graph()
        src = g.emplace("ConstantSource", value=1.0, n_samples=2048)
        mute = g.add(MuteSwitch())
        snk = g.emplace("VectorSink")
        g.connect_chain(src, mute, snk)
        sched = gr.Scheduler(g, block_len=512, pipeline_depth=1)
        sched.init()
        sched._pump_once(); sched._pump_once()
        mute.settings.set({"mute": True})
        while sched._pump_once():
            pass
        sched._drain()
        y = snk.data()
        np.testing.assert_allclose(y[:1024], 1.0)
        np.testing.assert_allclose(y[1536:], 0.0)


class TestThrottle:
    def test_paces_wall_clock(self):
        g = gr.Graph()
        src = g.emplace("ConstantSource", n_samples=8000)
        th = g.add(Throttle(sample_rate=16000.0))
        snk = g.emplace("NullSink")
        g.connect_chain(src, th, snk)
        t0 = time.monotonic()
        gr.Scheduler(g, block_len=2000).run_and_wait()
        dt = time.monotonic() - t0
        assert dt >= 0.4  # 8000 samples @ 16 kHz ≈ 0.5 s


class TestGrBlocksUtilities:
    """The gr-blocks odds and ends added in round 3: KeepOneInN, Repeat,
    Integrate, PeakDetector (seam-safe), SampleAndHold (cross-step hold)."""

    def _run(self, block, data, ctrl=None, block_len=64, **kw):
        import gnuradio4_tpu as gr
        from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource
        g = gr.Graph()
        s = g.add(VectorSource(data))
        b = g.emplace(block, **kw)
        v = g.add(VectorSink())
        if ctrl is not None:
            c = g.add(VectorSource(ctrl))
            g.connect(s, b, dst_port="in")
            g.connect(c, b, dst_port="ctrl")
            g.connect(b, v)
        else:
            g.connect_chain(s, b, v)
        gr.Scheduler(g, block_len=block_len,
                     sample_rate=1e6).run_and_wait()
        return np.asarray(v.data())

    def test_keep_one_in_n(self):
        x = np.arange(256, dtype=np.float32)
        np.testing.assert_array_equal(
            self._run("KeepOneInN", x, n=4, offset=1), x[1::4])

    def test_repeat_inverts_keep(self):
        x = np.arange(64, dtype=np.float32)
        y = self._run("Repeat", x, n=3, block_len=16)
        np.testing.assert_array_equal(y, np.repeat(x, 3))

    def test_integrate(self):
        x = np.arange(256, dtype=np.float32)
        np.testing.assert_array_equal(
            self._run("Integrate", x, n=4), x.reshape(-1, 4).sum(axis=1))

    def test_peak_detector_seam_safe(self):
        sig = np.zeros(256, np.float32)
        sig[[10, 63, 200]] = 5.0          # 63 sits AT a 64-sample seam
        pk = self._run("PeakDetector", sig, threshold=1.0)
        np.testing.assert_array_equal(np.flatnonzero(pk == 1.0),
                                      [11, 64, 201])  # 1-sample latency

    def test_sample_and_hold_across_steps(self):
        x = np.arange(256, dtype=np.float32)
        ctrl = np.zeros(256, np.float32)
        ctrl[[5, 100, 130]] = 1.0
        y = self._run("SampleAndHold", x, ctrl=ctrl, block_len=32)
        assert y[4] == 0.0 and y[5] == 5.0 and y[99] == 5.0
        assert y[100] == 100.0 and y[129] == 100.0 and y[130] == 130.0
