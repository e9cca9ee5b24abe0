"""Golden mirror of the reference's qa_sources.cpp
(blocks/basic/test/qa_sources.cpp:28-360): ClockSource sample/tag delivery to
multiple sinks, SignalGenerator driven off a ClockSource, and the
"FunctionGenerator + ClockSource FAIR test" — the full context-tag-driven
waveform timeline (Const/LinearRamp/ParabolicRamp/CubicSpline/
ImpulseResponse segments switched by CMD_BP_START context tags)."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.misc import ClockSource, FunctionGenerator
from gnuradio4_tpu.blocks.testing import TagSink
from gnuradio4_tpu.core.settings import SettingsCtx
from gnuradio4_tpu.core.tags import Keys


class TestClockSource:
    def test_samples_and_tags_to_two_sinks(self):
        # ≈ qa_sources.cpp:28-75: 1900 samples at 2 kHz, 8 scheduled tags,
        # both sinks consume everything and see every tag
        n, fs = 1900, 2000.0
        tag_idx = [0, 1, 100, 150, 1000, 1001, 1002, 1023]
        clock = ClockSource(
            sample_rate=fs, n_samples=n,
            tag_times=[i / fs for i in tag_idx],
            tag_values=[{"key": f"value@{i}"} for i in tag_idx])
        s1, s2 = TagSink(), TagSink()
        g = gr.Graph()
        g.connect(clock, s1)
        g.connect(clock, s2)
        gr.Scheduler(g, block_len=512, sample_rate=fs).run_and_wait()
        for s in (s1, s2):
            assert s.data().shape[-1] == n
            got = [(t.index, t.map["key"]) for t in s.tags if "key" in t.map]
            assert got == [(i, f"value@{i}") for i in tag_idx]


FS = 1000.0
CTX = [f"FAIR.SELECTOR.C=1:S=1:P={i}" for i in range(1, 9)]
TAG_TIMES_MS = [10, 100, 300, 350, 550, 650, 800, 850]


def _build_fair_graph():
    """≈ qa_sources.cpp:294-360 "FunctionGenerator + ClockSource FAIR test"."""
    g = gr.Graph()
    clock = ClockSource(
        sample_rate=FS, n_samples=1000,
        tag_times=[t / 1000.0 for t in TAG_TIMES_MS],
        tag_values=[{Keys.TRIGGER_NAME: "CMD_BP_START", Keys.CONTEXT: c}
                    for c in CTX])
    fg = FunctionGenerator(sample_rate=FS)
    # the reference's createXPropertyMap presets (FunctionGenerator.hpp:67-91)
    presets = [
        {"signal_type": "Const", "start_value": 5.0},
        {"signal_type": "LinearRamp", "start_value": 5.0,
         "final_value": 30.0, "duration": 0.2},
        {"signal_type": "Const", "start_value": 30.0},
        {"signal_type": "ParabolicRamp", "start_value": 30.0,
         "final_value": 20.0, "duration": 0.1, "round_off_time": 0.02},
        {"signal_type": "Const", "start_value": 20.0},
        {"signal_type": "CubicSpline", "start_value": 20.0,
         "final_value": 10.0, "duration": 0.1},
        {"signal_type": "Const", "start_value": 10.0},
        {"signal_type": "ImpulseResponse", "start_value": 10.0,
         "final_value": 20.0, "impulse_time0": 0.02, "impulse_time1": 0.06},
    ]
    for ctx, preset in zip(CTX, presets):
        fg.settings.set(preset, ctx=SettingsCtx(context=ctx))
    sink = TagSink()
    g.connect(clock, fg, dst_port="clk_in")
    g.connect(fg, sink)
    return g, sink


class TestFunctionGeneratorFair:
    def test_full_timeline(self):
        g, sink = _build_fair_graph()
        # block_len divides every tag index → context switches land exactly
        gr.Scheduler(g, block_len=10, sample_rate=FS).run_and_wait()
        y = sink.data()
        assert y.shape[-1] == 1000                     # cpp:345
        assert len([t for t in sink.tags
                    if Keys.TRIGGER_NAME in t.map]) >= 8   # cpp:346
        # segment-by-segment (all times s × 1 kHz → sample indices)
        np.testing.assert_allclose(y[10:100], 5.0, atol=1e-5)    # P=1 const
        # P=2 linear ramp 5→30 over 200 samples starting at 100
        np.testing.assert_allclose(y[150], 5.0 + 25.0 * 50 / 200, atol=0.2)
        np.testing.assert_allclose(y[299], 30.0, atol=0.2)
        np.testing.assert_allclose(y[300:350], 30.0, atol=1e-5)  # P=3 const
        # P=4 parabolic 30→20 over 100 samples from 350; holds 20 after
        assert abs(float(y[400]) - 25.0) < 1.0
        np.testing.assert_allclose(y[455:550], 20.0, atol=1e-4)
        np.testing.assert_allclose(y[550:650], 20.0, atol=1e-5)  # P=5 const
        # P=6 cubic spline 20→10 over 100 samples from 650 (smoothstep
        # midpoint = mean)
        assert abs(float(y[700]) - 15.0) < 0.5
        np.testing.assert_allclose(y[755:800], 10.0, atol=1e-4)
        np.testing.assert_allclose(y[800:850], 10.0, atol=1e-5)  # P=7 const
        # P=8 impulse: 10 outside [0.02 s, 0.08 s] after 850, 20 inside
        np.testing.assert_allclose(y[850:870], 10.0, atol=1e-5)
        np.testing.assert_allclose(y[875:925], 20.0, atol=1e-5)
        np.testing.assert_allclose(y[935:], 10.0, atol=1e-5)
        # monotonicity of the two ramps
        assert np.all(np.diff(y[100:300]) >= -1e-5)
        assert np.all(np.diff(y[650:750]) <= 1e-5)

    def test_clock_driven_sample_budget(self):
        # ≈ cpp:177-196 "SignalGenerator + ClockSource": the clock's
        # n_samples_max bounds the run; every sample arrives at the sink
        sink = TagSink()
        g = gr.Graph()
        src = ClockSource(sample_rate=FS, n_samples=200)
        fg = FunctionGenerator(sample_rate=FS, signal_type="Const",
                               start_value=1.0)
        g.connect(src, fg, dst_port="clk_in")
        g.connect(fg, sink)
        gr.Scheduler(g, block_len=50, sample_rate=FS).run_and_wait()
        assert sink.data().shape[-1] == 200


def test_function_generator_announces_eos_with_unconnected_clk():
    # review finding: EOS announcement keyed on CONNECTED inputs — the
    # optional clk_in must not suppress a finished generator's
    # end_of_stream tag
    from gnuradio4_tpu.core.datasink import (DataSink, StreamingPoller)
    g = gr.Graph()
    fg = FunctionGenerator(signal_type="Const", start_value=1.0,
                           n_samples=64, sample_rate=FS)
    snk = DataSink(name="eos_sink")
    p = snk.attach(StreamingPoller())
    g.connect(fg, snk)
    gr.Scheduler(g, block_len=64, sample_rate=FS).run_and_wait()
    assert p.finished        # EOS tag reached the poller mid-stream
