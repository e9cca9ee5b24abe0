"""Golden mirror of the reference's qa_TriggerBlocks.cpp
(blocks/basic/test/qa_TriggerBlocks.cpp:15-137): the full
ClockSource → FunctionGenerator(clk_in) → SchmittTrigger → TagSink chain —
context tags drive the stored-settings waveform timeline, the Schmitt block
passes the signal through and emits MY_RISING_EDGE / MY_FALLING_EDGE trigger
tags at (sub-sample interpolated) edge positions, for every interpolation
method."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.misc import (ClockSource, FunctionGenerator,
                                       SchmittTrigger)
from gnuradio4_tpu.blocks.testing import TagSink
from gnuradio4_tpu.core.settings import SettingsCtx
from gnuradio4_tpu.core.tags import Keys

FS = 1000.0
CTX = [f"FAIR.SELECTOR.C=1:S=1:P={i}" for i in range(5)]


def _build(interpolation):
    g = gr.Graph()
    clock = ClockSource(
        sample_rate=FS, n_samples=1000,
        tag_times=[0.0, 0.1, 0.4, 0.5, 0.8],
        tag_values=[{Keys.TRIGGER_NAME: "CMD_BP_START", Keys.CONTEXT: c}
                    for c in CTX])
    fg = FunctionGenerator(sample_rate=FS, start_value=0.1)
    # the qa's per-context property maps (qa_TriggerBlocks.cpp:54-58)
    fg.settings.set({"signal_type": "Const", "start_value": 0.1},
                    ctx=SettingsCtx(context=CTX[0]))
    fg.settings.set({"signal_type": "ParabolicRamp", "start_value": 0.1,
                     "final_value": 1.1, "duration": 0.3,
                     "round_off_time": 0.02}, ctx=SettingsCtx(context=CTX[1]))
    fg.settings.set({"signal_type": "Const", "start_value": 1.1},
                    ctx=SettingsCtx(context=CTX[2]))
    fg.settings.set({"signal_type": "ParabolicRamp", "start_value": 1.1,
                     "final_value": 0.1, "duration": 0.3,
                     "round_off_time": 0.02}, ctx=SettingsCtx(context=CTX[3]))
    fg.settings.set({"signal_type": "Const", "start_value": 0.1},
                    ctx=SettingsCtx(context=CTX[4]))
    schmitt = SchmittTrigger(threshold=0.1, offset=0.6, output="pass",
                             trigger_name_rising_edge="MY_RISING_EDGE",
                             trigger_name_falling_edge="MY_FALLING_EDGE",
                             interpolation=interpolation)
    sink = TagSink()
    g.connect(clock, fg, dst_port="clk_in")
    g.connect(fg, schmitt)
    g.connect(schmitt, sink)
    return g, sink


@pytest.mark.parametrize("interpolation,rising,falling", [
    ("none", 278, 678),             # threshold-crossing sample
    ("basic_linear", 250, 650),     # exact (interpolated) edge position
    ("regression", 250, 650),
    ("polynomial", 250, 650),
])
@pytest.mark.parametrize("block_len", [100, 50])
def test_schmitt_trigger_edges(interpolation, rising, falling, block_len):
    # ≈ qa_TriggerBlocks.cpp:105-131 (NO_INTERPOLATION → 278/678,
    # interpolated methods → 250/650, each ±2 samples)
    g, sink = _build(interpolation)
    gr.Scheduler(g, block_len=block_len, sample_rate=FS).run_and_wait()

    named = [t for t in sink.tags if Keys.TRIGGER_NAME in t.map]
    rises = [t for t in named
             if t.map[Keys.TRIGGER_NAME] == "MY_RISING_EDGE"]
    falls = [t for t in named
             if t.map[Keys.TRIGGER_NAME] == "MY_FALLING_EDGE"]
    ctx_tags = [t for t in named if t.map[Keys.TRIGGER_NAME] == "CMD_BP_START"]
    assert len(ctx_tags) == 5                      # forwarded clock tags
    assert len(rises) == 1, [t.index for t in named]
    assert len(falls) == 1, [t.index for t in named]
    assert abs(rises[0].index - rising) <= 2, rises[0].index
    assert abs(falls[0].index - falling) <= 2, falls[0].index
    # edge tags carry time/offset/context like the reference
    # (Trigger.hpp:122-130)
    for t in rises + falls:
        assert Keys.TRIGGER_TIME in t.map
        assert Keys.TRIGGER_OFFSET in t.map
        assert Keys.CONTEXT in t.map
    # interpolated edges record a sub-sample remainder; trigger time matches
    # the edge position at the sample rate
    rt = rises[0].map[Keys.TRIGGER_TIME]
    assert abs(rt / 1e9 - rises[0].index / FS) < 2.0 / FS


def test_waveform_plateaus_and_ramp():
    """The context-driven timeline itself: plateaus at 0.1/1.1 and a
    monotonic ramp through the band (sanity for the stimulus the qa plots
    via ImChartMonitor)."""
    g, sink = _build("none")
    gr.Scheduler(g, block_len=100, sample_rate=FS).run_and_wait()
    y = sink.data()
    assert y.shape[-1] == 1000
    np.testing.assert_allclose(y[:100], 0.1, atol=1e-5)     # bottom plateau
    np.testing.assert_allclose(y[420:500], 1.1, atol=1e-5)  # top plateau
    np.testing.assert_allclose(y[830:], 0.1, atol=1e-5)     # tail plateau
    ramp = y[110:390]
    assert np.all(np.diff(ramp) >= -1e-6)                   # monotonic up
    assert abs(float(y[250]) - 0.6) < 0.02                  # band midpoint


def test_gate_mode_unchanged():
    """Legacy ±1 gate output stays available (output='gate' default)."""
    from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource
    g = gr.Graph()
    x = np.concatenate([np.zeros(10), np.ones(10), np.zeros(10)]) \
        .astype(np.float32)
    st = SchmittTrigger(low=0.25, high=0.75)
    snk = VectorSink()
    g.connect(VectorSource(x), st)
    g.connect(st, snk)
    gr.Scheduler(g, block_len=30).run_and_wait()
    y = snk.data()
    assert y[5] == -1.0 and y[15] == 1.0 and y[25] == -1.0
