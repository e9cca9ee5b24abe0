"""Tag propagation semantics through a running graph (≈ reference qa_Tags /
qa_Settings auto-forwarding): index rescaling across rate changes, settings
auto-update from tags, forward-on-apply, context switching via tags."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.filter import Decimator
from gnuradio4_tpu.blocks.math import MultiplyConst
from gnuradio4_tpu.blocks.testing import TagSource, VectorSink, VectorSource
from gnuradio4_tpu.core.settings import SettingsCtx
from gnuradio4_tpu.core.tags import Keys, Tag


def test_tag_indices_rescale_through_decimation():
    g = gr.Graph()
    src = VectorSource(np.arange(2048, dtype=np.float32),
                       tags=[Tag(400, {"mark": 1}), Tag(1000, {"mark": 2})])
    dec = Decimator(decim=4)
    snk = VectorSink()
    g.connect_chain(src, dec, snk)
    gr.Scheduler(g, block_len=512).run_and_wait()
    marks = {t.map["mark"]: t.index for t in snk.tags if "mark" in t.map}
    assert marks == {1: 100, 2: 250}


def test_sample_rate_tag_auto_updates_settings():
    from gnuradio4_tpu.blocks.basic import SignalGenerator
    g = gr.Graph()
    src = VectorSource(np.zeros(1024, np.float32),
                       tags=[Tag(0, {Keys.SAMPLE_RATE: 96000.0})])
    gen_like = MultiplyConst(value=1.0)  # has no sample_rate setting → ignored
    snk = VectorSink()
    g.connect_chain(src, gen_like, snk)
    gr.Scheduler(g, block_len=512).run_and_wait()
    # the tag reaches the sink untouched
    assert any(t.map.get(Keys.SAMPLE_RATE) == 96000.0 for t in snk.tags)


def test_forward_on_apply_emits_tag_downstream():
    """Changing an auto-forward setting (sample_rate) publishes a tag."""
    from gnuradio4_tpu.core.settings import Setting
    from gnuradio4_tpu.core.block import Block, Port

    class RateBlock(Block):
        IN = (Port("in"),)
        OUT = (Port("out"),)
        sample_rate = Setting(default=1000.0)

        def apply(self, state, ins, ctx):
            return state, {"out": ins["in"]}

    g = gr.Graph()
    src = VectorSource(np.zeros(4096, np.float32))
    rb = g.add(RateBlock(name="rate"))
    snk = VectorSink()
    g.connect_chain(src, rb, snk)
    sched = gr.Scheduler(g, block_len=512, pipeline_depth=1)
    sched.init()
    sched._pump_once()
    rb.settings.set({"sample_rate": 2000.0})
    while sched._pump_once():
        pass
    sched._drain()
    fw = [t for t in snk.tags if t.map.get("sample_rate") == 2000.0]
    assert fw, "forward-on-apply tag not seen downstream"


def test_context_switch_via_tag():
    """A Keys.CONTEXT tag activates a stored settings context (SettingsCtx)."""
    g = gr.Graph()
    src = VectorSource(np.ones(2048, np.float32),
                       tags=[Tag(1024, {Keys.CONTEXT: "boost"})])
    mul = MultiplyConst(value=1.0, name="g")
    mul.settings.set({"value": 5.0}, ctx=SettingsCtx(context="boost"))
    snk = VectorSink()
    g.connect_chain(src, mul, snk)
    gr.Scheduler(g, block_len=512).run_and_wait()
    out = snk.data()
    # context applies at the step boundary following the tag (chunk semantics)
    assert out[0] == 1.0
    assert out[-1] == 5.0
    assert mul.settings.active_context.context == "boost"


def test_tpp_dont_blocks_propagation():
    from gnuradio4_tpu.core.tags import TagPropagation

    class Opaque(MultiplyConst):
        TAG_POLICY = TagPropagation.TPP_DONT

    g = gr.Graph()
    src = VectorSource(np.zeros(512, np.float32), tags=[Tag(10, {"x": 1})])
    blk = Opaque(value=1.0)
    snk = VectorSink()
    g.connect_chain(src, blk, snk)
    gr.Scheduler(g, block_len=512).run_and_wait()
    assert not any("x" in t.map for t in snk.tags)


def test_eos_tag_index_marks_stream_end():
    g = gr.Graph()
    src = TagSource(n_samples=700)
    snk = VectorSink()
    g.connect(src, snk)
    gr.Scheduler(g, block_len=256).run_and_wait()
    eos = [t for t in snk.tags if t.map.get(Keys.END_OF_STREAM)]
    assert eos and eos[0].index == 700


def test_stream_filter_gates_by_trigger_windows():
    from gnuradio4_tpu.blocks.misc import StreamFilter
    g = gr.Graph()
    src = VectorSource(np.ones(1024, np.float32),
                       tags=[Tag(100, {Keys.TRIGGER_NAME: "go"}),
                             Tag(200, {Keys.TRIGGER_NAME: "halt"}),
                             Tag(700, {Keys.TRIGGER_NAME: "go"}),
                             Tag(800, {Keys.TRIGGER_NAME: "halt"})])
    sf = StreamFilter(filter="go", filter_stop="halt")
    snk = VectorSink()
    g.connect_chain(src, sf, snk)
    gr.Scheduler(g, block_len=256).run_and_wait()
    y = snk.data()
    np.testing.assert_allclose(y[:100], 0.0)
    np.testing.assert_allclose(y[100:200], 1.0)
    np.testing.assert_allclose(y[200:700], 0.0)
    np.testing.assert_allclose(y[700:800], 1.0)
    np.testing.assert_allclose(y[800:], 0.0)


def test_stream_filter_window_spans_step_boundary():
    from gnuradio4_tpu.blocks.misc import StreamFilter
    g = gr.Graph()
    src = VectorSource(np.ones(1024, np.float32),
                       tags=[Tag(200, {Keys.TRIGGER_NAME: "go"}),
                             Tag(600, {Keys.TRIGGER_NAME: "halt"})])
    sf = StreamFilter(filter="go", filter_stop="halt")
    snk = VectorSink()
    g.connect_chain(src, sf, snk)
    gr.Scheduler(g, block_len=256).run_and_wait()  # window crosses 256/512 edges
    y = snk.data()
    np.testing.assert_allclose(y[200:600], 1.0)
    np.testing.assert_allclose(y[:200], 0.0)
    np.testing.assert_allclose(y[600:], 0.0)


def test_ctx_time_tag_activates_timed_preset():
    """A bare ctx_time tag picks the latest stored context whose time has
    come (time-multiplexed SettingsCtx presets, Settings.hpp:215)."""
    import numpy as np
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.core.settings import SettingsCtx
    from gnuradio4_tpu.core.tags import Keys, Tag
    from gnuradio4_tpu.blocks.testing import VectorSource

    x = np.ones(2048, np.float32)
    src = VectorSource(x, tags=[Tag(512, {Keys.CTX_TIME: 10.0}),
                                Tag(1024, {Keys.CTX_TIME: 20.0})])
    g = gr.Graph()
    g.add(src)
    mul = g.emplace("MultiplyConst", value=1.0)
    snk = gr.global_registry.create("VectorSink")
    g.connect_chain(src, mul, snk)
    # store two timed presets
    mul.settings.set({"value": 5.0}, ctx=SettingsCtx(time=10.0, context="t10"))
    mul.settings.set({"value": 9.0}, ctx=SettingsCtx(time=20.0, context="t20"))
    gr.Scheduler(g, block_len=512, pipeline_depth=1).run_and_wait()
    y = snk.data()
    # step granularity: preset applies at the step after its tag
    assert y[0] == 1.0
    assert 5.0 in y and 9.0 in y
    assert y[-1] == 9.0


def test_tags_traverse_deep_fast_path_cascade():
    """Steady-state fast path (compiler.tag_plan): tag-passive mid-graph
    blocks are skipped wholesale when no tags are in flight — but tags that
    DO enter (source tags, EOS) must still walk the full 40-block cascade
    with exact index rescaling."""
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.testing import TagSource, TagSink
    from gnuradio4_tpu.core.tags import Tag, Keys

    g = gr.Graph()
    src = g.add(TagSource(n_samples=4096, tags=[
        Tag(100, {"hello": 1}), Tag(2000, {"hello": 2})]))
    prev = src
    for _ in range(20):
        m = g.emplace("MultiplyConst", value=2.0)
        d = g.emplace("DivideConst", value=2.0)
        g.connect(prev, m)
        g.connect(m, d)
        prev = d
    snk = g.add(TagSink())
    g.connect(prev, snk)
    gr.Scheduler(g, block_len=1024, sample_rate=1e6).run_and_wait()
    got = {int(t.index): t.map for t in snk.tags if "hello" in t.map}
    assert got[100]["hello"] == 1 and got[2000]["hello"] == 2
    # EOS announced from a fast-path source still reaches the sink
    eos = [t for t in snk.tags if t.map.get(Keys.END_OF_STREAM)]
    assert eos and int(eos[-1].index) == 4096
