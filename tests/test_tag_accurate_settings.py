"""Sample-accurate tag-driven settings (VERDICT #3; ≈ reference chunk-breaking
at the next tag, Block.hpp:1986): a dynamic setting carried by a tag at index k
takes effect at exactly sample k via a per-sample parameter ramp for that step."""

import numpy as np

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.testing import VectorSource
from gnuradio4_tpu.core.tags import Tag


class TestTagAccurateSettings:
    def test_multiply_const_switches_at_exact_sample(self):
        """value tag at abs index 700 (mid-step, block_len 512): output is
        old·x before 700 and new·x from 700 on — zero samples of slop."""
        g = gr.Graph()
        src = g.emplace("TagSource", value=1.0, n_samples=2048,
                        tags=[Tag(700, {"value": 3.0})])
        mul = g.emplace("MultiplyConst", value=2.0)
        snk = gr.global_registry.create("VectorSink")
        g.connect_chain(src, mul, snk)
        gr.Scheduler(g, block_len=512, pipeline_depth=1).run_and_wait()
        y = snk.data()
        expect = np.where(np.arange(2048) < 700, 2.0, 3.0)
        np.testing.assert_array_equal(y, expect)

    def test_multiple_tags_one_step(self):
        g = gr.Graph()
        src = g.emplace("TagSource", value=1.0, n_samples=1024,
                        tags=[Tag(100, {"value": 5.0}),
                              Tag(200, {"value": 7.0})])
        mul = g.emplace("MultiplyConst", value=2.0)
        snk = gr.global_registry.create("VectorSink")
        g.connect_chain(src, mul, snk)
        gr.Scheduler(g, block_len=1024, pipeline_depth=1).run_and_wait()
        y = snk.data()
        expect = np.full(1024, 2.0, np.float32)
        expect[100:] = 5.0
        expect[200:] = 7.0
        np.testing.assert_array_equal(y, expect)

    def test_two_tags_same_index_no_crash(self):
        """Two tags at the SAME sample index: the event sort must key on the
        index only (dict payloads are unorderable); the later tag wins."""
        g = gr.Graph()
        src = g.emplace("TagSource", value=1.0, n_samples=1024,
                        tags=[Tag(300, {"value": 5.0}),
                              Tag(300, {"value": 9.0})])
        mul = g.emplace("MultiplyConst", value=2.0)
        snk = gr.global_registry.create("VectorSink")
        g.connect_chain(src, mul, snk)
        gr.Scheduler(g, block_len=1024, pipeline_depth=1).run_and_wait()
        y = snk.data()
        expect = np.full(1024, 2.0, np.float32)
        expect[300:] = 9.0
        np.testing.assert_array_equal(y, expect)

    def test_rotator_frequency_switch_exact_and_phase_continuous(self):
        """frequency_shift tag at index 1000: instantaneous frequency is old
        for increments up to sample 1000 and new from 1000→1001 on; the
        integer-NCO phase stays continuous through the switch."""
        x = np.ones(4096, np.complex64)
        g = gr.Graph()
        src = VectorSource(x, tags=[Tag(1000, {"frequency_shift": 0.02})])
        g.add(src)
        rot = g.emplace("Rotator", sample_rate=1.0, frequency_shift=0.05)
        snk = gr.global_registry.create("VectorSink")
        g.connect_chain(src, rot, snk)
        gr.Scheduler(g, block_len=2048, sample_rate=1.0,
                     pipeline_depth=1).run_and_wait()
        y = snk.data()
        inst = np.angle(y[1:] * np.conj(y[:-1])) / (2 * np.pi)
        np.testing.assert_allclose(inst[:1000], 0.05, atol=1e-4)
        np.testing.assert_allclose(inst[1000:], 0.02, atol=1e-4)
        np.testing.assert_allclose(np.abs(y), 1.0, atol=1e-5)

    def test_demod_gain_ramp(self):
        """QuadratureDemod gain tag applies at the exact sample."""
        t = np.arange(2048)
        x = np.exp(2j * np.pi * 0.1 * t).astype(np.complex64)
        g = gr.Graph()
        src = VectorSource(x, tags=[Tag(500, {"gain": 2.0})])
        g.add(src)
        dem = g.emplace("QuadratureDemod", gain=1.0)
        snk = gr.global_registry.create("VectorSink")
        g.connect_chain(src, dem, snk)
        gr.Scheduler(g, block_len=2048, pipeline_depth=1).run_and_wait()
        y = snk.data()
        w = 2 * np.pi * 0.1
        np.testing.assert_allclose(y[1:500], w, rtol=1e-4)
        np.testing.assert_allclose(y[500:], 2 * w, rtol=1e-4)

    def test_next_step_uses_new_scalar(self):
        """After the ramp step, subsequent steps run on the plain new scalar
        (no ramp arrays linger)."""
        g = gr.Graph()
        src = g.emplace("TagSource", value=1.0, n_samples=2048,
                        tags=[Tag(100, {"value": 4.0})])
        mul = g.emplace("MultiplyConst", value=2.0)
        snk = gr.global_registry.create("VectorSink")
        g.connect_chain(src, mul, snk)
        sched = gr.Scheduler(g, block_len=512, pipeline_depth=1)
        sched.run_and_wait()
        y = snk.data()
        np.testing.assert_array_equal(y[512:], np.full(1536, 4.0))
        assert float(mul.settings.get("value")) == 4.0


def test_tag_staged_rate_change_defers_to_next_step():
    """Review regression: a tag-staged STATIC change that re-solves the rate
    solution cannot be dispatched mid-step (this step's feeds/validity were
    sized on the old grid) — the scheduler reverts to the old program for the
    tagged step and adopts the new solution at the next boundary, without
    crashing or corrupting totals."""
    import numpy as np
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource
    from gnuradio4_tpu.core.settings import SettingsCtx
    from gnuradio4_tpu.core.tags import Keys, Tag

    g = gr.Graph()
    src = VectorSource(np.arange(4096, dtype=np.float32),
                       tags=[Tag(1024, {Keys.TRIGGER_NAME: "SWITCH",
                                        Keys.CONTEXT: "fast"})])
    dec = g.emplace("Decimator", decim=2)
    dec.settings.set({"decim": 4}, ctx=SettingsCtx(context="fast"))
    snk = VectorSink()
    g.connect_chain(src, dec, snk)
    gr.Scheduler(g, block_len=1024).run_and_wait()
    y = snk.data()
    # steps 0 (factor 2) → 512 out; the tagged step reverts to factor 2 once
    # more (rate change defers), then factor 4 for the rest
    assert y.shape[-1] == 512 + 512 + 2 * 256
    # content stays decimation-consistent throughout (every sample is one of
    # the source values, strictly increasing)
    assert np.all(np.diff(y) > 0)
    assert int(dec.settings.get("decim")) == 4
