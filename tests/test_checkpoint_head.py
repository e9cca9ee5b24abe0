"""Checkpoint/resume (state snapshot + graph round-trip) and mid-graph
HeadBlock EOS."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from gnuradio4_tpu.blocks.testing import HeadBlock, VectorSink


class TestHeadBlock:
    def test_head_truncates_and_stops_graph(self):
        g = gr.Graph()
        src = g.emplace("ConstantSource", value=1.0)  # unbounded!
        head = g.emplace("HeadBlock", n_samples=1000)
        snk = gr.global_registry.create("VectorSink")
        g.connect_chain(src, head, snk)
        sched = gr.Scheduler(g, block_len=256)
        sched.run_and_wait()  # must terminate despite unbounded source
        assert sched.state is gr.State.STOPPED
        assert snk.data().shape == (1000,)

    def test_head_mid_chain(self):
        g = gr.Graph()
        src = g.emplace("CountingSource")
        head = g.emplace("HeadBlock", n_samples=500)
        mul = g.emplace("MultiplyConst", value=2.0)
        snk = gr.global_registry.create("VectorSink")
        g.connect_chain(src, head, mul, snk)
        gr.Scheduler(g, block_len=128).run_and_wait()
        np.testing.assert_allclose(snk.data(), 2.0 * np.arange(500))


class TestCheckpoint:
    def _build(self):
        g = gr.Graph()
        src = g.emplace("SignalGenerator", frequency=1000.0, n_samples=8192)
        src.name = "tone"
        fir = g.emplace("BasicFilter", filter_type="lowpass", f_low=5000.0,
                        ntaps=31, sample_rate_design=48000.0)
        fir.name = "lp"
        snk = gr.global_registry.create("VectorSink")
        snk.name = "cap"
        g.connect_chain(src, fir, snk)
        return g, snk

    def test_resume_is_bit_exact(self, tmp_path):
        # reference: run 8192 samples straight through
        g_ref, snk_ref = self._build()
        gr.Scheduler(g_ref, block_len=1024, sample_rate=48000.0).run_and_wait()
        ref = snk_ref.data()

        # run half, checkpoint, resume in a NEW scheduler, run the rest
        g, snk = self._build()
        sched = gr.Scheduler(g, block_len=1024, sample_rate=48000.0,
                             pipeline_depth=1)
        sched.init()
        for _ in range(4):
            sched._pump_once()
        sched._drain()
        first_half = snk.data()
        ckpt = save_checkpoint(sched, tmp_path / "ck")
        sched.request_stop()

        resumed = load_checkpoint(ckpt, pipeline_depth=1)
        snk2 = [b for b in resumed.compiled.order if b.name == "cap"][0]
        while resumed._pump_once():
            pass
        resumed._drain()
        second_half = snk2.data()
        joined = np.concatenate([first_half, second_half])
        assert joined.shape == ref.shape
        np.testing.assert_allclose(joined, ref, atol=1e-6)

    def test_checkpoint_restores_noise_key(self, tmp_path):
        g = gr.Graph()
        src = g.emplace("NoiseSource", seed=7, n_samples=4096)
        src.name = "noise"
        snk = gr.global_registry.create("VectorSink")
        snk.name = "cap"
        g.connect(src, snk)
        sched = gr.Scheduler(g, block_len=1024, pipeline_depth=1)
        sched.init()
        sched._pump_once()
        sched._drain()
        ck = save_checkpoint(sched, tmp_path / "ck2")
        a = snk.data().copy()

        resumed = load_checkpoint(ck, pipeline_depth=1)
        snk2 = [b for b in resumed.compiled.order if b.name == "cap"][0]
        while resumed._pump_once():
            pass
        resumed._drain()
        b = snk2.data()
        # full straight-through reference
        g3 = gr.Graph()
        s3 = g3.emplace("NoiseSource", seed=7, n_samples=4096)
        k3 = gr.global_registry.create("VectorSink")
        g3.connect(s3, k3)
        gr.Scheduler(g3, block_len=1024).run_and_wait()
        np.testing.assert_array_equal(np.concatenate([a, b]), k3.data())

    def test_file_source_resume_skips_served_samples(self, tmp_path):
        """A restarted IO feeder streams from the file start again; resume must
        fast-forward past already-consumed items (bit-exact mid-stream resume)."""
        data = np.arange(4096, dtype=np.float32)
        path = tmp_path / "stream.f32"
        data.tofile(path)

        def build():
            g = gr.Graph()
            src = g.emplace("FileSource", path=str(path), dtype="float32")
            src.name = "file"
            snk = gr.global_registry.create("VectorSink")
            snk.name = "cap"
            g.connect(src, snk)
            return g, snk

        g, snk = build()
        sched = gr.Scheduler(g, block_len=512, pipeline_depth=1)
        sched.init()
        for _ in range(3):
            sched._pump_once()
        sched._drain()
        first = snk.data()
        ck = save_checkpoint(sched, tmp_path / "ck3")
        sched.request_stop()

        resumed = load_checkpoint(ck, pipeline_depth=1)
        snk2 = [b for b in resumed.compiled.order if b.name == "cap"][0]
        while resumed._pump_once():
            pass
        resumed._drain()
        joined = np.concatenate([first, snk2.data()])
        np.testing.assert_array_equal(joined, data)

    def test_duplicate_names_rejected(self, tmp_path):
        g = gr.Graph()
        a = g.emplace("ConstantSource", n_samples=100)
        b = g.emplace("NullSink")
        a.name = b.name = "same"
        g.connect(a, b)
        sched = gr.Scheduler(g, block_len=64)
        sched.init()
        with pytest.raises(gr.GrError):
            save_checkpoint(sched, tmp_path / "dup")
