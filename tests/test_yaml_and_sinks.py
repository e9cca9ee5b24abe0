"""L6 surface tests: YAML flowgraph round-trip (≈ qa_grc), DataSink pollers
(≈ qa DataSink consumer paths), trigger matching, profiler output, CLI."""

import json
import subprocess
import sys
import threading

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.core.datasink import (OverflowPolicy, global_data_sink_registry)
from gnuradio4_tpu.core.profiler import Profiler
from gnuradio4_tpu.core.tags import Keys, Tag
from gnuradio4_tpu.core.trigger import MatchResult, match_trigger
from gnuradio4_tpu.core.yaml_io import load_grc, run_grc, save_grc
from gnuradio4_tpu.blocks.acquisition import StreamToDataSet
from gnuradio4_tpu.blocks.testing import TagSource, VectorSink, VectorSource


FLOW = """
name: test_flow
sample_rate: 48000.0
block_len: 512
blocks:
  - name: src
    id: SignalGenerator
    parameters: {frequency: 1000.0, n_samples: 2048, signal: Sin}
  - name: gain
    id: MultiplyConst
    parameters: {value: 2.0}
  - name: snk
    id: VectorSink
connections:
  - [src, out, gain, in]
  - [gain, out, snk, in]
"""


class TestYaml:
    def test_load_and_run(self):
        sched = run_grc(FLOW)
        snk = [b for b in sched.graph.blocks if b.name == "snk"][0]
        data = snk.data()
        assert data.shape == (2048,)
        assert abs(np.max(data) - 2.0) < 0.01  # gain applied

    def test_round_trip_equality(self):
        g1 = load_grc(FLOW)
        y1 = save_grc(g1, sample_rate=48000.0, block_len=512)
        g2 = load_grc(y1)
        y2 = save_grc(g2, sample_rate=48000.0, block_len=512)
        assert y1 == y2  # load→save→load fixpoint (qa_grc invariant)
        assert {b.name for b in g2.blocks} == {"src", "gain", "snk"}
        gain = [b for b in g2.blocks if b.name == "gain"][0]
        assert gain.settings.get("value") == 2.0

    def test_nested_graph_round_trip(self):
        from gnuradio4_tpu.blocks.math import MultiplyConst
        inner = gr.Graph(name="inner")
        m = inner.add(MultiplyConst(value=3.0, name="m3"))
        inner.export_in("in", m, "in")
        inner.export_out("out", m, "out")
        outer = gr.Graph(name="outer")
        src = outer.emplace("CountingSource", n_samples=64)
        src.name = "src"
        snk = outer.emplace("VectorSink")
        snk.name = "snk"
        outer.add(inner)
        outer.connect(src, inner["in"])
        outer.connect(inner["out"], snk)
        y = save_grc(outer)
        g2 = load_grc(y)
        sched = gr.Scheduler(g2, block_len=64)
        sched.run_and_wait()
        snk2 = [b for b in g2.flatten().blocks if b.name == "snk"][0]
        np.testing.assert_allclose(snk2.data(), 3.0 * np.arange(64))

    def test_unknown_block_type_error(self):
        with pytest.raises(gr.GrError):
            load_grc("blocks:\n  - {name: x, id: NotABlock}\nconnections: []\n")

    def test_bad_connection_error(self):
        bad = FLOW + "  - [snk, out, src, in]\n"
        with pytest.raises(Exception):
            load_grc(bad)


class TestTriggerMatcher:
    def test_name_match(self):
        m = match_trigger("CMD_START")
        assert m(Tag(0, {Keys.TRIGGER_NAME: "CMD_START"})) is MatchResult.MATCHED
        assert m(Tag(0, {Keys.TRIGGER_NAME: "OTHER"})) is MatchResult.NOT_MATCHED
        assert m(Tag(0, {"foo": 1})) is MatchResult.IGNORE

    def test_context_match(self):
        m = match_trigger("CMD/SEL=1")
        assert m(Tag(0, {Keys.TRIGGER_NAME: "CMD",
                         Keys.CONTEXT: "SEL=1"})) is MatchResult.MATCHED
        assert m(Tag(0, {Keys.TRIGGER_NAME: "CMD",
                         Keys.CONTEXT: "SEL=2"})) is MatchResult.NOT_MATCHED

    def test_regex_and_alternatives(self):
        m = match_trigger("^CMD_|STOP")
        assert m(Tag(0, {Keys.TRIGGER_NAME: "CMD_A"})) is MatchResult.MATCHED
        assert m(Tag(0, {Keys.TRIGGER_NAME: "STOP"})) is MatchResult.MATCHED
        assert m(Tag(0, {Keys.TRIGGER_NAME: "GO"})) is MatchResult.NOT_MATCHED


def _run_flow_with_sink(tags, n=4096, block_len=512, sink_kwargs=None,
                        attach=None):
    """TagSource → DataSink; attach pollers before running."""
    g = gr.Graph()
    src = VectorSource(np.arange(n, dtype=np.float32), tags=tags)
    from gnuradio4_tpu.core.datasink import DataSink
    snk = DataSink(name=f"ds_{np.random.randint(1e9)}", **(sink_kwargs or {}))
    g.connect(src, snk)
    pollers = [attach(snk)] if attach else []
    gr.Scheduler(g, block_len=block_len).run_and_wait()
    return snk, pollers


class TestDataSink:
    def test_streaming_poller_receives_everything(self):
        snk, (p,) = _run_flow_with_sink(
            [], attach=lambda s: s.attach(
                __import__("gnuradio4_tpu.core.datasink",
                           fromlist=["StreamingPoller"]).StreamingPoller()))
        chunks = p.read_all()
        data = np.concatenate([c.data for c in chunks], axis=-1)
        np.testing.assert_array_equal(data, np.arange(4096, dtype=np.float32))
        assert p.finished  # EOS propagated

    def test_registry_lookup(self):
        g = gr.Graph()
        src = VectorSource(np.arange(100, dtype=np.float32))
        from gnuradio4_tpu.core.datasink import DataSink
        snk = DataSink(name="reg_test_sink")
        g.connect(src, snk)
        p = global_data_sink_registry.get_streaming_poller("reg_test_sink")
        gr.Scheduler(g, block_len=100).run_and_wait()
        chunks = p.read_all()
        assert sum(c.data.shape[-1] for c in chunks) == 100

    def test_trigger_poller_pre_post_window(self):
        from gnuradio4_tpu.core.datasink import TriggerPoller
        tags = [Tag(1000, {Keys.TRIGGER_NAME: "T1"}),
                Tag(2000, {Keys.TRIGGER_NAME: "T1"})]
        snk, (p,) = _run_flow_with_sink(
            tags, attach=lambda s: s.attach(TriggerPoller("T1", pre=8, post=16)))
        ds1 = p.read(timeout=0.1)
        ds2 = p.read(timeout=0.1)
        assert ds1 is not None and ds2 is not None
        np.testing.assert_array_equal(ds1.signal(0), np.arange(992, 1016))
        np.testing.assert_array_equal(ds2.signal(0), np.arange(1992, 2016))
        assert ds1.meta["trigger"][Keys.TRIGGER_NAME] == "T1"

    def test_trigger_window_across_chunk_boundary(self):
        from gnuradio4_tpu.core.datasink import TriggerPoller
        tags = [Tag(510, {Keys.TRIGGER_NAME: "X"})]  # window spans 512-boundary
        snk, (p,) = _run_flow_with_sink(
            tags, attach=lambda s: s.attach(TriggerPoller("X", pre=4, post=8)))
        ds = p.read(timeout=0.1)
        np.testing.assert_array_equal(ds.signal(0), np.arange(506, 518))

    def test_multiplexed_poller(self):
        from gnuradio4_tpu.core.datasink import MultiplexedPoller
        tags = [Tag(100, {Keys.TRIGGER_NAME: "START"}),
                Tag(150, {Keys.TRIGGER_NAME: "STOP"}),
                Tag(300, {Keys.TRIGGER_NAME: "START"}),
                Tag(333, {Keys.TRIGGER_NAME: "STOP"})]
        snk, (p,) = _run_flow_with_sink(
            tags, attach=lambda s: s.attach(MultiplexedPoller("START", "STOP")))
        ds1 = p.read(timeout=0.1)
        ds2 = p.read(timeout=0.1)
        np.testing.assert_array_equal(ds1.signal(0), np.arange(100, 150))
        np.testing.assert_array_equal(ds2.signal(0), np.arange(300, 333))

    def test_snapshot_poller(self):
        from gnuradio4_tpu.core.datasink import SnapshotPoller
        tags = [Tag(50, {Keys.TRIGGER_NAME: "S"})]
        snk, (p,) = _run_flow_with_sink(
            tags, attach=lambda s: s.attach(SnapshotPoller("S", delay_samples=25)))
        got = p.read(timeout=0.1)
        assert got is not None
        idx, val, tmap = got
        assert idx == 75 and val == 75.0

    def test_drop_policy_counts_drops(self):
        from gnuradio4_tpu.core.datasink import StreamingPoller
        snk, (p,) = _run_flow_with_sink(
            [], n=8192, block_len=256,
            attach=lambda s: s.attach(StreamingPoller(
                max_chunks=2, policy=OverflowPolicy.DROP)))
        assert p.dropped > 0
        assert len(p.read_all()) <= 2


class TestStreamToDataSet:
    def test_triggered_capture(self):
        g = gr.Graph()
        src = VectorSource(np.arange(2048, dtype=np.float32),
                           tags=[Tag(600, {Keys.TRIGGER_NAME: "GO"})])
        s2d = StreamToDataSet(mode="triggered", filter="GO", n_pre=10, n_post=20)
        g.connect(src, s2d)
        gr.Scheduler(g, block_len=512).run_and_wait()
        ds = s2d.read(timeout=0.1)
        np.testing.assert_array_equal(ds.signal(0), np.arange(590, 620))

    def test_continuous_windows(self):
        g = gr.Graph()
        src = VectorSource(np.arange(1000, dtype=np.float32))
        s2d = StreamToDataSet(mode="continuous", n_length=256)
        g.connect(src, s2d)
        gr.Scheduler(g, block_len=200).run_and_wait()
        wins = s2d.read_all()
        assert len(wins) == 3  # 1000 // 256
        np.testing.assert_array_equal(wins[1].signal(0), np.arange(256, 512))


class TestProfiler:
    def test_scheduler_emits_trace(self, tmp_path):
        prof = Profiler()
        g = gr.Graph()
        src = VectorSource(np.arange(1024, dtype=np.float32))
        snk = VectorSink()
        g.connect(src, snk)
        gr.Scheduler(g, block_len=256, profiler=prof).run_and_wait()
        events = prof.events()
        names = {e["name"] for e in events}
        assert {"scheduler.step", "scheduler.dispatch", "scheduler.deliver"} <= names
        out = tmp_path / "trace.json"
        prof.write(str(out))
        doc = json.loads(out.read_text())
        assert len(doc["traceEvents"]) == len(events)
        assert all("ts" in e for e in doc["traceEvents"])


class TestCli:
    def test_cli_run_and_inspect(self, tmp_path):
        flow = tmp_path / "flow.yaml"
        flow.write_text(FLOW)
        env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
               "JAX_PLATFORMS": "cpu", "HOME": "/root"}
        r = subprocess.run([sys.executable, "-m", "gnuradio4_tpu", "inspect",
                            str(flow)], capture_output=True, text=True,
                           cwd="/root/repo", timeout=120)
        assert r.returncode == 0, r.stderr
        assert "SignalGenerator" in r.stdout and "edge" in r.stdout
        r = subprocess.run([sys.executable, "-m", "gnuradio4_tpu", "run",
                            str(flow), "--cpu"], capture_output=True, text=True,
                           cwd="/root/repo", timeout=120)
        assert r.returncode == 0, r.stderr
        assert "state=STOPPED" in r.stderr

    def test_cli_blocks(self):
        r = subprocess.run([sys.executable, "-m", "gnuradio4_tpu", "blocks"],
                           capture_output=True, text=True, cwd="/root/repo",
                           timeout=120)
        assert r.returncode == 0
        assert "FFT" in r.stdout and "DataSink" in r.stdout


class TestReferenceGrcCompat:
    """Loading flowgraphs written in the REFERENCE's GRC dialect
    (qa_grc.cpp:128-147): templated C++ ids, instance names only inside
    parameters, and index-pair port references."""

    def test_reference_style_document_loads_and_runs(self):
        import numpy as np
        from gnuradio4_tpu.core.yaml_io import load_grc
        doc = """
blocks:
  - id: gr::testing::CountingSource<float32>
    parameters:
      name: src0
      n_samples: 256
  - id: gr::basic::MultiplyConst<float32>
    parameters:
      name: scale
      value: 3.0
  - id: gr::testing::TagSink<float32>
    parameters:
      name: sink0
connections:
  - [src0, [0, 0], scale, [0, 0]]
  - [scale, 0, sink0, 0]
"""
        g = load_grc(doc)
        assert {b.name for b in g.blocks} == {"src0", "scale", "sink0"}
        import gnuradio4_tpu as gr
        gr.Scheduler(g, block_len=128, pipeline_depth=1).run_and_wait()
        sink = next(b for b in g.blocks if b.name == "sink0")
        np.testing.assert_allclose(sink.data(), 3.0 * np.arange(256))

    def test_unknown_reference_id_still_errors(self):
        import pytest as _pytest
        from gnuradio4_tpu.core.yaml_io import load_grc
        doc = """
blocks:
  - id: gr::x::NoSuchBlock<float32>
    parameters:
      name: a
connections: []
"""
        with _pytest.raises(Exception, match="NoSuchBlock|unknown|registry"):
            load_grc(doc)
