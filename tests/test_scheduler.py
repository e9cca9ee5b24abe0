"""Scheduler/runtime integration tests (≈ reference qa_Scheduler,
qa_SchedulerMessages): lifecycle, EOS, data integrity, tags end-to-end, messages,
runtime graph mutation."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.math import Add, MultiplyConst
from gnuradio4_tpu.blocks.testing import (ConstantSource, CountingSource, Copy,
                                          NullSink, TagMonitor, TagSource,
                                          VectorSink, VectorSource)
from gnuradio4_tpu.core.messages import Command, Property
from gnuradio4_tpu.core.tags import Keys, Tag


def test_vector_roundtrip():
    data = np.arange(1000, dtype=np.float32)
    g = gr.Graph()
    src = VectorSource(data)
    snk = VectorSink()
    g.connect(src, snk)
    sched = gr.Scheduler(g, block_len=256)
    sched.run_and_wait()
    np.testing.assert_array_equal(snk.data(), data)
    assert sched.state is gr.State.STOPPED


def test_counting_source_eos_and_values():
    g = gr.Graph()
    src = CountingSource(n_samples=1000)
    mul = MultiplyConst(value=3.0)
    snk = VectorSink()
    g.connect_chain(src, mul, snk)
    gr.Scheduler(g, block_len=256).run_and_wait()
    out = snk.data()
    assert out.shape == (1000,)
    np.testing.assert_allclose(out, 3.0 * np.arange(1000, dtype=np.float32), rtol=1e-6)


def test_fan_out_fan_in():
    g = gr.Graph()
    src = CountingSource(n_samples=512)
    c1, c2 = Copy(), Copy()
    add = Add(n_inputs=2)
    snk = VectorSink()
    g.connect(src, c1)
    g.connect(src, c2)
    g.connect(c1, add["in0"])
    g.connect(c2, add["in1"])
    g.connect(add, snk)
    gr.Scheduler(g, block_len=128).run_and_wait()
    np.testing.assert_allclose(snk.data(), 2.0 * np.arange(512, dtype=np.float32))


def test_partial_final_block():
    data = np.arange(777, dtype=np.float32)  # not a multiple of block_len
    g = gr.Graph()
    src = VectorSource(data)
    snk = VectorSink()
    g.connect(src, snk)
    gr.Scheduler(g, block_len=256).run_and_wait()
    np.testing.assert_array_equal(snk.data(), data)


def test_tags_flow_to_sink_with_absolute_indices():
    g = gr.Graph()
    src = TagSource(tags=[Tag(10, {"a": 1}), Tag(300, {"b": 2})], n_samples=512)
    mon = TagMonitor()
    snk = VectorSink()
    g.connect_chain(src, mon, snk)
    gr.Scheduler(g, block_len=128).run_and_wait()
    idx = {t.index: t.map for t in snk.tags if not t.map.get(Keys.END_OF_STREAM)}
    assert idx.get(10) == {"a": 1}
    assert idx.get(300) == {"b": 2}
    assert any(t.map.get(Keys.END_OF_STREAM) for t in snk.tags)
    assert [t.index for t in mon.observed][:2] == [10, 300]


def test_settings_message_roundtrip():
    g = gr.Graph()
    src = CountingSource(n_samples=10_000)
    mul = MultiplyConst(value=1.0, name="gain")
    snk = NullSink()
    g.connect_chain(src, mul, snk)
    sched = gr.Scheduler(g, block_len=512)
    sched.bus.send_command(Command.Set, "gain", Property.SETTING, {"value": 4.0})
    sched.run_and_wait()
    replies = sched.bus.drain_replies()
    assert any(isinstance(r.data, dict) and r.data.get("value") == 4.0
               for r in replies)
    assert mul.settings.get("value") == 4.0


def test_lifecycle_message_stop():
    g = gr.Graph()
    src = ConstantSource()  # unbounded
    snk = NullSink()
    g.connect(src, snk)
    sched = gr.Scheduler(g, block_len=256)
    sched.start()
    import time
    deadline = time.monotonic() + 10
    while snk.count == 0 and time.monotonic() < deadline:
        time.sleep(0.01)
    sched.bus.send_command(Command.Set, "", Property.LIFECYCLE_STATE,
                           {"state": "REQUESTED_STOP"})
    sched.wait_done(timeout=30)
    assert sched.state is gr.State.STOPPED
    assert snk.count > 0


def test_pause_resume():
    import time
    g = gr.Graph()
    src = ConstantSource()
    snk = NullSink()
    g.connect(src, snk)
    sched = gr.Scheduler(g, block_len=256)
    sched.start()
    deadline = time.monotonic() + 10
    while snk.count == 0 and time.monotonic() < deadline:
        time.sleep(0.01)
    sched.request_pause()
    sched.fsm.wait_for(gr.State.PAUSED, timeout=10)
    n1 = snk.count
    time.sleep(0.05)
    n2 = snk.count
    assert n2 - n1 <= 2 * 256 * sched.pipeline_depth  # at most in-flight drain
    sched.resume()
    deadline = time.monotonic() + 10
    while snk.count <= n2 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert snk.count > n2
    sched.request_stop()
    sched.wait_done(timeout=30)


def test_inspect_graph_message():
    g = gr.Graph()
    src = ConstantSource(n_samples=100)
    snk = NullSink()
    g.connect(src, snk)
    sched = gr.Scheduler(g, block_len=64)
    sched.bus.send_command(Command.Get, "", Property.INSPECT_GRAPH)
    sched.run_and_wait()
    replies = sched.bus.drain_replies()
    graphs = [r.data for r in replies if isinstance(r.data, dict) and "blocks" in r.data]
    assert graphs and len(graphs[0]["blocks"]) == 2


def test_runtime_emplace_block_message():
    g = gr.Graph()
    src = CountingSource(n_samples=100_000)
    snk = VectorSink(name="cap")
    g.connect(src, snk)
    sched = gr.Scheduler(g, block_len=512)
    sched.init()
    # mutate before running: remove edge, insert a gain block in between
    sched.bus.send_command(Command.Set, "", Property.REMOVE_EDGE,
                           {"src": src.name, "dst": snk.name})
    sched.bus.send_command(Command.Set, "", Property.EMPLACE_BLOCK,
                           {"type": "MultiplyConst", "properties": {"value": 2.0}})
    sched._process_messages()
    mul = [b for b in g.blocks if type(b).__name__ == "MultiplyConst"][0]
    sched.bus.send_command(Command.Set, "", Property.EMPLACE_EDGE,
                           {"src": src.name, "dst": mul.name})
    sched.bus.send_command(Command.Set, "", Property.EMPLACE_EDGE,
                           {"src": mul.name, "dst": snk.name})
    sched.run_and_wait(n_steps=4)
    out = snk.data()
    assert out.size > 0
    np.testing.assert_allclose(out[:100], 2.0 * np.arange(100, dtype=np.float32))


def test_dynamic_setting_change_no_recompile():
    g = gr.Graph()
    src = CountingSource(n_samples=2048)
    mul = MultiplyConst(value=1.0)
    snk = VectorSink()
    g.connect_chain(src, mul, snk)
    sched = gr.Scheduler(g, block_len=512, pipeline_depth=1)
    sched.init()
    compiled_before = sched.compiled
    sched.run_and_wait(n_steps=2)
    mul.settings.set({"value": 10.0})
    # continue stepping manually to observe the change without recompiling
    while sched._pump_once():
        pass
    sched._drain()
    assert sched.compiled is compiled_before  # dynamic param → no re-jit
    out = snk.data()
    np.testing.assert_allclose(out[:1024], np.arange(1024))
    np.testing.assert_allclose(out[1024:], 10.0 * np.arange(1024, 2048))


def test_block_message_edges_drive_settings():
    """Async message port: a source block posts property maps that stage the
    downstream block's settings (≈ GR4 property messages over MsgPorts)."""
    from gnuradio4_tpu.core.block import Block, Port
    from gnuradio4_tpu.core.settings import Setting

    class Commander(Block):
        """Posts a gain change once it has seen 512 samples."""
        IN = (Port("in"),)
        OUT = (Port("out"),)

        def __init__(self, name=None, **s):
            super().__init__(name=name, **s)
            self._seen = 0

        def apply(self, state, ins, ctx):
            return state, {"out": ins["in"]}

        def emit_tags(self, ctx):  # host hook runs every step
            self._seen += next(iter(ctx.in_len.values()), 0)
            if self._seen == 1024:
                self.post_message({"value": 7.0})
            return []

    g = gr.Graph()
    src = CountingSource(n_samples=4096)
    cmd = Commander()
    mul = MultiplyConst(value=1.0, name="vga")
    snk = VectorSink()
    g.connect_chain(src, cmd, mul, snk)
    g.connect_message(cmd, mul)
    gr.Scheduler(g, block_len=512, pipeline_depth=1).run_and_wait()
    out = snk.data()
    np.testing.assert_allclose(out[:1024], np.arange(1024))
    # gain applies at the step boundary after the message
    np.testing.assert_allclose(out[1536:], 7.0 * np.arange(1536, 4096))


def test_settings_change_recorder_message_and_tag_paths():
    """SettingsChangeRecorder captures applied changes from BOTH control paths:
    a Set message and a tag auto-update (key matching a setting name)."""
    from gnuradio4_tpu.core.tags import Tag

    g = gr.Graph()
    src = g.emplace("TagSource", value=1.0, n_samples=16384,
                    tags=[Tag(8192, {"scaling_factor": 3.0})])
    rec = g.emplace("SettingsChangeRecorder", scaling_factor=2.0, name="rec")
    snk = g.emplace("VectorSink")
    g.connect_chain(src, rec, snk)
    sched = gr.Scheduler(g, block_len=4096, sample_rate=1e6)
    sched.bus.send_command(Command.Set, "rec", Property.SETTING,
                           {"scaling_factor": 5.0})
    sched.run_and_wait()
    y = np.asarray(snk.data())
    seen = [v for v in (2.0, 5.0, 3.0) if np.any(np.isclose(y, v))]
    assert 5.0 in seen and 3.0 in seen          # message then tag both applied
    changes = [c for _, c in rec.recorded]
    assert {"scaling_factor": 5.0} in changes
    assert {"scaling_factor": 3.0} in changes


def test_runtime_replace_block_message():
    """kReplaceBlock analog: a new block takes over the old one's name and
    connections mid-run; mismatched ports are rejected."""
    g = gr.Graph()
    src = CountingSource(n_samples=4096)
    mul = MultiplyConst(value=2.0, name="gain")
    snk = VectorSink(name="cap")
    g.connect_chain(src, mul, snk)
    sched = gr.Scheduler(g, block_len=512, pipeline_depth=1)
    sched.init()
    sched.run_and_wait(n_steps=2)
    sched.bus.send_command(Command.Set, "", Property.REPLACE_BLOCK,
                           {"name": "gain", "type": "AddConst",
                            "properties": {"value": 100.0}})
    while sched._pump_once():
        pass
    sched._drain()
    out = snk.data()
    np.testing.assert_allclose(out[:1024], 2.0 * np.arange(1024))
    np.testing.assert_allclose(out[1024:], np.arange(1024, 4096) + 100.0)
    names = {type(b).__name__ for b in sched.graph.blocks}
    assert "AddConst" in names and "MultiplyConst" not in names


def test_replace_block_port_mismatch_rejected():
    g = gr.Graph()
    src = CountingSource(n_samples=512)
    mul = MultiplyConst(value=2.0, name="gain")
    snk = NullSink()
    g.connect_chain(src, mul, snk)
    sched = gr.Scheduler(g, block_len=256)
    sched.init()
    sched.bus.send_command(Command.Set, "", Property.REPLACE_BLOCK,
                           {"name": "gain", "type": "NullSink"})
    sched._process_messages()
    replies = sched.bus.drain_replies()
    assert any(r.is_error for r in replies)
    # graph unharmed: the original block still present AND still wired
    assert any(b.name == "gain" and type(b).__name__ == "MultiplyConst"
               for b in sched.graph.blocks)
    gain = next(b for b in sched.graph.blocks if b.name == "gain")
    assert all((e.src is gain) == (e.src.name == "gain") for e in g.edges)
    assert sum(1 for e in g.edges if e.dst is gain) == 1
    assert sum(1 for e in g.edges if e.src is gain) == 1
    sched.run_and_wait()   # and it still runs to completion


def test_graph_grc_roundtrip_and_hotswap():
    """kGraphGRC: Get returns the running graph as YAML; Set swaps the whole
    flowgraph (compiled at the next step boundary)."""
    g = gr.Graph()
    src = CountingSource(n_samples=2048)
    src.name = "count"
    snk = VectorSink(name="old_cap")
    g.connect(src, snk)
    sched = gr.Scheduler(g, block_len=512, pipeline_depth=1)
    sched.init()
    sched.bus.send_command(Command.Get, "", Property.GRAPH_GRC)
    sched._process_messages()
    replies = sched.bus.drain_replies()
    yam = [r.data["grc"] for r in replies
           if isinstance(r.data, dict) and "grc" in r.data]
    assert yam and "count" in yam[0]

    new_yaml = """
name: swapped
blocks:
  - name: gen
    id: SignalGenerator
    parameters: {signal: Const, amplitude: 7.0, n_samples: 1024}
  - name: cap
    id: VectorSink
connections:
  - [gen, out, cap, in]
"""
    sched.bus.send_command(Command.Set, "", Property.GRAPH_GRC,
                           {"grc": new_yaml})
    sched.run_and_wait()
    cap = [b for b in sched.graph.blocks if b.name == "cap"][0]
    np.testing.assert_allclose(cap.data(), np.full(1024, 7.0))
    assert sched.state is gr.State.STOPPED
