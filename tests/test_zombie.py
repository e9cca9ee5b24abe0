"""Zombie-block semantics (VERDICT #4; ≈ reference cleanupZombieBlocks,
Scheduler.hpp:1210-1217): with on_block_error='prune', a failing block and its
dependent branch are removed and the rest of the graph keeps streaming."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.core.block import Block, Port, SinkBlock


class ExplodingBlock(Block):
    """Raises during trace — a block whose apply is broken."""

    IN = (Port("in"),)
    OUT = (Port("out"),)

    def apply(self, state, ins, ctx):
        raise RuntimeError("kaboom (trace)")


class ExplodingSink(SinkBlock):
    """Raises on the Nth host consume — a runtime host-side failure."""

    IN = (Port("in"),)

    def __init__(self, fail_at=1, name=None, **settings):
        super().__init__(name=name, **settings)
        self.fail_at = fail_at
        self.calls = 0

    def consume(self, arrays, tags, n_valid, abs_index):
        self.calls += 1
        if self.calls >= self.fail_at:
            raise RuntimeError("kaboom (consume)")


def _two_branch(bad_block):
    """src fans out into a bad branch and a healthy branch."""
    g = gr.Graph()
    src = g.emplace("CountingSource", n_samples=4096)
    bad_mul = g.emplace("MultiplyConst", value=1.0)
    bad_mul.name = "bad_mul"
    bad_sink = gr.global_registry.create("NullSink")
    good = g.emplace("MultiplyConst", value=2.0)
    snk = gr.global_registry.create("VectorSink")
    g.connect(src, bad_block["in"] if bad_block.in_ports else bad_block)
    g.connect(bad_block, bad_mul)
    g.connect(bad_mul, bad_sink)
    g.connect(src, good)
    g.connect(good, snk)
    return g, snk


class TestZombieSemantics:
    def test_trace_failure_prunes_branch_keeps_streaming(self):
        bad = ExplodingBlock(name="boom")
        g, snk = _two_branch(bad)
        sched = gr.Scheduler(g, block_len=1024, pipeline_depth=1,
                             on_block_error="prune")
        sched.run_and_wait()
        assert sched.state is gr.State.STOPPED
        # healthy branch streamed to completion
        np.testing.assert_allclose(snk.data(), 2.0 * np.arange(4096))
        # the bad branch (block + dependents) was pruned
        assert "boom" in sched.zombies
        assert "bad_mul" in sched.zombies
        names = {b.name for b in sched.compiled.order}
        assert "boom" not in names and "bad_mul" not in names

    def test_error_message_on_bus(self):
        bad = ExplodingBlock(name="boom")
        g, _ = _two_branch(bad)
        sched = gr.Scheduler(g, block_len=1024, pipeline_depth=1,
                             on_block_error="prune")
        got = []
        sched.bus.subscribe("BlockError", lambda m: got.append(m))
        sched.run_and_wait()
        errs = [m for m in got if m.endpoint == "BlockError"]
        assert errs and errs[0].data["block"] == "boom"
        assert "bad_mul" in errs[0].data["removed"]

    def test_consume_failure_prunes_sink_only(self):
        bad_sink = ExplodingSink(fail_at=2, name="flaky_sink")
        g = gr.Graph()
        src = g.emplace("CountingSource", n_samples=4096)
        good = g.emplace("MultiplyConst", value=3.0)
        snk = gr.global_registry.create("VectorSink")
        g.connect(src, bad_sink)
        g.connect(src, good)
        g.connect(good, snk)
        sched = gr.Scheduler(g, block_len=512, pipeline_depth=1,
                             on_block_error="prune")
        sched.run_and_wait()
        assert sched.state is gr.State.STOPPED
        np.testing.assert_allclose(snk.data(), 3.0 * np.arange(4096))
        assert sched.zombies == ["flaky_sink"]

    def test_default_shutdown_still_raises(self):
        bad = ExplodingBlock(name="boom")
        g, _ = _two_branch(bad)
        sched = gr.Scheduler(g, block_len=1024, pipeline_depth=1)
        with pytest.raises(gr.GrError, match="kaboom"):
            sched.run_and_wait()
        assert sched.state is gr.State.ERROR

    def test_whole_graph_doomed_raises(self):
        g = gr.Graph()
        src = g.emplace("CountingSource", n_samples=1024)
        bad = ExplodingBlock(name="boom")
        snk = gr.global_registry.create("NullSink")
        g.connect_chain(src, bad, snk)
        sched = gr.Scheduler(g, block_len=512, on_block_error="prune")
        # pruning boom also dooms the sink; the source alone still runs —
        # but pruning must never loop forever; either outcome (clean stop
        # with the branch gone, or an error naming the block) is acceptable
        try:
            sched.run_and_wait()
            assert "boom" in sched.zombies
        except gr.GrError as e:
            assert "boom" in str(e)
