"""Opt-in async sink delivery (Scheduler(async_delivery=True)): the D2H +
consume path runs on one dedicated FIFO worker so the pump never blocks on
device→host latency (the analog of the reference DataSink poller threads,
DataSink.hpp:21-37). Must preserve order/values/tags exactly, surface
consume errors on the pump thread, and fall back to sync when a feed
depends on a delivery."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.testing import CountingSource, VectorSink
from gnuradio4_tpu.core.block import Port, SinkBlock
from gnuradio4_tpu.core.errors import GrError


def _chain_graph(n=1 << 16):
    g = gr.Graph()
    src = g.add(CountingSource(n_samples=n))
    mul = g.emplace("MultiplyConst", value=3.0)
    snk = g.add(VectorSink())
    g.connect_chain(src, mul, snk)
    return g, snk


class TestAsyncDelivery:
    def test_bit_identical_to_sync(self):
        g1, s1 = _chain_graph()
        gr.Scheduler(g1, block_len=4096).run_and_wait()
        g2, s2 = _chain_graph()
        gr.Scheduler(g2, block_len=4096,
                     async_delivery=True).run_and_wait()
        np.testing.assert_array_equal(s1.data(), s2.data())
        assert s2.data().shape == (1 << 16,)

    def test_order_preserved_with_slow_sink(self):
        import time as _t
        seen = []

        class SlowSink(SinkBlock):
            IN = (Port("in", dtype="float32"),)

            def consume(self, arrays, tags, n_valid, abs_index):
                _t.sleep(0.003)
                if n_valid > 0:
                    seen.append(int(abs_index))

        g = gr.Graph()
        g.connect_chain(g.add(CountingSource(n_samples=1 << 15)),
                        g.add(SlowSink()))
        gr.Scheduler(g, block_len=1024,
                     async_delivery=True).run_and_wait()
        assert seen == sorted(seen) and len(seen) == 32

    def test_consume_error_surfaces_on_pump(self):
        class BadSink(SinkBlock):
            IN = (Port("in", dtype="float32"),)

            def consume(self, arrays, tags, n_valid, abs_index):
                if abs_index >= 2048:
                    raise ValueError("boom at 2048")

        g = gr.Graph()
        g.connect_chain(g.add(CountingSource(n_samples=1 << 14)),
                        g.add(BadSink()))
        with pytest.raises((GrError, ValueError)):
            gr.Scheduler(g, block_len=1024,
                         async_delivery=True).run_and_wait()

    def test_consume_error_prunes_in_prune_mode(self):
        class BadSink(SinkBlock):
            IN = (Port("in", dtype="float32"),)

            def consume(self, arrays, tags, n_valid, abs_index):
                raise ValueError("always fails")

        g = gr.Graph()
        src = g.add(CountingSource(n_samples=1 << 14))
        bad = g.add(BadSink())
        good = g.add(VectorSink())
        g.connect(src, bad)
        g.connect(src, good)
        sched = gr.Scheduler(g, block_len=1024, async_delivery=True,
                             on_block_error="prune")
        sched.run_and_wait()
        assert sched.zombies            # bad sink pruned
        assert good.data().shape == (1 << 14,)   # rest kept streaming

    def test_tags_ride_async_delivery(self):
        from gnuradio4_tpu.blocks.testing import TagSink, TagSource
        from gnuradio4_tpu.core.tags import Tag
        marks = [Tag(i, {"k": i}) for i in (0, 1000, 2047, 2048, 7000)]

        def run(async_mode):
            g = gr.Graph()
            src = g.add(TagSource(tags=list(marks), n_samples=8192))
            snk = g.add(TagSink())
            g.connect(src, snk)
            gr.Scheduler(g, block_len=2048,
                         async_delivery=async_mode).run_and_wait()
            return [(t.index, dict(t.map)) for t in snk.tags]

        t1, t2 = run(False), run(True)
        assert t1 == t2 and len(t1) >= len(marks)
