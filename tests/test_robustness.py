"""Failure-handling / robustness tests (SURVEY §5: watchdog, error states,
recompile-on-static-change, zombie-ish tolerance of failing blocks)."""

import time

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.testing import (ConstantSource, CountingSource,
                                          NullSink, SlowSource, VectorSink)
from gnuradio4_tpu.core.block import Block, Port
from gnuradio4_tpu.core.settings import Setting


class _ExplodingBlock(Block):
    """Raises during apply after a settings flip (fault injection ≈ bad_plugin)."""

    IN = (Port("in"),)
    OUT = (Port("out"),)
    explode = Setting(default=False, kind="static")

    def apply(self, state, ins, ctx):
        if self.settings.get("explode"):
            raise RuntimeError("boom")
        return state, {"out": ins["in"]}


class TestErrorHandling:
    def test_block_error_puts_scheduler_in_error_state(self):
        g = gr.Graph()
        src = g.add(CountingSource(n_samples=10_000))
        bad = g.add(_ExplodingBlock(explode=True))
        snk = g.add(NullSink())
        g.connect_chain(src, bad, snk)
        sched = gr.Scheduler(g, block_len=256)
        with pytest.raises(gr.GrError, match="boom"):
            sched.run_and_wait()
        assert sched.state is gr.State.ERROR
        assert sched.error is not None

    def test_reset_recovers_from_error(self):
        g = gr.Graph()
        src = g.add(CountingSource(n_samples=1000))
        bad = g.add(_ExplodingBlock(explode=True))
        snk = g.add(VectorSink())
        g.connect_chain(src, bad, snk)
        sched = gr.Scheduler(g, block_len=256)
        with pytest.raises(gr.GrError):
            sched.run_and_wait()
        # fix the block, reset, rerun
        bad.settings.set({"explode": False})
        sched.reset()
        sched.run_and_wait()
        assert sched.state is gr.State.STOPPED
        assert snk.data().shape == (1000,)

    def test_static_change_recompiles_mid_run(self):
        from gnuradio4_tpu.blocks.fourier import FFT
        g = gr.Graph()
        src = g.add(CountingSource(n_samples=8192))
        fft = g.add(FFT(fft_size=256, output="magnitude"))
        snk = g.add(VectorSink())
        g.connect_chain(src, fft, snk)
        sched = gr.Scheduler(g, block_len=1024, pipeline_depth=1)
        sched.init()
        first = sched.compiled
        sched._pump_once()
        fft.settings.set({"fft_size": 512})  # static → re-jit at boundary
        sched._pump_once()
        assert sched.compiled is not first
        while sched._pump_once():
            pass
        sched._drain()
        assert snk.data().shape == (8192,)

    def test_watchdog_flags_stall(self):
        g = gr.Graph()
        src = g.add(SlowSource(delay_s=0.5, n_samples=4096))
        snk = g.add(NullSink())
        g.connect(src, snk)
        sched = gr.Scheduler(g, block_len=512, watchdog_timeout=0.15)
        notes = []
        sched.bus.subscribe("Watchdog", lambda m: notes.append(m))
        sched.start()
        sched.wait_done(timeout=60)
        assert notes, "watchdog did not flag the stalled stream"
        assert notes[0].data["stalled_for_s"] >= 0.15

    def test_hook_exception_reported_not_fatal(self):
        class BadStart(ConstantSource):
            def start(self):
                raise ValueError("start failed")
        g = gr.Graph()
        src = g.add(BadStart(n_samples=100))
        snk = g.add(NullSink())
        g.connect(src, snk)
        sched = gr.Scheduler(g, block_len=64)
        sched.run_and_wait()  # hook errors are reported, graph still runs
        assert sched.error is not None
        assert snk.count == 100


class TestQuiescence:
    def test_stop_drains_inflight(self):
        g = gr.Graph()
        src = g.add(ConstantSource())
        snk = g.add(VectorSink())
        g.connect(src, snk)
        sched = gr.Scheduler(g, block_len=128, pipeline_depth=4)
        sched.init()
        for _ in range(6):
            sched._pump_once()
        sched.request_stop()
        sched._drain()
        # all dispatched steps delivered despite pipeline depth
        assert snk.data().shape == (6 * 128,)


def test_trace_error_names_the_block():
    from gnuradio4_tpu.core.block import Block, Port

    class Broken(Block):
        IN = (Port("in"),)
        OUT = (Port("out"),)

        def apply(self, state, ins, ctx):
            return state, {"out": ins["in"].reshape(13, 17)}  # bad reshape

    g = gr.Graph()
    src = g.add(CountingSource(n_samples=100))
    bad = g.add(Broken(name="oops"))
    snk = g.add(NullSink())
    g.connect_chain(src, bad, snk)
    sched = gr.Scheduler(g, block_len=64)
    with pytest.raises(gr.GrError, match="oops"):
        sched.run_and_wait(n_steps=1)  # the trace happens at the first step


def test_watchdog_stop_action():
    g = gr.Graph()
    src = g.add(SlowSource(delay_s=0.4))  # unbounded AND slow
    snk = g.add(NullSink())
    g.connect(src, snk)
    sched = gr.Scheduler(g, block_len=256, watchdog_timeout=0.1,
                         watchdog_action="stop")
    sched.start()
    sched.wait_done(timeout=30)  # without the watchdog this would never end
    assert sched.state is gr.State.STOPPED


class TestWatchdogErrorEscalation:
    """watchdog_action='error': a pump wedged in an unreturnable call (the
    collective-timeout scenario — a dead multihost peer leaves the survivor
    blocked in Gloo forever) must surface as FSM ERROR + a diagnosable
    GrError at the waiter, without unwinding the wedged thread."""

    def test_wedged_pump_escalates_to_error(self):
        import threading
        import gnuradio4_tpu as gr
        from gnuradio4_tpu.core.block import Port, SinkBlock
        from gnuradio4_tpu.core.errors import GrError
        from gnuradio4_tpu.core.lifecycle import State

        release = threading.Event()

        class WedgingSink(SinkBlock):
            IN = (Port("in", dtype="float32"),)

            def consume(self, arrays, tags, n_valid, abs_index):
                release.wait(timeout=30)   # simulates a hung collective

        g = gr.Graph()
        src = g.emplace("CountingSource", n_samples=1 << 16, dtype="float32")
        snk = g.add(WedgingSink())
        g.connect(src, snk)
        sched = gr.Scheduler(g, block_len=1024, pipeline_depth=1,
                             watchdog_timeout=0.3, watchdog_action="error")
        sched.start()
        try:
            import pytest
            with pytest.raises(GrError, match="no progress"):
                deadline = time.monotonic() + 20
                while time.monotonic() < deadline:
                    try:
                        sched.wait_done(timeout=0.5)
                        break
                    except TimeoutError:
                        continue
                else:
                    raise AssertionError("no escalation within 20s")
            assert sched.fsm.state is State.ERROR
            assert "stall" in sched.error.message or \
                   "no progress" in sched.error.message
        finally:
            release.set()
