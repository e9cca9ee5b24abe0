"""ScheduledSubgraph: inner graph under its own scheduler thread, ring-bridged
(≈ reference managed subgraph tests)."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.core.subgraph import ScheduledSubgraph
from gnuradio4_tpu.blocks.math import MultiplyConst, AddConst
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource


def _inner_chain():
    inner = gr.Graph(name="inner")
    m = inner.add(MultiplyConst(value=3.0, name="m"))
    a = inner.add(AddConst(value=1.0, name="a"))
    inner.connect(m, a)
    inner.export_in("in", m, "in")
    inner.export_out("out", a, "out")
    return inner


def test_scheduled_subgraph_processes_stream():
    """Counted latency: no fabricated samples — the consumer's FIRST valid
    sample equals the producer's first sample (warm-up steps carry
    n_valid=0 and are skipped by the sink)."""
    n = 8192
    block = 512
    data = np.arange(n, dtype=np.float32)
    g = gr.Graph()
    src = VectorSource(data)
    sub = ScheduledSubgraph(_inner_chain(), name="sub")
    snk = VectorSink()
    g.connect(src, sub)
    g.connect(sub, snk)
    sched = gr.Scheduler(g, block_len=block)
    sched.run_and_wait()
    out = snk.data()
    ref = data * 3.0 + 1.0
    assert out.shape[0] == n              # lossless: EOS drains the bridge
    assert out[0] == ref[0]               # first sample IS the producer's first
    np.testing.assert_allclose(out, ref)


def test_subgraph_requires_exports():
    with pytest.raises(gr.GrError):
        ScheduledSubgraph(gr.Graph())


def test_bridge_drains_unequal_tails_at_eos():
    """EOS wind-down with UNEQUAL leftovers across output rings (one port
    holds trailing frames, the other is already drained): the bridge must
    serve the longest tail (shorter ports zero-pad inside the valid window)
    and then report EOS — not starve until timeout and lose the data."""
    import types
    from gnuradio4_tpu.native.ring import HostRing
    from gnuradio4_tpu.core.lifecycle import State

    sub = ScheduledSubgraph(_inner_chain(), name="sub")
    ra, rb = HostRing(64, np.float32), HostRing(64, np.float32)
    sub._out_rings = {"a": ra, "b": rb}
    sub._out_readers = {"a": ra.add_reader(), "b": rb.add_reader()}
    sub._inner_sched = types.SimpleNamespace(state=State.RUNNING, error=None)
    ra.write(np.arange(4, dtype=np.float32))
    ra.set_eos()
    rb.set_eos()            # drained + EOS while `a` still holds 4 samples

    got = sub.host_feed(8, 0)
    assert got is not None, "bridge starved instead of serving the tail"
    out, nv = got
    assert nv == 4
    np.testing.assert_array_equal(out["a"][:4], np.arange(4, dtype=np.float32))
    np.testing.assert_array_equal(out["b"], np.zeros(8, np.float32))
    assert sub.host_feed(8, 4) is None   # fully drained → clean EOS
