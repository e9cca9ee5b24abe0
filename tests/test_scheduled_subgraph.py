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
