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
    n = 8192
    block = 512
    data = np.arange(n, dtype=np.float32)
    g = gr.Graph()
    src = VectorSource(data)
    sub = ScheduledSubgraph(_inner_chain(), name="sub", latency_steps=3)
    snk = VectorSink()
    g.connect(src, sub)
    g.connect(sub, snk)
    sched = gr.Scheduler(g, block_len=block)
    sched.run_and_wait()
    out = snk.data()
    # the bridge primes `latency_steps` zero-blocks, then the processed stream
    lat = 3 * block
    assert out.shape[0] >= lat + block
    np.testing.assert_allclose(out[:lat], 0.0)
    settled = out[lat:]
    ref = data[: len(settled)] * 3.0 + 1.0
    np.testing.assert_allclose(settled, ref)


def test_subgraph_requires_exports():
    with pytest.raises(gr.GrError):
        ScheduledSubgraph(gr.Graph())
