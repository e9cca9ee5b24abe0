"""Graph model tests: connect/validate/toposort/rate algebra/flatten
(≈ reference qa_Graph, qa_DynamicPort, subgraph tests)."""

from fractions import Fraction

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.basic import SignalGenerator
from gnuradio4_tpu.blocks.filter import Decimator, FirFilter
from gnuradio4_tpu.blocks.math import Add, MultiplyConst
from gnuradio4_tpu.blocks.testing import NullSink, NullSource, VectorSink
from gnuradio4_tpu.core.errors import ConnectionError_, RateError


def test_connect_and_topo_order():
    g = gr.Graph()
    src = g.add(NullSource())
    mul = g.add(MultiplyConst(value=2.0))
    snk = g.add(NullSink())
    g.connect(src, mul)
    g.connect(mul, snk)
    order = g.topological_order()
    assert order == [src, mul, snk]
    assert g.source_blocks() == [src] and g.sink_blocks() == [snk]


def test_double_input_connection_rejected():
    g = gr.Graph()
    a, b = NullSource(), NullSource()
    snk = NullSink()
    g.connect(a, snk)
    with pytest.raises(ConnectionError_):
        g.connect(b, snk)


def test_unconnected_input_fails_validation():
    g = gr.Graph()
    g.add(MultiplyConst())
    with pytest.raises(ConnectionError_):
        g.validate()


def test_dtype_mismatch_rejected():
    from gnuradio4_tpu.blocks.basic import ComplexToReal
    g = gr.Graph()
    src = NullSource()  # float32 out by default
    c2r = ComplexToReal()  # complex64 in
    snk = NullSink()
    g.connect(src, c2r)  # port decl is polymorphic → checked at compile time
    g.connect(c2r, snk)
    with pytest.raises(gr.GrError):
        gr.compile_graph(g, block_len=256, jit=False)


def test_cycle_detection():
    g = gr.Graph()
    a = Add(n_inputs=2)
    m = MultiplyConst()
    src = NullSource()
    g.connect(src, a["in0"])
    g.connect(a, m)
    g.connect(m, a["in1"])  # feedback without Delay → cycle
    with pytest.raises(gr.GrError):
        g.topological_order()


def test_rate_algebra_decimation():
    g = gr.Graph()
    src = NullSource()
    d4 = Decimator(decim=4)
    snk = NullSink()
    g.connect_chain(src, d4, snk)
    in_len, out_len = g.resolve_rates(1000)
    assert in_len[d4.unique_name] % 4 == 0
    assert out_len[d4.unique_name] == in_len[d4.unique_name] // 4
    assert in_len[snk.unique_name] == out_len[d4.unique_name]


def test_rate_algebra_join_consistency():
    g = gr.Graph()
    src = NullSource()
    d2a = Decimator(decim=2)
    d2b = Decimator(decim=2)
    add = Add(n_inputs=2)
    snk = NullSink()
    g.connect(src, d2a)
    g.connect(src, d2b)
    g.connect(d2a, add["in0"])
    g.connect(d2b, add["in1"])
    g.connect(add, snk)
    in_len, out_len = g.resolve_rates(512)
    assert in_len[add.unique_name] == in_len[src.unique_name] // 2


def test_rate_algebra_inconsistent_join_raises():
    g = gr.Graph()
    src = NullSource()
    d2 = Decimator(decim=2)
    d4 = Decimator(decim=4)
    add = Add(n_inputs=2)
    g.connect(src, d2)
    g.connect(src, d4)
    g.connect(d2, add["in0"])
    g.connect(d4, add["in1"])
    with pytest.raises(RateError):
        g.resolve_rates(512)


def test_edge_sample_rate_propagation():
    g = gr.Graph()
    src = SignalGenerator(frequency=10.0)
    d4 = Decimator(decim=4)
    snk = NullSink()
    e1 = g.connect(src, d4)
    e2 = g.connect(d4, snk)
    g.resolve_rates(4096, sample_rate=48000.0)
    assert e1.sample_rate == 48000.0
    assert e2.sample_rate == 12000.0


def test_subgraph_flatten():
    inner = gr.Graph(name="inner")
    m1 = inner.add(MultiplyConst(value=2.0))
    m2 = inner.add(MultiplyConst(value=3.0))
    inner.connect(m1, m2)
    inner.export_in("in", m1, "in")
    inner.export_out("out", m2, "out")

    outer = gr.Graph()
    src = NullSource()
    snk = NullSink()
    outer.add(inner)
    outer.connect(src, inner["in"])
    outer.connect(inner["out"], snk)
    flat = outer.flatten()
    assert set(flat.blocks) == {src, m1, m2, snk}
    assert len(flat.edges) == 3
    assert flat.topological_order() == [src, m1, m2, snk]


def test_emplace_via_registry():
    g = gr.Graph()
    b = g.emplace("MultiplyConst", value=5.0)
    assert b.settings.get("value") == 5.0
    assert b in g.blocks


def test_deep_chain_100_blocks():
    """Compiler scales to long cascades (≈ reference 40-block bm_Scheduler
    cascades): 100 chained gains compile into one program and stay exact."""
    from gnuradio4_tpu.blocks.math import AddConst
    g = gr.Graph()
    src = g.emplace("CountingSource", n_samples=512)
    prev = src
    for i in range(100):
        b = g.add(AddConst(value=1.0))
        g.connect(prev, b)
        prev = b
    snk = g.emplace("VectorSink")
    g.connect(prev, snk)
    gr.Scheduler(g, block_len=256).run_and_wait()
    np.testing.assert_allclose(snk.data(), np.arange(512) + 100.0)


def test_wide_fanout_32_sinks():
    g = gr.Graph()
    src = g.emplace("CountingSource", n_samples=256)
    sinks = []
    for i in range(32):
        m = g.emplace("MultiplyConst", value=float(i))
        k = g.emplace("VectorSink")
        g.connect(src, m)
        g.connect(m, k)
        sinks.append((i, k))
    gr.Scheduler(g, block_len=256).run_and_wait()
    for i, k in sinks:
        np.testing.assert_allclose(k.data(), np.arange(256) * float(i))
