"""Golden mirror of the reference's qa_Selector.cpp routing matrix
(blocks/basic/test/qa_Selector.cpp:139-300): 1:1 mapping, single-input
routing, one-for-all broadcast, monitor mirroring, dynamic select stream,
plus the synchronised fan-in interleave (Selector.hpp:60-66) expressed as
the dedicated Interleave block."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.basic import Deinterleave, Interleave, Selector
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource


def _run_selector(mapping, n_in=3, n_out=3, n=5, monitor=False,
                  selected_src=0, select_data=None):
    """Three constant sources 1/2/3 → Selector → sinks; returns sink data."""
    g = gr.Graph()
    sel = Selector(n_inputs=n_in, n_outputs=n_out,
                   map_in=tuple(i for i, _ in mapping),
                   map_out=tuple(o for _, o in mapping),
                   selected_src=selected_src)
    srcs = [VectorSource(np.full(n, float(i + 1), np.float32))
            for i in range(n_in)]
    for i, s in enumerate(srcs):
        g.connect(s, sel, dst_port=f"in{i}")
    sinks = [VectorSink() for _ in range(n_out)]
    for o, k in enumerate(sinks):
        g.connect(sel, k, src_port=f"out{o}")
    mon = VectorSink() if monitor else None
    if monitor:
        g.connect(sel, mon, src_port="monitor")
    if select_data is not None:
        ssel = VectorSource(np.asarray(select_data, np.uint32))
        g.connect(ssel, sel, dst_port="select")
    gr.Scheduler(g, block_len=n).run_and_wait()
    return [k.data() for k in sinks], (mon.data() if monitor else None)


class TestQaSelectorGolden:
    def test_one_to_one_mapping(self):
        # qa_Selector.cpp:139 — {0→0, 1→1, 2→2}
        outs, _ = _run_selector([(0, 0), (1, 1), (2, 2)])
        np.testing.assert_array_equal(outs[0], np.full(5, 1.0))
        np.testing.assert_array_equal(outs[1], np.full(5, 2.0))
        np.testing.assert_array_equal(outs[2], np.full(5, 3.0))

    def test_only_one_input_used(self):
        # qa_Selector.cpp:153 — {1→1}; unrouted outputs carry no signal
        outs, _ = _run_selector([(1, 1)])
        np.testing.assert_array_equal(outs[1], np.full(5, 2.0))
        # the reference leaves them empty; the fused-graph build emits zeros
        np.testing.assert_array_equal(outs[0], np.zeros(5))
        np.testing.assert_array_equal(outs[2], np.zeros(5))

    def test_one_for_all_broadcast(self):
        # qa_Selector.cpp:203 — {1→0, 1→1, 1→2}: input 1 on every output
        outs, _ = _run_selector([(1, 0), (1, 1), (1, 2)])
        for o in range(3):
            np.testing.assert_array_equal(outs[o], np.full(5, 2.0))

    def test_monitor_mirrors_selected_source(self):
        # qa_Selector.cpp:281 — monitor carries input 0's samples
        outs, mon = _run_selector([(0, 0), (1, 1), (2, 2)], monitor=True,
                                  selected_src=0)
        np.testing.assert_array_equal(mon, np.full(5, 1.0))
        _, mon2 = _run_selector([(0, 0), (1, 1), (2, 2)], monitor=True,
                                selected_src=2)
        np.testing.assert_array_equal(mon2, np.full(5, 3.0))

    def test_select_stream_overrides_setting(self):
        # Selector.hpp:149 — the last select sample of the step wins
        _, mon = _run_selector([(0, 0)], monitor=True, selected_src=0,
                               select_data=[0, 0, 0, 0, 1])
        np.testing.assert_array_equal(mon, np.full(5, 2.0))

    def test_select_index_clipped(self):
        _, mon = _run_selector([(0, 0)], monitor=True,
                               select_data=[9, 9, 9, 9, 9])
        np.testing.assert_array_equal(mon, np.full(5, 3.0))  # clamped to 2


class TestInterleaveGolden:
    def test_all_for_one_synchronised(self):
        # qa_Selector.cpp:185 "all for one synch_combined_ports = true":
        # constants 1/2/3 interleave to {1,2,3,1,2,3,...} (15 samples)
        g = gr.Graph()
        il = Interleave(n_inputs=3)
        for i in range(3):
            g.connect(VectorSource(np.full(5, float(i + 1), np.float32)), il,
                      dst_port=f"in{i}")
        snk = VectorSink()
        g.connect(il, snk)
        gr.Scheduler(g, block_len=5).run_and_wait()
        np.testing.assert_array_equal(
            snk.data(), np.tile([1.0, 2.0, 3.0], 5).astype(np.float32))

    def test_chunked_interleave(self):
        g = gr.Graph()
        il = Interleave(n_inputs=2, chunk_size=2)
        g.connect(VectorSource(np.arange(8, dtype=np.float32)), il,
                  dst_port="in0")
        g.connect(VectorSource(np.arange(8, dtype=np.float32) + 100), il,
                  dst_port="in1")
        snk = VectorSink()
        g.connect(il, snk)
        gr.Scheduler(g, block_len=8).run_and_wait()
        exp = []
        for j in range(0, 8, 2):
            exp += [j, j + 1, 100 + j, 101 + j]
        np.testing.assert_array_equal(snk.data(), np.asarray(exp, np.float32))

    def test_roundtrip_with_deinterleave(self):
        rng = np.random.default_rng(7)
        a = rng.standard_normal(64).astype(np.float32)
        b = rng.standard_normal(64).astype(np.float32)
        g = gr.Graph()
        il = Interleave(n_inputs=2)
        dl = Deinterleave(n_outputs=2)
        g.connect(VectorSource(a), il, dst_port="in0")
        g.connect(VectorSource(b), il, dst_port="in1")
        g.connect(il, dl)
        s0, s1 = VectorSink(), VectorSink()
        g.connect(dl, s0, src_port="out0")
        g.connect(dl, s1, src_port="out1")
        gr.Scheduler(g, block_len=32).run_and_wait()
        np.testing.assert_array_equal(s0.data(), a)
        np.testing.assert_array_equal(s1.data(), b)

    def test_rate_algebra_sees_ratio(self):
        il = Interleave(n_inputs=4)
        assert il.ratio == 4
        dl = Deinterleave(n_outputs=4)
        assert dl.ratio == pytest.approx(0.25)
        assert dl.alignment == 4
