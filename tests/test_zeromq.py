"""ZeroMQ transports (gr-zeromq equivalents): PUSH→PULL pipe between two
concurrently running flowgraphs, PUB→SUB fan-out to multiple subscribers,
dtype fidelity, carry-over of partial messages, bounded live sources."""

import threading
import time

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource

pytest.importorskip("zmq")

_PORT = [52180]


def _addr():
    _PORT[0] += 1
    return f"tcp://127.0.0.1:{_PORT[0]}"


def _start_rx(graph, src_block, block_len=4096):
    """Run the receive graph on a thread and wait until its ZMQ socket is
    actually open (sources connect lazily on the first pump, which sits
    behind jit compilation — publishing before that loses messages)."""
    sch = gr.Scheduler(graph, block_len=block_len, sample_rate=1e6)
    t = threading.Thread(target=sch.run_and_wait)
    t.start()
    deadline = time.monotonic() + 60.0
    while src_block._sock is None and time.monotonic() < deadline:
        time.sleep(0.02)
    assert src_block._sock is not None, "rx socket never opened"
    time.sleep(0.3)            # let the TCP/SUB handshake settle
    return sch, t


def _finish(sch, t):
    t.join(timeout=60)
    if t.is_alive():
        sch.request_stop()
        t.join(timeout=30)
        raise AssertionError("rx did not finish")


class TestPushPull:
    @pytest.mark.parametrize("dtype", ["float32", "complex64"])
    def test_pipe_exact(self, dtype):
        addr = _addr()
        data = (np.arange(20000) * (1 + 1j if dtype == "complex64" else 1)
                ).astype(dtype)
        gtx = gr.Graph()
        s = gtx.add(VectorSource(data))
        gtx.connect(s, gtx.emplace("ZmqPushSink", address=addr, bind=True))
        grx = gr.Graph()
        pull = grx.emplace("ZmqPullSource", address=addr, bind=False,
                           dtype=dtype, n_samples=len(data))
        v = grx.add(VectorSink())
        grx.connect(pull, v)
        sch, t = _start_rx(grx, pull)
        try:
            gr.Scheduler(gtx, block_len=4096,
                         sample_rate=1e6).run_and_wait()
        finally:
            _finish(sch, t)
        np.testing.assert_array_equal(np.asarray(v.data())[:len(data)],
                                      data)

    def test_odd_message_sizes_carry(self):
        # sender chunks don't align to the receiver's block size: the
        # carry buffer must reassemble the byte stream exactly
        addr = _addr()
        data = np.arange(9999, dtype=np.float32)
        gtx = gr.Graph()
        s = gtx.add(VectorSource(data))
        gtx.connect(s, gtx.emplace("ZmqPushSink", address=addr, bind=True))
        grx = gr.Graph()
        pull = grx.emplace("ZmqPullSource", address=addr, bind=False,
                           n_samples=len(data))
        v = grx.add(VectorSink())
        grx.connect(pull, v)
        sch, t = _start_rx(grx, pull, block_len=1024)
        try:
            gr.Scheduler(gtx, block_len=777,
                         sample_rate=1e6).run_and_wait()
        finally:
            _finish(sch, t)
        np.testing.assert_array_equal(np.asarray(v.data())[:len(data)],
                                      data)


class TestPubSub:
    def test_fanout_two_subscribers(self):
        addr = _addr()
        data = np.arange(16384, dtype=np.float32)
        # bind the PUB socket FIRST (start() is idempotent — the scheduler's
        # later lifecycle start reuses it): subscribers then connect to a
        # live endpoint and their subscriptions settle before any message
        # is published, avoiding ZMQ's slow-joiner loss
        gtx = gr.Graph()
        s = gtx.add(VectorSource(data))
        pub = gtx.emplace("ZmqPubSink", address=addr, bind=True)
        gtx.connect(s, pub)
        pub.start()
        rigs = []
        for _ in range(2):
            g = gr.Graph()
            src = g.emplace("ZmqSubSource", address=addr, bind=False,
                            n_samples=len(data))
            v = g.add(VectorSink())
            g.connect(src, v)
            rigs.append((g, src, v))
        started = [_start_rx(g, src) for g, src, _ in rigs]
        try:
            gr.Scheduler(gtx, block_len=2048,
                         sample_rate=1e6).run_and_wait()
        finally:
            for sch, t in started:
                _finish(sch, t)
        for _, _, v in rigs:
            np.testing.assert_array_equal(np.asarray(v.data())[:len(data)],
                                          data)
