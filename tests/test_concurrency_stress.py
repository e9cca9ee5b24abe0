"""Host-side concurrency stress (SURVEY §2.1 atomics/rwlock row).

The native ring's atomics are TSAN-stressed (native/); the PYTHON side's
cross-thread shared state is guarded by the GIL + the scheduler's step_lock
and the bounded delivery queue. This test exercises the real interleavings
at once — pump thread, async delivery worker, message plane, settings
mutation, lifecycle control, checkpoint snapshotting — and asserts the
stream stays lossless and the run ends clean. A torn read/write or a racing
graph mutation shows up as a wrong sample count, a deadlock (timeout), or
an exception on a worker thread.
"""

import threading
import time

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.core.messages import Command, Property


@pytest.mark.parametrize("batch", [1, 4])
def test_pump_vs_messages_vs_checkpoint(batch, tmp_path):
    n_total = 1 << 18
    g = gr.Graph()
    src = g.emplace("CountingSource", n_samples=n_total, dtype="float32")
    mul = g.emplace("MultiplyConst", value=2.0)
    add = g.emplace("AddConst", value=0.0)
    snk = g.emplace("VectorSink")
    g.connect_chain(src, mul, add, snk)
    sched = gr.Scheduler(g, block_len=4096, pipeline_depth=2,
                         async_delivery=True, batch_steps=batch,
                         watchdog_timeout=60.0)
    sched.start()

    stop = threading.Event()
    errors: list = []

    def hammer_messages():
        k = 0
        while not stop.is_set():
            try:
                sched.bus.send_command(Command.Set, service=mul.name,
                                       endpoint=Property.SETTING,
                                       data={"value": 2.0})
                sched.bus.send_command(Command.Get, service=sched.name,
                                       endpoint=Property.INSPECT_GRAPH)
                sched.bus.send_command(Command.Get, service=add.name,
                                       endpoint=Property.SETTING)
                k += 1
            except Exception as e:   # pragma: no cover
                errors.append(("messages", e))
                return
            time.sleep(0.001)

    def hammer_checkpoint(tmpdir):
        from gnuradio4_tpu.core.checkpoint import save_checkpoint
        k = 0
        while not stop.is_set():
            try:
                save_checkpoint(sched, f"{tmpdir}/ckpt_{k % 2}.npz")
                k += 1
            except Exception as e:   # pragma: no cover
                errors.append(("checkpoint", e))
                return
            time.sleep(0.005)

    threads = [threading.Thread(target=hammer_messages, daemon=True),
               threading.Thread(target=hammer_checkpoint, args=(str(tmp_path),),
                                daemon=True)]
    for t in threads:
        t.start()
    try:
        sched.wait_done(120)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=5)
    assert not errors, errors
    y = np.asarray(snk.data())
    # lossless: every sample delivered exactly once, in order, with the
    # (only-ever-2.0) multiplier applied
    assert y.shape[-1] == n_total
    np.testing.assert_array_equal(y, 2.0 * np.arange(n_total,
                                                     dtype=np.float32))


def test_pause_resume_stop_under_load():
    g = gr.Graph()
    src = g.emplace("ConstantSource", value=1.0)
    head = g.emplace("HeadBlock", n_samples=1 << 20)
    snk = g.emplace("VectorSink")
    g.connect_chain(src, head, snk)
    sched = gr.Scheduler(g, block_len=8192, pipeline_depth=2,
                         async_delivery=True, batch_steps=2)
    sched.start()
    time.sleep(0.05)
    from gnuradio4_tpu.core.lifecycle import State
    for _ in range(3):
        if sched.state is not State.RUNNING:
            break               # short stream already wound down
        sched.request_pause()
        for _w in range(200):       # the pump acknowledges at a step boundary
            if sched.state is State.PAUSED or sched.state is State.STOPPED:
                break
            time.sleep(0.005)
        if sched.state is State.PAUSED:
            sched.resume()
        time.sleep(0.02)
    sched.request_stop()
    sched.wait_done(60)
    # no duplication/loss up to wherever the stream stopped
    y = np.asarray(snk.data())
    assert y.shape[-1] <= 1 << 20
    assert np.all(y == 1.0)
