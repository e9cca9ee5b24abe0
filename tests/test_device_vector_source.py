"""Device-resident VectorSource: the data plane stays on-device (one upload,
per-step dynamic_slice) while EOS/tags/repeat semantics match the host-feed
path bit-exactly (≈ the reference's mmap'd BasicFileSource playback,
blocks/fileio/BasicFileIo.hpp — data never round-trips the host per step)."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource
from gnuradio4_tpu.core.tags import Tag


def _run(src, block_len, **sched_kw):
    g = gr.Graph()
    g.add(src)
    snk = VectorSink()
    g.add(snk)
    g.connect(src, snk)
    gr.Scheduler(g, block_len=block_len, pipeline_depth=1,
                 **sched_kw).run_and_wait()
    return snk


@pytest.mark.parametrize("n,bl", [(1024, 256), (1000, 256), (100, 256),
                                  (777, 128)])
def test_bit_exact_vs_host_feed(rng, n, bl):
    data = rng.standard_normal(n).astype(np.float32)
    ref = _run(VectorSource(data), bl).data()
    out = _run(VectorSource(data, device_resident=True), bl).data()
    np.testing.assert_array_equal(out, ref)
    assert out.shape == (n,)


def test_complex_and_channels(rng):
    data = (rng.standard_normal((3, 500))
            + 1j * rng.standard_normal((3, 500))).astype(np.complex64)
    ref = _run(VectorSource(data), 128).data()
    out = _run(VectorSource(data, device_resident=True), 128).data()
    np.testing.assert_array_equal(out, ref)
    assert out.shape == (3, 500)


def test_tags_ride_identically(rng):
    data = rng.standard_normal(600).astype(np.float32)
    tags = [Tag(3, {"a": 1}), Tag(300, {"b": 2}), Tag(599, {"c": 3})]
    ref = _run(VectorSource(data, tags=tags), 128)
    out = _run(VectorSource(data, tags=tags, device_resident=True), 128)
    np.testing.assert_array_equal(out.data(), ref.data())
    assert [(int(t.index), dict(t.map)) for t in out.tags] \
        == [(int(t.index), dict(t.map)) for t in ref.tags]


def test_repeat_wraps_mid_block(rng):
    data = np.arange(10, dtype=np.float32)
    # repeat has no EOS — bound the run by steps
    g = gr.Graph()
    src = VectorSource(data, device_resident=True, repeat=True)
    snk = VectorSink()
    g.add(src)
    g.add(snk)
    g.connect(src, snk)
    sched = gr.Scheduler(g, block_len=64, pipeline_depth=1)
    sched.run_and_wait(n_steps=3)
    out = snk.data()
    np.testing.assert_array_equal(out, np.tile(data, 20)[: len(out)])
    assert len(out) == 192


def test_batched_steps(rng):
    data = rng.standard_normal(1024).astype(np.float32)
    ref = _run(VectorSource(data), 128).data()
    out = _run(VectorSource(data, device_resident=True), 128,
               batch_steps=4).data()
    np.testing.assert_array_equal(out, ref)


def test_sp_mesh_island(rng):
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    data = (rng.standard_normal(512)
            + 1j * rng.standard_normal(512)).astype(np.complex64)
    ref = _run(VectorSource(data, device_resident=True), 256).data()
    mesh = Mesh(np.asarray(devs[:4]), ("sp",))
    out = _run(VectorSource(data, device_resident=True), 256,
               mesh=mesh).data()
    np.testing.assert_array_equal(out, ref)
