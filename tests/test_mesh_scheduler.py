"""Mesh-aware scheduler path: GSPMD sharding constraints on multi-channel
streams (config-5 shape: channelizer + per-channel demod under Scheduler with a
Mesh), verified equal to the unsharded run."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.channelizer import PFBChannelizer
from gnuradio4_tpu.blocks.sdr import QuadratureDemod
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource


@pytest.fixture(scope="module")
def chan_mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    return Mesh(np.asarray(devs[:8]), ("chan",))


def _build(iq):
    g = gr.Graph()
    src = VectorSource(iq)
    chan = PFBChannelizer(n_channels=64, taps_per_phase=4)
    dem = QuadratureDemod(gain=1.0)
    snk = VectorSink()
    g.connect_chain(src, chan, dem, snk)
    return g, snk


def test_mesh_run_matches_unsharded(chan_mesh):
    rng = np.random.default_rng(5)
    n = 64 * 512
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
          ).astype(np.complex64)

    g1, snk1 = _build(iq)
    gr.Scheduler(g1, block_len=n // 2).run_and_wait()
    ref = snk1.data()

    g2, snk2 = _build(iq)
    gr.Scheduler(g2, block_len=n // 2, mesh=chan_mesh).run_and_wait()
    out = snk2.data()

    assert out.shape == ref.shape == (64, 512)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_mesh_sharding_constraint_present(chan_mesh):
    """The compiled program actually carries the sharding constraint."""
    iq = np.zeros(64 * 128, np.complex64)
    g, _ = _build(iq)
    compiled = gr.compile_graph(g, block_len=64 * 128, mesh=chan_mesh, jit=False)
    import jax.numpy as jnp
    lowered = jax.jit(compiled.step_fn).lower(
        compiled.init_states(), compiled.gather_params(),
        {b.unique_name: {p.name: jnp.zeros((64 * 128,), jnp.complex64)
                         for p in b.out_ports}
         for b in compiled.fed_blocks})
    txt = lowered.as_text()
    assert "sharding" in txt  # GSPMD annotations present in the HLO
