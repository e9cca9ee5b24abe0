"""Multi-chip sharding tests on the 8-device virtual CPU mesh: halo exchange,
time-sharded FIR equivalence, and the full sharded wideband receiver step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnuradio4_tpu.ops.fir import fir_apply, fir_init_state
from gnuradio4_tpu.parallel.halo import fir_timeshard, halo_left
from gnuradio4_tpu.parallel.mesh import make_mesh
from gnuradio4_tpu.parallel.sharded_rx import ShardedRxConfig, build_sharded_rx


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def test_halo_left_moves_neighbor_tail(devices):
    mesh = Mesh(np.asarray(devices[:4]), ("sp",))
    x = jnp.arange(16.0)

    def f(xl, edge):
        return halo_left(xl, 2, "sp", edge)

    out = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=(P("sp"), P()),
                                out_specs=P("sp"), check_vma=False))(
        x, jnp.asarray([-2.0, -1.0]))
    out = np.asarray(out).reshape(4, 2)
    # shard 0 gets the edge state; shard i gets last 2 of shard i-1
    np.testing.assert_array_equal(out[0], [-2, -1])
    np.testing.assert_array_equal(out[1], [2, 3])
    np.testing.assert_array_equal(out[3], [10, 11])


def test_fir_timeshard_equals_single_device(devices):
    mesh = Mesh(np.asarray(devices[:8]), ("sp",))
    rng = np.random.default_rng(7)
    taps = rng.standard_normal(17).astype(np.float32)
    x = rng.standard_normal(1024).astype(np.float32)

    # single-device reference (framework overlap-save kernel)
    y_ref, _ = fir_apply(jnp.asarray(x), jnp.asarray(taps),
                         fir_init_state(0, 17, jnp.float32))

    def f(xl, edge):
        y, tail = fir_timeshard(xl, jnp.asarray(taps), "sp", edge)
        return y, tail

    y, tail = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P("sp"), P()), out_specs=(P("sp"), P()),
        check_vma=False))(jnp.asarray(x), jnp.zeros(16, jnp.float32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tail), x[-16:], atol=0)


def test_fir_timeshard_streaming_continuity(devices):
    """Two sharded steps == one long single-device run (edge state carry)."""
    mesh = Mesh(np.asarray(devices[:4]), ("sp",))
    rng = np.random.default_rng(3)
    taps = rng.standard_normal(9).astype(np.float32)
    x = rng.standard_normal(512).astype(np.float32)
    y_ref, _ = fir_apply(jnp.asarray(x), jnp.asarray(taps),
                         fir_init_state(0, 9, jnp.float32))

    def f(xl, edge):
        return fir_timeshard(xl, jnp.asarray(taps), "sp", edge)

    step = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=(P("sp"), P()),
                                 out_specs=(P("sp"), P()), check_vma=False))
    edge = jnp.zeros(8, jnp.float32)
    outs = []
    for half in x.reshape(2, 256):
        y, edge = step(jnp.asarray(half), edge)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(y_ref), atol=1e-4)


def test_sharded_rx_step_runs_and_channelizes(devices):
    mesh = make_mesh(shape=(2, 4), axes=("dp", "sp"), devices=devices[:8])
    cfg = ShardedRxConfig(n_channels=16, taps_per_phase=4, audio_decim=2,
                          audio_ntaps=16, batch=2, block_len=4096)
    step, init_state, x_sharding = build_sharded_rx(mesh, cfg)
    # FM-ish stimulus: each stream a tone offset inside channel 3
    t = np.arange(cfg.block_len)
    x = np.stack([np.exp(2j * np.pi * (3.0 / 16.0 + 0.001) * t),
                  np.exp(2j * np.pi * (5.0 / 16.0) * t)]).astype(np.complex64)
    xd = jax.device_put(jnp.asarray(x), x_sharding)
    state = init_state()
    state, audio, power = step(state, xd)
    audio = np.asarray(audio)
    assert audio.shape == (2, 16, cfg.block_len // 16 // cfg.audio_decim)
    assert np.isfinite(audio).all()
    assert float(power) > 0.0
    # stream 0: constant-offset tone in channel 3 → demod ≈ constant 2π·0.001·16
    steady = audio[0, 3, 32:]
    expected = 2 * np.pi * 0.001 * 16
    np.testing.assert_allclose(steady.mean(), expected, rtol=0.2)
    # stream 0 channel 5 ≈ silent after its own demod (no signal → noise only)
    # stream 1 has its tone exactly at channel-5 center → demod ≈ 0
    np.testing.assert_allclose(audio[1, 5, 32:].mean(), 0.0, atol=1e-3)


def test_sharded_rx_second_step_continuity(devices):
    """State carries across steps: a continuous tone stays continuous."""
    mesh = make_mesh(shape=(1, 8), axes=("dp", "sp"), devices=devices[:8])
    cfg = ShardedRxConfig(n_channels=8, taps_per_phase=4, audio_decim=1,
                          audio_ntaps=8, batch=1, block_len=4096)
    step, init_state, x_sharding = build_sharded_rx(mesh, cfg)
    t = np.arange(2 * cfg.block_len)
    x = np.exp(2j * np.pi * (2.0 / 8.0 + 0.002) * t).astype(np.complex64)[None]
    state = init_state()
    outs = []
    for half in (x[:, :cfg.block_len], x[:, cfg.block_len:]):
        state, audio, _ = step(state, jax.device_put(jnp.asarray(half), x_sharding))
        outs.append(np.asarray(audio))
    both = np.concatenate(outs, axis=-1)[0, 2]
    expected = 2 * np.pi * 0.002 * 8
    # after initial transient the demodulated offset is constant ACROSS the
    # step boundary (no glitch at the seam)
    seam = both[cfg.block_len // 8 - 16: cfg.block_len // 8 + 16]
    np.testing.assert_allclose(seam, expected, rtol=0.05)
