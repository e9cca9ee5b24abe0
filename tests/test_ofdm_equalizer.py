"""OFDM pilot-based channel estimation/equalization: pilot insertion
geometry, flat-channel identity, multipath correction via frequency-domain
interpolation (in SIGNED frequency — the occupied map wraps across DC),
MMSE + symbol smoothing under noise, rate algebra of the pilot blocks."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource

QPSK = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4))) \
    .astype(np.complex64)
CHANNEL = np.array([1.0, 0.45 - 0.3j, 0.2j], np.complex64)


def _run(n_sym=40, *, taps=None, noise=0.0, mode="zf", smoothing=0.0,
         spacing=8, seed=0, block_syms=10):
    rng = np.random.default_rng(seed)
    nd = 48 - len(range(0, 48, spacing))
    didx = rng.integers(0, 4, n_sym * nd)
    d = QPSK[didx]
    g = gr.Graph()
    src = g.add(VectorSource(d))
    pi = g.emplace("OfdmPilotInserter", n_occupied=48, pilot_spacing=spacing)
    mod = g.emplace("OfdmModulator", fft_size=64, cp_len=16, n_occupied=48)
    dem = g.emplace("OfdmDemodulator", fft_size=64, cp_len=16, n_occupied=48)
    eq = g.emplace("OfdmChannelEqualizer", n_occupied=48,
                   pilot_spacing=spacing, mode=mode, noise_var=noise ** 2,
                   smoothing=smoothing)
    snk = g.add(VectorSink())
    tail = mod
    if taps is not None:
        chan = g.emplace("FirFilter", taps=np.asarray(taps, np.complex64))
        g.connect_chain(src, pi, mod, chan)
        tail = chan
    else:
        g.connect_chain(src, pi, mod)
    if noise:
        nz = g.emplace("NoiseSource", std=noise, noise="complex_gaussian",
                       n_samples=(n_sym + 8) * 80)
        add = g.emplace("Add")
        g.connect(tail, add, dst_port="in0")
        g.connect(nz, add, dst_port="in1")
        g.connect_chain(add, dem, eq, snk)
    else:
        g.connect_chain(tail, dem, eq, snk)
    gr.Scheduler(g, block_len=nd * block_syms,
                 sample_rate=1e6).run_and_wait()
    out = np.asarray(snk.data())
    n = min(len(out), len(d))
    dec = np.argmin(np.abs(out[:n, None] - QPSK[None, :]), axis=1)
    ser = float(np.mean(dec != didx[:n]))
    evm = float(np.sqrt(np.mean(np.abs(out[:n] - d[:n]) ** 2)))
    return ser, evm, out[:n], d[:n]


class TestPilotInserter:
    def test_geometry(self):
        pi = gr.Graph().emplace("OfdmPilotInserter", n_occupied=48,
                                pilot_spacing=8)
        assert pi.n_data == 42
        assert float(pi.ratio) == 48 / 42
        eq = gr.Graph().emplace("OfdmChannelEqualizer", n_occupied=48,
                                pilot_spacing=8)
        assert float(pi.ratio) * float(eq.ratio) == 1.0

    def test_pilot_values_alternate(self):
        import jax.numpy as jnp
        pi = gr.Graph().emplace("OfdmPilotInserter", n_occupied=48,
                                pilot_spacing=8)
        x = jnp.ones(42, jnp.complex64) * (0.5 + 0.5j)
        _, out = pi.apply(None, {"in": x}, None)
        o = np.asarray(out["out"])
        np.testing.assert_allclose(o[0], 1.0)          # pilot 0: +1
        np.testing.assert_allclose(o[8], -1.0)         # pilot 1: -1
        assert np.all(o[1:8] == 0.5 + 0.5j)            # data passthrough


class TestEqualizer:
    def test_flat_channel_identity(self):
        ser, evm, out, d = _run(taps=None)
        assert ser == 0.0
        np.testing.assert_allclose(out, d, atol=1e-4)

    def test_multipath_corrected(self):
        ser, evm, _, _ = _run(taps=CHANNEL)
        assert ser == 0.0
        assert evm < 0.25          # residual = linear-interp model error

    def test_denser_pilots_lower_evm(self):
        _, evm8, _, _ = _run(taps=CHANNEL, spacing=8)
        _, evm4, _, _ = _run(taps=CHANNEL, spacing=4)
        assert evm4 < evm8

    def test_mmse_with_smoothing_under_noise(self):
        ser, evm, _, _ = _run(taps=CHANNEL, noise=0.05, mode="mmse",
                              smoothing=0.7)
        assert ser == 0.0 and evm < 0.3

    def test_zf_under_noise(self):
        ser, _, _, _ = _run(taps=CHANNEL, noise=0.05)
        assert ser == 0.0

    def test_chunking_invariance(self):
        # the EMA channel state carries across scheduler steps
        _, _, a, _ = _run(taps=CHANNEL, smoothing=0.5, block_syms=20)
        _, _, b, _ = _run(taps=CHANNEL, smoothing=0.5, block_syms=5)
        np.testing.assert_allclose(a, b[:len(a)], atol=1e-5)
