"""Block-length invariance: the streaming contract.

A flowgraph's output must depend only on the input STREAM, never on how the
scheduler chunks it into steps (the reference guarantees this through carried
HistoryBuffer state across arbitrary work() sizes, core HistoryBuffer.hpp:68,
Block.hpp:1611 computeResampling; here through carried scan state across
jitted steps). Property: same stimulus, different ``block_len`` → bit-near
identical sink data, for random chains of stateful blocks.
"""

import numpy as np
import pytest

import gnuradio4_tpu as gr


def _run(build, n, block_len):
    g, snk = build()
    gr.Scheduler(g, block_len=block_len, sample_rate=48000.0,
                 pipeline_depth=1).run_and_wait()
    return snk.data()[:n]


class TestBlockLenInvariance:
    # stateful, rate-1 blocks (carried FIR tails, IIR state, NCO phase,
    # running averages) — exactly the state that must survive step seams
    POOL = (
        lambda g: g.emplace("FirFilter",
                            taps=tuple((np.hamming(33) / 17).tolist())),
        lambda g: g.emplace("IirFilter", b=(0.2, 0.2), a=(1.0, -0.6)),
        lambda g: g.emplace("MovingAverage", length=25),
        lambda g: g.emplace("MultiplyConst", value=1.3),
        lambda g: g.emplace("FmDeemphasis", tau=75e-6,
                            sample_rate_in=48000.0),
    )

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_random_stateful_chain(self, seed):
        rng = np.random.default_rng(100 + seed)
        n = 1 << 15
        data = rng.standard_normal(n).astype(np.float32)
        picks = [int(rng.integers(0, len(self.POOL)))
                 for _ in range(int(rng.integers(2, 5)))]

        def build():
            g = gr.Graph()
            src = g.emplace("VectorSource", data=data)
            prev = src
            for p in picks:
                blk = self.POOL[p](g)
                g.connect(prev, blk)
                prev = blk
            snk = g.emplace("VectorSink")
            g.connect(prev, snk)
            return g, snk

        y_small = _run(build, n, 1 << 11)
        y_big = _run(build, n, 1 << 14)
        assert y_small.shape == y_big.shape
        np.testing.assert_allclose(y_small, y_big, atol=2e-6,
                                   err_msg=f"picks={picks}")

    def test_complex_rx_chain(self):
        """Rotator → FreqXlatingFir(decim) → QuadratureDemod: NCO phase, FIR
        history, and the demod's previous-sample state all cross step seams."""
        rng = np.random.default_rng(7)
        n = 1 << 15
        data = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
                ).astype(np.complex64)

        def build():
            g = gr.Graph()
            src = g.emplace("VectorSource", data=data)
            rot = g.emplace("Rotator", frequency_shift=1234.5,
                            sample_rate=48000.0)
            fir = g.emplace("FreqXlatingFir",
                            taps=(np.hamming(31) / 16).astype(np.float32),
                            center_freq=6000.0, sample_rate_in=48000.0,
                            decim=4)
            dem = g.emplace("QuadratureDemod", gain=1.0)
            snk = g.emplace("VectorSink")
            g.connect_chain(src, rot, fir, dem, snk)
            return g, snk

        y_small = _run(build, n // 4, 1 << 11)
        y_big = _run(build, n // 4, 1 << 14)
        np.testing.assert_allclose(y_small, y_big, atol=3e-5)

    @pytest.mark.parametrize("interp,decim", [(3, 2), (2, 3)])
    def test_rational_resampler(self, interp, decim):
        """Polyphase resampler phase continuity across different step sizes."""
        rng = np.random.default_rng(interp * 10 + decim)
        n = 3 * 2 * (1 << 13)
        data = rng.standard_normal(n).astype(np.float32)

        def build():
            g = gr.Graph()
            src = g.emplace("VectorSource", data=data)
            rr = g.emplace("RationalResampler", interp=interp, decim=decim)
            snk = g.emplace("VectorSink")
            g.connect_chain(src, rr, snk)
            return g, snk

        n_out = n * interp // decim
        y_small = _run(build, n_out, 1 << 11)
        y_big = _run(build, n_out, 1 << 13)
        np.testing.assert_allclose(y_small, y_big, atol=2e-6)
