"""Squelch blocks (blocks/squelch.py) + DiffPhasor: gate correctness on
burst/CW stimulus, dynamic-threshold updates, CTCSS tone discrimination,
and chunking invariance through the real Scheduler."""

import numpy as np
import pytest

import gnuradio4_tpu as gr

FS = 48000.0


def _run(graph, block_len=4096, fs=FS):
    gr.Scheduler(graph, block_len=block_len, sample_rate=fs).run_and_wait()


def _chain(data, block_type, block_len=4096, fs=FS, **settings):
    g = gr.Graph()
    src = g.emplace("VectorSource")
    src.data = np.asarray(data)
    blk = g.emplace(block_type, **settings)
    snk = g.emplace("VectorSink")
    g.connect_chain(src, blk, snk)
    _run(g, block_len=block_len, fs=fs)
    return np.asarray(snk.data())[: len(data)]


class TestPowerSquelch:
    def _burst(self, n=16384, lo=1e-4, hi=0.5):
        t = np.arange(n)
        x = np.exp(2j * np.pi * 0.01 * t).astype(np.complex64)
        amp = np.full(n, lo, np.float32)
        amp[4096:8192] = hi
        amp[12288:] = hi
        return (x * amp).astype(np.complex64), amp

    def test_mutes_noise_passes_bursts(self):
        x, amp = self._burst()
        y = _chain(x, "PowerSquelch", threshold_db=-20.0, alpha=0.01)
        # steady-state regions (skip attack transients of ~5/alpha samples)
        settle = 600
        assert np.all(np.abs(y[:4096 - settle]) == 0)          # quiet: muted
        assert np.all(np.abs(y[4096 + settle:8192]) > 0.4)     # burst: open
        assert np.all(np.abs(y[8192 + settle:12288]) == 0)     # quiet again
        assert np.all(np.abs(y[12288 + settle:]) > 0.4)

    def test_invert_flips_gate(self):
        x, _ = self._burst()
        y = _chain(x, "PowerSquelch", threshold_db=-20.0, alpha=0.01,
                   invert=True)
        settle = 600
        assert np.all(np.abs(y[4096 + settle:8192]) == 0)
        assert np.all(np.abs(y[:4096 - settle]) > 0)

    def test_chunking_invariance(self):
        x, _ = self._burst()
        y1 = _chain(x, "PowerSquelch", threshold_db=-20.0, alpha=0.01,
                    block_len=4096)
        y2 = _chain(x, "PowerSquelch", threshold_db=-20.0, alpha=0.01,
                    block_len=1536)
        np.testing.assert_allclose(y1, y2, atol=1e-6)

    def test_threshold_is_dynamic_no_recompile(self):
        # change threshold mid-run via the message plane: second half opens
        x = (0.05 * np.exp(2j * np.pi * 0.01 * np.arange(32768))
             ).astype(np.complex64)
        g = gr.Graph()
        src = g.emplace("VectorSource")
        src.data = x
        sq = g.emplace("PowerSquelch", threshold_db=-10.0, alpha=0.01)
        snk = g.emplace("VectorSink")
        g.connect_chain(src, sq, snk)
        sched = gr.Scheduler(g, block_len=4096, sample_rate=FS)
        sched.start()
        import time
        deadline = time.time() + 10.0
        opened = False
        while time.time() < deadline:
            sq.settings.set({"threshold_db": -40.0})
            time.sleep(0.01)
            if len(snk.data()) and np.abs(np.asarray(snk.data())).max() > 0:
                opened = True
                break
        sched.request_stop()
        sched.wait_done(timeout=30.0)
        y = np.asarray(snk.data())
        # -10 dB threshold mutes the 0.05-amplitude tone (-26 dB); after the
        # live set() to -40 dB the gate must open mid-stream
        assert opened or np.abs(y[-1024:]).max() > 0


class TestCtcssSquelch:
    def _audio(self, tone_hz, n=16384, tone_amp=0.15):
        t = np.arange(n) / FS
        voice = 0.3 * np.sin(2 * np.pi * 1100.0 * t)
        return (voice + tone_amp * np.sin(2 * np.pi * tone_hz * t)
                ).astype(np.float32)

    def test_passes_matching_tone(self):
        x = self._audio(88.5)
        y = _chain(x, "CtcssSquelch", frequency=88.5, level=0.05)
        assert np.abs(y).max() > 0.2

    def test_mutes_missing_and_wrong_tone(self):
        x0 = self._audio(88.5, tone_amp=0.0)
        assert np.all(_chain(x0, "CtcssSquelch", frequency=88.5,
                             level=0.05) == 0)
        x1 = self._audio(151.4)                  # different CTCSS code
        assert np.all(_chain(x1, "CtcssSquelch", frequency=88.5,
                             level=0.05) == 0)

    def test_gate_is_chunk_granular(self):
        n = 16384
        x = self._audio(88.5, n=n)
        x[: n // 2] = self._audio(88.5, n=n // 2, tone_amp=0.0)  # no tone
        y = _chain(x, "CtcssSquelch", frequency=88.5, level=0.05,
                   chunk=2048)
        assert np.all(y[: n // 2] == 0)
        assert np.abs(y[n // 2:]).max() > 0.2


class TestDiffPhasor:
    def test_matches_numpy_and_chunking_invariant(self):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(8192)
             + 1j * rng.standard_normal(8192)).astype(np.complex64)
        want = x * np.conj(np.concatenate([[1.0 + 0j], x[:-1]]))
        for bl in (4096, 1280):
            y = _chain(x, "DiffPhasor", block_len=bl)
            np.testing.assert_allclose(y, want.astype(np.complex64),
                                       atol=1e-5)

    def test_dqpsk_identity(self):
        # DiffEncoder-style phase ramp: diff phasor recovers the increments
        incs = np.pi / 2 * np.array([0, 1, 2, 3, 1, 0, 2] * 100)
        ph = np.cumsum(incs)
        x = np.exp(1j * ph).astype(np.complex64)
        y = _chain(x, "DiffPhasor")
        got = np.angle(y[1:]) % (2 * np.pi)
        np.testing.assert_allclose(got, incs[1:] % (2 * np.pi), atol=1e-4)
