"""Convolutional FEC (blocks/fec.py): encoder + streaming Viterbi decoder —
beyond-reference addition (GR4 has no FEC; classic gr-fec capability)."""

import numpy as np
import pytest

import gnuradio4_tpu as gr

TB = 64


def _run_chain(bits, block_len=4096, corrupt=None, seed=9):
    g = gr.Graph()
    src = g.emplace("VectorSource")
    src.data = bits
    enc = g.emplace("ConvEncoder")
    k = g.emplace("VectorSink")
    g.connect_chain(src, enc, k)
    gr.Scheduler(g, block_len=block_len, sample_rate=1e6).run_and_wait()
    coded = np.asarray(k.data())[: 2 * len(bits)].astype(np.int32)
    if corrupt:
        rng = np.random.default_rng(seed)
        coded = (coded ^ (rng.random(len(coded)) < corrupt).astype(np.int32))
    g2 = gr.Graph()
    s2 = g2.emplace("VectorSource")
    s2.data = coded.astype(np.int32)
    d2 = g2.emplace("ViterbiDecoder", traceback=TB)
    k2 = g2.emplace("VectorSink")
    g2.connect_chain(s2, d2, k2)
    gr.Scheduler(g2, block_len=block_len, sample_rate=1e6).run_and_wait()
    return np.asarray(k2.data())


def test_clean_channel_exact():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 32768).astype(np.int32)
    y = _run_chain(bits)
    np.testing.assert_array_equal(y[TB:32768], bits[: 32768 - TB])


def test_corrects_5pct_channel_errors():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 32768).astype(np.int32)
    y = _run_chain(bits, corrupt=0.05)
    residual = np.mean(y[TB:32768] != bits[: 32768 - TB])
    assert residual < 0.01, residual        # ~19x error reduction measured


def test_block_size_invariance():
    """State (metrics + traceback tail) must carry seamlessly across steps."""
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 8192).astype(np.int32)
    ya = _run_chain(bits, block_len=4096)
    yb = _run_chain(bits, block_len=256)
    np.testing.assert_array_equal(ya[:8192], yb[:8192])


def test_scrambler_descrambler_self_sync():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 16384).astype(np.int32)
    g = gr.Graph()
    src = g.emplace("VectorSource")
    src.data = bits
    sc = g.emplace("Scrambler")
    de = g.emplace("Descrambler", seed=0x15)   # wrong seed: must self-sync
    snk = g.emplace("VectorSink")
    g.connect_chain(src, sc, de, snk)
    gr.Scheduler(g, block_len=2048, sample_rate=1e6).run_and_wait()
    y = np.asarray(snk.data())[:16384]
    np.testing.assert_array_equal(y[7:], bits[7:])   # length-bit transient


def test_scrambler_whitens():
    g = gr.Graph()
    src = g.emplace("VectorSource")
    src.data = np.zeros(8192, np.int32)
    sc = g.emplace("Scrambler")
    snk = g.emplace("VectorSink")
    g.connect_chain(src, sc, snk)
    gr.Scheduler(g, block_len=2048, sample_rate=1e6).run_and_wait()
    frac = float(np.mean(np.asarray(snk.data())[:8192]))
    assert 0.45 < frac < 0.55


def test_soft_decision_beats_hard():
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 2, 16384).astype(np.int32)
    coded = _run_chain(msg, block_len=4096)  # reuse: encode via chain? no —
    # encode directly:
    g = gr.Graph()
    s = g.emplace("VectorSource")
    s.data = msg
    e = g.emplace("ConvEncoder")
    k = g.emplace("VectorSink")
    g.connect_chain(s, e, k)
    gr.Scheduler(g, block_len=4096, sample_rate=1e6).run_and_wait()
    coded = np.asarray(k.data())[: 2 * len(msg)].astype(np.float64)
    noisy = coded + rng.normal(0, 0.45, len(coded))
    soft = np.clip(noisy, 0.0, 1.0).astype(np.float32)
    hard = (noisy > 0.5).astype(np.int32)

    def dec(x, **kw):
        g3 = gr.Graph()
        s3 = g3.emplace("VectorSource")
        s3.data = x
        d3 = g3.emplace("ViterbiDecoder", traceback=64, **kw)
        k3 = g3.emplace("VectorSink")
        g3.connect_chain(s3, d3, k3)
        gr.Scheduler(g3, block_len=4096, sample_rate=1e6).run_and_wait()
        return np.asarray(k3.data())

    beh = np.mean(dec(hard)[TB:16384] != msg[: 16384 - TB])
    bes = np.mean(dec(soft, soft=True)[TB:16384] != msg[: 16384 - TB])
    assert bes < beh * 0.5, (bes, beh)   # soft gain must be substantial
