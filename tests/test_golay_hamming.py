"""Extended Golay (24,12,8) and Hamming (2^m−1) codecs (blocks/fec.py) —
code-structure proofs by full enumeration, exhaustive bounded-distance
correction, and host-function == device-block equality through the real
Scheduler."""

from itertools import combinations

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.fec import (_GOLAY_B, _GOLAY_G, _GOLAY_H,
                                      golay_decode, golay_encode,
                                      hamming_decode, hamming_encode)


def _run(block_type, data, block_len=4096, **settings):
    g = gr.Graph()
    src = g.emplace("VectorSource")
    src.data = np.asarray(data, np.float32)
    blk = g.emplace(block_type, **settings)
    snk = g.emplace("VectorSink")
    g.connect_chain(src, blk, snk)
    gr.Scheduler(g, block_len=block_len, sample_rate=1e6).run_and_wait()
    return np.asarray(snk.data())


class TestGolayStructure:
    def test_min_distance_8_full_enumeration(self):
        msgs = ((np.arange(4096)[:, None] >> np.arange(12)) & 1
                ).astype(np.uint8)
        cw = msgs @ _GOLAY_G % 2
        w = cw.sum(axis=1)
        w[0] = 99
        assert w.min() == 8
        # self-dual code: every codeword weight is a multiple of 4
        assert np.all(cw.sum(axis=1) % 4 == 0)

    def test_B_symmetric_and_H_orthogonal(self):
        assert np.array_equal(_GOLAY_B, _GOLAY_B.T)
        assert np.all((_GOLAY_G @ _GOLAY_H.T) % 2 == 0)

    def test_all_3bit_errors_corrected_sampled(self):
        rng = np.random.default_rng(1)
        msg = rng.integers(0, 2, 12).astype(np.uint8)
        cw = golay_encode(msg)
        # every weight-1/2 pattern, and 400 random weight-3 patterns
        pats = [list(p) for w in (1, 2)
                for p in combinations(range(24), w)]
        pats += [sorted(rng.choice(24, 3, replace=False).tolist())
                 for _ in range(400)]
        for pos in pats:
            r = cw.copy()
            r[pos] ^= 1
            dec, nerr = golay_decode(r)
            assert np.array_equal(dec, msg), pos
            assert nerr[0] == len(pos)

    def test_weight4_detected_uncorrectable(self):
        msg = np.zeros(12, np.uint8)
        cw = golay_encode(msg)
        detected = 0
        for pos in combinations(range(8), 4):
            r = cw.copy()
            r[list(pos)] ^= 1
            _, nerr = golay_decode(r)
            assert nerr[0] != 4          # never claims a weight-4 fix
            detected += int(nerr[0] == -1)
        assert detected == len(list(combinations(range(8), 4)))


class TestGolayBlocks:
    def test_encoder_matches_host(self):
        rng = np.random.default_rng(2)
        msg = rng.integers(0, 2, 12 * 64).astype(np.float32)
        out = _run("GolayEncoder", msg)[: 24 * 64]
        np.testing.assert_array_equal(out.astype(np.uint8),
                                      golay_encode(msg.astype(np.uint8)))

    @pytest.mark.parametrize("block_len", [4096, 1536])
    def test_roundtrip_through_scheduler_with_errors(self, block_len):
        rng = np.random.default_rng(3)
        msg = rng.integers(0, 2, 12 * 128).astype(np.uint8)
        # three random flips in every 24-bit frame — max correctable
        frames = golay_encode(msg).astype(np.float32).reshape(-1, 24)
        for row in frames:
            pos = rng.choice(24, 3, replace=False)
            row[pos] = 1.0 - row[pos]
        out = _run("GolayDecoder", frames.reshape(-1),
                   block_len=block_len)[: 12 * 128]
        np.testing.assert_array_equal(out.astype(np.uint8), msg)


class TestHamming:
    @pytest.mark.parametrize("m", [3, 4])
    def test_exhaustive_single_error_correction(self, m):
        n = (1 << m) - 1
        k = n - m
        rng = np.random.default_rng(4)
        for _ in range(20):
            msg = rng.integers(0, 2, k).astype(np.uint8)
            cw = hamming_encode(msg, m=m)
            dec, nerr = hamming_decode(cw, m=m)
            assert np.array_equal(dec, msg) and nerr[0] == 0
            for pos in range(n):
                r = cw.copy()
                r[pos] ^= 1
                dec, nerr = hamming_decode(r, m=m)
                assert np.array_equal(dec, msg), (m, pos)
                assert nerr[0] == 1

    @pytest.mark.parametrize("m", [3, 4])
    def test_blocks_match_host(self, m):
        n = (1 << m) - 1
        k = n - m
        rng = np.random.default_rng(5)
        msg = rng.integers(0, 2, k * 96).astype(np.float32)
        coded = _run("HammingEncoder", msg, m=m)[: n * 96]
        np.testing.assert_array_equal(
            coded.astype(np.uint8),
            hamming_encode(msg.astype(np.uint8), m=m))
        # flip one bit per frame and decode on device
        frames = coded.reshape(-1, n).copy()
        pos = rng.integers(0, n, len(frames))
        frames[np.arange(len(frames)), pos] = \
            1.0 - frames[np.arange(len(frames)), pos]
        out = _run("HammingDecoder", frames.reshape(-1), m=m)[: k * 96]
        np.testing.assert_array_equal(out.astype(np.uint8),
                                      msg.astype(np.uint8))
