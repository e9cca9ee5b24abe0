"""Reed-Solomon GF(256) codec: field construction, encode parity, full
error-correction envelope (t errors, t+1 rejection, erasure+error mixes),
CCSDS field parameters, and the stream blocks through the Scheduler
(rate-changing k→n→k chain)."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.reed_solomon import GF256, ReedSolomon
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource
from gnuradio4_tpu.core.errors import GrError


class TestField:
    def test_exp_log_inverse_tables(self):
        gf = GF256()
        for a in (1, 2, 77, 255):
            assert int(gf.mul(a, gf.inv(a))) == 1

    def test_mul_distributes(self):
        gf = GF256()
        rng = np.random.default_rng(0)
        a, b, c = rng.integers(0, 256, 3)
        left = int(gf.mul(a, int(b) ^ int(c)))
        right = int(gf.mul(a, b)) ^ int(gf.mul(a, c))
        assert left == right

    def test_non_primitive_poly_rejected(self):
        with pytest.raises(GrError):
            GF256(0x101)        # x^8 + 1 is not primitive

    def test_ccsds_poly_is_primitive(self):
        GF256(0x187)


class TestCodec:
    def test_encode_is_systematic_and_valid(self):
        rs = ReedSolomon(255, 223)
        data = np.arange(223) % 256
        cw = rs.encode(data)
        assert len(cw) == 255
        np.testing.assert_array_equal(cw[:223], data)
        out, nc = rs.decode(cw)
        assert nc == 0
        np.testing.assert_array_equal(out, data)

    @pytest.mark.parametrize("ne", [1, 5, 16])
    def test_corrects_up_to_t(self, ne):
        rng = np.random.default_rng(ne)
        rs = ReedSolomon(255, 223)
        data = rng.integers(0, 256, 223)
        cw = rs.encode(data).astype(np.int64)
        pos = rng.choice(255, ne, replace=False)
        cw[pos] ^= rng.integers(1, 256, ne)
        out, nc = rs.decode(cw)
        assert nc == ne
        np.testing.assert_array_equal(out, data)

    def test_t_plus_one_rejected(self):
        rng = np.random.default_rng(9)
        rs = ReedSolomon(255, 223)
        cw = rs.encode(rng.integers(0, 256, 223)).astype(np.int64)
        pos = rng.choice(255, 17, replace=False)
        cw[pos] ^= rng.integers(1, 256, 17)
        with pytest.raises(GrError):
            rs.decode(cw)

    def test_erasures_double_capacity(self):
        # 2·errors + erasures ≤ 32: 30 erasures + 1 error corrects
        rng = np.random.default_rng(4)
        rs = ReedSolomon(255, 223)
        data = rng.integers(0, 256, 223)
        cw = rs.encode(data).astype(np.int64)
        er = rng.choice(255, 30, replace=False)
        cw[er] = 0
        extra = [p for p in range(255) if p not in er][7]
        cw[extra] ^= 55
        out, nc = rs.decode(cw, erasures=list(er))
        np.testing.assert_array_equal(out, data)
        assert nc >= 30       # zeroed positions that were already 0 excluded

    def test_shortened_code(self):
        rng = np.random.default_rng(5)
        rs = ReedSolomon(64, 48)           # t = 8
        data = rng.integers(0, 256, 48)
        cw = rs.encode(data).astype(np.int64)
        pos = rng.choice(64, 8, replace=False)
        cw[pos] ^= rng.integers(1, 256, 8)
        out, nc = rs.decode(cw)
        assert nc == 8
        np.testing.assert_array_equal(out, data)

    def test_ccsds_parameters(self):
        rng = np.random.default_rng(6)
        rs = ReedSolomon(255, 223, prim_poly=0x187, fcr=112, prim=11)
        data = rng.integers(0, 256, 223)
        cw = rs.encode(data).astype(np.int64)
        pos = rng.choice(255, 16, replace=False)
        cw[pos] ^= rng.integers(1, 256, 16)
        out, nc = rs.decode(cw)
        assert nc == 16
        np.testing.assert_array_equal(out, data)

    def test_bad_shapes_raise(self):
        rs = ReedSolomon(255, 223)
        with pytest.raises(GrError):
            rs.encode(np.zeros(10))
        with pytest.raises(GrError):
            rs.decode(np.zeros(10))
        with pytest.raises(GrError):
            ReedSolomon(255, 255)


class TestBlocks:
    def test_encode_decode_chain_roundtrip(self):
        rng = np.random.default_rng(1)
        data = rng.integers(0, 256, 4 * 223).astype(np.float32)
        g = gr.Graph()
        src = g.add(VectorSource(data))
        enc = g.emplace("RsEncoder")
        dec = g.emplace("RsDecoder")
        snk = g.add(VectorSink())
        g.connect_chain(src, enc, dec, snk)
        gr.Scheduler(g, block_len=2 * 223, sample_rate=1e6).run_and_wait()
        np.testing.assert_array_equal(np.asarray(snk.data()), data)

    def test_decoder_corrects_channel_errors(self):
        rng = np.random.default_rng(2)
        rs = ReedSolomon()
        data = rng.integers(0, 256, 4 * 223)
        enc = np.concatenate([rs.encode(f) for f in data.reshape(-1, 223)]
                             ).astype(np.int64)
        for fi in range(4):
            pos = rng.choice(255, 10, replace=False)
            enc[fi * 255 + pos] ^= rng.integers(1, 256, 10)
        g = gr.Graph()
        src = g.add(VectorSource(enc.astype(np.float32)))
        dec = g.emplace("RsDecoder")
        snk = g.add(VectorSink())
        g.connect_chain(src, dec, snk)
        gr.Scheduler(g, block_len=2 * 255, sample_rate=1e6).run_and_wait()
        np.testing.assert_array_equal(np.asarray(snk.data()),
                                      data.astype(np.float32))
        assert dec.n_corrected == 40 and dec.n_failed == 0

    def test_uncorrectable_frame_passes_through_and_counts(self):
        rng = np.random.default_rng(3)
        rs = ReedSolomon()
        data = rng.integers(0, 256, 223)
        cw = rs.encode(data).astype(np.int64)
        pos = rng.choice(255, 40, replace=False)
        cw[pos] ^= rng.integers(1, 256, 40)
        g = gr.Graph()
        src = g.add(VectorSource(cw.astype(np.float32)))
        dec = g.emplace("RsDecoder")
        snk = g.add(VectorSink())
        g.connect_chain(src, dec, snk)
        gr.Scheduler(g, block_len=255, sample_rate=1e6).run_and_wait()
        assert dec.n_failed == 1
        # data portion passed through unchanged (garbled but present)
        np.testing.assert_array_equal(np.asarray(snk.data()),
                                      (cw[:223] & 0xFF).astype(np.float32))

    def test_concatenated_with_viterbi(self):
        # the CCSDS stack shape: RS outer + convolutional inner. Bytes →
        # RS encode → bits → conv encode → (clean channel) → Viterbi →
        # bits → bytes → RS decode
        rng = np.random.default_rng(7)
        data = rng.integers(0, 256, 223).astype(np.float32)
        rs = ReedSolomon()
        coded = rs.encode(data.astype(np.int64))
        bits = ((coded[:, None] >> np.arange(8)) & 1).reshape(-1) \
            .astype(np.int32)
        TB = 64
        padded = np.concatenate([bits, np.zeros(TB, np.int32)])
        g = gr.Graph()
        src = g.add(VectorSource(padded))
        ce = g.emplace("ConvEncoder")
        vd = g.emplace("ViterbiDecoder", traceback=TB)
        snk = g.add(VectorSink())
        g.connect_chain(src, ce, vd, snk)
        gr.Scheduler(g, block_len=len(padded), sample_rate=1e6).run_and_wait()
        # the decoder streams with TB bits of latency
        out_bits = np.asarray(snk.data()).astype(np.int64)[TB: TB + len(bits)]
        rebytes = (out_bits.reshape(-1, 8) << np.arange(8)).sum(axis=1)
        dec, nc = rs.decode(rebytes)
        np.testing.assert_array_equal(dec, data.astype(np.uint8))
