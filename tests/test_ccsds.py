"""CCSDS TM framing (131.0-B shape): ASM structure, the standard
pseudo-randomizer, interleaved-RS burst protection, polarity/offset
recovery, and the framer→deframer chain through the Scheduler."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.ccsds import (ASM_BITS, CcsdsCoder, CcsdsDeframer,
                                        randomizer_sequence)
from gnuradio4_tpu.core.errors import GrError


class TestPieces:
    def test_asm_bits(self):
        word = int("".join(map(str, ASM_BITS)), 2)
        assert word == 0x1ACFFC1D and len(ASM_BITS) == 32

    def test_randomizer_first_byte_and_period(self):
        seq = randomizer_sequence(512)
        # LFSR seed all-ones: the first 8 output bits are 11111111
        assert seq[0] == 0xFF
        # maximal-length over GF(2^8) LFSR: period 255 bits = 255/8 bytes;
        # the byte sequence repeats every 255 bytes
        assert np.array_equal(seq[:255], seq[255:510])

    def test_frame_geometry(self):
        coder = CcsdsCoder(interleave=4)
        payload = bytes(range(223)) * 4
        bits = coder.encode_frame(payload)
        assert len(bits) == 32 + 255 * 4 * 8
        np.testing.assert_array_equal(bits[:32], ASM_BITS)

    def test_wrong_payload_size_raises(self):
        with pytest.raises(GrError):
            CcsdsCoder(interleave=2).encode_frame(b"short")


class TestDecode:
    def _frame(self, interleave=1, seed=0):
        rng = np.random.default_rng(seed)
        coder = CcsdsCoder(interleave=interleave)
        payload = bytes(rng.integers(0, 256, coder.data_len).tolist())
        return coder, payload, coder.encode_frame(payload)

    def test_offset_and_inverted_polarity(self):
        rng = np.random.default_rng(1)
        coder, payload, bits = self._frame(interleave=2)
        stream = np.concatenate([rng.integers(0, 2, 137),
                                 bits ^ 1,
                                 rng.integers(0, 2, 64)]).astype(np.float32)
        d = CcsdsDeframer(interleave=2)
        d.consume({"in": stream}, {}, len(stream), 0)
        d.stop()
        assert d.frames == [payload]

    def test_interleaving_spreads_bursts(self):
        # a 60-byte contiguous burst = 15 symbol errors per codeword at
        # depth 4 — correctable; at depth 1 it would exceed t=16 fourfold
        coder, payload, bits = self._frame(interleave=4, seed=2)
        bits = bits.astype(np.uint8)
        bits[32 + 100 * 8: 32 + 160 * 8] ^= 1
        d = CcsdsDeframer(interleave=4)
        d.consume({"in": bits.astype(np.float32)}, {}, len(bits), 0)
        d.stop()
        assert d.frames == [payload]
        assert d.n_corrected == 60

    def test_uncorrectable_frame_skipped(self):
        coder, payload, bits = self._frame(interleave=1, seed=3)
        bits = bits.astype(np.uint8)
        bits[32: 32 + 100 * 8] ^= 1        # 100-byte burst >> t
        d = CcsdsDeframer(interleave=1)
        d.consume({"in": bits.astype(np.float32)}, {}, len(bits), 0)
        d.stop()
        assert d.frames == []

    def test_chunked_delivery(self):
        coder, payload, bits = self._frame(interleave=1, seed=4)
        d = CcsdsDeframer(interleave=1)
        x = bits.astype(np.float32)
        for i in range(0, len(x), 300):
            c = x[i:i + 300]
            d.consume({"in": c}, {}, len(c), 0)
        d.stop()
        assert d.frames == [payload]


class TestGraph:
    def test_framer_to_deframer_chain(self):
        msg = b"HELLO CCSDS " * 100
        g = gr.Graph()
        src = g.emplace("CcsdsFramer", payload=msg, interleave=1)
        dec = g.emplace("CcsdsDeframer", interleave=1)
        g.connect(src, dec)
        gr.Scheduler(g, block_len=2048, sample_rate=1e6).run_and_wait()
        joined = b"".join(dec.frames)
        pad = (-len(msg)) % 223
        assert joined == msg + b"\x00" * pad

    def test_concatenated_with_viterbi_inner_code(self):
        # the full CCSDS concatenated stack as ONE flowgraph:
        # framer bits -> conv(2,1,7) inner -> channel errors -> Viterbi ->
        # deframer (outer RS cleans the Viterbi residue)
        from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource
        rng = np.random.default_rng(5)
        msg = bytes(rng.integers(0, 256, 223).tolist())
        g = gr.Graph()
        src = g.emplace("CcsdsFramer", payload=msg, interleave=1)
        toint = g.emplace("Convert", to="int32")
        enc = g.emplace("ConvEncoder")
        snk = g.add(VectorSink())
        g.connect_chain(src, toint, enc, snk)
        gr.Scheduler(g, block_len=2048, sample_rate=1e6).run_and_wait()
        coded = np.asarray(snk.data()).astype(np.int32)
        flips = rng.random(len(coded)) < 0.02      # 2% channel errors
        coded = coded ^ flips.astype(np.int32)
        TB = 64
        coded = np.concatenate([coded, np.zeros(2 * TB, np.int32)])
        g2 = gr.Graph()
        s2 = g2.add(VectorSource(coded))
        vd = g2.emplace("ViterbiDecoder", traceback=TB)
        tofl = g2.emplace("Convert", to="float32")
        dec = g2.emplace("CcsdsDeframer", interleave=1)
        g2.connect_chain(s2, vd, tofl, dec)
        gr.Scheduler(g2, block_len=2048, sample_rate=1e6).run_and_wait()
        assert dec.frames == [msg]
