"""LoRa-style CSS family: chirp demod exactness, bit-layer roundtrips
(Gray/interleaver/Hamming/whitening), FEC correction, frame sync at
arbitrary timing offsets and CFO, device CssDemod == host demod, the
Scheduler chains, noise tolerance."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.lora import (CssDemod, LoRaDecoder, base_chirp,
                                       css_demod_host, css_symbol,
                                       decode_payload, deinterleave,
                                       encode_payload, hamming_decode,
                                       hamming_encode, interleave,
                                       lora_modulate, whitening_sequence)
from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource


class TestChirps:
    def test_base_chirp_unit_modulus(self):
        c = base_chirp(8)
        np.testing.assert_allclose(np.abs(c), 1.0, atol=1e-6)

    def test_up_down_conjugate(self):
        np.testing.assert_allclose(base_chirp(7, down=True),
                                   np.conj(base_chirp(7)), atol=1e-6)

    @pytest.mark.parametrize("sf", [7, 8, 10])
    def test_demod_exact_all_symbols(self, sf):
        n = 1 << sf
        vals = np.array([0, 1, n // 3, n // 2, n - 1])
        x = np.concatenate([css_symbol(int(v), sf) for v in vals])
        np.testing.assert_array_equal(css_demod_host(x, sf), vals)


class TestBitLayer:
    @pytest.mark.parametrize("cr", [1, 2, 3, 4])
    def test_hamming_roundtrip(self, cr):
        nib = np.arange(16, dtype=np.uint8)
        np.testing.assert_array_equal(
            hamming_decode(hamming_encode(nib, cr), cr), nib)

    def test_hamming_corrects_single_bit_cr4(self):
        nib = np.arange(16, dtype=np.uint8)
        cw = hamming_encode(nib, 4)
        for bit in range(8):
            np.testing.assert_array_equal(
                hamming_decode(cw ^ (1 << bit), 4), nib,
                err_msg=f"bit {bit}")

    @pytest.mark.parametrize("sf,cr", [(7, 4), (8, 4), (9, 1), (10, 2)])
    def test_interleaver_roundtrip(self, sf, cr):
        rng = np.random.default_rng(1)
        cw = rng.integers(0, 1 << (4 + cr), size=3 * sf).astype(np.uint16)
        np.testing.assert_array_equal(
            deinterleave(interleave(cw, sf, cr), sf, cr), cw)

    def test_whitening_is_involution(self):
        w = whitening_sequence(32)
        data = np.arange(32, dtype=np.uint8)
        np.testing.assert_array_equal((data ^ w) ^ w, data)
        assert len(set(w.tolist())) > 16      # actually pseudorandom

    @pytest.mark.parametrize("sf,cr", [(7, 4), (8, 4), (9, 1)])
    def test_payload_roundtrip(self, sf, cr):
        p = bytes(range(1, 40))
        assert decode_payload(encode_payload(p, sf, cr), sf, cr) == p

    def test_symbol_errors_corrected_by_fec(self):
        # cr=4 corrects one bit flip per codeword — flip one bit in a few
        # distinct interleaved symbols
        p = b"FEC CHECK"
        syms = encode_payload(p, 8, 4)
        syms = syms.copy()
        syms[0] ^= 1
        syms[9] ^= 4
        assert decode_payload(syms, 8, 4) == p


class TestFrameSync:
    @pytest.mark.parametrize("offset", [0, 137, 777, 1000, 3333])
    def test_arbitrary_timing_offset(self, offset):
        wave = lora_modulate(b"OFFSET", sf=8)
        x = np.concatenate([np.zeros(offset, np.complex64), wave,
                            np.zeros(600, np.complex64)])
        d = LoRaDecoder(sf=8)
        d.consume({"in": x}, {}, len(x), 0)
        d.stop()
        assert d.frames == [b"OFFSET"]

    def test_integer_cfo_corrected(self):
        wave = lora_modulate(b"CFO", sf=8)
        x = np.concatenate([np.zeros(500, np.complex64), wave,
                            np.zeros(500, np.complex64)])
        cfo = np.exp(2j * np.pi * (5.0 / 256) * np.arange(len(x)))
        d = LoRaDecoder(sf=8)
        xc = (x * cfo).astype(np.complex64)
        d.consume({"in": xc}, {}, len(xc), 0)
        d.stop()
        assert d.frames == [b"CFO"]

    def test_two_frames(self):
        x = np.concatenate([np.zeros(300, np.complex64),
                            lora_modulate(b"ONE", sf=8),
                            np.zeros(2048, np.complex64),
                            lora_modulate(b"TWO", sf=8),
                            np.zeros(600, np.complex64)])
        d = LoRaDecoder(sf=8)
        for i in range(0, len(x), 4096):
            c = x[i:i + 4096]
            d.consume({"in": c}, {}, len(c), 0)
        d.stop()
        assert d.frames == [b"ONE", b"TWO"]

    @pytest.mark.parametrize("noise", [0.3, 0.7])
    def test_noise(self, noise):
        rng = np.random.default_rng(2)
        wave = lora_modulate(b"NOISY PAYLOAD", sf=8)
        x = np.concatenate([np.zeros(1024, np.complex64), wave,
                            np.zeros(1024, np.complex64)])
        x = (x + noise * (rng.standard_normal(len(x))
                          + 1j * rng.standard_normal(len(x)))
             / np.sqrt(2)).astype(np.complex64)
        d = LoRaDecoder(sf=8)
        d.consume({"in": x}, {}, len(x), 0)
        d.stop()
        assert d.frames == [b"NOISY PAYLOAD"]

    def test_pure_noise_no_false_frames(self):
        rng = np.random.default_rng(3)
        x = (rng.standard_normal(65536)
             + 1j * rng.standard_normal(65536)).astype(np.complex64)
        d = LoRaDecoder(sf=8)
        d.consume({"in": x}, {}, len(x), 0)
        d.stop()
        assert d.frames == []


class TestDeviceDemod:
    def test_css_demod_block_matches_host(self):
        syms = encode_payload(b"DEVICE SIDE", 8, 4)
        x = np.concatenate([css_symbol(int(s), 8) for s in syms])
        g = gr.Graph()
        src = g.add(VectorSource(x.astype(np.complex64)))
        dem = g.emplace("CssDemod", sf=8)
        snk = g.add(VectorSink())
        g.connect_chain(src, dem, snk)
        gr.Scheduler(g, block_len=4096, sample_rate=250e3).run_and_wait()
        dev = np.asarray(snk.data()).astype(np.int64)
        host = css_demod_host(x, 8)
        np.testing.assert_array_equal(dev, host[:len(dev)])
        # and the symbol stream decodes
        assert decode_payload(dev.astype(np.uint32), 8, 4) == b"DEVICE SIDE"

    def test_ratio_and_alignment(self):
        d = CssDemod(sf=9)
        assert d.alignment == 512
        assert float(d.ratio) == 1.0 / 512


class TestGraphChain:
    @pytest.mark.parametrize("block_len", [2048, 8192])
    def test_source_to_decoder(self, block_len):
        g = gr.Graph()
        src = g.emplace("LoRaSource", payload=b"CHAIN PAYLOAD 123", sf=8)
        dec = g.emplace("LoRaDecoder", sf=8)
        g.connect(src, dec)
        gr.Scheduler(g, block_len=block_len,
                     sample_rate=250e3).run_and_wait()
        assert dec.frames == [b"CHAIN PAYLOAD 123"]

    def test_sf7_chain(self):
        g = gr.Graph()
        src = g.emplace("LoRaSource", payload=b"SF7", sf=7)
        dec = g.emplace("LoRaDecoder", sf=7)
        g.connect(src, dec)
        gr.Scheduler(g, block_len=2048, sample_rate=125e3).run_and_wait()
        assert dec.frames == [b"SF7"]
