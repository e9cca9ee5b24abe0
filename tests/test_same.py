"""SAME/EAS family: LSB-first byte order, burst structure, preamble clock
recovery, 2-of-3 majority voting, EOM detection, Scheduler chain, noise."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.same import (BAUD, F_MARK, F_SPACE, PREAMBLE,
                                       SameDecoder, _majority, bits_to_bytes,
                                       bytes_to_bits, demod_burst, same_burst,
                                       same_modulate)
from gnuradio4_tpu.blocks.sstv import instantaneous_frequency

FS = 48000.0
HDR = "ZCZC-WXR-TOR-024035+0100-2771935-KOUN/NWS-"


class TestBits:
    def test_lsb_first(self):
        bits = bytes_to_bits(b"\xab")
        # 0xAB = 0b10101011 → LSB-first 1,1,0,1,0,1,0,1
        assert bits.tolist() == [1, 1, 0, 1, 0, 1, 0, 1]

    def test_roundtrip(self):
        data = b"ZCZC-EAS"
        assert bits_to_bytes(bytes_to_bits(data)) == data


class TestBurst:
    def test_tone_frequencies(self):
        # preamble-only burst: instantaneous freq hits mark/space exactly
        audio = same_burst("", fs=FS)
        f = instantaneous_frequency(audio, FS)
        bit_n = FS / BAUD
        # 0xAB LSB-first = 1,1,0,1,0,1,0,1 — average each bit's central
        # half (the FM discriminator rings at bit transitions)
        def center(k):
            return float(np.mean(f[int((k + 0.25) * bit_n):
                                   int((k + 0.75) * bit_n)]))
        assert abs(center(9) - F_MARK) < 10.0   # bit 9 (byte 1, bit 1): '1'
        assert abs(center(10) - F_SPACE) < 10.0  # bit 10: '0'

    def test_burst_length(self):
        audio = same_burst("NNNN", fs=FS)
        n_bits = 8 * (len(PREAMBLE) + 4)
        assert abs(len(audio) - n_bits * FS / BAUD) < 2

    def test_demod_burst_direct(self):
        audio = same_burst(HDR, fs=FS)
        f = instantaneous_frequency(audio, FS)
        assert demod_burst(f, FS) == HDR


class TestMajority:
    def test_two_of_three_corrects_one_bad(self):
        assert _majority(["ZCZC-AB", "ZCZC-XB", "ZCZC-AB"]) == "ZCZC-AB"

    def test_stops_where_no_quorum(self):
        assert _majority(["ZCZC-A", "ZCZC-B", "ZCZC-C"]) == "ZCZC-"

    def test_single_burst_accepted(self):
        assert _majority(["NNNN"]) == "NNNN"


class TestLoopback:
    @pytest.mark.parametrize("noise", [0.0, 0.1, 0.2])
    def test_noise(self, noise):
        rng = np.random.default_rng(11)
        audio = same_modulate(HDR, fs=FS)
        x = (audio + noise * rng.standard_normal(len(audio))
             ).astype(np.float32)
        d = SameDecoder()
        d.consume({"in": x}, {}, len(x), 0)
        d.stop()
        assert d.headers == [HDR]
        assert d.eom

    def test_no_eom_variant(self):
        audio = same_modulate(HDR, fs=FS, eom=False)
        d = SameDecoder()
        d.consume({"in": audio}, {}, len(audio), 0)
        d.stop()
        assert d.headers == [HDR] and not d.eom

    def test_silence_decodes_nothing(self):
        d = SameDecoder()
        x = np.zeros(int(3 * FS), np.float32)
        d.consume({"in": x}, {}, len(x), 0)
        d.stop()
        assert d.headers == [] and not d.eom

    def test_graph_chain(self):
        g = gr.Graph()
        src = g.emplace("SameSource", header=HDR)
        dec = g.emplace("SameDecoder")
        g.connect(src, dec)
        gr.Scheduler(g, block_len=8192, sample_rate=FS).run_and_wait()
        assert dec.headers == [HDR] and dec.eom


def test_mid_burst_dropout_outvoted():
    """A dropout that splits one burst into unrecognizable fragments must
    not break the group: the two intact bursts still 2-of-3 the header."""
    audio = same_modulate(HDR, fs=FS, eom=False)
    mid = len(audio) // 2
    audio = audio.copy()
    audio[mid - 2000: mid + 2000] = 0.0
    d = SameDecoder()
    d.consume({"in": audio}, {}, len(audio), 0)
    d.stop()
    assert d.headers == [HDR]
