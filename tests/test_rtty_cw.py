"""RTTY (Baudot/ITA2 FSK) and CW (Morse) families: code tables,
waveform timing, loopback fidelity under noise, WPM independence, and the
Scheduler graph chains."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.cw import (CwDecoder, cw_modulate, decode_envelope,
                                     keying_envelope, morse_encode)
from gnuradio4_tpu.blocks.rtty import (BAUD, F_MARK, RttyDecoder,
                                       baudot_decode, baudot_encode,
                                       demod_bits, rtty_modulate)
from gnuradio4_tpu.blocks.sstv import instantaneous_frequency

FS = 48000.0


class TestBaudot:
    def test_roundtrip_letters(self):
        assert baudot_decode(baudot_encode("HELLO WORLD")) == "HELLO WORLD"

    def test_figures_shift(self):
        # digits force FIGS, letters force LTRS back
        assert baudot_decode(baudot_encode("RST 599 QSL?")) == "RST 599 QSL?"

    def test_transparent_chars_keep_shift(self):
        # space/CR/LF are in both tables — no shift injection around them
        codes = baudot_encode("73 99")
        # exactly one FIGS shift (0x1B) needed for the whole figures string
        assert codes.count(0x1B) == 1
        assert baudot_decode(codes) == "73 99"

    def test_unknown_characters_dropped(self):
        assert baudot_decode(baudot_encode("A~B")) == "AB"

    def test_mixed_case_normalized(self):
        assert baudot_decode(baudot_encode("cq de test")) == "CQ DE TEST"


class TestRttyWaveform:
    def test_idle_is_mark(self):
        audio = rtty_modulate("E", fs=FS)
        f = instantaneous_frequency(audio, FS)
        assert abs(np.median(f[100:2000]) - F_MARK) < 5.0

    def test_bit_timing(self):
        # one LTRS + one char = 2 characters of 7.5 bits + 2x 0.1 s lead
        audio = rtty_modulate("E", fs=FS, stop_bits=1.5, lead_s=0.1)
        expect = 2 * 0.1 * FS + 2 * 7.5 * FS / BAUD
        assert abs(len(audio) - expect) < 3

    def test_demod_bits_direct(self):
        audio = rtty_modulate("RY", fs=FS)
        f = instantaneous_frequency(audio, FS)
        codes = demod_bits(f, FS)
        assert baudot_decode(codes) == "RY"


class TestRttyLoopback:
    @pytest.mark.parametrize("noise", [0.0, 0.1, 0.2])
    def test_noise(self, noise):
        rng = np.random.default_rng(3)
        msg = "CQ CQ DE N0CALL 599 73"
        audio = rtty_modulate(msg, fs=FS)
        x = (audio + noise * rng.standard_normal(len(audio))
             ).astype(np.float32)
        d = RttyDecoder()
        d.consume({"in": x}, {}, len(x), 0)
        d.stop()
        assert d.text == msg

    def test_graph_chain(self):
        msg = "THE QUICK BROWN FOX 0123456789"
        g = gr.Graph()
        src = g.emplace("RttySource", text=msg)
        dec = g.emplace("RttyDecoder")
        g.connect(src, dec)
        gr.Scheduler(g, block_len=8192, sample_rate=FS).run_and_wait()
        assert dec.text == msg

    def test_nonstandard_baud(self):
        msg = "UOS 75 BD"
        audio = rtty_modulate(msg, fs=FS, baud=75.0)
        d = RttyDecoder(baud=75.0)
        d.consume({"in": audio}, {}, len(audio), 0)
        d.stop()
        assert d.text == msg


class TestMorse:
    def test_encode_table(self):
        assert morse_encode("SOS") == "... --- ..."
        assert morse_encode("A B") == ".- / -..."

    def test_envelope_timing(self):
        env = keying_envelope("E", FS, wpm=20.0)   # one dot
        unit = 1.2 / 20.0
        on = env > 0.5
        assert abs(on.sum() - unit * FS) < 0.01 * FS

    def test_decode_envelope_direct(self):
        env = keying_envelope("PARIS", FS, wpm=25.0)
        assert decode_envelope(env, FS) == "PARIS"


class TestCwLoopback:
    @pytest.mark.parametrize("wpm", [12.0, 20.0, 35.0])
    def test_wpm_independence(self, wpm):
        # the decoder is never told the speed
        msg = "CQ CQ DE N0CALL K"
        audio = cw_modulate(msg, wpm=wpm)
        d = CwDecoder()
        d.consume({"in": audio}, {}, len(audio), 0)
        d.stop()
        assert d.text == msg

    @pytest.mark.parametrize("noise", [0.1, 0.2])
    def test_noise(self, noise):
        rng = np.random.default_rng(5)
        msg = "CQ CQ DE N0CALL K"
        audio = cw_modulate(msg, wpm=20.0)
        x = (audio + noise * rng.standard_normal(len(audio))
             ).astype(np.float32)
        d = CwDecoder()
        d.consume({"in": x}, {}, len(x), 0)
        d.stop()
        assert d.text == msg

    def test_graph_chain(self):
        msg = "HELLO TPU 73"
        g = gr.Graph()
        src = g.emplace("CwSource", text=msg, wpm=25.0, frequency=700.0)
        dec = g.emplace("CwDecoder")
        g.connect(src, dec)
        gr.Scheduler(g, block_len=4096, sample_rate=FS).run_and_wait()
        assert dec.text == msg

    def test_numbers_and_punctuation(self):
        msg = "QTH = 50.1, 8.6 ?"
        audio = cw_modulate(msg, wpm=20.0)
        d = CwDecoder()
        d.consume({"in": audio}, {}, len(audio), 0)
        d.stop()
        assert d.text == "QTH = 50.1, 8.6 ?"


class TestBoundedHistory:
    """Continuous-stream decoders must not grow their history unboundedly:
    past max_buffer_s the decoded text archives and the buffer flushes at
    an idle seam, with the rolling text preserved across the cut."""

    def test_rtty_archives_across_flush(self):
        msgs = ["MSG ONE X", "MSG TWO Y", "MSG THREE Z"]
        d = RttyDecoder(max_buffer_s=4.0)
        for m in msgs:
            audio = rtty_modulate(m, fs=FS, lead_s=0.3)
            for i in range(0, len(audio), 24000):
                c = audio[i:i + 24000]
                d.consume({"in": c}, {}, len(c), 0)
        d.stop()
        assert d.text.replace(" ", "") == "".join(msgs).replace(" ", "")
        # the internal buffer actually flushed (history stayed bounded)
        assert len(d._buf) < 2 * 4.0 * FS

    def test_cw_archives_across_flush(self):
        d = CwDecoder(max_buffer_s=4.0)
        for m in ("ABC", "DEF"):
            audio = cw_modulate(m, wpm=25.0)
            pad = np.zeros(int(1.0 * FS), np.float32)
            x = np.concatenate([audio, pad])
            for i in range(0, len(x), 48000):
                c = x[i:i + 48000]
                d.consume({"in": c}, {}, len(c), 0)
        d.stop()
        assert d.text.split() == ["ABC", "DEF"]
        assert len(d._buf) < 2 * 4.0 * FS
