"""DCF77 time-signal family: BCD frame encode/decode with parity validation,
AM-envelope waveform properties, and the full graph receiver chain
(Dcf77Source → Dcf77Decoder) across minutes, scheduler chunkings, noise, and
an AM-carrier front end."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.dcf77 import (am_envelope, decode_minute,
                                        encode_minute)

T0 = dict(minute=34, hour=21, day=17, weekday=1, month=8, year2=26, cest=True)
T1 = dict(minute=35, hour=21, day=17, weekday=1, month=8, year2=26, cest=True)
T2 = dict(minute=59, hour=23, day=31, weekday=7, month=12, year2=99,
          cest=False)


class TestCoding:
    @pytest.mark.parametrize("t", [T0, T1, T2,
                                   dict(minute=0, hour=0, day=1, weekday=1,
                                        month=1, year2=0)])
    def test_encode_decode_roundtrip(self, t):
        d = decode_minute(encode_minute(**t))
        assert d == {**t, "cest": t.get("cest", False)}

    def test_fixed_bits(self):
        bits = encode_minute(**T0)
        assert bits[0] == 0 and bits[20] == 1     # protocol constants
        assert bits[17] == 1 and bits[18] == 0    # CEST flags

    def test_parity_violations_rejected(self):
        for flip in (22, 30, 40, 51):             # minute/hour/day/year bits
            bad = encode_minute(**T0)
            bad[flip] ^= 1
            assert decode_minute(bad) is None, flip

    def test_nonsense_fields_rejected(self):
        bits = encode_minute(minute=34, hour=21, day=17, weekday=1, month=8,
                             year2=26)
        bits[29:35] = [1, 0, 0, 1, 0, 1]          # hour "BCD" 29 (>23)
        bits[35] = int(bits[29:35].sum()) & 1     # keep parity valid
        assert decode_minute(bits) is None

    def test_envelope_pulse_widths(self):
        fs = 1000.0
        bits = encode_minute(**T0)
        env = am_envelope(bits, fs=fs)
        assert len(env) == 60000                  # full minute incl. marker
        for sec, b in enumerate(bits):
            lo = int(sec * fs)
            width = int(np.sum(env[lo:lo + int(0.3 * fs)] < 0.5))
            assert width == (200 if b else 100), sec
        assert np.all(env[59000:] == 1.0)         # second 59: no reduction


def _run_chain(minutes, block_len, noise=0.0, carrier=False, seed=0):
    fs = 1000.0
    n_total = int(60 * fs) * len(minutes)
    g = gr.Graph()
    src = g.emplace("Dcf77Source", minutes=minutes, sample_rate=fs)
    head = src
    if carrier:
        # AM front end: envelope × complex carrier → |.| recovers it
        to_iq = g.emplace("Convert", to="complex64")
        tone = g.emplace("ComplexToneSource", frequency=77.5,
                         n_samples=n_total)
        mul = g.emplace("Multiply", n_inputs=2)
        mag = g.emplace("Abs")
        g.connect(src, to_iq)
        g.connect(to_iq, mul, dst_port="in0")
        g.connect(tone, mul, dst_port="in1")
        g.connect(mul, mag)
        head = mag
    if noise:
        nz = g.emplace("NoiseSource", std=noise, seed=seed,
                       n_samples=n_total)
        add = g.emplace("Add", n_inputs=2)
        g.connect(head, add, dst_port="in0")
        g.connect(nz, add, dst_port="in1")
        head = add
    dec = g.emplace("Dcf77Decoder", sample_rate=fs)
    g.connect(head, dec)
    gr.Scheduler(g, block_len=block_len, sample_rate=fs).run_and_wait()
    return dec


class TestReceiverChain:
    @pytest.mark.parametrize("block_len", [60000, 8192, 1000])
    def test_two_minutes_through_scheduler(self, block_len):
        dec = _run_chain([T0, T1], block_len)
        assert len(dec.frames) == 2, dec.frames
        assert dec.frames[0]["minute"] == 34 and dec.frames[1]["minute"] == 35
        assert dec.last_time["hour"] == 21 and dec.last_time["cest"]

    def test_noisy_envelope(self):
        dec = _run_chain([T0], 8192, noise=0.08)
        assert dec.frames and dec.frames[0]["minute"] == 34

    def test_am_carrier_front_end(self):
        dec = _run_chain([T2], 8192, carrier=True)
        assert dec.frames, "no decode through the AM front end"
        assert dec.frames[0] == {**T2}

    def test_corrupted_frame_not_decoded(self):
        fs = 1000.0
        bits = encode_minute(**T0)
        bits[23] ^= 1                              # break P1
        env = am_envelope(bits, fs=fs)
        g = gr.Graph()
        from gnuradio4_tpu.blocks.testing import VectorSource
        src = VectorSource(env)
        dec = g.emplace("Dcf77Decoder", sample_rate=fs)
        g.connect(src, dec)
        gr.Scheduler(g, block_len=10000, sample_rate=fs).run_and_wait()
        assert dec.frames == []
