"""IEEE 802.11a/g OFDM PHY (blocks/wifi.py): clause-level primitives
(scrambler, puncturing, interleaver, constellations, SIGNAL parity),
all-rate roundtrips, CFO/AWGN robustness, FCS gating, and the full
flowgraph (WifiSource → WifiDecoder) through the real Scheduler."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.wifi import (RATES, append_fcs, check_fcs,
                                       decode_frames, deinterleave,
                                       demap_soft, depuncture, encode_frame,
                                       interleave, map_symbols, puncture,
                                       scramble_sequence,
                                       viterbi_decode_soft, _conv_encode)

PSDU = append_fcs(b"The quick brown fox jumps over the lazy dog")


class TestPrimitives:
    def test_scrambler_is_127_periodic_and_balanced(self):
        s = scramble_sequence(254, 0x7F)
        assert np.array_equal(s[:127], s[127:])
        assert s[:127].sum() == 64               # maximal-length property
        # different seeds give shifted (not equal) sequences
        assert not np.array_equal(scramble_sequence(127, 0x5D), s[:127])

    @pytest.mark.parametrize("punct", ["1/2", "2/3", "3/4"])
    def test_puncture_depuncture_shapes(self, punct):
        coded = np.arange(144) % 2
        tx = puncture(coded.astype(np.uint8), punct)
        rx = depuncture(tx.astype(np.float64), punct)
        assert len(rx) == 144
        kept = rx != 0.5
        np.testing.assert_array_equal(rx[kept], coded[kept])
        num, den = (int(v) for v in punct.split("/"))
        assert len(tx) * num == len(coded) // 2 * den

    @pytest.mark.parametrize("rate", sorted(RATES))
    def test_interleaver_is_a_permutation(self, rate):
        p = RATES[rate]
        bits = np.arange(p["ncbps"]) % 2
        rt = deinterleave(interleave(bits, p["ncbps"], p["nbpsc"]),
                          p["ncbps"], p["nbpsc"])
        np.testing.assert_array_equal(rt, bits)

    @pytest.mark.parametrize("mod,nbpsc", [("bpsk", 1), ("qpsk", 2),
                                           ("qam16", 4), ("qam64", 6)])
    def test_constellation_unit_power_and_demap(self, mod, nbpsc):
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, nbpsc * 480).astype(np.uint8)
        pts = map_symbols(bits, mod)
        assert abs(np.mean(np.abs(pts) ** 2) - 1.0) < 0.05
        hard = (demap_soft(pts, mod) > 0.5).astype(np.uint8)
        np.testing.assert_array_equal(hard, bits)

    def test_viterbi_terminated_roundtrip_with_erasures(self):
        rng = np.random.default_rng(1)
        msg = np.concatenate([rng.integers(0, 2, 240),
                              np.zeros(6)]).astype(np.uint8)
        coded = _conv_encode(msg).astype(np.float64)
        coded[10:40:3] = 0.5                     # erasures
        coded[100] = 1 - coded[100]              # plus a hard error
        dec = viterbi_decode_soft(coded)
        np.testing.assert_array_equal(dec, msg)

    def test_fcs(self):
        assert check_fcs(PSDU)
        bad = bytearray(PSDU)
        bad[3] ^= 1
        assert not check_fcs(bytes(bad))


class TestRoundtrip:
    @pytest.mark.parametrize("rate", sorted(RATES))
    def test_all_rates_clean(self, rate):
        iq = encode_frame(PSDU, rate=rate)
        iq = np.concatenate([np.zeros(137, np.complex64), iq,
                             np.zeros(80, np.complex64)])
        fr = decode_frames(iq)
        assert len(fr) == 1
        assert fr[0]["rate_mbps"] == rate
        assert fr[0]["psdu"] == PSDU and fr[0]["fcs_ok"]

    @pytest.mark.parametrize("rate,snr_db,cfo_hz",
                             [(6, 8, 30e3), (12, 12, 50e3),
                              (24, 18, 20e3), (54, 26, 10e3)])
    def test_awgn_and_cfo(self, rate, snr_db, cfo_hz):
        rng = np.random.default_rng(7)
        iq = encode_frame(PSDU, rate=rate)
        iq = np.concatenate([np.zeros(211, np.complex64), iq,
                             np.zeros(64, np.complex64)])
        n = len(iq)
        iq = iq * np.exp(1j * (2 * np.pi * cfo_hz / 20e6 * np.arange(n)
                               + 0.7))
        sig_p = np.mean(np.abs(iq) ** 2)
        sigma = np.sqrt(sig_p / 10 ** (snr_db / 10) / 2)
        iq = iq + sigma * (rng.standard_normal(n)
                           + 1j * rng.standard_normal(n))
        fr = decode_frames(iq.astype(np.complex64))
        assert len(fr) == 1 and fr[0]["psdu"] == PSDU and fr[0]["fcs_ok"]
        assert abs(fr[0]["cfo_hz"] - cfo_hz) < 3e3

    def test_corrupted_payload_fails_fcs_but_decodes(self):
        iq = encode_frame(PSDU, rate=12)
        # smash a mid-payload data symbol beyond FEC repair
        iq[600:680] = 0
        fr = decode_frames(np.concatenate([np.zeros(50, np.complex64), iq]))
        assert len(fr) == 1 and not fr[0]["fcs_ok"]

    def test_length_guard(self):
        with pytest.raises(ValueError):
            encode_frame(b"", rate=6)
        with pytest.raises(ValueError):
            encode_frame(bytes(4096), rate=6)

    def test_multipath_one_tap_echo(self):
        iq = encode_frame(PSDU, rate=12)
        iq = np.concatenate([np.zeros(90, np.complex64), iq,
                             np.zeros(64, np.complex64)])
        echo = np.zeros_like(iq)
        echo[3:] = 0.3j * iq[:-3]                # 150 ns echo, within CP
        fr = decode_frames((iq + echo).astype(np.complex64))
        assert len(fr) == 1 and fr[0]["psdu"] == PSDU and fr[0]["fcs_ok"]


class TestGraphChain:
    @pytest.mark.parametrize("block_len", [32768, 20000])
    def test_two_frames_two_rates_through_scheduler(self, block_len):
        frames = [{"psdu": append_fcs(b"frame one at 6"), "rate": 6},
                  {"psdu": append_fcs(b"frame two at 24 Mbps"), "rate": 24}]
        g = gr.Graph()
        src = g.emplace("WifiSource", frames=frames)
        dec = g.emplace("WifiDecoder")
        g.connect_chain(src, dec)
        gr.Scheduler(g, block_len=block_len, sample_rate=20e6).run_and_wait()
        assert len(dec.frames) == 2, dec.frames
        assert dec.frames[0]["rate_mbps"] == 6
        assert dec.frames[0]["psdu"] == frames[0]["psdu"]
        assert dec.frames[1]["rate_mbps"] == 24
        assert dec.frames[1]["psdu"] == frames[1]["psdu"]
        assert all(f["fcs_ok"] for f in dec.frames)


class TestIncrementalDecoder:
    """ADVICE r2: frames spanning a buffer trim must survive; scans must be
    incremental (resume offset) and dedupe across the overlap."""

    def test_frame_spanning_trim_survives(self):
        from gnuradio4_tpu.blocks.wifi import WifiDecoder
        iq = encode_frame(PSDU, rate=12)
        # cap the buffer at 200k samples; a frame straddles the trim point
        dec = WifiDecoder(max_buffer_s=0.01)
        pre = 255_000           # frame starts just before the first trim
        stream = np.concatenate([
            np.zeros(pre, np.complex64), iq.astype(np.complex64),
            np.zeros(300_000, np.complex64)])
        # feed in chunks that trigger several _process/trim rounds
        chunk = 262_144
        for i in range(0, len(stream), chunk):
            c = stream[i:i + chunk]
            dec.consume({"in": c}, {}, len(c), i)
        dec.stop()
        assert len(dec.frames) == 1, [f.get("sample_offset")
                                      for f in dec.frames]
        f = dec.frames[0]
        assert f["fcs_ok"] and bytes(f["psdu"]) == PSDU
        # absolute offset is preserved across trims (LTF lock point is
        # ~192 samples in: after the STF(160) + the LTF cyclic prefix(32))
        assert abs(f["sample_offset"] - (pre + 192)) < 128

    def test_no_duplicate_frames_across_scans(self):
        from gnuradio4_tpu.blocks.wifi import WifiDecoder
        iq = encode_frame(PSDU, rate=24)
        dec = WifiDecoder()
        stream = np.concatenate([
            np.zeros(1000, np.complex64), iq.astype(np.complex64),
            np.zeros(600_000, np.complex64)])
        chunk = 262_144
        for i in range(0, len(stream), chunk):
            c = stream[i:i + chunk]
            dec.consume({"in": c}, {}, len(c), i)
        dec.stop()
        # the overlap re-scans the frame's region — it must appear ONCE
        assert len(dec.frames) == 1
        assert not dec.truncated
