"""ADS-B / Mode S decoder (blocks/adsb.py — beyond-reference model family)."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks import adsb


class TestModeSCoding:
    def test_crc_of_valid_frame_is_zero(self):
        f = adsb.make_df17_identification(0xABCDEF, "GR4TPU01")
        assert len(f) == 112
        assert adsb.crc24(f) == 0

    def test_single_bit_error_breaks_crc(self):
        f = adsb.make_df17_identification(0x4840D6, "KLM1023")
        for i in (0, 5, 31, 87, 111):
            g = f.copy()
            g[i] ^= 1
            assert adsb.crc24(g) != 0

    def test_callsign_roundtrip(self):
        for cs in ("KLM1023", "BAW38K", "N123AB", "A"):
            f = adsb.make_df17_identification(0x123456, cs)
            recs = adsb.decode_bits_stream(adsb.modulate([f]))
            assert len(recs) == 1
            assert recs[0]["callsign"] == cs
            assert recs[0]["icao"] == 0x123456 and recs[0]["df"] == 17

    def test_decode_under_noise(self):
        rng = np.random.default_rng(0)
        frames = [adsb.make_df17_identification(0x100000 + k, f"AC{k:05d}")
                  for k in range(5)]
        wave = adsb.modulate(frames)
        noisy = wave + 0.05 * rng.standard_normal(len(wave))
        recs = adsb.decode_bits_stream(noisy)
        assert len(recs) == 5
        assert [r["callsign"] for r in recs] == [f"AC{k:05d}" for k in range(5)]


class TestAdsbGraphChain:
    def test_iq_stream_to_aircraft_table(self):
        """Complex IQ at 2 Msps (random carrier phase) → |·| → AdsbDecoder,
        frames split across scheduler steps; no duplicates, all aircraft."""
        rng = np.random.default_rng(1)
        frames = [adsb.make_df17_identification(0xABC000 + k, f"TPU{k:04d}")
                  for k in range(8)]
        wave = adsb.modulate(frames, gap_us=137.5)   # frames straddle steps
        phase = np.cumsum(rng.normal(0.0, 0.3, len(wave)))
        iq = (wave * np.exp(1j * phase)).astype(np.complex64)
        iq += (0.02 * (rng.standard_normal(len(iq))
                       + 1j * rng.standard_normal(len(iq)))).astype(np.complex64)

        g = gr.Graph()
        src = g.emplace("VectorSource", data=iq)
        mag = g.emplace("Abs")
        dec = g.emplace("AdsbDecoder", threshold=0.3)
        g.connect_chain(src, mag, dec)
        gr.Scheduler(g, block_len=1000, sample_rate=2e6).run_and_wait()

        assert len(dec.frames) == 8, [f.get("callsign") for f in dec.frames]
        assert dec.aircraft == {0xABC000 + k: f"TPU{k:04d}" for k in range(8)}
