"""Maritime AIS family (ITU-R M.1371): field layout pinned against the
published AIVDM worked example, 6-bit armoring roundtrip, GMSK modulation
properties, host loopback under noise, and the full graph receiver chain
(AisSource → QuadratureDemod → AisDecoder) with multiple vessels through
scheduler chunking."""

import numpy as np
import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.blocks.ais import (ais_frame_bits, ais_modulate,
                                      bits_to_bytes, build_position_report,
                                      bytes_to_bits, gmsk_modulate,
                                      parse_position_report, sixbit_decode,
                                      sixbit_encode)
from gnuradio4_tpu.blocks.ais import ais_demod_bits
from gnuradio4_tpu.blocks.ax25 import deframe, nrzi_decode

FS = 96000.0
SPS = FS / 9600.0


class TestCoding:
    def test_published_aivdm_vector(self):
        """The GPSd AIVDM documentation's canonical type-1 example:
        !AIVDM,1,1,,B,177KQJ5000G?tO`K>RA1wUbN0TKH,0*5C"""
        rpt = parse_position_report(
            sixbit_decode("177KQJ5000G?tO`K>RA1wUbN0TKH"))
        assert rpt["type"] == 1
        assert rpt["mmsi"] == 477553000
        assert rpt["nav_status"] == 5          # Moored
        assert rpt["sog_kn"] == 0.0
        assert abs(rpt["lon"] - (-122.34583)) < 1e-4
        assert abs(rpt["lat"] - 47.58283) < 1e-4
        assert rpt["cog_deg"] == 51.0
        assert rpt["heading_deg"] == 181
        assert rpt["timestamp"] == 15

    def test_sixbit_roundtrip(self):
        armored = "177KQJ5000G?tO`K>RA1wUbN0TKH"
        assert sixbit_encode(sixbit_decode(armored)) == armored

    @pytest.mark.parametrize("lat,lon", [(47.58283, -122.34583),
                                         (-33.8568, 151.2153),
                                         (59.9139, 10.7522),
                                         (-0.0005, -0.0005)])
    def test_build_parse_roundtrip(self, lat, lon):
        rpt = parse_position_report(build_position_report(
            mmsi=123456789, lat=lat, lon=lon, sog_kn=10.2, cog_deg=123.4,
            heading_deg=120, nav_status=3, msg_type=3, timestamp=42))
        assert rpt["mmsi"] == 123456789 and rpt["type"] == 3
        assert abs(rpt["lat"] - lat) < 2e-6 and abs(rpt["lon"] - lon) < 2e-6
        assert rpt["sog_kn"] == 10.2 and rpt["cog_deg"] == 123.4
        assert rpt["heading_deg"] == 120 and rpt["nav_status"] == 3
        assert rpt["timestamp"] == 42

    def test_bit_byte_roundtrip(self):
        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, 168).astype(np.uint8)
        np.testing.assert_array_equal(bytes_to_bits(bits_to_bytes(bits)),
                                      bits)

    def test_other_message_types_rejected(self):
        bits = build_position_report(mmsi=1, lat=0, lon=0)
        bits[0:6] = [0, 0, 0, 1, 0, 1]         # type 5: static voyage data
        assert parse_position_report(bits) is None


class TestPhysicalLayer:
    def test_gmsk_constant_envelope(self):
        iq = ais_modulate(build_position_report(mmsi=1, lat=1.0, lon=2.0),
                          fs=FS)
        np.testing.assert_allclose(np.abs(iq), 1.0, atol=1e-6)

    def test_gmsk_deviation_bounded(self):
        # modulation index 0.5 → |instantaneous frequency| ≤ baud/4
        iq = ais_modulate(build_position_report(mmsi=1, lat=1.0, lon=2.0),
                          fs=FS)
        freq = np.angle(iq[1:] * np.conj(iq[:-1])) * FS / (2 * np.pi)
        assert np.max(np.abs(freq)) <= 9600.0 / 4.0 + 1.0

    def test_host_loopback_clean(self):
        msg = build_position_report(mmsi=477553000, lat=47.58283,
                                    lon=-122.34583, sog_kn=12.3,
                                    cog_deg=51.0, heading_deg=181)
        iq = ais_modulate(msg, fs=FS)
        disc = np.angle(iq[1:] * np.conj(iq[:-1]))
        frames = deframe(nrzi_decode(ais_demod_bits(disc, SPS)))
        assert len(frames) == 1
        rpt = parse_position_report(bytes_to_bits(frames[0]))
        assert rpt["mmsi"] == 477553000
        assert abs(rpt["lat"] - 47.58283) < 2e-6
        assert abs(rpt["lon"] + 122.34583) < 2e-6

    def test_host_loopback_noisy(self):
        rng = np.random.default_rng(7)
        msg = build_position_report(mmsi=211234560, lat=54.18, lon=12.08,
                                    sog_kn=7.7)
        iq = ais_modulate(msg, fs=FS)
        iq = iq + (rng.standard_normal(len(iq))
                   + 1j * rng.standard_normal(len(iq))).astype(np.complex64) \
            * 0.05                                  # ≈ 23 dB SNR
        disc = np.angle(iq[1:] * np.conj(iq[:-1]))
        frames = deframe(nrzi_decode(ais_demod_bits(disc, SPS)))
        assert frames, "no frame decoded at 23 dB SNR"
        rpt = parse_position_report(bytes_to_bits(frames[0]))
        assert rpt["mmsi"] == 211234560

    def test_corrupted_fcs_rejected(self):
        msg = build_position_report(mmsi=1, lat=1.0, lon=2.0)
        bits = ais_frame_bits(msg)
        bits[60] ^= 1                              # flip a payload bit
        iq = gmsk_modulate(bits, fs=FS)
        disc = np.angle(iq[1:] * np.conj(iq[:-1]))
        assert deframe(nrzi_decode(ais_demod_bits(disc, SPS))) == []


class TestGraphChain:
    @pytest.mark.parametrize("block_len", [4096, 1536])
    def test_two_vessels_through_scheduler(self, block_len):
        reports = [
            dict(mmsi=477553000, lat=47.58283, lon=-122.34583, sog_kn=0.0,
                 cog_deg=51.0, heading_deg=181, nav_status=5),
            dict(mmsi=211234560, lat=54.1833, lon=12.0833, sog_kn=14.5,
                 cog_deg=200.0, heading_deg=199, nav_status=0),
        ]
        g = gr.Graph()
        src = g.emplace("AisSource", reports=reports, sample_rate=FS)
        demod = g.emplace("QuadratureDemod", gain=1.0)
        dec = g.emplace("AisDecoder", sps=SPS)
        g.connect_chain(src, demod, dec)
        gr.Scheduler(g, block_len=block_len, sample_rate=FS).run_and_wait()
        assert len(dec.packets) == 2, dec.packets
        assert set(dec.vessels) == {477553000, 211234560}
        v = dec.vessels[211234560]
        assert abs(v["lat"] - 54.1833) < 2e-6
        assert abs(v["lon"] - 12.0833) < 2e-6
        assert v["sog_kn"] == 14.5 and v["nav_status"] == 0
        m = dec.vessels[477553000]
        assert m["nav_status"] == 5 and m["cog_deg"] == 51.0
